"""Web-graph / crawl-curation tier: URL-keyed snapshot dedup, link-graph
extraction, Gopher-style quality rules, and per-doc TF-IDF top-k terms.

House contract (see `queries.py`): one Ray Data pipeline + one DuckDB
oracle per entry over the same parquet tables, identical column names,
floats through the shared half-up rounding rule. The reference
(`/root/reference/`) has no analogue for any of these — they are the
crawl-side operators a Common-Crawl-scale corpus needs BEFORE the dedup
tiers run (the BASELINE input_hint's pages table is (url, warc_ts, html,
text, lang); these operators are what turns raw captures into the curated
`documents` stream the MinHash/LSH flagship consumes).

Where the shared testdata lacks the needed structure (no capture urls, no
timestamps, no anchor tags), it is synthesized DETERMINISTICALLY from
doc_id inside BOTH engines — the `q_url_canon` / `q_pii_redact`
convention: the construction is the test harness, the vectorized kernel
under it is the operator.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .queries import _SQL_NORM, _docs, _round6_half_up

#: `normalize_array` (the engine's canonical normalizer, byte-parity with
#: the reference) zero-pads normalized text shorter than the 3-gram width
#: ('', NULL → '000'; 'x' → '00x'). The word-level oracles here mirror
#: that pad so Ray↔SQL parity holds on degenerate docs too (probed with
#: null/empty/1-char texts), not just on the testdata's long documents.
#: (Non-ASCII input still diverges: normalize_array folds accents, the SQL
#: strips them — the same gap every `_SQL_NORM`-based oracle in
#: `queries.py` has; the shared testdata is ASCII, so the gate is exact.)
_SQL_NORM_PADDED = (
    f"(CASE WHEN length(coalesce({_SQL_NORM}, '')) < 3 "
    f"THEN lpad(coalesce({_SQL_NORM}, ''), 3, '0') ELSE {_SQL_NORM} END)"
)

# ---------------------------------------------------------------------------
# URL snapshot dedup — per canonical url keep the latest capture
# ---------------------------------------------------------------------------
# The classic Common-Crawl curation step: the same page is captured many
# times (scheme/WWW/port/fragment jitter across crawls); canonicalize the
# url (functions/urls.py) and keep exactly one capture per page — the one
# with the greatest (warc_ts, doc_id).
#
# Scale shape: ONE groupby over the canonical-url key. The argmax is a
# plain Max aggregate over a packed (ts, capture-id) int64 — no map_groups,
# no per-group Python. The pack uses 16 ts bits · 32 id bits here (enough
# for the catalog's < 2^32 doc ids — guarded); at 10^12 docs the same
# pattern runs with a 128-bit decimal or a two-column struct max.

_TS_MULT = 40503          # odd multiplier → pseudo-timestamp per capture
_TS_MOD = 65536
_ID_SPAN = 1 << 32


def _messy_capture_urls(ids: np.ndarray) -> list[str]:
    """Synthesized capture url: page key p = doc_id % 97; the scheme case,
    WWW prefix, default port and fragment/slash tail vary PER CAPTURE but
    all canonicalize away, so every capture of page p maps to
    https://s{p}.example.com/Page/{p}. Mirrored byte-for-byte in SQL."""
    out = []
    for i in ids:
        i = int(i)
        p = i % 97
        scheme = "HTTPS" if i % 2 == 0 else "https"
        www = "WWW." if i % 4 == 0 else ""
        port = ":443" if i % 3 == 0 else ""
        tail = ["", "/", "//", "#Sec", "/#z"][i % 5]
        out.append(f"{scheme}://{www}S{p}.Example.COM{port}/Page/{p}{tail}")
    return out


_SQL_MESSY_CAPTURE = (
    "(CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END || '://' || "
    "CASE WHEN doc_id % 4 = 0 THEN 'WWW.' ELSE '' END || "
    "'S' || (doc_id % 97)::VARCHAR || '.Example.COM' || "
    "CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END || "
    "'/Page/' || (doc_id % 97)::VARCHAR || "
    "CASE doc_id % 5 WHEN 0 THEN '' WHEN 1 THEN '/' WHEN 2 THEN '//' "
    "WHEN 3 THEN '#Sec' ELSE '/#z' END)"
)


def q_url_dedup_latest(sf_dir: str):
    from ray.data.aggregate import Count, Max

    from ..functions.urls import canon_url_array

    def key(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) and ids.max() >= _ID_SPAN:
            raise ValueError("packed ts-argmax needs doc_id < 2^32; use the "
                             "struct-max variant beyond that")
        canon = canon_url_array(pa.array(_messy_capture_urls(ids), pa.string()))
        ts_key = (ids * _TS_MULT) % _TS_MOD * _ID_SPAN + ids
        return pa.table({"url": canon, "ts_key": pa.array(ts_key, pa.int64())})

    agg = _docs(sf_dir, ["doc_id"]) \
        .map_batches(key, batch_format="pyarrow") \
        .groupby("url").aggregate(Count(alias_name="n_captures"),
                                  Max("ts_key", alias_name="max_key"))

    def unpack(t: pa.Table) -> pa.Table:
        mk = t["max_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "url": t["url"],
            "n_captures": pc.cast(t["n_captures"], pa.int64()),
            "kept_doc_id": pa.array(mk % _ID_SPAN, pa.int64()),
        })

    return agg.map_batches(unpack, batch_format="pyarrow")


def _sql_url_dedup_latest() -> str:
    from ..functions.urls import sql_canon_url

    canon = sql_canon_url(_SQL_MESSY_CAPTURE)
    return f"""
WITH c AS (SELECT {canon} AS url,
                  (doc_id * {_TS_MULT}) % {_TS_MOD} * {_ID_SPAN} + doc_id AS ts_key
           FROM documents)
SELECT url, count(*) AS n_captures,
       CAST(max(ts_key) % {_ID_SPAN} AS BIGINT) AS kept_doc_id
FROM c GROUP BY url
"""


# ---------------------------------------------------------------------------
# Link graph — href extraction from html + per-target-domain degree counts
# ---------------------------------------------------------------------------
# Each page gets three synthesized anchors (targets keyed off doc_id, so
# the in-degree distribution is non-trivial) and a source host. The
# OPERATOR is `functions/html.py:extract_links_flat` (split-pattern
# flatten, zero per-row Python) + host extraction + the two-stage degree
# aggregate: groupby (dst, src) first — the distinct-source count becomes a
# plain Count over that pre-aggregated table, so the second shuffle moves
# one row per observed (dst, src) edge class, not one per link.

def _page_html(ids: np.ndarray) -> list[str]:
    out = []
    for i in ids:
        i = int(i)
        anchors = "".join(
            f'<a href="https://d{(i * k) % 31}.example.org/x{i}">l</a>'
            for k in (1, 2, 3))
        out.append(f"<html><body><p>Doc {i}</p>{anchors}</body></html>")
    return out


_SQL_PAGE_HTML = (
    "('<html><body><p>Doc ' || doc_id::VARCHAR || '</p>' || "
    "'<a href=\"https://d' || (doc_id % 31)::VARCHAR || '.example.org/x' || doc_id::VARCHAR || '\">l</a>' || "
    "'<a href=\"https://d' || ((doc_id * 2) % 31)::VARCHAR || '.example.org/x' || doc_id::VARCHAR || '\">l</a>' || "
    "'<a href=\"https://d' || ((doc_id * 3) % 31)::VARCHAR || '.example.org/x' || doc_id::VARCHAR || '\">l</a>' || "
    "'</body></html>')"
)


def q_link_graph(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    from ..functions.html import extract_links_flat

    def edges(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        html = pa.array(_page_html(ids), pa.string())
        urls, doc_idx = extract_links_flat(html)
        dst = pc.struct_field(
            pc.extract_regex(urls, pattern=r"^https?://(?P<h>[^/]+)"), "h")
        src_ids = ids[doc_idx] % 11
        src = pc.binary_join_element_wise(
            pa.scalar("p"), pc.cast(pa.array(src_ids), pa.string()),
            pa.scalar(".example.com"), "")
        return pa.table({"src_host": src, "dst_host": dst})

    per_pair = _docs(sf_dir, ["doc_id"]) \
        .map_batches(edges, batch_format="pyarrow") \
        .groupby(["dst_host", "src_host"]).aggregate(Count(alias_name="n"))
    agg = per_pair.groupby("dst_host").aggregate(
        Sum("n", alias_name="n_links"), Count(alias_name="n_src_hosts"))
    return agg.map_batches(
        lambda t: pa.table({
            "dst_host": t["dst_host"],
            "n_links": pc.cast(t["n_links"], pa.int64()),
            "n_src_hosts": pc.cast(t["n_src_hosts"], pa.int64()),
        }), batch_format="pyarrow")


SQL_LINK_GRAPH = f"""
WITH h AS (SELECT doc_id, {_SQL_PAGE_HTML} AS html FROM documents),
l AS (SELECT doc_id, unnest(regexp_extract_all(html, '<a href="([^"]+)"', 1)) AS link FROM h),
e AS (SELECT 'p' || (doc_id % 11)::VARCHAR || '.example.com' AS src_host,
             regexp_extract(link, '^https?://([^/]+)', 1) AS dst_host FROM l)
SELECT dst_host, count(*) AS n_links, count(DISTINCT src_host) AS n_src_hosts
FROM e GROUP BY dst_host
"""


# ---------------------------------------------------------------------------
# Gopher-style quality rules (Rae et al. 2021 §A1.1 subset) over real text
# ---------------------------------------------------------------------------
# Word-level rules over the NORMALIZED text (shared _SQL_NORM spec, so
# tokenization is byte-identical across engines): word count bounds, mean
# word length bounds, alphabetic-word fraction, minimum stop-word hits.
# Entirely flat/vectorized: split → flatten through list offsets →
# bincount per doc; the only strings compared are the 8 stop words
# (np.isin over the batch's dictionary-encoded vocab, O(|vocab|)).

_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")
_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS = 50, 100_000
_GOPHER_MIN_MWL, _GOPHER_MAX_MWL = 3.0, 10.0
_GOPHER_MIN_ALPHA = 0.8
_GOPHER_MIN_STOPS = 2


def q_gopher_quality(sf_dir: str):
    from ..functions.normalize import normalize_array
    from .queries import _QCFG

    def fn(t: pa.Table) -> pa.Table:
        norm = normalize_array(t["text"], _QCFG.max_chars, _QCFG.n_grams)
        words = pc.split_pattern(norm, pattern=" ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        offsets = np.asarray(words.offsets)
        lens = np.diff(offsets)
        flat = words.values
        doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), lens)
        wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        nonempty = wlen > 0
        # per-word predicates via the batch vocab (dictionary-encode once)
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        vocab = enc.dictionary
        is_alpha_vocab = pc.match_substring_regex(
            vocab, pattern="[a-z]").to_numpy(zero_copy_only=False)
        is_stop_vocab = np.isin(np.asarray(vocab, dtype=object),
                                np.array(_GOPHER_STOPS, dtype=object))
        n = len(t)
        d = doc_idx[nonempty]
        n_words = np.bincount(d, minlength=n).astype(np.int64)
        chars = np.bincount(d, weights=wlen[nonempty], minlength=n)
        alpha = np.bincount(d, weights=is_alpha_vocab[codes[nonempty]],
                            minlength=n)
        stops = np.bincount(d, weights=is_stop_vocab[codes[nonempty]],
                            minlength=n).astype(np.int64)
        keep = n_words > 0
        nw = n_words[keep]
        mwl = _round6_half_up(chars[keep] / nw)
        afrac = _round6_half_up(alpha[keep] / nw)
        passes = ((nw >= _GOPHER_MIN_WORDS) & (nw <= _GOPHER_MAX_WORDS)
                  & (mwl >= _GOPHER_MIN_MWL) & (mwl <= _GOPHER_MAX_MWL)
                  & (afrac >= _GOPHER_MIN_ALPHA)
                  & (stops[keep] >= _GOPHER_MIN_STOPS))
        return pa.table({
            "doc_id": t["doc_id"].filter(pa.array(keep)),
            "n_words": pa.array(nw, pa.int64()),
            "mean_word_len": pa.array(mwl, pa.float64()),
            "alpha_frac": pa.array(afrac, pa.float64()),
            "stop_hits": pa.array(stops[keep], pa.int64()),
            "passes": pa.array(passes, pa.bool_()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow")


_SQL_STOP_LIST = ", ".join(f"'{w}'" for w in _GOPHER_STOPS)

SQL_GOPHER_QUALITY = f"""
WITH n AS (SELECT doc_id, {_SQL_NORM_PADDED} AS norm FROM documents),
w AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS word FROM n),
f AS (SELECT doc_id, count(*) AS n_words, sum(length(word)) AS chars,
        sum(CASE WHEN regexp_matches(word, '[a-z]') THEN 1 ELSE 0 END) AS alpha,
        sum(CASE WHEN word IN ({_SQL_STOP_LIST}) THEN 1 ELSE 0 END) AS stop_hits
      FROM w WHERE word <> '' GROUP BY doc_id),
r AS (SELECT doc_id, n_words,
        floor(chars * 1.0 / n_words * 1000000 + 0.5) / 1000000 AS mean_word_len,
        floor(alpha * 1.0 / n_words * 1000000 + 0.5) / 1000000 AS alpha_frac,
        stop_hits
      FROM f)
SELECT doc_id, n_words, mean_word_len, alpha_frac, CAST(stop_hits AS BIGINT) AS stop_hits,
  (n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS}
   AND mean_word_len BETWEEN {_GOPHER_MIN_MWL} AND {_GOPHER_MAX_MWL}
   AND alpha_frac >= {_GOPHER_MIN_ALPHA}
   AND stop_hits >= {_GOPHER_MIN_STOPS}) AS passes
FROM r
"""


# ---------------------------------------------------------------------------
# TF-IDF top-k terms per document — broadcast-idf join + in-batch top-k
# ---------------------------------------------------------------------------
# The scale shape worth demonstrating: the per-(doc, word) side NEVER
# shuffles. The idf table (|vocab| rows — the small side by construction;
# a normalized web vocabulary is bounded while the corpus is not) is built
# by the existing pre-aggregated word-df pipeline, collected via Arrow refs
# (one small table transits the driver), broadcast once with ray.put, and
# every batch computes tf, the idf lookup, and the per-doc top-k entirely
# in-batch — each document is one row, so its words never leave the batch.

_TFIDF_K = 3


def q_tfidf_topk(sf_dir: str, k: int = _TFIDF_K):
    import ray

    from ..functions.normalize import normalize_array
    from .queries import _QCFG, _word_df_ds

    n_docs = _docs(sf_dir, ["doc_id"]).count()
    blocks = [t for t in ray.get(_word_df_ds(sf_dir).to_arrow_refs())
              if t.num_columns]  # drop schema-less empty blocks
    idf_tbl = pa.concat_tables(blocks, promote_options="none")
    words = np.asarray(idf_tbl["word"].combine_chunks(), dtype=object)
    order = np.argsort(words)  # lexicographic — searchsorted key
    sorted_words = words[order]
    # _round6_half_up, not np.round (half-to-even): the SQL oracle uses
    # DuckDB round() and every cross-engine float in the repo shares the
    # half-up rule — an idf landing on a half-microunit must not diverge
    idf_vals = _round6_half_up(
        np.log(n_docs / idf_tbl["df"].to_numpy(zero_copy_only=False)
               .astype(np.float64)))[order]
    ref = ray.put((sorted_words, idf_vals))

    def fn(t: pa.Table) -> pa.Table:
        svoc, sidf = ray.get(ref)
        norm = normalize_array(t["text"], _QCFG.max_chars, _QCFG.n_grams)
        wl = pc.split_pattern(norm, pattern=" ")
        if isinstance(wl, pa.ChunkedArray):
            wl = wl.combine_chunks()
        lens = np.diff(np.asarray(wl.offsets))
        doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), lens)
        enc = wl.values.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = np.asarray(enc.dictionary, dtype=object)
        v = max(len(vocab), 1)
        ok = np.array([len(w) > 0 for w in vocab], dtype=bool)  # drop ''
        # tf per (doc, word-code) — vectorized over packed keys
        keys, tf = np.unique(doc_idx * v + codes, return_counts=True)
        d, c = keys // v, keys % v
        m = ok[c]
        d, c, tf = d[m], c[m], tf[m]
        # idf lookup against the broadcast sorted vocab (every corpus word
        # is in it by construction — same tokenizer built the df table)
        pos = np.searchsorted(svoc, vocab[c])
        score = _round6_half_up(tf * sidf[pos])
        # per-doc top-k by (score DESC, word ASC): lexsort with the batch
        # vocab's LEXICAL rank as the tiebreak key (int, not str, compares)
        lex_rank = np.empty(len(vocab), np.int64)
        lex_rank[np.argsort(vocab)] = np.arange(len(vocab))
        ordr = np.lexsort((lex_rank[c], -score, d))
        d, c, score = d[ordr], c[ordr], score[ordr]
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        rank = np.arange(len(d)) - np.repeat(
            starts, np.diff(np.r_[starts, len(d)]))
        top = rank < k
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids[d[top]], pa.int64()),
            "word": pa.array(vocab[c[top]], pa.string()),
            "rank": pa.array(rank[top] + 1, pa.int64()),
            "score": pa.array(score[top], pa.float64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow")


SQL_TFIDF_TOPK = f"""
WITH n AS (SELECT doc_id, {_SQL_NORM_PADDED} AS norm FROM documents),
w AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS word FROM n),
tf AS (SELECT doc_id, word, count(*) AS tf FROM w WHERE word <> ''
       GROUP BY doc_id, word),
d AS (SELECT word, round(ln((SELECT count(*) FROM documents) * 1.0
                            / count(DISTINCT doc_id)), 6) AS idf
      FROM w WHERE word <> '' GROUP BY word),
s AS (SELECT tf.doc_id, tf.word,
        floor(tf.tf * d.idf * 1000000 + 0.5) / 1000000 AS score
      FROM tf JOIN d USING (word)),
r AS (SELECT *, row_number() OVER
        (PARTITION BY doc_id ORDER BY score DESC, word) AS rank FROM s)
SELECT doc_id, word, CAST(rank AS BIGINT) AS rank, score
FROM r WHERE rank <= {_TFIDF_K}
"""


# ---------------------------------------------------------------------------
# N-gram LM quality score (CCNet-style) — broadcast bigram model + scoring
# ---------------------------------------------------------------------------
# CCNet (Wenzek et al. 2019, §3.3) ranks crawled pages by the perplexity of
# a language model trained on a trusted reference corpus. Same shape here:
# a word-bigram model with Laplace smoothing is fit on the reference slice
# (doc_id % _LM_MOD < _LM_REF — deterministic, SQL-reproducible) and every
# remaining page is scored by the mean negative log-likelihood of its
# bigrams, -ln((c(w1,w2)+1) / (c(w1,·)+V)) — lower = more reference-like.
#
# Scale shape: the model is the SMALL side by construction (CCNet's
# reference LM is Wikipedia-sized while the corpus is the crawl). Per-batch
# PARTIAL counts pre-aggregate before anything moves, ONE combine task
# packs the model into sorted numpy arrays in the object store (never on
# the driver), and the scoring side NEVER shuffles: each page's bigrams
# are formed, searchsorted against the broadcast model, and averaged
# inside its own batch. Lookup is exact (vocab-id keyed), not hashed — a
# hash collision would silently corrupt a count and diverge from the SQL.

_LM_MOD = 10
_LM_REF = 3   # doc_id % 10 ∈ {0,1,2} → reference (model) slice


def _lm_flat_words(t: pa.Table):
    """normalize → split → drop '' tokens, keeping per-doc order: returns
    (words object-array, doc_idx int array) over the batch."""
    from ..functions.normalize import normalize_array
    from .queries import _QCFG

    norm = normalize_array(t["text"], _QCFG.max_chars, _QCFG.n_grams)
    wl = pc.split_pattern(norm, pattern=" ")
    if isinstance(wl, pa.ChunkedArray):
        wl = wl.combine_chunks()
    lens = np.diff(np.asarray(wl.offsets))
    doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), lens)
    words = np.asarray(wl.values, dtype=object)
    keep = np.array([len(w) > 0 for w in words], dtype=bool)
    return words[keep], doc_idx[keep]


def _lm_partial_counts(t: pa.Table) -> pa.Table:
    """Reference-slice batch → pre-aggregated partial rows: bigram counts
    (w1, w2, c) plus unigram-vocabulary counts encoded as (w, '', c) — ''
    can never be a real token (empties are filtered before bigramming)."""
    words, doc_idx = _lm_flat_words(t)
    uw, codes = np.unique(words, return_inverse=True)
    nu = max(len(uw), 1)
    adj = doc_idx[1:] == doc_idx[:-1]
    key = codes[:-1][adj] * nu + codes[1:][adj]
    bk, bc = np.unique(key, return_counts=True)
    uk, uc = np.unique(codes, return_counts=True)
    return pa.table({
        "w1": pa.array(np.concatenate([uw[bk // nu], uw[uk]]), pa.string()),
        "w2": pa.array(np.concatenate([uw[bk % nu],
                                       np.full(len(uk), "", object)]),
                       pa.string()),
        "c": pa.array(np.concatenate([bc, uc]).astype(np.int64), pa.int64()),
    })


def _lm_build_model(*tables):
    """Combine partial-count tables into the packed broadcast model:
    (sorted vocab, V, sorted bigram keys id1*V+id2, bigram counts,
    per-first-word counts c1). Runs as ONE Ray task; the result object IS
    the broadcast."""
    live = [x for x in tables if x.num_columns]
    if not live:
        return (np.empty(0, object), 1, np.empty(0, np.int64),
                np.empty(0, np.int64), np.zeros(1, np.int64))
    t = pa.concat_tables(live, promote_options="none")
    w1 = np.asarray(t["w1"].combine_chunks(), dtype=object)
    w2 = np.asarray(t["w2"].combine_chunks(), dtype=object)
    c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    uni = np.array([len(x) == 0 for x in w2], dtype=bool)
    vocab = np.unique(w1[uni])
    V = max(len(vocab), 1)
    b1 = np.searchsorted(vocab, w1[~uni]).astype(np.int64)
    b2 = np.searchsorted(vocab, w2[~uni]).astype(np.int64)
    key = b1 * V + b2
    bkeys, inv = np.unique(key, return_inverse=True)
    bcounts = np.bincount(inv, weights=c[~uni]).astype(np.int64)
    c1 = np.bincount(bkeys // V, weights=bcounts, minlength=V).astype(np.int64)
    return vocab, V, bkeys, bcounts, c1


def q_lm_score(sf_dir: str):
    import ray

    from .queries_corpus import _mod_filter

    docs = _docs(sf_dir, ["doc_id", "text"])
    ref_slice = tuple(range(_LM_REF))
    partials = _mod_filter(docs, _LM_MOD, ref_slice).map_batches(
        _lm_partial_counts, batch_format="pyarrow")
    build = ray.remote(num_cpus=1)(_lm_build_model)
    model_ref = build.remote(*partials.to_arrow_refs())

    def score(t: pa.Table) -> pa.Table:
        vocab, V, bkeys, bcounts, c1 = ray.get(model_ref)
        words, doc_idx = _lm_flat_words(t)
        # batch-vocab indirection: searchsorted once per DISTINCT batch word
        uw, codes = np.unique(words, return_inverse=True)
        pos = np.searchsorted(vocab, uw)
        ok = (pos < len(vocab))
        ok[ok] = vocab[pos[ok]] == uw[ok]
        mid = np.where(ok, pos, -1)
        wid = mid[codes] if len(codes) else np.empty(0, np.int64)
        adj = doc_idx[1:] == doc_idx[:-1]
        id1, id2 = wid[:-1][adj], wid[1:][adj]
        bdoc = doc_idx[:-1][adj]
        c1v = np.where(id1 >= 0, c1[np.maximum(id1, 0)], 0)
        c2v = np.zeros(len(id1), np.int64)
        both = (id1 >= 0) & (id2 >= 0)
        if both.any():
            k = id1[both] * V + id2[both]
            p = np.searchsorted(bkeys, k)
            hit = p < len(bkeys)
            hit[hit] = bkeys[p[hit]] == k[hit]
            sub = np.zeros(both.sum(), np.int64)
            sub[hit] = bcounts[p[hit]]
            c2v[both] = sub
        nll = -np.log((c2v + 1.0) / (c1v + V))
        sums = np.bincount(bdoc, weights=nll, minlength=len(t))
        cnts = np.bincount(bdoc, minlength=len(t))
        has = cnts > 0
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids[has], pa.int64()),
            "lm_score": pa.array(
                _round6_half_up(sums[has] / cnts[has]), pa.float64()),
        })

    return _mod_filter(docs, _LM_MOD, ref_slice, negate=True).map_batches(
        score, batch_format="pyarrow")


SQL_LM_SCORE = f"""
WITH n AS (SELECT doc_id, {_SQL_NORM_PADDED} AS norm FROM documents),
t AS (SELECT doc_id,
        list_filter(string_split(norm, ' '), x -> x <> '') AS ws FROM n),
big AS (SELECT doc_id,
          unnest(ws[1:len(ws)-1]) AS w1,
          unnest(ws[2:len(ws)]) AS w2
        FROM t WHERE len(ws) >= 2),
c2 AS (SELECT w1, w2, count(*) AS c FROM big
       WHERE doc_id % {_LM_MOD} < {_LM_REF} GROUP BY w1, w2),
c1 AS (SELECT w1, count(*) AS c FROM big
       WHERE doc_id % {_LM_MOD} < {_LM_REF} GROUP BY w1),
vocab AS (SELECT greatest(count(DISTINCT w), 1) AS v FROM
            (SELECT unnest(ws) AS w FROM t
             WHERE doc_id % {_LM_MOD} < {_LM_REF})),
s AS (SELECT b.doc_id,
        -ln((coalesce(c2.c, 0) + 1.0) / (coalesce(c1.c, 0) + vocab.v)) AS nll
      FROM big b
      LEFT JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
      LEFT JOIN c1 ON b.w1 = c1.w1
      CROSS JOIN vocab
      WHERE b.doc_id % {_LM_MOD} >= {_LM_REF})
SELECT doc_id, floor(avg(nll) * 1000000 + 0.5) / 1000000 AS lm_score
FROM s GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# PageRank — damped power iteration over the page link graph
# ---------------------------------------------------------------------------
# The canonical iterative web-graph operator (Page et al. 1999): each page
# gets three deterministic out-links dst = (src·k) % N + 1 (k ∈ 1..3, same
# synthesized-structure convention as q_link_graph), and rank is iterated
# _PR_ITERS times with damping _PR_ALPHA and dangling-mass redistribution.
#
# Shape: VERTEX-PARTITIONED — no whole-graph object anywhere. The edge
# list is materialized once and never re-shuffled; out-degree and the
# distinct node set are one bounded groupby each. Rank lives as a Dataset
# keyed by node id (with its static out-degree attached), and every
# iteration is: one bounded dangling-mass aggregate (a single double), one
# edges⋈rank hash join on src, one groupby(dst) contribution sum, and one
# left-outer join back onto the rank table. Each structure is hash-
# partitioned by node id, so at 10^12 nodes every step stays a partitioned
# exchange — nothing node- or edge-proportional is ever held in a single
# object or on the driver.

_PR_ITERS = 3
_PR_ALPHA = 0.85
_PR_FANOUT = (1, 2, 3)


def q_pagerank(sf_dir: str):
    from ray.data.aggregate import Sum

    from ..util import drop_empty_blocks, sized_num_partitions

    docs = _docs(sf_dir, ["doc_id"])
    n_docs = docs.count()
    # per-iteration join moves |E| = fanout·n_docs rows — size partitions
    # to that, not to the CPU count (see util.sized_num_partitions)
    nparts = sized_num_partitions(len(_PR_FANOUT) * n_docs)

    def edges_batch(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([ids] * len(_PR_FANOUT))
        dst = np.concatenate([(ids * k) % n_docs + 1 for k in _PR_FANOUT])
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    edges = docs.map_batches(
        edges_batch, batch_format="pyarrow").materialize()

    # Static per-node out-degree AND the distinct node set in ONE bounded
    # groupby: each edge emits (src, 1) and (dst, 0); Sum per id is the
    # out-degree, and every endpoint appears, so the keys ARE the node set
    # (dangling nodes — never a src — come out with outd = 0).
    from ray.data.aggregate import Max

    def _endpoints(t: pa.Table) -> pa.Table:
        n = len(t)
        ids = np.concatenate([
            t["src"].to_numpy(zero_copy_only=False),
            t["dst"].to_numpy(zero_copy_only=False)])
        o = np.concatenate([np.ones(n, np.int64), np.zeros(n, np.int64)])
        return pa.table({"id": pa.array(ids, pa.int64()),
                         "o": pa.array(o, pa.int64())})

    nodes_outd = (
        edges.map_batches(_endpoints, batch_format="pyarrow")
        .groupby("id").aggregate(Sum("o", alias_name="outd"))
        .materialize())
    n_nodes = nodes_outd.count()

    def _init_rank(t: pa.Table) -> pa.Table:
        return pa.table({
            "id": t["id"],
            "outd": pc.cast(t["outd"], pa.int64()),
            "r": pa.array(np.full(len(t), 1.0 / n_nodes), pa.float64()),
        })

    rank = nodes_outd.map_batches(
        _init_rank, batch_format="pyarrow").materialize()

    def _dangle_partial(t: pa.Table) -> pa.Table:
        od = t["outd"].to_numpy(zero_copy_only=False)
        r = t["r"].to_numpy(zero_copy_only=False)
        return pa.table({"d": pa.array([float(r[od == 0].sum())],
                                       pa.float64())})

    def _edge_mass(t: pa.Table) -> pa.Table:
        # edges⋈rank output row = (src, dst, [id,] outd, r); re-key the
        # mass to the DESTINATION node, outd=0 so the fold groupby's Max
        # recovers the destination's true out-degree from its zero-row.
        r = t["r"].to_numpy(zero_copy_only=False)
        od = t["outd"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"id": t["dst"],
                         "outd": pa.array(np.zeros(len(t), np.int64),
                                          pa.int64()),
                         "m": pa.array(r / od, pa.float64())})

    def _zero_mass(t: pa.Table) -> pa.Table:
        return pa.table({"id": t["id"], "outd": t["outd"],
                         "m": pa.array(np.zeros(len(t)), pa.float64())})

    def _fold(dangling: float):
        def fn(t: pa.Table) -> pa.Table:
            m = t["m"].to_numpy(zero_copy_only=False).astype(np.float64)
            new = (1 - _PR_ALPHA) / n_nodes \
                + _PR_ALPHA * (m + dangling / n_nodes)
            return pa.table({"id": t["id"],
                             "outd": pc.cast(t["outd"], pa.int64()),
                             "r": pa.array(new, pa.float64())})
        return fn

    for _ in range(_PR_ITERS):
        # Dangling mass: a single double off a bounded aggregate.
        dangling = rank.map_batches(
            _dangle_partial, batch_format="pyarrow").sum("d") or 0.0
        # Contribution: edges ⋈ rank on src (both hash-partitioned by
        # node id), per-edge mass r/outd re-keyed to dst, unioned with a
        # zero-mass row per node (so rankless sinks survive), folded by
        # ONE groupby(id){Sum m, Max outd} — the only per-iteration
        # exchanges are this join and this groupby.
        # drop_empty_blocks: the sort-based Aggregate that produced rank
        # can emit schema-less empty blocks at high partition counts; a
        # join hash partition fed only those fails (see util).
        contrib = edges.join(
            drop_empty_blocks(rank), join_type="inner",
            num_partitions=nparts,
            on=("src",), right_on=("id",)) \
            .map_batches(_edge_mass, batch_format="pyarrow")
        rank = (contrib
                .union(rank.map_batches(_zero_mass, batch_format="pyarrow"))
                .groupby("id")
                .aggregate(Sum("m", alias_name="m"),
                           Max("outd", alias_name="outd"))
                .map_batches(_fold(dangling), batch_format="pyarrow")
                .materialize())

    def _final(t: pa.Table) -> pa.Table:
        r = t["r"].to_numpy(zero_copy_only=False)
        return pa.table({
            "node_id": pa.array(
                t["id"].to_numpy(zero_copy_only=False), pa.int64()),
            "pagerank": pa.array(_round6_half_up(r), pa.float64()),
        })

    return rank.map_batches(_final, batch_format="pyarrow")


def _sql_pagerank() -> str:
    """Unrolled power iteration, generated from the SAME constants as the
    pipeline (_PR_ITERS/_PR_ALPHA/_PR_FANOUT) so a changed default cannot
    silently diverge the paired oracle."""
    ks = ", ".join(str(k) for k in _PR_FANOUT)
    a = repr(_PR_ALPHA)
    head = f"""
WITH e AS (SELECT doc_id AS src, (doc_id * k) % nn.nn + 1 AS dst
           FROM documents
           CROSS JOIN (SELECT unnest([{ks}]) AS k)
           CROSS JOIN (SELECT count(*) AS nn FROM documents) nn),
nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
nv AS (SELECT count(*)::DOUBLE AS n FROM nodes),
outd AS (SELECT src, count(*)::DOUBLE AS d FROM e GROUP BY src),
r0 AS (SELECT id, 1.0 / (SELECT n FROM nv) AS r FROM nodes)"""
    body = ""
    for i in range(1, _PR_ITERS + 1):
        p = i - 1
        body += f""",
dg{i} AS (SELECT coalesce(sum(r), 0) AS dm FROM r{p}
          WHERE id NOT IN (SELECT src FROM outd)),
m{i} AS (SELECT e.dst AS id, sum(r{p}.r / outd.d) AS m
         FROM e JOIN r{p} ON e.src = r{p}.id
                JOIN outd ON e.src = outd.src
         GROUP BY e.dst),
r{i} AS (SELECT nodes.id,
           (1 - {a}) / (SELECT n FROM nv)
           + {a} * (coalesce(m.m, 0)
                    + (SELECT dm FROM dg{i}) / (SELECT n FROM nv)) AS r
         FROM nodes LEFT JOIN m{i} m ON nodes.id = m.id)"""
    return head + body + f"""
SELECT id AS node_id, floor(r * 1000000 + 0.5) / 1000000 AS pagerank
FROM r{_PR_ITERS}
"""


# ---------------------------------------------------------------------------
# Snapshot change detection — LAG over each url's capture history
# ---------------------------------------------------------------------------
# For every canonical url, order its captures by (pseudo-ts, id) and count
# how many snapshots CHANGED content vs the previous capture (CDX-style
# crawl freshness / change-rate estimation). Content class is synthesized
# ((doc_id // 97) % 2 — the capture index's parity) so the ts-ordered walk
# genuinely hits BOTH branches (16 repeats / 387 changes at sf0.01).
#
# Shape: the per-url ordered walk is a custom AggregateFn whose group
# state is the bounded capture list (snapshots-per-url is corpus/97 here;
# a production crawl bounds it by retention policy) — accumulate appends
# (ts_key, h) pairs, ONE finalize sorts the few entries and diffs
# vectorized. No map_groups, no global sort; the only shuffle is the url
# groupby of pre-packed 16 B rows. The SQL oracle states the same walk
# with a LAG window.


def q_snapshot_changes(sf_dir: str):
    from ray.data.aggregate import AggregateFn

    from ..functions.urls import canon_url_array

    def key(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        canon = canon_url_array(pa.array(_messy_capture_urls(ids), pa.string()))
        ts_key = (ids * _TS_MULT) % _TS_MOD * _ID_SPAN + ids
        return pa.table({"url": canon,
                         "ts_key": pa.array(ts_key, pa.int64()),
                         "h": pa.array((ids // 97) % 2, pa.int64())})

    def acc_block(acc: list, blk) -> list:
        return acc + list(zip(blk["ts_key"].to_pylist(),
                              blk["h"].to_pylist()))

    def fin(acc: list):
        a = np.array(sorted(acc), dtype=np.int64)
        changes = int((a[1:, 1] != a[:-1, 1]).sum()) if len(a) > 1 else 0
        return [len(a), changes]  # packed (n_snapshots, n_changes)

    agg = AggregateFn(init=lambda k: [], merge=lambda a, b: a + b,
                      accumulate_block=acc_block, finalize=fin,
                      name="packed")

    grouped = _docs(sf_dir, ["doc_id"]) \
        .map_batches(key, batch_format="pyarrow") \
        .groupby("url").aggregate(agg)

    def unpack(t: pa.Table) -> pa.Table:
        packed = t["packed"].to_pylist()
        return pa.table({
            "url": t["url"],
            "n_snapshots": pa.array([p[0] for p in packed], pa.int64()),
            "n_changes": pa.array([p[1] for p in packed], pa.int64()),
        })

    return grouped.map_batches(unpack, batch_format="pyarrow")


def _sql_snapshot_changes() -> str:
    from ..functions.urls import sql_canon_url

    canon = sql_canon_url(_SQL_MESSY_CAPTURE)
    return f"""
WITH c AS (SELECT {canon} AS url,
                  (doc_id * {_TS_MULT}) % {_TS_MOD} * {_ID_SPAN} + doc_id
                    AS ts_key,
                  (doc_id // 97) % 2 AS h
           FROM documents),
l AS (SELECT url, h, lag(h) OVER (PARTITION BY url ORDER BY ts_key) AS ph
      FROM c)
SELECT url, count(*) AS n_snapshots,
       coalesce(sum(CASE WHEN ph IS NOT NULL AND ph <> h
                         THEN 1 ELSE 0 END), 0)::BIGINT AS n_changes
FROM l GROUP BY url
"""


# ---------------------------------------------------------------------------
# Anchor-text aggregation — the web-search "anchor corpus" construction
# ---------------------------------------------------------------------------
# For every link TARGET, aggregate the distinct anchor texts pointing at it
# into one space-joined sorted string (anchor text describes the target
# better than the target's own page — Brin & Page 1998 §2.2). Anchors are
# synthesized deterministically (doc i emits 3 anchors; target and text
# drawn from modular classes so targets are SHARED across source pages),
# extracted by the real vectorized kernel (html.extract_anchors_flat), and
# aggregated with a custom ray.data AggregateFn — per-batch vectorized
# (dst, atext) distinct first, so the shuffle moves pre-deduped pairs and
# the per-group Python state is the bounded distinct-anchor set (a
# production run would cap it and count drops, the house DropCounter
# pattern; the cap is semantics-neutral here because the synthesized
# distinct-text universe is {_ANCHOR_TXTS} strings).

_ANCHOR_DSTS = 97
_ANCHOR_TXTS = 17
_ANCHOR_HTML_PAT = '<a href="([^"]+)">([^<]*)<'


def _anchor_html(ids: np.ndarray) -> list[str]:
    out = []
    for i in ids:
        i = int(i)
        anchors = "".join(
            f'<a href="https://s{(i * k) % _ANCHOR_DSTS}.example.org/">'
            f't{(i + 3 * k) % _ANCHOR_TXTS}</a>' for k in (1, 2, 3))
        out.append(f"<html><body>{anchors}</body></html>")
    return out


def _sql_anchor_html() -> str:
    parts = []
    for k in (1, 2, 3):
        parts.append(
            f"'<a href=\"https://s' || ((doc_id * {k}) % {_ANCHOR_DSTS})::VARCHAR"
            f" || '.example.org/\">t' || ((doc_id + {3 * k}) % {_ANCHOR_TXTS})::VARCHAR"
            f" || '</a>'")
    return "('<html><body>' || " + " || ".join(parts) + " || '</body></html>')"


def q_anchor_text(sf_dir: str):
    from ray.data.aggregate import AggregateFn

    from ..functions.html import extract_anchors_flat

    def pairs_batch(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        html = pa.array(_anchor_html(ids), pa.string())
        urls, texts, _ = extract_anchors_flat(html)
        tbl = pa.table({"dst_url": urls, "atext": texts})
        return tbl.group_by(["dst_url", "atext"]).aggregate([])  # batch distinct

    def acc_block(acc: list, blk) -> list:
        col = blk["atext"]
        if hasattr(col, "to_pylist"):
            return acc + col.to_pylist()
        return acc + list(col)

    anchor_agg = AggregateFn(
        init=lambda k: [],
        merge=lambda a, b: a + b,
        accumulate_block=acc_block,
        finalize=lambda acc: " ".join(sorted(set(acc))),
        name="anchor_doc",
    )

    grouped = _docs(sf_dir, ["doc_id"]) \
        .map_batches(pairs_batch, batch_format="pyarrow") \
        .groupby("dst_url").aggregate(anchor_agg)

    def fin(t: pa.Table) -> pa.Table:
        docs = t["anchor_doc"].to_numpy(zero_copy_only=False)
        n = np.array([len(d.split(" ")) if d else 0 for d in docs], np.int64)
        return pa.table({"dst_url": t["dst_url"], "anchor_doc": t["anchor_doc"],
                         "n_anchors": pa.array(n, pa.int64())})

    return grouped.map_batches(fin, batch_format="pyarrow")


SQL_ANCHOR_TEXT = f"""
WITH h AS (SELECT doc_id, {_sql_anchor_html()} AS html FROM documents),
a AS (SELECT unnest(regexp_extract_all(html, '{_ANCHOR_HTML_PAT}', 1)) AS dst_url,
             unnest(regexp_extract_all(html, '{_ANCHOR_HTML_PAT}', 2)) AS atext
      FROM h),
d AS (SELECT DISTINCT dst_url, atext FROM a)
SELECT dst_url, string_agg(atext, ' ' ORDER BY atext) AS anchor_doc,
       count(*) AS n_anchors
FROM d GROUP BY dst_url
"""


# ---------------------------------------------------------------------------
# PMI collocations — top-k word bigrams by pointwise mutual information
# ---------------------------------------------------------------------------
# Classic corpus-analysis operator (Church & Hanks 1990): score each
# adjacent word pair by ln(c12·T / (c1·c2)) where c12 is the bigram count,
# c1/c2 the first-/second-position marginals and T the total bigram count,
# keep pairs seen ≥ _PMI_MIN_COUNT times, return the global top-k.
#
# Scale shape: per-batch PARTIAL bigram counts (np.unique over the batch's
# adjacency keys) pre-aggregate before the ONE (w1,w2) groupby shuffle —
# the only all-to-all, over vocab²-bounded pre-summed rows, not corpus
# tokens. The marginals are derived FROM the grouped table (c1 = Σ_w2 c12
# exactly), packed by one Ray task into sorted-vocab numpy arrays and
# broadcast — vocab is the small side by Heaps's law. Scoring re-reads the
# grouped blocks by ref (no re-execution), prunes each batch to its own
# top-k under the SAME total order as the final sort (safe: the global
# top-k is a subset of the union of per-batch top-ks), so the final
# sort+limit sees ≤ k·num_blocks rows. c12·T stays int64-exact below 2^53
# (guaranteed at test scale; the float64 path above it shifts the 6th
# decimal only at measure-zero boundaries).

_PMI_MIN_COUNT = 3
_PMI_TOPK = 100


def _pmi_partial_counts(t: pa.Table) -> pa.Table:
    """Batch → pre-aggregated (w1, w2, c) adjacent-bigram partial counts."""
    words, doc_idx = _lm_flat_words(t)
    uw, codes = np.unique(words, return_inverse=True)
    nu = max(len(uw), 1)
    adj = doc_idx[1:] == doc_idx[:-1]
    key = codes[:-1][adj] * nu + codes[1:][adj]
    bk, bc = np.unique(key, return_counts=True)
    return pa.table({
        "w1": pa.array(uw[bk // nu], pa.string()),
        "w2": pa.array(uw[bk % nu], pa.string()),
        "c": pa.array(bc.astype(np.int64), pa.int64()),
    })


def q_pmi_bigrams(sf_dir: str):
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    docs = _docs(sf_dir, ["doc_id", "text"])
    grouped = docs.map_batches(
        _pmi_partial_counts, batch_format="pyarrow"
    ).groupby(["w1", "w2"]).aggregate(Sum("c", alias_name="c"))
    grouped_refs = grouped.to_arrow_refs()

    def _marginals(*tables):
        live = [x for x in tables if x.num_columns]
        if not live:
            return (np.empty(0, object), np.empty(0, np.int64),
                    np.empty(0, object), np.empty(0, np.int64), 0)
        t = pa.concat_tables(live, promote_options="none")
        w1 = np.asarray(t["w1"].combine_chunks(), dtype=object)
        w2 = np.asarray(t["w2"].combine_chunks(), dtype=object)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        v1, i1 = np.unique(w1, return_inverse=True)
        v2, i2 = np.unique(w2, return_inverse=True)
        c1 = np.bincount(i1, weights=c, minlength=len(v1)).astype(np.int64)
        c2 = np.bincount(i2, weights=c, minlength=len(v2)).astype(np.int64)
        return v1, c1, v2, c2, int(c.sum())

    marg_ref = ray.remote(num_cpus=1)(_marginals).remote(*grouped_refs)

    def score(t: pa.Table) -> pa.Table:
        v1, c1, v2, c2, total = ray.get(marg_ref)
        # to_arrow_refs can yield SCHEMA-LESS empty blocks (house gotcha)
        c = (t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
             if t.num_columns else np.empty(0, np.int64))
        keep = c >= _PMI_MIN_COUNT
        if not keep.any():
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64()),
                             "pmi": pa.array([], pa.float64())})
        w1 = np.asarray(t["w1"].combine_chunks(), dtype=object)[keep]
        w2 = np.asarray(t["w2"].combine_chunks(), dtype=object)[keep]
        c = c[keep]
        m1 = c1[np.searchsorted(v1, w1)]
        m2 = c2[np.searchsorted(v2, w2)]
        pmi = _round6_half_up(np.log((c * total) / (m1 * m2)))
        # per-batch prune under the final (pmi desc, w1, w2) total order
        order = np.lexsort((w2, w1, -pmi))[:_PMI_TOPK]
        return pa.table({
            "w1": pa.array(w1[order], pa.string()),
            "w2": pa.array(w2[order], pa.string()),
            "c": pa.array(c[order], pa.int64()),
            "pmi": pa.array(pmi[order], pa.float64()),
        })

    scored = rd.from_arrow_refs(grouped_refs).map_batches(
        score, batch_format="pyarrow")
    return scored.sort(["pmi", "w1", "w2"],
                       descending=[True, False, False]).limit(_PMI_TOPK)


SQL_PMI_BIGRAMS = f"""
WITH n AS (SELECT doc_id, {_SQL_NORM_PADDED} AS norm FROM documents),
t AS (SELECT doc_id,
        list_filter(string_split(norm, ' '), x -> x <> '') AS ws FROM n),
big AS (SELECT doc_id,
          unnest(ws[1:len(ws)-1]) AS w1,
          unnest(ws[2:len(ws)]) AS w2
        FROM t WHERE len(ws) >= 2),
c12 AS (SELECT w1, w2, count(*) AS c FROM big GROUP BY w1, w2),
m1 AS (SELECT w1, sum(c) AS c1 FROM c12 GROUP BY w1),
m2 AS (SELECT w2, sum(c) AS c2 FROM c12 GROUP BY w2),
tot AS (SELECT sum(c) AS total FROM c12)
SELECT c12.w1, c12.w2, c12.c,
       floor(ln((c12.c * tot.total) / (m1.c1 * m2.c2)) * 1000000 + 0.5)
         / 1000000 AS pmi
FROM c12
JOIN m1 ON c12.w1 = m1.w1
JOIN m2 ON c12.w2 = m2.w2
CROSS JOIN tot
WHERE c12.c >= {_PMI_MIN_COUNT}
ORDER BY pmi DESC, c12.w1, c12.w2
LIMIT {_PMI_TOPK}
"""


# ---------------------------------------------------------------------------
# BM25 per-doc top-k terms — the IR-standard saturation-weighted variant of
# the TF-IDF operator above; same broadcast-idf shape (the per-doc side
# never shuffles), plus the document-length normalization BM25 adds: dl and
# avgdl come from one extra bounded aggregate pass (a single float), and
# the Robertson idf ln((N - df + 0.5)/(df + 0.5) + 1) is rounded through
# the shared half-up rule BEFORE scoring on BOTH engines (the tfidf_topk
# convention). k1/b and the score expression are f-string-shared with the
# oracle, parenthesized identically so float64 evaluation order matches.
# ---------------------------------------------------------------------------

_BM25_K1 = 1.2
_BM25_B = 0.75


def q_bm25_topk(sf_dir: str, k: int = _TFIDF_K):
    import ray

    from ..functions.normalize import normalize_array
    from .queries import _QCFG, _word_df_ds

    n_docs = _docs(sf_dir, ["doc_id"]).count()

    def tok_count(t: pa.Table) -> pa.Table:
        norm = normalize_array(t["text"], _QCFG.max_chars, _QCFG.n_grams)
        wl = pc.split_pattern(norm, pattern=" ")
        flat = wl.values
        n = int(pc.sum(pc.cast(pc.not_equal(flat, ""), pa.int64())).as_py()
                or 0)
        return pa.table({"n_tok": pa.array([n], pa.int64())})

    from ray.data.aggregate import Sum

    total_tokens = _docs(sf_dir, ["text"]) \
        .map_batches(tok_count, batch_format="pyarrow") \
        .aggregate(Sum("n_tok", alias_name="n"))["n"] or 0
    avgdl = total_tokens / n_docs

    blocks = [t for t in ray.get(_word_df_ds(sf_dir).to_arrow_refs())
              if t.num_columns]
    idf_tbl = pa.concat_tables(blocks, promote_options="none")
    words = np.asarray(idf_tbl["word"].combine_chunks(), dtype=object)
    order = np.argsort(words)
    sorted_words = words[order]
    df = idf_tbl["df"].to_numpy(zero_copy_only=False).astype(np.float64)
    idf_vals = _round6_half_up(
        np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0))[order]
    ref = ray.put((sorted_words, idf_vals))

    def fn(t: pa.Table) -> pa.Table:
        svoc, sidf = ray.get(ref)
        norm = normalize_array(t["text"], _QCFG.max_chars, _QCFG.n_grams)
        wl = pc.split_pattern(norm, pattern=" ")
        if isinstance(wl, pa.ChunkedArray):
            wl = wl.combine_chunks()
        lens = np.diff(np.asarray(wl.offsets))
        doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), lens)
        enc = wl.values.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = np.asarray(enc.dictionary, dtype=object)
        v = max(len(vocab), 1)
        ok = np.array([len(w) > 0 for w in vocab], dtype=bool)
        dl = np.bincount(doc_idx[ok[codes]], minlength=len(t))  # tokens/doc
        keys, tf = np.unique(doc_idx * v + codes, return_counts=True)
        d, c = keys // v, keys % v
        m = ok[c]
        d, c, tf = d[m], c[m], tf[m].astype(np.float64)
        pos = np.searchsorted(svoc, vocab[c])
        dl_ratio = dl[d] / avgdl
        score = _round6_half_up(
            (sidf[pos] * (tf * (_BM25_K1 + 1.0)))
            / (tf + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * dl_ratio)))
        lex_rank = np.empty(len(vocab), np.int64)
        lex_rank[np.argsort(vocab)] = np.arange(len(vocab))
        ordr = np.lexsort((lex_rank[c], -score, d))
        d, c, score = d[ordr], c[ordr], score[ordr]
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        rank = np.arange(len(d)) - np.repeat(
            starts, np.diff(np.r_[starts, len(d)]))
        top = rank < k
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids[d[top]], pa.int64()),
            "word": pa.array(vocab[c[top]], pa.string()),
            "rank": pa.array(rank[top] + 1, pa.int64()),
            "score": pa.array(score[top], pa.float64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow")


SQL_BM25_TOPK = f"""
WITH n AS (SELECT doc_id, {_SQL_NORM_PADDED} AS norm FROM documents),
w AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS word FROM n),
tf AS (SELECT doc_id, word, count(*) AS tf FROM w WHERE word <> ''
       GROUP BY doc_id, word),
dls AS (SELECT doc_id, count(*) AS dl FROM w WHERE word <> ''
        GROUP BY doc_id),
consts AS (SELECT (SELECT count(*) FROM documents) AS nd,
                  (SELECT count(*) FROM w WHERE word <> '') * 1.0
                    / (SELECT count(*) FROM documents) AS avgdl),
d AS (SELECT word,
             floor(ln((consts.nd - count(DISTINCT doc_id) + 0.5)
                      / (count(DISTINCT doc_id) + 0.5) + 1.0)
                   * 1000000 + 0.5) / 1000000 AS idf
      FROM w, consts WHERE word <> '' GROUP BY word, consts.nd),
s AS (SELECT tf.doc_id, tf.word,
        floor(((d.idf * (tf.tf * {_BM25_K1 + 1.0}))
               / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                  + {_BM25_B} * (CAST(dls.dl AS DOUBLE) / consts.avgdl))))
              * 1000000 + 0.5) / 1000000 AS score
      FROM tf JOIN d USING (word) JOIN dls USING (doc_id), consts),
r AS (SELECT *, row_number() OVER
        (PARTITION BY doc_id ORDER BY score DESC, word) AS rank FROM s)
SELECT doc_id, word, rank, score FROM r WHERE rank <= {_TFIDF_K}
"""


WEB_QUERIES = {
    "url_dedup_latest": q_url_dedup_latest,
    "bm25_topk": q_bm25_topk,
    "link_graph": q_link_graph,
    "gopher_quality": q_gopher_quality,
    "tfidf_topk": q_tfidf_topk,
    "lm_score": q_lm_score,
    "pagerank": q_pagerank,
    "pmi_bigrams": q_pmi_bigrams,
    "anchor_text": q_anchor_text,
    "snapshot_changes": q_snapshot_changes,
}

WEB_ORACLES = {
    "url_dedup_latest": _sql_url_dedup_latest(),
    "bm25_topk": SQL_BM25_TOPK,
    "link_graph": SQL_LINK_GRAPH,
    "gopher_quality": SQL_GOPHER_QUALITY,
    "tfidf_topk": SQL_TFIDF_TOPK,
    "lm_score": SQL_LM_SCORE,
    "pagerank": _sql_pagerank(),
    "pmi_bigrams": SQL_PMI_BIGRAMS,
    "anchor_text": SQL_ANCHOR_TEXT,
    "snapshot_changes": _sql_snapshot_changes(),
}

# Merge into the main catalog regardless of import order (queries.py tail
# imports this module; if THIS module is imported first, its own tail
# merges — the queries_corpus convention).
from .queries import ORACLES as _MAIN_ORACLES  # noqa: E402
from .queries import QUERIES as _MAIN_QUERIES  # noqa: E402

_MAIN_QUERIES.update(WEB_QUERIES)
_MAIN_ORACLES.update(WEB_ORACLES)
