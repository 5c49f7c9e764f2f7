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


WEB_QUERIES = {
    "url_dedup_latest": q_url_dedup_latest,
    "link_graph": q_link_graph,
    "gopher_quality": q_gopher_quality,
    "tfidf_topk": q_tfidf_topk,
}

WEB_ORACLES = {
    "url_dedup_latest": _sql_url_dedup_latest(),
    "link_graph": SQL_LINK_GRAPH,
    "gopher_quality": SQL_GOPHER_QUALITY,
    "tfidf_topk": SQL_TFIDF_TOPK,
}

# Merge into the main catalog regardless of import order (queries.py tail
# imports this module; if THIS module is imported first, its own tail
# merges — the queries_corpus convention).
from .queries import ORACLES as _MAIN_ORACLES  # noqa: E402
from .queries import QUERIES as _MAIN_QUERIES  # noqa: E402

_MAIN_QUERIES.update(WEB_QUERIES)
_MAIN_ORACLES.update(WEB_ORACLES)
