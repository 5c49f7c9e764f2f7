"""Join-algorithm + index tier (round 4d): the join shapes the brief names
that the catalog did not yet cover as first-class operators —

- ``range_join`` — interval/band join (the "range join" of the brief's
  custom-operator list): every (purchase, click) pair for the same user
  with the click inside a 2-hour window ending at the purchase. As-of
  (`stages/asof.py`) returns the NEAREST predecessor; a range join returns
  ALL rows in the band, so its output is the band cross-product and the
  kernel must bound work per key, not per row.
- ``prefix_jaccard_join`` — EXACT set-similarity self-join (word-BIGRAM
  set Jaccard ≥ t) with PPJoin-style prefix filtering (Chaudhuri et al.,
  ICDE'06; Xiao et al., WWW'08): order every document's token set by
  global document frequency ascending, index only each document's first
  ``|d| - ceil(t·|d|) + 1`` tokens, and any pair with Jaccard ≥ t is
  guaranteed to collide on at least one indexed token. This is the exact
  complement of the MinHash/LSH tier (`stages/lsh.py`): no false
  negatives, with candidate volume bounded by the DF of the RAREST tokens
  (the df-ascending order is what keeps posting runs short). Tokens are
  word bigrams, not words: the synthetic corpus draws from a ~31-word
  vocabulary, so unigram SETS are degenerate (every doc ≈ the whole
  vocabulary, all-pairs Jaccard ≈ 1); bigram sets separate true
  near-dups (25–28 pairs at ≥ 0.6) from noise. Bigram identity is the
  64-bit chain hash (`functions/shingles.py:word_ngram_hashes`), the
  same ~2⁻⁶⁴-collision convention as the fingerprint operator.
- ``posting_lists`` — inverted-index build (term → df + sorted postings):
  the index-construction operator behind the matcher's CSR index
  (`stages/matcher.py`) expressed as a dataset-to-dataset transform.

No reference analogue — reference file n/a; these extend the
LLM-training-data surface beyond the reference's scope (the reference's
only join is the exact-hash lookup, `predict.py:24-43`).

Scale notes (partitioning assumptions, per the custom-operator rule):
- range_join co-partitions both sides by ``user_id % P`` (ONE shuffle),
  sorts each partition once, and emits per-user band pairs with a fully
  vectorized grouped-tile expansion. Per-user work is O(p_u · c_u) — the
  true output complexity of a band join under skew; a hot user bounds to
  the band width once inputs are time-bucketed, which at 100 TB is the
  same (user, day) composite-key salt the sessionizer would use.
- prefix_jaccard_join shuffles only PREFIX postings (the t-fraction tail
  of every document, its globally rarest tokens), partitions candidate
  generation by token rank, dedupes pairs on a left-id partition, and
  verifies against a broadcast CSR of token-code sets (the small-side
  assumption — both-sides-large fuzzy joins are `pipelines/fuzzy_join.py`).
- posting_lists pre-aggregates distinct (doc, word) per batch, then one
  coarse ``hash(word) % P`` shuffle; the per-partition fold is one lexsort
  + run detection, with the only Python loop bounded by the partition's
  VOCABULARY (not its occurrences).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash_strings
from ..functions.normalize import normalize_array
from .queries import _QCFG, _SQL_NORM, _docs, _read, _round6_half_up

# ---------------------------------------------------------------------------
# range / band join
# ---------------------------------------------------------------------------

_RANGE_WINDOW_US = 2 * 3600 * 1_000_000  # 2-hour band, microseconds


def q_range_join(sf_dir: str, num_partitions: int = 32):
    """Band join: all (purchase, click) same-user pairs with
    ``purchase.ts - 2h < click.ts <= purchase.ts``.

    ONE shuffle (user_id % P co-partition), then per partition: one
    lexsort of each side and a vectorized grouped-tile expansion — for
    every purchase, the user's click slice is located with two
    searchsorted calls, the (purchase, click-offset) index grid is built
    with repeat/arange (no Python loop), and the band filter is applied
    to the expanded timestamps.
    """
    def add_part(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        keep = pc.or_(pc.equal(et, "purchase"), pc.equal(et, "click"))
        t = t.filter(keep)
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("part", pa.array(u % num_partitions, pa.int64()))

    def per_partition(g: pa.Table, **_kwargs) -> pa.Table:
        empty = pa.table({"purchase_id": pa.array([], pa.int64()),
                          "click_id": pa.array([], pa.int64()),
                          "gap_us": pa.array([], pa.int64())})
        et = np.asarray(g["event_type"].to_numpy(zero_copy_only=False), dtype=object)
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pm = et == "purchase"
        cm = et == "click"
        pu, pt_, pe = uid[pm], ts[pm], eid[pm]
        cu, ct, ce = uid[cm], ts[cm], eid[cm]
        if len(pu) == 0 or len(cu) == 0:
            return empty
        co = np.lexsort((ce, ct, cu))
        cu, ct, ce = cu[co], ct[co], ce[co]
        start = np.searchsorted(cu, pu, side="left")
        end = np.searchsorted(cu, pu, side="right")
        counts = end - start
        total = int(counts.sum())
        if total == 0:
            return empty
        rep = np.repeat(np.arange(len(pu), dtype=np.int64), counts)
        base = np.repeat(np.cumsum(counts) - counts, counts)
        cidx = start[rep] + (np.arange(total, dtype=np.int64) - base)
        gap = pt_[rep] - ct[cidx]
        keep = (gap >= 0) & (gap < _RANGE_WINDOW_US)
        return pa.table({"purchase_id": pa.array(pe[rep[keep]], pa.int64()),
                         "click_id": pa.array(ce[cidx[keep]], pa.int64()),
                         "gap_us": pa.array(gap[keep], pa.int64())})

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    return ev.map_batches(add_part, batch_format="pyarrow") \
        .groupby("part").map_groups(per_partition, batch_format="pyarrow") \
        .select_columns(["purchase_id", "click_id", "gap_us"])


SQL_RANGE_JOIN = """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
     c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
SELECT p.event_id AS purchase_id, c.event_id AS click_id,
       date_diff('microsecond', c.ts, p.ts) AS gap_us
FROM p JOIN c ON p.user_id = c.user_id
 AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL 2 HOUR
"""


# ---------------------------------------------------------------------------
# shared: distinct (doc_id, word) explode — vectorized, no per-row Python
# ---------------------------------------------------------------------------

def _distinct_doc_words(t: pa.Table) -> tuple[np.ndarray, pa.Array, np.ndarray]:
    """(doc_ids, vocab, word_codes) for the DISTINCT (doc, word) pairs of
    one batch — dictionary-encode + packed-key np.unique (the certified
    `_word_df_ds` construction, pair-preserving variant)."""
    norm = normalize_array(t["text"], _QCFG.max_chars, _QCFG.n_grams)
    words = pc.split_pattern(norm, pattern=" ")
    flat = words.values
    lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), lens)
    enc = flat.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = enc.dictionary
    v = len(vocab)
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    if v == 0:
        return ids[:0], vocab, codes[:0]
    uniq = np.unique(doc_idx * v + codes)
    return ids[uniq // v], vocab, (uniq % v).astype(np.int64)


# ---------------------------------------------------------------------------
# prefix-filter exact Jaccard self-join (PPJoin-lite)
# ---------------------------------------------------------------------------

_PJ_THRESHOLD = 0.6   # shared by the pipeline default AND the SQL oracle
_PJ_SEED = 5          # word-hash seed for the bigram chain


def _distinct_doc_bigrams(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(doc_ids, bigram_hash) for the DISTINCT (doc, word-bigram) pairs of
    one batch — `word_ngram_hashes` occurrences deduped per row with one
    lexsort."""
    from ..functions.shingles import word_ngram_hashes

    norm = normalize_array(t["text"], _QCFG.max_chars, _QCFG.n_grams)
    row_idx, grams = word_ngram_hashes(norm, 2, seed=_PJ_SEED)
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(row_idx) == 0:
        return ids[:0], grams[:0]
    o = np.lexsort((grams, row_idx))
    r, g = row_idx[o], grams[o]
    new = np.ones(len(r), dtype=bool)
    new[1:] = (r[1:] != r[:-1]) | (g[1:] != g[:-1])
    return ids[r[new]], g[new]


def q_prefix_jaccard_join(sf_dir: str, threshold: float = _PJ_THRESHOLD,
                          num_partitions: int = 32):
    """Exact word-bigram-set Jaccard ≥ ``threshold`` self-join via prefix
    filtering. Output: (left_id, right_id, jaccard), left < right.

    Stage 1 — global token order: bigram document frequency ascending
    (ties by hash), from a per-batch distinct partial + one gram groupby,
    broadcast as a rank table (gram-vocabulary-bounded small side,
    ray.put once). ANY consistent global order preserves the prefix
    guarantee, so ordering by the 64-bit gram hash needs no SQL mirror.
    Stage 2 — prefix postings: each doc emits its ``s - ceil(t·s) + 1``
    RAREST tokens (one lexsort per batch). Only this t-fraction tail ever
    shuffles.
    Stage 3 — candidates: postings partitioned by ``rank % P``; inside a
    partition, pairs are emitted per token run (runs are short by
    construction: a prefix token's run length ≤ its global DF, and prefix
    tokens are the globally rarest). Pair dedup is a second coarse
    partition on left_id (a pair always lands in its left doc's
    partition, so one np.unique per partition is a GLOBAL dedup).
    Stage 4 — verify: exact Jaccard against a broadcast CSR of
    rank-encoded token sets (small-side assumption; both-sides-large is
    `pipelines/fuzzy_join.py`). Pairs are load-balanced by the dedup
    partition, and each pair costs one sorted-intersect.
    """
    import ray
    from ray.data.aggregate import Sum

    # ONE corpus scan: the distinct (doc, gram) explode is materialized
    # once and feeds all three consumers (DF table, prefix postings, verify
    # CSR) — normalize + hash never re-run (the dedup-pipeline _pin_refs
    # lesson: lazy fan-out re-executes the whole upstream chain per branch).
    def explode(t: pa.Table) -> pa.Table:
        ids, grams = _distinct_doc_bigrams(t)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "gram": pa.array(grams.view(np.int64), pa.int64())})

    pairs_ds = _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(explode, batch_format="pyarrow").materialize()

    # stage 1 — DF-ascending global rank (gram-vocab-bounded broadcast)
    def df_partial(t: pa.Table) -> pa.Table:
        ug, cnt = np.unique(t["gram"].to_numpy(zero_copy_only=False),
                            return_counts=True)
        return pa.table({"gram": pa.array(ug, pa.int64()),
                         "df_part": pa.array(cnt.astype(np.int64), pa.int64())})

    df_rows = pairs_ds.map_batches(df_partial, batch_format="pyarrow") \
        .groupby("gram").aggregate(Sum("df_part", alias_name="df")).take_all()
    grams_all = np.asarray([r["gram"] for r in df_rows], dtype=np.int64)
    dfs = np.asarray([r["df"] for r in df_rows], dtype=np.int64)
    order = np.lexsort((grams_all, dfs))
    rank_of = np.empty(len(grams_all), dtype=np.int64)
    rank_of[order] = np.arange(len(grams_all), dtype=np.int64)
    # lookups stay in the SIGNED int64 domain (grams shipped through Arrow
    # as int64 bit-patterns): sort signed, probe signed
    lex = np.argsort(grams_all)
    rank_ref = ray.put((grams_all[lex], rank_of[lex]))

    def prefix_postings(t: pa.Table) -> pa.Table:
        # batch_size=None ⇒ whole materialized blocks, so every doc's rows
        # arrive together (the explode emits each doc within one block)
        gs, rs = ray.get(rank_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        grams = t["gram"].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({"rank": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "size": pa.array([], pa.int64())})
        ranks = rs[np.searchsorted(gs, grams)]
        o = np.lexsort((ranks, ids))
        ids, ranks = ids[o], ranks[o]
        new = np.ones(len(ids), dtype=bool)
        new[1:] = ids[1:] != ids[:-1]
        run_id = np.cumsum(new) - 1
        sizes = np.bincount(run_id)
        starts = np.nonzero(new)[0]
        offset = np.arange(len(ids)) - starts[run_id]
        # prefix length L = s - ceil(t*s) + 1
        pref_len = sizes - np.ceil(threshold * sizes).astype(np.int64) + 1
        keep = offset < pref_len[run_id]
        return pa.table({"rank": pa.array(ranks[keep], pa.int64()),
                         "doc_id": pa.array(ids[keep], pa.int64()),
                         "size": pa.array(sizes[run_id][keep], pa.int64())})

    postings = pairs_ds.map_batches(prefix_postings, batch_format="pyarrow",
                                    batch_size=None)

    def add_tok_part(t: pa.Table) -> pa.Table:
        r = t["rank"].to_numpy(zero_copy_only=False)
        return t.append_column("part", pa.array(r % num_partitions, pa.int64()))

    def gen_pairs(g: pa.Table, **_kwargs) -> pa.Table:
        rk = g["rank"].to_numpy(zero_copy_only=False)
        ids = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sz = g["size"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((ids, rk))
        rk, ids, sz = rk[o], ids[o], sz[o]
        new = np.ones(len(rk), dtype=bool)
        new[1:] = rk[1:] != rk[:-1]
        starts = np.nonzero(new)[0]
        ends = np.append(starts[1:], len(rk))
        out_l, out_r = [], []
        for s, e in zip(starts, ends):       # loop over token runs — run
            r = e - s                        # length ≤ token's global DF
            if r < 2:
                continue
            li, ri = np.triu_indices(r, k=1)
            a, b = ids[s + li], ids[s + ri]
            # PPJoin length filter: J ≥ t ⇒ min(|a|,|b|) ≥ t·max(|a|,|b|)
            # — kills the bulk of the candidate volume before any shuffle
            sa, sb = sz[s + li], sz[s + ri]
            ok = np.minimum(sa, sb) >= threshold * np.maximum(sa, sb)
            a, b = a[ok], b[ok]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            out_l.append(lo)
            out_r.append(hi)
        if not out_l:
            return pa.table({"left_id": pa.array([], pa.int64()),
                             "right_id": pa.array([], pa.int64())})
        return pa.table({"left_id": pa.array(np.concatenate(out_l), pa.int64()),
                         "right_id": pa.array(np.concatenate(out_r), pa.int64())})

    cands = postings.map_batches(add_tok_part, batch_format="pyarrow") \
        .groupby("part").map_groups(gen_pairs, batch_format="pyarrow")

    def add_left_part(t: pa.Table) -> pa.Table:
        l = t["left_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("part", pa.array(l % num_partitions, pa.int64()))

    def dedup_pairs(g: pa.Table, **_kwargs) -> pa.Table:
        l = g["left_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = g["right_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((r, l))
        l, r = l[o], r[o]
        new = np.ones(len(l), dtype=bool)
        new[1:] = (l[1:] != l[:-1]) | (r[1:] != r[:-1])
        return pa.table({"left_id": pa.array(l[new], pa.int64()),
                         "right_id": pa.array(r[new], pa.int64())})

    pairs = cands.map_batches(add_left_part, batch_format="pyarrow") \
        .groupby("part").map_groups(dedup_pairs, batch_format="pyarrow")

    # stage 4 — broadcast CSR of token sets (sorted per doc). Gram VALUES,
    # not ranks, key the intersection — any consistent id domain works, and
    # reusing the materialized explode avoids a second corpus scan.
    set_rows = pairs_ds.take_all()
    sd = np.asarray([r["doc_id"] for r in set_rows], dtype=np.int64)
    sr = np.asarray([r["gram"] for r in set_rows], dtype=np.int64)
    o = np.lexsort((sr, sd))
    sd, sr = sd[o], sr[o]
    uids = np.unique(sd)
    starts = np.searchsorted(sd, uids)
    ends = np.append(starts[1:], len(sd))
    csr_ref = ray.put((uids, starts, ends, sr))

    def verify(t: pa.Table) -> pa.Table:
        du, ds_, de, flat = ray.get(csr_ref)
        l = t["left_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = t["right_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        li = np.searchsorted(du, l)
        ri = np.searchsorted(du, r)
        out_l, out_r, out_j = [], [], []
        for k in range(len(l)):
            a = flat[ds_[li[k]]:de[li[k]]]
            b = flat[ds_[ri[k]]:de[ri[k]]]
            isz = len(np.intersect1d(a, b, assume_unique=True))
            union = len(a) + len(b) - isz
            if union and isz / union >= threshold:
                out_l.append(int(l[k]))
                out_r.append(int(r[k]))
                out_j.append(isz / union)
        return pa.table({
            "left_id": pa.array(out_l, pa.int64()),
            "right_id": pa.array(out_r, pa.int64()),
            "jaccard": pa.array(
                _round6_half_up(np.asarray(out_j, dtype=np.float64)),
                pa.float64()),
        })

    return pairs.select_columns(["left_id", "right_id"]) \
        .map_batches(verify, batch_format="pyarrow")


# Word-bigram sets as STRINGS in SQL (the Ray side uses the 64-bit gram
# hash; identical modulo ~2^-64 collisions — the fingerprint-operator
# convention). Fixed-range generate_series + WHERE guard (DuckDB 1.0 has
# no WITH ORDINALITY); 1024 covers the corpus's ≤99 words/doc with margin.
SQL_PREFIX_JACCARD_JOIN = f"""
WITH n AS (SELECT doc_id, string_split({_SQL_NORM}, ' ') AS ws FROM documents),
e AS (SELECT doc_id, ws, unnest(generate_series(1, 1024)) AS i FROM n),
b AS (SELECT DISTINCT doc_id,
             list_extract(ws, i) || ' ' || list_extract(ws, i + 1) AS gram
      FROM e WHERE i + 1 <= length(ws)),
c AS (SELECT doc_id, count(*) AS sz FROM b GROUP BY doc_id),
i AS (SELECT a.doc_id AS l, b2.doc_id AS r, count(*) AS isz
      FROM b a JOIN b b2 ON a.gram = b2.gram AND a.doc_id < b2.doc_id
      GROUP BY a.doc_id, b2.doc_id)
SELECT i.l AS left_id, i.r AS right_id,
       floor(i.isz * 1.0 / (ca.sz + cb.sz - i.isz) * 1000000 + 0.5) / 1000000
         AS jaccard
FROM i JOIN c ca ON ca.doc_id = i.l JOIN c cb ON cb.doc_id = i.r
WHERE i.isz * 1.0 / (ca.sz + cb.sz - i.isz) >= {_PJ_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# inverted-index build (posting lists)
# ---------------------------------------------------------------------------

def q_posting_lists(sf_dir: str, num_partitions: int = 32):
    """Inverted index: word → (df, comma-joined sorted doc_id postings).

    Per-batch distinct (doc, word) pre-aggregation, ONE coarse
    ``hash_strings(word) % P`` shuffle, then a per-partition lexsort +
    run-detection fold. int→str is vectorized (np.char.mod); the only
    Python loop is one ``join`` per vocabulary entry of the partition.
    """
    def explode(t: pa.Table) -> pa.Table:
        ids, vocab, codes = _distinct_doc_words(t)
        if len(ids) == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "part": pa.array([], pa.int64())})
        h = hash_strings(vocab, seed=11)
        part = (h % np.uint64(num_partitions)).astype(np.int64)
        nonempty = np.asarray(
            pc.not_equal(vocab, "").to_numpy(zero_copy_only=False))
        keep = nonempty[codes]
        return pa.table({"word": vocab.take(pa.array(codes[keep], pa.int64())),
                         "doc_id": pa.array(ids[keep], pa.int64()),
                         "part": pa.array(part[codes[keep]], pa.int64())})

    def fold(g: pa.Table, **_kwargs) -> pa.Table:
        w = np.asarray(g["word"].to_numpy(zero_copy_only=False), dtype=object)
        d = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((d, w))
        w, d = w[o], d[o]
        # drop duplicate (word, doc) pairs arriving from different batches
        new_pair = np.ones(len(w), dtype=bool)
        new_pair[1:] = (w[1:] != w[:-1]) | (d[1:] != d[:-1])
        w, d = w[new_pair], d[new_pair]
        new_w = np.ones(len(w), dtype=bool)
        new_w[1:] = w[1:] != w[:-1]
        starts = np.nonzero(new_w)[0]
        ends = np.append(starts[1:], len(w))
        dstr = np.char.mod("%d", d)
        posts = [",".join(dstr[s:e]) for s, e in zip(starts, ends)]
        return pa.table({"word": pa.array(w[new_w], pa.string()),
                         "df": pa.array(ends - starts, pa.int64()),
                         "postings": pa.array(posts, pa.string())})

    return _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(explode, batch_format="pyarrow") \
        .groupby("part").map_groups(fold, batch_format="pyarrow") \
        .select_columns(["word", "df", "postings"])


SQL_POSTING_LISTS = f"""
WITH n AS (SELECT doc_id, {_SQL_NORM} AS norm FROM documents),
w AS (SELECT DISTINCT doc_id, unnest(string_split(norm, ' ')) AS word
      FROM n WHERE norm <> '')
SELECT word, count(*) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM w GROUP BY word
"""


JOIN_QUERIES = {
    "range_join": q_range_join,
    "prefix_jaccard_join": q_prefix_jaccard_join,
    "posting_lists": q_posting_lists,
}

JOIN_ORACLES = {
    "range_join": SQL_RANGE_JOIN,
    "prefix_jaccard_join": SQL_PREFIX_JACCARD_JOIN,
    "posting_lists": SQL_POSTING_LISTS,
}

# Merge into the main catalog regardless of import order (the
# queries_corpus/queries_web/queries_quality convention).
from .queries import ORACLES as _MAIN_ORACLES  # noqa: E402
from .queries import QUERIES as _MAIN_QUERIES  # noqa: E402

_MAIN_QUERIES.update(JOIN_QUERIES)
_MAIN_ORACLES.update(JOIN_ORACLES)
