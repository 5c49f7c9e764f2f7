"""Profiling + grouped-sampling + k-NN-join tier (round 4, third wave).

Three operators every production engine grows eventually, each in its
scale-correct Ray Data shape with a closed-form DuckDB oracle:

- ``table_profile`` — one-pass-per-aspect column profiler over the
  documents table (row/null counts, min/max, average length, exact
  distinct count per column). The distinct count is the expensive aspect
  at 100 TB: it is computed as a distinct-per-batch (col, value) explode →
  ONE packed-key groupby (shuffle cardinality = Σ per-column distinct
  values, not rows) → per-batch partial counts → a 3-row groupby-sum.
  At 100 TB you would swap the exact pass for the KMV/HLL sketches in
  ``queries_sketches.py`` (same partial-combine shape, KB per column);
  the exact pass is the oracle-checkable baseline.
- ``sample_per_group`` — deterministic k-per-group sampling (k smallest
  fmix32(doc_id) per lang). Membership depends only on (id, seed): stable
  under retries / repartitioning / resume, unlike RNG reservoirs. The
  per-batch partial keeps at most k rows per group seen in the batch, so
  the ONE lang groupby moves O(k · groups · blocks) rows no matter how
  many documents stream through — the grouped analogue of
  ``sample_fraction``'s hash gate.
- ``knn_join`` — dataset-to-dataset embedding join: every ~29th vector is
  the query side (broadcast once), each gets its top-3 cosine neighbours
  from the full table, self-pairs masked inside the matmul
  (``stages/embed.py:knn_join``). The query side is packed OFF-DRIVER by
  a Ray task over ``to_arrow_refs`` blocks; the driver only holds the
  (n_queries × dim) matrix it must ``ray.put`` — the broadcast small side
  by contract.

No reference analogue — reference file n/a; these extend the
LLM-training-data surface beyond the reference's scope.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import fmix32
from .queries import _read, _round6_half_up

_PROFILE_COLS = ("lang", "source", "text")
_SPG_K = 5
_SPG_SEED = 11
_KNN_K = 3
_KNN_MOD = 29
_KNN_RES = 5
# \x1f (unit separator) never occurs in the testdata vocab; at 100 TB you
# would hash the (col, value) pair instead of packing strings (and certify
# collision-freedom the way bloom_delta certifies its text hashes).
_SEP = "\x1f"


# ---------------------------------------------------------------------------
# table_profile
# ---------------------------------------------------------------------------

def _stats_partial(t: pa.Table) -> pa.Table:
    """Per-batch per-column partial: (col, n, n_null, len_sum, mn, mx,
    n_distinct=0) — all Arrow kernels, no per-row Python. min/max over
    non-null values; None when the batch is all-null for that column.
    ``pc.utf8_length`` counts code points, matching both Python ``len``
    and DuckDB ``length``."""
    import pyarrow.compute as pc

    cols, ns, nulls, lsums, mns, mxs = [], [], [], [], [], []
    for c in _PROFILE_COLS:
        arr = t[c]
        cols.append(c)
        ns.append(len(arr))
        nulls.append(arr.null_count)
        ls = pc.sum(pc.utf8_length(arr)).as_py()  # null-skipping
        lsums.append(int(ls) if ls is not None else 0)
        mm = pc.min_max(arr)  # bytewise on UTF-8 = code-point order
        mns.append(mm["min"].as_py())
        mxs.append(mm["max"].as_py())
    return pa.table({
        "col": pa.array(cols), "n": pa.array(ns, pa.int64()),
        "n_null": pa.array(nulls, pa.int64()),
        "len_sum": pa.array(lsums, pa.int64()),
        "mn": pa.array(mns, pa.string()), "mx": pa.array(mxs, pa.string()),
        "n_distinct": pa.array([0] * len(cols), pa.int64()),
    })


def _distinct_explode(t: pa.Table) -> pa.Table:
    """Distinct non-null (col, value) pairs in this batch, packed as one
    key — Arrow unique + element-wise join, no per-row Python."""
    import pyarrow.compute as pc

    parts = []
    for c in _PROFILE_COLS:
        vals = pc.unique(t[c].combine_chunks().drop_null())
        prefix = pa.array([c + _SEP] * len(vals), pa.string())
        parts.append(pc.binary_join_element_wise(prefix, vals, ""))
    return pa.table({"key": pa.concat_arrays(
        [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
         for p in parts])})


def q_table_profile(sf_dir: str):
    """Per-column profile of the documents string columns: row count, null
    count, exact distinct count, lexicographic min/max (bytewise — UTF-8
    byte order equals code-point order, matching DuckDB's binary collation),
    and mean length (shared 6-decimal half-up rounding)."""
    import ray.data as rd

    # pin the read once: both the stats pass and the distinct pass consume
    # it, and a lazy fan-out would re-execute the parquet read per consumer
    # (the dedup.py:_pin_refs lesson).
    docs = rd.from_arrow_refs(
        _read(sf_dir, "documents", list(_PROFILE_COLS)).to_arrow_refs())

    # distinct counts: explode → packed-key groupby → per-batch partial
    # counts per column → 3-row groupby-sum, aligned to the stats schema.
    dist = docs.map_batches(_distinct_explode, batch_format="pyarrow") \
        .groupby("key").count()

    def dist_partial(t: pa.Table) -> pa.Table:
        # key blocks are distinct-value-scale — count per column with one
        # vectorized starts_with per bounded profile column, never a
        # Python split per key.
        import pyarrow.compute as pc

        cols, cnts = [], []
        for c in _PROFILE_COLS:
            m = pc.sum(pc.starts_with(t["key"], pattern=c + _SEP)).as_py()
            if m:
                cols.append(c)
                cnts.append(int(m))
        z = [0] * len(cols)
        return pa.table({
            "col": pa.array(cols, pa.string()), "n": pa.array(z, pa.int64()),
            "n_null": pa.array(z, pa.int64()),
            "len_sum": pa.array(z, pa.int64()),
            "mn": pa.array([None] * len(cols), pa.string()),
            "mx": pa.array([None] * len(cols), pa.string()),
            "n_distinct": pa.array(cnts, pa.int64()),
        })

    stats = docs.map_batches(_stats_partial, batch_format="pyarrow")
    both = stats.union(dist.map_batches(dist_partial, batch_format="pyarrow"))

    def fold(g: pa.Table, **_kw) -> pa.Table:
        n = int(np.sum(g["n"].to_numpy(zero_copy_only=False)))
        n_null = int(np.sum(g["n_null"].to_numpy(zero_copy_only=False)))
        len_sum = int(np.sum(g["len_sum"].to_numpy(zero_copy_only=False)))
        mns = [x for x in g["mn"].to_pylist() if x is not None]
        mxs = [x for x in g["mx"].to_pylist() if x is not None]
        nd = int(np.sum(g["n_distinct"].to_numpy(zero_copy_only=False)))
        nn = n - n_null
        avg = (float(_round6_half_up(np.asarray([len_sum / nn]))[0])
               if nn else None)
        return pa.table({
            "col": pa.array([g["col"][0].as_py()]),
            "n_rows": pa.array([n], pa.int64()),
            "n_null": pa.array([n_null], pa.int64()),
            "n_distinct": pa.array([nd], pa.int64()),
            "min_val": pa.array([min(mns) if mns else None], pa.string()),
            "max_val": pa.array([max(mxs) if mxs else None], pa.string()),
            "avg_len": pa.array([avg], pa.float64()),
        })

    return both.groupby("col").map_groups(fold, batch_format="pyarrow")


def _sql_profile_one(c: str) -> str:
    return f"""
SELECT '{c}' AS col, count(*) AS n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       count(DISTINCT {c}) AS n_distinct,
       min({c}) AS min_val, max({c}) AS max_val,
       floor(avg(length({c})) * 1000000 + 0.5) / 1000000 AS avg_len
FROM documents"""


SQL_TABLE_PROFILE = " UNION ALL ".join(
    _sql_profile_one(c) for c in _PROFILE_COLS)


# ---------------------------------------------------------------------------
# sample_per_group
# ---------------------------------------------------------------------------

def _spg_partial(t: pa.Table) -> pa.Table:
    """Per-batch partial: the k smallest (fmix32(doc_id), doc_id) per lang
    present in the batch — at most k · n_langs rows leave each batch."""
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    langs = np.asarray(t["lang"].to_numpy(zero_copy_only=False), dtype=object)
    hv = fmix32(ids.astype(np.uint64), seed=_SPG_SEED).astype(np.int64)
    groups, inv = np.unique(langs, return_inverse=True)
    order = np.lexsort((ids, hv, inv))
    gi = inv[order]
    new = np.ones(len(gi), dtype=bool)
    new[1:] = gi[1:] != gi[:-1]
    starts = np.nonzero(new)[0]
    rank = np.arange(len(gi)) - starts[np.cumsum(new) - 1]
    keep = order[rank < _SPG_K]
    return pa.table({
        "lang": pa.array(langs[keep]),
        "doc_id": pa.array(ids[keep], pa.int64()),
        "hv": pa.array(hv[keep], pa.int64()),
    })


def q_sample_per_group(sf_dir: str):
    """Deterministic k-per-lang document sample: the k smallest
    fmix32(doc_id, seed) per lang (ties by doc_id — exact hash ties are
    possible in a 32-bit range). Hash-rank membership is stable under
    retries / repartitioning / resume and exactly replayable in SQL."""
    docs = _read(sf_dir, "documents", ["doc_id", "lang"])
    parts = docs.map_batches(_spg_partial, batch_format="pyarrow")

    def fin(g: pa.Table, **_kw) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        hv = g["hv"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, hv))[:_SPG_K]
        return pa.table({
            "lang": pa.array([g["lang"][0].as_py()] * len(order)),
            "doc_id": pa.array(ids[order], pa.int64()),
        })

    return parts.groupby("lang").map_groups(fin, batch_format="pyarrow")


def _sql_fmix32(col: str, seed: int) -> str:
    """fmix32 over an integer column — the queries_sketches expression."""
    h0 = f"(xor({col}, {seed}) % 4294967296)"
    h1 = f"xor({h0}, {h0} >> 16)"
    h2 = f"CAST((CAST({h1} AS HUGEINT) * 2246822507) % 4294967296 AS BIGINT)"
    h3 = f"xor({h2}, {h2} >> 13)"
    h4 = f"CAST((CAST({h3} AS HUGEINT) * 3266489917) % 4294967296 AS BIGINT)"
    return f"CAST(xor({h4}, {h4} >> 16) AS BIGINT)"


SQL_SAMPLE_PER_GROUP = f"""
WITH h AS (SELECT lang, doc_id,
                  {_sql_fmix32('doc_id', _SPG_SEED)} AS hv
           FROM documents)
SELECT lang, doc_id FROM (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rn
  FROM h) WHERE rn <= {_SPG_K}
"""


# ---------------------------------------------------------------------------
# knn_join
# ---------------------------------------------------------------------------

def q_knn_join(sf_dir: str):
    """Embedding k-NN join: vectors with vec_id % 29 == 5 are the query
    side (~1/29 of the table — the broadcast-small side by contract);
    each gets its top-3 cosine neighbours from the FULL table, self
    excluded inside the kernel. Query side packed off-driver by one Ray
    task; the driver holds only the (n_queries × dim) matrix it must
    ray.put (the ann_topk convention). Sim rounded to 2 decimals — the
    shared embedding-oracle contract (float32-list cosine recomputed in
    float64 agrees to well under 1e-2 on this geometry)."""
    import ray

    from ..stages.embed import batch_matrix, knn_join

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def pick(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % _KNN_MOD == _KNN_RES))

    qds = emb.map_batches(pick, batch_format="pyarrow")

    @ray.remote
    def pack(*tables):
        live = [t for t in tables if t.num_columns > 0 and t.num_rows > 0]
        t = pa.concat_tables(live)
        return (t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64),
                batch_matrix(t))

    qids, qmat = ray.get(pack.remote(*qds.to_arrow_refs()))
    top = knn_join(emb, qids, qmat, k=_KNN_K)

    def fin(t: pa.Table) -> pa.Table:
        sims = t["sim"].to_numpy(zero_copy_only=False)
        return pa.table({
            "query_id": t["query_id"], "vec_id": t["vec_id"],
            "sim": pa.array(np.round(sims, 2), pa.float64()),
        })

    return top.map_batches(fin, batch_format="pyarrow")


SQL_KNN_JOIN = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
           WHERE vec_id % {_KNN_MOD} = {_KNN_RES})
SELECT qid AS query_id, e.vec_id,
       round(list_cosine_similarity(e.embedding, q.qe), 2) AS sim
FROM embeddings e, q WHERE e.vec_id <> q.qid
QUALIFY row_number() OVER (
  PARTITION BY qid
  ORDER BY list_cosine_similarity(e.embedding, q.qe) DESC, e.vec_id)
  <= {_KNN_K}
"""


# ---------------------------------------------------------------------------
# value_quantiles — exact quantiles over a CONTINUOUS domain
# ---------------------------------------------------------------------------

_VQ_PS = (0.5, 0.9, 0.99)
_VQ_W = 8.0                 # coarse bucket width (drill-down pass 1)


def q_value_quantiles(sf_dir: str):
    """EXACT per-event_type quantiles of the continuous ``value`` column —
    the drill-down complement of ``q_length_quantiles`` (whose bincount
    histogram needs a bounded INTEGER domain): pass 1 builds a coarse
    width-W bucket histogram (per-batch composite-key np.unique partials →
    ONE (event_type, bucket) groupby-sum; shuffle cardinality =
    value_range/W buckets per type, never rows) and locates, per (type,
    percentile), the bucket holding the lower-nearest-rank target; pass 2
    re-scans ONLY rows in the ≤ |types|·|ps| selected buckets (tiny set,
    shipped in the task closure) and grouby-sums their exact distinct
    values, so the driver's final selection state is O(distinct values
    within selected buckets) — recurse with a finer W when a single bucket
    is still too heavy (boilerplate-spike domains). No sort of the corpus,
    no sketch error: the output is an actual element, bit-equal to the SQL
    oracle's, with no rounding rule at all. Quantile definition shared
    with q_length_quantiles: q(p) = smallest v with running_count ≥
    ceil(p·n)."""
    import math

    import ray.data as rd
    from ray.data.aggregate import Sum

    # pinned once: pass 1 and pass 2 both scan it (_pin_refs lesson)
    ev = rd.from_arrow_refs(
        _read(sf_dir, "events", ["event_type", "value"]).to_arrow_refs())

    def part1(t: pa.Table) -> pa.Table:
        # bounded loop over the ≤ |types| event types in the batch (the
        # lang-loop convention), vectorized np.unique inside. NOT a packed
        # (type, bucket) int64 key: a wide value domain makes the bucket
        # index exceed 32 bits (v = 1e12, W = 8 → bucket ≈ 1.25e11), which
        # a bit-pack silently corrupts — caught by the pathological probe.
        et = np.asarray(t["event_type"].to_numpy(zero_copy_only=False),
                        dtype=object)
        v = t["value"].to_numpy(zero_copy_only=False)
        b = np.floor(v / _VQ_W).astype(np.int64)
        ets, bks, cnts = [], [], []
        for ty in np.unique(et):
            ub, cnt = np.unique(b[et == ty], return_counts=True)
            ets.extend([ty] * len(ub))
            bks.append(ub)
            cnts.append(cnt)
        empty = np.array([], np.int64)
        return pa.table({
            "event_type": pa.array(ets, pa.string()),
            "bucket": pa.array(np.concatenate(bks) if bks else empty,
                               pa.int64()),
            "cnt": pa.array(np.concatenate(cnts) if cnts else empty,
                            pa.int64()),
        })

    hist = ev.map_batches(part1, batch_format="pyarrow") \
        .groupby(["event_type", "bucket"]) \
        .aggregate(Sum("cnt", alias_name="cnt"))
    rows = hist.take_all()  # bounded: value_range/W buckets per type

    by_type: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append((r["bucket"], r["cnt"]))
    sel: set[tuple[str, int]] = set()
    targets = []  # (type, p, bucket, rank_within_bucket)
    for ty, bl in by_type.items():
        bl.sort()
        bs = np.array([b for b, _ in bl], np.int64)
        run = np.cumsum([c for _, c in bl])
        n = int(run[-1])
        for p in _VQ_PS:
            rank = max(1, math.ceil(p * n))
            i = int(np.searchsorted(run, rank))
            sel.add((ty, int(bs[i])))
            targets.append((ty, p, int(bs[i]),
                            rank - (int(run[i - 1]) if i else 0)))

    picked = sorted(sel)

    def part2(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_numpy(zero_copy_only=False),
                        dtype=object)
        v = t["value"].to_numpy(zero_copy_only=False)
        b = np.floor(v / _VQ_W).astype(np.int64)
        mask = np.zeros(len(v), dtype=bool)
        for ty, bk in picked:  # bounded: ≤ |types|·|ps| entries
            mask |= (et == ty) & (b == bk)
        et, v = et[mask], v[mask]
        # exact distinct (type, value) partial counts: bounded loop over
        # the ≤ |selected| types present, vectorized np.unique inside.
        # Doubles ride as their IEEE-754 bits (lossless int64 groupby key);
        # the final selection sorts the reconstructed floats, so bit-order
        # caveats for negatives never apply.
        ets, vbs, cnts = [], [], []
        for ty in np.unique(et):
            uv, cnt = np.unique(v[et == ty], return_counts=True)
            ets.extend([ty] * len(uv))
            vbs.append(uv.view(np.int64))
            cnts.append(cnt)
        empty = np.array([], np.int64)
        return pa.table({
            "event_type": pa.array(ets, pa.string()),
            "vbits": pa.array(np.concatenate(vbs) if vbs else empty,
                              pa.int64()),
            "cnt": pa.array(np.concatenate(cnts) if cnts else empty,
                            pa.int64()),
        })

    fine = ev.map_batches(part2, batch_format="pyarrow") \
        .groupby(["event_type", "vbits"]) \
        .aggregate(Sum("cnt", alias_name="cnt"))
    rows2 = fine.take_all()  # bounded: distinct values in selected buckets

    fine_by_type: dict[str, list[tuple[float, int]]] = {}
    for r in rows2:
        fine_by_type.setdefault(r["event_type"], []).append(
            (float(np.int64(r["vbits"]).view(np.float64)), r["cnt"]))
    out_t, out_p, out_q = [], [], []
    for ty, p, bk, r_in in targets:
        vl = sorted((v, c) for v, c in fine_by_type[ty]
                    if math.floor(v / _VQ_W) == bk)
        run = np.cumsum([c for _, c in vl])
        out_t.append(ty)
        out_p.append(p)
        out_q.append(vl[int(np.searchsorted(run, r_in))][0])
    return pa.table({"event_type": pa.array(out_t),
                     "p": pa.array(out_p, pa.float64()),
                     "q": pa.array(out_q, pa.float64())})


def _sql_vq_one(p: float) -> str:
    return f"""
SELECT event_type, {p} AS p, min(v) AS q
FROM r WHERE run >= ceil({p} * n) GROUP BY event_type"""


SQL_VALUE_QUANTILES = f"""
WITH c AS (SELECT event_type, value AS v, count(*) AS cnt
           FROM events GROUP BY event_type, value),
r AS (SELECT event_type, v,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY v) AS run,
             sum(cnt) OVER (PARTITION BY event_type) AS n
      FROM c)
{" UNION ALL ".join(_sql_vq_one(p) for p in _VQ_PS)}
"""


PROFILE_QUERIES = {
    "table_profile": q_table_profile,
    "sample_per_group": q_sample_per_group,
    "knn_join": q_knn_join,
    "value_quantiles": q_value_quantiles,
}

PROFILE_ORACLES = {
    "table_profile": SQL_TABLE_PROFILE,
    "sample_per_group": SQL_SAMPLE_PER_GROUP,
    "knn_join": SQL_KNN_JOIN,
    "value_quantiles": SQL_VALUE_QUANTILES,
}

# Merge into the main catalog regardless of import order (the
# queries_corpus/queries_web/queries_quality convention).
from .queries import ORACLES as _MAIN_ORACLES  # noqa: E402
from .queries import QUERIES as _MAIN_QUERIES  # noqa: E402

_MAIN_QUERIES.update(PROFILE_QUERIES)
_MAIN_ORACLES.update(PROFILE_ORACLES)
