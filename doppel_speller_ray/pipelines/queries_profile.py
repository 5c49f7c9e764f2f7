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
        keys = t["key"].to_numpy(zero_copy_only=False)
        cols = np.asarray([k.split(_SEP, 1)[0] for k in keys], dtype=object)
        u, cnt = np.unique(cols, return_counts=True)
        z = [0] * len(u)
        return pa.table({
            "col": pa.array(u), "n": pa.array(z, pa.int64()),
            "n_null": pa.array(z, pa.int64()),
            "len_sum": pa.array(z, pa.int64()),
            "mn": pa.array([None] * len(u), pa.string()),
            "mx": pa.array([None] * len(u), pa.string()),
            "n_distinct": pa.array(cnt, pa.int64()),
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
       sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS n_null,
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


PROFILE_QUERIES = {
    "table_profile": q_table_profile,
    "sample_per_group": q_sample_per_group,
    "knn_join": q_knn_join,
}

PROFILE_ORACLES = {
    "table_profile": SQL_TABLE_PROFILE,
    "sample_per_group": SQL_SAMPLE_PER_GROUP,
    "knn_join": SQL_KNN_JOIN,
}

# Merge into the main catalog regardless of import order (the
# queries_corpus/queries_web/queries_quality convention).
from .queries import ORACLES as _MAIN_ORACLES  # noqa: E402
from .queries import QUERIES as _MAIN_QUERIES  # noqa: E402

_MAIN_QUERIES.update(PROFILE_QUERIES)
_MAIN_ORACLES.update(PROFILE_ORACLES)
