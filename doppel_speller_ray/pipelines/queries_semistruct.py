"""Semi-structured + graph-analytics tier (round 4f): JSON field
extraction, conditional-aggregation pivot, and triangle counting over the
synthesized link graph — the remaining everyday shapes of a log/crawl
curation stack.

No reference analogue — reference file n/a; these extend the
LLM-training-data surface beyond the reference's scope.

- ``json_props_stats`` — the semi-structured ingest step: events carry a
  JSON ``props`` payload; extract a typed field and aggregate per event
  type. Extraction is ONE vectorized RE2 ``extract_regex`` per batch (the
  `pii_redact` kernel convention — no per-row json.loads in the hot
  path); the oracle uses DuckDB's real ``json_extract`` so the regex
  kernel is certified against a true JSON parser on every row.
- ``pivot_user_values`` — wide pivot (conditional aggregation): per-user
  columns of summed value per event type. Per-batch partial pivot (one
  bincount per type over batch-local user codes) → ONE user groupby of
  the already-wide partials; the shuffle moves one row per (user, batch),
  never one per event.
- ``triangle_count`` — graph analytics over the co-citation domain graph
  (pages link 3 target domains; an edge joins two domains co-cited by a
  page). Edge dedup is a coarse-partition distributed groupby; the
  triangle count broadcasts the DEDUPED domain-level edge set (bounded:
  domain vocabulary², 31 nodes here — the doc-level corpus never
  collapses to one task) and counts sorted-adjacency intersections per
  edge. At web scale the same shape holds because registered domains are
  a bounded vocabulary; for node sets beyond broadcast, the standard
  degree-oriented wedge join (edges partitioned by low-degree endpoint)
  is the documented fallback.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .queries import _read, _round6_half_up

# ---------------------------------------------------------------------------
# JSON field extraction + per-type stats
# ---------------------------------------------------------------------------

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_json_props_stats(sf_dir: str):
    """Extract ``k`` from the JSON ``props`` column and aggregate per
    event_type: row count, sum(k), avg(k) (shared 6-decimal half-up)."""
    from ray.data.aggregate import Count, Sum

    def extract(t: pa.Table) -> pa.Table:
        k = pc.struct_field(
            pc.extract_regex(t["props"], pattern=r'"k":\s*(?P<k>-?\d+)'),
            "k")
        return pa.table({"event_type": t["event_type"],
                         "k": pc.cast(k, pa.int64())})

    agg = _read(sf_dir, "events", ["event_type", "props"]) \
        .map_batches(extract, batch_format="pyarrow") \
        .groupby("event_type").aggregate(Count(alias_name="n"),
                                         Sum("k", alias_name="sum_k"))

    def fin(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = t["sum_k"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "event_type": t["event_type"],
            "n": pc.cast(t["n"], pa.int64()),
            "sum_k": pc.cast(t["sum_k"], pa.int64()),
            "avg_k": pa.array(_round6_half_up(s / n), pa.float64()),
        })

    return agg.map_batches(fin, batch_format="pyarrow")


SQL_JSON_PROPS_STATS = """
WITH e AS (SELECT event_type,
                  CAST(json_extract(props, '$.k') AS BIGINT) AS k
           FROM events)
SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
       floor(sum(k) * 1.0 / count(*) * 1000000 + 0.5) / 1000000 AS avg_k
FROM e GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# wide pivot (conditional aggregation)
# ---------------------------------------------------------------------------

def q_pivot_user_values(sf_dir: str):
    """Per-user wide pivot: summed ``value`` per event type as columns.

    Per-batch partial: dictionary-encode users once, one
    ``np.bincount(weights=...)`` per event type (types are a bounded
    enum), emit the already-wide (user, t0..t4) partial rows; then ONE
    user groupby sums the partials. Rounding happens ONCE at finalize
    (float64 partial sums are exact for these 2-decimal inputs well below
    2^53)."""
    from ray.data.aggregate import Sum

    cols = {et: f"{et}_value" for et in _EVENT_TYPES}

    def partial(t: pa.Table) -> pa.Table:
        enc = t["user_id"].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        users = enc.dictionary.to_numpy(zero_copy_only=False).astype(np.int64)
        et = np.asarray(t["event_type"].to_numpy(zero_copy_only=False),
                        dtype=object)
        val = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        out = {"user_id": pa.array(users, pa.int64())}
        for name in _EVENT_TYPES:
            m = et == name
            sums = np.bincount(codes[m], weights=val[m], minlength=len(users))
            out[cols[name]] = pa.array(sums, pa.float64())
        return pa.table(out)

    agg = _read(sf_dir, "events", ["user_id", "event_type", "value"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("user_id").aggregate(
            *[Sum(cols[et], alias_name=cols[et]) for et in _EVENT_TYPES])

    def fin(t: pa.Table) -> pa.Table:
        out = {"user_id": t["user_id"]}
        for et in _EVENT_TYPES:
            v = t[cols[et]].to_numpy(zero_copy_only=False).astype(np.float64)
            out[cols[et]] = pa.array(_round6_half_up(v), pa.float64())
        return pa.table(out)

    return agg.map_batches(fin, batch_format="pyarrow")


SQL_PIVOT_USER_VALUES = """
SELECT user_id,
""" + ",\n".join(
    f"       floor(sum(CASE WHEN event_type = '{et}' THEN value ELSE 0 END)"
    f" * 1000000 + 0.5) / 1000000 AS {et}_value"
    for et in _EVENT_TYPES) + """
FROM events GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# triangle count over the co-citation domain graph
# ---------------------------------------------------------------------------

def q_triangle_count(sf_dir: str, num_partitions: int = 32):
    """Triangles in the undirected co-citation graph: page i links domains
    (i, 2i, 3i) mod 31 (the `q_link_graph` synthesized-structure
    convention); two domains co-cited by a page share an edge.

    Stage 1 — per-batch vectorized edge emission (3 unordered pairs per
    page, self-loops dropped) with a coarse ``lo % P`` partition groupby
    whose per-partition np.unique is a GLOBAL dedup (an edge's partition
    depends only on its low endpoint).
    Stage 2 — the deduped DOMAIN-level edge set (bounded by the domain
    vocabulary, not the corpus) broadcasts; each edge batch counts
    |N(a) ∩ N(b)| over sorted adjacency restricted to c > b — every
    triangle counted exactly once at its lowest edge.
    """
    import ray

    def edges(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d1, d2, d3 = ids % 31, (ids * 2) % 31, (ids * 3) % 31
        a = np.concatenate([d1, d1, d2])
        b = np.concatenate([d2, d3, d3])
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        keep = lo != hi
        lo, hi = lo[keep], hi[keep]
        # batch-local dedup before the shuffle (partial-combine)
        u = np.unique(lo * 31 + hi)
        lo, hi = u // 31, u % 31
        return pa.table({"lo": pa.array(lo, pa.int64()),
                         "hi": pa.array(hi, pa.int64()),
                         "part": pa.array(lo % num_partitions, pa.int64())})

    def dedup(g: pa.Table, **_kwargs) -> pa.Table:
        lo = g["lo"].to_numpy(zero_copy_only=False)
        hi = g["hi"].to_numpy(zero_copy_only=False)
        u = np.unique(lo * 31 + hi)
        return pa.table({"lo": pa.array(u // 31, pa.int64()),
                         "hi": pa.array(u % 31, pa.int64())})

    from .queries import _docs

    edge_ds = _docs(sf_dir, ["doc_id"]) \
        .map_batches(edges, batch_format="pyarrow") \
        .groupby("part").map_groups(dedup, batch_format="pyarrow") \
        .select_columns(["lo", "hi"]).materialize()  # two consumers below

    rows = edge_ds.take_all()          # domain-level edge set: bounded
    lo = np.asarray([r["lo"] for r in rows], dtype=np.int64)
    hi = np.asarray([r["hi"] for r in rows], dtype=np.int64)
    # sorted adjacency over BOTH directions for the intersection step
    src = np.concatenate([lo, hi])
    dst = np.concatenate([hi, lo])
    o = np.lexsort((dst, src))
    src, dst = src[o], dst[o]
    starts = np.searchsorted(src, np.arange(31))
    ends = np.searchsorted(src, np.arange(31), side="right")
    adj_ref = ray.put((starts, ends, dst))

    def count(t: pa.Table) -> pa.Table:
        s, e, d = ray.get(adj_ref)
        a = t["lo"].to_numpy(zero_copy_only=False)
        b = t["hi"].to_numpy(zero_copy_only=False)
        n = 0
        for i in range(len(a)):
            na = d[s[a[i]]:e[a[i]]]
            nb = d[s[b[i]]:e[b[i]]]
            common = np.intersect1d(na, nb, assume_unique=True)
            n += int((common > b[i]).sum())
        return pa.table({"tri_part": pa.array([n], pa.int64())})

    from ray.data.aggregate import Sum

    total = edge_ds.map_batches(count, batch_format="pyarrow") \
        .aggregate(Sum("tri_part", alias_name="n_triangles"))["n_triangles"]
    return pa.table({"n_triangles": pa.array([int(total or 0)], pa.int64())})


SQL_TRIANGLE_COUNT = """
WITH t AS (SELECT doc_id % 31 AS d1, (doc_id * 2) % 31 AS d2,
                  (doc_id * 3) % 31 AS d3 FROM documents),
p AS (SELECT d1 AS a, d2 AS b FROM t UNION ALL
      SELECT d1, d3 FROM t UNION ALL
      SELECT d2, d3 FROM t),
e AS (SELECT DISTINCT least(a, b) AS lo, greatest(a, b) AS hi
      FROM p WHERE a <> b)
SELECT count(*) AS n_triangles
FROM e e1 JOIN e e2 ON e2.lo = e1.hi
JOIN e e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
"""


SEMISTRUCT_QUERIES = {
    "json_props_stats": q_json_props_stats,
    "pivot_user_values": q_pivot_user_values,
    "triangle_count": q_triangle_count,
}

SEMISTRUCT_ORACLES = {
    "json_props_stats": SQL_JSON_PROPS_STATS,
    "pivot_user_values": SQL_PIVOT_USER_VALUES,
    "triangle_count": SQL_TRIANGLE_COUNT,
}

# Merge into the main catalog regardless of import order (the
# queries_corpus/queries_web/queries_quality convention).
from .queries import ORACLES as _MAIN_ORACLES  # noqa: E402
from .queries import QUERIES as _MAIN_QUERIES  # noqa: E402

_MAIN_QUERIES.update(SEMISTRUCT_QUERIES)
_MAIN_ORACLES.update(SEMISTRUCT_ORACLES)
