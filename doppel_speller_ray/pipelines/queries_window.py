"""Window-function tier (round 4e): the per-key ordered-walk operators a
SQL engine spells as window functions (LAG / LEAD / PERCENT_RANK) and a
log-curation pipeline needs at corpus scale — gap-debounce event dedup,
time-to-next-event, and grouped percentile ranks.

No reference analogue — reference file n/a; these extend the
LLM-training-data surface beyond the reference's scope (duplicate-event
suppression and percentile features are standard interaction-log curation
steps before training-data export).

Ray Data has no window functions; the house patterns stand in:

- per-key ordered walks (``events_debounce``, ``time_to_next_event``) are
  ONE coarse ``user_id % P`` co-partition shuffle + one numpy lexsort +
  shifted-compare per partition — the `q_event_sessions` shape, NOT a
  per-key map_groups (fine keys serialize at ~0.4 ms/group) and NOT a
  global sort;
- grouped percentile ranks (``percent_rank_length``) are the two-pass
  broadcast-CDF shape: the (lang, n_chars) VALUE HISTOGRAM (bounded:
  distinct values × languages, not rows) is pre-aggregated per batch,
  folded by one tiny groupby, broadcast via ray.put, and every row then
  ranks itself with one searchsorted — the row side never shuffles.

Scale notes: the walk operators ship (id, key, ts) triples through one
hash exchange; at 10^12 rows the same walk runs with a (user, day) salt
plus boundary stitching (same note as the sessionizer). The CDF broadcast
assumes bounded distinct values per group (true for length-like features;
for unbounded continuous features swap in the bounded-histogram quantile
pattern of `q_length_quantiles`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .queries import _docs, _read, _round6_half_up

_DEBOUNCE_MINUTES = 10   # shared by the pipeline default AND the SQL oracle


def _events_walk(sf_dir: str, num_partitions: int):
    """(user_id % P)-partitioned events with per-partition sort arrays."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def add_part(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("part", pa.array(u % num_partitions, pa.int64()))

    return ev.map_batches(add_part, batch_format="pyarrow")


def q_events_debounce(sf_dir: str, gap_minutes: int = _DEBOUNCE_MINUTES,
                      num_partitions: int = 32):
    """Gap-debounce dedup: keep an event iff it is the first of its
    (user_id, event_type) stream or follows the PREVIOUS event of that
    stream by more than ``gap_minutes`` (the LAG-window formulation —
    suppress bursts of the same interaction, the standard log-dedup rule
    before sessionization). Ties (equal ts) order by event_id, so repeats
    at the same timestamp collapse to the lowest id."""
    gap_us = gap_minutes * 60_000_000

    def per_partition(g: pa.Table, **_kwargs) -> pa.Table:
        et = np.asarray(g["event_type"].to_numpy(zero_copy_only=False),
                        dtype=object)
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((eid, ts, et, uid))
        uid, et, ts, eid = uid[o], et[o], ts[o], eid[o]
        first = np.ones(len(uid), dtype=bool)
        first[1:] = (uid[1:] != uid[:-1]) | (et[1:] != et[:-1])
        gap_ok = np.ones(len(uid), dtype=bool)
        gap_ok[1:] = (ts[1:] - ts[:-1]) > gap_us
        keep = first | gap_ok
        return pa.table({
            "event_id": pa.array(eid[keep], pa.int64()),
            "user_id": pa.array(uid[keep], pa.int64()),
            "event_type": pa.array(et[keep], pa.string()),
            "ts": pa.array(ts[keep].astype("datetime64[us]")),
        })

    return _events_walk(sf_dir, num_partitions) \
        .groupby("part").map_groups(per_partition, batch_format="pyarrow") \
        .select_columns(["event_id", "user_id", "event_type", "ts"])


SQL_EVENTS_DEBOUNCE = f"""
WITH e AS (SELECT event_id, user_id, event_type, ts,
                  lag(ts) OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS prev
           FROM events)
SELECT event_id, user_id, event_type, ts
FROM e WHERE prev IS NULL OR ts - prev > INTERVAL {_DEBOUNCE_MINUTES} MINUTE
"""


def q_time_to_next_event(sf_dir: str, num_partitions: int = 32):
    """LEAD-window analogue: for every event, microseconds until the same
    user's next event (NULL for the user's last). Same one-shuffle walk as
    the debounce; the shifted compare runs over the partition's full sort
    order, with user boundaries masking the shift."""
    def per_partition(g: pa.Table, **_kwargs) -> pa.Table:
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((eid, ts, uid))
        uid, ts, eid = uid[o], ts[o], eid[o]
        nxt = np.empty(len(uid), dtype=np.int64)
        nxt[:-1] = ts[1:] - ts[:-1]
        valid = np.zeros(len(uid), dtype=bool)
        valid[:-1] = uid[1:] == uid[:-1]
        return pa.table({
            "event_id": pa.array(eid, pa.int64()),
            "user_id": pa.array(uid, pa.int64()),
            "gap_us": pa.array(np.where(valid, nxt, 0), pa.int64(),
                               mask=~valid),
        })

    return _events_walk(sf_dir, num_partitions) \
        .groupby("part").map_groups(per_partition, batch_format="pyarrow") \
        .select_columns(["event_id", "user_id", "gap_us"])


SQL_TIME_TO_NEXT_EVENT = """
SELECT event_id, user_id,
       date_diff('microsecond', ts,
                 lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
         AS gap_us
FROM events
"""


def q_percent_rank_length(sf_dir: str):
    """PERCENT_RANK of n_chars within each language: (rank − 1)/(n − 1)
    with rank = 1 + count of strictly-smaller values (SQL tie semantics),
    0 for single-row groups. Two-pass broadcast-CDF: one bounded
    (lang, n_chars) histogram groupby, folded to per-lang sorted value /
    cumulative-count arrays and ray.put once; the per-row pass is a
    searchsorted per language present in the batch — zero row shuffle."""
    import ray
    from ray.data.aggregate import Count

    hist = _docs(sf_dir, ["lang", "n_chars"]) \
        .groupby(["lang", "n_chars"]).aggregate(Count(alias_name="cnt")) \
        .take_all()
    cdf: dict[str, tuple[np.ndarray, np.ndarray, int]] = {}
    by_lang: dict[str, list[tuple[int, int]]] = {}
    for r in hist:
        by_lang.setdefault(r["lang"], []).append((r["n_chars"], r["cnt"]))
    for lang, vc in by_lang.items():
        vc.sort()
        vals = np.asarray([v for v, _ in vc], dtype=np.int64)
        cnts = np.asarray([c for _, c in vc], dtype=np.int64)
        smaller = np.concatenate(([0], np.cumsum(cnts)[:-1]))
        cdf[lang] = (vals, smaller, int(cnts.sum()))
    ref = ray.put(cdf)

    def rank(t: pa.Table) -> pa.Table:
        table = ray.get(ref)
        langs = np.asarray(t["lang"].to_numpy(zero_copy_only=False),
                           dtype=object)
        nch = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        pr = np.zeros(len(langs), dtype=np.float64)
        for lang in np.unique(langs):
            m = langs == lang
            vals, smaller, n = table[lang]
            if n > 1:
                pos = np.searchsorted(vals, nch[m])
                pr[m] = smaller[pos] / (n - 1)
        return pa.table({
            "doc_id": t["doc_id"],
            "lang": t["lang"],
            "pr": pa.array(_round6_half_up(pr), pa.float64()),
        })

    return _docs(sf_dir, ["doc_id", "lang", "n_chars"]) \
        .map_batches(rank, batch_format="pyarrow")


SQL_PERCENT_RANK_LENGTH = """
SELECT doc_id, lang,
       floor(percent_rank() OVER (PARTITION BY lang ORDER BY n_chars)
             * 1000000 + 0.5) / 1000000 AS pr
FROM documents
"""


# ---------------------------------------------------------------------------
# Cross-series correlation — aligned hourly activity similarity
# ---------------------------------------------------------------------------

def q_ts_corr_pairs(sf_dir: str):
    """Cross-series similarity over aligned hourly activity (the
    'time-series similarity search' shape from PAPERS.md reduced to its
    distributed core: align sparse series on a shared grid, then compare
    vectorized): per-event-type hourly count series, zero-filled on the
    union-of-hours grid, pairwise Pearson correlation for type_a < type_b
    (zero-variance series dropped — correlation is undefined there, and
    both engines agree by construction).

    Scale shape: ONE (event_type, hour) groupby-count — the only shuffle,
    and its OUTPUT is K·H rows (series-count × grid length), bounded and
    tiny relative to the event stream, so collecting it is the bounded-
    small-result pattern (hot sets / CDF broadcasts), not a corpus
    materialization. The K×K correlation is one vectorized np.corrcoef
    over that K×H matrix; at K beyond driver scale the same math runs as
    the knn_join broadcast-matmul pattern (series become rows of an
    embedding table)."""
    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def hour(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t["event_type"],
                         "hour": pc.floor_temporal(t["ts"], unit="hour")})

    counts = ev.map_batches(hour, batch_format="pyarrow") \
        .groupby(["event_type", "hour"]).count()
    rows = counts.take_all()  # K·H bounded
    types = sorted({r["event_type"] for r in rows})
    hours = sorted({r["hour"] for r in rows})
    ti = {t: i for i, t in enumerate(types)}
    hi = {h: i for i, h in enumerate(hours)}
    m = np.zeros((len(types), len(hours)), dtype=np.float64)
    for r in rows:
        m[ti[r["event_type"]], hi[r["hour"]]] = r["count()"]
    keep = m.std(axis=1) > 0
    c = np.corrcoef(m[keep]) if keep.sum() >= 2 else np.empty((0, 0))
    kept = [t for t, k in zip(types, keep) if k]
    ta, tb, cv = [], [], []
    for i in range(len(kept)):
        for j in range(i + 1, len(kept)):
            ta.append(kept[i])
            tb.append(kept[j])
            cv.append(c[i, j])
    out = pa.table({
        "type_a": pa.array(ta, pa.string()),
        "type_b": pa.array(tb, pa.string()),
        "corr": pa.array(_round6_half_up(np.array(cv, np.float64)),
                         pa.float64()),
    })
    import ray.data as rd

    return rd.from_arrow(out)


SQL_TS_CORR_PAIRS = """
WITH c AS (SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n
           FROM events GROUP BY 1, 2),
h AS (SELECT DISTINCT hour FROM c),
t AS (SELECT DISTINCT event_type FROM c),
f AS (SELECT t.event_type, h.hour, coalesce(c.n, 0) AS n
      FROM t CROSS JOIN h
      LEFT JOIN c ON c.event_type = t.event_type AND c.hour = h.hour)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       floor(corr(a.n, b.n) * 1000000 + 0.5) / 1000000 AS corr
FROM f a JOIN f b ON a.hour = b.hour AND a.event_type < b.event_type
GROUP BY 1, 2
HAVING stddev_samp(a.n) > 0 AND stddev_samp(b.n) > 0
"""


WINDOW_QUERIES = {
    "events_debounce": q_events_debounce,
    "time_to_next_event": q_time_to_next_event,
    "percent_rank_length": q_percent_rank_length,
    "ts_corr_pairs": q_ts_corr_pairs,
}

WINDOW_ORACLES = {
    "events_debounce": SQL_EVENTS_DEBOUNCE,
    "time_to_next_event": SQL_TIME_TO_NEXT_EVENT,
    "percent_rank_length": SQL_PERCENT_RANK_LENGTH,
    "ts_corr_pairs": SQL_TS_CORR_PAIRS,
}

# Merge into the main catalog regardless of import order (the
# queries_corpus/queries_web/queries_quality convention).
from .queries import ORACLES as _MAIN_ORACLES  # noqa: E402
from .queries import QUERIES as _MAIN_QUERIES  # noqa: E402

_MAIN_QUERIES.update(WINDOW_QUERIES)
_MAIN_ORACLES.update(WINDOW_ORACLES)
