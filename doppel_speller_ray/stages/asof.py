"""Distributed as-of join — an operator Ray Data lacks natively.

For every left row, find the single right row with the greatest ``on``
value ≤ the left's ``on`` value (direction="backward"), matching on an
equality key ``by`` — the classic point-in-time / most-recent-preceding
lookup (DuckDB spells it ``ASOF JOIN``).

Ray-Data-first plan (same coarse-partition pattern as the LSH / exact /
sessionization tiers — see ``pipelines/queries.py:q_event_sessions``):

1. Both sides are projected to (key, time, id) ONLY — ids, not payloads,
   transit the shuffle; callers attach payload columns afterwards with a
   hash join on the id, exactly like the LSH pair tiers.
2. The sides are tagged and unioned, a coarse partition column
   ``part = by % P`` is added, and ONE ``groupby(part).map_groups`` runs a
   fully vectorized numpy kernel per partition: lexsort by (key, time,
   side, id), then a segment-reset running maximum over right-row indices
   (the ``seg_base`` trick makes ``np.maximum.accumulate`` reset at key
   boundaries without a Python loop).
3. Ties — multiple right rows sharing (key, time) — resolve
   deterministically to the greatest right id, so results are stable
   under any partitioning and reproducible in ANSI SQL.

Partitioning assumption: ``by`` is an integer key with cardinality ≫ P
(hot single keys serialize inside one partition — salt upstream if one
key dominates). Each partition's rows must fit one task's heap: at 100 TB
that bounds P from below, tune ``num_partitions`` accordingly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..util import default_task_partitions


def asof_join(left_ds, right_ds, *, by: str, on: str,
              left_id: str, right_id: str,
              direction: str = "backward",
              num_partitions: int | None = None):
    """As-of join of two Datasets on equality key ``by`` and time ``on``.

    Returns a Dataset with columns (left_id, by, on, right_on, right_id):
    one row per left row; right_on / right_id are null when no right row
    precedes (backward) / follows (forward) it.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unsupported direction {direction!r}")
    flip = -1 if direction == "forward" else 1
    P = num_partitions or default_task_partitions()

    def project(side: int, key: str, time: str, ident: str):
        def fn(t: pa.Table) -> pa.Table:
            k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
            tm = _time_i64(t[time])
            i = t[ident].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({
                "k": pa.array(k, pa.int64()),
                "t": pa.array(flip * tm, pa.int64()),
                "i": pa.array(i, pa.int64()),
                "side": pa.array(np.full(len(k), side, np.int8), pa.int8()),
                "part": pa.array(k % P, pa.int64()),
            })
        return fn

    _schema = left_ds.schema()  # ray.data Schema wrapper: .names / .types
    time_type = dict(zip(_schema.names, _schema.types))[on]
    lhs = left_ds.map_batches(project(1, by, on, left_id), batch_format="pyarrow")
    rhs = right_ds.map_batches(project(0, by, on, right_id), batch_format="pyarrow")

    def per_partition(g: pa.Table) -> pa.Table:
        k = g["k"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        i = g["i"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        n = len(k)
        # right rows sort before left at equal time (a right row AT the
        # left's time matches); equal (k, t, side) ties resolve to the
        # greatest id because the running max then sees the largest index
        order = np.lexsort((i, side, t, k))
        k, t, i, side = k[order], t[order], i[order], side[order]
        idx = np.arange(n, dtype=np.int64)
        # segment-reset running max of right-row positions: seg_base jumps
        # by n+1 per key segment, so a previous key's maximum can never
        # survive into the next segment
        new_key = np.ones(n, dtype=bool)
        new_key[1:] = k[1:] != k[:-1]
        run_id = np.cumsum(new_key) - 1
        seg_base = run_id.astype(np.int64) * np.int64(n + 1)
        val = np.where(side == 0, idx + 1, 0)
        best = np.maximum.accumulate(seg_base + val) - seg_base
        is_left = side == 1
        match = best[is_left]            # 0 = no preceding right row
        has = match > 0
        r_pos = match[has] - 1
        r_t = np.zeros(is_left.sum(), np.int64)
        r_i = np.zeros(is_left.sum(), np.int64)
        r_t[has], r_i[has] = t[r_pos], i[r_pos]
        mask = ~has
        return pa.table({
            "left_id": pa.array(i[is_left], pa.int64()),
            "k": pa.array(k[is_left], pa.int64()),
            "t": pa.array(flip * t[is_left], pa.int64()),
            "right_t": pa.array(np.ma.masked_array(flip * r_t, mask), pa.int64()),
            "right_id": pa.array(np.ma.masked_array(r_i, mask), pa.int64()),
        })

    joined = lhs.union(rhs).groupby("part") \
        .map_groups(per_partition, batch_format="pyarrow")

    def restore(tbl: pa.Table) -> pa.Table:
        out = {left_id: tbl["left_id"], by: tbl["k"],
               on: _i64_to_time(tbl["t"], time_type),
               f"right_{on}": _i64_to_time(tbl["right_t"], time_type),
               f"right_{right_id}" if right_id == left_id else right_id:
                   tbl["right_id"]}
        return pa.table(out)

    return joined.map_batches(restore, batch_format="pyarrow")


def _time_i64(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_timestamp(col.type):
        return col.cast(pa.int64()).to_numpy(zero_copy_only=False)
    return col.to_numpy(zero_copy_only=False).astype(np.int64)


def _i64_to_time(col, time_type):
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_timestamp(time_type):
        return col.cast(pa.int64()).cast(time_type)
    return col
