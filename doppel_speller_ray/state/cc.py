"""Distributed connected components: hash-min label propagation on Datasets.

The scale path for union-find (SURVEY.md §2.5 A10) when the verified-pair
set itself is too large for one driver heap. Classic iterative hash-min
(cf. "BTS: Load-Balanced Distributed Union-Find", ICDE'24, and the
Connected-Components-in-MapReduce literature): every node repeatedly adopts
the minimum label in its neighbourhood *including its current label's
label* (pointer jumping), which converges in O(log d) rounds instead of
O(d) for diameter-d components (chained pairs from capped LSH buckets make
diameters of tens plausible).

All steps are Dataset groupby-aggregates — no driver-side state beyond the
per-round convergence scalar.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _edges_both_directions(pairs_ds):
    def explode(t: pa.Table) -> pa.Table:
        left = t["left_id"].to_numpy(zero_copy_only=False)
        right = t["right_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "node": pa.array(np.concatenate([left, right]), pa.int64()),
            "nbr": pa.array(np.concatenate([right, left]), pa.int64()),
        })
    return pairs_ds.select_columns(["left_id", "right_id"]).map_batches(
        explode, batch_format="pyarrow"
    )


def connected_components_distributed(pairs_ds, max_iters: int = 25,
                                     num_partitions: int | None = None):
    """pair Dataset (left_id,right_id) → Dataset (node:int64, label:int64).

    Labels are min doc_id per component (same canonicalization as the
    driver-side union-find, so outputs are interchangeable).
    """
    from ray.data.aggregate import Min

    from ..util import default_num_partitions

    if num_partitions is None:
        num_partitions = default_num_partitions()

    edges = _edges_both_directions(pairs_ds).materialize()

    # init: label(v) = min(v, min neighbour) — first hash-min round for free
    labels = edges.groupby("node").aggregate(Min("nbr", alias_name="label"))

    def clip_self(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False)
        lab = t["label"].to_numpy(zero_copy_only=False)
        return pa.table({"node": t["node"], "label": pa.array(np.minimum(node, lab), pa.int64())})

    labels = labels.map_batches(clip_self, batch_format="pyarrow").materialize()

    prev_sum = None
    for _ in range(max_iters):
        # neighbour propagation: msg(dst) = label(src) over each edge
        nbr_msgs = edges.join(
            labels, join_type="inner", num_partitions=num_partitions,
            on=("node",), right_on=("node",),
        ).select_columns(["nbr", "label"]).map_batches(
            lambda t: t.rename_columns(["node", "label"]), batch_format="pyarrow"
        )
        # pointer jumping: node adopts its label's label
        jump_msgs = labels.map_batches(
            lambda t: pa.table({"node": t["label"], "jlabel": t["label"],
                                "orig": t["node"]}),
            batch_format="pyarrow",
        )
        jump = jump_msgs.select_columns(["node", "orig"]).join(
            labels, join_type="inner", num_partitions=num_partitions,
            on=("node",), right_on=("node",),
        ).select_columns(["orig", "label"]).map_batches(
            lambda t: t.rename_columns(["node", "label"]), batch_format="pyarrow"
        )
        combined = labels.union(nbr_msgs).union(jump)
        labels = combined.groupby("node").aggregate(Min("label", alias_name="label"))
        labels = labels.map_batches(clip_self, batch_format="pyarrow").materialize()
        cur_sum = labels.sum("label")
        if prev_sum is not None and cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels
