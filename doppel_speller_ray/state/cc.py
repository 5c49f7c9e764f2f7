"""Distributed connected components over pair Datasets.

The scale path for union-find (SURVEY.md §2.5 A10) when the verified-pair
set itself is too large for one driver heap. Implements the alternating
**large-star / small-star** algorithm (Kiveris, Lattanzi, Mirrokni, Rastogi,
Vassilvitskii — "Connected Components in MapReduce and Beyond", SoCC'14):

* large-star(u): connect every neighbour v > u to m(u) = min(N(u) ∪ {u})
* small-star(u): connect every neighbour v ≤ u (and u itself) to m(u)

Alternating the two converges in O(log² n) rounds (O(log n) in practice —
a handful here) to a forest of stars whose roots are the component minima,
i.e. the same canonical labels as the driver union-find, so outputs are
interchangeable.

Every round is ONE coarse-partition groupby (node % P) with a pure-numpy
star kernel inside — no Dataset joins (an earlier hash-min + pointer-jump
formulation ran 2 joins + a groupby per round and was ~10× slower in local
mode). Convergence is detected by an order-insensitive edge-multiset
signature (count + sum of pair hashes mod 2**64), one tiny aggregate per
round; the edge set checkpoints every k rounds when a checkpoint_dir is
given so a failure resumes mid-loop instead of restarting it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _star_kernel(group: pa.Table, *, large: bool) -> pa.Table:
    """One star operation over a node-partition of the (u → neighbours)
    exploded edge list. Vectorized: lexsort by node, segmented min, masked
    emission, in-partition dedup."""
    u = group["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = group["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(u) == 0:
        z = np.empty(0, np.int64)
        return pa.table({"left_id": pa.array(z, pa.int64()),
                         "right_id": pa.array(z, pa.int64())})
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    new = np.ones(len(u), dtype=bool)
    new[1:] = u[1:] != u[:-1]
    run = np.cumsum(new) - 1
    first = np.nonzero(new)[0]
    m_per_u = np.minimum(v[first], u[first])    # v sorted per u → v[first] = min nbr
    m = m_per_u[run]
    if large:
        mask = v > u
        out_l, out_r = v[mask], m[mask]
    else:
        mask = v <= u
        out_l, out_r = v[mask], m[mask]
        # small-star also links u itself to m
        keep_u = u[first] != m_per_u
        out_l = np.concatenate([out_l, u[first][keep_u]])
        out_r = np.concatenate([out_r, m_per_u[keep_u]])
    keep = out_l != out_r
    out_l, out_r = out_l[keep], out_r[keep]
    # in-partition dedup (cross-partition duplicates ride one more round)
    if len(out_l):
        packed = np.unique(np.stack([out_l, out_r], axis=1), axis=0)
        out_l, out_r = packed[:, 0], packed[:, 1]
    return pa.table({"left_id": pa.array(out_l, pa.int64()),
                     "right_id": pa.array(out_r, pa.int64())})


def _star_round(edges_ds, P: int, large: bool):
    def explode(t: pa.Table) -> pa.Table:
        left = t["left_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        right = t["right_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.concatenate([left, right])
        v = np.concatenate([right, left])
        return pa.table({"u": pa.array(u, pa.int64()),
                         "v": pa.array(v, pa.int64()),
                         "part": pa.array(u % P, pa.int64())})

    return edges_ds.map_batches(explode, batch_format="pyarrow") \
        .groupby("part").map_groups(
            lambda g: _star_kernel(g, large=large), batch_format="pyarrow")


def _edge_signature(edges_ds) -> tuple[int, int]:
    """(count, sum-of-pair-hashes mod 2**64) — order-insensitive multiset
    signature. Sum (not XOR) so duplicate edges that survive across
    partitions cannot pair-cancel into a colliding signature (ADVICE r2):
    XOR of an even multiplicity vanishes, addition mod 2**64 does not."""
    from ..functions.hashing import pair_hash

    def sig(t: pa.Table) -> pa.Table:
        l = t["left_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        r = t["right_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = pair_hash(l, r)
        with np.errstate(over="ignore"):
            s = np.add.reduce(h) if len(h) else np.uint64(0)
        return pa.table({"n": pa.array([len(l)], pa.int64()),
                         "s": pa.array([int(s)], pa.uint64())})

    parts = edges_ds.map_batches(sig, batch_format="pyarrow").take_all()
    n = sum(p["n"] for p in parts)
    s = 0
    for p in parts:
        s = (s + int(p["s"])) & 0xFFFFFFFFFFFFFFFF
    return n, s


def connected_components_distributed(pairs_ds, max_iters: int = 25,
                                     num_partitions: int | None = None,
                                     checkpoint_dir: str | None = None,
                                     checkpoint_every: int = 2,
                                     input_token: str = "",
                                     extra_token: str = ""):
    """pair Dataset (left_id, right_id) → Dataset (node:int64, label:int64).

    Labels are min doc_id per component (same canonicalization as the
    driver-side union-find, so outputs are interchangeable).

    With ``checkpoint_dir``, the contracted edge set is written through
    state/checkpoint.py every ``checkpoint_every`` rounds (VERDICT r2 item
    6: without this, a failure restarts the whole O(log n)-round loop). A
    fresh call with the same (P, input_token) resumes from the latest round
    checkpoint — correct because the star rounds preserve connectivity, so
    converging from ANY intermediate edge set yields the same star forest,
    at the cost of at most one extra signature round."""
    from ..util import default_num_partitions

    if num_partitions is None:
        num_partitions = default_num_partitions()
    P = num_partitions

    ckpt_fp = None
    if checkpoint_dir is not None:
        from .checkpoint import (checkpoint_valid, config_fingerprint,
                                 read_checkpoint, write_checkpoint)

        # P is deliberately NOT in the fingerprint: star-round results are
        # partition-count independent, and a resized cluster (different
        # default P) resuming a crashed loop must still hit the checkpoint.
        # extra_token carries the CALLER's config fingerprint — without it
        # a rerun with changed verify thresholds would silently resume the
        # previous config's contracted edge set (stale-resume).
        ckpt_fp = config_fingerprint({"op": "cc_star", "extra": extra_token},
                                     input_token)

    if ckpt_fp is not None and checkpoint_valid(checkpoint_dir, "cc_edges", ckpt_fp):
        edges = read_checkpoint(checkpoint_dir, "cc_edges").materialize()
    else:
        edges = pairs_ds.select_columns(["left_id", "right_id"]).materialize()
    prev_sig = None
    for r in range(max_iters):
        edges = _star_round(edges, P, large=True).materialize()
        edges = _star_round(edges, P, large=False).materialize()
        sig = _edge_signature(edges)
        if sig == prev_sig:
            break
        prev_sig = sig
        if ckpt_fp is not None and (r + 1) % checkpoint_every == 0:
            edges = write_checkpoint(edges, checkpoint_dir, "cc_edges", ckpt_fp)
    else:
        # exhausting max_iters means the edge set is NOT a star forest —
        # the Min-aggregate below would split components into several
        # clusters with zero signal. Fail loudly instead of emitting
        # silently wrong labels.
        raise RuntimeError(
            f"distributed CC did not converge in {max_iters} star rounds; "
            "raise max_iters (convergence needs O(log n) rounds)")

    # final star edges: (child, root). label(node) = min over its edges;
    # roots appear only on the right side, so emit (root, root) too and
    # take the per-node min.
    from ray.data.aggregate import Min

    def explode(t: pa.Table) -> pa.Table:
        left = t["left_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        right = t["right_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        node = np.concatenate([left, right])
        lab = np.concatenate([right, right])
        return pa.table({"node": pa.array(node, pa.int64()),
                         "label": pa.array(lab, pa.int64())})

    labels = edges.map_batches(explode, batch_format="pyarrow") \
        .groupby("node").aggregate(Min("label", alias_name="label"))

    def clip_self(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False)
        lab = t["label"].to_numpy(zero_copy_only=False)
        return pa.table({"node": t["node"],
                         "label": pa.array(np.minimum(node, lab), pa.int64())})

    return labels.map_batches(clip_self, batch_format="pyarrow").materialize()
