"""Both-sides-large LSH similarity JOIN.

The reference's MatchMaker (`/root/reference/doppelspeller/match_maker.py:
74-203`) scores every query against EVERY truth title — our compat matcher
(`stages/matcher.py`) keeps those semantics with a broadcast index, which
is right only while one side fits in an actor's heap. This pipeline is the
scale path when BOTH sides are large (e.g. joining two crawls): candidates
come from shared LSH buckets — the same banding/shuffle machinery as the
dedup flagship (`stages/lsh.py`) — but pair emission is BIPARTITE
(left×right within a bucket, never same-side), verification reuses the
exact-Jaccard + gated-Levenshtein tier, and the final per-right argmax is
a coarse-partition groupby (right_id % P), not a fine-key map_groups.

Skew: a bucket with L lefts × R rights emits the full product only while
L·R ≤ max_bucket_size²; above that each right pairs with `chain_width`
stride-sampled lefts (deterministic — offsets derive from the right's rank)
and the pair is flagged `oversized`, mirroring the dedup tier's
cap-with-observability contract (no silent drops: the flag column reports
how many survivors came from capped buckets).

Caller contract: the two sides' id spaces must be disjoint (ids travel
through one shared shuffle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DedupConfig
from ..stages.lsh import band_explode_batch, dedup_pairs_partition
from .dedup import build_docs


def _cross_pairs_for_runs(ids, sides, starts, counts, cfg: DedupConfig):
    """Bipartite pair emission per bucket run in a (bucket, side, id)-sorted
    array: positions of (left, right) picks + oversized flags."""
    lefts, rights, overs = [], [], []
    cap = cfg.max_bucket_size * cfg.max_bucket_size
    for s, c in zip(starts, counts):
        seg_sides = sides[s: s + c]
        seg_ids = ids[s: s + c]
        # dedupe (side, id) within the run (band-key collisions)
        uniq = np.ones(c, dtype=bool)
        uniq[1:] = (np.diff(seg_sides) != 0) | (np.diff(seg_ids) != 0)
        pos = np.arange(s, s + c, dtype=np.int64)[uniq]
        seg_sides = seg_sides[uniq]
        lpos = pos[seg_sides == 0]
        rpos = pos[seg_sides == 1]
        nl, nr = len(lpos), len(rpos)
        if nl == 0 or nr == 0:
            continue
        if nl * nr <= cap:
            gl, gr = np.meshgrid(lpos, rpos, indexing="ij")
            lefts.append(gl.ravel())
            rights.append(gr.ravel())
            overs.append(np.zeros(nl * nr, dtype=np.int8))
        else:
            w = min(cfg.chain_width, nl)
            rk = np.arange(nr, dtype=np.int64)
            # stride nl//w (not nl//w + 1): offsets d*step for d < w are all
            # < nl, so the w picks per right are distinct — the +1 variant
            # could wrap mod nl and hand a right the same left twice
            step = max(1, nl // w)
            for d in range(w):
                pick = (rk + d * step) % nl
                lefts.append(lpos[pick])
                rights.append(rpos)
                overs.append(np.ones(nr, dtype=np.int8))
    if not lefts:
        z = np.empty(0, np.int64)
        return z, z.copy(), np.empty(0, np.int8)
    return (np.concatenate(lefts), np.concatenate(rights),
            np.concatenate(overs))


def _cross_pairs_in_partition(group: pa.Table, *, cfg: DedupConfig) -> pa.Table:
    """One COARSE partition (bucket % P): recover buckets by lexsort, emit
    bipartite pairs vectorized, SimHash Hamming prefilter before any
    payload is attached (same ordering as the dedup tier)."""
    from ..functions.simhash import hamming64

    buckets = group["bucket"].to_numpy(zero_copy_only=False).astype(np.uint64)
    ids = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    sides = group["side"].to_numpy(zero_copy_only=False).astype(np.int8)
    use_sim = (cfg.simhash_max_hamming is not None
               and "simhash" in group.column_names)
    sims = (group["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
            if use_sim else None)
    order = np.lexsort((ids, sides, buckets))
    buckets, ids, sides = buckets[order], ids[order], sides[order]
    if use_sim:
        sims = sims[order]
    _, starts, counts = np.unique(buckets, return_index=True,
                                  return_counts=True)
    multi = counts > 1
    lpos, rpos, overs = _cross_pairs_for_runs(ids, sides, starts[multi],
                                              counts[multi], cfg)
    left, right = ids[lpos], ids[rpos]
    if use_sim and len(lpos):
        ham = hamming64(sims[lpos], sims[rpos])
        keep = ham <= cfg.simhash_max_hamming
        left, right, overs = left[keep], right[keep], overs[keep]
    return pa.table({"left_id": pa.array(left, pa.int64()),
                     "right_id": pa.array(right, pa.int64()),
                     "oversized": pa.array(overs.astype(np.int64), pa.int64())})


def lsh_similarity_join(left_ds, right_ds, cfg: DedupConfig = DedupConfig(),
                        *, id_col: str = "doc_id", text_col: str = "text",
                        num_partitions: int | None = None, best_only: bool = True):
    """Near-duplicate join: for each right row, left rows sharing an LSH
    bucket and passing the verify tier (is_dup). With ``best_only`` one row
    per right: argmax by (jaccard, lev_ratio) DESC, left_id ASC tie-break.

    Returns a Dataset (right_id, left_id, jaccard, lev_ratio, oversized) —
    ``oversized`` = 1 when the pair came from a capped bucket's stride
    sample rather than a full cross product (observability contract from
    the module docstring).
    """
    from ..functions.hashing import pair_hash
    from ..stages.verify import (attach_payload, verify_batch,
                                 verify_pairs_broadcast)
    from ..util import default_num_partitions, default_task_partitions

    P = num_partitions or default_task_partitions()
    joinP = default_num_partitions()

    left = build_docs(left_ds, cfg, id_col=id_col, text_col=text_col)
    right = build_docs(right_ds, cfg, id_col=id_col, text_col=text_col)

    def bands_side(side: int):
        def fn(t: pa.Table) -> pa.Table:
            b = band_explode_batch(t, cfg=cfg)
            return b.append_column(
                "side", pa.array(np.full(len(b), side, np.int8), pa.int8()))
        return fn

    bands = left.map_batches(bands_side(0), batch_format="pyarrow",
                             batch_size=cfg.batch_size) \
        .union(right.map_batches(bands_side(1), batch_format="pyarrow",
                                 batch_size=cfg.batch_size))

    def add_part(t: pa.Table) -> pa.Table:
        b = t["bucket"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column("part",
                               pa.array((b % P).astype(np.int64), pa.int64()))

    pairs = bands.map_batches(add_part, batch_format="pyarrow") \
        .groupby("part").map_groups(_cross_pairs_in_partition,
                                    batch_format="pyarrow",
                                    fn_kwargs={"cfg": cfg})

    def add_pair_part(t: pa.Table) -> pa.Table:
        l = t["left_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        r = t["right_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = pair_hash(l, r)
        return t.append_column("ppart",
                               pa.array((h % P).astype(np.int64), pa.int64()))

    deduped = pairs.map_batches(add_pair_part, batch_format="pyarrow") \
        .groupby("ppart").map_groups(dedup_pairs_partition,
                                     batch_format="pyarrow")

    # payload attach: same measured broadcast-vs-join switch as the dedup
    # flagship (dedup.py) and the substring tier — below the byte threshold
    # the union'd docs payload is packed once by a Ray task (object store,
    # never the driver) and each verify batch reads it zero-copy, which
    # removes the two chained hash-shuffle joins entirely; above it, the
    # joins are the scale path (neither side fits an actor heap).
    import ray.data as rd

    docs_union = left.union(right)
    docs_refs = docs_union.to_arrow_refs()  # one execution; blocks stay put
    docs_union = rd.from_arrow_refs(docs_refs)
    payload_bytes = docs_union.size_bytes() or 0
    if payload_bytes <= cfg.broadcast_payload_max_bytes:
        verified = verify_pairs_broadcast(deduped, docs_union, cfg,
                                          docs_refs=docs_refs)
    else:
        attached = attach_payload(deduped, docs_union, num_partitions=joinP,
                                  with_text=cfg.use_levenshtein)
        verified = attached.map_batches(verify_batch, batch_format="pyarrow",
                                        fn_kwargs={"cfg": cfg})

    def dup_only(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        f = t.filter(pc.equal(t["is_dup"], True))
        r = f["right_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        f = f.select(["right_id", "left_id", "jaccard", "lev_ratio",
                      "oversized"])
        return f.append_column(
            "rpart", pa.array((r % P).astype(np.int64), pa.int64()))

    matches = verified.map_batches(dup_only, batch_format="pyarrow")
    if not best_only:
        return matches.select_columns(
            ["right_id", "left_id", "jaccard", "lev_ratio", "oversized"])

    def argmax_per_right(g: pa.Table) -> pa.Table:
        rid = g["right_id"].to_numpy(zero_copy_only=False)
        lid = g["left_id"].to_numpy(zero_copy_only=False)
        jac = g["jaccard"].to_numpy(zero_copy_only=False)
        lev = g["lev_ratio"].to_numpy(zero_copy_only=False)
        over = g["oversized"].to_numpy(zero_copy_only=False)
        order = np.lexsort((lid, -lev, -jac, rid))
        rid, lid = rid[order], lid[order]
        jac, lev, over = jac[order], lev[order], over[order]
        first = np.ones(len(rid), dtype=bool)
        first[1:] = rid[1:] != rid[:-1]
        return pa.table({"right_id": pa.array(rid[first], pa.int64()),
                         "left_id": pa.array(lid[first], pa.int64()),
                         "jaccard": pa.array(jac[first], pa.float32()),
                         "lev_ratio": pa.array(lev[first], pa.int16()),
                         "oversized": pa.array(over[first], pa.int64())})

    return matches.groupby("rpart").map_groups(argmax_per_right,
                                               batch_format="pyarrow")
