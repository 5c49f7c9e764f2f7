"""MinHash signature + LSH banding + bucket pair generation stages.

The scalable replacement for the reference's all-pairs IDF-Jaccard scan
(``/root/reference/doppelspeller/match_maker.py:74-203``): candidates come
from LSH bucket collisions (a groupby shuffle) instead of an O(Q×T) scan.

Skew handling (north_rule): buckets larger than ``cfg.max_bucket_size`` are
NOT all-paired (that is O(S²) on boilerplate-heavy buckets). Instead the
bucket's sorted doc_ids are *chained*: each doc pairs with its next
``cfg.chain_width`` neighbours — O(S·w) pairs — and union-find transitivity
reconnects the full cluster from verified chain links. Oversized-bucket
counts are reported per pair via the ``oversized`` column for observability.
With ``cfg.simhash_max_hamming=None`` every bucket member still appears in
≥1 emitted pair (no silent recall loss from the cap alone); with the SimHash
prefilter enabled, chained pairs whose endpoints are far apart in Hamming
space are dropped like any other pair — transitive reconnection then relies
on the verified survivors, which the planted-recall e2e tests exercise.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DedupConfig
from ..functions.minhash import lsh_bucket_keys, make_perms, minhash_flat
from ..functions.shingles import list_column_flat


def band_explode_batch(batch: pa.Table, *, cfg: DedupConfig) -> pa.Table:
    """docs batch → (doc_id, bucket) rows, one per (doc, band).

    Payload is deliberately minimal (16 bytes/row): shingles and text are
    re-attached to *pairs* after bucket grouping via a hash join, so the
    shuffle does not carry the document payload b× times.
    """
    flat, offsets = list_column_flat(batch["shingles"])
    a, b = make_perms(cfg.num_perms, cfg.seed)
    sig = minhash_flat(flat, offsets, a, b)
    keys = lsh_bucket_keys(sig, cfg.lsh_bands, cfg.lsh_rows, cfg.seed)  # (n, bands)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    cols = {
        "doc_id": pa.array(np.repeat(doc_ids, cfg.lsh_bands), type=pa.int64()),
        "bucket": pa.array(keys.reshape(-1), type=pa.uint64()),
    }
    if cfg.simhash_max_hamming is not None:
        sims = batch["simhash"].to_numpy(zero_copy_only=False)
        cols["simhash"] = pa.array(np.repeat(sims, cfg.lsh_bands), type=pa.uint64())
    return pa.table(cols)


def signature_batch(batch: pa.Table, *, cfg: DedupConfig) -> pa.Table:
    """docs batch + minhash:list<uint64> column (for inspection/compat)."""
    flat, offsets = list_column_flat(batch["shingles"])
    a, b = make_perms(cfg.num_perms, cfg.seed)
    sig = minhash_flat(flat, offsets, a, b)
    n, k = sig.shape
    lists = pa.ListArray.from_arrays(
        pa.array(np.arange(0, (n + 1) * k, k, dtype=np.int32)),
        pa.array(sig.reshape(-1), type=pa.uint64()),
    )
    return batch.append_column("minhash", lists)


def _pairs_for_sorted_runs(ids: np.ndarray, starts: np.ndarray,
                           counts: np.ndarray, cfg: DedupConfig):
    """Vectorized pair emission for bucket runs in a (bucket, doc_id)-sorted
    id array. Small buckets → all pairs; oversized → neighbour chaining.
    Returns (left_pos, right_pos, oversized): position arrays indexing into
    the sorted arrays (callers gather ids/SimHashes through them)."""
    lefts, rights, overs = [], [], []
    for s, c in zip(starts, counts):
        seg = np.arange(s, s + c, dtype=np.int64)
        # a doc could appear twice in one bucket only via band-key collision;
        # dedupe positions by doc id within the run
        uniq_mask = np.ones(c, dtype=bool)
        uniq_mask[1:] = np.diff(ids[s: s + c]) != 0
        seg = seg[uniq_mask]
        n = len(seg)
        if n < 2:
            continue
        if n <= cfg.max_bucket_size:
            iu = np.triu_indices(n, k=1)
            lefts.append(seg[iu[0]])
            rights.append(seg[iu[1]])
            overs.append(np.zeros(len(iu[0]), dtype=np.int8))
        else:
            w = cfg.chain_width
            for d in range(1, min(w, n - 1) + 1):
                lefts.append(seg[:-d])
                rights.append(seg[d:])
                overs.append(np.ones(n - d, dtype=np.int8))
    if not lefts:
        z = np.empty(0, np.int64)
        return z, z.copy(), np.empty(0, np.int8)
    lpos = np.concatenate(lefts)
    rpos = np.concatenate(rights)
    overs = np.concatenate(overs)
    return lpos, rpos, overs


def pairs_in_partition(group: pa.Table, *, cfg: DedupConfig) -> pa.Table:
    """map_groups body over one COARSE partition (bucket % P), not one
    bucket: per-group Python overhead across millions of tiny buckets would
    dominate wall-time (measured 37s → <1s at sf0.01). Inside, buckets are
    recovered by a numpy lexsort and paired vectorized; the SimHash Hamming
    prefilter kills far-apart pairs before they ever reach the payload
    joins (cfg.simhash_max_hamming)."""
    from ..functions.simhash import hamming64

    buckets = group["bucket"].to_numpy(zero_copy_only=False).astype(np.uint64)
    ids = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    use_sim = cfg.simhash_max_hamming is not None and "simhash" in group.column_names
    sims = (group["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
            if use_sim else None)
    order = np.lexsort((ids, buckets))
    buckets, ids = buckets[order], ids[order]
    if use_sim:
        sims = sims[order]
    _, starts, counts = np.unique(buckets, return_index=True, return_counts=True)
    multi = counts > 1
    lpos, rpos, overs = _pairs_for_sorted_runs(ids, starts[multi],
                                               counts[multi], cfg)
    left, right = ids[lpos], ids[rpos]
    if use_sim and len(lpos):
        ham = hamming64(sims[lpos], sims[rpos])
        keep = ham <= cfg.simhash_max_hamming
        left, right, overs = left[keep], right[keep], overs[keep]
    return pa.table({"left_id": pa.array(left, pa.int64()),
                     "right_id": pa.array(right, pa.int64()),
                     "oversized": pa.array(overs.astype(np.int64), pa.int64())})


def dedup_pairs_partition(group: pa.Table) -> pa.Table:
    """Distinct (left,right) within one pair-hash partition, keeping max
    oversized flag — numpy, no per-pair Python."""
    left = group["left_id"].to_numpy(zero_copy_only=False)
    right = group["right_id"].to_numpy(zero_copy_only=False)
    over = group["oversized"].to_numpy(zero_copy_only=False)
    order = np.lexsort((-over, right, left))
    left, right, over = left[order], right[order], over[order]
    new = np.ones(len(left), dtype=bool)
    if len(left) > 1:
        new[1:] = (np.diff(left) != 0) | (np.diff(right) != 0)
    return pa.table({"left_id": pa.array(left[new], pa.int64()),
                     "right_id": pa.array(right[new], pa.int64()),
                     "oversized": pa.array(over[new], pa.int64())})


def candidate_pairs(bands_ds, cfg: DedupConfig, num_partitions: int | None = None):
    """(doc_id, bucket) Dataset → distinct candidate pair Dataset.

    Two shuffles, both on COARSE partition keys (bucket % P, pair-hash % P)
    so group count equals P, not the number of distinct buckets/pairs; the
    fine-grained grouping happens vectorized inside each partition task.
    """
    from ..functions.hashing import pair_hash
    from ..util import default_task_partitions

    P = num_partitions or default_task_partitions()

    def add_part(t: pa.Table) -> pa.Table:
        b = t["bucket"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column("part", pa.array((b % P).astype(np.int64), pa.int64()))

    parts = bands_ds.map_batches(add_part, batch_format="pyarrow")
    pairs = parts.groupby("part").map_groups(
        pairs_in_partition, batch_format="pyarrow", fn_kwargs={"cfg": cfg}
    )

    def add_pair_part(t: pa.Table) -> pa.Table:
        l = t["left_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        r = t["right_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = pair_hash(l, r)
        return t.append_column("ppart", pa.array((h % P).astype(np.int64), pa.int64()))

    # pair-hash partition key spreads hot (left_id-skewed) pair ranges across
    # all P reduce tasks, which also load-balances the Levenshtein-heavy
    # verify stage that consumes these blocks
    deduped = pairs.map_batches(add_pair_part, batch_format="pyarrow") \
        .groupby("ppart").map_groups(dedup_pairs_partition, batch_format="pyarrow")
    return deduped
