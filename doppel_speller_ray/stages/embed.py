"""Embedding-column operators: brute-force cosine top-k (baseline) and
random-hyperplane-LSH near-dup bucketing (scale path).

The embedding column is ``list<float>``; per-batch work is numpy matmul
against broadcast state (the query matrix / the hyperplane matrix), i.e. a
stateless vectorized ``map_batches`` — never per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _final_topk_coarse(partials, k: int, id_col: str,
                       num_partitions: int | None = None):
    """Merge per-batch partial top-k rows into the global per-query top-k
    with ONE coarse-partition groupby (part = query_id % P) and a fully
    vectorized in-partition kernel — no per-query pandas groups (VERDICT r2
    item 5: fine-key map_groups pays per-group Python at millions of
    queries; this is the same coarse pattern as stages/lsh.py).

    Deterministic tie-break: (sim DESC, id ASC) — matches the SQL oracle's
    ORDER BY sim DESC, vec_id."""
    from ..util import default_task_partitions

    P = num_partitions or default_task_partitions()

    def add_part(t: pa.Table) -> pa.Table:
        q = t["query_id"].to_numpy(zero_copy_only=False)
        return t.append_column("part", pa.array(q % P, pa.int64()))

    def topk_partition(group: pa.Table) -> pa.Table:
        q = group["query_id"].to_numpy(zero_copy_only=False)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        sims = group["sim"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -sims, q))
        q, ids, sims = q[order], ids[order], sims[order]
        new = np.ones(len(q), dtype=bool)
        new[1:] = q[1:] != q[:-1]
        starts = np.nonzero(new)[0]
        rank = np.arange(len(q)) - starts[np.cumsum(new) - 1]
        keep = rank < k
        return pa.table({
            "query_id": pa.array(q[keep], pa.int64()),
            id_col: pa.array(ids[keep], pa.int64()),
            "sim": pa.array(sims[keep], pa.float64()),
        })

    return partials.map_batches(add_part, batch_format="pyarrow") \
        .groupby("part").map_groups(topk_partition, batch_format="pyarrow")


def batch_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    """(rows, dim) float64 matrix from a list<float> column, zero-copy-ish."""
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_fixed_size_list(arr.type):
        dim = arr.type.list_size
        return np.asarray(arr.values, dtype=np.float64).reshape(len(arr), dim)
    offsets = np.asarray(arr.offsets)
    lens = np.diff(offsets)
    dim = int(lens[0]) if len(lens) else 0
    if not (lens == dim).all():
        raise ValueError("ragged embedding column")
    return np.asarray(arr.values, dtype=np.float64).reshape(len(arr), dim)


def normalize_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    return mat / np.where(norms == 0, 1, norms)[:, None]


def ann_topk(emb_ds, queries: np.ndarray, k: int = 10, id_col: str = "vec_id"):
    """Brute-force cosine top-k of each query row against the dataset.

    queries: (n_queries, dim). Broadcast ONCE via ray.put; per batch one
    matmul scores every (query, row) pair; a final per-query groupby takes
    the top-k (n_queries is small — the groupby is over n_queries × k·B
    partial rows thanks to the in-batch top-k cut)."""
    import ray

    qn = normalize_rows(np.asarray(queries, dtype=np.float64))
    ref = ray.put(qn)

    def score(batch: pa.Table) -> pa.Table:
        q = ray.get(ref)
        mat = normalize_rows(batch_matrix(batch))
        sims = mat @ q.T  # (rows, n_queries)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        # in-batch top-k per query: only k rows per query leave each batch
        kk = min(k, sims.shape[0])
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (k, n_queries)
        n_q = sims.shape[1]
        qidx = np.repeat(np.arange(n_q), kk)
        ridx = top.T.reshape(-1)
        return pa.table({
            "query_id": pa.array(qidx, pa.int64()),
            id_col: pa.array(ids[ridx], pa.int64()),
            "sim": pa.array(sims[ridx, qidx], pa.float64()),
        })

    partials = emb_ds.map_batches(score, batch_format="pyarrow")
    return _final_topk_coarse(partials, k, id_col)


def knn_join(emb_ds, query_ids: np.ndarray, query_mat: np.ndarray,
             k: int = 3, id_col: str = "vec_id"):
    """k-NN join: for each query vector (a row of the SMALL side, broadcast
    once via ``ray.put``), the top-k most-cosine-similar rows of the big
    side, EXCLUDING the query row itself (self pairs are masked to -inf
    inside the batch matmul, so a query whose own vector lives in the big
    side still gets k true neighbours — unlike a post-hoc filter, which
    would leave it k-1).

    The contract is broadcast-join: the query side must fit one object-store
    entry (n_queries × dim float64). At 100 TB the big side streams through
    ``map_batches`` untouched; only k rows per (query, batch) leave each
    batch, and the final merge is the same coarse-partition top-k groupby as
    ``ann_topk``. For a both-sides-large k-NN join, bucket both sides with
    ``hyperplane_codes`` first (the ``embedding_neardup_lsh`` pattern).

    Output columns: (query_id = the query's ``id_col`` value, id_col, sim).
    """
    import ray

    qids = np.asarray(query_ids, dtype=np.int64)
    qn = normalize_rows(np.asarray(query_mat, dtype=np.float64))
    ref = ray.put((qids, qn))

    def score(batch: pa.Table) -> pa.Table:
        qi, q = ray.get(ref)
        mat = normalize_rows(batch_matrix(batch))
        sims = mat @ q.T  # (rows, n_queries)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sims[ids[:, None] == qi[None, :]] = -np.inf  # mask self pairs
        kk = min(k, sims.shape[0])
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (k, n_queries)
        n_q = sims.shape[1]
        qidx = np.repeat(np.arange(n_q), kk)
        ridx = top.T.reshape(-1)
        vals = sims[ridx, qidx]
        keep = np.isfinite(vals)  # a masked self pick can reach top-k only
        return pa.table({         # in tiny (< k+1 row) batches — drop it
            "query_id": pa.array(qidx[keep], pa.int64()),
            id_col: pa.array(ids[ridx][keep], pa.int64()),
            "sim": pa.array(vals[keep], pa.float64()),
        })

    partials = emb_ds.map_batches(score, batch_format="pyarrow")
    merged = _final_topk_coarse(partials, k, id_col)

    def to_qid(t: pa.Table) -> pa.Table:
        qi, _ = ray.get(ref)
        idx = t["query_id"].to_numpy(zero_copy_only=False)
        return pa.table({"query_id": pa.array(qi[idx], pa.int64()),
                         id_col: t[id_col], "sim": t["sim"]})

    return merged.map_batches(to_qid, batch_format="pyarrow")


def kmeans_centroids(mat: np.ndarray, k: int, n_iters: int = 12,
                     seed: int = 42) -> np.ndarray:
    """Lloyd's k-means on unit-normalized vectors (spherical-ish): the IVF
    coarse quantizer. Trained on a driver-side SAMPLE (a few thousand rows),
    never the full corpus — standard IVF practice."""
    rng = np.random.default_rng(seed)
    mat = normalize_rows(np.asarray(mat, dtype=np.float64))
    k = min(k, len(mat))
    cent = mat[rng.choice(len(mat), size=k, replace=False)]
    for _ in range(n_iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = normalize_rows(cent)
    return cent


def ivf_topk(emb_ds, queries: np.ndarray, k: int = 10, *, n_centroids: int = 16,
             nprobe: int | None = None, train_sample: int = 4096,
             seed: int = 42, id_col: str = "vec_id"):
    """IVF (inverted-file) cosine top-k: a k-means coarse quantizer assigns
    every vector to a centroid; each query scores ONLY the vectors whose
    centroid is among its ``nprobe`` closest centroids.

    ``nprobe=None`` probes every centroid → results are EXACTLY brute-force
    top-k (the oracled configuration); small nprobe is the approximate
    scale path (recall measured in tests). At real scale the assignment
    becomes the Parquet partition key so probing prunes at the READ —
    here the filter happens per batch after one broadcast matmul, which is
    the same dataflow without re-writing the corpus."""
    import ray

    sample = emb_ds.limit(train_sample).take_all()
    train = np.stack([np.asarray(r["embedding"], np.float64) for r in sample])
    cent = kmeans_centroids(train, n_centroids, seed=seed)
    n_centroids = len(cent)
    if nprobe is None:
        nprobe = n_centroids
    nprobe = min(nprobe, n_centroids)

    qn = normalize_rows(np.asarray(queries, dtype=np.float64))
    q_cent = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]   # (n_q, nprobe)
    # probe mask per (query, centroid)
    probe = np.zeros((len(qn), n_centroids), dtype=bool)
    probe[np.repeat(np.arange(len(qn)), nprobe), q_cent.reshape(-1)] = True
    ref = ray.put((qn, cent, probe))

    def score(batch: pa.Table) -> pa.Table:
        q, c, pr = ray.get(ref)
        mat = normalize_rows(batch_matrix(batch))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        assign = np.argmax(mat @ c.T, axis=1)          # rows → centroid
        sims = mat @ q.T                                # (rows, n_q)
        allowed = pr[:, assign]                         # (n_q, rows)
        sims = np.where(allowed.T, sims, -np.inf)
        kk = min(k, sims.shape[0])
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]
        n_q = sims.shape[1]
        qidx = np.repeat(np.arange(n_q), kk)
        ridx = top.T.reshape(-1)
        keep = np.isfinite(sims[ridx, qidx])
        return pa.table({
            "query_id": pa.array(qidx[keep], pa.int64()),
            id_col: pa.array(ids[ridx[keep]], pa.int64()),
            "sim": pa.array(sims[ridx[keep], qidx[keep]], pa.float64()),
        })

    partials = emb_ds.map_batches(score, batch_format="pyarrow")
    return _final_topk_coarse(partials, k, id_col)


def hyperplane_codes(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-bit codes (SimHash for vectors, Charikar'02): uint64 per row."""
    bits = (mat @ planes.T) > 0  # (rows, n_planes)
    weights = (np.uint64(1) << np.arange(planes.shape[0], dtype=np.uint64))
    return (bits.astype(np.uint64) * weights[None, :]).sum(axis=1, dtype=np.uint64)


def make_planes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def embedding_neardup_lsh(emb_ds, threshold: float = 0.9, *, n_planes: int = 16,
                          n_tables: int = 4, seed: int = 42,
                          id_col: str = "vec_id", num_partitions: int | None = None):
    """Cosine near-dup pairs via multi-table random-hyperplane LSH.

    Collision probability per table: (1 − θ/π)^n_planes with θ = arccos(sim)
    — rows within a bucket of ANY of the ``n_tables`` independent tables are
    candidates; exact cosine verifies in-bucket (vectorized matmul). The
    bucket groupby uses the same coarse-partition pattern as text LSH.
    """
    import ray

    from ..util import default_task_partitions

    P = num_partitions or default_task_partitions()
    first = emb_ds.take(1)
    dim = len(first[0]["embedding"])
    planes = [make_planes(dim, n_planes, seed + 7 * t) for t in range(n_tables)]
    ref = ray.put(planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        pl = ray.get(ref)
        mat = normalize_rows(batch_matrix(batch))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        out_ids, out_buckets, out_vecs = [], [], []
        for t, p in enumerate(pl):
            codes = hyperplane_codes(mat, p)
            out_ids.append(ids)
            # mix the table index into the key so tables don't collide
            out_buckets.append(codes * np.uint64(n_tables) + np.uint64(t))
            out_vecs.append(mat)
        return pa.table({
            id_col: pa.array(np.concatenate(out_ids), pa.int64()),
            "bucket": pa.array(np.concatenate(out_buckets), pa.uint64()),
            "vec": pa.array(list(np.concatenate(out_vecs, axis=0).astype(np.float32)),
                            pa.list_(pa.float32())),
        })

    buckets = emb_ds.map_batches(bucketize, batch_format="pyarrow")

    def add_part(t: pa.Table) -> pa.Table:
        b = t["bucket"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column("part", pa.array((b % P).astype(np.int64), pa.int64()))

    def pairs_in_partition(group: pa.Table) -> pa.Table:
        b = group["bucket"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = batch_matrix(group, "vec")
        order = np.lexsort((ids, b))
        b, ids, mat = b[order], ids[order], mat[order]
        _, starts, counts = np.unique(b, return_index=True, return_counts=True)
        out_l, out_r = [], []
        for s, c in zip(starts, counts):
            if c < 2:
                continue
            seg_ids = ids[s:s + c]
            keep = np.ones(c, dtype=bool)
            keep[1:] = np.diff(seg_ids) != 0
            seg_ids = seg_ids[keep]
            seg = mat[s:s + c][keep]
            if len(seg_ids) < 2:
                continue
            sims = seg @ seg.T
            iu = np.triu_indices(len(seg_ids), k=1)
            hit = sims[iu] >= threshold
            out_l.append(seg_ids[iu[0][hit]])
            out_r.append(seg_ids[iu[1][hit]])
        if not out_l:
            z = np.empty(0, np.int64)
            return pa.table({"left_id": pa.array(z, pa.int64()),
                             "right_id": pa.array(z, pa.int64())})
        return pa.table({
            "left_id": pa.array(np.concatenate(out_l), pa.int64()),
            "right_id": pa.array(np.concatenate(out_r), pa.int64()),
        })

    pairs = buckets.map_batches(add_part, batch_format="pyarrow") \
        .groupby("part").map_groups(pairs_in_partition, batch_format="pyarrow")

    def dedup(group: pa.Table) -> pa.Table:
        left = group["left_id"].to_numpy(zero_copy_only=False)
        right = group["right_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((right, left))
        left, right = left[order], right[order]
        new = np.ones(len(left), dtype=bool)
        if len(left) > 1:
            new[1:] = (np.diff(left) != 0) | (np.diff(right) != 0)
        return pa.table({"left_id": pa.array(left[new], pa.int64()),
                         "right_id": pa.array(right[new], pa.int64())})

    from ..functions.hashing import pair_hash

    def add_pp(t: pa.Table) -> pa.Table:
        h = pair_hash(t["left_id"].to_numpy(zero_copy_only=False),
                      t["right_id"].to_numpy(zero_copy_only=False))
        return t.append_column("ppart", pa.array((h % np.uint64(P)).astype(np.int64), pa.int64()))

    return pairs.map_batches(add_pp, batch_format="pyarrow") \
        .groupby("ppart").map_groups(dedup, batch_format="pyarrow")
