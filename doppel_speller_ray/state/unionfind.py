"""Connected components over verified duplicate pairs (SURVEY.md §2.5 A10).

Two implementations behind one interface:

* ``clusters_from_pairs`` — driver-side union-find with path compression.
  The verified-pair set is orders of magnitude smaller than the corpus
  (only near-duplicate docs appear in it), so streaming it to the driver via
  ``iter_batches`` is the pragmatic default; the result is a compact
  doc_id → cluster_id dict that is broadcast (``ray.put``) back into a
  ``map_batches`` assignment over the full corpus.
* ``connected_components_distributed`` (state/cc.py) — alternating
  large-star/small-star rounds (Kiveris et al., SoCC'14) as coarse-partition
  Dataset groupbys, for pair sets too large for one driver heap.

Cluster ids are canonicalized to the minimum doc_id in the component, making
output deterministic regardless of pair order or partitioning.
"""

from __future__ import annotations

import numpy as np


class UnionFind:
    """Union-find with path halving; roots canonicalized to min member."""

    __slots__ = ("parent", "nodes")

    def __init__(self) -> None:
        self.parent: dict[int, int] = {}
        self.nodes: set[int] = set()

    def find(self, x: int) -> int:
        parent = self.parent
        root = parent.get(x, x)
        while root != parent.get(root, root):
            parent[root] = parent.get(parent[root], parent[root])
            root = parent[root]
        while parent.get(x, x) != root:
            parent[x], x = root, parent[x]
        return root

    def union(self, a: int, b: int) -> None:
        self.nodes.add(a)
        self.nodes.add(b)
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        # canonical root = smaller id → deterministic cluster ids
        if rb < ra:
            ra, rb = rb, ra
        self.parent[rb] = ra

    def union_arrays(self, left: np.ndarray, right: np.ndarray) -> None:
        for a, b in zip(left.tolist(), right.tolist()):
            self.union(a, b)

    def components(self) -> dict[int, int]:
        """node → min-id root, for every node ever touched."""
        return {x: self.find(x) for x in self.nodes}


def cc_numpy(left: np.ndarray, right: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized connected components over edge arrays on the driver.

    Iterative min-label propagation + pointer jumping, all numpy — the
    per-edge Python union() loop was the pipeline's dominant NON-parallel
    cost at millions of pairs (~4 µs/edge); this is ~50× faster and
    O(E·log n) with vectorized passes.

    Returns (nodes sorted ascending, root node id per node) — roots are the
    min node id of each component (same canonicalization as UnionFind).
    """
    if len(left) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    nodes = np.unique(np.concatenate([left, right]))
    li = np.searchsorted(nodes, left)
    ri = np.searchsorted(nodes, right)
    lab = np.arange(len(nodes), dtype=np.int64)
    while True:
        m = np.minimum(lab[li], lab[ri])
        np.minimum.at(lab, li, m)
        np.minimum.at(lab, ri, m)
        # pointer jumping until fixpoint of the current label forest
        while True:
            nxt = lab[lab]
            if (nxt == lab).all():
                break
            lab = nxt
        if (np.minimum(lab[li], lab[ri]) == np.maximum(lab[li], lab[ri])).all():
            break
    return nodes, nodes[lab]


def pairs_arrays(pairs_ds, dup_only: bool = True,
                 has_flag: bool | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Stream a pair Dataset into flat (left, right) numpy arrays.

    Pass ``has_flag`` when the schema is statically known — ``schema()`` on
    a lazy dataset triggers a limit-1 probe execution."""
    if has_flag is None:
        schema = pairs_ds.schema()
        if schema is None:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        has_flag = "is_dup" in schema.names
    cols = ["left_id", "right_id"] + (["is_dup"] if has_flag else [])
    lefts, rights = [], []
    for batch in pairs_ds.select_columns(cols).iter_batches(
        batch_size=262144, batch_format="numpy"
    ):
        left = batch["left_id"].astype(np.int64)
        right = batch["right_id"].astype(np.int64)
        if has_flag and dup_only:
            mask = batch["is_dup"].astype(bool)
            left, right = left[mask], right[mask]
        lefts.append(left)
        rights.append(right)
    if not lefts:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(lefts), np.concatenate(rights)


def clusters_from_pairs_arrays(pairs_ds, dup_only: bool = True,
                               has_flag: bool | None = None):
    """pair Dataset → (nodes, roots) arrays via streaming + numpy CC."""
    left, right = pairs_arrays(pairs_ds, dup_only, has_flag)
    return cc_numpy(left, right)


def clusters_from_pairs(pairs_ds, dup_only: bool = True) -> dict[int, int]:
    """Stream a pair Dataset (left_id, right_id [, is_dup]) into union-find.

    Returns doc_id → cluster_id for documents that belong to a non-trivial
    cluster. Documents absent from the dict are singletons (cluster = self).
    """
    uf = UnionFind()
    schema = pairs_ds.schema()
    if schema is None:  # fully empty dataset (no pairs at all)
        return {}
    has_flag = "is_dup" in schema.names
    cols = ["left_id", "right_id"] + (["is_dup"] if has_flag else [])
    for batch in pairs_ds.select_columns(cols).iter_batches(
        batch_size=65536, batch_format="numpy"
    ):
        left = batch["left_id"].astype(np.int64)
        right = batch["right_id"].astype(np.int64)
        if has_flag and dup_only:
            mask = batch["is_dup"].astype(bool)
            left, right = left[mask], right[mask]
        uf.union_arrays(left, right)
    return uf.components()


def assign_clusters(docs_ds, mapping, id_col: str = "doc_id"):
    """docs → (doc_id, cluster_id) via the broadcast component mapping.

    ``mapping`` is either a dict (small use-cases) or a (nodes, roots)
    numpy array pair from :func:`cc_numpy` — arrays are the scale path:
    tiny to pickle, looked up per batch with a vectorized searchsorted
    instead of a per-row dict probe. Broadcast ONCE via ray.put; never
    re-shipped per batch.
    """
    import pyarrow as pa
    import ray

    if isinstance(mapping, dict):
        nodes = np.fromiter(mapping.keys(), dtype=np.int64, count=len(mapping))
        roots = np.fromiter(mapping.values(), dtype=np.int64, count=len(mapping))
        order = np.argsort(nodes)
        nodes, roots = nodes[order], roots[order]
    else:
        nodes, roots = mapping
    ref = ray.put((nodes, roots))

    def assign(batch: pa.Table) -> pa.Table:
        bn, br = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out = ids.copy()  # default: singleton cluster = own id
        if len(bn):
            pos = np.searchsorted(bn, ids)
            pos_c = np.minimum(pos, len(bn) - 1)
            found = bn[pos_c] == ids
            out[found] = br[pos_c[found]]
        return pa.table({id_col: batch[id_col], "cluster_id": pa.array(out, pa.int64())})

    return docs_ds.map_batches(assign, batch_format="pyarrow")


def assign_clusters_join(docs_ds, labels_ds, id_col: str = "doc_id",
                         num_partitions: int | None = None):
    """docs → (doc_id, cluster_id) via a scale-out left join against a
    labels Dataset (node:int64, label:int64) — the assignment path when the
    component mapping itself is too large to broadcast. Docs absent from
    the labels (singletons) keep their own id as cluster_id."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..util import default_num_partitions

    if num_partitions is None:
        num_partitions = default_num_partitions()
    ids_only = docs_ds.select_columns([id_col])
    joined = ids_only.join(labels_ds, join_type="left_outer",
                           num_partitions=num_partitions,
                           on=(id_col,), right_on=("node",))

    def finish(t: pa.Table) -> pa.Table:
        cluster = pc.coalesce(t["label"], t[id_col])
        return pa.table({id_col: t[id_col],
                         "cluster_id": cluster.cast(pa.int64())})

    return joined.map_batches(finish, batch_format="pyarrow")
