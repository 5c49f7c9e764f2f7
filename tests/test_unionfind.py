import numpy as np

from doppel_speller_ray.state.unionfind import UnionFind


def test_unionfind_basic():
    uf = UnionFind()
    uf.union(1, 2)
    uf.union(2, 3)
    uf.union(10, 11)
    comps = uf.components()
    assert comps[1] == comps[2] == comps[3] == 1
    assert comps[10] == comps[11] == 10


def test_min_canonicalization_order_independent():
    import random

    edges = [(5, 9), (9, 2), (2, 7), (100, 101)]
    for seed in range(5):
        rng = random.Random(seed)
        e = edges[:]
        rng.shuffle(e)
        uf = UnionFind()
        for a, b in e:
            uf.union(a, b)
        comps = uf.components()
        assert comps[5] == comps[9] == comps[2] == comps[7] == 2
        assert comps[100] == 100


def test_union_arrays_chain():
    uf = UnionFind()
    left = np.arange(0, 999, dtype=np.int64)
    right = left + 1
    uf.union_arrays(left, right)
    comps = uf.components()
    assert all(v == 0 for v in comps.values())


def test_distributed_cc_matches_unionfind(ray_session):
    import ray.data as rd

    from doppel_speller_ray.state.cc import connected_components_distributed
    from doppel_speller_ray.state.unionfind import clusters_from_pairs

    rng = np.random.default_rng(4)
    # several chains + stars + singles
    pairs = []
    pairs += [(i, i + 1) for i in range(100, 140)]          # long chain
    pairs += [(200, x) for x in range(201, 220)]            # star
    pairs += [(int(a), int(b)) for a, b in rng.integers(300, 360, (40, 2)) if a != b]
    ds = rd.from_items([{"left_id": a, "right_id": b} for a, b in pairs])

    want = clusters_from_pairs(ds, dup_only=False)
    labels = connected_components_distributed(ds)
    got = {int(r["node"]): int(r["label"]) for r in labels.take_all()}
    assert got == want
