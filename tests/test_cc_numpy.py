"""Vectorized driver CC vs the reference UnionFind implementation."""

import numpy as np

from doppel_speller_ray.state.unionfind import UnionFind, cc_numpy


def _uf_mapping(edges):
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    return uf.components()


def test_cc_numpy_matches_unionfind_random():
    rng = np.random.default_rng(17)
    for trial in range(5):
        n = 2000
        edges = rng.integers(0, 500, (n, 2)).astype(np.int64)
        edges = edges[edges[:, 0] != edges[:, 1]]
        nodes, roots = cc_numpy(edges[:, 0], edges[:, 1])
        want = _uf_mapping(edges.tolist())
        got = dict(zip(nodes.tolist(), roots.tolist()))
        assert got == want


def test_cc_numpy_chain_and_star():
    # long chain (worst case for naive propagation) + star + singles
    edges = [(i, i + 1) for i in range(1000, 1500)]
    edges += [(5000, x) for x in range(5001, 5050)]
    left = np.array([e[0] for e in edges], np.int64)
    right = np.array([e[1] for e in edges], np.int64)
    nodes, roots = cc_numpy(left, right)
    got = dict(zip(nodes.tolist(), roots.tolist()))
    assert all(got[i] == 1000 for i in range(1000, 1501))
    assert all(got[x] == 5000 for x in range(5000, 5050))


def test_cc_numpy_empty():
    nodes, roots = cc_numpy(np.empty(0, np.int64), np.empty(0, np.int64))
    assert len(nodes) == 0 and len(roots) == 0
