"""Unit tests for bench.py's distributed recall/precision counting.

The bench-scale `--recall` mode relies on `dup_pair_stats` to compute
dup-pair recall against the replicated-corpus truth (doc_id // replicate
identifies the original group). The counting is three distributed
groupby-aggregates (Σ c·(c−1)/2); these tests pin it to hand-computed
truth on a tiny cluster table.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def _clusters_ds(rows):
    import ray.data as rd

    return rd.from_items(
        [{"doc_id": d, "cluster_id": c} for d, c in rows]
    )


def test_dup_pair_stats_hand_computed(ray_session):
    # replicate=2: orig groups {0,1} {2,3} {4,5}  → truth = 3 pairs.
    # Clusters: A={0,1,2} B={3} C={4,5}
    #   hit       = (0,1) in A + (4,5) in C           = 2
    #   predicted = C(3,2) in A + C(2,2) in C = 3 + 1 = 4
    ds = _clusters_ds([(0, "A"), (1, "A"), (2, "A"),
                       (3, "B"), (4, "C"), (5, "C")])
    stats = bench.dup_pair_stats(ds, replicate=2)
    assert stats["truth_pairs"] == 3
    assert stats["hit_pairs"] == 2
    assert stats["predicted_pairs"] == 4
    assert stats["recall"] == pytest.approx(2 / 3, abs=1e-5)
    assert stats["precision_lower_bound"] == pytest.approx(0.5, abs=1e-5)


def test_dup_pair_stats_perfect_clustering(ray_session):
    # replicate=3, every orig group exactly one cluster → recall =
    # precision = 1.0, truth = predicted = hit = 2 groups × C(3,2).
    rows = [(g * 3 + i, f"c{g}") for g in range(2) for i in range(3)]
    stats = bench.dup_pair_stats(_clusters_ds(rows), replicate=3)
    assert stats["truth_pairs"] == 6
    assert stats["hit_pairs"] == 6
    assert stats["predicted_pairs"] == 6
    assert stats["recall"] == 1.0
    assert stats["precision_lower_bound"] == 1.0


def test_dup_pair_stats_singletons(ray_session):
    # replicate=1: every doc its own orig group → zero truth pairs;
    # recall defined as 1.0, precision penalises the spurious merge.
    ds = _clusters_ds([(0, "A"), (1, "A"), (2, "B")])
    stats = bench.dup_pair_stats(ds, replicate=1)
    assert stats["truth_pairs"] == 0
    assert stats["hit_pairs"] == 0
    assert stats["predicted_pairs"] == 1
    assert stats["recall"] == 1.0
    assert stats["precision_lower_bound"] == 0.0
