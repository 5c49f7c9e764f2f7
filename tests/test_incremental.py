"""Incremental (delta-ingest) dedup (`pipelines/incremental.py`):
partition equivalence vs the full pipeline on A ∪ B, exact-copy routing,
and state-fingerprint invalidation."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from doppel_speller_ray.config import DedupConfig
from doppel_speller_ray.pipelines.dedup import dedup_pipeline
from doppel_speller_ray.pipelines.incremental import (
    incremental_dedup,
    save_dedup_state,
)
from doppel_speller_ray.sources.fixtures import make_pages


def _docs_table(seed=42, n_clusters=25, n_singletons=60):
    """pages fixture → (doc_id, text) table; sequential ids."""
    pages, _ = make_pages(n_clusters=n_clusters, n_singletons=n_singletons,
                          seed=seed)
    n = pages.num_rows
    return pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                     "text": pages["text"]})


def _partition(clusters_ds) -> dict[int, int]:
    """doc_id → min-member-of-cluster (label-free partition encoding)."""
    df = clusters_ds.to_pandas()
    rep = df.groupby("cluster_id")["doc_id"].transform("min")
    return dict(zip(df["doc_id"].tolist(), rep.tolist()))


@pytest.fixture(scope="module")
def cfg():
    return DedupConfig(max_chars=None)


def test_incremental_matches_full(ray_session, cfg, tmp_path_factory):
    import ray.data as rd

    docs = _docs_table()
    n = docs.num_rows
    cut = int(n * 0.6)  # clusters span the cut (fixture rows are shuffled)
    base_t, delta_t = docs.slice(0, cut), docs.slice(cut)

    full = dedup_pipeline(rd.from_arrow(docs), cfg)
    full_part = _partition(full.clusters)

    state = str(tmp_path_factory.mktemp("dedup_state"))
    base = dedup_pipeline(rd.from_arrow(base_t), cfg)
    save_dedup_state(base, cfg, state)

    inc = incremental_dedup(state, rd.from_arrow(delta_t), cfg)
    inc_part = _partition(inc.clusters)

    assert set(inc_part) == set(full_part) == set(range(n))
    mismatches = [d for d in range(n) if inc_part[d] != full_part[d]]
    assert mismatches == [], (
        f"{len(mismatches)} docs clustered differently; first: "
        f"{mismatches[:5]}")


def test_exact_copy_delta_joins_existing_cluster(ray_session, cfg, tmp_path):
    """A delta doc byte-equal to a base doc must land in its cluster via
    the join tier (no LSH needed), and stats must count the match."""
    import ray.data as rd

    base_t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["alpha beta gamma delta epsilon zeta eta theta",
                          "one two three four five six seven eight nine",
                          "unrelated text that stands completely alone ok"]),
    })
    state = str(tmp_path / "state")
    base = dedup_pipeline(rd.from_arrow(base_t), cfg)
    save_dedup_state(base, cfg, state)

    delta_t = pa.table({
        "doc_id": pa.array([10, 11], pa.int64()),
        "text": pa.array(["alpha beta gamma delta epsilon zeta eta theta",
                          "totally fresh content unseen in the base corpus"]),
    })
    inc = incremental_dedup(state, rd.from_arrow(delta_t), cfg)
    part = _partition(inc.clusters)
    assert part[10] == part[0]          # exact copy joined doc 0's cluster
    assert part[11] == 11               # fresh doc is a singleton
    assert inc.stats["n_prev_matched"] == 1


def test_state_fingerprint_invalidation(ray_session, cfg, tmp_path):
    import ray.data as rd

    base = dedup_pipeline(rd.from_arrow(_docs_table(seed=7, n_clusters=3,
                                                    n_singletons=5)), cfg)
    state = str(tmp_path / "state")
    save_dedup_state(base, cfg, state)
    other = DedupConfig(max_chars=None, n_grams=4)
    with pytest.raises(ValueError, match="different config"):
        incremental_dedup(state, rd.from_arrow(_docs_table(seed=8)), other)
