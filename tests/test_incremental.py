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


def test_chained_daily_deltas(ray_session, cfg, tmp_path):
    """Round-5 review finding: the incremental result must be CHAINABLE —
    save_dedup_state(day1_result) then a day-2 delta against the rolled
    state must equal the full pipeline over all three corpora."""
    import ray.data as rd

    base_t = _docs_table(seed=42, n_clusters=8, n_singletons=10)
    n0 = base_t.num_rows
    d1 = _docs_table(seed=43, n_clusters=4, n_singletons=6)
    d1 = d1.set_column(0, "doc_id",
                       pa.array(np.arange(n0, n0 + d1.num_rows), pa.int64()))
    n1 = n0 + d1.num_rows
    d2 = _docs_table(seed=44, n_clusters=3, n_singletons=5)
    d2 = d2.set_column(0, "doc_id",
                       pa.array(np.arange(n1, n1 + d2.num_rows), pa.int64()))

    s1 = str(tmp_path / "s1")
    s2 = str(tmp_path / "s2")
    base = dedup_pipeline(rd.from_arrow(base_t), cfg)
    save_dedup_state(base, cfg, s1)
    day1 = incremental_dedup(s1, rd.from_arrow(d1), cfg)
    save_dedup_state(day1, cfg, s2)          # ← the previously-broken step
    day2 = incremental_dedup(s2, rd.from_arrow(d2), cfg)

    full = dedup_pipeline(
        rd.from_arrow(pa.concat_tables([base_t, d1, d2])), cfg)
    assert _partition(day2.clusters) == _partition(full.clusters)
    # chained docs table stays with_rep-shaped and covers every id once
    df = day2.docs.select_columns(["doc_id", "is_rep"]).to_pandas()
    assert sorted(df["doc_id"]) == list(range(n1 + d2.num_rows))


def test_delta_id_collision_guard(ray_session, cfg, tmp_path):
    """Round-5 review finding: a delta doc_id already present in the
    stored corpus (recrawl-with-changed-text hazard) must be refused, not
    silently verified against an arbitrary payload row."""
    import ray.data as rd

    base_t = _docs_table(seed=7, n_clusters=3, n_singletons=4)
    state = str(tmp_path / "state")
    save_dedup_state(dedup_pipeline(rd.from_arrow(base_t), cfg), cfg, state)

    delta_t = pa.table({
        "doc_id": pa.array([0, 9999], pa.int64()),   # 0 collides
        "text": pa.array(["changed text for an existing id oh no",
                          "genuinely new content here"]),
    })
    with pytest.raises(ValueError, match="disjoint"):
        incremental_dedup(state, rd.from_arrow(delta_t), cfg)
    # and the escape hatch still runs
    out = incremental_dedup(state, rd.from_arrow(delta_t), cfg,
                            check_disjoint_ids=False)
    assert out.clusters.count() > 0


def test_execution_knobs_do_not_invalidate_state(ray_session, cfg, tmp_path):
    """Round-5 review finding: pure-execution knobs (checkpoint_dir,
    batch_size, broadcast threshold) do not define the index and must not
    force a state rebuild."""
    import ray.data as rd

    base_t = _docs_table(seed=11, n_clusters=3, n_singletons=4)
    state = str(tmp_path / "state")
    save_dedup_state(dedup_pipeline(rd.from_arrow(base_t), cfg), cfg, state)

    exec_only = DedupConfig(max_chars=None, batch_size=512,
                            broadcast_payload_max_bytes=123456789,
                            checkpoint_dir=str(tmp_path / "ckpt"))
    delta_t = pa.table({
        "doc_id": pa.array([5000], pa.int64()),
        "text": pa.array(["fresh content for the execution knob test"]),
    })
    out = incremental_dedup(state, rd.from_arrow(delta_t), exec_only)
    assert out.clusters.count() == base_t.num_rows + 1
