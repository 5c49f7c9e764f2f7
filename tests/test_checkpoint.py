"""Checkpoint/resume with lineage manifests (north_rule resumability)."""

import json
import os

import pytest

from doppel_speller_ray.config import DedupConfig


def test_checkpoint_manifest_and_resume(ray_session, tmp_path):
    import ray.data as rd

    from doppel_speller_ray.state.checkpoint import (
        checkpoint_valid,
        config_fingerprint,
        read_manifest,
        read_or_run,
    )

    cfg = DedupConfig()
    calls = {"n": 0}

    def factory():
        calls["n"] += 1
        return rd.range(1000)

    out = str(tmp_path)
    ds1 = read_or_run(factory, out, "stage_a", cfg)
    assert ds1.count() == 1000
    assert calls["n"] == 1

    m = read_manifest(out, "stage_a")
    assert m["total_rows"] == 1000
    assert m["n_files"] == len(m["partitions"]) >= 1
    for p in m["partitions"]:
        assert p["rows"] > 0 and len(p["signature"]) == 16

    # resume: same config → factory NOT re-run
    ds2 = read_or_run(factory, out, "stage_a", cfg)
    assert ds2.count() == 1000
    assert calls["n"] == 1

    # config change → fingerprint mismatch → stage re-runs
    cfg2 = DedupConfig(num_perms=256, lsh_bands=32)
    assert config_fingerprint(cfg) != config_fingerprint(cfg2)
    assert not checkpoint_valid(out, "stage_a", config_fingerprint(cfg2))
    read_or_run(factory, out, "stage_a", cfg2)
    assert calls["n"] == 2

    # corrupted manifest → invalid → re-run
    with open(os.path.join(out, "stage_a", "manifest.json"), "w") as f:
        f.write("{not json")
    read_or_run(factory, out, "stage_a", cfg2)
    assert calls["n"] == 3


def test_dedup_pipeline_resumes_from_checkpoints(ray_session, tmp_path):
    import ray.data as rd

    from doppel_speller_ray.pipelines.dedup import dedup_pipeline
    from doppel_speller_ray.sources.fixtures import make_pages

    pages, _ = make_pages(n_clusters=10, n_singletons=30, seed=3)
    cfg = DedupConfig(max_chars=None, checkpoint_dir=str(tmp_path))
    res1 = dedup_pipeline(rd.from_arrow(pages), cfg, id_col="url", text_col="text")
    c1 = sorted((r["doc_id"], r["cluster_id"]) for r in res1.clusters.take_all())

    stages = set(os.listdir(tmp_path))
    assert {"docs_with_rep", "reps", "verified_pairs"} <= stages
    for s in ("docs_with_rep", "reps", "verified_pairs"):
        assert os.path.exists(tmp_path / s / "_SUCCESS")
        assert os.path.exists(tmp_path / s / "manifest.json")

    # second run resumes from the checkpoints and reproduces the clusters
    res2 = dedup_pipeline(rd.from_arrow(pages), cfg, id_col="url", text_col="text")
    c2 = sorted((r["doc_id"], r["cluster_id"]) for r in res2.clusters.take_all())
    assert c1 == c2


def test_checkpoint_invalidated_by_changed_input(ray_session, tmp_path):
    """Same checkpoint_dir + same config but a DIFFERENT input must NOT
    replay the previous corpus's stage Parquet (the stale-resume bug the
    input-identity fingerprint prevents — ADVICE r1). File-backed inputs
    carry their source paths+sizes into the fingerprint."""
    import ray.data as rd

    from doppel_speller_ray.pipelines.dedup import dedup_pipeline
    from doppel_speller_ray.sources.fixtures import make_pages

    pages_a, _ = make_pages(n_clusters=6, n_singletons=10, seed=5)
    pages_b, _ = make_pages(n_clusters=3, n_singletons=25, seed=17)
    in_a, in_b = tmp_path / "in_a", tmp_path / "in_b"
    import pyarrow.parquet as pq

    in_a.mkdir(); in_b.mkdir()
    pq.write_table(pages_a, in_a / "part-0.parquet")
    pq.write_table(pages_b, in_b / "part-0.parquet")
    ckpt = tmp_path / "ckpt"
    cfg = DedupConfig(max_chars=None, checkpoint_dir=str(ckpt))

    res_a = dedup_pipeline(rd.read_parquet(str(in_a)), cfg,
                           id_col="url", text_col="text")
    rows_a = res_a.clusters.count()
    # rerun on input B with the SAME checkpoint dir: must compute B fresh
    res_b = dedup_pipeline(rd.read_parquet(str(in_b)), cfg,
                           id_col="url", text_col="text")
    rows_b = res_b.clusters.count()
    assert rows_a == len(pages_a)
    assert rows_b == len(pages_b)
    assert rows_a != rows_b        # a stale replay would repeat A's count
