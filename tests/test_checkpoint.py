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


def test_distributed_cc_resumes_from_round_checkpoint(ray_session, tmp_path, monkeypatch):
    """Kill the star loop mid-convergence (max_iters cap) with round
    checkpointing on; a fresh call must resume from the checkpointed,
    partially-contracted edge set (not the raw pairs) and still produce
    labels identical to the driver union-find (VERDICT r2 item 6)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from doppel_speller_ray.state import checkpoint as ckpt_mod
    from doppel_speller_ray.state.cc import connected_components_distributed
    from doppel_speller_ray.state.unionfind import cc_numpy

    # chain graph: 0-1-2-...-399 plus a few separate triangles
    n = 400
    left = np.arange(n - 1, dtype=np.int64)
    right = left + 1
    tri = np.array([[1000, 1001], [1001, 1002], [2000, 2001]], np.int64)
    left = np.concatenate([left, tri[:, 0]])
    right = np.concatenate([right, tri[:, 1]])
    pairs = rd.from_arrow(pa.table({"left_id": pa.array(left), "right_id": pa.array(right)}))

    ckdir = str(tmp_path / "cc")
    # run 1: dies after 2 rounds — exhausting max_iters without converging
    # now FAILS LOUDLY (round-5 review: silently emitting labels from a
    # non-star edge set splits components); the round checkpoint written
    # before the failure is the resume point
    import pytest

    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_distributed(pairs, max_iters=2, num_partitions=4,
                                         checkpoint_dir=ckdir,
                                         checkpoint_every=1)
    manifest = ckpt_mod.read_manifest(ckdir, "cc_edges")
    assert manifest["total_rows"] > 0

    # run 2: must RESUME (read_checkpoint called) and complete
    reads = []
    orig = ckpt_mod.read_checkpoint
    monkeypatch.setattr(ckpt_mod, "read_checkpoint",
                        lambda *a, **k: reads.append(a) or orig(*a, **k))
    labels = connected_components_distributed(pairs, num_partitions=4,
                                              checkpoint_dir=ckdir,
                                              checkpoint_every=1)
    assert reads, "resume did not read the round checkpoint"
    got = {r["node"]: r["label"] for r in labels.take_all()}
    want_nodes, want_roots = cc_numpy(left, right)
    want = dict(zip(want_nodes.tolist(), want_roots.tolist()))
    assert got == want


def test_write_output_manifest(ray_session, tmp_path):
    """Final-sink lineage: per-part rows/bytes/signature manifest, written
    as _manifest.json so parquet discovery still reads the directory."""
    import json

    import pyarrow as pa
    import ray.data as rd

    from doppel_speller_ray.state.checkpoint import write_output_manifest

    out = str(tmp_path / "out")
    rd.from_arrow(pa.table({"a": list(range(100))})) \
        .repartition(4).write_parquet(out)
    m = write_output_manifest(out, extra={"stats": {"k": 1}})
    assert m["total_rows"] == 100 and m["n_files"] >= 1
    assert all(set(p) >= {"file", "rows", "bytes", "signature"}
               for p in m["partitions"])
    disk = json.load(open(f"{out}/_manifest.json"))
    assert disk["stats"] == {"k": 1}
    assert rd.read_parquet(out).count() == 100  # manifest not read as data


def test_cc_checkpoint_invalidated_by_caller_token(ray_session, tmp_path):
    """Round-5 review finding: the cc_edges fingerprint must include the
    caller's config token — a rerun with changed thresholds (different
    edge set) must NOT resume the previous config's contracted edges."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from doppel_speller_ray.state.cc import connected_components_distributed

    def pairs_of(edges):
        a = np.array(edges, np.int64)
        return rd.from_arrow(pa.table({"left_id": pa.array(a[:, 0]),
                                       "right_id": pa.array(a[:, 1])}))

    ckdir = str(tmp_path / "cc")
    # config A: one chain 0-1-2
    connected_components_distributed(
        pairs_of([[0, 1], [1, 2]]), num_partitions=4,
        checkpoint_dir=ckdir, checkpoint_every=1, extra_token="cfgA")
    # config B: a DIFFERENT edge set; stale resume would ignore it
    labels = connected_components_distributed(
        pairs_of([[10, 11]]), num_partitions=4,
        checkpoint_dir=ckdir, checkpoint_every=1, extra_token="cfgB")
    got = {r["node"]: r["label"] for r in labels.take_all()}
    assert got == {10: 10, 11: 10}
