"""Small-corpus conformance (SURVEY.md §5b): planted dup clusters →
dup-pair recall ≥ 0.99, plus the per-url byte-identical norm_text invariant
(BASELINE input_hint)."""

import collections

import numpy as np
import pyarrow as pa
import pytest

from doppel_speller_ray.config import DedupConfig
from doppel_speller_ray.functions.normalize import transform_text
from doppel_speller_ray.sources.fixtures import make_pages, true_dup_pairs


@pytest.fixture(scope="module")
def pages_and_truth():
    return make_pages(n_clusters=50, n_singletons=120, seed=42)


def test_fixture_deterministic(pages_and_truth):
    pages2, truth2 = make_pages(n_clusters=50, n_singletons=120, seed=42)
    assert pages_and_truth[0].equals(pages2)
    assert pages_and_truth[1].equals(truth2)


def test_dedup_recall(ray_session, pages_and_truth):
    import ray.data as rd

    from doppel_speller_ray.pipelines.dedup import dedup_pipeline

    pages, truth = pages_and_truth
    cfg = DedupConfig(max_chars=None)
    ds = rd.from_arrow(pages)
    res = dedup_pipeline(ds, cfg, id_col="url", text_col="text")

    # map doc_id → url via the docs dataset (url kept as passthrough)
    docs = res.docs.select_columns(["doc_id", "url"]).take_all()
    id_to_url = {r["doc_id"]: r["url"] for r in docs}
    assert len(id_to_url) == pages.num_rows  # no id collisions at this scale

    clusters = res.clusters.take_all()
    by_cluster = collections.defaultdict(list)
    for r in clusters:
        by_cluster[r["cluster_id"]].append(id_to_url[r["doc_id"]])

    predicted = set()
    for members in by_cluster.values():
        members = sorted(members)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                predicted.add((members[i], members[j]))

    truth_pairs = true_dup_pairs(truth, include_containment=False)
    hit = len(truth_pairs & predicted)
    recall = hit / len(truth_pairs)
    assert recall >= 0.99, f"recall {recall:.4f} ({hit}/{len(truth_pairs)})"

    # precision over non-containment urls: predicted pairs must be real dups
    containment_urls = {u for u, k in zip(truth["url"].to_pylist(), truth["kind"].to_pylist())
                        if k == "containment"}
    url_cluster = {u: c for u, c in zip(truth["url"].to_pylist(), truth["cluster_id"].to_pylist())}
    wrong = sum(
        1 for a, b in predicted
        if a not in containment_urls and b not in containment_urls
        and (url_cluster[a] != url_cluster[b] or url_cluster[a] == -1)
    )
    scored = sum(1 for a, b in predicted
                 if a not in containment_urls and b not in containment_urls)
    precision = 1 - wrong / max(scored, 1)
    assert precision >= 0.95, f"precision {precision:.4f}"


def test_containment_tier_in_flagship(ray_session, pages_and_truth):
    """north_star: the substring stage catches contained-duplicate pages LSH
    misses. The fixture plants ``pre + base + post`` containment pages whose
    whole-doc Jaccard vs base is below the LSH/verify gate (the default
    pipeline measures ~0.83 recall on containment-involving pairs); with
    ``DedupConfig(containment=True)`` the certified substring pairs are
    unioned into CC and every planted pair (near/exact AND containment) must
    be recovered."""
    import ray.data as rd

    from doppel_speller_ray.pipelines.dedup import dedup_pipeline

    pages, truth = pages_and_truth
    cfg = DedupConfig(max_chars=None, containment=True)
    res = dedup_pipeline(rd.from_arrow(pages), cfg, id_col="url", text_col="text")

    id_to_url = {r["doc_id"]: r["url"]
                 for r in res.docs.select_columns(["doc_id", "url"]).take_all()}
    by_cluster = collections.defaultdict(list)
    for r in res.clusters.take_all():
        by_cluster[r["cluster_id"]].append(id_to_url[r["doc_id"]])
    predicted = set()
    for members in by_cluster.values():
        members = sorted(members)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                predicted.add((members[i], members[j]))

    t_all = true_dup_pairs(truth, include_containment=True)
    t_cont = t_all - true_dup_pairs(truth, include_containment=False)
    assert t_cont, "fixture must plant containment pages"
    assert res.stats["n_containment_pairs"] > 0
    rc = len(t_cont & predicted) / len(t_cont)
    ra = len(t_all & predicted) / len(t_all)
    assert rc >= 0.99, f"containment recall {rc:.4f}"
    assert ra >= 0.99, f"overall recall {ra:.4f}"


def test_write_clusters_sharded(ray_session, tmp_path):
    """Sharded resumable layout: one hive dir per shard, every doc exactly
    once, rows sorted by doc_id within each shard, overwrite-safe rerun."""
    import os

    import ray.data as rd

    from doppel_speller_ray.pipelines.dedup import dedup_pipeline, write_clusters

    rows = [{"doc_id": i, "text": f"document number {i} with words"}
            for i in range(40)]
    res = dedup_pipeline(rd.from_items(rows), DedupConfig(max_chars=None))
    out = str(tmp_path / "clusters")
    write_clusters(res, out, n_shards=4)
    write_clusters(res, out, n_shards=4)  # rerun must overwrite, not append

    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert dirs == [f"shard={k}" for k in range(4)]
    seen = []
    for d in dirs:
        shard = int(d.split("=")[1])
        t = rd.read_parquet(os.path.join(out, d)).take_all()
        ids = [r["doc_id"] for r in t]
        assert ids == sorted(ids), f"{d} not sorted"
        assert all(i % 4 == shard for i in ids)
        seen.extend(ids)
    assert sorted(seen) == list(range(40))


def test_norm_text_invariant(ray_session, pages_and_truth):
    """Per-url norm_text must be byte-identical to reference transform_title
    semantics applied to the page text."""
    import ray.data as rd

    from doppel_speller_ray.pipelines.dedup import build_docs

    pages, _ = pages_and_truth
    cfg = DedupConfig(max_chars=None)
    docs = build_docs(rd.from_arrow(pages), cfg, id_col="url", text_col="text")
    got = {r["url"]: r["norm_text"]
           for r in docs.select_columns(["url", "norm_text"]).take_all()}
    for url, text in zip(pages["url"].to_pylist(), pages["text"].to_pylist()):
        assert got[url] == transform_text(text, max_chars=None), url


def test_exact_dedup_tier(ray_session):
    import ray.data as rd

    from doppel_speller_ray.pipelines.dedup import build_docs
    from doppel_speller_ray.stages.exact import exact_dedup, split_exact

    rows = [
        {"doc_id": 1, "text": "Hello-World"},
        {"doc_id": 2, "text": "hello world"},      # same normalized text
        {"doc_id": 3, "text": "HELLO  world!!"},   # same normalized text
        {"doc_id": 4, "text": "something else"},
    ]
    cfg = DedupConfig()
    docs = build_docs(rd.from_items(rows), cfg)
    with_rep = exact_dedup(docs)
    reps, pairs = split_exact(with_rep)
    rep_rows = {r["doc_id"] for r in reps.select_columns(["doc_id"]).take_all()}
    assert rep_rows == {1, 4}
    got_pairs = {(r["left_id"], r["right_id"]) for r in pairs.take_all()}
    assert got_pairs == {(1, 2), (1, 3)}
