"""Scale-behavior guarantees: oversized-bucket chaining recall, and
determinism of cluster output across partitionings/batch sizes (retry- and
resume-safety — SURVEY.md §4)."""

import pyarrow as pa
import pytest

from doppel_speller_ray.config import DedupConfig
from doppel_speller_ray.functions.misspell import misspell


def _cluster_sets(res, id_to_key=None):
    import collections

    by = collections.defaultdict(set)
    for r in res.clusters.take_all():
        key = id_to_key[r["doc_id"]] if id_to_key else r["doc_id"]
        by[r["cluster_id"]].add(key)
    return sorted((frozenset(v) for v in by.values()), key=lambda s: min(s))


def test_oversized_bucket_chaining_recall(ray_session):
    """A 24-member near-dup cluster with max_bucket_size=8 forces the
    chained (not all-pairs) emission path; union-find transitivity must
    still recover the full cluster."""
    import ray.data as rd

    from doppel_speller_ray.pipelines.dedup import dedup_pipeline

    base = ("winnow shingle bucket verify cluster candidate corpus document "
            "table query scan filter join merge sort group window stream ") * 4
    rows = [{"doc_id": i, "text": misspell(base, 900 + i)} for i in range(24)]
    rows += [{"doc_id": 100 + i, "text": f"totally unrelated text number {i} "
              + " ".join(f"tok{i}{j}" for j in range(30))} for i in range(10)]
    cfg = DedupConfig(max_chars=None, max_bucket_size=8, chain_width=2)
    res = dedup_pipeline(rd.from_items(rows), cfg)
    clusters = _cluster_sets(res)
    big = max(clusters, key=len)
    assert big == frozenset(range(24)), big
    # oversized flag surfaced for observability
    assert any(r["oversized"] for r in res.verified_pairs.take_all())


def test_cluster_output_partitioning_invariant(ray_session):
    """Same input, different physical layout (block counts, batch sizes)
    → byte-identical cluster assignment."""
    import ray.data as rd

    from doppel_speller_ray.pipelines.dedup import dedup_pipeline
    from doppel_speller_ray.sources.fixtures import make_pages

    pages, _ = make_pages(n_clusters=12, n_singletons=40, seed=9)

    out = []
    for blocks, bs in ((1, 1024), (7, 64)):
        ds = rd.from_arrow(pages).repartition(blocks)
        cfg = DedupConfig(max_chars=None, batch_size=bs)
        res = dedup_pipeline(ds, cfg, id_col="url", text_col="text")
        rows = sorted((r["doc_id"], r["cluster_id"])
                      for r in res.clusters.take_all())
        out.append(rows)
    assert out[0] == out[1]


def test_join_attach_path_matches_broadcast(ray_session):
    """Force the hash-join payload-attach path (broadcast_payload_max_bytes=0)
    and check it produces the same clusters as the broadcast path."""
    import ray.data as rd

    from doppel_speller_ray.pipelines.dedup import dedup_pipeline
    from doppel_speller_ray.sources.fixtures import make_pages

    pages, _ = make_pages(n_clusters=10, n_singletons=30, seed=13)
    base = DedupConfig(max_chars=None)
    forced_join = DedupConfig(max_chars=None, broadcast_payload_max_bytes=0)

    r1 = dedup_pipeline(rd.from_arrow(pages), base, id_col="url", text_col="text")
    c1 = sorted((r["doc_id"], r["cluster_id"]) for r in r1.clusters.take_all())
    r2 = dedup_pipeline(rd.from_arrow(pages), forced_join, id_col="url", text_col="text")
    c2 = sorted((r["doc_id"], r["cluster_id"]) for r in r2.clusters.take_all())
    assert c1 == c2


def test_payload_build_never_runs_on_driver(ray_session):
    """The broadcast-verify payload pack must run as a Ray task in a worker
    process — the driver/head node never holds the corpus payload
    (VERDICT r1 items 5/6). The in-process counter only moves in whichever
    process executes _build_payload_arrays; asserting it stays 0 here
    proves the driver did not."""
    import ray.data as rd

    from doppel_speller_ray.pipelines.dedup import dedup_pipeline
    from doppel_speller_ray.sources.fixtures import make_pages
    from doppel_speller_ray.stages import verify as verify_mod

    before = verify_mod._PAYLOAD_BUILDS_IN_PROCESS
    pages, _ = make_pages(n_clusters=6, n_singletons=15, seed=31)
    res = dedup_pipeline(rd.from_arrow(pages), DedupConfig(max_chars=None),
                         id_col="url", text_col="text")
    assert res.verified_pairs.count() > 0          # broadcast path exercised
    assert verify_mod._PAYLOAD_BUILDS_IN_PROCESS == before


def test_distributed_cc_path_matches_driver_cc(ray_session):
    import ray.data as rd

    from doppel_speller_ray.pipelines.dedup import dedup_pipeline
    from doppel_speller_ray.sources.fixtures import make_pages

    pages, _ = make_pages(n_clusters=6, n_singletons=15, seed=23)
    cfg = DedupConfig(max_chars=None)
    r1 = dedup_pipeline(rd.from_arrow(pages), cfg, id_col="url", text_col="text")
    c1 = sorted((r["doc_id"], r["cluster_id"]) for r in r1.clusters.take_all())
    r2 = dedup_pipeline(rd.from_arrow(pages), cfg, id_col="url", text_col="text",
                        use_distributed_cc=True)
    c2 = sorted((r["doc_id"], r["cluster_id"]) for r in r2.clusters.take_all())
    assert c1 == c2


def test_hash_sample_stable_under_repartitioning(ray_session):
    """O4: sample membership depends only on (id, seed) — identical result
    sets regardless of block layout, and within ±3pp of the fraction."""
    import numpy as np
    import ray.data as rd

    from doppel_speller_ray.functions.hashing import hash_sample_mask

    ids = np.arange(20_000, dtype=np.int64)
    mask = hash_sample_mask(ids, 0.25, seed=7)
    assert abs(mask.mean() - 0.25) < 0.03

    def fn(t: pa.Table) -> pa.Table:
        keep = hash_sample_mask(t["id"].to_numpy(zero_copy_only=False), 0.25, seed=7)
        return t.filter(pa.array(keep))

    tbl = pa.table({"id": ids})
    a = rd.from_arrow(tbl).repartition(3).map_batches(fn, batch_format="pyarrow")
    b = rd.from_arrow(tbl).repartition(17).map_batches(
        fn, batch_format="pyarrow", batch_size=256)
    sa = sorted(r["id"] for r in a.take_all())
    sb = sorted(r["id"] for r in b.take_all())
    assert sa == sb
    assert sa == sorted(ids[mask].tolist())


def test_semdedup_skew_cap(monkeypatch):
    """A pathological k-means cluster (far above _SEM_MAX_CLUSTER) must be
    recursively split before the quadratic prune: no leaf exceeds the cap,
    and planted exact duplicates are still removed (identical vectors
    co-locate through the deterministic 2-means split)."""
    import numpy as np

    from doppel_speller_ray.pipelines import queries_quality as qq

    rng = np.random.default_rng(11)
    n_base, d, cap = 400, 16, 50
    base = rng.normal(size=(n_base, d))
    base /= np.linalg.norm(base, axis=1)[:, None]
    # doubled corpus: copy of vector i gets id i + n_base (always later)
    vecs = np.concatenate([base, base])
    ids = np.arange(2 * n_base)

    leaf_sizes = []
    orig = qq._split_leaves
    top_level = [True]

    def spy(mat, idx, cap_):
        is_top = top_level[0]
        top_level[0] = False
        leaves = orig(mat, idx, cap_)
        if is_top:  # record only the top-level result
            leaf_sizes.extend(len(leaf) for leaf in leaves)
        return leaves

    monkeypatch.setattr(qq, "_SEM_MAX_CLUSTER", cap)
    monkeypatch.setattr(qq, "_split_leaves", spy)

    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "cluster_id": pa.array(np.zeros(len(ids), np.int64), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs.astype(np.float32)],
                              pa.list_(pa.float32())),
    })
    out = qq._semdedup_prune(t)
    keep = dict(zip(out["vec_id"].to_pylist(), out["keep"].to_pylist()))

    assert leaf_sizes and max(leaf_sizes) <= cap
    # every planted copy removed, every base kept
    assert all(not keep[i + n_base] for i in range(n_base))
    assert all(keep[i] for i in range(n_base))


def test_semdedup_cap_matches_uncapped_on_separated_concepts(monkeypatch):
    """When near-dup pairs are genuinely close (exact copies) and distinct
    concepts are well separated, the capped prune returns the SAME keep set
    as the uncapped one — the split only partitions across-concept
    comparisons that were below tau anyway."""
    import numpy as np

    from doppel_speller_ray.pipelines import queries_quality as qq

    rng = np.random.default_rng(5)
    n_base, d = 120, 32
    base = rng.normal(size=(n_base, d))
    base /= np.linalg.norm(base, axis=1)[:, None]
    vecs = np.concatenate([base, base])
    ids = np.arange(2 * n_base)
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "cluster_id": pa.array(np.zeros(len(ids), np.int64), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs.astype(np.float32)],
                              pa.list_(pa.float32())),
    })

    ref = qq._semdedup_prune(t)
    ref_keep = dict(zip(ref["vec_id"].to_pylist(), ref["keep"].to_pylist()))

    monkeypatch.setattr(qq, "_SEM_MAX_CLUSTER", 40)
    capped = qq._semdedup_prune(t)
    cap_keep = dict(zip(capped["vec_id"].to_pylist(),
                        capped["keep"].to_pylist()))
    assert cap_keep == ref_keep


def test_semdedup_skew_cap_scaled_copies(monkeypatch):
    """Round-5 review finding: the split must run on the NORMALIZED rows —
    a scaled copy (cosine exactly 1, different magnitude) must still be
    removed in an over-cap cluster."""
    import numpy as np

    from doppel_speller_ray.pipelines import queries_quality as qq

    rng = np.random.default_rng(23)
    n_base, d, cap = 120, 16, 60
    base = rng.normal(size=(n_base, d))
    base /= np.linalg.norm(base, axis=1)[:, None]
    vecs = np.concatenate([base, base * 5.0])     # copies scaled, cos = 1
    ids = np.arange(2 * n_base)
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "cluster_id": pa.array(np.zeros(len(ids), np.int64), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs.astype(np.float32)],
                              pa.list_(pa.float32())),
    })
    monkeypatch.setattr(qq, "_SEM_MAX_CLUSTER", cap)
    out = qq._semdedup_prune(t)
    keep = dict(zip(out["vec_id"].to_pylist(), out["keep"].to_pylist()))
    assert all(not keep[i + n_base] for i in range(n_base))
    assert all(keep[i] for i in range(n_base))


def test_semdedup_skew_cap_mass_identical(monkeypatch):
    """Round-5 review finding: an exact-duplicate group LARGER than the
    cap must keep exactly one survivor (closed-form collapse), not one
    per halving leaf — and all-zero vectors are never removed (cosine 0),
    capped or not."""
    import numpy as np

    from doppel_speller_ray.pipelines import queries_quality as qq

    n, cap = 200, 50
    v = np.full(8, 0.5)
    vecs = np.concatenate([np.tile(v, (n, 1)), np.zeros((4, 8))])
    ids = np.arange(n + 4)
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "cluster_id": pa.array(np.zeros(len(ids), np.int64), pa.int64()),
        "embedding": pa.array([x.tolist() for x in vecs.astype(np.float32)],
                              pa.list_(pa.float32())),
    })
    monkeypatch.setattr(qq, "_SEM_MAX_CLUSTER", cap)
    out = qq._semdedup_prune(t)
    keep = dict(zip(out["vec_id"].to_pylist(), out["keep"].to_pylist()))
    assert keep[0] is True
    assert all(not keep[i] for i in range(1, n))          # one survivor
    assert all(keep[n + j] for j in range(4))             # zero vectors kept
