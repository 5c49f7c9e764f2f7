"""Training mode: featurizer semantics, weighted logistic verifier,
containment + embedding-LSH stages."""

import numpy as np
import pyarrow as pa
import pytest

from doppel_speller_ray.config import MatchConfig
from doppel_speller_ray.functions.features import (
    FEATURES_COUNT,
    encode_title,
    lev_ratio_floor,
    pair_features,
    truth_word_counts,
)
from doppel_speller_ray.stages.pair_model import LogisticPairModel, error_matrix


def test_encode_title():
    enc = encode_title("coolblue bv")
    # alphabet '- abc...': 'c' -> 4, 'o' -> 16, space -> 1 (feature_engineering.py:200-205)
    assert enc[:11].tolist() == [4, 16, 16, 13, 3, 13, 22, 6, 1, 3, 23]
    assert enc.shape == (255,)
    assert (enc[11:] == 0).all()


def test_lev_ratio_floor_vs_round():
    # 'abc' vs 'abd': dist 2 of 6 → 66.67 → floor 66 (round would give 67)
    assert lev_ratio_floor("abc", "abd") == 66
    assert lev_ratio_floor("abc", "abc") == 100
    assert lev_ratio_floor("", "") == 100


def test_pair_features_shape_and_basic():
    counter = {"acme": 3, "global": 5, "inc": 100}
    counts = truth_word_counts("acme global inc", counter)
    assert counts[:3].tolist() == [3, 5, 100]
    f = pair_features("acme global inc", "acme global inc", counts, 200)
    assert f.shape == (FEATURES_COUNT,)
    assert f[0] == 15 and f[1] == 15       # char counts
    assert f[2] == 3 and f[3] == 3         # word counts
    assert f[4] == 100                     # identical → ratio 100
    assert f[5] == 100                     # reconstructed identical
    assert f[6] == 100                     # first-word best window ratio
    # unused word slots are NaN
    assert np.isnan(f[6 + 3: 6 + 15]).all()


def test_pair_features_mismatch():
    counter = {"acme": 1, "inc": 10, "zeta": 1, "gmbh": 4}
    counts = truth_word_counts("zeta gmbh", counter)
    f = pair_features("acme holdings inc", "zeta gmbh", counts, 100)
    assert f[4] < 50


def test_logistic_model_learns_and_penalizes_fp():
    rng = np.random.default_rng(0)
    n = 2000
    X = rng.normal(0, 1, (n, 4))
    y = (X[:, 0] + 0.5 * X[:, 1] + rng.normal(0, 0.3, n) > 0).astype(float)
    m = LogisticPairModel(beta=5.0, epochs=400).fit(X, y)
    p = m.predict_proba(X)
    auc_proxy = ((p[y == 1].mean()) - (p[y == 0].mean()))
    assert auc_proxy > 0.2
    # β=5 pushes probabilities down on negatives: false positives at 0.9 rare
    em = error_matrix(y, p, threshold=0.9)
    assert em["fp"] <= 0.02 * n


def test_model_pickle_roundtrip(tmp_path):
    X = np.array([[0.0, 1.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]] * 20)
    y = np.array([0, 1, 1, 0] * 20, dtype=float)
    m = LogisticPairModel(epochs=50).fit(X, y)
    path = str(tmp_path / "model.pickle")
    m.save(path)
    m2 = LogisticPairModel.load(path)
    np.testing.assert_allclose(m.predict_proba(X), m2.predict_proba(X))


def test_train_verifier_e2e(ray_session):
    import ray.data as rd

    from doppel_speller_ray.pipelines.training import train_verifier
    from doppel_speller_ray.sources.fixtures import make_titles

    truth, _, _ = make_titles(n_truth=150, seed=11)
    model, metrics = train_verifier(rd.from_arrow(truth),
                                    MatchConfig(top_k_train=5, seed=11))
    assert metrics["n_pairs"] > 300
    em = metrics["eval"]
    total_pos = em["tp"] + em["fn"]
    assert total_pos > 0
    assert em["tp"] / total_pos > 0.5, metrics       # recovers most positives
    assert em["fp"] <= max(2, 0.05 * (em["fp"] + em["tn"])), metrics


def test_containment_pairs(ray_session):
    import ray.data as rd

    from doppel_speller_ray.stages.containment import containment_pairs

    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "through fields of golden wheat under a pale blue sky") * 3
    boiler = "cookie policy accept all rights reserved terms of service " * 4
    rows = [
        {"doc_id": 1, "norm_text": base},
        {"doc_id": 2, "norm_text": boiler + " " + base + " more trailing junk here"},
        {"doc_id": 3, "norm_text": "totally unrelated content about ray data pipelines "
                                   "and arrow batches flowing through the object store " * 3},
    ]
    out = containment_pairs(rd.from_items(rows), min_containment=0.6).take_all()
    got = {(r["left_id"], r["right_id"]) for r in out}
    assert (1, 2) in got
    assert all(3 not in p for p in got)


def test_containment_stop_fingerprint_drops_surface(ray_session):
    """Boilerplate fingerprints shared by > max_df docs are dropped — and
    the drop count must SURFACE via the DropCounter actor (no silent recall
    loss)."""
    import ray.data as rd

    from doppel_speller_ray.stages.containment import containment_pairs_with_stats

    boiler = "cookie policy accept all rights reserved terms of service gdpr "
    rows = [{"doc_id": i, "norm_text": boiler * 4 + f"unique tail {i} " * 6}
            for i in range(40)]
    pairs, stats_fn = containment_pairs_with_stats(
        rd.from_items(rows), min_containment=0.9, max_df=8)
    pairs.count()  # consume → partition tasks report
    stats = stats_fn()
    assert stats["stop_fingerprints_dropped"] > 0, stats
    assert stats["partitions_reporting"] >= 1, stats


def test_ivf_topk_exact_and_approximate(ray_session):
    """nprobe=ALL must equal brute force exactly; small nprobe must keep
    high recall at a fraction of the scored vectors."""
    import ray.data as rd

    from doppel_speller_ray.stages.embed import ann_topk, ivf_topk

    rng = np.random.default_rng(11)
    mat = rng.normal(0, 1, (400, 24)).astype(np.float32)
    rows = [{"vec_id": i, "embedding": v.tolist()} for i, v in enumerate(mat)]
    q = mat[:3].astype(np.float64)

    brute = ann_topk(rd.from_items(rows), q, k=10).take_all()
    exact = ivf_topk(rd.from_items(rows), q, k=10, n_centroids=8,
                     nprobe=None).take_all()

    def by_query(res):
        out = {}
        for r in res:
            out.setdefault(r["query_id"], []).append((round(r["sim"], 6), r["vec_id"]))
        return {k: sorted(v, reverse=True) for k, v in out.items()}

    assert by_query(brute) == by_query(exact)

    approx = ivf_topk(rd.from_items(rows), q, k=10, n_centroids=8,
                      nprobe=3).take_all()
    ba, aa = by_query(brute), by_query(approx)
    for qid in ba:
        want = {v for _, v in ba[qid]}
        got = {v for _, v in aa.get(qid, [])}
        assert len(want & got) >= 6, (qid, want, got)   # recall ≥ 0.6 at nprobe 3/8


def test_embedding_lsh_neardup(ray_session):
    import ray.data as rd

    from doppel_speller_ray.stages.embed import embedding_neardup_lsh

    rng = np.random.default_rng(5)
    base = rng.normal(0, 1, (30, 32))
    rows = []
    for i, v in enumerate(base):
        rows.append({"vec_id": 2 * i, "embedding": v.astype(np.float32).tolist()})
        # near-duplicate vector: tiny perturbation → cosine ≈ 1
        rows.append({"vec_id": 2 * i + 1,
                     "embedding": (v + rng.normal(0, 0.02, 32)).astype(np.float32).tolist()})
    pairs = embedding_neardup_lsh(rd.from_items(rows), threshold=0.95,
                                  n_planes=12, n_tables=6, seed=3).take_all()
    got = {(r["left_id"], r["right_id"]) for r in pairs}
    planted = {(2 * i, 2 * i + 1) for i in range(30)}
    recall = len(got & planted) / len(planted)
    assert recall >= 0.9, (recall, len(got))


def test_ann_topk_stage(ray_session):
    import ray.data as rd

    from doppel_speller_ray.stages.embed import ann_topk

    rng = np.random.default_rng(9)
    mat = rng.normal(0, 1, (100, 16)).astype(np.float32)
    rows = [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(100)]
    q = mat[7] + rng.normal(0, 0.01, 16).astype(np.float32)
    out = ann_topk(rd.from_items(rows), q[None, :], k=5).take_all()
    assert len(out) == 5
    best = max(out, key=lambda r: r["sim"])
    assert best["vec_id"] == 7


def test_substring_certification(ray_session):
    """Exact-substring tier: certifies true containment (prefix, embedded
    middle) and rejects a high-overlap NON-substring (one word changed)."""
    import ray.data as rd

    from doppel_speller_ray.stages.containment import substring_containment_pairs

    words = [f"w{i:04d}x" for i in range(60)]
    base = " ".join(words)
    rows = [
        {"doc_id": 1, "norm_text": base},
        {"doc_id": 2, "norm_text": " ".join(words[:25])},           # prefix
        {"doc_id": 3, "norm_text": " ".join(words[10:50])},  # embedded middle slice
        {"doc_id": 4, "norm_text": " ".join(
            w if i != 30 else "zzzzz" for i, w in enumerate(words))},  # negative
    ]
    out = substring_containment_pairs(rd.from_items(rows)).take_all()
    by_pair = {(r["left_id"], r["right_id"]): r for r in out}
    assert by_pair[(1, 2)]["is_substring"] and by_pair[(1, 2)]["contained_id"] == 2
    assert by_pair[(1, 3)]["is_substring"] and by_pair[(1, 3)]["contained_id"] == 3
    assert (1, 4) in by_pair, "high-overlap candidate must be generated"
    assert not by_pair[(1, 4)]["is_substring"]
    assert by_pair[(1, 4)]["contained_id"] == -1


def test_substring_certification_join_path(ray_session):
    """broadcast_max_bytes=0 forces the chained-hash-join attach (the
    >threshold scale path); result must match the default broadcast path."""
    import ray.data as rd

    from doppel_speller_ray.stages.containment import substring_containment_pairs

    words = [f"w{i:04d}x" for i in range(60)]
    base = " ".join(words)
    rows = [
        {"doc_id": 1, "norm_text": base},
        {"doc_id": 2, "norm_text": " ".join(words[:25])},
        {"doc_id": 4, "norm_text": " ".join(
            w if i != 30 else "zzzzz" for i, w in enumerate(words))},
    ]
    out = substring_containment_pairs(
        rd.from_items(rows), broadcast_max_bytes=0).take_all()
    by_pair = {(r["left_id"], r["right_id"]): r for r in out}
    assert by_pair[(1, 2)]["is_substring"] and by_pair[(1, 2)]["contained_id"] == 2
    assert (1, 4) in by_pair and not by_pair[(1, 4)]["is_substring"]


def test_substring_certification_rejects_negatives(ray_session):
    """The planted-corpus oracle's negatives (+2M variants with 9-word
    shared runs) must appear as candidates and fail certification."""
    from doppel_speller_ray.pipelines.queries import _substring_corpus
    from doppel_speller_ray.stages.containment import substring_containment_pairs

    corpus = _substring_corpus("/root/testdata/sf0.001")
    out = substring_containment_pairs(corpus).take_all()
    neg = [r for r in out
           if (r["left_id"] < 1_000_000 and r["right_id"] >= 2_000_000)
           or (1_000_000 <= r["left_id"] < 2_000_000 and r["right_id"] >= 2_000_000)]
    assert neg, "planted non-substring candidates were never generated"
    assert all(not r["is_substring"] for r in neg)
    pos = [r for r in out if r["is_substring"]]
    assert {(r["left_id"], r["right_id"]) for r in pos} == \
        {(r["left_id"], r["left_id"] + 1_000_000) for r in pos}
