"""BoostedPairModel (numpy histogram GBDT, reference objective) + the
vectorized batch-Jaccard kernel + hash-id collision detection."""

import numpy as np
import pytest


def test_boosted_model_learns_interactions():
    """The logistic stand-in can't represent x0*x1 sign structure; the tree
    model must (this is WHY the tier-3 verifier is boosted, train.py:99-112)."""
    from doppel_speller_ray.stages.pair_model import (
        BoostedPairModel, LogisticPairModel, error_matrix)

    rng = np.random.default_rng(0)
    n, d = 20_000, 8
    X = rng.normal(0, 1, (n, d))
    # strong interaction + weak marginal (pure XOR has zero first-split gain
    # for ANY greedy tree learner — not what tier-3 pair features look like)
    y = ((2.0 * X[:, 0] * X[:, 1] + 0.5 * X[:, 2]) > 0).astype(float)
    tr, ev = slice(0, 16_000), slice(16_000, None)
    m = BoostedPairModel(n_rounds=80, subsample=1.0, early_stopping_rounds=20,
                         beta=1.0)
    m.fit(X[tr], y[tr], eval_set=(X[ev], y[ev]))
    acc_boost = (((m.predict_proba(X[ev]) > 0.5) == y[ev].astype(bool)).mean())
    lo = LogisticPairModel(epochs=300, beta=1.0).fit(X[tr], y[tr])
    acc_logit = (((lo.predict_proba(X[ev]) > 0.5) == y[ev].astype(bool)).mean())
    assert acc_boost > 0.85, acc_boost
    assert acc_boost > acc_logit + 0.15, (acc_boost, acc_logit)


def test_boosted_model_nan_and_roundtrip(tmp_path):
    from doppel_speller_ray.stages.pair_model import BoostedPairModel

    rng = np.random.default_rng(1)
    X = rng.normal(0, 1, (5_000, 5))
    X[rng.random(X.shape) < 0.2] = np.nan
    y = (np.nan_to_num(X[:, 0]) > 0).astype(float)
    m = BoostedPairModel(n_rounds=30, subsample=1.0, beta=1.0).fit(X, y)
    p = m.predict_proba(X)
    assert np.isfinite(p).all() and (p >= 0).all() and (p <= 1).all()
    path = str(tmp_path / "m.pickle")
    m.save(path)
    m2 = BoostedPairModel.load(path)
    assert np.allclose(m2.predict_proba(X), p)


def test_boosted_weighted_objective_penalizes_fp():
    """β=5 (reference train.py:36-38) must push the operating point toward
    fewer false positives than β=1 at the same threshold."""
    from doppel_speller_ray.stages.pair_model import BoostedPairModel

    rng = np.random.default_rng(2)
    n = 30_000
    X = rng.normal(0, 1, (n, 4))
    # noisy labels → FP/FN tradeoff exists
    y = ((X[:, 0] + rng.normal(0, 1.2, n)) > 0).astype(float)
    fp = {}
    for beta in (1.0, 5.0):
        m = BoostedPairModel(n_rounds=40, subsample=1.0, beta=beta).fit(X, y)
        pred = m.predict_proba(X) > 0.5
        fp[beta] = int((pred & ~y.astype(bool)).sum())
    assert fp[5.0] < fp[1.0], fp


def test_batch_jaccard_flat_matches_per_pair():
    from doppel_speller_ray.stages.verify import batch_jaccard_flat

    rng = np.random.default_rng(3)
    sets = [np.unique(rng.integers(0, 40, rng.integers(0, 25)).astype(np.uint64))
            for _ in range(50)]
    sets[7] = np.empty(0, np.uint64)          # empty-set edges
    sets[9] = np.empty(0, np.uint64)
    flat = np.concatenate(sets) if sets else np.empty(0, np.uint64)
    off = np.concatenate([[0], np.cumsum([len(s) for s in sets])]).astype(np.int64)
    lp = rng.integers(0, 50, 200).astype(np.int64)
    rp = rng.integers(0, 50, 200).astype(np.int64)
    got = batch_jaccard_flat(flat, off, lp, rp)
    for i in range(200):
        a, b = sets[lp[i]], sets[rp[i]]
        inter = len(np.intersect1d(a, b, assume_unique=True))
        union = len(a) + len(b) - inter
        want = inter / union if union else 1.0
        assert abs(got[i] - want) < 1e-6, (i, got[i], want)


def test_check_id_collisions(ray_session):
    import ray.data as rd

    from doppel_speller_ray.stages.prepare import check_id_collisions

    urls = [{"url": f"https://example.org/page/{i}"} for i in range(500)]
    assert check_id_collisions(rd.from_items(urls)) == 0


def test_ensemble_mean_and_roundtrip(tmp_path):
    """EnsemblePairModel: probability = member mean, feature-family
    detection reads member 0's bins, pickle round-trips, and mixed
    feature dims are rejected."""
    from doppel_speller_ray.stages.pair_model import (
        BoostedPairModel, EnsemblePairModel, model_n_features)

    rng = np.random.default_rng(3)
    X = rng.normal(0, 1, (4000, 6))
    y = (X[:, 0] + 0.5 * X[:, 1] > 0).astype(float)
    a = BoostedPairModel(n_rounds=15, subsample=1.0, beta=1.0, seed=1).fit(X, y)
    b = BoostedPairModel(n_rounds=15, subsample=1.0, beta=1.0, seed=2).fit(X, y)
    ens = EnsemblePairModel([a, b])
    Xq = rng.normal(0, 1, (200, 6))
    np.testing.assert_allclose(
        ens.predict_proba(Xq),
        (a.predict_proba(Xq) + b.predict_proba(Xq)) / 2, rtol=1e-12)
    assert model_n_features(ens) == 6
    p = tmp_path / "ens.pickle"
    ens.save(str(p))
    back = EnsemblePairModel.load(str(p))
    np.testing.assert_allclose(back.predict_proba(Xq), ens.predict_proba(Xq))
    c = BoostedPairModel(n_rounds=5, subsample=1.0, beta=1.0).fit(X[:, :4], y)
    with pytest.raises(ValueError):
        EnsemblePairModel([a, c])
