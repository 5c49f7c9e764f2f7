"""Trainable pair-match verifier — the reference's tier-3 model (T4) with
the XGBoost dependency removed.

The reference trains an XGBoost classifier over the 66-dim pair features
with a custom weighted log-loss (``/root/reference/doppelspeller/train.py:
32-39``): grad = p(β+y−βy)−y, hess = p(1−p)(β+y−βy), β = 5 — false
positives cost 5×. No xgboost exists in this environment, so the verifier
is a numpy logistic regression trained with the SAME weighted-loss gradient
(for logistic regression the per-sample gradient on the logit is exactly the
reference's ``grad``), behind the same pluggable interface: any object with
``predict_proba(X) -> p`` can be swapped in.

Model artifact: pickle (reference train.py:134-135 / predict.py:79-82);
loaded once per actor in ``__init__`` (S7 → actor-pool pattern).
"""

from __future__ import annotations

import pickle

import numpy as np
import pyarrow as pa


class LogisticPairModel:
    """Standardized logistic regression with β-weighted log-loss."""

    def __init__(self, beta: float = 5.0, lr: float = 1.0, epochs: int = 2000,
                 seed: int = 42):
        self.beta = beta
        self.lr = lr
        self.epochs = epochs
        self.seed = seed
        self.w: np.ndarray | None = None
        self.b = 0.0
        self.mu: np.ndarray | None = None
        self.sigma: np.ndarray | None = None

    @staticmethod
    def _impute(X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64).copy()
        X[np.isnan(X)] = -1.0  # xgboost handles NaN natively; logistic can't
        return X

    def fit(self, X: np.ndarray, y: np.ndarray) -> "LogisticPairModel":
        X = self._impute(X)
        y = np.asarray(y, dtype=np.float64)
        self.mu = X.mean(axis=0)
        self.sigma = X.std(axis=0)
        self.sigma[self.sigma == 0] = 1.0
        Xs = (X - self.mu) / self.sigma
        rng = np.random.default_rng(self.seed)
        n, d = Xs.shape
        self.w = rng.normal(0, 0.01, d)
        self.b = 0.0
        beta = self.beta
        for _ in range(self.epochs):
            p = 1.0 / (1.0 + np.exp(-(Xs @ self.w + self.b)))
            # reference custom objective (train.py:36-38):
            # grad = p*(beta + y - beta*y) - y
            grad_logit = p * (beta + y - beta * y) - y
            self.w -= self.lr * (Xs.T @ grad_logit) / n
            self.b -= self.lr * grad_logit.mean()
        return self

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        X = self._impute(X)
        Xs = (X - self.mu) / self.sigma
        return 1.0 / (1.0 + np.exp(-(Xs @ self.w + self.b)))

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump(self, f)

    @staticmethod
    def load(path: str) -> "LogisticPairModel":
        with open(path, "rb") as f:
            return pickle.load(f)


def error_matrix(y_true: np.ndarray, p: np.ndarray, threshold: float = 0.9,
                 fp_penalty: int = 5) -> dict:
    """Confusion counts + custom error FN + 5×FP (train.py:63-82,
    settings.py:75-77)."""
    pred = p > threshold
    y = y_true.astype(bool)
    tp = int((pred & y).sum())
    tn = int((~pred & ~y).sum())
    fp = int((pred & ~y).sum())
    fn = int((~pred & y).sum())
    return {"tp": tp, "tn": tn, "fp": fp, "fn": fn,
            "custom_error": fn + fp_penalty * fp}


class PairScorerActor:
    """map_batches actor: scores candidate pairs with a trained model.

    Expects batches with ``title`` / ``truth_title`` normalized-text columns
    plus broadcast refs for the truth word counter. The model and counter
    are fetched ONCE per actor (state in __init__, work in __call__).
    """

    def __init__(self, model_ref, counter_ref, n_truth_titles: int):
        import ray

        self.model = ray.get(model_ref)
        self.counter = ray.get(counter_ref)
        self.n_truth = n_truth_titles

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.features import featurize_pairs, truth_word_counts

        titles = batch["title"].to_pylist()
        truths = batch["truth_title"].to_pylist()
        counts = np.stack([truth_word_counts(t, self.counter) for t in truths])
        X = featurize_pairs(titles, truths, counts, self.n_truth)
        p = self.model.predict_proba(X)
        return batch.append_column("prediction", pa.array(p.astype(np.float32),
                                                          pa.float32()))
