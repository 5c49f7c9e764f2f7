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


class BoostedPairModel:
    """Histogram gradient-boosted trees with the reference's β-weighted
    log-loss — a pure-numpy stand-in for the XGBoost 0.90 verifier (absent
    from this environment), mirroring its hyperparameters
    (``/root/reference/doppelspeller/train.py:99-112``): max_depth 5,
    eta 0.1, min_child_weight 1, early stopping on the eval custom error.

    Implementation: complete binary trees built level-wise; per
    (node, feature, bin) gradient/hessian histograms via a single combined
    ``np.bincount`` key per level; splits maximize the second-order gain
    G²/(H+λ). Features are quantile-binned once; NaN maps to a dedicated
    bin 0 (routes left), matching xgboost's missing-value handling in
    spirit.
    """

    def __init__(self, beta: float = 5.0, eta: float = 0.1, max_depth: int = 5,
                 n_rounds: int = 600, reg_lambda: float = 1.0,
                 min_child_hess: float = 5.0, n_bins: int = 63,
                 subsample: float = 0.7, early_stopping_rounds: int = 40,
                 seed: int = 42):
        # min_child_hess 5.0 (vs xgboost's min_child_weight 1): with the
        # β-weighted hessian, tiny-leaf splits on small pair sets produced
        # overconfident false positives (measured: 5 FPs on a 200-title
        # fixture at 1.0 → 0 at 5.0, large-corpus custom error unchanged)
        self.beta = beta
        self.eta = eta
        self.max_depth = max_depth
        self.n_rounds = n_rounds
        self.reg_lambda = reg_lambda
        self.min_child_hess = min_child_hess
        self.n_bins = n_bins
        self.subsample = subsample
        self.early_stopping_rounds = early_stopping_rounds
        self.seed = seed
        self.edges: list[np.ndarray] | None = None
        self.trees: list[tuple] = []          # (feats, thrs, leaf) per round
        self.best_iteration: int | None = None

    # --- binning ---------------------------------------------------------
    def _fit_bins(self, X: np.ndarray) -> None:
        self.edges = []
        qs = np.linspace(0, 1, self.n_bins + 1)[1:-1]
        for f in range(X.shape[1]):
            col = X[:, f]
            col = col[~np.isnan(col)]
            self.edges.append(np.unique(np.quantile(col, qs)) if len(col)
                              else np.empty(0))

    def _bin(self, X: np.ndarray) -> np.ndarray:
        n, d = X.shape
        B = np.zeros((n, d), dtype=np.int32)
        for f in range(d):
            col = X[:, f]
            ok = ~np.isnan(col)
            B[ok, f] = np.searchsorted(self.edges[f], col[ok], side="left") + 1
        return B

    # --- tree building ---------------------------------------------------
    def _build_tree(self, B: np.ndarray, grad: np.ndarray, hess: np.ndarray):
        n, d = B.shape
        lam = self.reg_lambda
        stride = self.n_bins + 2
        node = np.zeros(n, np.int64)
        feat_off = (np.arange(d, dtype=np.int64) * stride)[None, :]
        feats, thrs = [], []
        rows = np.arange(n)
        for depth in range(self.max_depth):
            n_nodes = 1 << depth
            Gtot = np.bincount(node, weights=grad, minlength=n_nodes)
            Htot = np.bincount(node, weights=hess, minlength=n_nodes)
            parent = Gtot ** 2 / (Htot + lam)
            # one histogram pass over all (feature, node, bin) cells
            key = ((node * (d * stride))[:, None] + (B + feat_off)).ravel()
            wg = np.repeat(grad, d)
            wh = np.repeat(hess, d)
            Gh = np.bincount(key, weights=wg, minlength=n_nodes * d * stride)
            Hh = np.bincount(key, weights=wh, minlength=n_nodes * d * stride)
            GL = np.cumsum(Gh.reshape(n_nodes, d, stride), axis=2)[:, :, :-1]
            HL = np.cumsum(Hh.reshape(n_nodes, d, stride), axis=2)[:, :, :-1]
            GR = Gtot[:, None, None] - GL
            HR = Htot[:, None, None] - HL
            ok = (HL >= self.min_child_hess) & (HR >= self.min_child_hess)
            gain = np.where(
                ok, GL ** 2 / (HL + lam) + GR ** 2 / (HR + lam)
                - parent[:, None, None], -np.inf)
            flat = gain.reshape(n_nodes, -1)
            arg = np.argmax(flat, axis=1)
            best_gain = flat[np.arange(n_nodes), arg]
            best_f = (arg // (stride - 1)).astype(np.int64)
            best_b = (arg % (stride - 1)).astype(np.int64)
            dead = ~(best_gain > 1e-12)
            best_f[dead] = -1
            best_b[dead] = stride          # sentinel: route everything left
            feats.append(best_f)
            thrs.append(best_b)
            bf = best_f[node]
            bv = B[rows, np.maximum(bf, 0)]
            node = node * 2 + ((bf >= 0) & (bv > best_b[node]))
        n_leaves = 1 << self.max_depth
        Gleaf = np.bincount(node, weights=grad, minlength=n_leaves)
        Hleaf = np.bincount(node, weights=hess, minlength=n_leaves)
        leaf = -Gleaf / (Hleaf + lam)
        return (feats, thrs, leaf), node

    @staticmethod
    def _tree_leaf(tree, B: np.ndarray) -> np.ndarray:
        feats, thrs, leaf = tree
        n = B.shape[0]
        node = np.zeros(n, np.int64)
        rows = np.arange(n)
        for best_f, best_b in zip(feats, thrs):
            bf = best_f[node]
            bv = B[rows, np.maximum(bf, 0)]
            node = node * 2 + ((bf >= 0) & (bv > best_b[node]))
        return leaf[node]

    # --- boosting --------------------------------------------------------
    def fit(self, X: np.ndarray, y: np.ndarray,
            eval_set: tuple | None = None) -> "BoostedPairModel":
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        self._fit_bins(X)
        B = self._bin(X)
        f = np.zeros(len(y))
        beta = self.beta
        rng = np.random.default_rng(self.seed)
        if eval_set is not None:
            Xe, ye = eval_set
            Be = self._bin(np.asarray(Xe, dtype=np.float64))
            fe = np.zeros(len(ye))
            best_err, best_iter, since = np.inf, 0, 0
        self.trees = []
        for r in range(self.n_rounds):
            p = 1.0 / (1.0 + np.exp(-f))
            w = beta + y - beta * y            # FP cost ×β (train.py:36-38)
            grad = p * w - y
            hess = p * (1.0 - p) * w
            if self.subsample < 1.0:
                m = rng.random(len(y)) < self.subsample
                tree, _ = self._build_tree(B[m], grad[m], hess[m])
                upd = self._tree_leaf(tree, B)
            else:
                tree, node = self._build_tree(B, grad, hess)
                upd = tree[2][node]
            self.trees.append(tree)
            f += self.eta * upd
            if eval_set is not None:
                fe += self.eta * self._tree_leaf(tree, Be)
                pe = 1.0 / (1.0 + np.exp(-fe))
                em = error_matrix(ye, pe, 0.9, int(beta))
                if em["custom_error"] < best_err:
                    best_err, best_iter, since = em["custom_error"], r, 0
                else:
                    since += 1
                    if since >= self.early_stopping_rounds:
                        break
        if eval_set is not None:
            self.best_iteration = best_iter
            self.trees = self.trees[: best_iter + 1]
        return self

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        B = self._bin(np.asarray(X, dtype=np.float64))
        f = np.zeros(B.shape[0])
        for tree in self.trees:
            f += self.eta * self._tree_leaf(tree, B)
        return 1.0 / (1.0 + np.exp(-f))

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump(self, f)

    @staticmethod
    def load(path: str) -> "BoostedPairModel":
        with open(path, "rb") as f:
            return pickle.load(f)


class EnsemblePairModel:
    """Bagged verifier: mean probability over independently trained
    members. The members differ by MatchConfig.seed, which drives the
    misspelling draws in pair generation — so bagging averages over
    training-DISTRIBUTION variance, the suspected gap behind low-p true
    matches in the golden sweep (BASELINE round-3 dominance analysis),
    not just over subsample noise. Duck-type-compatible with
    BoostedPairModel everywhere the matcher touches a model
    (predict_proba, edges for model_n_features, save/load pickle)."""

    def __init__(self, members: list):
        if not members:
            raise ValueError("ensemble needs at least one member")
        n_feats = {len(m.edges) for m in members}
        if len(n_feats) != 1:
            raise ValueError(f"members expect different feature dims: {n_feats}")
        self.members = members

    @property
    def edges(self):
        return self.members[0].edges

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        p = self.members[0].predict_proba(X)
        for m in self.members[1:]:
            p = p + m.predict_proba(X)
        return p / len(self.members)

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump(self, f)

    @staticmethod
    def load(path: str) -> "EnsemblePairModel":
        with open(path, "rb") as f:
            return pickle.load(f)


def model_n_features(model) -> int | None:
    """Feature count a trained verifier expects — how callers decide
    whether to append the extended (IDF-Jaccard + rank) features. Reads the
    fitted state (bin edges / standardization vector), so it works on any
    pickled artifact regardless of when it was trained."""
    edges = getattr(model, "edges", None)
    if edges is not None:
        return len(edges)
    mu = getattr(model, "mu", None)
    if mu is not None:
        return len(mu)
    return None


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
