"""Training-mode pipeline: synthetic pair generation → features → weighted
logistic verifier (the reference's ``train-model`` flow, SURVEY.md §3.2,
with xgboost replaced by the numpy model in stages/pair_model.py).

Reference lineage:
* misspelled positives from truth titles with len(norm) > 9
  (feature_engineering.py:207-225, filter :213-215 = N7);
* per-train-row top-k Jaccard candidates downsampled to
  ``top_k_train`` = 10 with the true positive force-included
  (feature_engineering_prepare.py:25-57, O3);
* seeded eval split by the reference fractions 0.05/0.1/0.05
  (feature_engineering.py:276-296, settings.py:47-49 — reference is
  UNSEEDED; we seed everything, SURVEY §4 determinism);
* custom weighted objective β=5 (train.py:32-39, F8) and error matrix /
  custom error (train.py:63-82, A8/A9).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import MatchConfig
from ..functions.features import featurize_pairs, truth_word_counts
from ..functions.misspell import misspell
from ..stages.pair_model import LogisticPairModel, error_matrix
from .matching import collect_truth_table


def build_word_counter(truth_table: pa.Table) -> dict[str, int]:
    """Truth word document-frequency counter (A1, common.py:140-142):
    each word counted once per title."""
    from collections import Counter

    counter: Counter = Counter()
    for norm in truth_table["norm_text"].to_pylist():
        counter.update(set(norm.split()))
    return dict(counter)


def generate_training_pairs(truth_table: pa.Table, cfg: MatchConfig,
                            n_candidates_per_title: int | None = None,
                            min_title_len: int = 9) -> pa.Table:
    """(title, truth_title, label) pair table:

    * positives: seeded misspellings of each long-enough truth title (N6/N7);
    * negatives: top-k Jaccard candidates of the misspelled query that are
      NOT the source title (O3 downsampling, true pair force-included).
    """
    from ..functions.normalize import transform_text
    from ..functions.shingles import shingle_array
    from ..stages.matcher import TruthIndex

    index = TruthIndex(truth_table)
    norms = truth_table["norm_text"].to_pylist()
    k = n_candidates_per_title or cfg.top_k_train

    titles, truths, labels = [], [], []
    for i, norm in enumerate(norms):
        if len(norm) <= min_title_len:      # N7 (feature_engineering.py:213-215)
            continue
        query = transform_text(misspell(norm, cfg.seed * 1_000_003 + i),
                               max_chars=cfg.max_chars, n_grams=cfg.n_grams)
        qcodes = np.asarray(shingle_array([query], cfg.n_grams)[0].values,
                            dtype=np.uint64)
        cand = index.topk(qcodes, k)
        got_true = False
        for t in cand:
            titles.append(query)
            truths.append(norms[t])
            is_true = int(t == i)
            got_true = got_true or bool(is_true)
            labels.append(is_true)
        if not got_true:                    # force-include the true pair
            titles.append(query)            # (feature_engineering_prepare.py:51-55)
            truths.append(norm)
            labels.append(1)
    return pa.table({"title": pa.array(titles), "truth_title": pa.array(truths),
                     "label": pa.array(labels, pa.int64())})


def train_verifier(truth_ds, cfg: MatchConfig = MatchConfig(), *,
                   eval_fraction: float = 0.2, model_path: str | None = None,
                   model_params: dict | None = None):
    """End-to-end training: returns (model, metrics dict). ``model_params``
    override BoostedPairModel constructor defaults (e.g. n_rounds)."""
    truth_table = collect_truth_table(truth_ds, cfg)
    counter = build_word_counter(truth_table)
    n_truth = truth_table.num_rows

    pairs = generate_training_pairs(truth_table, cfg)
    titles = pairs["title"].to_pylist()
    truths = pairs["truth_title"].to_pylist()
    y = pairs["label"].to_numpy(zero_copy_only=False).astype(np.float64)
    counts = np.stack([truth_word_counts(t, counter) for t in truths])
    X = featurize_pairs(titles, truths, counts, n_truth)

    rng = np.random.default_rng(cfg.seed)
    is_eval = rng.random(len(y)) < eval_fraction
    from ..stages.pair_model import BoostedPairModel

    model = BoostedPairModel(beta=cfg.false_positive_penalty, seed=cfg.seed,
                             **(model_params or {}))
    model.fit(X[~is_eval], y[~is_eval], eval_set=(X[is_eval], y[is_eval]))

    p_train = model.predict_proba(X[~is_eval])
    p_eval = model.predict_proba(X[is_eval])
    n_pos = float(y.sum())
    metrics = {
        "n_pairs": int(len(y)),
        "n_eval": int(is_eval.sum()),
        # A7 class balance (reference scale_pos_weight, train.py:94)
        "scale_pos_weight": round(float((len(y) - n_pos) / max(n_pos, 1)), 4),
        "train": error_matrix(y[~is_eval], p_train, cfg.prediction_threshold,
                              cfg.false_positive_penalty),
        "eval": error_matrix(y[is_eval], p_eval, cfg.prediction_threshold,
                             cfg.false_positive_penalty),
    }
    if model_path:
        model.save(model_path)
    return model, metrics
