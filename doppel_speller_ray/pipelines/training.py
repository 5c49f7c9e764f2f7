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
                            min_title_len: int = 9,
                            nf_fraction: float = 0.2) -> pa.Table:
    """(title, truth_title, label, jaccard, rank) pair table:

    * positives: seeded misspellings of each long-enough truth title (N6/N7);
    * negatives: top-k Jaccard candidates of the misspelled query that are
      NOT the source title (O3 downsampling, true pair force-included);
    * simulated NOT-FOUND queries (every 1/nf_fraction-th title): the true
      title is masked from the candidate list and ALL its candidates are
      labeled 0. Without these, every training query has a true match and
      rank/jaccard become degenerate positive signals ("rank 0 ⇒ match"),
      which collapses precision on real not-found queries — the deployment
      distribution has ~30% of them (reference example_dataset).

    ``jaccard``/``rank`` are the matcher tier-2 signals feeding the
    extended 68-dim feature family (functions/features.py).
    """
    from ..functions.normalize import transform_text
    from ..functions.shingles import shingle_array
    from ..stages.matcher import TruthIndex

    index = TruthIndex(truth_table)
    norms = truth_table["norm_text"].to_pylist()
    k = n_candidates_per_title or cfg.top_k_train
    nf_every = int(round(1.0 / nf_fraction)) if nf_fraction > 0 else 0

    titles, truths, labels, jacs, ranks = [], [], [], [], []
    for i, norm in enumerate(norms):
        if len(norm) <= min_title_len:      # N7 (feature_engineering.py:213-215)
            continue
        query = transform_text(misspell(norm, cfg.seed * 1_000_003 + i),
                               max_chars=cfg.max_chars, n_grams=cfg.n_grams)
        qcodes = np.asarray(shingle_array([query], cfg.n_grams)[0].values,
                            dtype=np.uint64)
        simulate_nf = nf_every > 0 and i % nf_every == 0
        jac_all, _ = index.score_all(qcodes)
        if simulate_nf:
            jac_all[i] = -1.0               # mask the true title
        if index.n_truth <= k:
            cand = np.argsort(jac_all)[::-1][:k]
        else:
            part = np.argpartition(jac_all, -k)[-k:]
            cand = part[np.argsort(jac_all[part])[::-1]]
        cand = cand[jac_all[cand] > -0.5]   # drop the masked row (tiny truth)
        got_true = False
        for j, t in enumerate(cand):
            titles.append(query)
            truths.append(norms[t])
            is_true = int(t == i)
            got_true = got_true or bool(is_true)
            labels.append(is_true)
            jacs.append(float(jac_all[t]))
            ranks.append(j)
        if not simulate_nf and not got_true:  # force-include the true pair
            titles.append(query)            # (feature_engineering_prepare.py:51-55)
            truths.append(norm)
            labels.append(1)
            # true pair outside the top-k: its actual score + sentinel rank k
            jacs.append(float(jac_all[i]))
            ranks.append(k)
    return pa.table({"title": pa.array(titles), "truth_title": pa.array(truths),
                     "label": pa.array(labels, pa.int64()),
                     "jaccard": pa.array(jacs, pa.float64()),
                     "rank": pa.array(ranks, pa.int64())})


def train_verifier(truth_ds, cfg: MatchConfig = MatchConfig(), *,
                   eval_fraction: float = 0.2, model_path: str | None = None,
                   model_params: dict | None = None,
                   extra_features: bool = True):
    """End-to-end training: returns (model, metrics dict). ``model_params``
    override BoostedPairModel constructor defaults (e.g. n_rounds).

    ``extra_features`` appends the matcher's candidate IDF-Jaccard score and
    rank to the 66-dim reference features (68-dim extended family); the
    matcher auto-detects which family an artifact expects at predict time."""
    truth_table = collect_truth_table(truth_ds, cfg)
    counter = build_word_counter(truth_table)
    n_truth = truth_table.num_rows

    pairs = generate_training_pairs(truth_table, cfg)
    titles = pairs["title"].to_pylist()
    truths = pairs["truth_title"].to_pylist()
    y = pairs["label"].to_numpy(zero_copy_only=False).astype(np.float64)
    counts = np.stack([truth_word_counts(t, counter) for t in truths])
    extras = None
    if extra_features:
        extras = np.column_stack([
            pairs["jaccard"].to_numpy(zero_copy_only=False),
            pairs["rank"].to_numpy(zero_copy_only=False).astype(np.float64)])
    X = featurize_pairs(titles, truths, counts, n_truth, extras=extras)

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
