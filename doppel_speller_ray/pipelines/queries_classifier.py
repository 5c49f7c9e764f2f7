"""Classifier-training tier: distributed logistic regression.

``logreg_train`` trains a linear quality/language classifier by full-batch
gradient descent over the corpus — the shape of every "fastText-style
quality classifier" stage in LLM data pipelines (train a cheap linear model
on labeled docs, then score the corpus). The scoring half of that loop is
already certified elsewhere (lm_score, quality, lang_id); this adds the
TRAINING half as a first-class distributed operator.

Scale shape (kmeans_embed / bpe_train pattern): the feature table is
computed once and its blocks pinned as object-store refs; each GD iteration
re-maps the SAME refs producing per-block gradient partials
(sum of (sigmoid(w·x) − y)·x, row count) — ONE combine task folds them and
returns the new weight vector; the driver holds O(dim) state. No shuffle at
all: gradient descent is a pure map-reduce per iteration.

Cross-engine float contract: weights are rounded to 6 decimals with the
repo's shared half-up rule (floor(x·1e6+0.5)/1e6, mirrored textually in the
SQL) AFTER EVERY ITERATION, so summation-order drift (numpy pairwise + ray
partial-tree vs DuckDB streaming avg) resets each round instead of
compounding through exp().

Features are deliberately decimal-scaled tokenize counts (n_words/100,
n_chars/1000) so both engines derive them from the same certified norm
(_SQL_NORM / tokenize oracle semantics); label y = (lang = 'en').
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_LR_ITERS = 3
_LR_RATE = 0.5
_LR_DIM = 3  # bias, n_words/100, n_chars/1000


def _features(t: pa.Table) -> pa.Table:
    from ..functions.normalize import normalize_array, tokenize_counts
    from .queries import _QCFG

    # n_grams=0: unpadded norm (= _SQL_NORM exactly). The reference
    # '0'-rjust pad on degenerate texts would shift the GLOBAL gradient,
    # not just its own row (same rationale as bpe_train's word corpus).
    norm = normalize_array(t["text"], _QCFG.max_chars, 0)
    n_words, n_chars = tokenize_counts(norm)
    lang = t["lang"].to_numpy(zero_copy_only=False)
    return pa.table({
        "f0": pa.array(np.ones(len(t)), pa.float64()),
        "f1": pa.array(n_words.to_numpy(zero_copy_only=False) / 100.0,
                       pa.float64()),
        "f2": pa.array(n_chars.to_numpy(zero_copy_only=False)
                       .astype(np.float64) / 1000.0, pa.float64()),
        "y": pa.array((lang == "en").astype(np.float64), pa.float64()),
    })


def _round6(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 1e6 + 0.5) / 1e6  # shared half-up rule (queries.py)


def logreg_train(sf_dir: str, iters: int = _LR_ITERS,
                 lr: float = _LR_RATE):
    """Full-batch GD logistic regression → Dataset (iter, w0, w1, w2),
    one row per iteration (weights AFTER that iteration's update)."""
    import ray
    import ray.data as rd

    from .queries import _docs

    feats = _docs(sf_dir, ["text", "lang"]).map_batches(
        _features, batch_format="pyarrow")
    refs = feats.to_arrow_refs()

    def partial(t: pa.Table, *, w) -> pa.Table:
        if not t.num_columns or not len(t):
            return pa.table({"g": pa.array([], pa.list_(pa.float64())),
                             "n": pa.array([], pa.int64())})
        x = np.column_stack([
            t[c].to_numpy(zero_copy_only=False) for c in ("f0", "f1", "f2")])
        y = t["y"].to_numpy(zero_copy_only=False)
        z = x @ np.asarray(w)
        p = 1.0 / (1.0 + np.exp(-z))
        g = (p - y) @ x  # sum over rows of (p-y)*x_j
        return pa.table({"g": pa.array([g.tolist()], pa.list_(pa.float64())),
                         "n": pa.array([len(t)], pa.int64())})

    def _fold(w, lr_, *parts):
        g = np.zeros(_LR_DIM)
        n = 0
        for p in parts:
            if p.num_columns and len(p):
                g += np.asarray(
                    p["g"].combine_chunks().values, dtype=np.float64
                ).reshape(len(p), _LR_DIM).sum(axis=0)
                n += int(np.sum(p["n"].to_numpy(zero_copy_only=False)))
        if n == 0:
            return np.asarray(w)
        return _round6(np.asarray(w) - lr_ * (g / n))

    fold = ray.remote(num_cpus=1)(_fold)

    w = np.zeros(_LR_DIM)
    rows = []
    for i in range(1, iters + 1):
        parts = rd.from_arrow_refs(refs).map_batches(
            partial, batch_format="pyarrow", fn_kwargs={"w": w.tolist()})
        w = ray.get(fold.remote(w.tolist(), lr, *parts.to_arrow_refs()))
        rows.append((i, *w.tolist()))

    out = pa.table({
        "iter": pa.array([r[0] for r in rows], pa.int64()),
        "w0": pa.array([r[1] for r in rows], pa.float64()),
        "w1": pa.array([r[2] for r in rows], pa.float64()),
        "w2": pa.array([r[3] for r in rows], pa.float64()),
    })
    return rd.from_arrow(out)


def q_logreg_train(sf_dir: str):
    return logreg_train(sf_dir)


def _sql_logreg_train(iters: int = _LR_ITERS, lr: float = _LR_RATE) -> str:
    """GD iterations unrolled as CTEs from the same constants; the weight
    rounding (floor(x·1e6+0.5)/1e6) mirrors _round6 textually."""
    from .queries import _SQL_NORM

    head = f"""
WITH nrm AS (SELECT lang, {_SQL_NORM} AS norm
             FROM (SELECT lang, coalesce(text, '') AS text
                   FROM documents)),
f AS (SELECT 1.0 AS f0,
             (CASE WHEN norm = '' THEN 0
                   ELSE length(string_split(norm, ' ')) END) / 100.0 AS f1,
             length(norm) / 1000.0 AS f2,
             CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
      FROM nrm),
w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2)"""
    body = ""
    for i in range(1, iters + 1):
        prev = f"w{i - 1}"
        body += f""",
g{i} AS (SELECT
           avg((1.0/(1.0 + exp(-(w.w0*f.f0 + w.w1*f.f1 + w.w2*f.f2))) - f.y)
               * f.f0) AS g0,
           avg((1.0/(1.0 + exp(-(w.w0*f.f0 + w.w1*f.f1 + w.w2*f.f2))) - f.y)
               * f.f1) AS g1,
           avg((1.0/(1.0 + exp(-(w.w0*f.f0 + w.w1*f.f1 + w.w2*f.f2))) - f.y)
               * f.f2) AS g2
         FROM f, {prev} w),
w{i} AS (SELECT floor((w.w0 - {lr}*g.g0)*1e6 + 0.5)/1e6 AS w0,
                floor((w.w1 - {lr}*g.g1)*1e6 + 0.5)/1e6 AS w1,
                floor((w.w2 - {lr}*g.g2)*1e6 + 0.5)/1e6 AS w2
         FROM {prev} w, g{i} g)"""
    selects = [
        f"SELECT {i}::BIGINT AS iter, w0, w1, w2 FROM w{i}"
        for i in range(1, iters + 1)
    ]
    return head + body + "\n" + "\nUNION ALL ".join(selects)


CLASSIFIER_QUERIES = {
    "logreg_train": q_logreg_train,
}

CLASSIFIER_ORACLES = {
    "logreg_train": _sql_logreg_train(),
}
