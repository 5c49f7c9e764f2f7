"""Shingle IDF table: distributed build + broadcast lookup (A2/A3/A4).

The reference computes n-gram document frequencies and IDF weights over the
truth corpus in one driver pass (``/root/reference/doppelspeller/
match_maker.py:135-142``, ``common.py:145-158``). Distributed form: per-batch
partial counts (one row per shingle per batch — the combiner pattern) →
small ``groupby(shingle).sum()`` → collected + broadcast.

For the default char-3-gram config over normalized text the vocabulary is
bounded by 37³ ≈ 50k codes, so the table is always broadcastable; larger
n (hashed shingles) can grow, hence the ``max_vocab`` guard.

Unseen shingles fall back to the maximum IDF (match_maker.py:151,181).
"""

from __future__ import annotations

import numpy as np


def shingle_df_ds(docs_ds):
    """docs (shingles list<uint64>) → Dataset (shingle:uint64, df:int64)."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    from ..functions.shingles import list_column_flat

    def partial(t: pa.Table) -> pa.Table:
        flat, _ = list_column_flat(t["shingles"])
        codes, counts = np.unique(flat, return_counts=True)
        return pa.table({"shingle": pa.array(codes, pa.uint64()),
                         "df_part": pa.array(counts, pa.int64())})

    partials = docs_ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("shingle").aggregate(Sum("df_part", alias_name="df"))


def build_idf_arrays(docs_ds, n_docs: int | None = None,
                     max_vocab: int = 5_000_000) -> tuple[np.ndarray, np.ndarray, float]:
    """(codes sorted, idf per code, max_idf fallback) — driver-collected.

    idf = ln(N / df) (common.py:154-158 / match_maker.py:135-139).
    """
    if n_docs is None:
        n_docs = docs_ds.count()
    rows = shingle_df_ds(docs_ds).take_all()
    if len(rows) > max_vocab:
        raise ValueError(
            f"shingle vocabulary {len(rows)} exceeds broadcast limit "
            f"{max_vocab}; use a pre-aggregated stop-shingle cut or keep "
            f"IDF weighting off at this n-gram size")
    codes = np.array([r["shingle"] for r in rows], dtype=np.uint64)
    df = np.array([r["df"] for r in rows], dtype=np.float64)
    order = np.argsort(codes)
    codes, df = codes[order], df[order]
    idf = np.log(np.maximum(n_docs, 1) / df)
    max_idf = float(idf.max()) if len(idf) else 0.0
    return codes, idf, max_idf


def idf_weighted_jaccard(a: np.ndarray, b: np.ndarray, codes: np.ndarray,
                         idf: np.ndarray, max_idf: float) -> float:
    """Reference modified Jaccard (match_maker.py:16-52):
    Σidf(common) / (Σidf(a) + Σidf(b) − Σidf(common)); unseen → max_idf."""
    def weights(x: np.ndarray) -> np.ndarray:
        if len(codes) == 0:
            return np.full(len(x), max_idf)
        pos = np.searchsorted(codes, x)
        pos_c = np.minimum(pos, len(codes) - 1)
        found = codes[pos_c] == x
        w = np.where(found, idf[pos_c], max_idf)
        return w

    wa, wb = weights(a), weights(b)
    common = np.intersect1d(a, b, assume_unique=True)
    wc = weights(common).sum()
    denom = wa.sum() + wb.sum() - wc
    return float(wc / denom) if denom > 0 else 0.0
