"""MinHash signature + LSH banding + bucket pair generation stages.

The scalable replacement for the reference's all-pairs IDF-Jaccard scan
(``/root/reference/doppelspeller/match_maker.py:74-203``): candidates come
from LSH bucket collisions (a groupby shuffle) instead of an O(Q×T) scan.

Skew handling (north_rule): buckets larger than ``cfg.max_bucket_size`` are
NOT all-paired (that is O(S²) on boilerplate-heavy buckets). Instead the
bucket's sorted doc_ids are *chained*: each doc pairs with its next
``cfg.chain_width`` neighbours — O(S·w) pairs — and union-find transitivity
reconnects the full cluster from verified chain links. Oversized-bucket
counts are reported per batch via the ``oversized`` column for observability
(no silent recall loss: every member still appears in ≥1 pair).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DedupConfig
from ..functions.minhash import lsh_bucket_keys, make_perms, minhash_flat
from ..functions.shingles import list_column_flat


def band_explode_batch(batch: pa.Table, *, cfg: DedupConfig) -> pa.Table:
    """docs batch → (doc_id, bucket) rows, one per (doc, band).

    Payload is deliberately minimal (16 bytes/row): shingles and text are
    re-attached to *pairs* after bucket grouping via a hash join, so the
    shuffle does not carry the document payload b× times.
    """
    flat, offsets = list_column_flat(batch["shingles"])
    a, b = make_perms(cfg.num_perms, cfg.seed)
    sig = minhash_flat(flat, offsets, a, b)
    keys = lsh_bucket_keys(sig, cfg.lsh_bands, cfg.lsh_rows, cfg.seed)  # (n, bands)
    n = len(batch)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(doc_ids, cfg.lsh_bands), type=pa.int64()),
            "bucket": pa.array(keys.reshape(-1), type=pa.uint64()),
        }
    )


def signature_batch(batch: pa.Table, *, cfg: DedupConfig) -> pa.Table:
    """docs batch + minhash:list<uint64> column (for inspection/compat)."""
    flat, offsets = list_column_flat(batch["shingles"])
    a, b = make_perms(cfg.num_perms, cfg.seed)
    sig = minhash_flat(flat, offsets, a, b)
    n, k = sig.shape
    lists = pa.ListArray.from_arrays(
        pa.array(np.arange(0, (n + 1) * k, k, dtype=np.int32)),
        pa.array(sig.reshape(-1), type=pa.uint64()),
    )
    return batch.append_column("minhash", lists)


def bucket_pairs_group(group, *, cfg: DedupConfig):
    """map_groups body over one LSH bucket (pandas in / pandas out).

    Emits candidate (left_id < right_id) pairs. Small buckets → all pairs;
    oversized buckets → sorted-neighbour chaining (see module docstring).
    """
    import pandas as pd

    ids = np.unique(group["doc_id"].to_numpy())
    s = len(ids)
    if s < 2:
        return pd.DataFrame({"left_id": np.empty(0, np.int64),
                             "right_id": np.empty(0, np.int64),
                             "oversized": np.empty(0, np.int8)})
    if s <= cfg.max_bucket_size:
        iu = np.triu_indices(s, k=1)
        left, right = ids[iu[0]], ids[iu[1]]
        oversized = np.zeros(len(left), dtype=np.int8)
    else:
        w = cfg.chain_width
        lefts, rights = [], []
        for d in range(1, w + 1):
            lefts.append(ids[:-d])
            rights.append(ids[d:])
        left = np.concatenate(lefts)
        right = np.concatenate(rights)
        oversized = np.ones(len(left), dtype=np.int8)
    return pd.DataFrame({"left_id": left, "right_id": right, "oversized": oversized})


def candidate_pairs(bands_ds, cfg: DedupConfig):
    """(doc_id, bucket) Dataset → distinct candidate pair Dataset.

    Two shuffles: bucket groupby (pair generation) and pair-key groupby
    (dedup across bands — the same pair surfaces in up to ``lsh_bands``
    buckets). The second groups a much smaller dataset.
    """
    from ray.data.aggregate import Max

    pairs = bands_ds.groupby("bucket").map_groups(
        bucket_pairs_group, batch_format="pandas", fn_kwargs={"cfg": cfg}
    )
    return pairs.groupby(["left_id", "right_id"]).aggregate(
        Max("oversized", alias_name="oversized")
    )
