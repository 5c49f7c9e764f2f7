"""Exact-duplicate tier (D1) — hash-partitioned groupby, not a driver dict.

The reference's tier 1 is a driver-side dict lookup
(``/root/reference/doppelspeller/predict.py:97-113``); at web scale exact
dedup is a shuffle: group on ``norm_hash`` (uint64 of the normalized text),
pick the min-doc_id representative per *distinct text* (hash collisions are
resolved by comparing the actual strings inside the group), and emit
(rep_id, doc_id) membership so exact-dup pairs feed the same union-find as
the LSH tier.
"""

from __future__ import annotations

import numpy as np


def exact_rep_group(group, **_kwargs):
    """map_groups body over one norm_hash group (pyarrow in/out — list
    columns like ``shingles`` must NOT round-trip through pandas).

    Adds ``rep_id`` (min doc_id among rows with byte-identical norm_text —
    hash collisions resolved by comparing actual strings) and ``is_rep``.
    Groups are tiny (duplicate multiplicity), so the per-group Python dict
    is cheap.
    """
    import pyarrow as pa

    n = group.num_rows
    doc_ids = group["doc_id"].to_numpy(zero_copy_only=False)
    if n == 1:
        rep = doc_ids
        is_rep = np.array([True])
    else:
        texts = group["norm_text"].to_pylist()
        min_per_text: dict[str, int] = {}
        for t, d in zip(texts, doc_ids):
            d = int(d)
            if t not in min_per_text or d < min_per_text[t]:
                min_per_text[t] = d
        rep = np.fromiter((min_per_text[t] for t in texts), dtype=np.int64, count=n)
        is_rep = rep == doc_ids
    group = group.append_column("rep_id", pa.array(rep, pa.int64()))
    group = group.append_column("is_rep", pa.array(is_rep, pa.bool_()))
    return group


def exact_dedup(docs_ds):
    """docs Dataset → same rows + (rep_id, is_rep). One shuffle on norm_hash."""
    return docs_ds.groupby("norm_hash").map_groups(exact_rep_group, batch_format="pyarrow")


def split_exact(docs_with_rep):
    """(representatives Dataset, exact_pairs Dataset[left_id, right_id])."""
    import pyarrow as pa
    import pyarrow.compute as pc

    reps = docs_with_rep.map_batches(
        lambda t: t.filter(pc.equal(t["is_rep"], True)), batch_format="pyarrow"
    )

    def pairs(t: pa.Table) -> pa.Table:
        dup = t.filter(pc.not_equal(t["rep_id"], t["doc_id"]))
        return pa.table({
            "left_id": pc.min_element_wise(dup["rep_id"], dup["doc_id"]),
            "right_id": pc.max_element_wise(dup["rep_id"], dup["doc_id"]),
        })

    exact_pairs = docs_with_rep.map_batches(pairs, batch_format="pyarrow")
    return reps, exact_pairs
