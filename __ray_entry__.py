"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: MinHash/LSH near-dup detection + clustering over
    the sf0.001 documents table. Returns the clusters Dataset
    (doc_id:int64, cluster_id:int64), one row per input document."""
    import ray.data as rd

    from doppel_speller_ray.config import DedupConfig
    from doppel_speller_ray.pipelines.dedup import dedup_pipeline

    ds = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    res = dedup_pipeline(ds, DedupConfig(max_chars=None))
    return res.clusters


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2.

    Catalog lives in doppel_speller_ray.pipelines.queries; each callable
    takes ``sf_dir`` and returns a Dataset / pyarrow Table.
    """
    from doppel_speller_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for queries(). Hash/LSH-style operators are
    oracled via planted structure (salted corpora, exact copies) whose
    expected output is closed-form SQL; the quality score's arithmetic is
    replicated in SQL with a shared half-up rounding rule. Sampling is
    deterministic-by-hash (fmix32 gate) so even `sample_fraction` is
    oracled — every query has a SQL oracle."""
    from doppel_speller_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
