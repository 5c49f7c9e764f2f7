"""Partitioning-invariance contract for the round-4 second-wave tiers:
identical rows whether the input table arrives as ONE parquet file or as
a directory of 7 fragments (different Ray block structure)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from doppel_speller_ray.pipelines.queries import q_cdc_chunks
from doppel_speller_ray.pipelines.queries_joins import (
    q_posting_lists,
    q_prefix_jaccard_join,
    q_range_join,
)
from doppel_speller_ray.pipelines.queries_semistruct import (
    q_json_props_stats,
    q_pivot_user_values,
    q_triangle_count,
)
from doppel_speller_ray.pipelines.queries_profile import (
    q_sample_per_group,
    q_table_profile,
    q_value_quantiles,
)
from doppel_speller_ray.pipelines.queries_sketches import q_cms_heavy_hitters
from doppel_speller_ray.pipelines.queries_classifier import q_logreg_train
from doppel_speller_ray.pipelines.queries_tokenizer import q_bpe_train
from doppel_speller_ray.pipelines.queries_web import q_bm25_topk
from doppel_speller_ray.pipelines.queries_window import (
    q_events_debounce,
    q_percent_rank_length,
    q_time_to_next_event,
)


def _canon(res):
    df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    df = df[sorted(df.columns)]
    return df.sort_values(sorted(df.columns)).reset_index(drop=True)


def _write_split(tmp_path, name, tbl, frags=7):
    one = tmp_path / "one"
    many = tmp_path / "many"
    one.mkdir(exist_ok=True)
    (many / f"{name}.parquet").mkdir(parents=True, exist_ok=True)
    pq.write_table(tbl, one / f"{name}.parquet")
    step = (len(tbl) + frags - 1) // frags
    for i in range(frags):
        pq.write_table(tbl.slice(i * step, step),
                       many / f"{name}.parquet" / f"part-{i}.parquet")
    return str(one), str(many)


def test_docs_tier_partitioning_invariance(ray_session, tmp_path):
    rng = np.random.default_rng(5)
    n = 280
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    texts = [" ".join(rng.choice(words, rng.integers(6, 40)))
             for _ in range(n)]
    texts[50] = texts[10] + " eta"          # planted near-dup pair
    tbl = pa.table({
        "doc_id": pa.array(np.arange(1, n + 1), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array([["en", "fr", "de"][i % 3] for i in range(n)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    tbl = tbl.append_column("source", pa.array(
        [["web", "wiki"][i % 2] for i in range(n)]))
    one, many = _write_split(tmp_path, "documents", tbl)
    for fn in (q_prefix_jaccard_join, q_posting_lists, q_cms_heavy_hitters,
               q_bm25_topk, q_percent_rank_length, q_triangle_count,
               q_cdc_chunks, q_table_profile, q_sample_per_group,
               q_bpe_train, q_logreg_train):
        a, b = _canon(fn(one)), _canon(fn(many))
        pd.testing.assert_frame_equal(a, b), fn.__name__


def test_events_tier_partitioning_invariance(ray_session, tmp_path):
    rng = np.random.default_rng(9)
    n = 400
    base = 1_000_000_000_000
    tbl = pa.table({
        "event_id": pa.array(np.arange(1, n + 1), pa.int64()),
        "user_id": pa.array(rng.integers(1, 25, n), pa.int64()),
        "ts": pa.array(base + rng.integers(0, 3_600_000_000 * 8, n),
                       pa.timestamp("us")),
        "event_type": pa.array(rng.choice(
            ["click", "purchase", "view", "error", "signup"], n)),
        "value": pa.array(np.round(rng.uniform(0, 20, n), 2), pa.float64()),
        "props": pa.array([f'{{"k": {int(k)}}}'
                           for k in rng.integers(-50, 100, n)]),
    })
    one, many = _write_split(tmp_path, "events", tbl)
    for fn in (q_range_join, q_events_debounce, q_time_to_next_event,
               q_json_props_stats, q_pivot_user_values, q_value_quantiles):
        a, b = _canon(fn(one)), _canon(fn(many))
        pd.testing.assert_frame_equal(a, b), fn.__name__
