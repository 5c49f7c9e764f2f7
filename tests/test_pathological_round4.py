"""Pathological-input probes for the round-4 tiers (the verify-skill
probe set: NULL text, empty, 1-char, non-ascii, 120KB row) — every new
word-level operator must survive and produce a sane row count."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from doppel_speller_ray.pipelines.queries_joins import (
    q_posting_lists,
    q_prefix_jaccard_join,
)
from doppel_speller_ray.pipelines.queries_semistruct import q_triangle_count
from doppel_speller_ray.pipelines.queries_sketches import q_cms_heavy_hitters
from doppel_speller_ray.pipelines.queries_web import q_bm25_topk
from doppel_speller_ray.pipelines.queries_window import q_percent_rank_length

TEXTS = [None, "", "x", "café naïve 中文 café naïve",
         "a b " * 30000, "normal words here normal words"]


@pytest.fixture(scope="module")
def patho_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("patho")
    t = pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS, pa.string()),
        "lang": pa.array(["en"] * len(TEXTS), pa.string()),
        "source": pa.array(["web"] * len(TEXTS), pa.string()),
        "n_chars": pa.array([len(x) if x else 0 for x in TEXTS], pa.int64()),
    })
    pq.write_table(t, f"{tmp}/documents.parquet")
    # pathological events: singleton type, all-ties type, bucket-boundary
    # value, negative value (negative coarse bucket), huge value
    ev = pa.table({
        "event_id": pa.array(range(6), pa.int64()),
        "user_id": pa.array([1, 1, 2, 2, 3, 3], pa.int64()),
        "ts": pa.array([1_000_000 * i for i in range(6)],
                       pa.timestamp("us")),
        "event_type": pa.array(["solo", "tie", "tie", "tie", "wild",
                                "wild"]),
        "value": pa.array([8.0, 5.5, 5.5, 5.5, -3.25, 1.0e12],
                          pa.float64()),
        "props": pa.array(['{"k": 1}'] * 6, pa.string()),
    })
    pq.write_table(ev, f"{tmp}/events.parquet")
    return str(tmp)


@pytest.mark.parametrize("fn,min_rows", [
    (q_prefix_jaccard_join, 0),   # giant repeat-doc has no ≥0.6 partner
    (q_posting_lists, 5),
    (q_cms_heavy_hitters, 1),
    (q_bm25_topk, 5),
    (q_percent_rank_length, 6),   # one row per doc, NULLs included
    (q_triangle_count, 1),
])
def test_new_tier_survives_pathological_docs(ray_session, patho_dir, fn,
                                             min_rows):
    r = fn(patho_dir)
    n = len(r) if isinstance(r, pa.Table) else r.count()
    assert n >= min_rows


def test_profile_tier_survives_pathological_inputs(ray_session, patho_dir):
    from doppel_speller_ray.pipelines.queries_profile import (
        _VQ_PS,
        q_sample_per_group,
        q_table_profile,
        q_value_quantiles,
    )

    prof = q_table_profile(patho_dir).to_pandas().set_index("col")
    assert prof.loc["text", "n_null"] == 1
    assert prof.loc["text", "n_distinct"] == len(TEXTS) - 1
    assert prof.loc["source", "n_distinct"] == 1

    spg = q_sample_per_group(patho_dir).to_pandas()
    assert len(spg) == 5            # k=5 < 6 docs, one lang

    vq = q_value_quantiles(patho_dir).to_pandas() \
        .set_index(["event_type", "p"])["q"]
    assert len(vq) == 3 * len(_VQ_PS)
    assert (vq.loc["solo"] == 8.0).all()    # singleton: every p = the value
    assert (vq.loc["tie"] == 5.5).all()     # all-ties
    assert vq[("wild", 0.5)] == -3.25       # negative bucket, rank 1 of 2
    assert vq[("wild", 0.9)] == 1.0e12      # huge value / distant bucket
