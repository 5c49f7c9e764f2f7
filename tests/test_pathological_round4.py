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
        "n_chars": pa.array([len(x) if x else 0 for x in TEXTS], pa.int64()),
    })
    pq.write_table(t, f"{tmp}/documents.parquet")
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
