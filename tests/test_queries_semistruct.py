"""Hand-case tests for the semi-structured + graph tier
(queries_semistruct.py): negative-k JSON extraction, pivot column math,
and triangle counting vs a brute-force reference."""

from itertools import combinations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from doppel_speller_ray.pipelines.queries_semistruct import (
    q_json_props_stats,
    q_pivot_user_values,
    q_triangle_count,
)


def test_json_props_stats_negative_and_avg(ray_session, tmp_path):
    t = pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "ts": pa.array([1, 2, 3], pa.timestamp("us")),
        "event_type": pa.array(["click", "click", "view"], pa.string()),
        "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
        "props": pa.array(['{"k": -5}', '{"k":  8}', '{"k": 0}'], pa.string()),
    })
    pq.write_table(t, f"{tmp_path}/events.parquet")
    out = q_json_props_stats(str(tmp_path)).to_pandas().set_index("event_type")
    assert int(out.loc["click", "sum_k"]) == 3      # -5 + 8
    assert out.loc["click", "avg_k"] == pytest.approx(1.5)
    assert int(out.loc["view", "sum_k"]) == 0
    assert int(out.loc["click", "n"]) == 2


def test_pivot_user_values_hand_case(ray_session, tmp_path):
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "user_id": pa.array([7, 7, 7, 9], pa.int64()),
        "ts": pa.array([1, 2, 3, 4], pa.timestamp("us")),
        "event_type": pa.array(["click", "click", "purchase", "error"],
                               pa.string()),
        "value": pa.array([1.25, 2.75, 10.0, 0.5], pa.float64()),
        "props": pa.array(['{"k": 1}'] * 4, pa.string()),
    })
    pq.write_table(t, f"{tmp_path}/events.parquet")
    out = q_pivot_user_values(str(tmp_path)).to_pandas().set_index("user_id")
    assert out.loc[7, "click_value"] == pytest.approx(4.0)
    assert out.loc[7, "purchase_value"] == pytest.approx(10.0)
    assert out.loc[7, "view_value"] == 0.0
    assert out.loc[9, "error_value"] == pytest.approx(0.5)
    assert len(out) == 2


def _expected_triangles(ids):
    edges = set()
    for i in ids:
        ds = [i % 31, (i * 2) % 31, (i * 3) % 31]
        for a, b in combinations(ds, 2):
            if a != b:
                edges.add((min(a, b), max(a, b)))
    nodes = {n for e in edges for n in e}
    return sum(1 for a, b, c in combinations(sorted(nodes), 3)
               if (a, b) in edges and (b, c) in edges and (a, c) in edges)


def test_triangle_count_matches_bruteforce(ray_session, tmp_path):
    ids = list(range(73))   # dense-ish co-citation graph on 31 domains
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(["x"] * len(ids), pa.string())})
    pq.write_table(t, f"{tmp_path}/documents.parquet")
    out = q_triangle_count(str(tmp_path)).to_pandas()
    assert int(out["n_triangles"].iloc[0]) == _expected_triangles(ids)
    assert _expected_triangles(ids) > 0


def test_triangle_count_no_triangles(ray_session, tmp_path):
    # doc 0 links (0,0,0) -> self-loops only -> no edges at all
    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array(["x"], pa.string())})
    pq.write_table(t, f"{tmp_path}/documents.parquet")
    out = q_triangle_count(str(tmp_path)).to_pandas()
    assert int(out["n_triangles"].iloc[0]) == 0
