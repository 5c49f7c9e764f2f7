"""Hand-computed truth for the distributed as-of join (`stages/asof.py`)."""

import numpy as np
import pyarrow as pa
import pytest

from doppel_speller_ray.stages.asof import asof_join


def _ds(rows, cols=("id", "k", "t")):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        c: pa.array([r[j] for r in rows], pa.int64())
        for j, c in enumerate(cols)}))


def _run(left, right, **kw):
    out = asof_join(_ds(left), _ds(right), by="k", on="t",
                    left_id="id", right_id="id", num_partitions=4, **kw)
    return {r["id"]: (r["right_t"], r["right_id"]) for r in out.take_all()}


def test_asof_backward_hand_computed(ray_session):
    left = [(100, 1, 50), (101, 1, 10), (102, 2, 30), (103, 3, 40)]
    right = [(200, 1, 20), (201, 1, 50), (202, 2, 35), (203, 9, 1)]
    got = _run(left, right)
    assert got == {
        100: (50, 201),   # right row AT the left time matches
        101: (None, None),  # nothing at-or-before t=10
        102: (None, None),  # only a later right row for k=2
        103: (None, None),  # no right rows for k=3 at all
    }


def test_asof_tie_resolves_to_greatest_id(ray_session):
    left = [(1, 7, 100)]
    right = [(50, 7, 100), (51, 7, 100), (49, 7, 99)]
    got = _run(left, right)
    assert got == {1: (100, 51)}


def test_asof_forward_direction(ray_session):
    left = [(1, 4, 10), (2, 4, 100)]
    right = [(60, 4, 10), (61, 4, 50)]
    got = _run(left, right, direction="forward")
    assert got == {1: (10, 60), 2: (None, None)}


def test_asof_empty_right_side(ray_session):
    left = [(1, 2, 3), (4, 5, 6)]
    got = _run(left, [])
    assert got == {1: (None, None), 4: (None, None)}


def test_asof_timestamp_round_trip(ray_session):
    import ray.data as rd

    ts = pa.array(np.array([1_000_000, 2_000_000], np.int64)) \
        .cast(pa.timestamp("us"))
    left = rd.from_arrow(pa.table({"id": pa.array([1, 2], pa.int64()),
                                   "k": pa.array([0, 0], pa.int64()),
                                   "t": ts}))
    right = rd.from_arrow(pa.table({"id": pa.array([9], pa.int64()),
                                    "k": pa.array([0], pa.int64()),
                                    "t": ts.slice(0, 1)}))
    rows = {r["id"]: r for r in asof_join(
        left, right, by="k", on="t", left_id="id", right_id="id",
        num_partitions=2).take_all()}
    assert rows[1]["t"] == rows[1]["right_t"]  # exact timestamp preserved
    assert rows[2]["right_id"] == 9
    assert rows[1]["right_id"] == 9


def test_asof_invalid_direction():
    with pytest.raises(ValueError):
        asof_join(None, None, by="k", on="t", left_id="id",
                  right_id="id", direction="nearest")
