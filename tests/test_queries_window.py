"""Hand-case tests for the window-function tier (queries_window.py):
LAG-debounce chain semantics, equal-ts tie collapse, LEAD gaps with NULL
tails, and percent_rank tie handling."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from doppel_speller_ray.pipelines.queries_window import (
    q_events_debounce,
    q_percent_rank_length,
    q_time_to_next_event,
)

MIN = 60 * 1_000_000


def _write_events(tmp_path, rows):
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    })
    pq.write_table(t, f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_debounce_lag_chain_semantics(ray_session, tmp_path):
    base = 1_000_000_000_000
    rows = [
        # user 1 clicks at 0, +5min, +12min: the LAG rule measures each
        # event against its PREDECESSOR (kept or not) — so +12min is
        # dropped too (7min after +5min), unlike a since-last-KEPT rule
        (1, 1, base, "click"),
        (2, 1, base + 5 * MIN, "click"),
        (3, 1, base + 12 * MIN, "click"),
        # +25min: 13min after +12min → kept
        (4, 1, base + 25 * MIN, "click"),
        # different type interleaved: its own stream, first → kept
        (5, 1, base + 1 * MIN, "purchase"),
        # different user, same ts as event 1 → own stream, kept
        (6, 2, base, "click"),
    ]
    out = q_events_debounce(_write_events(tmp_path, rows)).to_pandas()
    assert sorted(out["event_id"]) == [1, 4, 5, 6]


def test_debounce_equal_ts_collapses_to_lowest_id(ray_session, tmp_path):
    base = 2_000_000_000_000
    rows = [(9, 3, base, "view"), (7, 3, base, "view"), (8, 3, base, "view")]
    out = q_events_debounce(_write_events(tmp_path, rows)).to_pandas()
    assert sorted(out["event_id"]) == [7]


def test_debounce_boundary_exact_gap_dropped(ray_session, tmp_path):
    base = 3_000_000_000_000
    rows = [(1, 4, base, "click"), (2, 4, base + 10 * MIN, "click"),
            (3, 4, base + 20 * MIN + 1, "click")]
    out = q_events_debounce(_write_events(tmp_path, rows)).to_pandas()
    # exactly 10min → NOT > 10min → dropped; 10min+1µs → kept
    assert sorted(out["event_id"]) == [1, 3]


def test_time_to_next_event_gaps_and_null_tail(ray_session, tmp_path):
    base = 4_000_000_000_000
    rows = [
        (1, 1, base, "click"),
        (2, 1, base + 30 * MIN, "view"),
        (3, 2, base, "click"),
    ]
    out = q_time_to_next_event(_write_events(tmp_path, rows)).to_pandas() \
        .set_index("event_id")
    assert out.loc[1, "gap_us"] == 30 * MIN
    assert np.isnan(out.loc[2, "gap_us"])   # user 1's last event
    assert np.isnan(out.loc[3, "gap_us"])   # user 2's only event


def test_percent_rank_ties_and_singleton(ray_session, tmp_path):
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "lang": pa.array(["en", "en", "en", "en", "fr"], pa.string()),
        "n_chars": pa.array([10, 20, 20, 30, 99], pa.int64()),
        "text": pa.array(["x"] * 5, pa.string()),
    })
    pq.write_table(t, f"{tmp_path}/documents.parquet")
    out = q_percent_rank_length(str(tmp_path)).to_pandas().set_index("doc_id")
    # en: ranks over n=4 → (1-1)/3, ties at 20 both (2-1)/3, (4-1)/3
    assert out.loc[0, "pr"] == pytest.approx(0.0)
    assert out.loc[1, "pr"] == pytest.approx(round(1 / 3, 6), abs=1e-9)
    assert out.loc[2, "pr"] == pytest.approx(round(1 / 3, 6), abs=1e-9)
    assert out.loc[3, "pr"] == pytest.approx(1.0)
    assert out.loc[4, "pr"] == 0.0          # singleton group


def test_ts_corr_pairs_hand_case(ray_session, tmp_path):
    """Perfectly correlated, anti-correlated, and constant series: corr
    +1 / -1 exactly; the constant series is dropped (undefined corr), and
    a type absent in some hours is zero-filled before correlating."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from doppel_speller_ray.pipelines.queries_window import q_ts_corr_pairs

    rows = []
    base = np.datetime64("2024-01-01T00:00:00", "us")
    hour = np.timedelta64(3600, "s")
    # a: counts 1,2,3 ; b: 2,4,6 (corr +1); c: 3,2,1 (corr -1 with a)
    # d: constant 1,1,1 (dropped); e: present only in hour 0 (zero-fill)
    for h, (na, nb, nc) in enumerate([(1, 2, 3), (2, 4, 2), (3, 6, 1)]):
        ts = base + h * hour
        rows += [("a", ts)] * na + [("b", ts)] * nb + [("c", ts)] * nc
        rows += [("d", ts)]
    rows += [("e", base)] * 5
    t = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([0] * len(rows), pa.int64()),
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "value": pa.array([0.0] * len(rows), pa.float64()),
        "props": pa.array([""] * len(rows), pa.string()),
    })
    pq.write_table(t, f"{tmp_path}/events.parquet")
    out = q_ts_corr_pairs(str(tmp_path)).to_pandas()
    got = {(r.type_a, r.type_b): r.corr for r in out.itertuples()}
    assert got[("a", "b")] == 1.0
    assert got[("a", "c")] == -1.0
    assert not any("d" in k for k in got)          # constant dropped
    assert ("a", "e") in got                        # zero-filled, kept
    # c falls 3,2,1 while e spikes 5,0,0: positive but < 1
    assert 0 < got[("c", "e")] < 1
