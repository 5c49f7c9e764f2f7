"""Hand-case tests for the join-algorithm tier (queries_joins.py):
band-boundary semantics for range_join, prefix-filter completeness vs a
brute-force reference for prefix_jaccard_join, and exact posting lists.
Runs the real Dataset pipelines over tiny parquet fixtures (same entry
shape the driver uses)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from doppel_speller_ray.pipelines.queries_joins import (
    _PJ_THRESHOLD,
    q_posting_lists,
    q_prefix_jaccard_join,
    q_range_join,
)

US = 1_000_000
H2 = 2 * 3600 * US


def _write_events(tmp_path, rows):
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    })
    pq.write_table(t, f"{tmp_path}/events.parquet")
    return str(tmp_path)


def _write_docs(tmp_path, texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    pq.write_table(t, f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_range_join_band_boundaries(ray_session, tmp_path):
    base = 1_000_000_000_000  # µs epoch
    rows = [
        # user 7: one purchase, clicks probing every band edge
        (1, 7, base, "purchase"),
        (2, 7, base - H2, "click"),          # gap == 2h → EXCLUDED (strict >)
        (3, 7, base - H2 + 1, "click"),      # just inside → included
        (4, 7, base, "click"),               # gap == 0 → included
        (5, 7, base + 1, "click"),           # after purchase → excluded
        # other user's click inside the window → excluded (key mismatch)
        (6, 8, base - 10, "click"),
        # user 9: purchase with no clicks at all
        (7, 9, base, "purchase"),
        # non-click/purchase types never join
        (8, 7, base - 10, "view"),
    ]
    out = q_range_join(_write_events(tmp_path, rows)).to_pandas()
    got = sorted(map(tuple, out[["purchase_id", "click_id", "gap_us"]].values))
    assert got == [(1, 3, H2 - 1), (1, 4, 0)]


def test_range_join_multiple_purchases_one_user(ray_session, tmp_path):
    base = 2_000_000_000_000
    rows = [
        (1, 5, base, "purchase"),
        (2, 5, base + 3600 * US, "purchase"),
        (3, 5, base - 60 * US, "click"),     # in both windows
        (4, 5, base + 1800 * US, "click"),   # only in the later window
    ]
    out = q_range_join(_write_events(tmp_path, rows)).to_pandas()
    got = sorted(map(tuple, out[["purchase_id", "click_id"]].values))
    assert got == [(1, 3), (2, 3), (2, 4)]


def _bigrams(text):
    w = text.split()
    return {f"{a} {b}" for a, b in zip(w, w[1:])}


def test_prefix_jaccard_hand_case(ray_session, tmp_path):
    texts = [
        "alpha beta gamma delta epsilon",   # bigrams {ab, bg, gd, de}
        "alpha beta gamma delta zeta",      # shares 3 of 5 union → 0.6
        "alpha beta theta iota kappa",      # inter 1, union 7 → excluded
        "mu nu xi omicron pi",              # disjoint
    ]
    out = q_prefix_jaccard_join(_write_docs(tmp_path, texts)).to_pandas()
    assert sorted(map(tuple, out[["left_id", "right_id"]].values)) == [(0, 1)]
    assert out["jaccard"].iloc[0] == pytest.approx(0.6, abs=1e-9)


def test_prefix_jaccard_matches_bruteforce(ray_session, tmp_path):
    # completeness: the prefix filter must find EVERY pair ≥ t that a
    # brute-force all-pairs scan finds (no false negatives), and the
    # verify stage must kill every candidate below t (no false positives)
    rng = np.random.default_rng(42)
    vocab = np.array(["alpha", "beta", "gamma", "delta", "epsilon",
                      "zeta", "eta", "theta", "iota", "kappa"])
    texts = []
    for i in range(36):
        n = int(rng.integers(8, 28))
        texts.append(" ".join(rng.choice(vocab, size=n)))
    # plant near-dup pairs: copy with a one-word tail edit
    texts.append(texts[0] + " omega")
    texts.append(texts[5])
    sf = _write_docs(tmp_path, texts)

    expect = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            a, b = _bigrams(texts[i]), _bigrams(texts[j])
            if not a or not b:
                continue
            jac = len(a & b) / len(a | b)
            if jac >= _PJ_THRESHOLD:
                expect.add((i, j, round(jac, 6)))

    out = q_prefix_jaccard_join(sf).to_pandas()
    got = {(int(l), int(r), round(float(j), 6))
           for l, r, j in out[["left_id", "right_id", "jaccard"]].values}
    assert got == expect
    assert (int(0), int(36)) in {(l, r) for l, r, _ in got}  # planted pair


def test_posting_lists_hand_case(ray_session, tmp_path):
    sf = _write_docs(tmp_path,
                     ["alpha beta", "beta gamma", "beta", "alpha alpha"],
                     ids=[10, 2, 30, 4])
    out = q_posting_lists(sf).to_pandas().set_index("word")
    assert out.loc["alpha", "postings"] == "4,10"
    assert int(out.loc["alpha", "df"]) == 2
    assert out.loc["beta", "postings"] == "2,10,30"   # sorted doc ids
    assert int(out.loc["beta", "df"]) == 3
    assert out.loc["gamma", "postings"] == "2"
    assert len(out) == 3  # duplicate occurrences within a doc counted once
