"""Suffix-array substring stage: hand-planted shared-substring pairs, the
within-doc sentinel/remaining-length exactness edge, run caps, and the
partition-locality contract. Full Ray-vs-DuckDB parity runs in
test_queries_oracle.py (auto-collected catalog entry)."""

import numpy as np
import pyarrow as pa

from doppel_speller_ray.stages.sa_substring import (
    sa_pairs_partition, sa_substring_pairs)

SHARED = "the quick brown fox jumps over the lazy dog"  # 43 chars


def _group(ids, texts):
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "norm_text": pa.array(texts, pa.string())})


def test_planted_pair_found_and_short_share_ignored():
    g = _group(
        [0, 8, 16, 24],
        [f"aaa {SHARED} bbb", f"ccc {SHARED} ddd",
         "unrelated text entirely here", "shares only tiny bit xyz"])
    out = sa_pairs_partition(g, min_len=24)
    pairs = set(zip(out["left_id"].to_pylist(), out["right_id"].to_pylist()))
    assert pairs == {(0, 8)}


def test_share_exactly_at_threshold_boundary():
    s24 = "x" * 0 + "abcdefghijklmnopqrstuvwx"  # 24 distinct chars
    assert len(s24) == 24
    # no flanking spaces: adjacent padding chars differ, so the common
    # substring is exactly s24 (resp. its 23-char prefix)
    g = _group([1, 9], [f"p{s24}q", f"r{s24}t"])
    assert len(sa_pairs_partition(g, min_len=24)) == 1
    g2 = _group([1, 9], [f"p{s24[:-1]}q", f"r{s24[:-1]}t"])  # 23 shared
    assert len(sa_pairs_partition(g2, min_len=24)) == 0


def test_sentinel_cannot_bridge_docs():
    # doc ends + next doc starts must never combine into a phantom share:
    # "tail" + sentinel + "head" of the neighbour spells the other doc's
    # planted string if the sentinel were transparent
    a = "zz abcdefghijklmn"          # 14-char tail fragment
    b = "opqrstuvwxyz1234 zz"        # continuation fragment
    c = "abcdefghijklmnopqrstuvwxyz1234"  # the 30-char whole
    g = _group([0, 8, 16], [a, b, c])
    out = sa_pairs_partition(g, min_len=24)
    assert len(out) == 0  # no doc actually shares a 24-run with another


def test_run_cap_counts_truncation():
    docs = [f"pad{i} {SHARED} end{i}" for i in range(6)]
    g = _group(list(range(0, 48, 8)), docs)
    full = sa_pairs_partition(g, min_len=24, max_run_docs=256)
    assert len(full) == 15  # C(6,2)
    capped = sa_pairs_partition(g, min_len=24, max_run_docs=3)
    assert len(capped) < 15
    assert capped["n_capped_runs"].to_pylist()[0] >= 1


def test_partition_locality(ray_session):
    import ray.data as rd

    # ids 0 and 1 share text but live in different doc_id % 8 partitions
    ds = rd.from_arrow(_group([0, 1, 8], [SHARED, SHARED, SHARED]))
    out = sa_substring_pairs(ds, min_len=24).to_pandas()
    pairs = set(zip(out.left_id, out.right_id))
    assert (0, 8) in pairs and (0, 1) not in pairs


def test_empty_and_single_doc_partitions():
    assert len(sa_pairs_partition(_group([3], ["alone here"]))) == 0
    assert len(sa_pairs_partition(_group([], []))) == 0
    # all-short docs: nothing reaches min_len
    assert len(sa_pairs_partition(_group([0, 8], ["ab", "ab"]))) == 0
