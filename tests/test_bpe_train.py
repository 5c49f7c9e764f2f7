"""Hand-computed tests for the BPE merge trainer
(pipelines/queries_tokenizer.py): greedy run-parity merge application,
overlapping pair counting, symbol-string resolution, and a crafted-corpus
end-to-end (tie-break + same-symbol runs) against the DuckDB oracle.
Oracle parity at sf0.01 is covered by test_queries_oracle.py (the catalog
import picks the new entry up automatically)."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from doppel_speller_ray.pipelines.queries_tokenizer import (
    _sql_bpe_train,
    _sym_str,
    apply_merge,
    bpe_train_merges,
    pair_counts,
)


def _seq(word: str):
    syms = np.array([ord(c) for c in word], dtype=np.int32)
    wid = np.zeros(len(word), dtype=np.int64)
    return syms, wid


def test_apply_merge_distinct_pair():
    # 'abab': both (a,b) matches are disjoint -> both merge
    syms, wid = _seq("abab")
    out, ow = apply_merge(syms, wid, ord("a"), ord("b"), 256)
    assert out.tolist() == [256, 256] and ow.tolist() == [0, 0]


def test_apply_merge_run_parity():
    # greedy left-to-right on same-symbol runs: 'aaaa' -> (aa)(aa),
    # 'aaa' -> (aa)a, 'aaaaa' -> (aa)(aa)a
    for word, expect in [("aaaa", [256, 256]), ("aaa", [256, ord("a")]),
                         ("aaaaa", [256, 256, ord("a")])]:
        syms, wid = _seq(word)
        out, _ = apply_merge(syms, wid, ord("a"), ord("a"), 256)
        assert out.tolist() == expect, word


def test_apply_merge_respects_word_boundary():
    # 'a|b' across two words must NOT merge
    syms = np.array([ord("a"), ord("b")], dtype=np.int32)
    wid = np.array([0, 1], dtype=np.int64)
    out, _ = apply_merge(syms, wid, ord("a"), ord("b"), 256)
    assert out.tolist() == [ord("a"), ord("b")]


def test_pair_counts_overlapping_and_weighted():
    # word 'aaa' with freq 5: overlapping (a,a) occurrences = 2 -> count 10
    syms, wid = _seq("aaa")
    left, right, c = pair_counts(syms, wid, np.array([5], dtype=np.int64))
    assert left.tolist() == [ord("a")] and right.tolist() == [ord("a")]
    assert c.tolist() == [10]


def test_sym_str_recursive():
    merges = [(ord("a"), ord("b"), 256), (256, ord("c"), 257)]
    assert _sym_str(257, merges) == "abc"
    assert _sym_str(ord("z"), merges) == "z"


@pytest.fixture()
def crafted_corpus(tmp_path):
    # Crafted so that round 1 is a tie broken lexicographically and round 2
    # exercises a same-symbol run under a merged symbol in the corpus:
    #   'abab' x2 -> (a,b)=4 overlapping-free; 'cdcd' x2 -> (c,d)=4 (tie,
    #   (a,b) wins on string order); 'eeee' -> (e,e)=3 overlapping.
    texts = ["abab abab", "cdcd cdcd", "eeee"]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["t"] * len(texts), pa.string()),
        "n_chars": pa.array([len(s) for s in texts], pa.int64()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    return str(tmp_path)


def test_pathological_corpus_matches_oracle(ray_session, tmp_path):
    # NULL / empty / sub-shingle-width texts: the word corpus must follow
    # the UNPADDED norm (the reference '0'-rjust pad would mint phantom
    # '000' words and poison the global pair counts cross-engine).
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([None, "", "ab"], pa.string()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    res = bpe_train_merges(str(tmp_path)).to_pandas()
    assert len(res) == 1  # only 'ab' contributes: one (a,b) merge, then dry
    assert res.loc[0, ["left_sym", "right_sym", "pair_count"]].tolist() \
        == ["a", "b", 1]
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    ora = con.execute(_sql_bpe_train()).fetchdf()
    assert res.astype(str).equals(ora.astype(str))


def test_crafted_corpus_matches_oracle(ray_session, crafted_corpus):
    res = (bpe_train_merges(crafted_corpus).to_pandas()
           .sort_values("merge_round").reset_index(drop=True))
    # round 1: tie (a,b)=4 vs (c,d)=4 -> (a,b); (e,e)=3 overlapping
    assert res.loc[0, ["left_sym", "right_sym", "pair_count"]].tolist() \
        == ["a", "b", 4]
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{crafted_corpus}/documents.parquet')")
    ora = (con.execute(_sql_bpe_train()).fetchdf()
           .sort_values("merge_round").reset_index(drop=True))
    assert res.astype(str).equals(ora.astype(str))
