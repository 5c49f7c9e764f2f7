"""Within-doc repetition signal (`dup_words` query): hand-computed truth +
DuckDB cross-engine parity on edge cases (empty, all-space, tabs,
all-repeats)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import doppel_speller_ray.pipelines.queries as q


class _FakeDS:
    def __init__(self, tbl):
        self.tbl = tbl

    def map_batches(self, fn, batch_format=None):
        return _FakeDS(fn(self.tbl))


def _run(texts):
    t = pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                  "text": pa.array(texts, type=pa.string())})
    orig = q._docs
    q._docs = lambda sf, cols=None: _FakeDS(t.select(cols))
    try:
        out = q.q_dup_words("ignored").tbl.to_pandas()
    finally:
        q._docs = orig
    return t, out.sort_values("doc_id").reset_index(drop=True)


def test_hand_computed():
    _, out = _run(["a b a c a", "", "x", "y y y y", "one two three"])
    assert out["n_tokens"].tolist() == [5, 0, 1, 4, 3]
    assert out["n_distinct"].tolist() == [3, 0, 1, 1, 3]
    assert out["dup_word_ratio"].tolist() == [0.4, 0.0, 0.0, 0.75, 0.0]


def test_duckdb_parity_edges():
    t, out = _run(["a b a c a", "", "   ", "x", "y y y y", "a\tb  a",
                   None, "z " * 500 + "q"])
    con = duckdb.connect()
    con.register("documents", t)
    sql = con.execute(q.ORACLES["dup_words"] + " ORDER BY 1").df()
    pd.testing.assert_frame_equal(out, sql, check_dtype=False)
