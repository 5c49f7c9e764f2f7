"""Hand-computed tests for the distributed logistic-regression trainer
(pipelines/queries_classifier.py). Oracle parity at sf0.01 is covered by
test_queries_oracle.py via the catalog import."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from doppel_speller_ray.pipelines.queries_classifier import (
    _LR_RATE,
    _sql_logreg_train,
    logreg_train,
)


@pytest.fixture()
def tiny_corpus(tmp_path):
    texts = ["one two three", "four five", "six", "seven eight nine ten"]
    langs = ["en", "fr", "en", "de"]
    t = pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    return str(tmp_path), texts, langs


def test_first_iteration_hand_computed(ray_session, tiny_corpus):
    path, texts, langs = tiny_corpus
    res = logreg_train(path).to_pandas().sort_values("iter")
    # w=0 -> sigmoid = 0.5 for every row; grad_j = mean((0.5 - y) * x_j)
    x = np.array([[1.0, len(s.split()) / 100.0, len(s) / 1000.0]
                  for s in texts])
    y = np.array([1.0 if l == "en" else 0.0 for l in langs])
    grad = ((0.5 - y)[:, None] * x).mean(axis=0)
    w1 = np.floor((-_LR_RATE * grad) * 1e6 + 0.5) / 1e6
    got = res.iloc[0][["w0", "w1", "w2"]].to_numpy(dtype=float)
    np.testing.assert_allclose(got, w1, rtol=0, atol=0)


def test_tiny_corpus_matches_oracle(ray_session, tiny_corpus):
    path, _, _ = tiny_corpus
    res = (logreg_train(path).to_pandas()
           .sort_values("iter").reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{path}/documents.parquet')")
    ora = (con.execute(_sql_logreg_train()).fetchdf()
           .sort_values("iter").reset_index(drop=True))
    assert res.equals(ora)


def test_pathological_corpus(ray_session, tmp_path):
    # NULL / empty texts: features follow the UNPADDED norm (f1=f2=0,
    # bias still present), weights stay finite and match the oracle.
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([None, "", "ab cd"], pa.string()),
        "lang": pa.array(["en", "fr", "en"], pa.string()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    res = (logreg_train(str(tmp_path)).to_pandas()
           .sort_values("iter").reset_index(drop=True))
    assert np.isfinite(res[["w0", "w1", "w2"]].to_numpy()).all()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    ora = (con.execute(_sql_logreg_train()).fetchdf()
           .sort_values("iter").reset_index(drop=True))
    assert res.equals(ora)
