"""Hand-case tests for the profile/grouped-sampling/knn-join tier
(queries_profile.py): NULL handling the sf testdata never exercises,
exact k-per-group hash-rank membership, and k-NN self-exclusion with a
planted duplicate vector. SF-dir oracle parity is covered by the
auto-parametrized suite in test_queries_oracle.py."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import doppel_speller_ray.pipelines.queries_profile as qp
from doppel_speller_ray.functions.hashing import fmix32


def _patch_read(t):
    import ray.data as rd

    ds = rd.from_arrow(t)
    orig = qp._read
    qp._read = lambda sf, table, cols=None: ds.select_columns(cols)
    return orig


def test_table_profile_nulls_and_distinct(ray_session):
    t = pa.table({
        "lang": pa.array(["en", "en", None, "de"]),
        "source": pa.array(["a", "a", "a", "a"]),
        "text": pa.array([None, None, "xyz", "ab"]),
    })
    orig = _patch_read(t)
    try:
        out = qp.q_table_profile("x").to_pandas()
    finally:
        qp._read = orig
    out = out.set_index("col")
    assert out.loc["lang", "n_rows"] == 4
    assert out.loc["lang", "n_null"] == 1
    assert out.loc["lang", "n_distinct"] == 2
    assert out.loc["lang", "min_val"] == "de"
    assert out.loc["lang", "max_val"] == "en"
    assert out.loc["lang", "avg_len"] == 2.0       # over non-null only
    assert out.loc["text", "n_null"] == 2
    assert out.loc["text", "n_distinct"] == 2
    assert out.loc["text", "avg_len"] == 2.5       # (3 + 2) / 2
    assert out.loc["source", "n_distinct"] == 1

    # DuckDB parity on the same in-memory table (including the NULL rows)
    con = duckdb.connect()
    con.register("documents", t)
    odf = con.execute(qp.SQL_TABLE_PROFILE).df().set_index("col")
    for c in ("lang", "source", "text"):
        assert out.loc[c, "n_null"] == odf.loc[c, "n_null"]
        assert out.loc[c, "n_distinct"] == odf.loc[c, "n_distinct"]
        assert abs(out.loc[c, "avg_len"] - odf.loc[c, "avg_len"]) < 1e-9


def test_sample_per_group_is_hash_rank_head(ray_session):
    n = 400
    langs = ["en", "de"]
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "lang": pa.array([langs[i % 2] for i in range(n)]),
    })
    orig = _patch_read(t)
    try:
        out = qp.q_sample_per_group("x").to_pandas()
    finally:
        qp._read = orig
    assert (out.groupby("lang").size() == qp._SPG_K).all()
    # membership = the k smallest fmix32(doc_id, seed) per lang, exactly
    hv = fmix32(np.arange(n, dtype=np.uint64), seed=qp._SPG_SEED)
    for li, lang in enumerate(langs):
        ids = np.arange(li, n, 2)
        expect = ids[np.lexsort((ids, hv[ids]))][:qp._SPG_K]
        got = np.sort(out[out["lang"] == lang]["doc_id"].to_numpy())
        assert set(got) == set(expect)


def test_value_quantiles_hand_case(ray_session):
    # type "a": n=5, p50 rank=ceil(2.5)=3 → 2.0 (run 1@1.0, 3@2.0);
    # p90/p99 rank=5 → 100.5. 8.0 sits exactly on a bucket boundary
    # (floor(8/W)=1 with W=8). type "b": constant column.
    t = pa.table({
        "event_type": pa.array(["a"] * 5 + ["b"] * 3),
        "value": pa.array([1.0, 2.0, 2.0, 8.0, 100.5, 7.0, 7.0, 7.0]),
    })
    orig = _patch_read(t)
    try:
        out = qp.q_value_quantiles("x").to_pandas()
    finally:
        qp._read = orig
    out = out.set_index(["event_type", "p"])["q"]
    assert out[("a", 0.5)] == 2.0
    assert out[("a", 0.9)] == 100.5
    assert out[("a", 0.99)] == 100.5
    assert (out.loc["b"] == 7.0).all()

    con = duckdb.connect()
    con.register("events", t)
    odf = con.execute(qp.SQL_VALUE_QUANTILES).df() \
        .set_index(["event_type", "p"])["q"]
    pd.testing.assert_series_equal(out.sort_index(), odf.sort_index(),
                                   check_names=False)


def test_knn_join_excludes_self_keeps_duplicates(ray_session):
    from doppel_speller_ray.stages.embed import knn_join
    import ray.data as rd

    # vec 0 == vec 3 (planted exact duplicate); vec 1 orthogonal-ish.
    vecs = np.array([[1.0, 0.0], [0.0, 1.0], [0.8, 0.6], [1.0, 0.0],
                     [0.6, 0.8]], dtype=np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(5, dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(t)
    out = knn_join(ds, np.array([0]), vecs[:1], k=2).to_pandas() \
        .sort_values("sim", ascending=False).reset_index(drop=True)
    assert len(out) == 2
    assert 0 not in set(out["vec_id"])             # self excluded
    assert out.loc[0, "vec_id"] == 3               # duplicate kept, sim 1.0
    assert abs(out.loc[0, "sim"] - 1.0) < 1e-12
    assert out.loc[1, "vec_id"] == 2               # next best: cos = 0.8
    assert abs(out.loc[1, "sim"] - 0.8) < 1e-6
