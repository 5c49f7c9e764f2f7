"""Stratified hash sampling + per-lang heavy hitters: determinism,
stratum-fraction sanity, tie-break, DuckDB parity."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import doppel_speller_ray.pipelines.queries as q


def _tbl(n=4000, langs=("en", "de", "fr", "zh")):
    rng = np.random.default_rng(3)
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "lang": pa.array([langs[i % len(langs)] for i in range(n)]),
        "text": pa.array([" ".join(rng.choice(["aa", "bb", "cc", "dd"],
                                              size=6)) for _ in range(n)]),
    })


def _patch(t):
    import ray.data as rd

    ds = rd.from_arrow(t)
    orig = q._docs
    q._docs = lambda sf, cols=None: ds.select_columns(cols)
    return orig


def test_stratified_fractions_and_determinism(ray_session):
    t = _tbl()
    orig = _patch(t)
    try:
        a = q.QUERIES["stratified_sample"]("x").to_pandas()
        b = q.QUERIES["stratified_sample"]("x").to_pandas()
    finally:
        q._docs = orig
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True))
    rates = a.groupby("lang").size() / 1000  # 1000 docs per lang
    assert "zh" not in rates.index                   # fraction 0
    assert abs(rates["en"] - 0.10) < 0.04
    assert abs(rates["de"] - 0.50) < 0.06
    assert rates["fr"] == 1.0                        # fraction 1 keeps all


def test_stratified_duckdb_parity(ray_session):
    t = _tbl(n=1500)
    orig = _patch(t)
    try:
        rdf = q.QUERIES["stratified_sample"]("x").to_pandas()
    finally:
        q._docs = orig
    con = duckdb.connect()
    con.register("documents", t)
    sdf = con.execute(q.ORACLES["stratified_sample"]).df()
    c = lambda d: d[sorted(d.columns)].sort_values(sorted(d.columns)) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(c(rdf), c(sdf), check_dtype=False)


def test_top_words_tiebreak_and_parity(ray_session):
    # "bb" and "cc" tie on count in lang en -> word-ASC order decides
    t = pa.table({
        "doc_id": pa.array(np.arange(6, dtype=np.int64)),
        "lang": pa.array(["en", "en", "en", "de", "de", "de"]),
        "text": pa.array(["aa aa aa bb cc", "bb cc dd", "ee",
                          "xx xx", "yy", "zz yy"]),
    })
    orig = _patch(t)
    try:
        rdf = q.QUERIES["top_words_per_lang"]("x").to_pandas()
    finally:
        q._docs = orig
    en = rdf[rdf.lang == "en"].sort_values(["cnt", "word"],
                                           ascending=[False, True])
    assert en.iloc[0].word == "aa" and en.iloc[0].cnt == 3
    # bb/cc tie at 2 -> bb before cc
    assert en.iloc[1].word == "bb" and en.iloc[2].word == "cc"
    con = duckdb.connect()
    con.register("documents", t)
    sdf = con.execute(q.ORACLES["top_words_per_lang"]).df()
    c = lambda d: d[sorted(d.columns)].sort_values(sorted(d.columns)) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(c(rdf), c(sdf), check_dtype=False)
