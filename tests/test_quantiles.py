"""Exact distributed quantiles (`length_quantiles`): hand-computed
nearest-rank truth + DuckDB parity on tie-heavy and tiny inputs."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import doppel_speller_ray.pipelines.queries as q


def _run(n_chars, ray_session, ps=(0.5, 0.9, 0.99)):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array(np.arange(len(n_chars), dtype=np.int64)),
                  "n_chars": pa.array(n_chars, pa.int64())})
    ds = rd.from_arrow(t)
    orig = q._docs
    q._docs = lambda sf, cols=None: ds.select_columns(cols)
    try:
        out = q.QUERIES["length_quantiles"]("ignored", ps=ps).to_pandas()
    finally:
        q._docs = orig
    return t, out.sort_values("p").reset_index(drop=True)


def test_hand_computed(ray_session):
    # n=10, values 1..10: ceil(.5*10)=5 -> 5; ceil(.9*10)=9 -> 9; ceil(.99*10)=10 -> 10
    _, out = _run(list(range(1, 11)), None)
    assert out["q"].tolist() == [5, 9, 10]


def test_ties_and_single_value(ray_session):
    _, out = _run([7] * 100, None)
    assert out["q"].tolist() == [7, 7, 7]
    # heavy ties: 90x value 1, 10x value 100 -> p50=1, p90=1 (rank 90), p99=100
    _, out = _run([1] * 90 + [100] * 10, None)
    assert out["q"].tolist() == [1, 1, 100]


def test_duckdb_parity(ray_session):
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 50, size=777).tolist()
    t, out = _run(vals, None)
    con = duckdb.connect()
    con.register("documents", t)
    sdf = con.execute(q.ORACLES["length_quantiles"]).df() \
        .sort_values("p").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, sdf[out.columns], check_dtype=False)


def test_quantiles_by_lang_hand_case(ray_session, tmp_path):
    """Two langs with hand-computable nearest-rank quartiles."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from doppel_speller_ray.pipelines.queries import q_quantiles_by_lang

    tbl = pa.table({
        "lang": pa.array(["en"] * 4 + ["de"] * 3),
        "n_chars": pa.array([10, 20, 30, 40, 5, 6, 7], pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = q_quantiles_by_lang(str(tmp_path), ps=(0.5, 0.75)).to_pandas()
    got = {(r.lang, r.p): r.q for r in out.itertuples()}
    # en n=4: rank ceil(.5*4)=2 → 20; ceil(.75*4)=3 → 30
    assert got[("en", 0.5)] == 20 and got[("en", 0.75)] == 30
    # de n=3: rank ceil(1.5)=2 → 6; ceil(2.25)=3 → 7
    assert got[("de", 0.5)] == 6 and got[("de", 0.75)] == 7
