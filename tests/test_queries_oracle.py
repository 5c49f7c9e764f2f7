"""Driver-harness rehearsal: every queries() entry with an oracle must match
DuckDB on the same parquet tables (row count + order-insensitive values),
mirroring the driver's CORRECTNESS gate at sf=0.01."""

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def catalog(ray_session):
    import __ray_entry__ as e

    return e.queries(), e.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


from doppel_speller_ray.pipelines.queries import ORACLES as _ORACLES

ORACLED = sorted(_ORACLES)


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(catalog, con, name):
    queries, oracles = catalog
    assert name in queries and name in oracles
    ray_df = _canon(_to_pandas(queries[name](SF_DIR)))
    sql_df = _canon(con.execute(oracles[name]).df())
    assert list(ray_df.columns) == list(sql_df.columns), (
        f"{name}: columns {list(ray_df.columns)} != {list(sql_df.columns)}")
    assert len(ray_df) == len(sql_df), f"{name}: rows {len(ray_df)} != {len(sql_df)}"
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False,
                                  check_exact=False, rtol=1e-6, atol=1e-9)


def test_rows_only_queries_run(catalog):
    queries, oracles = catalog
    for name in sorted(set(queries) - set(oracles)):
        df = _to_pandas(queries[name](SF_DIR))
        assert len(df) > 0, name


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    df = _to_pandas(e.entry())
    assert len(df) == 500
    assert sorted(df.columns) == ["cluster_id", "doc_id"]
