"""URL canonicalization (`functions/urls.py`): spec unit tests + DuckDB
cross-engine parity (both RE2), incl. the messy-url construction used by
the `url_canon` oracle query."""

import duckdb
import numpy as np
import pyarrow as pa

from doppel_speller_ray.functions.urls import canon_url_array, sql_canon_url

CASES = {
    # scheme+host lowered, default port dropped, www dropped, frag dropped
    "HTTP://WWW.Example.COM:80/Path/To?B=2&a=1#Frag":
        "http://example.com/Path/To?B=2&a=1",
    # https default port; trailing slash
    "https://Sub.Site.org:443/": "https://sub.site.org",
    # non-default port preserved
    "http://site.com:8080/x/": "http://site.com:8080/x",
    # multiple trailing slashes
    "HTTPS://WWW.A.COM/deep/path///": "https://a.com/deep/path",
    # non-http scheme: host still lowered, no port/www rules apply
    "ftp://Files.Example.com/Dir/": "ftp://files.example.com/Dir",
    # schemeless passthrough
    "no-scheme-string": "no-scheme-string",
    # empty query after frag strip
    "http://a.com?": "http://a.com",
    "http://a.com#only-frag": "http://a.com",
    # path/query case preserved
    "HtTpS://WwW.MiXeD.De:443/KeepCase/Q?x=Y": "https://mixed.de/KeepCase/Q?x=Y",
    # :80 on https is NOT a default port
    "https://b.com:80/x": "https://b.com:80/x",
    # www on a bare host
    "http://www.c.com": "http://c.com",
}


def test_canon_spec():
    got = canon_url_array(pa.array(list(CASES))).to_pylist()
    assert got == list(CASES.values())


def test_canon_null_and_empty():
    got = canon_url_array(pa.array([None, ""], type=pa.string())).to_pylist()
    assert got == [None, ""]


def test_duckdb_parity():
    arr = pa.array(list(CASES))
    ray_side = canon_url_array(arr).to_pylist()
    con = duckdb.connect()
    con.register("t", pa.table({"u": arr, "i": pa.array(range(len(CASES)))}))
    sql_side = [r[0] for r in con.execute(
        f"SELECT {sql_canon_url('u')} FROM t ORDER BY i").fetchall()]
    assert sql_side == ray_side


def test_oracle_query_construction_parity():
    """_messy_url (Ray side) and the SQL CASE construction build identical
    strings, and canon agrees end-to-end — the `url_canon` CORRECTNESS
    entry in miniature."""
    import doppel_speller_ray.pipelines.queries as q

    ids = np.arange(0, 530, dtype=np.int64)  # covers all %53/%5/%3/%2 combos
    ray_side = canon_url_array(
        pa.array([q._messy_url(int(i)) for i in ids])).to_pylist()
    con = duckdb.connect()
    con.register("documents", pa.table({"doc_id": pa.array(ids)}))
    rows = con.execute(q.ORACLES["url_canon"] + " ORDER BY doc_id").fetchall()
    assert [r[1] for r in rows] == ray_side
