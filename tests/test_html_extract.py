"""HTML → text extraction (`functions/html.py`): spec unit tests,
closed-form escape→wrap→extract invariant, DuckDB cross-engine parity,
and the pages-path wiring (`prepare_pages_batch(text_from_html=True)`)."""

import duckdb
import numpy as np
import pyarrow as pa

from doppel_speller_ray.functions.html import (
    collapse_ws_array,
    decode_utf8_array,
    escape_html_array,
    extract_text_array,
    sql_escape_wrap,
    sql_extract_text,
    wrap_html_array,
)

TRICKY = [
    "Hello  world",
    "a & b < c > d",
    "tabs\tand\nnewlines \r\n here",
    "literal &amp;lt; stays an entity ref",
    "<script>alert('x')</script> embedded as text",
    "",
    "   leading and trailing   ",
    "unicode café — dash",
    "5 < 6 && 7 > 2",
]


def _x(html_strs):
    return extract_text_array(pa.array(html_strs)).to_pylist()


def test_strip_tags_and_blocks():
    assert _x(["<p>one</p><div>two</div>"]) == ["one two"]
    assert _x(["a<script src='x.js'>\nvar y = '<p>';\n</script>b"]) == ["a b"]
    assert _x(["a<style>p { color: red }</style>b"]) == ["a b"]
    assert _x(["a<!-- hidden <p>not text</p> -->b"]) == ["a b"]
    # case-insensitive + multiline blocks
    assert _x(["x<SCRIPT TYPE='a'>1\n2\n3</SCRIPT>y"]) == ["x y"]


def test_entities_decode_amp_last():
    assert _x(["&lt;tag&gt; &quot;q&quot; &#39;a&#39; n&nbsp;b &amp; end"]) \
        == ['<tag> "q" \'a\' n b & end']
    # &amp;lt; must yield the literal entity ref, not '<'
    assert _x(["&amp;lt;"]) == ["&lt;"]


def test_whitespace_collapse_and_trim():
    assert _x(["  a \t\n b  "]) == ["a b"]
    assert _x(["<p>\n  x\n</p>\n"]) == ["x"]


def test_binary_input_invalid_utf8_falls_back():
    arr = pa.array([b"<p>ok</p>", b"<p>bad \xff byte</p>", None],
                   type=pa.binary())
    out = extract_text_array(arr).to_pylist()
    assert out[0] == "ok"
    assert out[1] == "bad � byte"
    assert out[2] is None
    # valid-only binary takes the zero-copy cast path
    assert decode_utf8_array(pa.array([b"abc"], pa.binary())).to_pylist() == ["abc"]


def test_escape_wrap_extract_invariant():
    """extract(wrap(escape(t))) == collapse_ws(t) for arbitrary text."""
    text = pa.array(TRICKY)
    ids = pa.array(np.arange(len(TRICKY), dtype=np.int64))
    got = extract_text_array(wrap_html_array(escape_html_array(text), ids))
    assert got.to_pylist() == collapse_ws_array(text).to_pylist()


def test_duckdb_parity_full_spec():
    """Both construction and extraction replicated in DuckDB (RE2 on both
    sides) — byte-identical output, same check the driver's oracle runs."""
    t = pa.table({"doc_id": pa.array(np.arange(len(TRICKY), dtype=np.int64)),
                  "text": pa.array(TRICKY)})
    html = wrap_html_array(escape_html_array(t["text"]), t["doc_id"])
    ray_side = extract_text_array(html).to_pylist()
    con = duckdb.connect()
    con.register("documents", t)
    sql = (f"SELECT {sql_extract_text(sql_escape_wrap('text', 'doc_id'))} "
           "AS e FROM documents ORDER BY doc_id")
    assert [r[0] for r in con.execute(sql).fetchall()] == ray_side


def test_prepare_pages_text_from_html(ray_session):
    """The pages ingest path re-extracting from raw html produces the same
    docs table as the identity path (fixture html is escape+wrap of text,
    whose texts contain no whitespace runs)."""
    import ray.data as rd

    from doppel_speller_ray.config import DedupConfig
    from doppel_speller_ray.sources.fixtures import make_pages
    from doppel_speller_ray.stages.prepare import prepare_pages_batch

    pages, _ = make_pages(n_clusters=6, n_singletons=20, seed=7)
    cfg = DedupConfig(max_chars=None)
    ds = rd.from_arrow(pages)
    ident = ds.map_batches(
        lambda b: prepare_pages_batch(b, cfg=cfg), batch_format="pyarrow"
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    rex = ds.map_batches(
        lambda b: prepare_pages_batch(b, cfg=cfg, text_from_html=True),
        batch_format="pyarrow",
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert ident.equals(rex)
