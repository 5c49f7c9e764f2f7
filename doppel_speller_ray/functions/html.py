"""Deterministic HTML → text extraction (vectorized RE2, SQL-replicable).

The BASELINE input_hint's pages table carries both ``html:binary`` and the
already-extracted ``text:string``; the reference engine has no HTML stage at
all (doppel-speller operates on CSV titles — ``common.py:50-72`` starts from
text), so the per-url byte-identity invariant is defined on the ``text``
column and :func:`..stages.prepare.prepare_pages_batch` defaults to the
identity. This module adds the REAL extraction path for raw-html corpora:
a fixed, documented spec implemented twice — once as a chain of
``pyarrow.compute`` kernels (RE2) for the Dataset hot path, once as the
byte-identical DuckDB SQL expression (also RE2) for the correctness oracle
(`extract_text` in CORRECTNESS). Both engines share the exact pattern
strings below, which is what makes the extraction itself hash-oracle-able.

Extraction spec, applied in order to the UTF-8-decoded html:
  1. strip comments           ``(?s)<!--.*?-->``            → ``' '``
  2. strip script blocks      ``(?is)<script\\b[^>]*>.*?</script>`` → ``' '``
  3. strip style blocks       ``(?is)<style\\b[^>]*>.*?</style>``   → ``' '``
  4. strip remaining tags     ``(?s)<[^>]*>``               → ``' '``
  5. decode the common named entities (``&lt; &gt; &quot; &#39; &nbsp;``,
     then ``&amp;`` LAST so ``&amp;lt;`` decodes to the literal ``&lt;``)
  6. collapse whitespace runs ``\\s+`` → single ASCII space; trim ASCII
     spaces only (RE2 ``\\s`` is ASCII, so trimming stays ASCII for parity).

Closed-form invariant (pytest ``tests/test_html_extract.py``):
``extract(wrap(escape(text))) == collapse_ws(text)`` for any text — the
escape/wrap pair is what :mod:`..sources.fixtures` uses to synthesize page
html, so fixture pages round-trip byte-identically.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Shared pattern strings — the single source of truth for BOTH engines.
_STRIP_PATTERNS: tuple[str, ...] = (
    r"(?s)<!--.*?-->",
    r"(?is)<script\b[^>]*>.*?</script>",
    r"(?is)<style\b[^>]*>.*?</style>",
    r"(?s)<[^>]*>",
)
# Plain substring replaces (order matters: &amp; last).
_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)
_WS = r"\s+"


def decode_utf8_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """binary → string, UTF-8 with per-row ``errors='replace'`` fallback.

    The fast path is a zero-copy view cast (valid UTF-8, the common case for
    crawled pages post-WARC); only a batch that actually contains invalid
    bytes pays the per-row python decode.
    """
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        return arr
    try:
        return arr.cast(pa.string())
    except pa.ArrowInvalid:
        py = [None if (b := v.as_py()) is None else b.decode("utf-8", "replace")
              for v in (arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr)]
        return pa.array(py, type=pa.string())


def extract_text_array(html: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Vectorized extraction per the module spec. Accepts binary or string."""
    s = decode_utf8_array(html)
    for pat in _STRIP_PATTERNS:
        s = pc.replace_substring_regex(s, pattern=pat, replacement=" ")
    for ent, ch in _ENTITIES:
        s = pc.replace_substring(s, pattern=ent, replacement=ch)
    s = pc.replace_substring_regex(s, pattern=_WS, replacement=" ")
    return pc.utf8_trim(s, characters=" ")


#: anchor-href split token shared by the Arrow extractor and the SQL
#: oracle's ``regexp_extract_all(html, '<a href="([^"]+)"', 1)``
_HREF_OPEN = '<a href="'


def extract_links_flat(html: pa.Array | pa.ChunkedArray):
    """Vectorized href extraction: ``(urls, doc_idx)`` — one output row per
    ``<a href="...">`` occurrence, in document order.

    No per-row Python: ``split_pattern`` on the literal ``<a href="`` turns
    each page into a list whose elements 1..n-1 each START with an href
    value; the list is flattened through its offsets buffer, each list's
    element 0 (the pre-link prefix) is masked out, and one RE2
    ``extract_regex`` takes the leading run up to the closing quote.
    ``doc_idx`` indexes back into the input batch (np.repeat over list
    lengths), so callers can attach any per-page column to the flat edges.
    """
    import numpy as np

    s = decode_utf8_array(html)
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    parts = pc.split_pattern(s, pattern=_HREF_OPEN)
    offsets = np.asarray(parts.offsets)
    lens = np.diff(offsets)
    keep = np.ones(len(parts.values), dtype=bool)
    keep[offsets[:-1][lens > 0]] = False  # drop each list's first element
    doc_idx = np.repeat(np.arange(len(s), dtype=np.int64), lens)[keep]
    frags = parts.values.filter(pa.array(keep))
    urls = pc.struct_field(
        pc.extract_regex(frags, pattern='^(?P<u>[^"]*)'), "u")
    return urls, doc_idx


def extract_anchors_flat(html: pa.Array | pa.ChunkedArray):
    """Vectorized ``(urls, texts, doc_idx)`` — one row per complete
    ``<a href="URL">TEXT</a>`` occurrence (TEXT up to the first ``<``), in
    document order. Same split-on-literal + one-RE2 shape as
    :func:`extract_links_flat`; fragments without a well-formed
    ``">TEXT<`` tail (unclosed anchors) are dropped, so the two kernels
    can disagree on malformed HTML by design."""
    import numpy as np

    s = decode_utf8_array(html)
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    parts = pc.split_pattern(s, pattern=_HREF_OPEN)
    offsets = np.asarray(parts.offsets)
    lens = np.diff(offsets)
    keep = np.ones(len(parts.values), dtype=bool)
    keep[offsets[:-1][lens > 0]] = False
    doc_idx = np.repeat(np.arange(len(s), dtype=np.int64), lens)[keep]
    frags = parts.values.filter(pa.array(keep))
    m = pc.extract_regex(frags, pattern='^(?P<u>[^"]*)">(?P<t>[^<]*)<')
    ok = pc.is_valid(m).to_numpy(zero_copy_only=False)
    urls = pc.struct_field(m, "u").filter(pa.array(ok))
    texts = pc.struct_field(m, "t").filter(pa.array(ok))
    return urls, texts, doc_idx[ok]


def collapse_ws_array(text: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """``\\s+`` → single space + ASCII-space trim (steps 6 only) — the
    expected value of ``extract(wrap(escape(text)))``."""
    s = pc.replace_substring_regex(text, pattern=_WS, replacement=" ")
    return pc.utf8_trim(s, characters=" ")


def escape_html_array(text: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Minimal escaping (``&`` FIRST, then ``<``, ``>``) so arbitrary text
    embeds into element content without forming tags/entities."""
    s = pc.replace_substring(text, pattern="&", replacement="&amp;")
    s = pc.replace_substring(s, pattern="<", replacement="&lt;")
    return pc.replace_substring(s, pattern=">", replacement="&gt;")


def wrap_html_array(escaped: pa.Array | pa.ChunkedArray,
                    ids: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Deterministic page boilerplate around escaped body text (comment +
    style + script blocks the extractor must strip), id-salted so no two
    pages share identical non-body bytes."""
    idstr = pc.cast(ids, pa.string())
    parts = [
        pa.scalar("<html><!-- page "), idstr,
        pa.scalar(" --><head><style>p{margin:0}</style>"
                  "<script type=\"text/javascript\">var n="), idstr,
        pa.scalar(";</script></head><body>\n<p class=\"c\">"), escaped,
        pa.scalar("</p>\n</body></html>"),
    ]
    return pc.binary_join_element_wise(*parts)


def sql_extract_text(expr: str) -> str:
    """The extraction spec as a DuckDB SQL expression over ``expr`` — the
    same RE2 patterns, globally applied, entities via plain replace()."""
    s = expr
    for pat in _STRIP_PATTERNS:
        s = f"regexp_replace({s}, '{_sql_lit(pat)}', ' ', 'g')"
    for ent, ch in _ENTITIES:
        s = f"replace({s}, '{_sql_lit(ent)}', '{_sql_lit(ch)}')"
    s = f"regexp_replace({s}, '{_sql_lit(_WS)}', ' ', 'g')"
    return f"trim({s}, ' ')"


def sql_escape_wrap(text_expr: str, id_expr: str) -> str:
    """SQL twin of ``wrap_html_array(escape_html_array(text), ids)``."""
    esc = (f"replace(replace(replace({text_expr}, '&', '&amp;'),"
           f" '<', '&lt;'), '>', '&gt;')")
    return ("'<html><!-- page ' || " + id_expr + "::VARCHAR || "
            "' --><head><style>p{margin:0}</style>"
            "<script type=\"text/javascript\">var n=' || "
            + id_expr + "::VARCHAR || "
            "';</script></head><body>' || chr(10) || '<p class=\"c\">' || "
            + esc + " || '</p>' || chr(10) || '</body></html>'")


def _sql_lit(s: str) -> str:
    return s.replace("'", "''")
