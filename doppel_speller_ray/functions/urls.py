"""Deterministic URL canonicalization (vectorized RE2, SQL-replicable).

Web-scale dedup keys on the url (the input_hint's pages table is keyed by
``url``; `stages/prepare.py:url_to_doc_id` hashes it into doc_id), so two
captures of the same page must first agree on the url string. The reference
has no URL stage (CSV titles only), so — like `functions/html.py` — the
spec is this engine's own, implemented twice: a ``pyarrow.compute`` RE2
chain for the Dataset hot path and the byte-identical DuckDB SQL
(`url_canon` in CORRECTNESS compares the two engines end-to-end).

Canonicalization spec, applied in order:
  1. drop the fragment              ``#.*$``  (and a now-trailing ``?``)
  2. lowercase scheme + authority   (the ``scheme://host[:port]`` prefix
     only — path/query case is significant and preserved)
  3. drop default ports             ``:80`` for http, ``:443`` for https
  4. drop a leading ``www.``        (after lowering, ``^https?://www.``)
  5. drop trailing slashes          ``/+$``

No query-parameter reordering: RE2 (shared by both engines) has no
per-match sort, and reordering is unsafe canonicalization in general
(server semantics may be order-dependent).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_FRAG = r"(?s)#.*$"
_EMPTY_QUERY = r"\?$"
_PREFIX = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*"
_PORT_HTTP = (r"^(http://[^/?#:]*):80([/?#].*)?$", r"\1\2")
_PORT_HTTPS = (r"^(https://[^/?#:]*):443([/?#].*)?$", r"\1\2")
_WWW = (r"^(https?://)www\.", r"\1")
_TRAIL = r"/+$"


def canon_url_array(urls: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Vectorized canonicalization per the module spec."""
    s = pc.replace_substring_regex(urls, pattern=_FRAG, replacement="")
    s = pc.replace_substring_regex(s, pattern=_EMPTY_QUERY, replacement="")
    # Lowercase only the scheme://authority prefix; non-matching rows
    # (schemeless strings) pass through unchanged.
    parts = pc.extract_regex(
        s, pattern=r"(?s)^(?P<p>[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)(?P<r>.*)$")
    lowered = pc.binary_join_element_wise(
        pc.utf8_lower(pc.struct_field(parts, "p")), pc.struct_field(parts, "r"),
        "")
    s = pc.if_else(pc.is_valid(parts), lowered, s)
    for pat, rew in (_PORT_HTTP, _PORT_HTTPS, _WWW):
        s = pc.replace_substring_regex(s, pattern=pat, replacement=rew)
    return pc.replace_substring_regex(s, pattern=_TRAIL, replacement="")


def sql_canon_url(expr: str) -> str:
    """The same spec as a DuckDB SQL expression over ``expr``."""
    s = f"regexp_replace({expr}, '{_sql(_FRAG)}', '')"
    s = f"regexp_replace({s}, '{_sql(_EMPTY_QUERY)}', '')"
    # prefix-lowering: lower(extracted prefix) || remainder; schemeless
    # strings extract '' and strip nothing, so they pass through.
    s = (f"lower(regexp_extract({s}, '{_sql(_PREFIX)}')) || "
         f"regexp_replace({s}, '{_sql(_PREFIX)}', '')")
    for pat, rew in (_PORT_HTTP, _PORT_HTTPS, _WWW):
        s = f"regexp_replace(({s}), '{_sql(pat)}', '{_sql(rew)}')"
    return f"regexp_replace(({s}), '{_sql(_TRAIL)}', '')"


def _sql(x: str) -> str:
    return x.replace("'", "''")
