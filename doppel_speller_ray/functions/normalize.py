"""Text normalization with byte-parity to the reference.

``transform_text`` reproduces the reference's ``transform_title``
(``/root/reference/doppelspeller/common.py:20-47``) exactly, step by step:

    NFD unicode normalize → drop non-ascii (encode 'ascii','ignore') → lower
    → '-' → ' ' → keep only [a-zA-Z0-9\\s] → collapse runs of SPACES (only
    ' +', not all whitespace — reference regex common.py:16) → strip →
    truncate to `max_chars` then strip → if the PRE-truncation length was
    < n_grams, right-justify-pad with '0' to n_grams chars.

``normalize_array`` is the vectorized Arrow path used in the hot pipeline:
all-ascii rows go through pyarrow.compute kernels (C++, zero Python per row);
rows containing non-ascii fall back to the per-row parity function. Parity of
the two paths is property-tested (tests/test_normalize.py).
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Reference regexes (common.py:16-17)
_SUBSTITUTE_REGEX = re.compile(r" +")
_KEEP_REGEX = re.compile(r"[a-zA-Z0-9\s]")

# Python's str \s (for ascii input, which is all that survives the ascii
# encode) = [ \t\n\r\f\v\x1c\x1d\x1e\x1f].  RE2 (pyarrow) \s is narrower, so
# the vectorized path spells the class out explicitly.
_ASCII_WS = " \t\n\r\f\x0b\x1c\x1d\x1e\x1f"
_RE2_DROP_CLASS = r"[^a-zA-Z0-9 \t\n\r\f\v\x1c\x1d\x1e\x1f]"


def transform_text(title: str, max_chars: int | None = 255, n_grams: int = 3) -> str:
    """Per-row reference-parity normalizer (common.py:20-47)."""
    text = unicodedata.normalize("NFD", title)
    text = text.encode("ascii", "ignore").decode("utf-8").lower().replace("-", " ")
    text = "".join(_KEEP_REGEX.findall(text))
    text = _SUBSTITUTE_REGEX.sub(" ", text).strip()
    number_of_characters = len(text)
    if max_chars is not None:
        text = text[:max_chars].strip()
    if number_of_characters < n_grams:
        return text.rjust(n_grams, "0")
    return text


def normalize_array(
    strings: pa.Array | pa.ChunkedArray | list,
    max_chars: int | None = 255,
    n_grams: int = 3,
) -> pa.Array:
    """Vectorized normalizer over a pyarrow string array.

    All-ascii rows use pyarrow.compute (vectorized C++); non-ascii rows use
    the per-row parity function. Output is byte-identical to
    ``transform_text`` for every row.
    """
    if isinstance(strings, (list, tuple)):
        strings = pa.array(strings, type=pa.string())
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if pa.types.is_large_string(strings.type):
        strings = strings.cast(pa.string())
    n = len(strings)
    if n == 0:
        return pa.array([], type=pa.string())

    if strings.null_count:
        strings = pc.fill_null(strings, "")

    is_ascii = pc.string_is_ascii(strings)
    all_ascii = bool(pc.all(is_ascii).as_py()) if n else True

    if all_ascii:
        return _normalize_ascii_vec(strings, max_chars, n_grams)

    # Mixed batch: vectorize the ascii majority, per-row the rest.
    ascii_mask = np.asarray(is_ascii)
    out = np.empty(n, dtype=object)
    ascii_idx = np.nonzero(ascii_mask)[0]
    other_idx = np.nonzero(~ascii_mask)[0]
    if len(ascii_idx):
        sub = _normalize_ascii_vec(strings.take(pa.array(ascii_idx)), max_chars, n_grams)
        out[ascii_idx] = sub.to_numpy(zero_copy_only=False)
    for j in other_idx:
        out[j] = transform_text(strings[int(j)].as_py(), max_chars, n_grams)
    return pa.array(out.tolist(), type=pa.string())


def _normalize_ascii_vec(arr: pa.Array, max_chars: int | None, n_grams: int) -> pa.Array:
    """The pure-arrow kernel chain for ascii-only input."""
    x = pc.ascii_lower(arr)
    x = pc.replace_substring(x, pattern="-", replacement=" ")
    x = pc.replace_substring_regex(x, pattern=_RE2_DROP_CLASS, replacement="")
    x = pc.replace_substring_regex(x, pattern=" +", replacement=" ")
    x = pc.utf8_trim(x, characters=_ASCII_WS)
    pre_len = pc.utf8_length(x)
    if max_chars is not None:
        x = pc.utf8_slice_codeunits(x, start=0, stop=max_chars)
        x = pc.utf8_trim(x, characters=_ASCII_WS)
    short = pc.less(pre_len, n_grams)
    if bool(pc.any(short).as_py()):
        padded = pc.utf8_lpad(x, width=n_grams, padding="0")
        x = pc.if_else(short, padded, x)
    return x


def tokenize_counts(norm: pa.Array | pa.ChunkedArray) -> tuple[pa.Array, pa.Array]:
    """(n_words, n_chars) columns from normalized text — vectorized.

    Word split semantics match ``str.split()`` on the normalized text
    (reference common.py:66-67): split on whitespace runs, no empties.
    """
    if isinstance(norm, pa.ChunkedArray):
        norm = norm.combine_chunks()
    words = pc.split_pattern_regex(norm, pattern=r"[ \t\n\r\f\v\x1c\x1d\x1e\x1f]+")
    # splitting " a b" yields leading/trailing "" — count non-empty elements
    # per row via a cumulative sum over the flattened mask indexed at offsets
    nonempty = np.asarray(pc.not_equal(pc.list_flatten(words), "")).astype(np.int64)
    lens = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    csum = np.concatenate([[0], np.cumsum(nonempty)])
    n_words = csum[offsets[1:]] - csum[offsets[:-1]]
    n_chars = pc.utf8_length(norm)
    return pa.array(n_words, type=pa.int64()), n_chars
