"""Character n-gram shingling, vectorized.

The reference builds Python ``set``s of length-3 character substrings per
title (``/root/reference/doppelspeller/common.py:150-151``). Columnar
equivalent: per row, the **sorted unique** array of n-gram codes as a
``list<uint64>`` — sorted+deduped at creation so set semantics (intersection,
Jaccard) are preserved with vectorized array ops downstream.

For n ≤ 8 over normalized (ascii-only) text the n-gram is packed *exactly*
into a uint64 (no hash collisions): code = big-endian byte pack. For larger n
a seeded polynomial rolling hash is used.

The whole batch is processed on the flat Arrow string buffer: O(n) numpy
passes over the concatenated bytes, then one `np.unique` per row (C sort).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import _POLY, _string_buffers, splitmix64


def shingle_flat(
    data: np.ndarray, offsets: np.ndarray, n: int, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Shingle byte rows → (flat unique codes, out_offsets).

    Rows shorter than n yield zero shingles (matches reference set() of no
    substrings of length n — note the reference pads short titles to length
    n upstream, so this only happens for unpadded input).
    """
    n_rows = len(offsets) - 1
    lens = offsets[1:] - offsets[:-1]
    counts = np.maximum(lens - (n - 1), 0)

    if len(data) < n or n_rows == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(n_rows + 1, dtype=np.int64)

    # codes for every window position in the flat buffer
    m = len(data) - (n - 1)
    if n <= 8:
        codes = np.zeros(m, dtype=np.uint64)
        for i in range(n):
            codes = (codes << np.uint64(8)) | data[i: m + i].astype(np.uint64)
    else:
        codes = np.zeros(m, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i in range(n):
                codes = codes * _POLY + data[i: m + i].astype(np.uint64)
            codes = splitmix64(codes ^ np.uint64(seed & 0xFFFFFFFFFFFFFFFF))

    out_values: list[np.ndarray] = []
    out_offsets = np.zeros(n_rows + 1, dtype=np.int64)
    total = 0
    for j in range(n_rows):
        c = counts[j]
        if c > 0:
            u = np.unique(codes[offsets[j]: offsets[j] + c])
            out_values.append(u)
            total += len(u)
        out_offsets[j + 1] = total
    flat = np.concatenate(out_values) if out_values else np.empty(0, dtype=np.uint64)
    return flat, out_offsets


def shingle_array(
    strings: pa.Array | pa.ChunkedArray | list, n: int = 3, seed: int = 0
) -> pa.ListArray:
    """Shingle a pyarrow string array → list<uint64> of sorted unique codes."""
    if isinstance(strings, (list, tuple)):
        strings = pa.array(strings, type=pa.string())
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if pa.types.is_large_string(strings.type):
        strings = strings.cast(pa.string())
    data, offsets = _string_buffers(strings)
    flat, out_offsets = shingle_flat(data, offsets, n, seed)
    return pa.ListArray.from_arrays(
        pa.array(out_offsets, type=pa.int32()), pa.array(flat, type=pa.uint64())
    )


def list_column_flat(col: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (flat values, offsets) view of a list<uint64> column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_large_list(col.type):
        col = col.cast(pa.list_(col.type.value_type))
    offsets = np.asarray(col.offsets, dtype=np.int64)
    values = np.asarray(col.values, dtype=np.uint64)
    return values, offsets


def lists_to_binary(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """list<uint64> column → binary column (8 bytes per element).

    Arrow's acero hash join rejects list-typed payload columns; a binary blob
    of the little-endian uint64s carries the same data through the join and
    is decoded back with :func:`binary_to_flat` (no per-row Python).
    """
    values, offsets = list_column_flat(col)
    boff = (offsets * 8).astype(np.int32)
    return pa.Array.from_buffers(
        pa.binary(), len(offsets) - 1,
        [None, pa.py_buffer(boff.tobytes()), pa.py_buffer(values.tobytes())],
    )


def binary_to_flat(col: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """binary column of packed uint64s → (flat values, element offsets)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_large_binary(col.type):
        col = col.cast(pa.binary())
    buffers = col.buffers()
    raw = np.frombuffer(buffers[1], dtype=np.int32, count=len(col) + 1 + col.offset)
    boff = raw[col.offset: col.offset + len(col) + 1].astype(np.int64)
    base = boff[0]
    if buffers[2] is None or boff[-1] == base:
        return np.empty(0, dtype=np.uint64), (boff - base) // 8
    data = np.frombuffer(buffers[2], dtype=np.uint8, count=int(boff[-1]))[base:]
    return data.copy().view(np.uint64), (boff - base) // 8


def jaccard_sorted(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted unique uint64 arrays."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


def decode_shingle(code: int, n: int) -> str:
    """Inverse of the n<=8 exact packing (debugging aid)."""
    bs = int(code).to_bytes(8, "big")[-n:]
    return bs.decode("ascii")


def word_ngram_hashes(
    texts: pa.Array | pa.ChunkedArray, n: int, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Flat (row_index, gram_hash) OCCURRENCES of word n-grams per row.

    Word-level analogue of :func:`shingle_flat` for cross-document
    boilerplate detection: tokens are ASCII-ws splits (the SQL-parity
    contract shared with `quality` / `dup_words`), each word is hashed
    (:func:`..hashing.hash_strings`), and an n-gram id is the order-
    sensitive splitmix64 chain over its n word hashes — everything
    vectorized over the flat token buffer (no per-row Python). Rows with
    fewer than n words yield no grams; duplicates within a row are kept
    (occurrences, not a set — callers dedupe per row when they need
    document frequencies).

    Gram identity is the 64-bit chain hash, not the word string — two
    distinct grams collide with probability ~2⁻⁶⁴ (the same convention as
    the content-fingerprint operator, whose oracle doubles as the
    collision check at test scale). Each chain step salts the incoming
    word hash by its position (k·γ): a bare ``splitmix64(a ^ b)`` combine
    is SYMMETRIC in its first step, so without the salt every
    adjacent-word transposition ("x y …" vs "y x …") collides — observed
    as a 2× hot-gram overcount on shuffled-word corpora.
    """
    import pyarrow.compute as pc

    from .hashing import _SM_GAMMA, combine_u64, hash_strings

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    trimmed = pc.utf8_trim(texts, " ")
    toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    words = toks.flatten()
    h = hash_strings(words, seed)
    row_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    total = len(h)
    if total < n:
        return (np.empty(0, np.int64), np.empty(0, np.uint64))
    g = h[: total - n + 1].copy()
    with np.errstate(over="ignore"):
        for k in range(1, n):
            g = combine_u64(g, h[k: total - n + 1 + k]
                            + np.uint64(k) * _SM_GAMMA)
    valid = row_idx[: total - n + 1] == row_idx[n - 1:]
    return row_idx[: total - n + 1][valid], g[valid]
