"""Stable 64-bit hashing, vectorized with numpy.

Everything here is deterministic across processes and machines (unlike
Python's salted ``hash``), which is what makes retries, resume-from-checkpoint
and cross-node shuffles reproducible.
"""

from __future__ import annotations

import numpy as np

# splitmix64 constants (public domain, Steele et al.)
_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)

_U64 = np.uint64


def splitmix64(x: np.ndarray | int) -> np.ndarray | np.uint64:
    """Vectorized splitmix64 finalizer. Input/output uint64 (mod 2**64)."""
    with np.errstate(over="ignore"):
        z = np.asarray(x, dtype=np.uint64) + _SM_GAMMA
        z = (z ^ (z >> _U64(30))) * _SM_M1
        z = (z ^ (z >> _U64(27))) * _SM_M2
        z = z ^ (z >> _U64(31))
    if np.isscalar(x) or getattr(x, "ndim", 1) == 0:
        return _U64(z)
    return z


def rng_u64(seed: int, n: int) -> np.ndarray:
    """Deterministic stream of n uint64 values from a seed (splitmix64 walk)."""
    idx = np.arange(1, n + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return splitmix64(_U64(seed & 0xFFFFFFFFFFFFFFFF) + idx * _SM_GAMMA)


def hash_u64(values: np.ndarray, seed: int = 0) -> np.ndarray:
    """Hash an array of uint64 values (seeded)."""
    with np.errstate(over="ignore"):
        return splitmix64(np.asarray(values, dtype=np.uint64) ^ _U64(seed & 0xFFFFFFFFFFFFFFFF))


def combine_u64(h: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Mix another uint64 column into an accumulator column (order-sensitive).

    Only for chaining already-hashed values: ``h ^ v`` on two RAW ids
    cancels shared high bits (e.g. sequential ids within a cluster differ
    only in the low bits), collapsing the key space — use
    :func:`pair_hash` for id pairs.
    """
    with np.errstate(over="ignore"):
        return splitmix64(np.asarray(h, np.uint64) ^ np.asarray(values, np.uint64))


def pair_hash(left: np.ndarray, right: np.ndarray) -> np.ndarray:
    """Uniform uint64 hash of an id pair.

    Hash each side independently before mixing: ``splitmix64(l ^ r)`` over
    raw near-sequential ids collapses to a handful of values (l and r share
    their high bits), which skewed pair-dedup partitions so badly that one
    partition held ~30× the mean load (observed: 25 s straggler task vs
    7.7 s mean at 50k docs).
    """
    with np.errstate(over="ignore"):
        hl = splitmix64(np.asarray(left, np.uint64))
        hr = splitmix64(np.asarray(right, np.uint64) + _SM_GAMMA)
        return splitmix64(hl ^ hr)


# ---------------------------------------------------------------------------
# SQL-expressible deterministic sampling (murmur3 fmix32 over doc ids).
#
# Unlike RNG-based sampling (Dataset.random_sample), membership depends only
# on (id, seed): stable under retries, repartitioning and resume — the
# scale-correct pattern — and exactly reproducible in DuckDB SQL with
# HUGEINT arithmetic, so the sampler itself is oracle-checkable.
# ---------------------------------------------------------------------------

_FM32_M1 = np.uint64(2246822507)   # 0x85EBCA6B (murmur3 fmix32)
_FM32_M2 = np.uint64(3266489917)   # odd 32-bit multiplier (fmix32-style)
_MASK32 = np.uint64(0xFFFFFFFF)


def fmix32(ids: np.ndarray, seed: int = 0) -> np.ndarray:
    """Murmur3 fmix32 finalizer over (id ^ seed) mod 2**32 → uint64 < 2**32.

    Kept to 32-bit lanes so every step is expressible in DuckDB BIGINT/
    HUGEINT without wraparound (64×64-bit products overflow HUGEINT).
    """
    with np.errstate(over="ignore"):
        h = np.asarray(ids, dtype=np.uint64)
        h = (h ^ _U64(seed)) & _MASK32
        h = h ^ (h >> _U64(16))
        h = (h * _FM32_M1) & _MASK32
        h = h ^ (h >> _U64(13))
        h = (h * _FM32_M2) & _MASK32
        h = h ^ (h >> _U64(16))
    return h


def hash_sample_mask(ids: np.ndarray, fraction: float, seed: int = 0) -> np.ndarray:
    """Boolean keep-mask: keep iff fmix32(id ^ seed) < fraction * 2**32."""
    threshold = _U64(int(fraction * 2**32))
    return fmix32(ids, seed) < threshold


def sql_fmix32_subquery(table: str, id_col: str, seed: int = 0) -> str:
    """DuckDB subquery exposing every column of `table` plus `_h5` =
    fmix32(id_col ^ seed) — step-for-step the same 32-bit lanes as
    :func:`fmix32`, so any hash-gated membership rule built on `_h5`
    (sampling thresholds, split assignment) is bit-identical cross-engine."""
    return f"""(
  SELECT *, CAST(xor(h4, h4 >> 16) AS BIGINT) AS _h5 FROM (
    SELECT *, CAST((CAST(h3 AS HUGEINT) * 3266489917) % 4294967296 AS BIGINT) AS h4 FROM (
      SELECT *, xor(h2, h2 >> 13) AS h3 FROM (
        SELECT *, CAST((CAST(h1 AS HUGEINT) * 2246822507) % 4294967296 AS BIGINT) AS h2 FROM (
          SELECT *, xor(h0, h0 >> 16) AS h1 FROM (
            SELECT *, xor({id_col}, {seed}) % 4294967296 AS h0 FROM {table}
          ))))))"""


def sql_hash_sample(table: str, id_col: str, fraction: float, seed: int = 0,
                    select: str = "*") -> str:
    """DuckDB SQL computing the exact same sample as hash_sample_mask."""
    threshold = int(fraction * 2**32)
    return f"""
SELECT {select} FROM {sql_fmix32_subquery(table, id_col, seed)}
WHERE _h5 < {threshold}
"""


# ---------------------------------------------------------------------------
# Vectorized string → uint64 polynomial hash (FNV-1a-style over a column).
#
# Computed position-by-position across the whole batch: the loop is over the
# max string length, each iteration a numpy op over all rows, so cost is
# O(max_len) numpy kernels — not O(rows) Python calls.
# ---------------------------------------------------------------------------

_POLY = np.uint64(0x100000001B3)        # FNV prime
_FNV_OFFSET = np.uint64(0xCBF29CE484222325)


def hash_bytes_rows(data: np.ndarray, offsets: np.ndarray, seed: int = 0) -> np.ndarray:
    """Hash variable-length byte rows given a flat uint8 buffer + offsets.

    ``data``: flat uint8 array; row j is data[offsets[j]:offsets[j+1]].
    Returns uint64 hash per row (FNV-1a over the bytes, then splitmix64 with
    the row length mixed in so ""-prefix collisions differ).
    """
    n_rows = len(offsets) - 1
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    h = np.full(n_rows, _FNV_OFFSET, dtype=np.uint64)
    if len(data) == 0 or n_rows == 0:
        out = splitmix64(h ^ np.asarray(lens, np.uint64))
        return hash_u64(out, seed)
    max_len = int(lens.max())
    starts = offsets[:-1].astype(np.int64)
    with np.errstate(over="ignore"):
        for i in range(max_len):
            active = lens > i
            idx = starts[active] + i
            h_act = h[active]
            h_act = (h_act ^ data[idx].astype(np.uint64)) * _POLY
            h[active] = h_act
        out = splitmix64(h ^ lens.astype(np.uint64))
    return hash_u64(out, seed)


def hash_strings(strings, seed: int = 0) -> np.ndarray:
    """Hash a pyarrow string Array/ChunkedArray (or list of str) to uint64."""
    import pyarrow as pa

    if isinstance(strings, (list, tuple)):
        strings = pa.array(strings, type=pa.string())
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if pa.types.is_large_string(strings.type):
        strings = strings.cast(pa.string())
    data, offsets = _string_buffers(strings)
    return hash_bytes_rows(data, offsets, seed)


def _string_buffers(arr) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (data, offsets) numpy views of a pyarrow StringArray.

    Handles a nonzero array offset (slices). Nulls are treated as "".
    """
    import pyarrow as pa

    assert isinstance(arr, pa.Array)
    buffers = arr.buffers()
    raw_offsets = np.frombuffer(buffers[1], dtype=np.int32, count=len(arr) + 1 + arr.offset)
    offsets = raw_offsets[arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    if buffers[2] is None:
        data = np.empty(0, dtype=np.uint8)
    else:
        data = np.frombuffer(buffers[2], dtype=np.uint8)
    if arr.null_count:
        valid = ~np.asarray(arr.is_null())
        # rebuild a compact buffer treating nulls as empty strings
        lens = (offsets[1:] - offsets[:-1]) * valid
        new_off = np.zeros(len(arr) + 1, dtype=np.int64)
        np.cumsum(lens, out=new_off[1:])
        out = np.empty(int(new_off[-1]), dtype=np.uint8)
        for j in np.nonzero(valid)[0]:
            out[new_off[j]: new_off[j + 1]] = data[offsets[j]: offsets[j + 1]]
        return out, new_off
    return data, offsets
