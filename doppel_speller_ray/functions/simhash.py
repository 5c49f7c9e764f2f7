"""SimHash (64-bit) fingerprints over shingle sets, vectorized.

Complementary near-dup sketch to MinHash (SURVEY.md §2.7): one uint64 per
document; near-duplicates have small Hamming distance. Candidate generation
buckets on rotated prefix bands (the classic Charikar/Manku approach).
"""

from __future__ import annotations

import numpy as np

from .hashing import splitmix64

_BITS = np.arange(64, dtype=np.uint64)


def simhash_flat(flat: np.ndarray, offsets: np.ndarray, seed: int = 0) -> np.ndarray:
    """uint64 SimHash per ragged shingle row (unweighted features)."""
    n_rows = len(offsets) - 1
    out = np.zeros(n_rows, dtype=np.uint64)
    if n_rows == 0 or len(flat) == 0:
        return out
    h = splitmix64(np.asarray(flat, np.uint64) ^ np.uint64(seed & 0xFFFFFFFFFFFFFFFF))
    bits = ((h[:, None] >> _BITS[None, :]) & np.uint64(1)).astype(np.int32)  # (m, 64)
    contrib = bits * 2 - 1
    csum = np.zeros((len(flat) + 1, 64), dtype=np.int64)
    np.cumsum(contrib, axis=0, out=csum[1:])
    sums = csum[offsets[1:]] - csum[offsets[:-1]]  # (n_rows, 64)
    bitvals = (sums > 0).astype(np.uint64)
    return (bitvals << _BITS[None, :]).sum(axis=1, dtype=np.uint64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Per-element Hamming distance between uint64 arrays."""
    x = np.bitwise_xor(np.asarray(a, np.uint64), np.asarray(b, np.uint64))
    if hasattr(np, "bitwise_count"):
        return np.bitwise_count(x).astype(np.int64)
    v = x.view(np.uint8).reshape(*x.shape, 8)
    return np.unpackbits(v, axis=-1).sum(axis=-1).astype(np.int64)


def simhash_band_keys(sim: np.ndarray, bands: int = 4, seed: int = 0) -> np.ndarray:
    """(n, bands) bucket keys: split the 64 bits into `bands` segments.

    Two docs within Hamming distance < bands share at least one full segment
    (pigeonhole), so grouping by each segment key finds all such pairs.
    """
    n = len(sim)
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)
    keys = np.empty((n, bands), dtype=np.uint64)
    for i in range(bands):
        seg = (np.asarray(sim, np.uint64) >> np.uint64(i * width)) & mask
        keys[:, i] = splitmix64(seg ^ np.uint64((seed + i + 1) * 0x9E3779B9))
    return keys
