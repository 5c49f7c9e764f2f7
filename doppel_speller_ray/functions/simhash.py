"""SimHash (64-bit) fingerprints over shingle sets, vectorized.

Complementary near-dup sketch to MinHash (SURVEY.md §2.7): one uint64 per
document; near-duplicates have small Hamming distance. Candidate generation
buckets on rotated prefix bands (the classic Charikar/Manku approach).
"""

from __future__ import annotations

import numpy as np

from .hashing import splitmix64

_BITS = np.arange(64, dtype=np.uint64)


_SIM_CHUNK = 500_000  # shingle instances per chunk (~32 MB of bit matrix)


def simhash_flat(flat: np.ndarray, offsets: np.ndarray, seed: int = 0) -> np.ndarray:
    """uint64 SimHash per ragged shingle row (unweighted features).

    Bit expansion uses ``np.unpackbits`` on the hashed values (C kernel,
    uint8 matrix) + per-row ``add.reduceat`` — the naive (m, 64) int32
    contrib/cumsum formulation moved ~1 GB of memory per 1024-doc batch and
    dominated the prepare stage. Processed in row chunks so the bit matrix
    stays cache-sized.
    """
    n_rows = len(offsets) - 1
    out = np.zeros(n_rows, dtype=np.uint64)
    if n_rows == 0 or len(flat) == 0:
        return out
    h = splitmix64(np.asarray(flat, np.uint64) ^ np.uint64(seed & 0xFFFFFFFFFFFFFFFF))
    hb = h.view(np.uint8).reshape(-1, 8)  # little-endian bytes of each value

    row_lens = offsets[1:] - offsets[:-1]
    weights = (np.uint64(1) << _BITS)

    start_row = 0
    while start_row < n_rows:
        # grow the row chunk until ~_SIM_CHUNK shingle instances
        end_row = start_row
        total = 0
        while end_row < n_rows and (total == 0 or total + row_lens[end_row] <= _SIM_CHUNK):
            total += row_lens[end_row]
            end_row += 1
        lo, hi = offsets[start_row], offsets[end_row]
        if hi > lo:
            bits = np.unpackbits(hb[lo:hi], axis=1, bitorder="little")  # (m, 64) uint8
            seg_starts = (offsets[start_row:end_row] - lo).astype(np.int64)
            nonempty = row_lens[start_row:end_row] > 0
            sums = np.zeros((end_row - start_row, 64), dtype=np.int64)
            ne_idx = np.nonzero(nonempty)[0]
            if len(ne_idx):
                # dtype=int32 accumulates WITHOUT materializing an int64
                # copy of the bit matrix (that copy was 512 MB per chunk and
                # collapsed throughput when tasks ran concurrently)
                red = np.add.reduceat(bits, seg_starts[ne_idx], axis=0,
                                      dtype=np.int32)
                sums[ne_idx] = red
            majority = (2 * sums) > row_lens[start_row:end_row, None]
            out[start_row:end_row] = (majority.astype(np.uint64) * weights[None, :]) \
                .sum(axis=1, dtype=np.uint64)
        start_row = end_row
    return out


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
