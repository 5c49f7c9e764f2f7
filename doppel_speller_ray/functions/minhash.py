"""MinHash signatures + LSH band keys, vectorized.

Revives the reference's abandoned MinHash design (dead columns
``COLUMN_SEQUENCES_MIN_HASH`` at ``/root/reference/doppelspeller/constants.py:16-17``)
as the scalable replacement for the O(queries × truth) sparse-Jaccard scan in
``match_maker.py:74-203``: 128 multiply-shift permutations over the hashed
shingle sets, banded into LSH bucket keys that become groupby shuffle keys.

Hash family: h_i(x) = a_i * x + b_i (mod 2**64) with odd a_i — the
multiply(-add) family; min over the row's shingles per permutation.

Memory: the hash matrix for a batch is (total_shingles × num_perms) uint64;
processed in row-chunks capped at ~32 MB so batch size need not shrink.
"""

from __future__ import annotations

import numpy as np

from .hashing import rng_u64

_CHUNK_CELLS = 4_000_000  # uint64 cells per hash-matrix chunk (~32 MB)


def make_perms(num_perms: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) coefficient vectors; a forced odd."""
    a = rng_u64(seed * 2 + 1, num_perms) | np.uint64(1)
    b = rng_u64(seed * 2 + 2, num_perms)
    return a, b


def minhash_flat(
    flat: np.ndarray, offsets: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """Signatures for ragged shingle rows.

    flat: uint64 shingle codes, row j = flat[offsets[j]:offsets[j+1]].
    Returns (n_rows, num_perms) uint64; empty rows get all-max sentinel.
    """
    n_rows = len(offsets) - 1
    k = len(a)
    sig = np.full((n_rows, k), np.iinfo(np.uint64).max, dtype=np.uint64)
    if n_rows == 0 or len(flat) == 0:
        return sig

    row_lens = offsets[1:] - offsets[:-1]
    rows_per_chunk = max(1, _CHUNK_CELLS // max(1, int(row_lens.max()) * k))
    with np.errstate(over="ignore"):
        for start in range(0, n_rows, rows_per_chunk):
            stop = min(start + rows_per_chunk, n_rows)
            lo, hi = offsets[start], offsets[stop]
            if hi == lo:
                continue
            h = flat[lo:hi, None] * a[None, :] + b[None, :]  # (m, k) mod 2**64
            # segment minima via minimum.reduceat on non-empty segments
            seg_starts = offsets[start:stop] - lo
            nonempty = (offsets[start + 1: stop + 1] - offsets[start:stop]) > 0
            if nonempty.all():
                sig[start:stop] = np.minimum.reduceat(h, seg_starts, axis=0)
            else:
                ne_idx = np.nonzero(nonempty)[0]
                mins = np.minimum.reduceat(h, seg_starts[ne_idx], axis=0)
                sig[start + ne_idx] = mins
    return sig


def lsh_bucket_keys(sig: np.ndarray, bands: int, rows: int, seed: int = 0) -> np.ndarray:
    """(n_rows, bands) uint64 bucket keys from signatures.

    Each band's r values are mixed (order-sensitive splitmix chain) together
    with the band index, so a single uint64 key identifies (band, band-hash)
    — one groupby key column instead of two.
    """
    from .hashing import combine_u64, splitmix64

    n = sig.shape[0]
    s = sig.reshape(n, bands, rows)
    keys = np.broadcast_to(
        splitmix64(np.arange(bands, dtype=np.uint64) + np.uint64(seed * 1_000_003 + 7)),
        (n, bands),
    ).copy()
    for i in range(rows):
        keys = combine_u64(keys, s[:, :, i])
    return keys


def minhash_jaccard_estimate(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Fraction of agreeing permutations — unbiased Jaccard estimate."""
    return float(np.mean(sig_a == sig_b))
