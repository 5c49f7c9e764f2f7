"""Content-defined chunking (CDC): Rabin-style rolling-hash boundaries.

The storage/code-corpus dedup primitive (LBFS, Muthitacharoen et al. 2001;
FastCDC, Xia et al. 2016): split each document where a w-byte rolling hash
masks to zero, so chunk boundaries move WITH the content — inserting bytes
near the front re-synchronizes after the next boundary and every later
chunk hashes identically, which is what makes chunk-level dedup robust
where fixed-size blocking is not.

No reference analogue — reference file n/a; part of the beyond-reference
dedup surface.

Vectorization: the polynomial rolling hash has a sequential recurrence,
but with an ODD multiplier p it is invertible mod 2^64, so prefix hashes
factor as ``P[i] = p^i · Σ_j b[j]·p^(-j)`` — one elementwise multiply by
precomputed inverse powers, one wrapping cumsum, one elementwise multiply
back. The whole BATCH is processed on its flat byte buffer in ~6 numpy
passes; window hashes never cross row boundaries (validity mask), so row
structure costs nothing. Chunk hashing reuses ``hash_bytes_rows`` over the
cut-offsets array (chunks tile the buffer, so the cuts ARE the offsets),
with a max-cut cap bounding both chunk length and that kernel's loop.
"""

from __future__ import annotations

import numpy as np

from .hashing import hash_bytes_rows, splitmix64

CDC_P = np.uint64(0x100000001B3)        # FNV-64 prime; odd → invertible
CDC_PINV = np.uint64(pow(0x100000001B3, -1, 1 << 64))
CDC_W = 16                              # rolling window (bytes)
CDC_MASK = np.uint64(31)                # boundary iff H & mask == 0 (avg 32 B)
CDC_MAX = 256                           # max-cut: no chunk exceeds this


def rolling_window_hashes(
    data: np.ndarray, offsets: np.ndarray, w: int = CDC_W
) -> tuple[np.ndarray, np.ndarray]:
    """(hashes, valid) per flat-buffer position: hashes[i] is the
    polynomial hash of data[i-w+1 .. i]; valid[i] marks windows that lie
    entirely inside one row."""
    n = len(data)
    if n == 0:
        return np.empty(0, np.uint64), np.empty(0, bool)
    b = data.astype(np.uint64)
    with np.errstate(over="ignore"):
        pw = np.empty(n + 1, np.uint64)
        pw[0] = 1
        np.multiply.accumulate(np.full(n, CDC_P, np.uint64), out=pw[1:])
        pinv = np.empty(n, np.uint64)
        pinv[0] = 1
        if n > 1:
            np.multiply.accumulate(np.full(n - 1, CDC_PINV, np.uint64),
                                   out=pinv[1:])
        s = np.cumsum(b * pinv)                 # Σ b[j]·p^-j (mod 2^64)
        prefix = pw[1:n + 1] * s                # P[i] = p^(i+1)·… — any
        # fixed extra power of p is a bijection, so boundary statistics
        # are unchanged; the telescoping below stays exact.
        pe = np.concatenate(([np.uint64(0)], prefix))
        h = np.empty(n, np.uint64)
        h[:w - 1] = 0
        h[w - 1:] = pe[w:] - pw[w] * pe[:n - w + 1]
    valid = np.zeros(n, bool)
    if n >= w:
        row_of = np.repeat(np.arange(len(offsets) - 1, dtype=np.int64),
                           np.diff(offsets))
        valid[w - 1:] = row_of[w - 1:] == row_of[:n - w + 1]
    return h, valid


def cdc_cut_offsets(data: np.ndarray, offsets: np.ndarray,
                    w: int = CDC_W, mask: np.uint64 = CDC_MASK,
                    max_len: int = CDC_MAX) -> np.ndarray:
    """Cut-point array over the flat buffer: every row boundary, every
    content-defined boundary (rolling hash masks to 0, cutting AFTER that
    byte), plus max-cut splits so no chunk exceeds ``max_len``. Chunks are
    the consecutive, non-degenerate cut pairs."""
    h, valid = rolling_window_hashes(data, offsets, w)
    bpos = np.nonzero(valid & ((h & mask) == 0))[0]
    cuts = np.unique(np.concatenate([offsets.astype(np.int64), bpos + 1]))
    lens = np.diff(cuts)
    over = lens > max_len
    if over.any():
        n_extra = (lens[over] - 1) // max_len
        starts = np.repeat(cuts[:-1][over], n_extra)
        base = np.repeat(np.cumsum(n_extra) - n_extra, n_extra)
        k = np.arange(len(starts)) - base + 1
        cuts = np.unique(np.concatenate([cuts, starts + k * max_len]))
    return cuts


def cdc_chunks(data: np.ndarray, offsets: np.ndarray,
               seed: int = 0) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(row_idx, chunk_hash, chunk_len) for every non-empty chunk, in
    document order. One hash_bytes_rows pass over the cut offsets (its
    per-byte loop is bounded by the max-cut)."""
    cuts = cdc_cut_offsets(data, offsets)
    lens = np.diff(cuts)
    ok = lens > 0
    hashes = hash_bytes_rows(data, cuts, seed)[ok]
    starts = cuts[:-1][ok]
    row_idx = np.searchsorted(offsets.astype(np.int64), starts, side="right") - 1
    return row_idx, hashes, lens[ok]


def cdc_row_digest(data: np.ndarray, offsets: np.ndarray,
                   n_rows: int) -> np.ndarray:
    """Order-sensitive per-row digest of the chunk-hash sequence (for the
    copy-consistency oracle): Σ (mod 2^64) splitmix64(chunk_hash ^ k·γ)
    with k the chunk's position in its row."""
    row_idx, hashes, _ = cdc_chunks(data, offsets)
    dig = np.zeros(n_rows, np.uint64)
    if len(row_idx) == 0:
        return dig
    first = np.ones(len(row_idx), bool)
    first[1:] = row_idx[1:] != row_idx[:-1]
    starts = np.nonzero(first)[0]
    k = (np.arange(len(row_idx)) -
         np.repeat(starts, np.diff(np.append(starts, len(row_idx)))))
    with np.errstate(over="ignore"):
        terms = splitmix64(hashes ^ (k.astype(np.uint64)
                                     * np.uint64(0x9E3779B97F4A7C15)))
        np.add.at(dig, row_idx, terms)
    return dig
