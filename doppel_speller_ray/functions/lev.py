"""Levenshtein kernels — pure Python bit-parallel (no C extension available).

The reference relies on ``python-Levenshtein``'s ``ratio`` (C extension,
``/root/reference/doppelspeller/common.py:161-167``) and a numba uint8 DP with
substitution cost 2 (``feature_engineering.py:25-63``). Neither numba nor a
Levenshtein C library exists in this environment, so the kernels are
implemented bit-parallel over Python big-ints (O(n·m/64) word ops):

* ``lev_ratio``: exact ``Levenshtein.ratio`` semantics — weighted edit
  distance with substitution cost 2 (= indel distance = len_a+len_b−2·LCS),
  ratio = (lensum − dist) / lensum, returned as int round(ratio·100)
  (common.py:161-162). LCS via the Allison–Dix bit-parallel recurrence.
* ``lev_distance``: unit-cost Levenshtein via Myers' bit-parallel algorithm
  (matches DuckDB's ``levenshtein()`` — used as a SQL-checkable oracle).
* ``token_sort_ratio``: words sorted alphabetically then ``lev_ratio``
  (common.py:165-167).
* ``deletion_ratio`` / ``gated_ratio``: the prefilter + threshold chain of
  ``predict.py:140-156``.
"""

from __future__ import annotations

from functools import lru_cache


def _char_masks(a: str) -> dict[str, int]:
    masks: dict[str, int] = {}
    bit = 1
    for ch in a:
        masks[ch] = masks.get(ch, 0) | bit
        bit <<= 1
    return masks


def lcs_length(a: str, b: str) -> int:
    """Bit-parallel LCS length (Allison–Dix / Crochemore formulation)."""
    m = len(a)
    if m == 0 or len(b) == 0:
        return 0
    if m > len(b):  # fewer big-int bits when the mask string is the longer one
        a, b = b, a
        m = len(a)
    masks = _char_masks(a)
    full = (1 << m) - 1
    v = full
    for ch in b:
        p = masks.get(ch, 0)
        u = v & p
        v = ((v + u) | (v - u)) & full
    # zeros in v mark matched positions
    return m - bin(v).count("1")


def lev_ratio(a: str, b: str) -> int:
    """round(100 × Levenshtein.ratio(a,b)): sub-cost-2 distance ratio."""
    lensum = len(a) + len(b)
    if lensum == 0:
        return 100
    return int(round(200 * lcs_length(a, b) / lensum))


def lev_ratio_float(a: str, b: str) -> float:
    lensum = len(a) + len(b)
    if lensum == 0:
        return 1.0
    return 2.0 * lcs_length(a, b) / lensum


def lev_distance(a: str, b: str) -> int:
    """Unit-cost Levenshtein distance (Myers 1999 bit-parallel)."""
    m = len(a)
    if m == 0:
        return len(b)
    if len(b) == 0:
        return m
    masks = _char_masks(a)
    full = (1 << m) - 1
    high = 1 << (m - 1)
    pv, mv = full, 0
    score = m
    for ch in b:
        eq = masks.get(ch, 0)
        xv = eq | mv
        xh = (((eq & pv) + pv) ^ pv) | eq
        ph = mv | (~(xh | pv) & full)
        mh = pv & xh
        if ph & high:
            score += 1
        if mh & high:
            score -= 1
        ph = ((ph << 1) | 1) & full
        mh = (mh << 1) & full
        pv = (mh | (~(xv | ph) & full))
        mv = ph & xv
    return score


def token_sort_ratio(a: str, b: str) -> int:
    """Sort words alphabetically in both strings, then lev_ratio
    (common.py:165-167)."""
    return lev_ratio(" ".join(sorted(a.split())), " ".join(sorted(b.split())))


def deletion_ratio(a: str, b: str) -> float:
    """Cheap upper bound on lev_ratio from lengths alone (predict.py:141-145)."""
    la, lb = len(a), len(b)
    total = la + lb
    if total == 0:
        return 100.0
    return ((total - abs(la - lb)) / total) * 100


def indel_lower_bound(a: str, b: str) -> int:
    """Lower bound on the sub-cost-2 (indel) distance in O(n+m): every
    character of the multiset symmetric difference needs ≥ 1 indel (it can
    never be matched by the LCS: LCS ≤ multiset intersection, so
    lensum − 2·LCS ≥ lensum − 2·|∩|). Invariant under word reordering of
    single-space-normalized text — ``" ".join(sorted(words))`` preserves the
    char multiset — so ONE bound gates both ``lev_ratio`` and
    ``token_sort_ratio`` in the verify chain.

    ASCII fast path: byte histograms via np.bincount (measured 6× cheaper
    than collections.Counter at 256 chars — the bound must cost far less
    than the O(n·m/64) kernels it skips). Non-ASCII falls back to Counter
    (utf-8 bytes would over-count multi-byte chars and break admissibility)."""
    if a.isascii() and b.isascii():
        import numpy as np

        # isascii ⇒ all bytes < 128 ⇒ both histograms are exactly length 128
        ha = np.bincount(np.frombuffer(a.encode(), np.uint8), minlength=128)
        hb = np.bincount(np.frombuffer(b.encode(), np.uint8), minlength=128)
        return int(np.abs(ha - hb).sum())
    from collections import Counter

    c = Counter(a)
    c.subtract(b)
    return sum(abs(v) for v in c.values())


def chain_ruled_out(a: str, b: str, threshold: int) -> bool:
    """True when NEITHER lev_ratio nor token_sort_ratio can exceed
    ``threshold`` — the early-exit for the verify tier's gated chain, where
    only ratio > threshold matters (VERDICT r3 #6; the O(n·m/64) kernels
    dominate verify core-seconds).

    ratio = round(100·(lensum−dist)/lensum) > thr ⇔ dist ≤ lensum·(99.5−thr)/100,
    so dist_lb·200 > lensum·(199−2·thr) proves ratio ≤ thr (integer-exact).
    Precondition for the token_sort half: single-space-normalized inputs
    (the dedup pipeline's norm_text always is)."""
    lensum = len(a) + len(b)
    return 200 * indel_lower_bound(a, b) > lensum * (199 - 2 * threshold)


def gated_ratio(a: str, b: str, threshold: int = 94) -> int:
    """The reference's verification chain (predict.py:147-156):

    deletion_ratio < threshold → 0 (skip the expensive kernel entirely);
    lev_ratio ≤ threshold → token_sort_ratio (word-order-insensitive retry);
    else lev_ratio.
    """
    if deletion_ratio(a, b) < threshold:
        return 0
    r = lev_ratio(a, b)
    if r <= threshold:
        return token_sort_ratio(a, b)
    return r


@lru_cache(maxsize=65536)
def _cached_ratio(a: str, b: str) -> int:
    return lev_ratio(a, b)


# --- optional C fast path -------------------------------------------------
# rapidfuzz is absent from this container (verified); when present, the
# bindings below transparently upgrade the hot kernels while the pure-Python
# implementations remain exported as ``*_py`` so the skipif-gated parity test
# in tests/test_lev.py can assert identical outputs. ``token_sort_ratio``,
# ``gated_ratio`` and ``_cached_ratio`` resolve ``lev_ratio`` through the
# module global at call time, so they pick up the fast path automatically.
lev_ratio_py = lev_ratio
lev_ratio_float_py = lev_ratio_float
lev_distance_py = lev_distance

try:
    from rapidfuzz.distance import Indel as _Indel
    from rapidfuzz.distance import Levenshtein as _Lev

    HAVE_RAPIDFUZZ = True

    def lev_ratio(a: str, b: str) -> int:  # noqa: F811
        """round(100 × Levenshtein.ratio): Indel distance = lensum − 2·LCS."""
        lensum = len(a) + len(b)
        if lensum == 0:
            return 100
        return int(round(100 * (lensum - _Indel.distance(a, b)) / lensum))

    def lev_ratio_float(a: str, b: str) -> float:  # noqa: F811
        lensum = len(a) + len(b)
        if lensum == 0:
            return 1.0
        return (lensum - _Indel.distance(a, b)) / lensum

    def lev_distance(a: str, b: str) -> int:  # noqa: F811
        return _Lev.distance(a, b)

except ImportError:
    HAVE_RAPIDFUZZ = False
