"""Suffix-array + LCP kernels (north_rule: "suffix-array substring").

`suffix_array` is a numpy prefix-doubling construction (Manber & Myers
1990 shape: O(n log n) doubling rounds, each a vectorized lexsort —
no per-character Python); `lcp_array` is Kasai et al. 2001, whose O(n)
total-work guarantee makes the per-doc Python loop cheap at the capped
lengths the operators use.

Consumers: the longest-repeated-substring operator
(`queries_corpus.q_longest_repeat`) runs one small per-doc suffix array
inside map_batches — embarrassingly parallel, no shuffle. The cross-doc
scale path (Lee et al. 2022, "Deduplicating Training Data Makes Language
Models Better") concatenates each PARTITION's docs with per-boundary
sentinels and builds one partition-level array; the within-partition
assumption is the same one the containment tier documents
(`stages/containment.py`), with winnowing providing the cross-partition
candidate routing. The reference repo has no suffix-array analogue (its
substring logic is the title-containment heuristic in
match_maker.py:16-71); this module exists for the web-scale tier.
"""

from __future__ import annotations

import numpy as np


def suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix array of a uint8/int array by prefix doubling.

    Each round lexsorts on (rank[i], rank[i+k]) — two integer keys — and
    rewrites ranks from the sorted adjacency; terminates when all ranks
    are distinct (≤ ceil(log2 n) rounds)."""
    n = len(s)
    if n == 0:
        return np.empty(0, np.int64)
    rank = np.asarray(s, dtype=np.int64)
    k = 1
    while True:
        key2 = np.full(n, -1, np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        prev, cur = order[:-1], order[1:]
        diff = (rank[cur] != rank[prev]) | (key2[cur] != key2[prev])
        new = np.empty(n, np.int64)
        new[order] = np.concatenate([[0], np.cumsum(diff)])
        rank = new
        if rank[order[-1]] == n - 1:
            return order.astype(np.int64)
        k *= 2


def lcp_array(s: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP: lcp[r] = longest common prefix of suffixes sa[r-1], sa[r]
    (lcp[0] = 0). Amortized O(n): h decreases by at most 1 per step."""
    n = len(s)
    lcp = np.zeros(n, np.int64)
    if n < 2:
        return lcp
    rank = np.empty(n, np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = int(sa[r - 1])
            while i + h < n and j + h < n and s[i + h] == s[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def longest_repeat_len(s: np.ndarray) -> int:
    """Length of the longest substring occurring ≥2 times in ``s``
    (classic identity: max adjacent-rank LCP over the suffix array)."""
    if len(s) < 2:
        return 0
    return int(lcp_array(s, suffix_array(s)).max())


def longest_repeats_batch(texts) -> np.ndarray:
    """Vector of longest-repeat lengths for an iterable of str (each
    encoded utf-8; callers cap length upstream)."""
    out = np.zeros(len(texts), np.int64)
    for i, t in enumerate(texts):
        if t:
            out[i] = longest_repeat_len(np.frombuffer(t.encode("utf-8"),
                                                      dtype=np.uint8))
    return out
