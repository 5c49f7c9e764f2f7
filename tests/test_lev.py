"""Levenshtein kernel parity with the reference's semantics:

* lev_ratio = round(100 × Levenshtein.ratio) — substitution cost 2
  (/root/reference/doppelspeller/common.py:161-162, feature_engineering.py:57-61)
* token_sort_ratio (common.py:165-167)
* deletion-ratio prefilter + 94-gated chain (predict.py:140-156)
* lev_distance = unit-cost (matches DuckDB's levenshtein())
"""

import random

import pytest

from doppel_speller_ray.functions.lev import (
    deletion_ratio,
    gated_ratio,
    lev_distance,
    lev_ratio,
    token_sort_ratio,
)


def dp_distance(a: str, b: str, sub_cost: int = 1) -> int:
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (0 if a[i - 1] == b[j - 1] else sub_cost))
        prev = cur
    return prev[n]


def ref_ratio(a: str, b: str) -> int:
    lensum = len(a) + len(b)
    if lensum == 0:
        return 100
    return int(round(100 * (lensum - dp_distance(a, b, sub_cost=2)) / lensum))


def test_randomized_parity():
    rng = random.Random(123)
    for _ in range(400):
        a = "".join(rng.choice("abcd e") for _ in range(rng.randint(0, 30)))
        b = "".join(rng.choice("abcd e") for _ in range(rng.randint(0, 30)))
        assert lev_distance(a, b) == dp_distance(a, b), (a, b)
        assert lev_ratio(a, b) == ref_ratio(a, b), (a, b)


def test_long_strings():
    a = "quick brown fox " * 40
    b = a.replace("fox", "fax", 3)
    assert lev_distance(a, b) == 3
    assert lev_ratio(a, a) == 100


def test_goldens():
    assert lev_ratio("abc", "abc") == 100
    assert lev_ratio("abc", "abd") == 67       # indel dist 2 of lensum 6
    assert lev_ratio("", "") == 100
    assert lev_ratio("a", "") == 0
    assert lev_distance("kitten", "sitting") == 3


def test_token_sort():
    assert token_sort_ratio("hello world", "world hello") == 100
    assert token_sort_ratio("abc def", "def abx") < 100


def test_deletion_ratio_upper_bound():
    rng = random.Random(5)
    for _ in range(100):
        a = "".join(rng.choice("ab") for _ in range(rng.randint(1, 20)))
        b = "".join(rng.choice("ab") for _ in range(rng.randint(1, 20)))
        # lev_ratio is rounded to int — can exceed the float bound by ≤ 0.5
        assert deletion_ratio(a, b) >= lev_ratio(a, b) - 0.5


def test_gated_chain():
    # wildly different lengths → prefilter zero, kernel never runs
    assert gated_ratio("abc", "abcdefghijklmnop") == 0
    # identical → passes at 100
    assert gated_ratio("abcdefghij", "abcdefghij") == 100
    # word swap: plain ratio ≤ 94 → token-sort fallback rescues it
    a, b = "aaaaa bbbbb ccccc", "ccccc bbbbb aaaaa"
    assert lev_ratio(a, b) <= 94
    assert gated_ratio(a, b) == 100


def test_chain_ruled_out_admissible():
    """The O(n+m) early-exit bound must NEVER rule out a pair either chain
    kernel would pass — fuzzed around the threshold boundary (words shuffled
    and perturbed so token_sort_ratio is exercised too), plus the bound
    itself is a true indel-distance lower bound."""
    from doppel_speller_ray.functions.lev import (chain_ruled_out,
                                                  indel_lower_bound,
                                                  lcs_length)

    rng = random.Random(11)
    vocab = ["alpha", "beta", "gamma", "delta", "epsi", "zeta", "etaa"]
    for trial in range(300):
        nw = rng.randint(1, 8)
        words = [rng.choice(vocab) for _ in range(nw)]
        a = " ".join(words)
        # near-duplicate b: shuffle words, few char edits — lands both sides
        # of the 94 boundary
        bw = words[:]
        rng.shuffle(bw)
        b = list(" ".join(bw))
        for _ in range(rng.randint(0, 3)):
            pos = rng.randrange(len(b))
            op = rng.random()
            if op < 0.4:
                b[pos] = rng.choice("abcdefgh")
            elif op < 0.7 and len(b) > 1:
                del b[pos]
            else:
                b.insert(pos, rng.choice("abcdefgh"))
        b = "".join(b)
        true_dist = len(a) + len(b) - 2 * lcs_length(a, b)
        assert indel_lower_bound(a, b) <= true_dist, (a, b)
        for thr in (80, 90, 94, 96):
            if chain_ruled_out(a, b, thr):
                assert lev_ratio(a, b) <= thr, (a, b, thr)
                assert token_sort_ratio(a, b) <= thr, (a, b, thr)


def test_fast_path_binding_consistent():
    """When rapidfuzz is absent (this container), the public names ARE the
    pure-Python kernels; when present, the *_py aliases keep the originals."""
    from doppel_speller_ray.functions import lev

    if lev.HAVE_RAPIDFUZZ:
        assert lev.lev_ratio is not lev.lev_ratio_py
    else:
        assert lev.lev_ratio is lev.lev_ratio_py
        assert lev.lev_distance is lev.lev_distance_py
        assert lev.lev_ratio_float is lev.lev_ratio_float_py


@pytest.mark.skipif(
    not __import__("doppel_speller_ray.functions.lev",
                   fromlist=["HAVE_RAPIDFUZZ"]).HAVE_RAPIDFUZZ,
    reason="rapidfuzz not installed")
def test_rapidfuzz_parity():
    """C fast path must be output-identical to the pure-Python kernels."""
    from doppel_speller_ray.functions import lev

    rng = random.Random(11)
    alphabet = "abcdef "
    for _ in range(300):
        a = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 25)))
        b = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 25)))
        assert lev.lev_ratio(a, b) == lev.lev_ratio_py(a, b)
        assert lev.lev_distance(a, b) == lev.lev_distance_py(a, b)
        assert abs(lev.lev_ratio_float(a, b) - lev.lev_ratio_float_py(a, b)) < 1e-12
