"""Suffix-array kernel properties: sortedness + permutation of the SA,
Kasai LCP vs direct prefix comparison, and the LRS identity vs an
independent brute-force (hash-set k-gram scan), fuzzed with hypothesis."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from doppel_speller_ray.functions.suffixes import (
    lcp_array, longest_repeat_len, longest_repeats_batch, suffix_array)


def _brute_lrs(b: bytes) -> int:
    n = len(b)
    best = 0
    for k in range(1, n):
        seen = set()
        hit = False
        for i in range(n - k + 1):
            t = b[i:i + k]
            if t in seen:
                hit = True
                break
            seen.add(t)
        if not hit:
            break
        best = k
    return best


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_suffix_array_sorted_permutation(b):
    s = np.frombuffer(b, dtype=np.uint8)
    sa = suffix_array(s)
    assert sorted(map(int, sa)) == list(range(len(s)))
    sufs = [b[int(i):] for i in sa]
    assert sufs == sorted(sufs)


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=2, max_size=48))
def test_lcp_matches_direct_compare(b):
    s = np.frombuffer(b, dtype=np.uint8)
    sa = suffix_array(s)
    lcp = lcp_array(s, sa)
    assert lcp[0] == 0
    for r in range(1, len(s)):
        x, y = b[int(sa[r - 1]):], b[int(sa[r]):]
        k = 0
        while k < min(len(x), len(y)) and x[k] == y[k]:
            k += 1
        assert lcp[r] == k


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="ab c", min_size=0, max_size=40))
def test_lrs_matches_bruteforce(t):
    b = t.encode("utf-8")
    assert longest_repeat_len(np.frombuffer(b, dtype=np.uint8)) == _brute_lrs(b)


def test_lrs_hand_cases():
    cases = {"": 0, "a": 0, "aa": 1, "abab": 2, "banana": 3,
             "abcdefg": 0, "aaaa": 3, "xabcyabcz": 3}
    got = longest_repeats_batch(list(cases))
    assert got.tolist() == list(cases.values())
