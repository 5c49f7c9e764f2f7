"""N3 char-n-gram shingles: set semantics parity with the reference's
get_n_grams (/root/reference/doppelspeller/common.py:150-151)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from doppel_speller_ray.functions.shingles import (
    binary_to_flat,
    decode_shingle,
    jaccard_sorted,
    list_column_flat,
    lists_to_binary,
    shingle_array,
)


def ref_n_grams(title: str, n: int = 3) -> set[str]:
    # reference semantics (common.py:150-151)
    return set(title[i:i + n] for i in range(len(title)) if len(title[i:i + n]) == n)


@given(st.lists(st.text(alphabet="abc 01", max_size=30), max_size=15))
@settings(max_examples=150, deadline=None)
def test_set_parity(texts):
    arr = shingle_array(texts, n=3)
    flat, off = list_column_flat(arr)
    for j, t in enumerate(texts):
        got = {decode_shingle(c, 3) for c in flat[off[j]: off[j + 1]]}
        assert got == ref_n_grams(t), t
        # sorted unique invariant
        seg = flat[off[j]: off[j + 1]]
        assert (np.diff(seg.astype(np.int64)) > 0).all() if len(seg) > 1 else True


def test_binary_pack_roundtrip():
    arr = shingle_array(["abcdef", "", "zzz"], n=3)
    packed = lists_to_binary(arr)
    flat, off = binary_to_flat(packed)
    flat0, off0 = list_column_flat(arr)
    assert (flat == flat0).all()
    assert (off == off0).all()


def test_binary_roundtrip_sliced():
    arr = shingle_array(["abcdef", "ghijk", "zzz", "qqqq"], n=3)
    packed = lists_to_binary(arr)
    sl = packed.slice(1, 2)
    flat, off = binary_to_flat(sl)
    flat0, off0 = list_column_flat(arr)
    exp = flat0[off0[1]: off0[3]]
    assert (flat == exp).all()
    assert off[0] == 0 and off[-1] == len(exp)


def test_jaccard_sorted():
    a = np.array([1, 2, 3, 4], np.uint64)
    b = np.array([3, 4, 5, 6], np.uint64)
    assert jaccard_sorted(a, b) == 2 / 6
    assert jaccard_sorted(a, a) == 1.0
