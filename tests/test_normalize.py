"""N1 normalizer parity: per-row reference semantics + vectorized Arrow path.

Golden case is the reference's own unit test
(/root/reference/doppelspeller/tests/test_common.py:16-19).
"""

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from doppel_speller_ray.functions.normalize import (
    normalize_array,
    tokenize_counts,
    transform_text,
)

GOLDEN_IN = """LKJblksd skjasl dfkjf &* 8*&&&8 GGdjsdkj--sdsd-"sdi..//' d'  k   bkjh77_asda33"""
GOLDEN_OUT = "lkjblksd skjasl dfkjf 88 ggdjsdkj sdsd sdi d k bkjh77asda33"


def test_reference_golden():
    assert transform_text(GOLDEN_IN) == GOLDEN_OUT


def test_accent_fold():
    assert transform_text("Ümlaut-Café") == "umlaut cafe"


def test_short_title_zero_padding():
    # pre-truncation length < 3 → right-justify-pad with '0' (common.py:34-38)
    assert transform_text("a") == "00a"
    assert transform_text("") == "000"
    assert transform_text("!?") == "000"


def test_truncation_to_255():
    out = transform_text("x" * 300)
    assert out == "x" * 255


def test_truncation_then_strip():
    # 255th char lands on a space: truncate then strip (common.py:32)
    s = "a" * 254 + " bcd"  # normalized length 259 → cut at 255 → "a"*254 + " "
    assert transform_text(s) == "a" * 254


def test_no_pad_when_long_title_truncates_short():
    # padding decision uses PRE-truncation length (common.py:34)
    s = "ab" + " " * 300 + "cd"
    # normalized collapses spaces first: "ab cd" (len 5) → no pad
    assert transform_text(s) == "ab cd"


def test_uncapped_mode():
    assert transform_text("x" * 300, max_chars=None) == "x" * 300


@given(st.lists(st.text(max_size=40), max_size=20))
@settings(max_examples=200, deadline=None)
def test_vectorized_parity(texts):
    got = normalize_array(texts).to_pylist()
    want = [transform_text(t) for t in texts]
    assert got == want


@given(st.lists(st.text(alphabet=st.characters(max_codepoint=127), max_size=60), max_size=10))
@settings(max_examples=100, deadline=None)
def test_vectorized_parity_ascii(texts):
    got = normalize_array(texts).to_pylist()
    want = [transform_text(t) for t in texts]
    assert got == want


def test_vectorized_parity_uncapped():
    texts = ["x" * 300, "a-b", "", "é"]
    got = normalize_array(texts, max_chars=None).to_pylist()
    want = [transform_text(t, max_chars=None) for t in texts]
    assert got == want


def test_tokenize_counts():
    norm = pa.array(["ab cd ef", "x", "", "one two"])
    n_words, n_chars = tokenize_counts(norm)
    assert n_words.to_pylist() == [3, 1, 0, 2]
    assert n_chars.to_pylist() == [8, 1, 0, 7]
