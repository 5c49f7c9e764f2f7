import numpy as np
import pyarrow as pa

from doppel_speller_ray.functions.misspell import misspell
from doppel_speller_ray.functions.simhash import hamming64, simhash_band_keys, simhash_flat
from doppel_speller_ray.functions.textstats import (
    bpe_token_counts,
    content_fingerprint,
    detect_language,
    quality_features,
    whitespace_token_counts,
    winnow_fingerprints,
)


def test_whitespace_token_counts():
    got = whitespace_token_counts(pa.array(["a b c", "", "  x  ", "one"]))
    assert got.tolist() == [3, 0, 1, 1]


def test_bpe_counts_monotone():
    got = bpe_token_counts(["hello world", "", "it's a test123!"])
    assert got[1] == 0
    assert got[0] == 2
    assert got[2] >= 4


def test_quality_features():
    q = quality_features(pa.array(["the quick brown fox jumps over the lazy dog", "!!!", ""]))
    assert q["stopword_ratio"][0] > 0
    assert q["punct_ratio"][1] == 1.0
    assert q["n_tokens"][2] == 0
    assert 0 <= q["quality_score"][0] <= 1


def test_detect_language():
    assert detect_language("the cat and the dog are in the house") == "en"
    assert detect_language("der hund und die katze sind nicht im haus") == "de"
    assert detect_language("le chat est dans la maison avec le chien") == "fr"
    assert detect_language("el perro y el gato en la casa por la noche") == "es"
    assert detect_language("你好世界 这是一个测试 文本") == "zh"
    assert detect_language("") == "und"


def test_fingerprint_stability():
    fp1 = content_fingerprint(pa.array(["abc", "def"]))
    fp2 = content_fingerprint(pa.array(["abc", "def"]))
    assert (fp1 == fp2).all()
    assert fp1[0] != fp1[1]


def test_winnowing_overlap():
    base = "the quick brown fox jumps over the lazy dog " * 8
    contained = "PREFIX junk words here " + base + " SUFFIX trailing"
    f1 = set(winnow_fingerprints(base).tolist())
    f2 = set(winnow_fingerprints(contained).tolist())
    # containment: most of base's fingerprints survive inside the longer doc
    assert len(f1 & f2) / len(f1) > 0.7
    f3 = set(winnow_fingerprints("completely different content with other words entirely").tolist())
    assert len(f1 & f3) / max(len(f1), 1) < 0.2


def test_simhash_near_vs_far():
    rng = np.random.default_rng(11)
    base = np.unique(rng.integers(0, 10**9, 400).astype(np.uint64))
    near = np.unique(np.concatenate([base[:380], rng.integers(2e9, 3e9, 20).astype(np.uint64)]))
    far = np.unique(rng.integers(5e9, 6e9, 400).astype(np.uint64))
    flat = np.concatenate([base, near, far])
    off = np.cumsum([0, len(base), len(near), len(far)]).astype(np.int64)
    sim = simhash_flat(flat, off)
    d_near = hamming64(sim[0:1], sim[1:2])[0]
    d_far = hamming64(sim[0:1], sim[2:3])[0]
    assert d_near < d_far
    # pigeonhole: hamming < bands ⇒ at least one identical 16-bit segment
    x = sim[0]
    y = x ^ np.uint64((1 << 2) | (1 << 20) | (1 << 40))  # 3 flipped bits
    keys = simhash_band_keys(np.array([x, y], np.uint64), bands=4)
    assert keys.shape == (2, 4)
    assert (keys[0] == keys[1]).any()


def test_misspell_deterministic():
    t = "the quick brown fox jumps over the lazy dog"
    assert misspell(t, 7) == misspell(t, 7)
    assert misspell(t, 7) != misspell(t, 8) or True  # different seeds usually differ
    out = misspell(t, 7)
    assert 0 < len(out) <= len(t) + 4


def test_detect_language_batch_parity():
    """Vectorized batch lang-ID must make byte-identical decisions vs the
    scalar oracle, including ties, empties, whitespace and CJK edges."""
    import pyarrow as pa

    from doppel_speller_ray.functions.textstats import (
        detect_language, detect_language_batch)

    texts = [
        "the cat and the dog are in the house",
        "der hund und die katze sind nicht im haus",
        "le chat est dans la maison avec le chien",
        "el perro y el gato en la casa por la noche",
        "\u4f60\u597d\u4e16\u754c \u8fd9\u662f\u4e00\u4e2a\u6d4b\u8bd5 \u6587\u672c",
        "", "   ", "xyzzy plugh 12345", "de la", "the der le el",
        "  leading and trailing the  ", "a\tb\nthe cat", None,
    ]
    got = detect_language_batch(pa.array(texts, pa.string()))
    want = [detect_language(t or "") for t in texts]
    assert list(got) == want, (list(got), want)



def test_py_ws_class_exhaustive():
    """_PY_WS_CLASS must cover exactly the chars str.split() splits on
    (str.isspace() == True) — the parity contract behind the batch lang-ID
    (ADVICE r2: RE2 \\s is ASCII-only, NBSP/U+3000 diverged)."""
    import re

    from doppel_speller_ray.functions.textstats import _PY_WS_CLASS

    pat = re.compile(_PY_WS_CLASS.replace("]+", "]"))
    missing = [hex(c) for c in range(0x110000)
               if chr(c).isspace() and not pat.fullmatch(chr(c))]
    extra = [hex(c) for c in range(0x110000)
             if pat.fullmatch(chr(c)) and not chr(c).isspace()]
    assert not missing and not extra, (missing, extra)


def test_detect_language_batch_unicode_whitespace_parity():
    """NBSP / ideographic-space / unit-separator tokenization must match the
    scalar (regression for the ASCII-\\s batch split)."""
    import pyarrow as pa

    from doppel_speller_ray.functions.textstats import (
        detect_language, detect_language_batch)

    texts = [
        "the\xa0cat\xa0is\xa0on\xa0the\xa0mat",         # NBSP-separated en
        "der　hund　ist　nicht　da",    # U+3000-separated de
        "le\x1cchat\x1cest\x1cdans\x1cla\x1cmaison",    # unit separator
        "\xa0　\x85", "word the of in",
    ]
    got = detect_language_batch(pa.array(texts, pa.string()))
    want = [detect_language(t) for t in texts]
    assert list(got) == want, (list(got), want)


def test_bpe_batch_parity():
    """The vectorized RE2 batch kernel must count identically to the scalar
    on adversarial inputs (contractions, punct runs, NBSP, CJK, empties) —
    and both use ASCII whitespace semantics, matching the SQL oracle."""
    import pyarrow as pa

    from doppel_speller_ray.functions.textstats import (
        bpe_token_counts, bpe_token_counts_batch)

    texts = [
        "", "   ", "a  b", "a   b", "don't", "it'll we've they're I'd",
        "!!!'s ok", "abc123def", "hello,   world!!  42x", "'", "''ll",
        "a\tb\n\ncd", " x", "x ", "  'tis", "price: $5.99!", "a'b'c",
        "\xa0nbsp\xa0sep", "多字节 text mix 123", "__init__ --flag=3",
        "'s's's", "1'2", "O'Neill", None,
    ]
    got = bpe_token_counts_batch(pa.array(texts, pa.string()))
    want = bpe_token_counts([t or "" for t in texts])
    assert list(got) == list(want), list(zip(texts, got, want))


def test_bpe_batch_parity_random():
    """Property sweep: random mixes of the alphabet classes."""
    import random

    import pyarrow as pa

    from doppel_speller_ray.functions.textstats import (
        bpe_token_counts, bpe_token_counts_batch)

    rng = random.Random(1234)
    chars = "ab A1 9'.!-\t\n\xa0é中"
    texts = ["".join(rng.choice(chars) for _ in range(rng.randrange(0, 40)))
             for _ in range(500)]
    got = bpe_token_counts_batch(pa.array(texts, pa.string()))
    want = bpe_token_counts(texts)
    assert list(got) == list(want)
