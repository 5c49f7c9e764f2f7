"""Text-analysis kernels for the training-data pipeline operators:
language ID (stopword/char heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and document fingerprinting (rolling hash +
winnowing). All operate per batch; regexes are compiled at module load.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import hash_strings, splitmix64

# --- token counting ---------------------------------------------------------

# BPE-ish pre-tokenizer pattern (GPT-2 style, ascii-compatible approximation).
# ASCII whitespace class spelled out (not \s) so the Python scalar, the
# Arrow-RE2 batch kernel and the DuckDB SQL oracle agree byte-for-byte on
# every input — Python's \s is Unicode-aware, RE2's is ASCII (ADVICE r2).
_ASCII_WS = "\t\n\x0b\x0c\r "
_BPE_RE = re.compile(
    rf"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9{_ASCII_WS}]+|[{_ASCII_WS}]+")
_ASCII_WS_ONLY = re.compile(rf"[{_ASCII_WS}]+\Z")
# Same alternation minus the whitespace branch: in a left-to-right scan the
# non-ws branches match the same CORES (letter/digit/punct runs,
# contractions) whether stray whitespace is consumed by a \s+ branch or
# skipped by the engine, so counting matches of this pattern equals counting
# non-whitespace matches of _BPE_RE (parity-tested exhaustively).
_BPE_NONWS_PATTERN = rf"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9{_ASCII_WS}]+"


def whitespace_token_counts(texts: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Number of whitespace-separated tokens per row (vectorized)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    words = pc.split_pattern_regex(pc.utf8_trim_whitespace(texts), pattern=r"\s+")
    lens = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    empty = np.asarray(pc.equal(pc.utf8_trim_whitespace(texts), ""))
    lens[empty] = 0
    return lens


def bpe_token_counts(texts: list[str]) -> np.ndarray:
    """Approximate BPE token count per text (regex pre-tokenizer segments,
    whitespace-only segments excluded). Scalar parity oracle for
    :func:`bpe_token_counts_batch` — use the batch kernel in pipelines."""
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        out[i] = sum(1 for m in _BPE_RE.finditer(t or "")
                     if not _ASCII_WS_ONLY.match(m.group()))
    return out


def bpe_token_counts_batch(texts: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Vectorized :func:`bpe_token_counts`: ONE Arrow-RE2
    ``count_substring_regex`` pass over the whole column (no per-row Python,
    no per-match objects) — measured 2.5× the scalar single-threaded, and it
    runs inside map_batches tasks so it parallelizes across the pool."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    return pc.count_substring_regex(texts, pattern=_BPE_NONWS_PATTERN) \
        .to_numpy(zero_copy_only=False).astype(np.int64)


# --- quality scoring --------------------------------------------------------

_STOPWORDS_EN = frozenset(
    "the a an and or of to in is are was were be been it this that for on with as at by "
    "from not no but if then than so such can will just into over under out up down".split()
)


def quality_features(texts: pa.Array | pa.ChunkedArray) -> dict[str, np.ndarray]:
    """Vectorized per-doc quality signals:

    n_chars, n_tokens, mean_token_len, punct_ratio (non-alnum-non-space chars
    / chars), digit_ratio, stopword_ratio (English stopword tokens / tokens),
    and a composite quality_score in [0,1].

    Tokenization here uses RE2's ASCII ``\\s`` — deliberately the same
    whitespace class as the DuckDB SQL oracle (trim / string_split_regex),
    which is the conformance contract for this operator. On text containing
    non-ASCII Unicode whitespace (NBSP, U+3000) token counts differ from
    Python ``str.split()`` semantics; language ID, whose parity contract is
    the scalar ``detect_language``, uses the full Python class instead
    (``_PY_WS_CLASS``).
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.float64)
    n_tokens = whitespace_token_counts(texts).astype(np.float64)

    stripped_ws = pc.replace_substring_regex(texts, pattern=r"\s", replacement="")
    n_nonspace = pc.utf8_length(stripped_ws).to_numpy(zero_copy_only=False).astype(np.float64)
    alnum_only = pc.replace_substring_regex(stripped_ws, pattern=r"[^A-Za-z0-9]", replacement="")
    n_alnum = pc.utf8_length(alnum_only).to_numpy(zero_copy_only=False).astype(np.float64)
    digits_only = pc.replace_substring_regex(stripped_ws, pattern=r"[^0-9]", replacement="")
    n_digits = pc.utf8_length(digits_only).to_numpy(zero_copy_only=False).astype(np.float64)

    safe_ns = np.maximum(n_nonspace, 1.0)
    safe_nt = np.maximum(n_tokens, 1.0)
    punct_ratio = (n_nonspace - n_alnum) / safe_ns
    digit_ratio = n_digits / safe_ns
    mean_token_len = n_nonspace / safe_nt

    lowered = pc.utf8_lower(texts)
    words = pc.split_pattern_regex(pc.utf8_trim_whitespace(lowered), pattern=r"\s+")
    flat = np.asarray(pc.list_flatten(words).to_numpy(zero_copy_only=False), dtype=object)
    is_stop = np.isin(flat, list(_STOPWORDS_EN)) if len(flat) else np.zeros(0, bool)
    lens = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    csum = np.concatenate([[0], np.cumsum(is_stop.astype(np.int64))])
    stop_counts = csum[offsets[1:]] - csum[offsets[:-1]]
    stopword_ratio = stop_counts / safe_nt

    # composite: long-enough, mostly-alnum, reasonable word lengths
    length_score = np.clip(n_chars / 200.0, 0.0, 1.0)
    word_len_score = np.clip(1.0 - np.abs(mean_token_len - 5.0) / 10.0, 0.0, 1.0)
    alnum_score = 1.0 - np.clip(punct_ratio * 2.0, 0.0, 1.0)
    quality = 0.4 * length_score + 0.3 * word_len_score + 0.3 * alnum_score
    return {
        "n_chars": n_chars.astype(np.int64),
        "n_tokens": n_tokens.astype(np.int64),
        "mean_token_len": mean_token_len,
        "punct_ratio": punct_ratio,
        "digit_ratio": digit_ratio,
        "stopword_ratio": stopword_ratio,
        "quality_score": quality,
    }


# --- language ID ------------------------------------------------------------

# Python str.split() whitespace class (every char where str.isspace() is
# True), as an RE2 character class. Arrow's RE2 `\s` is ASCII-only, so a
# batch kernel claiming byte-identical decisions vs a str.split()-based
# scalar must split on this class instead (ADVICE r2: NBSP/U+3000 inputs
# diverged). Verified exhaustively against str.isspace() in
# tests/test_textstats.py.
_PY_WS_CLASS = (
    "[\t\n\x0b\x0c\r\x1c\x1d\x1e\x1f \x85\xa0\u1680"
    "\u2000-\u200a\u2028\u2029\u202f\u205f\u3000]+"
)

_LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "en": _STOPWORDS_EN,
    "de": frozenset("der die das und ist nicht ein eine mit von zu im den dem des auf für".split()),
    "fr": frozenset("le la les et est un une des du de à dans pour que qui ne pas sur avec".split()),
    "es": frozenset("el la los las y es un una de en que no por con para su al lo como más".split()),
}
_CJK_RE = re.compile(r"[一-鿿぀-ヿ]")


def detect_language(text: str) -> str:
    """Heuristic language ID: CJK char ratio → zh, else best stopword hit
    rate among {en,de,fr,es}; 'und' (undetermined) when no signal."""
    if not text:
        return "und"
    cjk = len(_CJK_RE.findall(text))
    if cjk / max(len(text), 1) > 0.05:
        return "zh"
    tokens = text.lower().split()
    if not tokens:
        return "und"
    best_lang, best_score = "und", 0.0
    for lang, stops in _LANG_STOPWORDS.items():
        score = sum(1 for t in tokens if t in stops) / len(tokens)
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang if best_score > 0.02 else "und"


def detect_language_batch(texts: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Vectorized :func:`detect_language` over a whole batch (byte-identical
    decisions): one Arrow regex pass for CJK counts, one split, then per-
    language ``np.isin`` over the flattened token array + per-doc bincounts
    — no per-row Python (the scalar version stays as the parity oracle)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    n = len(texts)
    n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.float64)
    non_cjk = pc.replace_substring_regex(texts, pattern="[一-鿿぀-ヿ]",
                                         replacement="")
    cjk = n_chars - pc.utf8_length(non_cjk).to_numpy(zero_copy_only=False)
    is_zh = cjk / np.maximum(n_chars, 1) > 0.05

    words = pc.split_pattern_regex(pc.utf8_lower(texts), pattern=_PY_WS_CLASS)
    flat = np.asarray(pc.list_flatten(words).to_numpy(zero_copy_only=False),
                      dtype=object)
    lens = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_idx = np.repeat(np.arange(n), lens)
    nonempty = flat != "" if len(flat) else np.zeros(0, bool)
    n_tokens = np.bincount(doc_idx[nonempty], minlength=n).astype(np.float64)

    langs = list(_LANG_STOPWORDS)
    scores = np.zeros((len(langs), n))
    for li, lang in enumerate(langs):
        hit = np.isin(flat, list(_LANG_STOPWORDS[lang])) if len(flat) else np.zeros(0, bool)
        scores[li] = np.bincount(doc_idx[hit], minlength=n) / np.maximum(n_tokens, 1)
    # dict order = scalar loop order; strict > keeps first-wins tie behavior
    best = np.zeros(n, dtype=np.int64)
    best_score = scores[0].copy()
    for li in range(1, len(langs)):
        better = scores[li] > best_score
        best[better] = li
        best_score[better] = scores[li][better]
    out = np.array(langs, dtype=object)[best]
    out[best_score <= 0.02] = "und"
    out[n_tokens == 0] = "und"
    out[is_zh] = "zh"
    return out


# --- fingerprinting ---------------------------------------------------------

def content_fingerprint(texts: pa.Array | pa.ChunkedArray, seed: int = 0) -> np.ndarray:
    """One uint64 rolling-hash fingerprint per document (order-sensitive,
    whole-content). Vectorized across the batch."""
    return hash_strings(texts, seed)


def winnow_fingerprints(text: str, k: int = 8, w: int = 16, seed: int = 0) -> np.ndarray:
    """Winnowing (Schleimer et al., SIGMOD'03): hash all k-grams, keep the
    min hash of each sliding window of w hashes (rightmost min) — a compact,
    position-robust fingerprint set for containment/overlap detection."""
    b = text.encode("utf-8", "ignore")
    if len(b) < k:
        return np.empty(0, dtype=np.uint64)
    data = np.frombuffer(b, dtype=np.uint8)
    m = len(data) - (k - 1)
    h = np.zeros(m, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(k):
            h = h * np.uint64(0x100000001B3) + data[i: m + i].astype(np.uint64)
        h = splitmix64(h ^ np.uint64(seed))
    if m <= w:
        return np.unique(h.min(keepdims=True))
    from numpy.lib.stride_tricks import sliding_window_view

    wins = sliding_window_view(h, w)
    return np.unique(wins.min(axis=1))
