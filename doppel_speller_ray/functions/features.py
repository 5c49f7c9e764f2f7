"""Pair featurizer — the reference's 66-dim feature vector re-expressed.

Semantics from ``/root/reference/doppelspeller/feature_engineering.py``:

* char encoding through the 37-symbol alphabet ``'- abcdefghijklmnopqrstuvwxyz0123456789'``
  zero-padded to 255 (``encode_title``, feature_engineering.py:298-307);
* ``fast_levenshtein_ratio`` (feature_engineering.py:25-63): sub-cost-2 DP,
  ratio FLOORED to int (the numba uint8 return cast truncates — kept here);
* ``construct_features`` (feature_engineering.py:69-169): 6 basic features
  (char counts, word counts, full lev ratio, reconstructed-title ratio) +
  4×15 truth-word features (best sliding-window ratio in the query, word
  length, word IDF over the truth word counter, IDF rank), NaN-padded.

The numba guvectorize kernel becomes a per-pair Python function using the
bit-parallel LCS kernel (functions/lev.py) — equivalent distances, no uint8
255-cell matrix cap. Used only by the training / ML-verifier mode.
"""

from __future__ import annotations

import math

import numpy as np

from .lev import lcs_length

ALPHABET = "- abcdefghijklmnopqrstuvwxyz0123456789"
_CHAR_TO_CODE = {ch: i for i, ch in enumerate(ALPHABET)}
SPACE_CODE = _CHAR_TO_CODE[" "]
N_WORD_FEATURES = 15           # NUMBER_OF_WORDS_FEATURES (settings.py:65)
MAX_CHARS = 255                # MAX_CHARACTERS_ALLOWED_IN_THE_TITLE
FEATURES_COUNT = 6 + 4 * N_WORD_FEATURES
# extended family (round-4 calibration): + candidate IDF-Jaccard score and
# candidate rank from the matcher tier-2 ranking — both already computed
# there, and exactly the signals the dominance-bound analysis (BASELINE.md
# round 3) showed the 66-dim family lacks on low-p true matches. A model's
# feature count decides which family it was trained on (pair_model.
# model_n_features), so the 66-dim artifact keeps working unchanged.
N_EXTRA_FEATURES = 2
EXTENDED_FEATURES_COUNT = FEATURES_COUNT + N_EXTRA_FEATURES


def encode_title(norm_text: str) -> np.ndarray:
    """np.uint8[255] code sequence, zero-padded (feature_engineering.py:298-307)."""
    out = np.zeros(MAX_CHARS, dtype=np.uint8)
    for i, ch in enumerate(norm_text[:MAX_CHARS]):
        out[i] = _CHAR_TO_CODE.get(ch, 0)
    return out


def lev_ratio_floor(a: str, b: str) -> int:
    """fast_levenshtein_ratio semantics: sub-cost-2 ratio ×100, FLOORED
    (numba uint8 return cast, feature_engineering.py:25-63)."""
    lensum = len(a) + len(b)
    if lensum == 0:
        return 100
    dist = lensum - 2 * lcs_length(a, b)
    return int(((lensum - dist) / lensum) * 100)


def truth_word_counts(norm_text: str, words_counter: dict[str, int]) -> np.ndarray:
    """np.uint32[15]: global truth-DB counts of the title's first 15 words
    (get_truth_words_counts, feature_engineering.py:309-319)."""
    out = np.zeros(N_WORD_FEATURES, dtype=np.uint32)
    for i, w in enumerate(norm_text.split()[:N_WORD_FEATURES]):
        out[i] = words_counter.get(w, 0)
    return out


def pair_features(title: str, truth_title: str, truth_counts: np.ndarray,
                  n_truth_titles: int) -> np.ndarray:
    """float32[66] feature vector for one (query, truth) pair —
    construct_features semantics (feature_engineering.py:69-169)."""
    t_chars, g_chars = len(title), len(truth_title)
    t_words = title.count(" ") + 1
    g_words = truth_title.count(" ") + 1
    lev = lev_ratio_floor(title, truth_title)

    title_wo_spaces = title.replace(" ", "")
    truth_words = truth_title.split(" ")[:N_WORD_FEATURES]

    best_ratios = np.full(N_WORD_FEATURES, np.nan, dtype=np.float32)
    word_lengths = np.full(N_WORD_FEATURES, np.nan, dtype=np.float32)
    idf_s = np.full(N_WORD_FEATURES, np.nan, dtype=np.float32)
    reconstructed_parts: list[str] = []

    for wi, word in enumerate(truth_words):
        lw = len(word)
        best_ratio = 0
        best_match = ""
        # sliding same-length window over the de-spaced query
        # (feature_engineering.py:138-151)
        for pos in range(len(title_wo_spaces)):
            window = title_wo_spaces[pos: pos + lw]
            if not window:
                break
            r = lev_ratio_floor(window, word)
            if r > best_ratio:
                best_ratio = r
                best_match = window
        best_ratios[wi] = best_ratio
        word_lengths[wi] = lw
        cnt = int(truth_counts[wi]) if wi < len(truth_counts) else 0
        idf_s[wi] = math.log(n_truth_titles / cnt) if cnt > 0 else np.nan
        reconstructed_parts.append(best_match)

    with np.errstate(invalid="ignore"):
        ranks = 1 + ((np.nanmax(idf_s) - idf_s) / g_words) if not np.isnan(idf_s).all() \
            else np.full(N_WORD_FEATURES, np.nan, dtype=np.float32)

    reconstructed = " ".join(reconstructed_parts)
    rec_lev = lev_ratio_floor(reconstructed, truth_title)

    basic = np.array([t_chars, g_chars, t_words, g_words, lev, rec_lev],
                     dtype=np.float32)
    return np.concatenate([basic, best_ratios, word_lengths, idf_s,
                           ranks.astype(np.float32)])


def featurize_pairs(titles: list[str], truth_titles: list[str],
                    truth_counts: np.ndarray, n_truth_titles: int,
                    extras: np.ndarray | None = None) -> np.ndarray:
    """(n_pairs, 66) float32 feature matrix; with ``extras`` (n_pairs,
    N_EXTRA_FEATURES) — candidate IDF-Jaccard + rank — appended → 68."""
    n = len(titles)
    out = np.empty((n, FEATURES_COUNT), dtype=np.float32)
    for i in range(n):
        out[i] = pair_features(titles[i], truth_titles[i],
                               truth_counts[i], n_truth_titles)
    if extras is not None:
        out = np.hstack([out, np.asarray(extras, dtype=np.float32)
                         .reshape(n, -1)])
    return out
