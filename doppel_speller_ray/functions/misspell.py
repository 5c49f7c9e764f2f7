"""Deterministic misspelling generator (fixture synthesis).

Reimplements the *semantics* of the reference's synthetic-positive generator
(``/root/reference/doppelspeller/feature_engineering_prepare.py:60-173``):
1–2 random perturbations per text drawn from {swap adjacent words, add
letter, remove letter, replace letter with a QWERTY-neighbour, add space,
remove space} — but fully seeded (the reference uses unseeded ``random``;
determinism is required for reproducible fixtures and retry-safe tasks).
"""

from __future__ import annotations

import math
import random

# QWERTY grid coordinates (row, col) — neighbourhood = euclidean distance ≤ 1,
# mirroring the reference's KEYBOARD_CARTESIAN + get_euclidean_neighbours
# (feature_engineering_prepare.py:14-22, 60-87).
_KEYBOARD = {
    "q": (0, 0), "w": (0, 1), "e": (0, 2), "r": (0, 3), "t": (0, 4),
    "y": (0, 5), "u": (0, 6), "i": (0, 7), "o": (0, 8), "p": (0, 9),
    "a": (1, 0), "s": (1, 1), "d": (1, 2), "f": (1, 3), "g": (1, 4),
    "h": (1, 5), "j": (1, 6), "k": (1, 7), "l": (1, 8),
    "z": (2, 0), "x": (2, 1), "c": (2, 2), "v": (2, 3), "b": (2, 4),
    "n": (2, 5), "m": (2, 6),
}


def _neighbours(ch: str) -> list[str]:
    if ch not in _KEYBOARD:
        return []
    r0, c0 = _KEYBOARD[ch]
    out = []
    for other, (r, c) in _KEYBOARD.items():
        if other != ch and math.dist((r0, c0), (r, c)) <= 1.0:
            out.append(other)
    return sorted(out)


def _add_letter(text: str, rng: random.Random) -> str:
    i = rng.randrange(len(text) + 1)
    ch = rng.choice("abcdefghijklmnopqrstuvwxyz")
    return text[:i] + ch + text[i:]


def _remove_letter(text: str, rng: random.Random) -> str:
    if len(text) <= 1:
        return text
    i = rng.randrange(len(text))
    return text[:i] + text[i + 1:]


def _replace_letter(text: str, rng: random.Random) -> str:
    idxs = [i for i, ch in enumerate(text) if ch in _KEYBOARD]
    if not idxs:
        return text
    i = rng.choice(idxs)
    nb = _neighbours(text[i])
    if not nb:
        return text
    return text[:i] + rng.choice(nb) + text[i + 1:]


def _add_space(text: str, rng: random.Random) -> str:
    if len(text) < 2:
        return text
    i = rng.randrange(1, len(text))
    return text[:i] + " " + text[i:]


def _remove_space(text: str, rng: random.Random) -> str:
    idxs = [i for i, ch in enumerate(text) if ch == " "]
    if not idxs:
        return text
    i = rng.choice(idxs)
    return text[:i] + text[i + 1:]


def _swap_words(text: str, rng: random.Random) -> str:
    words = text.split()
    if len(words) < 2:
        return text
    i = rng.randrange(len(words) - 1)
    words[i], words[i + 1] = words[i + 1], words[i]
    return " ".join(words)


_PERTURBATIONS = [_add_letter, _remove_letter, _replace_letter, _add_space,
                  _remove_space, _swap_words]


def misspell(text: str, seed: int, n_perturbations: int | None = None) -> str:
    """Deterministically perturbed copy of `text` (1–2 edits by default)."""
    rng = random.Random(seed)
    n = n_perturbations if n_perturbations is not None else rng.randint(1, 2)
    out = text
    for _ in range(n):
        fn = rng.choice(_PERTURBATIONS)
        out = fn(out, rng)
    return out
