"""MinHash/LSH determinism + estimate accuracy (SURVEY.md §5 unit plan)."""

import numpy as np

from doppel_speller_ray.functions.minhash import (
    lsh_bucket_keys,
    make_perms,
    minhash_flat,
    minhash_jaccard_estimate,
)
from doppel_speller_ray.functions.shingles import jaccard_sorted


def _sets_to_flat(sets):
    flat = np.concatenate([np.asarray(sorted(s), np.uint64) for s in sets]) if sets else np.empty(0, np.uint64)
    off = np.zeros(len(sets) + 1, np.int64)
    np.cumsum([len(s) for s in sets], out=off[1:])
    return flat, off


def test_determinism_and_identity():
    rng = np.random.default_rng(7)
    A = set(rng.integers(0, 10**6, 300).tolist())
    a, b = make_perms(128, 42)
    flat, off = _sets_to_flat([A, A])
    sig = minhash_flat(flat, off, a, b)
    assert (sig[0] == sig[1]).all()
    sig2 = minhash_flat(flat, off, a, b)
    assert (sig == sig2).all()
    keys = lsh_bucket_keys(sig, 16, 8, 42)
    assert keys.shape == (2, 16)
    assert (keys[0] == keys[1]).all()


def test_different_seed_different_perms():
    a1, b1 = make_perms(128, 1)
    a2, b2 = make_perms(128, 2)
    assert not (a1 == a2).all()
    assert (a1 % 2 == 1).all()


def test_estimate_tracks_jaccard():
    rng = np.random.default_rng(0)
    errs = []
    a, b = make_perms(256, 42)
    for overlap in (0.2, 0.5, 0.8, 0.95):
        base = rng.integers(0, 10**9, 400).astype(np.uint64)
        keep = int(len(base) * overlap)
        other = np.concatenate([base[:keep], rng.integers(2 * 10**9, 3 * 10**9, 400 - keep).astype(np.uint64)])
        A, B = set(base.tolist()), set(other.tolist())
        flat, off = _sets_to_flat([A, B])
        sig = minhash_flat(flat, off, a, b)
        true_j = jaccard_sorted(np.asarray(sorted(A), np.uint64), np.asarray(sorted(B), np.uint64))
        est = minhash_jaccard_estimate(sig[0], sig[1])
        errs.append(abs(true_j - est))
    assert max(errs) < 0.12, errs


def test_empty_rows():
    flat, off = _sets_to_flat([set(), {1, 2, 3}, set()])
    a, b = make_perms(64, 42)
    sig = minhash_flat(flat, off, a, b)
    assert (sig[0] == np.iinfo(np.uint64).max).all()
    assert (sig[2] == np.iinfo(np.uint64).max).all()
    assert not (sig[1] == np.iinfo(np.uint64).max).all()


def test_bucket_collision_probability():
    """Near-identical sets share ≥1 of 16 band keys; unrelated sets share none."""
    rng = np.random.default_rng(3)
    base = rng.integers(0, 10**9, 500).astype(np.uint64)
    near = np.concatenate([base[:480], rng.integers(2 * 10**9, 3 * 10**9, 20).astype(np.uint64)])
    far = rng.integers(5 * 10**9, 6 * 10**9, 500).astype(np.uint64)
    sets = [set(base.tolist()), set(near.tolist()), set(far.tolist())]
    flat, off = _sets_to_flat(sets)
    a, b = make_perms(128, 42)
    sig = minhash_flat(flat, off, a, b)
    keys = lsh_bucket_keys(sig, 16, 8, 42)
    assert (keys[0] == keys[1]).any()      # j≈0.92 → collision virtually certain
    assert not (keys[0] == keys[2]).any()  # j≈0 → no collision
