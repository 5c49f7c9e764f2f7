"""Hand-case tests for the quality tier (queries_quality.py) and the
cardinality-sketch tier (queries_sketches.py) — the paths the planted
DuckDB oracles cannot force: 64-bit hash-collision splits, prune geometry,
sketch accuracy bounds, exact-below-k behavior. Pure-kernel tests: no Ray
session needed."""

import numpy as np
import pyarrow as pa
import pytest

from doppel_speller_ray.pipelines.queries_quality import (
    _repetition_batch,
    _rep_quality_partition,
    _semdedup_prune,
)
from doppel_speller_ray.pipelines.queries_sketches import (
    _KMV_K,
    _hll_estimate,
    _hll_partial,
    _kmv_estimate,
    _kmv_partial,
)


# --- repetition signals ------------------------------------------------------


def _rep(texts):
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = _repetition_batch(t)
    return {c: out[c].to_pylist() for c in out.column_names}


def test_repetition_hand_case():
    # "spam spam ham": dup word tokens = 2 (both spams), n=3 -> 2/3
    # bigrams: (spam,spam) x1, (spam,ham) x1 -> no dup bigram;
    # top bigram: count tie 1 -> lexicographically smaller (ham < spam ->
    # (spam,ham) vs (spam,spam): first words equal, ham < spam) ->
    # (spam,ham), cover = (4+3)=7 chars of tot 4+4+3=11
    r = _rep(["spam spam ham"])
    assert r["dup_word_frac"][0] == pytest.approx(2 / 3, abs=1e-6)
    assert r["top_bigram_frac"][0] == pytest.approx(7 / 11, abs=1e-6)
    assert r["dup_bigram_frac"][0] == 0.0


def test_repetition_dup_bigram():
    # "a b a b a": bigrams ab, ba, ab, ba -> all duplicated, cover
    # = 2*(1+1) + 2*(1+1) = 8 over tot_chars 5; dup words: all 5 tokens
    r = _rep(["a b a b a"])
    assert r["dup_word_frac"][0] == 1.0
    assert r["dup_bigram_frac"][0] == pytest.approx(8 / 5, abs=1e-6)


def test_repetition_degenerate():
    r = _rep(["", "x", "unique words only here"])
    assert r["dup_word_frac"] == [0.0, 0.0, 0.0]
    assert r["dup_bigram_frac"] == [0.0, 0.0, 0.0]


# --- cluster representatives: collision-split path ---------------------------


def test_rep_quality_collision_split():
    # two DIFFERENT texts sharing a forged 64-bit hash: the run must split
    # by actual text, each piece keeping its own quality-argmax rep
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "norm_text": pa.array(["aaa", "aaa", "bbb", "bbb"], pa.string()),
        "norm_hash": pa.array([7, 7, 7, 7], pa.int64()),  # all collide
        "q_micro": pa.array([100, 900, 500, 500], pa.int64()),
    })
    out = _rep_quality_partition(t)
    got = {r["rep_id"]: (r["group_size"], r["quality_score"])
           for r in out.to_pylist()}
    # aaa group: id2 wins on quality; bbb group: tie -> lower id 3
    assert got == {2: (2, 0.0009), 3: (2, 0.0005)}


def test_rep_quality_plain_runs():
    t = pa.table({
        "doc_id": pa.array([10, 11, 12], pa.int64()),
        "norm_text": pa.array(["x", "x", "y"], pa.string()),
        "norm_hash": pa.array([1, 1, 2], pa.int64()),
        "q_micro": pa.array([5, 5, 9], pa.int64()),
    })
    out = {r["rep_id"]: r["group_size"] for r in
           _rep_quality_partition(t).to_pylist()}
    assert out == {10: 2, 12: 1}


# --- semdedup prune geometry --------------------------------------------------


def _prune(ids, vecs, cid=0):
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "cluster_id": pa.array([cid] * len(ids), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })
    out = _semdedup_prune(t)
    return dict(zip(out["vec_id"].to_pylist(), out["keep"].to_pylist()))


def test_semdedup_prune_geometry():
    # b duplicates a (kept: a earlier), c orthogonal (kept), d = scaled a
    # (cosine 1 with a -> removed)
    keep = _prune([1, 2, 3, 4],
                  [[1, 0], [1, 0], [0, 1], [2, 0]])
    assert keep == {1: True, 2: False, 3: True, 4: False}


def test_semdedup_prune_chain_not_transitive():
    # removal is vs ALL earlier ids, not only kept ones: b ~ a (removed),
    # c ~ b but not ~ a -> c is still removed (earlier b is within tau)
    a = np.array([1.0, 0.0])
    b = np.array([0.9999, 0.0141])  # cos(a,b) ~ 0.9999 >= tau
    c = np.array([0.9996, 0.0282])  # cos(b,c) >= tau, cos(a,c) ~ 0.9996
    keep = _prune([1, 2, 3], [a, b, c])
    assert keep[1] is True and keep[2] is False
    # c has SOME earlier neighbour within tau (b, and in fact a too at
    # tau=0.98) -> removed
    assert keep[3] is False


def test_semdedup_blockwise_matches_dense():
    # blockwise GEMM must equal the dense rule on a cluster larger than one
    # column block worth of structure
    rng = np.random.default_rng(42)
    n, d = 300, 8
    base = rng.normal(size=(60, d))
    vecs = np.repeat(base, 5, axis=0) + rng.normal(scale=1e-4, size=(n, d))
    ids = np.arange(n)
    keep = _prune(ids.tolist(), vecs.tolist())
    matn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = matn @ matn.T
    expected = {}
    for i in range(n):
        expected[i] = not bool((sims[i, :i] >= 0.98).any())
    # float32 storage: recompute in the same dtype chain as the kernel
    assert sum(keep[i] != expected[i] for i in range(n)) <= 2  # ulp ties
    assert sum(not v for v in keep.values()) >= n // 2  # dups were pruned


# --- HLL ---------------------------------------------------------------------


def _sketch_tables(user_ids, event_type="e"):
    return pa.table({
        "event_type": pa.array([event_type] * len(user_ids), pa.string()),
        "user_id": pa.array(user_ids, pa.int64()),
    })


def test_hll_accuracy_bound():
    # p=6 -> SE ~ 1.04/sqrt(64) = 13%; allow 3.5 sigma
    for n in (50, 500, 5000):
        part = _hll_partial(_sketch_tables(list(range(n))))
        est = _hll_estimate(part)["approx_distinct"][0].as_py()
        assert abs(est - n) / n < 0.455, (n, est)


def test_hll_merge_equals_single_pass():
    ids = list(range(1000))
    whole = _hll_partial(_sketch_tables(ids))
    parts = pa.concat_tables([_hll_partial(_sketch_tables(ids[:300])),
                              _hll_partial(_sketch_tables(ids[300:]))])
    est_w = _hll_estimate(whole)["approx_distinct"][0].as_py()
    est_p = _hll_estimate(parts)["approx_distinct"][0].as_py()
    assert est_w == est_p  # register max is associative -> identical


def test_hll_duplicates_invariant():
    ids = list(range(200))
    once = _hll_estimate(_hll_partial(_sketch_tables(ids)))
    thrice = _hll_estimate(_hll_partial(_sketch_tables(ids * 3)))
    assert once["approx_distinct"][0].as_py() == \
        thrice["approx_distinct"][0].as_py()


# --- KMV ---------------------------------------------------------------------


def test_kmv_exact_below_k():
    for n in (1, 10, _KMV_K - 1):
        part = _kmv_partial(_sketch_tables(list(range(n))))
        est = _kmv_estimate(part)["approx_distinct"][0].as_py()
        assert est == float(n)


def test_kmv_accuracy_bound():
    for n in (500, 5000):
        part = _kmv_partial(_sketch_tables(list(range(n))))
        est = _kmv_estimate(part)["approx_distinct"][0].as_py()
        assert abs(est - n) / n < 0.45, (n, est)


def test_kmv_merge_equals_single_pass():
    ids = list(range(2000))
    whole = _kmv_partial(_sketch_tables(ids))
    parts = pa.concat_tables([_kmv_partial(_sketch_tables(ids[:700])),
                              _kmv_partial(_sketch_tables(ids[700:]))])
    est_w = _kmv_estimate(whole)["approx_distinct"][0].as_py()
    est_p = _kmv_estimate(parts)["approx_distinct"][0].as_py()
    assert est_w == est_p  # bottom-k union is associative


def test_kmv_partial_caps_per_group():
    t = pa.table({
        "event_type": pa.array(["a"] * 500 + ["b"] * 3, pa.string()),
        "user_id": pa.array(list(range(500)) + [7, 7, 9], pa.int64()),
    })
    part = _kmv_partial(t)
    et = np.asarray(part["event_type"].to_numpy(zero_copy_only=False),
                    dtype=object)
    assert (et == "a").sum() == _KMV_K      # capped
    assert (et == "b").sum() == 2           # distinct hashes only


# --- Count-Min heavy hitters -------------------------------------------------

from doppel_speller_ray.pipelines.queries_sketches import (  # noqa: E402
    _CMS_D,
    _CMS_THETA,
    _CMS_W,
    _cms_partial,
    q_cms_heavy_hitters,
)


def _docs_table(texts):
    return pa.table({"text": pa.array(texts, pa.string())})


def test_cms_partial_candidate_rule():
    # "spam" is 6 of 12 occurrences (0.5 >= theta) -> local candidate;
    # every other word is 1/12 = 0.083 > theta=0.033 too (tiny batch), so
    # use a batch where a word is genuinely below theta: 1 of 40
    texts = ["spam " * 6 + " ".join(f"w{i:02d}" for i in range(34))]
    part = _cms_partial(_docs_table(texts))
    kinds = np.asarray(part["kind"].to_numpy(zero_copy_only=False), dtype=object)
    words = np.asarray(part["word"].to_numpy(zero_copy_only=False), dtype=object)
    cands = set(words[kinds == "cand"])
    assert "spam" in cands
    assert "w00" not in cands          # 1/40 = 0.025 < 0.033
    tot = part.filter(pa.compute.equal(part["kind"], "tot"))["cnt"][0].as_py()
    assert tot == 40
    # CMS row sums each equal the batch total
    slots = part["slot"].to_numpy(zero_copy_only=False)
    cnts = part["cnt"].to_numpy(zero_copy_only=False)
    cms_mask = kinds == "cms"
    for r in range(_CMS_D):
        row = (slots[cms_mask] // _CMS_W) == r
        assert cnts[cms_mask][row].sum() == 40


def test_cms_heavy_hitters_exact_e2e(ray_session, tmp_path):
    import pyarrow.parquet as pq

    # skewed corpus split over many docs/batches: brute-force ground truth
    rng = np.random.default_rng(7)
    vocab = np.array([f"tok{i:02d}" for i in range(40)])
    weights = np.ones(40); weights[0] = 120.0; weights[1] = 60.0
    weights /= weights.sum()
    texts = [" ".join(rng.choice(vocab, size=50, p=weights)) for _ in range(80)]
    pq.write_table(pa.table({"doc_id": pa.array(range(80), pa.int64()),
                             "text": pa.array(texts, pa.string())}),
                   f"{tmp_path}/documents.parquet")
    from collections import Counter
    cnt = Counter(w for t in texts for w in t.split())
    total = sum(cnt.values())
    expect = {(w, n) for w, n in cnt.items() if n >= _CMS_THETA * total}
    out = q_cms_heavy_hitters(str(tmp_path)).to_pandas()
    got = {(w, int(n)) for w, n in out[["word", "n"]].values}
    assert got == expect
    assert len(expect) >= 2          # the planted heavy words qualify
    assert len(expect) < 40          # and the tail does not
