"""Cross-doc boilerplate n-gram detection (`boilerplate` query) and the
word-n-gram rolling-hash kernel (`functions/shingles.py:word_ngram_hashes`):
hand-computed truth, transposition non-collision, and DuckDB parity."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from doppel_speller_ray.functions.shingles import word_ngram_hashes


def test_kernel_counts_and_boundaries():
    idx, g = word_ngram_hashes(
        pa.array(["a b c d e f", "a b c d e", "short one", "", None,
                  "a b c d e f"]), 5)
    # row0: 2 grams, row1: 1, row2/3/4: 0, row5: 2 (identical to row0's)
    assert idx.tolist() == [0, 0, 1, 5, 5]
    assert g[0] == g[3] and g[1] == g[4]
    # overlapping grams within a row differ
    assert g[0] != g[1]


def test_kernel_order_sensitivity():
    """Adjacent-word transpositions must NOT collide (the bare
    splitmix64(a ^ b) combine is symmetric in its first step — this
    regression caused a 2x hot-gram overcount before position salting)."""
    _, g1 = word_ngram_hashes(pa.array(["x y c d e"]), 5)
    _, g2 = word_ngram_hashes(pa.array(["y x c d e"]), 5)
    assert g1[0] != g2[0]
    # transposition at a later position too
    _, g3 = word_ngram_hashes(pa.array(["x y c e d"]), 5)
    assert g1[0] != g3[0]


def test_kernel_seed_changes_hashes():
    _, a = word_ngram_hashes(pa.array(["a b c d e"]), 5, seed=1)
    _, b = word_ngram_hashes(pa.array(["a b c d e"]), 5, seed=2)
    assert a[0] != b[0]


def _run(texts, ray_session):
    """Drive q_boilerplate through real Ray (it uses ray.put internally)."""
    import ray.data as rd

    import doppel_speller_ray.pipelines.queries as q

    t = pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                  "text": pa.array(texts, type=pa.string())})
    ds = rd.from_arrow(t)
    orig = q._docs
    q._docs = lambda sf, cols=None: ds.select_columns(cols)
    try:
        out = q.QUERIES["boilerplate"]("ignored").to_pandas()
    finally:
        q._docs = orig
    return t, out.sort_values("doc_id").reset_index(drop=True)


def test_hand_computed(ray_session):
    texts = [
        "p q r s t u",          # gram "p q r s t","q r s t u"; first shared with doc2
        "z1 z2 z3 z4 z5",       # unique gram
        "p q r s t x",          # shares "p q r s t" with doc0
        "a b",                  # too short -> 0 grams
    ]
    _, out = _run(texts, None)
    # doc0: "p q r s t","q r s t u"; doc2: "p q r s t","q r s t x"
    assert out["n_grams"].tolist() == [2, 1, 2, 0]
    # hot gram = "p q r s t" (df=2): one occurrence each in doc0 and doc2
    assert out["n_boiler"].tolist() == [1, 0, 1, 0]
    assert out["boiler_ratio"].tolist() == [0.5, 0.0, 0.5, 0.0]


def test_duckdb_parity(ray_session):
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 30)))
             for _ in range(120)]
    texts += ["", "  ", None]
    t, out = _run(texts, None)
    con = duckdb.connect()
    con.register("documents", t)
    import doppel_speller_ray.pipelines.queries as q

    sql = con.execute(q.ORACLES["boilerplate"] + " ORDER BY 1").df()
    pd.testing.assert_frame_equal(out, sql, check_dtype=False, rtol=1e-9)
