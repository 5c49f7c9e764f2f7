"""Web-graph tier units: link extraction edge cases (`functions/html.py:
extract_links_flat`) and hand-computed checks for the packed ts-argmax and
the per-batch TF-IDF top-k kernel. The full Ray-vs-DuckDB parity for all
four `queries_web` entries runs in test_queries_oracle.py (auto-collected
from the catalog)."""

import numpy as np
import pyarrow as pa

from doppel_speller_ray.functions.html import extract_links_flat


def test_extract_links_basic_and_order():
    html = pa.array([
        '<p>x</p><a href="https://a.com/1">t</a> mid <a href="http://b.org/2">u</a>',
        "no links here",
        '<a href="https://c.net">lead</a>',
    ])
    urls, doc_idx = extract_links_flat(html)
    assert urls.to_pylist() == ["https://a.com/1", "http://b.org/2",
                                "https://c.net"]
    assert doc_idx.tolist() == [0, 0, 2]


def test_extract_links_unterminated_and_empty():
    html = pa.array([
        '<a href="https://no-close-quote.com/x>t</a>',  # no closing quote
        '<a href="">empty</a>',
        "",
    ])
    urls, doc_idx = extract_links_flat(html)
    # unterminated href: [^"]* runs to end of fragment (still one link row)
    assert urls[0].as_py().startswith("https://no-close-quote.com/x")
    assert urls[1].as_py() == ""
    assert doc_idx.tolist() == [0, 1]


def test_extract_links_binary_input():
    html = pa.array([b'<a href="https://bin.example/z">b</a>'], pa.binary())
    urls, doc_idx = extract_links_flat(html)
    assert urls.to_pylist() == ["https://bin.example/z"]
    assert doc_idx.tolist() == [0]


def test_extract_anchors_text_and_malformed():
    from doppel_speller_ray.functions.html import extract_anchors_flat

    html = pa.array([
        '<a href="https://a.com/">Home Page</a> x <a href="https://b.com/">B</a>',
        '<a href="https://unclosed.com/">never closed',   # no '<' after text
        '<a href="https://c.com/"></a>',                  # empty anchor text
        "plain",
    ])
    urls, texts, doc_idx = extract_anchors_flat(html)
    assert urls.to_pylist() == ["https://a.com/", "https://b.com/",
                                "https://c.com/"]
    assert texts.to_pylist() == ["Home Page", "B", ""]
    # the malformed doc-1 anchor is dropped; links kernel still sees it
    assert doc_idx.tolist() == [0, 0, 2]


def test_anchor_agg_order_and_dedup(ray_session):
    """Cross-batch duplicate anchor texts collapse; output is the sorted
    distinct join (hand case computed independently of the SQL oracle)."""
    from doppel_speller_ray.pipelines.queries_web import (
        _ANCHOR_TXTS, _anchor_html)

    # doc ids chosen so two docs emit the same (dst, text) anchor:
    # doc i and i + lcm(97, 17) = i + 1649 collide on all three anchors
    import re
    pages = _anchor_html(np.array([7, 7 + 97 * 17]))
    a0 = sorted(set(re.findall(r'>(t\d+)<', pages[0])))
    a1 = sorted(set(re.findall(r'>(t\d+)<', pages[1])))
    assert a0 == a1  # the planted collision
    assert all(int(t[1:]) < _ANCHOR_TXTS for t in a0)


def test_url_dedup_packed_argmax_picks_latest():
    """The packed (ts << 32 | id) max must select the capture with the
    greatest pseudo-ts, and break exact-ts ties by the greater doc_id."""
    from doppel_speller_ray.pipelines.queries_web import (
        _ID_SPAN, _TS_MOD, _TS_MULT)

    ids = np.array([5, 102, 587], dtype=np.int64)  # all % 97 == 5
    keys = (ids * _TS_MULT) % _TS_MOD * _ID_SPAN + ids
    winner = ids[np.argmax(keys)]
    ts = (ids * _TS_MULT) % _TS_MOD
    assert winner == ids[np.lexsort((ids, ts))[-1]]
    assert int(max(keys)) % _ID_SPAN == winner


def test_gopher_rules_hand_case(ray_session, tmp_path):
    """A 60-word alpha doc passes; a 10-word doc fails the min-words rule;
    both get exact hand-computable stats."""
    import ray.data as rd

    from doppel_speller_ray.pipelines.queries_web import q_gopher_quality

    good = " ".join(["the", "cat", "sat", "have", "with"] * 12)  # 60 words
    bad = "zz " * 10
    tbl = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array([good, bad])})
    import pyarrow.parquet as pq

    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = q_gopher_quality(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_words"] == 60
    assert bool(out.loc[1, "passes"]) is True
    assert out.loc[1, "stop_hits"] == 36  # (the, have, with) × 12
    assert out.loc[2, "n_words"] == 10
    assert bool(out.loc[2, "passes"]) is False
    assert out.loc[2, "alpha_frac"] == 1.0


def test_tfidf_topk_hand_case(ray_session, tmp_path):
    """Three tiny docs: the word unique to one doc must outrank the common
    word, with the (score DESC, word ASC) tiebreak."""
    import pyarrow.parquet as pq

    from doppel_speller_ray.pipelines.queries_web import q_tfidf_topk

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["apple banana", "apple cherry", "apple apple"]),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = q_tfidf_topk(str(tmp_path), k=1).to_pandas().set_index("doc_id")
    # idf(apple)=ln(3/3)=0, idf(banana)=idf(cherry)=ln(3)>0
    assert out.loc[1, "word"] == "banana"
    assert out.loc[2, "word"] == "cherry"
    # doc 3 has only apple: score 2*0=0, still emitted as its top term
    assert out.loc[3, "word"] == "apple" and out.loc[3, "score"] == 0.0
    assert (out["rank"] == 1).all()


def test_weighted_sample_matches_bruteforce(ray_session, tmp_path):
    """Top-k A-Res selection must equal the brute-force key ranking."""
    import numpy as np
    import pyarrow.parquet as pq

    from doppel_speller_ray.functions.hashing import fmix32
    from doppel_speller_ray.pipelines.queries import q_weighted_sample

    ids = np.arange(1, 401, dtype=np.int64)
    chars = (ids % 37 + 1) * 10
    tbl = pa.table({"doc_id": pa.array(ids), "n_chars": pa.array(chars)})
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = q_weighted_sample(str(tmp_path), k=25, seed=7).to_pandas()
    u = (fmix32(ids, seed=7).astype(np.float64) + 0.5) / 2**32
    key = np.log(u) / np.maximum(chars.astype(np.float64), 1.0)
    expect = set(ids[np.argsort(key)[-25:]])
    assert set(out.doc_id) == expect
    assert len(out) == 25
    # keys descend with rank (output is the sorted top-k)
    assert (np.diff(out.es_key.to_numpy()) <= 1e-12).all()


def test_rollup_qty_hand_case(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from doppel_speller_ray.pipelines.queries import q_rollup_qty

    tbl = pa.table({
        "l_returnflag": pa.array(["A", "A", "R", "R", "R"]),
        "l_linestatus": pa.array(["F", "O", "F", "F", "O"]),
        "l_quantity": pa.array([1.0, 2.0, 3.0, 4.0, 5.0]),
    })
    pq.write_table(tbl, tmp_path / "lineitem.parquet")
    out = q_rollup_qty(str(tmp_path)).to_pandas()
    rows = {(r.lvl, r.l_returnflag, r.l_linestatus): r.sum_qty
            for r in out.itertuples()}
    assert rows[(2, "A", "F")] == 1 and rows[(2, "A", "O")] == 2
    assert rows[(2, "R", "F")] == 7 and rows[(2, "R", "O")] == 5
    assert rows[(1, "A", "ALL")] == 3 and rows[(1, "R", "ALL")] == 12
    assert rows[(0, "ALL", "ALL")] == 15
    assert len(out) == 7


# ---------------------------------------------------------------------------
# Property tests (hypothesis) — kernel vs pure-Python reference
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


def _ref_links(pages: list[str]) -> list[tuple[int, str]]:
    import re

    out = []
    for i, s in enumerate(pages):
        for m in re.finditer(r'<a href="([^"]*)', s):
            out.append((i, m.group(1)))
    return out


@given(st.lists(st.text(alphabet='ab<>"/:=. href', max_size=60), max_size=12))
@settings(max_examples=150, deadline=None)
def test_extract_links_matches_re_reference(pages):
    """Arbitrary tag soup: the Arrow split-flatten extraction must equal a
    re.finditer reference, including order and doc attribution.

    Caveat encoded here: the extractor splits on the literal '<a href="',
    so OVERLAPPING occurrences (impossible in real HTML, where matches are
    separated by the closing quote) are consumed left-to-right exactly as
    re.finditer does — the two semantics agree."""
    urls, idx = extract_links_flat(pa.array(pages, pa.string()))
    got = list(zip(idx.tolist(), urls.to_pylist()))
    assert got == _ref_links(pages)


@given(st.lists(st.integers(min_value=0, max_value=2**31), min_size=1,
                max_size=50),
       st.integers(min_value=0, max_value=2**31))
@settings(max_examples=100, deadline=None)
def test_weighted_key_in_range_and_deterministic(ids, seed):
    """A-Res keys are finite, strictly negative (u<1), and reproducible."""
    import numpy as np

    from doppel_speller_ray.functions.hashing import fmix32

    arr = np.array(ids, dtype=np.int64)
    u = (fmix32(arr, seed=seed).astype(np.float64) + 0.5) / 2**32
    assert ((u > 0) & (u < 1)).all()
    w = np.maximum((arr % 1000).astype(np.float64), 1.0)
    key = np.log(u) / w
    assert np.isfinite(key).all() and (key < 0).all()
    u2 = (fmix32(arr.copy(), seed=seed).astype(np.float64) + 0.5) / 2**32
    assert (u == u2).all()


def test_web_tier_partitioning_invariance(ray_session, tmp_path):
    """Identical rows whether documents arrives as ONE parquet file or as
    a directory of 7 fragment files (different Ray block structure) — the
    house invariance contract for every aggregate in the tier."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from doppel_speller_ray.pipelines.queries import q_weighted_sample
    from doppel_speller_ray.pipelines.queries_web import (
        q_gopher_quality, q_tfidf_topk, q_url_dedup_latest)

    rng = np.random.default_rng(3)
    n = 350
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = [" ".join(rng.choice(words, rng.integers(5, 40)))
             for _ in range(n)]
    tbl = pa.table({"doc_id": pa.array(np.arange(1, n + 1), pa.int64()),
                    "text": pa.array(texts),
                    "n_chars": pa.array([len(t) for t in texts], pa.int64())})
    one = tmp_path / "one"
    many = tmp_path / "many"
    one.mkdir(); (many / "documents.parquet").mkdir(parents=True)
    pq.write_table(tbl, one / "documents.parquet")
    for i in range(7):
        pq.write_table(tbl.slice(i * 50, 50),
                       many / "documents.parquet" / f"part-{i}.parquet")

    def canon(ds):
        df = ds.to_pandas()
        return df[sorted(df.columns)].sort_values(
            sorted(df.columns)).reset_index(drop=True)

    from doppel_speller_ray.pipelines.queries_corpus import (
        q_chunk_passages, q_longest_repeat, q_sa_substring_pairs)
    from doppel_speller_ray.pipelines.queries_web import (
        q_anchor_text, q_lm_score, q_pagerank, q_pmi_bigrams,
        q_snapshot_changes)

    for fn in (q_url_dedup_latest, q_gopher_quality, q_tfidf_topk,
               q_weighted_sample, q_lm_score, q_pagerank,
               q_pmi_bigrams, q_anchor_text, q_snapshot_changes,
               q_longest_repeat, q_sa_substring_pairs, q_chunk_passages):
        a, b = canon(fn(str(one))), canon(fn(str(many)))
        pd.testing.assert_frame_equal(a, b), fn.__name__


def test_lm_score_hand(ray_session, tmp_path):
    """Hand-built Laplace bigram LM: ref doc 10 = 'a b a c' → V=3,
    c1(a)=2, c1(b)=1, c2 all 1. Scored doc 13 'a b z' →
    mean(-ln(2/5), -ln(1/4)); doc 14 all-OOV → -ln(1/3); <2-word,
    empty and NULL docs are excluded; the ref doc is never scored."""
    import math

    import pyarrow.parquet as pq
    import pytest

    from doppel_speller_ray.pipelines.queries_web import q_lm_score

    tbl = pa.table({
        "doc_id": pa.array([10, 13, 14, 15, 16, 17, 18], pa.int64()),
        "text": pa.array(["a b a c", "a b z", "q r", "single", "",
                          None, "café déjà vu"], pa.string()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")
    rows = {r["doc_id"]: r["lm_score"]
            for r in q_lm_score(str(tmp_path)).take_all()}

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    assert set(rows) == {13, 14, 18}
    assert rows[13] == r6((-math.log(2 / 5) - math.log(1 / 4)) / 2)
    assert rows[14] == r6(-math.log(1 / 3))        # both words OOV
    assert rows[18] == r6(-math.log(1 / 3))        # accents folded → OOV


def test_pagerank_invariants(ray_session, tmp_path):
    """Probability-mass conservation (Σrank = 1 up to rounding), every
    node positive, and the pure-sink node (a dst that is never a src)
    exists and received dangling-redistributed mass only."""
    import pyarrow.parquet as pq

    from doppel_speller_ray.pipelines.queries_web import q_pagerank

    # doc_ids 0..9: dsts are (id*k) % 10 + 1 ∈ 1..10 → node 10 is a pure
    # sink (never a src), node 0 is a pure source (never a dst).
    pq.write_table(pa.table({"doc_id": pa.array(range(10), pa.int64()),
                             "text": pa.array(["x"] * 10)}),
                   tmp_path / "documents.parquet")
    df = q_pagerank(str(tmp_path)).to_pandas()
    assert len(df) == 11                      # 0..9 sources + sink 10
    assert abs(df.pagerank.sum() - 1.0) < 1e-4
    assert (df.pagerank > 0).all()
    sink = df.set_index("node_id").pagerank
    # the pure source receives only teleport + dangling mass — strictly
    # less than any linked-to node's rank
    assert sink[0] <= sink.drop(0).min()


def test_snapshot_changes_lag_hand_case(ray_session, tmp_path):
    """Hand-computed change walk: page 0's captures in pseudo-ts order with
    planted content classes — n_changes counts ts-ORDERED transitions, not
    id-ordered ones."""
    import pyarrow.parquet as pq

    from doppel_speller_ray.pipelines.queries_web import (
        _TS_MOD, _TS_MULT, q_snapshot_changes)

    ids = np.array([0, 97, 194, 291], dtype=np.int64)  # 4 captures of page 0
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(["x"] * len(ids))}),
                   f"{tmp_path}/documents.parquet")
    out = q_snapshot_changes(str(tmp_path)).to_pandas()
    assert len(out) == 1 and out.n_snapshots.iloc[0] == 4
    ts = (ids * _TS_MULT) % _TS_MOD
    h = (ids // 97) % 2
    order = np.lexsort((ids, ts))
    expect = int((h[order][1:] != h[order][:-1]).sum())
    assert out.n_changes.iloc[0] == expect


def test_bm25_topk_hand_case(ray_session, tmp_path):
    """BM25 vs a by-hand computation: saturation (k1) and length
    normalization (b, dl/avgdl) must match the closed-form formula, with
    the Robertson idf rounded to 6 before scoring (the shared contract)."""
    import math

    import pyarrow.parquet as pq
    import pytest

    from doppel_speller_ray.pipelines.queries_web import (
        _BM25_B,
        _BM25_K1,
        q_bm25_topk,
    )

    tbl = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["apple banana banana", "apple cherry"]),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = q_bm25_topk(str(tmp_path), k=2).to_pandas()
    n, avgdl = 2, 5 / 2

    def expect(tf, df, dl):
        idf = math.floor(math.log((n - df + 0.5) / (df + 0.5) + 1.0)
                         * 1e6 + 0.5) / 1e6
        s = (idf * (tf * (_BM25_K1 + 1.0))) / (
            tf + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * (dl / avgdl)))
        return math.floor(s * 1e6 + 0.5) / 1e6

    got = {(r.doc_id, r.word): (r.score, r.rank) for r in out.itertuples()}
    assert got[(1, "banana")] == (pytest.approx(expect(2, 1, 3)), 1)
    assert got[(1, "apple")] == (pytest.approx(expect(1, 2, 3)), 2)
    assert got[(2, "cherry")] == (pytest.approx(expect(1, 1, 2)), 1)
    assert got[(2, "apple")] == (pytest.approx(expect(1, 2, 2)), 2)
    # the rare term's saturated score beats the common term's in both docs
    assert got[(1, "banana")][0] > got[(1, "apple")][0]
