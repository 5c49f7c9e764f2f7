"""Hand-computed unit tests for the LLM-corpus tier
(pipelines/queries_corpus.py): PII patterns, bloom-filter membership,
prefix-sum packing, line dedup, decontamination. Oracle parity at sf0.01
is covered separately by test_queries_oracle.py (the catalog import picks
the new entries up automatically)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from doppel_speller_ray.pipelines.queries_corpus import (_PII_PATTERNS,
                                                         q_decontaminate,
                                                         q_line_dedup,
                                                         q_pack_sequences)


def _redact(s: str) -> tuple[str, int]:
    arr = pa.array([s], pa.string())
    n = 0
    for pat, repl in _PII_PATTERNS:
        n += pc.count_substring_regex(arr, pattern=pat)[0].as_py()
        arr = pc.replace_substring_regex(arr, pattern=pat, replacement=repl)
    return arr[0].as_py(), n


def test_pii_patterns_hand_cases():
    assert _redact("mail a.b+c@x-y.co now") == ("mail <EMAIL> now", 1)
    assert _redact("at 10.0.0.1") == ("at <IP>", 1)
    assert _redact("ring 555-0199!") == ("ring <PHONE>!", 1)
    # all three in one string
    out, n = _redact("u@e.io 1.2.3.4 555-1234")
    assert out == "<EMAIL> <IP> <PHONE>" and n == 3
    # non-matches: short phone, no-TLD email, 3-octet ip
    assert _redact("555-12 a@b 1.2.3 x") == ("555-12 a@b 1.2.3 x", 0)


def test_bloom_no_false_negatives_and_low_fp():
    # Reimplements the query's double-hashing bitmap on a small filter and
    # checks the structural guarantee (no false negatives) + FP rate.
    m_bits, k = 1 << 16, 4
    words = m_bits // 64

    def positions(h):
        hu = h.view(np.uint64)
        h1 = hu & np.uint64(m_bits - 1)
        h2 = ((hu >> np.uint64(33)) | np.uint64(1)) & np.uint64(m_bits - 1)
        i = np.arange(k, dtype=np.uint64)
        with np.errstate(over="ignore"):
            return (h1[:, None] + i[None, :] * h2[:, None]) & np.uint64(m_bits - 1)

    rng = np.random.default_rng(7)
    inserted = rng.integers(0, 2**63, 2000, dtype=np.int64)
    probes = rng.integers(0, 2**63, 20000, dtype=np.int64)
    bits = np.zeros(words, dtype=np.uint64)
    pos = positions(inserted).ravel()
    np.bitwise_or.at(bits, pos >> np.uint64(6), np.uint64(1) << (pos & np.uint64(63)))

    def member(h):
        p = positions(h)
        hit = np.ones(len(h), dtype=bool)
        for j in range(k):
            pj = p[:, j]
            hit &= (bits[pj >> np.uint64(6)] >> (pj & np.uint64(63))) & np.uint64(1) != 0
        return hit

    assert member(inserted).all()  # the bloom guarantee
    fresh = probes[~np.isin(probes, inserted)]
    fp = member(fresh).mean()
    # n=2000, m=65536, k=4 → theoretical FP ≈ (1-e^{-kn/m})^k ≈ 0.024%... loose bound:
    assert fp < 0.02, fp


@pytest.fixture()
def mini_docs(tmp_path):
    """documents.parquet with hand-chosen ids/texts for the corpus ops."""
    def write(rows):
        t = pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["t"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1] or "") for r in rows], pa.int32()),
        })
        import pyarrow.parquet as pq

        pq.write_table(t, tmp_path / "documents.parquet")
        return str(tmp_path)

    return write


def test_pack_sequences_hand(ray_session, mini_docs):
    # tokens: doc0=3, doc1=2, doc2=4, doc5=1 → exclusive prefix 0,3,5,9
    # budget 4 → seq 0,0,1,2
    sf = mini_docs([(0, "a b c"), (1, "d e"), (2, "f g h i"), (5, "j")])
    out = {r["doc_id"]: (r["n_tokens"], r["seq_id"])
           for r in q_pack_sequences(sf, budget=4, range_width=2).take_all()}
    assert out == {0: (3, 0), 1: (2, 0), 2: (4, 1), 5: (1, 2)}


def test_line_dedup_hand(ray_session, mini_docs):
    # doc ids 0 and 7 share hdr variant 0; 1 and 8 share hdr variant 1;
    # docs 0/7 also share the SAME body → body removed; unique bodies kept.
    sf = mini_docs([(0, "same body"), (7, "same body"),
                    (1, "uniq one"), (8, "uniq two")])
    out = {r["doc_id"]: r["clean_text"] for r in q_line_dedup(sf).take_all()}
    # headers/footers: variant = id%7 / id%5. ids 0,7 → hdr 0 shared (df2);
    # footers 0%5=0, 7%5=2, 1%5=1, 8%5=3 all unique → kept.
    assert out[0] == "footer fine print 0"
    assert out[7] == "footer fine print 2"
    assert out[1] == "uniq one\nfooter fine print 1"
    assert out[8] == "uniq two\nfooter fine print 3"


def test_decontaminate_hand(ray_session, mini_docs):
    # doc 0 (id%20==0) is benchmark: 6 words → grams exist.
    # doc 3 (id%10==3) gets benchmark-0's first-5-word snippet appended →
    # contaminated. doc 1 shares nothing → clean. doc 23 (id%10==3) pulls
    # snippet from benchmark 20.
    sf = mini_docs([
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "one two three four five six"),
        (3, "hello worlds apart entirely disjoint words"),
        (20, "red orange yellow green blue indigo"),
        (23, "moon sun star comet nebula dust"),
    ])
    out = {r["doc_id"]: r["contaminated"]
           for r in q_decontaminate(sf).take_all()}
    assert set(out) == {1, 3, 23}  # benchmarks excluded from output
    assert out[3] is True and out[23] is True and out[1] is False


def test_lsh_similarity_join_bipartite(ray_session):
    """Hand-built: right rows match their near-identical left; SAME-side
    near-dups never pair (bipartite contract)."""
    import ray.data as rd

    from doppel_speller_ray.config import DedupConfig
    from doppel_speller_ray.pipelines.fuzzy_join import lsh_similarity_join

    base_a = "the quick brown fox jumps over the lazy dog again and again today"
    base_b = "completely different content about distributed prefix sums and arrow"
    left = rd.from_items([
        {"doc_id": 1, "text": base_a},
        {"doc_id": 2, "text": base_a + " extra"},   # near-dup of 1, SAME side
        {"doc_id": 3, "text": base_b},
    ])
    right = rd.from_items([
        {"doc_id": 101, "text": base_a + "!"},
        {"doc_id": 103, "text": base_b.replace("arrow", "arow")},
        {"doc_id": 105, "text": "unrelated text that matches nothing at all here"},
    ])
    out = lsh_similarity_join(left, right, DedupConfig(max_chars=None))
    rows = {r["right_id"]: r["left_id"] for r in out.take_all()}
    assert rows[101] in (1, 2)   # both lefts are near-identical; one wins
    assert rows[103] == 3
    assert 105 not in rows       # nothing similar on the left
    # bipartite: left ids never appear as right_id
    assert all(rid > 100 for rid in rows)


def test_lsh_join_best_only_false_returns_all(ray_session):
    import ray.data as rd

    from doppel_speller_ray.config import DedupConfig
    from doppel_speller_ray.pipelines.fuzzy_join import lsh_similarity_join

    txt = "a shared very long base sentence with plenty of repeated tokens inside"
    left = rd.from_items([{"doc_id": 1, "text": txt},
                          {"doc_id": 2, "text": txt + " x"}])
    right = rd.from_items([{"doc_id": 101, "text": txt + " y"}])
    all_rows = lsh_similarity_join(
        left, right, DedupConfig(max_chars=None), best_only=False).take_all()
    assert {r["left_id"] for r in all_rows} == {1, 2}
    best = lsh_similarity_join(
        left, right, DedupConfig(max_chars=None), best_only=True).take_all()
    assert len(best) == 1 and best[0]["right_id"] == 101


def test_lsh_join_forced_join_path_matches_broadcast(ray_session):
    """broadcast_payload_max_bytes=0 forces the chained hash-join attach
    (the both-sides-large scale path); its rows must be identical to the
    default broadcast attach's."""
    import ray.data as rd

    from doppel_speller_ray.config import DedupConfig
    from doppel_speller_ray.pipelines.fuzzy_join import lsh_similarity_join

    txt = "a shared very long base sentence with plenty of repeated tokens inside"
    left = rd.from_items([
        {"doc_id": 1, "text": txt},
        {"doc_id": 2, "text": txt + " x"},
        {"doc_id": 3, "text": "totally different words about nothing alike"},
    ])
    right = rd.from_items([{"doc_id": 101, "text": txt + " y"}])

    def rows(cfg):
        out = lsh_similarity_join(left, right, cfg, best_only=False)
        return sorted(
            (r["right_id"], r["left_id"], round(r["jaccard"], 5),
             r["lev_ratio"], r["oversized"]) for r in out.take_all())

    assert rows(DedupConfig(max_chars=None)) == \
        rows(DedupConfig(max_chars=None, broadcast_payload_max_bytes=0))


def test_events_sliding_hand(ray_session, tmp_path):
    """3 events in hours 0,0,2 → windows: h0{2}, h1{2}, h2{3}, h3{1}, h4{1}."""
    import pyarrow.parquet as pq

    from doppel_speller_ray.pipelines.queries_corpus import q_events_sliding

    base = np.datetime64("2024-01-01T00:00:00", "us")
    hour = np.timedelta64(3600, "s")
    t = pa.table({
        "ts": pa.array([base + hour // 2, base + hour // 3, base + 2 * hour],
                       pa.timestamp("us")),
        "value": pa.array([1.0, 2.0, 4.0]),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = {str(r["hour"]): (r["n_events"], r["sum_value"])
           for r in q_events_sliding(str(tmp_path)).take_all()}
    assert out["2024-01-01 00:00:00"] == (2, 3.0)
    assert out["2024-01-01 01:00:00"] == (2, 3.0)
    assert out["2024-01-01 02:00:00"] == (3, 7.0)
    assert out["2024-01-01 03:00:00"] == (1, 4.0)
    assert out["2024-01-01 04:00:00"] == (1, 4.0)


def test_prefix_sum_ops_partitioning_invariance(ray_session, mini_docs):
    """shuffle_rank / pack_sequences claim retry/repartition stability:
    the output must be identical however the input is blocked."""
    from doppel_speller_ray.pipelines.queries_corpus import q_shuffle_rank

    rows = [(i, " ".join(["w"] * (1 + i % 5))) for i in range(0, 40, 3)]
    sf = mini_docs(rows)

    def run(fn, **kw):
        return sorted((r["doc_id"], tuple(sorted(r.items())))
                      for r in fn(sf, **kw).take_all())

    base_rank = run(q_shuffle_rank)
    base_pack = run(q_pack_sequences, budget=7, range_width=4)

    # re-run with the input fragmented into many tiny blocks — patch the
    # BINDING queries_corpus actually calls (it imported _docs by name)
    import ray.data as rd

    import doppel_speller_ray.pipelines.queries_corpus as QC

    orig = QC._docs
    try:
        QC._docs = lambda sf_dir, columns=None: rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=columns,
            override_num_blocks=7)
        assert run(q_shuffle_rank) == base_rank
        assert run(q_pack_sequences, budget=7, range_width=4) == base_pack
    finally:
        QC._docs = orig
    # ranks are a permutation 0..n-1
    ranks = sorted(dict(dict(x[1]))["rank"] for x in base_rank)
    assert ranks == list(range(len(base_rank)))


def test_chunk_passages_window_boundaries(ray_session, tmp_path):
    """Hand-checked window/stride math at the exact-W and W+1 boundaries:
    n<=64 -> one chunk; n=65 -> second chunk starts at 48 with 17 words
    overlap-containing; chunks reassemble the doc (stride coverage)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from doppel_speller_ray.pipelines import queries_corpus as QC

    w64 = " ".join(f"w{i}" for i in range(64))
    w65 = " ".join(f"v{i}" for i in range(65))
    pq.write_table(pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                             "text": pa.array([w64, w65])}),
                   f"{tmp_path}/documents.parquet")
    out = QC.q_chunk_passages(str(tmp_path)).to_pandas() \
        .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    d1 = out[out.doc_id == 1]
    assert list(d1.n_words) == [64] and list(d1.chunk_id) == [0]
    d2 = out[out.doc_id == 2]
    assert list(d2.n_words) == [64, 17] and list(d2.chunk_id) == [0, 1]
    assert d2.passage.iloc[1].split(" ") == [f"v{i}" for i in range(48, 65)]


def test_split_assign_stable_under_corpus_growth(ray_session, tmp_path):
    """The property RNG/rank splits lack: a doc's split assignment is a
    pure function of its id, so growing the corpus (or re-partitioning it)
    never reassigns an existing doc. Also sanity-checks the realized
    ratios against the configured thresholds."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from doppel_speller_ray.pipelines import queries_corpus as QC

    small = tmp_path / "small"
    big = tmp_path / "big"
    small.mkdir(); big.mkdir()
    ids_small = list(range(0, 400))
    ids_big = list(range(0, 2000))  # superset, interleaved growth
    for d, ids in ((small, ids_small), (big, ids_big)):
        pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                 "text": pa.array(["x"] * len(ids))}),
                       f"{d}/documents.parquet")
    a = dict(QC.q_split_assign(str(small)).to_pandas()
             .itertuples(index=False, name=None))
    b = dict(QC.q_split_assign(str(big)).to_pandas()
             .itertuples(index=False, name=None))
    assert all(b[i] == a[i] for i in ids_small)
    frac_train = sum(1 for v in b.values() if v == "train") / len(b)
    frac_valid = sum(1 for v in b.values() if v == "valid") / len(b)
    assert abs(frac_train - QC.SPLIT_TRAIN) < 0.03
    assert abs(frac_valid - QC.SPLIT_VALID) < 0.02


def test_contam_spans_hand(ray_session, mini_docs):
    """Span-level decontamination islands: single hit, appended-snippet
    hit, two overlapping hits merged, far-apart hits split (gap > n), and
    the touching-windows boundary (gap == n) merged."""
    from doppel_speller_ray.pipelines.queries_corpus import (
        SQL_CONTAM_SPANS, q_contam_spans)

    sf = mini_docs([
        (0, "alpha beta gamma delta epsilon zeta eta"),        # benchmark
        (1, "one two three four five six seven"),              # clean
        (2, "x alpha beta gamma delta epsilon y z"),           # hit @2
        (3, "hello worlds apart entirely disjoint"),           # snippet @6
        (4, "alpha beta gamma delta epsilon zeta q r"),        # hits @1,2
        (6, "alpha beta gamma delta epsilon f1 f2 f3 f4 f5 f6 "
            "alpha beta gamma delta epsilon"),                 # @1 and @12
        (8, "alpha beta gamma delta epsilon alpha beta gamma delta "
            "epsilon x"),                                      # @1 and @6
    ])
    got = sorted((r["doc_id"], r["span_start"], r["span_end"], r["n_grams"])
                 for r in q_contam_spans(sf).take_all())
    want = [
        (2, 2, 6, 1),    # one bench 5-gram at word 2
        (3, 6, 10, 1),   # planted snippet appended after 5 words
        (4, 1, 6, 2),    # grams @1 and @2 overlap → one span
        (6, 1, 5, 1), (6, 12, 16, 1),   # gap 11 > 5 → two islands
        (8, 1, 10, 2),   # gap exactly n → windows touch → merged
    ]
    assert got == want, got

    import duckdb

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    oracle = sorted(map(tuple, con.execute(SQL_CONTAM_SPANS).fetchall()))
    assert oracle == want, oracle


def test_decontaminate_null_text_parity(ray_session, mini_docs):
    """A planted doc (doc_id % 10 == 3) with NULL text must agree between
    the Ray path (fill_null + append snippet) and the SQL oracle
    (coalesce(d.text,'') in the planting CASE) — the latent divergence
    flagged in round-4 review: without the COALESCE the SQL side's
    NULL || snip stayed NULL and the doc was silently dropped from the
    gram stream."""
    import duckdb
    import pandas as pd

    from doppel_speller_ray.pipelines.queries_corpus import (
        SQL_CONTAM_SPANS, SQL_DECONTAMINATE, q_contam_spans)

    sf = mini_docs([
        (0, "alpha beta gamma delta epsilon zeta"),   # benchmark
        (1, "one two three four five six"),           # clean
        (3, None),                                    # planted, NULL text
        (13, "hello worlds apart entirely disjoint"), # planted, normal
        (7, None),                                    # non-planted NULL
    ])
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")

    def canon(df):
        df = df[sorted(df.columns)]
        return df.sort_values(sorted(df.columns)).reset_index(drop=True)

    ray_flag = canon(q_decontaminate(sf).to_pandas())
    ora_flag = canon(con.execute(SQL_DECONTAMINATE).fetchdf())
    pd.testing.assert_frame_equal(ray_flag, ora_flag,
                                  check_dtype=True, check_exact=True)
    # doc 3: NULL text + planted snippet → grams come from the snippet
    # alone → contaminated on BOTH sides
    flags = dict(zip(ray_flag["doc_id"], ray_flag["contaminated"]))
    assert flags[3] and not flags[7] and not flags[1]

    ray_sp = canon(q_contam_spans(sf).to_pandas())
    ora_sp = canon(con.execute(SQL_CONTAM_SPANS).fetchdf())
    pd.testing.assert_frame_equal(ray_sp, ora_sp,
                                  check_dtype=True, check_exact=True)
    assert 3 in set(ray_sp["doc_id"])
