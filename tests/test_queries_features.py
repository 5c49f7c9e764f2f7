"""pair_features oracle-slice entry (pipelines/queries_features.py):
float64-shadow parity with the real float32 featurizer, and Ray↔DuckDB
exactness on degenerate inputs (short/padded/null texts) that the shared
testdata never exercises."""

import numpy as np
import pyarrow as pa
import pytest


def test_idf_rank_float64_shadow_matches_float32_kernel():
    """The entry emits IDF/rank in float64 (SQL ln parity); the featurizer
    computes them in float32. The two must agree to float32 precision —
    i.e. the entry really is a shadow of F9's values, not a different
    formula."""
    from doppel_speller_ray.functions.features import (
        N_WORD_FEATURES, pair_features, truth_word_counts)

    counter = {"alpha": 3, "beta": 1, "gamma": 7, "delta": 2}
    n_truth = 40
    truth_title = "alpha beta gamma delta"
    query_title = "alpha beta gama delta"
    counts = truth_word_counts(truth_title, counter)
    vec = pair_features(query_title, truth_title, counts, n_truth)

    words = truth_title.split()[:N_WORD_FEATURES]
    g_words = truth_title.count(" ") + 1
    idf64 = np.array([np.log(n_truth / counter[w]) for w in words])
    rank64 = 1.0 + (idf64.max() - idf64) / g_words

    idf32 = vec[36:36 + len(words)]
    rank32 = vec[51:51 + len(words)]
    np.testing.assert_allclose(idf32, idf64, rtol=1e-6)
    np.testing.assert_allclose(rank32, rank64, rtol=1e-6)
    # basic features the entry repeats per word row
    assert (vec[0], vec[1], vec[2], vec[3]) == (
        len(query_title), len(truth_title), 4, 4)


def test_pair_features_oracle_degenerate_texts(ray_session, tmp_path):
    """Ray↔SQL exact parity on inputs the sf testdata lacks: a truth title
    shorter than the 3-gram pad width (normalize pads to '00x'), a NULL
    query text, and a query with no surviving truth head."""
    import duckdb
    import pandas as pd
    import pyarrow.parquet as pq

    from doppel_speller_ray.pipelines.queries_features import (
        SQL_PAIR_FEATURES, q_pair_features)

    rows = [
        (0, "x"),                          # truth head, pads to '00x'
        (3, None),                         # NULL query → norm pads '000'
        (7, "Alpha-Beta  GAMMA alpha"),    # query with messy case/dash
        (10, "alpha beta alpha"),          # second truth head
        (12, "plain query text"),
        (25, "orphan: head 20 does not exist"),  # inner join drops it
    ]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    sf = str(tmp_path)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")

    def canon(df):
        df = df[sorted(df.columns)]
        return df.sort_values(sorted(df.columns)).reset_index(drop=True)

    ray_df = canon(q_pair_features(sf).to_pandas())
    ora_df = canon(con.execute(SQL_PAIR_FEATURES).fetchdf())
    pd.testing.assert_frame_equal(ray_df, ora_df,
                                  check_dtype=True, check_exact=True)
    # the orphan query must be absent; every surviving pair maps to a head
    assert set(ray_df["test_id"]) == {3, 7, 12}
    assert set(ray_df["truth_id"]) == {0, 10}
    # the padded truth '00x': one word of length 3, encoder checksum
    # covers '0','0','x' at positions 1..3
    from doppel_speller_ray.functions.features import encode_title

    enc = encode_title("00x")
    want = int(np.dot(enc.astype(np.int64), np.arange(1, 256)))
    head0 = ray_df[ray_df["truth_id"] == 0]
    assert set(head0["enc_checksum"]) == {want}
    assert set(head0["word_len"]) == {3}
