"""Pair-featurizer oracle slice (N4 / N5 / F9 closure).

The 66-dim pair featurizer (`functions/features.py`, reference
``feature_engineering.py:69-169``) is mostly pytest-verified: its
Levenshtein-window features rest on the DP-parity-tested LCS kernel and
cannot be expressed in SQL. Everything else CAN — and this entry oracles
exactly that slice through the REAL kernels:

* **N4 (title encoder)** — `encode_title`'s uint8 code sequence, pinned by
  an order-sensitive checksum Σ code[i]·(i+1) over the 255-capped truth
  title (zero padding contributes nothing, so the checksum covers every
  nonzero code AND its position).
* **N5 (truth-word-count vectorizer)** — `truth_word_counts` lookups of
  the truth title's first 15 words against the truth-DB document-frequency
  counter (`training.build_word_counter` semantics: each word once per
  title).
* **F9 non-Levenshtein core** — the basic count features (t_chars,
  g_chars, t_words, g_words), per-word lengths, IDF ln(N/cnt) and the IDF
  rank 1 + (max_idf − idf)/g_words, emitted in long format (one row per
  (pair, word index)). IDF/rank are computed here in float64 — the exact
  shadow of the featurizer's float32 vector (asserted equal to float32
  precision in tests/test_queries_features.py) — because rounding a
  float32-computed ln to 6 decimals against a float64 SQL ln would flip
  rounding boundaries.

Pairing harness (the `_messy_url` convention — deterministic structure so
the expected output is closed-form SQL): truth set = docs with
doc_id % 10 == 0; every other doc pairs with its decade head
truth_id = doc_id − doc_id % 10 (inner-join semantics: the pair exists
only when the head does).

Scale shape: the truth side is corpus-sized, so the pair attach is a hash
JOIN on truth_id (both sides scale out — no broadcast of truth text); the
word-DF counter is vocabulary-bounded and broadcasts once (ray.put), the
same shape the matcher uses; the per-pair kernel work is embarrassingly
parallel inside map_batches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _docs, _round6_half_up
from .queries_web import _SQL_NORM_PADDED

N_WORD = 15  # N_WORD_FEATURES — featurizer truncation


def q_pair_features(sf_dir: str):
    import ray

    from ..functions.features import (MAX_CHARS, encode_title,
                                      truth_word_counts)
    from ..functions.normalize import normalize_array
    from ..util import drop_empty_blocks, sized_num_partitions

    def split_norm(id_name: str, norm_name: str, keep_heads: bool):
        def fn(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            mask = (ids % 10 == 0) if keep_heads else (ids % 10 != 0)
            sub = t.filter(pa.array(mask))
            return pa.table({
                id_name: sub["doc_id"],
                norm_name: normalize_array(sub["text"], None, 3),
            })
        return fn

    docs = _docs(sf_dir, ["doc_id", "text"])
    truth = docs.map_batches(split_norm("truth_id", "t_norm", True),
                             batch_format="pyarrow")
    queries = docs.map_batches(split_norm("test_id", "q_norm", False),
                               batch_format="pyarrow")

    def add_head(t: pa.Table) -> pa.Table:
        ids = t["test_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("truth_id",
                               pa.array(ids - ids % 10, pa.int64()))

    # truth-DB document-frequency counter (build_word_counter semantics:
    # each word once per title) — distributed DF groupby, then broadcast
    # (vocabulary-bounded by definition, the matcher's own shape)
    from ray.data.aggregate import Count

    def df_words(t: pa.Table) -> pa.Table:
        out = []
        for norm in t["t_norm"].to_pylist():
            out.extend(set(norm.split()))
        return pa.table({"w": pa.array(out, pa.string())})

    truth = truth.materialize()
    n_truth = truth.count()
    df_rows = truth.map_batches(df_words, batch_format="pyarrow") \
        .groupby("w").aggregate(Count(alias_name="cnt")).take_all()
    counter = {r["w"]: int(r["cnt"]) for r in df_rows}
    counter_ref = ray.put(counter)

    pairs = drop_empty_blocks(
        queries.map_batches(add_head, batch_format="pyarrow")).join(
        drop_empty_blocks(truth), join_type="inner",
        num_partitions=sized_num_partitions(n_truth * 10),
        on=("truth_id",), right_on=("truth_id",))

    def expand(t: pa.Table) -> pa.Table:
        cnt_map = ray.get(counter_ref)
        test_ids = t["test_id"].to_numpy(zero_copy_only=False)
        truth_ids = t["truth_id"].to_numpy(zero_copy_only=False)
        q_norms = t["q_norm"].to_pylist()
        t_norms = t["t_norm"].to_pylist()
        cols: dict[str, list] = {k: [] for k in (
            "test_id", "truth_id", "wi", "t_chars", "g_chars", "t_words",
            "g_words", "enc_checksum", "word_len", "word_cnt", "idf",
            "idf_rank")}
        for ti, gi, qn, tn in zip(test_ids, truth_ids, q_norms, t_norms):
            enc = encode_title(tn)                      # N4: real kernel
            checksum = int(np.dot(enc.astype(np.int64),
                                  np.arange(1, MAX_CHARS + 1)))
            # the featurizer enumerates truth words via split(" ") while
            # truth_word_counts uses .split() internally — mirror BOTH
            # faithfully (identical on space-normalized text; the mixed
            # convention is the engine's own, inherited by this shadow)
            words = tn.split(" ")[:N_WORD]
            wc = truth_word_counts(tn, cnt_map)          # N5: real kernel
            g_words = tn.count(" ") + 1
            idfs = np.array([np.log(n_truth / int(wc[i]))
                             for i in range(len(words))], np.float64)
            mx = idfs.max() if len(idfs) else 0.0
            for wi, w in enumerate(words):
                cols["test_id"].append(int(ti))
                cols["truth_id"].append(int(gi))
                cols["wi"].append(wi + 1)
                cols["t_chars"].append(len(qn))
                cols["g_chars"].append(len(tn))
                cols["t_words"].append(qn.count(" ") + 1)
                cols["g_words"].append(g_words)
                cols["enc_checksum"].append(checksum)
                cols["word_len"].append(len(w))
                cols["word_cnt"].append(int(wc[wi]))
                cols["idf"].append(idfs[wi])
                cols["idf_rank"].append(1.0 + (mx - idfs[wi]) / g_words)
        return pa.table({
            "test_id": pa.array(cols["test_id"], pa.int64()),
            "truth_id": pa.array(cols["truth_id"], pa.int64()),
            "wi": pa.array(cols["wi"], pa.int64()),
            "t_chars": pa.array(cols["t_chars"], pa.int64()),
            "g_chars": pa.array(cols["g_chars"], pa.int64()),
            "t_words": pa.array(cols["t_words"], pa.int64()),
            "g_words": pa.array(cols["g_words"], pa.int64()),
            "enc_checksum": pa.array(cols["enc_checksum"], pa.int64()),
            "word_len": pa.array(cols["word_len"], pa.int64()),
            "word_cnt": pa.array(cols["word_cnt"], pa.int64()),
            "idf": pa.array(_round6_half_up(np.array(cols["idf"])),
                            pa.float64()),
            "idf_rank": pa.array(
                _round6_half_up(np.array(cols["idf_rank"])), pa.float64()),
        })

    return pairs.map_batches(expand, batch_format="pyarrow")


from ..functions.features import ALPHABET as _ALPHABET  # noqa: E402

SQL_PAIR_FEATURES = f"""
WITH truth AS (SELECT doc_id AS truth_id, {_SQL_NORM_PADDED} AS norm
               FROM documents WHERE doc_id % 10 = 0),
q AS (SELECT doc_id AS test_id, doc_id - doc_id % 10 AS truth_id,
             {_SQL_NORM_PADDED} AS norm
      FROM documents WHERE doc_id % 10 <> 0),
nt AS (SELECT count(*)::DOUBLE AS n FROM truth),
df AS (SELECT w, count(*) AS cnt FROM
         (SELECT DISTINCT truth_id, w FROM
            (SELECT truth_id, unnest(string_split(norm, ' ')) AS w
             FROM truth))
       GROUP BY w),
enc AS (SELECT truth_id,
          CAST(coalesce(sum(greatest(strpos('{_ALPHABET}',
                 substr(norm, i, 1)) - 1, 0) * i), 0) AS BIGINT)
            AS enc_checksum
        FROM (SELECT truth_id, norm,
                unnest(range(1, least(length(norm), 255) + 1)) AS i
              FROM truth)
        GROUP BY truth_id),
tw AS (SELECT truth_id, norm,
         len(string_split(norm, ' ')) AS g_words,
         string_split(norm, ' ')[1:{N_WORD}] AS w15
       FROM truth),
word_rows AS (SELECT truth_id, g_words,
         unnest(w15) AS word,
         unnest(range(1, len(w15) + 1)) AS wi
       FROM tw),
wr AS (SELECT word_rows.*, df.cnt,
              ln((SELECT n FROM nt) / df.cnt) AS idf_raw
       FROM word_rows JOIN df ON word_rows.word = df.w),
wr2 AS (SELECT *, max(idf_raw) OVER (PARTITION BY truth_id) AS mx
        FROM wr)
SELECT q.test_id, q.truth_id, wr2.wi,
       length(q.norm) AS t_chars,
       length(tw.norm) AS g_chars,
       len(string_split(q.norm, ' ')) AS t_words,
       wr2.g_words,
       enc.enc_checksum,
       length(wr2.word) AS word_len,
       wr2.cnt AS word_cnt,
       floor(wr2.idf_raw * 1000000 + 0.5) / 1000000 AS idf,
       floor((1 + (wr2.mx - wr2.idf_raw) / wr2.g_words) * 1000000 + 0.5)
         / 1000000 AS idf_rank
FROM q
JOIN tw ON q.truth_id = tw.truth_id
JOIN enc ON q.truth_id = enc.truth_id
JOIN wr2 ON q.truth_id = wr2.truth_id
"""


FEATURE_QUERIES = {"pair_features": q_pair_features}
FEATURE_ORACLES = {"pair_features": SQL_PAIR_FEATURES}

# Merge into the main catalog regardless of import order (the
# queries_corpus/queries_web/queries_profile convention).
from .queries import ORACLES as _MAIN_ORACLES  # noqa: E402
from .queries import QUERIES as _MAIN_QUERIES  # noqa: E402

_MAIN_QUERIES.update(FEATURE_QUERIES)
_MAIN_ORACLES.update(FEATURE_ORACLES)
