"""Driver-facing query catalog: one Ray Data pipeline per operator from
SURVEY.md §2, each with (where SQL-expressible) a DuckDB oracle that the
driver runs side-by-side at sf=0.01 (CORRECTNESS gate).

Column names are kept identical between the Ray result and the oracle SQL
(the driver's compare sorts columns by name before value-hashing). Float
outputs are rounded to 6 decimals on BOTH sides.

Tables used: documents (doc_id,text,lang,source,n_chars), embeddings
(vec_id, embedding list<float>, label), lineitem, orders, customer, events.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DedupConfig
from ..functions.normalize import normalize_array

# Normalization config used by all document queries: full-text (no 255 cap)
_QCFG = DedupConfig(max_chars=None)

# DuckDB equivalent of transform_text on ascii, space-only-whitespace input
# (documents.text is generated ascii; the general unicode path is covered by
# unit parity tests, not the SQL oracle).
_SQL_NORM = (
    "trim(regexp_replace(regexp_replace(replace(lower(text), '-', ' '), "
    "'[^a-z0-9 ]+', '', 'g'), ' +', ' ', 'g'))"
)


def _docs(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _norm_docs_table(sf_dir: str):
    """(doc_id, norm) dataset — shared prefix of the document queries."""
    def fn(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "norm": normalize_array(t["text"], _QCFG.max_chars, _QCFG.n_grams),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# N1/N2 — normalize + tokenize
# ---------------------------------------------------------------------------

def q_normalize(sf_dir: str):
    return _norm_docs_table(sf_dir)


SQL_NORMALIZE = f"SELECT doc_id, {_SQL_NORM} AS norm FROM documents"


def q_tokenize(sf_dir: str):
    from ..functions.normalize import tokenize_counts

    def fn(t: pa.Table) -> pa.Table:
        norm = normalize_array(t["text"], _QCFG.max_chars, _QCFG.n_grams)
        n_words, n_chars = tokenize_counts(norm)
        return pa.table({"doc_id": t["doc_id"], "n_words": n_words,
                         "n_chars_norm": n_chars.cast(pa.int64())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


SQL_TOKENIZE = f"""
WITH n AS (SELECT doc_id, {_SQL_NORM} AS norm FROM documents)
SELECT doc_id,
       CASE WHEN norm = '' THEN 0 ELSE length(string_split(norm, ' ')) END AS n_words,
       length(norm) AS n_chars_norm
FROM n
"""


# ---------------------------------------------------------------------------
# A1/A3 — word document frequency + IDF (reference common.py:140-142,154-158)
# ---------------------------------------------------------------------------

def _word_df_ds(sf_dir: str):
    """Pre-aggregated per-batch word→count, then a small groupby-sum.

    The per-batch partial combine (one row per word per batch, not per doc)
    is the scale pattern: the shuffle moves |vocab|×|batches| rows instead of
    |total word occurrences|.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        norm = normalize_array(t["text"], _QCFG.max_chars, _QCFG.n_grams)
        words = pc.split_pattern(norm, pattern=" ")
        flat = words.values
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), lens)
        # distinct (doc, word) via dictionary-encode + np.unique over packed
        # (doc, code) keys — vectorized, no per-occurrence Python
        # (VERDICT r1 item 7)
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = enc.dictionary
        v = len(vocab)
        if v == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "df_part": pa.array([], pa.int64())})
        uniq_keys = np.unique(doc_idx * v + codes)
        word_codes = (uniq_keys % v).astype(np.int64)
        df = np.bincount(word_codes, minlength=v).astype(np.int64)
        nonempty = np.asarray(pc.not_equal(vocab, "")) & (df > 0)
        keep = np.nonzero(nonempty)[0]
        return pa.table({"word": vocab.take(pa.array(keep, pa.int64())),
                         "df_part": pa.array(df[keep], pa.int64())})

    partials = _docs(sf_dir, ["doc_id", "text"]).map_batches(partial, batch_format="pyarrow")
    return partials.groupby("word").aggregate(Sum("df_part", alias_name="df"))


def q_word_df(sf_dir: str):
    return _word_df_ds(sf_dir)


SQL_WORD_DF = f"""
WITH n AS (SELECT doc_id, {_SQL_NORM} AS norm FROM documents),
w AS (SELECT DISTINCT doc_id, unnest(string_split(norm, ' ')) AS word FROM n)
SELECT word, count(*) AS df FROM w WHERE word <> '' GROUP BY word
"""


def q_word_idf(sf_dir: str):
    """idf = ln(N / df) per word (common.py:154-158), rounded to 6."""
    n_docs = _docs(sf_dir, ["doc_id"]).count()

    def fin(t: pa.Table) -> pa.Table:
        df = t["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        idf = np.round(np.log(n_docs / df), 6)
        return pa.table({"word": t["word"], "idf": pa.array(idf, pa.float64())})

    return _word_df_ds(sf_dir).map_batches(fin, batch_format="pyarrow")


SQL_WORD_IDF = f"""
WITH n AS (SELECT doc_id, {_SQL_NORM} AS norm FROM documents),
w AS (SELECT DISTINCT doc_id, unnest(string_split(norm, ' ')) AS word FROM n),
d AS (SELECT word, count(*) AS df FROM w WHERE word <> '' GROUP BY word)
SELECT word, round(ln((SELECT count(*) FROM documents) * 1.0 / df), 6) AS idf FROM d
"""


# ---------------------------------------------------------------------------
# A2 — n-gram document frequency (reference common.py:145-147)
# ---------------------------------------------------------------------------

def q_ngram_df(sf_dir: str):
    from ray.data.aggregate import Sum

    from ..functions.shingles import decode_shingle, list_column_flat, shingle_array

    def partial(t: pa.Table) -> pa.Table:
        norm = normalize_array(t["text"], _QCFG.max_chars, _QCFG.n_grams)
        sh = shingle_array(norm, _QCFG.n_grams)
        flat, _ = list_column_flat(sh)
        codes, counts = np.unique(flat, return_counts=True)
        grams = [decode_shingle(c, _QCFG.n_grams) for c in codes]
        return pa.table({"gram": pa.array(grams, pa.string()),
                         "df_part": pa.array(counts, pa.int64())})

    partials = _docs(sf_dir, ["doc_id", "text"]).map_batches(partial, batch_format="pyarrow")
    return partials.groupby("gram").aggregate(Sum("df_part", alias_name="df"))


SQL_NGRAM_DF = f"""
WITH n AS (SELECT doc_id, {_SQL_NORM} AS norm FROM documents),
e AS (SELECT doc_id, norm, unnest(range(1, length(norm) - 1)) AS i FROM n),
g AS (SELECT DISTINCT doc_id, substring(norm, CAST(i AS INT), 3) AS gram FROM e)
SELECT gram, count(*) AS df FROM g GROUP BY gram
"""


# ---------------------------------------------------------------------------
# D1 — exact dedup / keep-first (reference predict.py:97-113 reborn as shuffle)
# ---------------------------------------------------------------------------

def q_exact_dedup_first(sf_dir: str):
    """Keep min doc_id per (lang, source) — keep-first grouped dedup."""
    from ray.data.aggregate import Min

    return _docs(sf_dir, ["doc_id", "lang", "source"]) \
        .groupby(["lang", "source"]).aggregate(Min("doc_id", alias_name="doc_id"))


SQL_EXACT_DEDUP_FIRST = (
    "SELECT lang, source, min(doc_id) AS doc_id FROM documents GROUP BY lang, source"
)


def q_exact_text_groups(sf_dir: str):
    """min-doc_id representative per distinct text (true exact-dedup shape)."""
    from ray.data.aggregate import Count, Min

    return _docs(sf_dir, ["doc_id", "text"]).groupby("text").aggregate(
        Min("doc_id", alias_name="rep_id"), Count(alias_name="group_size")
    ).select_columns(["rep_id", "group_size"])


SQL_EXACT_TEXT_GROUPS = (
    "SELECT min(doc_id) AS rep_id, count(*) AS group_size FROM documents GROUP BY text"
)


# ---------------------------------------------------------------------------
# A5/A6 — grouped argmax with ambiguity drop (predict.py:158-176)
# ---------------------------------------------------------------------------

def q_grouped_argmax(sf_dir: str):
    """Per lang: the doc with max n_chars; groups with a tie are dropped
    entirely (the reference's _remove_duplicated_matches semantics)."""
    def per_group(g):
        mx = g["n_chars"].max()
        top = g[g["n_chars"] == mx]
        if len(top) != 1:
            return top.iloc[0:0]
        return top[["lang", "doc_id", "n_chars"]]

    return _docs(sf_dir, ["doc_id", "lang", "n_chars"]) \
        .groupby("lang").map_groups(per_group, batch_format="pandas")


SQL_GROUPED_ARGMAX = """
WITH m AS (SELECT lang, max(n_chars) AS mx FROM documents GROUP BY lang),
top AS (SELECT d.lang, d.doc_id, d.n_chars FROM documents d
        JOIN m ON d.lang = m.lang AND d.n_chars = m.mx)
SELECT lang, doc_id, n_chars FROM top
WHERE lang IN (SELECT lang FROM top GROUP BY lang HAVING count(*) = 1)
"""


# ---------------------------------------------------------------------------
# O1/O2 — sort + top-k
# ---------------------------------------------------------------------------

def q_top_docs(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "n_chars"]) \
        .sort(["n_chars", "doc_id"], descending=[True, False]).limit(20)


SQL_TOP_DOCS = (
    "SELECT doc_id, n_chars FROM documents ORDER BY n_chars DESC, doc_id LIMIT 20"
)


# ---------------------------------------------------------------------------
# Text analysis: token counting
# ---------------------------------------------------------------------------

def q_token_count(sf_dir: str):
    from ..functions.textstats import whitespace_token_counts

    def fn(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"],
                         "n_tokens": pa.array(whitespace_token_counts(t["text"]), pa.int64())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


SQL_TOKEN_COUNT = """
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE length(string_split_regex(trim(text), '\\s+')) END AS n_tokens
FROM documents
"""


# ---------------------------------------------------------------------------
# F1-analog scalar function check: unit-cost Levenshtein (DuckDB levenshtein)
# ---------------------------------------------------------------------------

def q_lev_distance(sf_dir: str):
    """Unit-cost Levenshtein between consecutive docs' normalized prefixes —
    SQL-checkable via DuckDB's levenshtein()."""
    from ..functions.lev import lev_distance

    norm = _norm_docs_table(sf_dir)

    def prefix(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"],
                         "p": pc.utf8_slice_codeunits(t["norm"], 0, 40)})

    prefixes = norm.map_batches(prefix, batch_format="pyarrow")

    def shift(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id_r": pc.add(t["doc_id"], 1), "p_r": t["p"]})

    right = prefixes.map_batches(shift, batch_format="pyarrow")
    joined = prefixes.join(right, join_type="inner", num_partitions=4,
                           on=("doc_id",), right_on=("doc_id_r",))

    def dist(t: pa.Table) -> pa.Table:
        a = t["p"].to_pylist()
        b = t["p_r"].to_pylist()
        d = [lev_distance(x, y) for x, y in zip(a, b)]
        return pa.table({"doc_id": t["doc_id"], "lev": pa.array(d, pa.int64())})

    return joined.map_batches(dist, batch_format="pyarrow")


SQL_LEV_DISTANCE = f"""
WITH n AS (SELECT doc_id, substring({_SQL_NORM}, 1, 40) AS p FROM documents)
SELECT a.doc_id AS doc_id, levenshtein(a.p, b.p) AS lev
FROM n a JOIN n b ON a.doc_id = b.doc_id + 1
"""


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup pairs (D2-analog with an exact SQL oracle)
# ---------------------------------------------------------------------------

def q_ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5):
    """All-pairs exact 3-gram Jaccard ≥ threshold. Ray side: per-batch
    vectorized set intersection against a broadcast of the (small at this
    sf) shingle table; the LSH pipeline is the scale path for the same
    semantics (rows-only checked there)."""
    import ray

    from ..functions.shingles import list_column_flat, shingle_array

    def prep(t: pa.Table) -> pa.Table:
        norm = normalize_array(t["text"], _QCFG.max_chars, _QCFG.n_grams)
        return pa.table({"doc_id": t["doc_id"], "shingles": shingle_array(norm, 3)})

    docs = _docs(sf_dir, ["doc_id", "text"]).map_batches(prep, batch_format="pyarrow")
    # collect the shingle table once; broadcast to the pair-scoring tasks
    all_rows = docs.take_all()
    ids = np.array([r["doc_id"] for r in all_rows], dtype=np.int64)
    sets = [np.asarray(r["shingles"], dtype=np.uint64) for r in all_rows]
    order = np.argsort(ids)
    ids = ids[order]
    sets = [sets[i] for i in order]
    # CSR layout so the per-i scan is one vectorized pass over ALL postings
    lens = np.array([len(s) for s in sets], dtype=np.int64)
    flat = np.concatenate(sets) if sets else np.empty(0, np.uint64)
    doc_of = np.repeat(np.arange(len(sets), dtype=np.int64), lens)
    ref = ray.put((ids, lens, flat, doc_of))

    import ray.data as rd

    idx = rd.from_items([{"i": int(i)} for i in range(len(ids))])

    def pairs_for(batch: pa.Table) -> pa.Table:
        bids, blens, bflat, bdoc = ray.get(ref)
        n = len(bids)
        out_l, out_r, out_j = [], [], []
        for i in batch["i"].to_pylist():
            a = bflat[bdoc == i]
            # intersection counts vs EVERY other doc in one vectorized pass:
            # mark postings present in a, then count hits per doc
            inter = np.bincount(bdoc[np.isin(bflat, a)], minlength=n)
            union = len(a) + blens - inter
            with np.errstate(invalid="ignore", divide="ignore"):
                jac = np.where(union > 0, inter / union, 1.0)
            hits = np.nonzero((jac >= threshold)
                              & (np.arange(n) > i))[0]
            for j in hits:
                out_l.append(int(bids[i]))
                out_r.append(int(bids[j]))
                out_j.append(round(float(jac[j]), 6))
        return pa.table({"left_id": pa.array(out_l, pa.int64()),
                         "right_id": pa.array(out_r, pa.int64()),
                         "jaccard": pa.array(out_j, pa.float64())})

    return idx.map_batches(pairs_for, batch_format="pyarrow", batch_size=32)


SQL_NGRAM_JACCARD_PAIRS = f"""
WITH n AS (SELECT doc_id, {_SQL_NORM} AS norm FROM documents),
e AS (SELECT doc_id, norm, unnest(range(1, length(norm) - 1)) AS i FROM n),
g AS (SELECT DISTINCT doc_id, substring(norm, CAST(i AS INT), 3) AS gram FROM e),
c AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY doc_id),
i AS (SELECT a.doc_id AS l, b.doc_id AS r, count(*) AS isz
      FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
SELECT i.l AS left_id, i.r AS right_id,
       round(i.isz * 1.0 / (ca.sz + cb.sz - i.isz), 6) AS jaccard
FROM i JOIN c ca ON ca.doc_id = i.l JOIN c cb ON cb.doc_id = i.r
WHERE i.isz * 1.0 / (ca.sz + cb.sz - i.isz) >= 0.5
"""


# ---------------------------------------------------------------------------
# Similarity search over embeddings (ANN brute-force baseline)
# ---------------------------------------------------------------------------

def q_ann_topk(sf_dir: str, k: int = 10):
    """Top-k cosine neighbours of vec_id=0, brute force: numpy matmul per
    batch against the broadcast query vector, then a global sort+limit."""
    import ray

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q_row = [r for r in emb.take(5) if r["vec_id"] == 0]
    if not q_row:
        q_row = emb.filter(lambda r: r["vec_id"] == 0).take(1)
    q = np.asarray(q_row[0]["embedding"], dtype=np.float64)
    qn = q / np.linalg.norm(q)
    ref = ray.put(qn)

    def score(t: pa.Table) -> pa.Table:
        qv = ray.get(ref)
        mat = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        sims = (mat @ qv) / np.where(norms == 0, 1, norms)
        # round to 2: DuckDB evaluates list_cosine_similarity in float32;
        # finer rounding is flipped by ~1e-7 accumulation-order noise
        out = pa.table({"vec_id": t["vec_id"],
                        "sim": pa.array(np.round(sims, 2), pa.float64()),
                        "raw": pa.array(sims, pa.float64())})
        return out.filter(pc.not_equal(t["vec_id"], 0))

    scored = emb.map_batches(score, batch_format="pyarrow")
    return scored.sort(["raw", "vec_id"], descending=[True, False]).limit(k) \
        .select_columns(["vec_id", "sim"])


SQL_ANN_TOPK = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       round(list_cosine_similarity(e.embedding, q.qe), 2) AS sim
FROM embeddings e, q WHERE e.vec_id <> 0
ORDER BY list_cosine_similarity(e.embedding, q.qe) DESC, e.vec_id LIMIT 10
"""


def q_ann_ivf(sf_dir: str, k: int = 10):
    """IVF (k-means inverted-file) ANN over the embeddings table with
    nprobe = ALL centroids — provably identical to brute-force top-k, so it
    shares the exact SQL oracle with ann_topk; the approximate small-nprobe
    configuration (the 100 TB scale path: assignment = Parquet partition
    key, probing prunes at the read) is recall-tested in
    tests/test_training.py."""
    import ray

    from ..stages.embed import ivf_topk

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q_row = [r for r in emb.take(5) if r["vec_id"] == 0]
    if not q_row:
        q_row = emb.filter(lambda r: r["vec_id"] == 0).take(1)
    q = np.asarray(q_row[0]["embedding"], dtype=np.float64)

    not_self = emb.map_batches(
        lambda t: t.filter(pc.not_equal(t["vec_id"], 0)), batch_format="pyarrow")
    top = ivf_topk(not_self, q[None, :], k=k, n_centroids=16, nprobe=None)

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({"vec_id": t["vec_id"],
                         "sim": pc.round(t["sim"], 2)})

    return top.map_batches(fin, batch_format="pyarrow")


def q_embedding_neardup(sf_dir: str, threshold: float = 0.4):
    """Embedding-cosine near-dup pairs (brute force at this sf; the
    LSH-bucketed variant in pipelines/ann.py is the scale path)."""
    import ray

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    rows = emb.take_all()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.stack([np.asarray(r["embedding"], np.float64) for r in rows])
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    norms = np.linalg.norm(mat, axis=1)
    matn = mat / np.where(norms == 0, 1, norms)[:, None]
    ref = ray.put((ids, matn))

    import ray.data as rd

    idx = rd.from_items([{"i": int(i)} for i in range(len(ids))])

    def pairs_for(batch: pa.Table) -> pa.Table:
        bids, bm = ray.get(ref)
        out_l, out_r = [], []
        for i in batch["i"].to_pylist():
            sims = bm[i + 1:] @ bm[i]
            hits = np.nonzero(sims >= threshold)[0]
            for h in hits:
                out_l.append(int(bids[i]))
                out_r.append(int(bids[i + 1 + h]))
        return pa.table({"left_id": pa.array(out_l, pa.int64()),
                         "right_id": pa.array(out_r, pa.int64())})

    return idx.map_batches(pairs_for, batch_format="pyarrow", batch_size=64)


SQL_EMBEDDING_NEARDUP = """
SELECT a.vec_id AS left_id, b.vec_id AS right_id
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
"""


# ---------------------------------------------------------------------------
# Generic relational coverage: pre-aggregated groupby, join, window
# ---------------------------------------------------------------------------

def q_lineitem_agg(sf_dir: str):
    """TPC-H Q1 shape with per-batch partial aggregation before the shuffle."""
    from ray.data.aggregate import Count, Sum

    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table):
        import pandas as pd

        df = t.to_pandas()
        df["disc_price"] = df["l_extendedprice"] * (1 - df["l_discount"])
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            qty_part=("l_quantity", "sum"),
            disc_part=("disc_price", "sum"),
            n_part=("l_quantity", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = li.map_batches(partial, batch_format="pyarrow").groupby(
        ["l_returnflag", "l_linestatus"]
    ).aggregate(
        Sum("qty_part", alias_name="sum_qty"),
        Sum("disc_part", alias_name="sum_disc_price"),
        Sum("n_part", alias_name="count_order"),
    )

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "sum_qty": pc.cast(pc.round(t["sum_qty"], 0), pa.int64()),
            "sum_disc_price": pc.round(t["sum_disc_price"], 2),
            "count_order": pc.cast(t["count_order"], pa.int64()),
        })

    return agg.map_batches(fin, batch_format="pyarrow")


SQL_LINEITEM_AGG = """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(l_quantity), 0) AS BIGINT) AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_customer_orders(sf_dir: str):
    """Join + grouped aggregate (orders per customer with totals)."""
    from ray.data.aggregate import Count, Sum

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    joined = orders.join(cust, join_type="inner", num_partitions=4,
                         on=("o_custkey",), right_on=("c_custkey",))
    agg = joined.groupby("o_custkey").aggregate(
        Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="total"),
    )

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": t["o_custkey"],
            "n_orders": pc.cast(t["n_orders"], pa.int64()),
            "total": pc.round(t["total"], 2),
        })

    return agg.map_batches(fin, batch_format="pyarrow")


SQL_CUSTOMER_ORDERS = """
SELECT o.o_custkey AS c_custkey, count(*) AS n_orders,
       round(sum(o.o_totalprice), 2) AS total
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY o.o_custkey
"""


def q_events_hourly(sf_dir: str):
    """Tumbling-window aggregate: events per (user, hour). Ray Data has no
    event-time windows; the window is a derived column + groupby
    (ray_guide 'Streaming-shaped workloads')."""
    from ray.data.aggregate import Count, Sum

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def hour(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "hour": pc.floor_temporal(t["ts"], unit="hour"),
            "value": t["value"],
        })

    agg = ev.map_batches(hour, batch_format="pyarrow").groupby(
        ["user_id", "hour"]
    ).aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            # floor_temporal emits second precision; DuckDB date_trunc emits
            # microseconds — align the physical type for the value hash
            "hour": pc.cast(t["hour"], pa.timestamp("us")),
            "n_events": pc.cast(t["n_events"], pa.int64()),
            "sum_value": pc.round(t["sum_value"], 3),
        })

    return agg.map_batches(fin, batch_format="pyarrow")


SQL_EVENTS_HOURLY = """
SELECT user_id, date_trunc('hour', ts) AS hour, count(*) AS n_events,
       round(sum(value), 3) AS sum_value
FROM events GROUP BY user_id, date_trunc('hour', ts)
"""


# ---------------------------------------------------------------------------
# Planted-structure conformance queries (VERDICT r1 items 1/3): the corpus is
# derived deterministically from the documents table so the expected output
# is closed-form SQL — this upgrades the flagship + hash-style operators from
# "rows-only checked" to fully oracled.
# ---------------------------------------------------------------------------

from ..functions.hashing import splitmix64  # noqa: E402  (vectorized uint64 mix)

# Planted variants are keyed at base_id + k·_PLANTED_OFFSET; the matching SQL
# oracles hardcode the same offset, so base ids must leave headroom.
_PLANTED_OFFSET = 1_000_000


def _planted_guard(ids) -> None:
    """Fail loudly (not with silently-colliding oracles) if the input scale
    factor has ids too large for the planted-id offset scheme (ADVICE r2)."""
    arr = np.asarray(ids)
    if len(arr) and int(arr.max()) >= _PLANTED_OFFSET:
        raise ValueError(
            f"planted-corpus oracles require base ids < {_PLANTED_OFFSET:,} "
            f"(got max id {int(arr.max()):,}); regenerate with a larger "
            "_PLANTED_OFFSET (and matching SQL) for this scale factor")


def _salt(doc_id: int) -> str:
    """Unique 71-char hex salt (8 tokens × 8 chars) for a doc_id. Survives
    normalization unchanged (lowercase hex + single spaces)."""
    h = splitmix64(np.uint64(doc_id) * np.uint64(2654435761)
                   + np.arange(1, 9, dtype=np.uint64))
    return " ".join(f"{int(x):016x}"[:8] for x in h)


def _planted_salted_docs(sf_dir: str):
    """documents × {base, exact copy (+1_000_000), 1-edit misspelling
    (+2_000_000, raw len ≥ 60)} with a unique doc_id-derived salt prefixed
    to every variant of a doc.

    The salt adds ~124 unique 3-grams per doc, which (a) drops cross-doc
    Jaccard below the 0.8 dup gate even for the corpus's most similar pairs
    and (b) makes the Levenshtein rescue unwinnable across docs (the first
    71 chars disagree, ratio ≪ 94) — while same-doc variants share the salt
    so their similarity is untouched. Expected cluster of every planted row
    is therefore closed-form: the base doc_id."""
    from ..functions.misspell import misspell

    def derive(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        _planted_guard(ids)
        texts = t["text"].to_pylist()
        out_i, out_t = [], []
        for i, x in zip(ids, texts):
            s = _salt(i)
            out_i.append(i)
            out_t.append(f"{s} {x}")
            out_i.append(i + 1_000_000)
            out_t.append(f"{s} {x}")
            if len(x) >= 60:
                out_i.append(i + 2_000_000)
                out_t.append(f"{s} {misspell(x, 10_000 + i, n_perturbations=1)}")
        return pa.table({"doc_id": pa.array(out_i, pa.int64()),
                         "text": pa.array(out_t, pa.string())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(derive, batch_format="pyarrow")


def q_minhash_lsh_clusters(sf_dir: str):
    """Flagship dedup (MinHash/LSH + SimHash prefilter + exact-Jaccard /
    gated-Levenshtein verify + connected components) over the planted-salted
    conformance corpus — every tier runs, and the cluster assignment has a
    closed-form SQL oracle. The natural-corpus run of the same pipeline is
    exercised by entry(), bench.py, and the recall/precision e2e tests."""
    from .dedup import dedup_pipeline

    res = dedup_pipeline(_planted_salted_docs(sf_dir), _QCFG)
    return res.clusters


SQL_MINHASH_LSH_CLUSTERS = """
SELECT doc_id, doc_id AS cluster_id FROM documents
UNION ALL SELECT doc_id + 1000000, doc_id FROM documents
UNION ALL SELECT doc_id + 2000000, doc_id FROM documents WHERE length(text) >= 60
"""


def _copy_consistency(sf_dir: str, value_fn):
    """Corpus ∪ exact copies (ids + 1_000_000, read by SEPARATE source tasks
    so base and copy land in different blocks/batches), a per-doc uint64
    digest via ``value_fn(batch) -> np.uint64[n]``, then a groupby asserting
    both variants produced the identical digest. This is the partitioning-
    invariance + determinism oracle for hash-style operators whose raw
    values are not SQL-expressible (their values are pinned by unit tests)."""
    from ray.data.aggregate import Count, Max, Min

    base = _docs(sf_dir, ["doc_id", "text"])

    def shift(t: pa.Table) -> pa.Table:
        _planted_guard(t["doc_id"].to_numpy(zero_copy_only=False))
        return pa.table({"doc_id": pc.add(t["doc_id"], 1_000_000), "text": t["text"]})

    copies = _docs(sf_dir, ["doc_id", "text"]).map_batches(shift, batch_format="pyarrow")

    def val(t: pa.Table) -> pa.Table:
        v = np.asarray(value_fn(t), dtype=np.uint64).view(np.int64)
        key = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64) % 1_000_000
        return pa.table({"doc_id": pa.array(key, pa.int64()),
                         "v": pa.array(v, pa.int64())})

    both = base.union(copies).map_batches(val, batch_format="pyarrow")
    agg = both.groupby("doc_id").aggregate(
        Min("v", alias_name="vmin"), Max("v", alias_name="vmax"),
        Count(alias_name="n"),
    )

    def fin(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.equal(t["vmin"], t["vmax"]),
                     pc.equal(pc.cast(t["n"], pa.int64()), 2))
        return pa.table({"doc_id": t["doc_id"], "copy_consistent": ok})

    return agg.map_batches(fin, batch_format="pyarrow")


SQL_COPY_CONSISTENT = "SELECT doc_id, TRUE AS copy_consistent FROM documents"


def _simhash_values(t: pa.Table) -> np.ndarray:
    from ..functions.shingles import list_column_flat, shingle_array
    from ..functions.simhash import simhash_flat

    norm = normalize_array(t["text"], _QCFG.max_chars, _QCFG.n_grams)
    flat, off = list_column_flat(shingle_array(norm, 3))
    return simhash_flat(flat, off, seed=_QCFG.seed)


def q_simhash(sf_dir: str):
    """SimHash copy-consistency over the doubled corpus (oracle: TRUE per
    doc). Raw values: :func:`q_simhash_values` (bench) + unit parity tests."""
    return _copy_consistency(sf_dir, _simhash_values)


def q_simhash_values(sf_dir: str):
    """Per-doc 64-bit SimHash (rows-only helper for bench/inspection)."""
    def fn(t: pa.Table) -> pa.Table:
        sim = _simhash_values(t)
        return pa.table({"doc_id": t["doc_id"],
                         "simhash": pa.array(sim.astype(np.int64), pa.int64())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


_LANG_PLANT = [
    ("en", "the cat and the dog are in the house with a bird"),
    ("de", "der hund und die katze sind nicht im haus"),
    ("fr", "le chat est dans la maison avec le chien"),
    ("es", "el perro y el gato en la casa por la noche"),
    ("zh", "你好世界 这是一个测试 文本"),
    ("und", "qwxz plugh zzyzx flrbb"),
]


def q_lang_id(sf_dir: str):
    """Language ID over a PLANTED corpus: each doc_id gets a stopword-rich
    sentence of language ``_LANG_PLANT[doc_id % 6]`` plus a doc-unique hex
    token (so texts differ per doc) — the heuristic's decision is then
    closed-form SQL (doc_id % 6 → language). The vectorized kernel is
    parity-tested against the scalar oracle on edge cases in
    tests/test_textstats.py."""
    from ..functions.textstats import detect_language_batch

    def derive_and_predict(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = [f"{_LANG_PLANT[int(i) % 6][1]} {int(splitmix64(np.uint64(i))):012x}"
                 for i in ids]
        langs = detect_language_batch(pa.array(texts, pa.string()))
        return pa.table({"doc_id": t["doc_id"],
                         "lang_pred": pa.array(list(langs), pa.string())})

    return _docs(sf_dir, ["doc_id"]).map_batches(derive_and_predict,
                                                 batch_format="pyarrow")


SQL_LANG_ID = """
SELECT doc_id, CASE doc_id % 6 WHEN 0 THEN 'en' WHEN 1 THEN 'de'
  WHEN 2 THEN 'fr' WHEN 3 THEN 'es' WHEN 4 THEN 'zh' ELSE 'und' END AS lang_pred
FROM documents
"""


def _round6_half_up(x: np.ndarray) -> np.ndarray:
    """floor(x·10⁶ + 0.5)/10⁶ — mirrored EXACTLY in the SQL oracle. The
    quality ratios regularly land on exact .5 rounding boundaries (clip
    saturations, power-of-two denominators), where numpy's half-even and
    DuckDB's half-away disagree; a shared half-up rule removes the tie."""
    return np.floor(x * 1e6 + 0.5) / 1e6


def q_quality(sf_dir: str):
    from ..functions.textstats import quality_features

    def fn(t: pa.Table) -> pa.Table:
        q = quality_features(t["text"])
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(q["n_tokens"], pa.int64()),
            "punct_ratio": pa.array(_round6_half_up(q["punct_ratio"]), pa.float64()),
            "stopword_ratio": pa.array(_round6_half_up(q["stopword_ratio"]), pa.float64()),
            "quality_score": pa.array(_round6_half_up(q["quality_score"]), pa.float64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def _fingerprint_values(t: pa.Table) -> np.ndarray:
    from ..functions.textstats import content_fingerprint

    return content_fingerprint(t["text"], seed=_QCFG.seed)


def q_fingerprint_values(sf_dir: str):
    """Per-doc 64-bit content fingerprint (rows-only helper for bench)."""
    def fn(t: pa.Table) -> pa.Table:
        fp = _fingerprint_values(t)
        return pa.table({"doc_id": t["doc_id"],
                         "fingerprint": pa.array(fp.view(np.int64), pa.int64())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def q_fingerprint(sf_dir: str):
    """Content-fingerprint copy-consistency + collision check: identical
    copies must share the 64-bit rolling hash (copy_consistent) and
    distinct texts must NOT collide (is_unique — the Ray side groups by
    fingerprint value, the SQL side groups by text; a hash collision makes
    them disagree)."""
    import ray
    from ray.data.aggregate import Count

    def fn(t: pa.Table) -> pa.Table:
        fp = _fingerprint_values(t)
        return pa.table({"doc_id": t["doc_id"],
                         "fingerprint": pa.array(fp.view(np.int64), pa.int64())})

    fps = _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")
    fps = fps.materialize()
    # fingerprint multiplicity: collision ⇔ count > 1 for distinct texts
    counts = fps.groupby("fingerprint").aggregate(Count(alias_name="n_fp"))
    crows = counts.take_all()
    cmap_keys = np.array([r["fingerprint"] for r in crows], np.int64)
    cmap_vals = np.array([r["n_fp"] for r in crows], np.int64)
    order = np.argsort(cmap_keys)
    ref = ray.put((cmap_keys[order], cmap_vals[order]))

    consistency = _copy_consistency(sf_dir, _fingerprint_values)

    def attach(t: pa.Table) -> pa.Table:
        ks, vs = ray.get(ref)
        f = t["fingerprint"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ks, f)
        uniq = vs[np.minimum(pos, len(ks) - 1)] == 1
        return pa.table({"doc_id": t["doc_id"],
                         "is_unique": pa.array(uniq, pa.bool_())})

    uniq_ds = fps.map_batches(attach, batch_format="pyarrow")
    joined = consistency.join(uniq_ds, join_type="inner", num_partitions=4,
                              on=("doc_id",), right_on=("doc_id",))
    return joined.select_columns(["doc_id", "copy_consistent", "is_unique"])


SQL_FINGERPRINT = """
SELECT doc_id, TRUE AS copy_consistent,
       (count(*) OVER (PARTITION BY text)) = 1 AS is_unique
FROM documents
"""


# The quality signals are plain arithmetic over regex-derived counts, so the
# oracle REPLICATES the formula in SQL with the same float op order
# (functions/textstats.py:quality_features).
SQL_QUALITY = """
WITH b AS (
  SELECT doc_id,
    length(text) AS n_chars,
    CASE WHEN trim(text) = '' THEN 0
         ELSE length(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
    length(regexp_replace(text, '\\s', '', 'g')) AS n_nonspace,
    length(regexp_replace(regexp_replace(text, '\\s', '', 'g'),
                          '[^A-Za-z0-9]', '', 'g')) AS n_alnum
  FROM documents),
t AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
      FROM documents),
sc AS (SELECT doc_id, count(*) FILTER (WHERE w IN
        ('the','a','an','and','or','of','to','in','is','are','was','were',
         'be','been','it','this','that','for','on','with','as','at','by',
         'from','not','no','but','if','then','than','so','such','can',
         'will','just','into','over','under','out','up','down')) AS n_stop
      FROM t GROUP BY doc_id)
SELECT b.doc_id,
  b.n_tokens,
  floor((b.n_nonspace - b.n_alnum) * 1.0 / greatest(b.n_nonspace, 1)
        * 1000000 + 0.5) / 1000000 AS punct_ratio,
  floor(coalesce(sc.n_stop, 0) * 1.0 / greatest(b.n_tokens, 1)
        * 1000000 + 0.5) / 1000000 AS stopword_ratio,
  floor((0.4 * least(b.n_chars / 200.0, 1.0)
      + 0.3 * greatest(least(1.0 - abs(b.n_nonspace * 1.0
            / greatest(b.n_tokens, 1) - 5.0) / 10.0, 1.0), 0.0)
      + 0.3 * (1.0 - least(((b.n_nonspace - b.n_alnum) * 1.0
            / greatest(b.n_nonspace, 1)) * 2.0, 1.0)))
        * 1000000 + 0.5) / 1000000 AS quality_score
FROM b LEFT JOIN sc USING (doc_id)
"""


def q_bpe_tokens(sf_dir: str):
    from ..functions.textstats import bpe_token_counts_batch

    def fn(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"],
                         "n_bpe_tokens": pa.array(bpe_token_counts_batch(t["text"]),
                                                  pa.int64())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


# The GPT-2-style pre-tokenizer regex is RE2-compatible (no lookarounds), so
# the BPE-ish token count has an exact DuckDB oracle: count non-whitespace
# pre-tokenizer segments (validated byte-identical vs the Python kernel).
SQL_BPE_TOKENS = (
    "SELECT doc_id, len(list_filter(regexp_extract_all(text, "
    "$$'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+$$), "
    "x -> NOT regexp_matches(x, '^\\s+$'))) AS n_bpe_tokens FROM documents"
)


# ---------------------------------------------------------------------------
# Catalog
# ---------------------------------------------------------------------------

QUERIES = {
    "normalize": q_normalize,
    "tokenize": q_tokenize,
    "word_df": q_word_df,
    "word_idf": q_word_idf,
    "ngram_df": q_ngram_df,
    "exact_dedup_first": q_exact_dedup_first,
    "exact_text_groups": q_exact_text_groups,
    "grouped_argmax": q_grouped_argmax,
    "top_docs": q_top_docs,
    "token_count": q_token_count,
    "lev_distance": q_lev_distance,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "ann_topk": q_ann_topk,
    "ann_ivf": q_ann_ivf,
    "embedding_neardup": q_embedding_neardup,
    "lineitem_agg": q_lineitem_agg,
    "customer_orders": q_customer_orders,
    "events_hourly": q_events_hourly,
    "minhash_lsh_clusters": q_minhash_lsh_clusters,
    "simhash": q_simhash,
    "fingerprint": q_fingerprint,
    "bpe_tokens": q_bpe_tokens,
    "lang_id": q_lang_id,
    "quality": q_quality,
}
# every entry above and below is oracled (incl. sample_fraction, whose
# hash-gated membership is exactly reproducible in DuckDB SQL)

ORACLES = {
    "normalize": SQL_NORMALIZE,
    "tokenize": SQL_TOKENIZE,
    "word_df": SQL_WORD_DF,
    "word_idf": SQL_WORD_IDF,
    "ngram_df": SQL_NGRAM_DF,
    "exact_dedup_first": SQL_EXACT_DEDUP_FIRST,
    "exact_text_groups": SQL_EXACT_TEXT_GROUPS,
    "grouped_argmax": SQL_GROUPED_ARGMAX,
    "top_docs": SQL_TOP_DOCS,
    "token_count": SQL_TOKEN_COUNT,
    "lev_distance": SQL_LEV_DISTANCE,
    "ngram_jaccard_pairs": SQL_NGRAM_JACCARD_PAIRS,
    "ann_topk": SQL_ANN_TOPK,
    "ann_ivf": SQL_ANN_TOPK,
    "embedding_neardup": SQL_EMBEDDING_NEARDUP,
    "lineitem_agg": SQL_LINEITEM_AGG,
    "customer_orders": SQL_CUSTOMER_ORDERS,
    "events_hourly": SQL_EVENTS_HOURLY,
    "minhash_lsh_clusters": SQL_MINHASH_LSH_CLUSTERS,
    "lang_id": SQL_LANG_ID,
    "quality": SQL_QUALITY,
    "simhash": SQL_COPY_CONSISTENT,
    "fingerprint": SQL_FINGERPRINT,
    "bpe_tokens": SQL_BPE_TOKENS,
}


# ---------------------------------------------------------------------------
# Containment, LSH-embedding, distributed CC, title matching (added coverage)
# ---------------------------------------------------------------------------

def q_containment_pairs(sf_dir: str):
    """Containment dedup (D6) on a derived unique-vocabulary corpus: per
    doc_id, 40 seven-hex-char words hashed from (doc_id, position); the
    derived prefix page (+1_000_000) is the first 20 words.

    Unique vocabulary makes winnowing fingerprint sets (near-)disjoint
    across docs — no stop-fingerprint drops, no natural pairs — so the
    winnowing stage must recover exactly {(i, i+1e6)}: closed-form SQL.
    (Stop-fingerprint recall loss on repetitive real corpora is expected
    behaviour and is surfaced by the drop counter in stages/containment.py;
    the containment SCORE is winnow-window-dependent, hence ids only.)"""
    def derive(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        _planted_guard(ids)
        out_i, out_t = [], []
        for i in ids:
            h = splitmix64(np.uint64(i) * np.uint64(1_000_003)
                           + np.arange(40, dtype=np.uint64))
            words = [f"{int(x):013x}"[:7] for x in h]
            out_i.append(int(i))
            out_t.append(" ".join(words))
            out_i.append(int(i) + 1_000_000)
            out_t.append(" ".join(words[:20]))
        return pa.table({"doc_id": pa.array(out_i, pa.int64()),
                         "norm_text": pa.array(out_t, pa.string())})

    from ..stages.containment import containment_pairs

    docs = _docs(sf_dir, ["doc_id"]).map_batches(derive, batch_format="pyarrow")
    return containment_pairs(docs, min_containment=0.6) \
        .select_columns(["left_id", "right_id"])


SQL_CONTAINMENT_PAIRS = (
    "SELECT doc_id AS left_id, doc_id + 1000000 AS right_id FROM documents"
)


def q_embedding_neardup_lsh(sf_dir: str):
    """Scale-path embedding near-dup via multi-table hyperplane LSH over
    the corpus ∪ exact copies (vec_id + 1_000_000): identical vectors
    collide in every table (recall 1 by construction) and the in-bucket
    exact-cosine verify at 0.98 excludes every natural pair (max natural
    cosine ≈ 0.51 in this data) — so the general pair-set SQL below reduces
    to exactly the planted pairs."""
    def derive(t: pa.Table) -> pa.Table:
        from ..stages.embed import batch_matrix

        mat = batch_matrix(t).astype(np.float32)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        _planted_guard(ids)
        allm = np.concatenate([mat, mat])
        all_ids = np.concatenate([ids, ids + 1_000_000])
        return pa.table({
            "vec_id": pa.array(all_ids, pa.int64()),
            "embedding": pa.array(list(allm), pa.list_(pa.float32())),
        })

    from ..stages.embed import embedding_neardup_lsh

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"]) \
        .map_batches(derive, batch_format="pyarrow")
    return embedding_neardup_lsh(emb, threshold=0.98, n_planes=12, n_tables=6)


SQL_EMBEDDING_NEARDUP_LSH = """
WITH u AS (SELECT vec_id, embedding FROM embeddings
           UNION ALL SELECT vec_id + 1000000, embedding FROM embeddings)
SELECT a.vec_id AS left_id, b.vec_id AS right_id
FROM u a JOIN u b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.98
"""


def q_cc_labels(sf_dir: str):
    """Distributed connected components (A10) on derived chain edges
    (doc_id → doc_id+1 within groups of 5): labels must equal
    doc_id − doc_id % 5 — which IS the SQL oracle."""
    import ray.data as rd

    from ..state.cc import connected_components_distributed

    ids = _docs(sf_dir, ["doc_id"])

    def edges(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        keep = (d % 5) != 4
        return pa.table({"left_id": pa.array(d[keep], pa.int64()),
                         "right_id": pa.array(d[keep] + 1, pa.int64())})

    labels = connected_components_distributed(ids.map_batches(edges, batch_format="pyarrow"))
    return labels


SQL_CC_LABELS = """
SELECT doc_id AS node, doc_id - (doc_id % 5) AS label FROM documents
"""


def q_match_titles(sf_dir: str):
    """Reference-compat tiered title matching over the part table: truth =
    name-deduped (p_partkey, p_name); queries = the exact names (must hit
    tier 1 with their own key) ∪ digit-gibberish strings derived from the
    partkey (share zero 3-grams with any letters-only part name → must fall
    through every tier to not_found). Both outcomes are closed-form SQL.
    The misspelled-query path (tiers 2/3) is exercised by the matching e2e
    tests and the planted dedup oracle's Levenshtein chain."""
    from ..config import MatchConfig
    from .matching import match_pipeline

    from ray.data.aggregate import Min

    # part names repeat heavily (≈60 distinct for 2000 rows); duplicate
    # truth rows make every tier-2 match ambiguous (the reference's
    # _remove_duplicated_matches drop, predict.py:158-161) — dedupe first
    part = _read(sf_dir, "part", ["p_partkey", "p_name"]) \
        .groupby("p_name").aggregate(Min("p_partkey", alias_name="p_partkey"))

    def to_queries(t: pa.Table) -> pa.Table:
        ids = t["p_partkey"].to_pylist()
        _planted_guard(ids)
        names = t["p_name"].to_pylist()
        out_ids, out_titles = [], []
        for i, n in zip(ids, names):
            out_ids.append(i)
            out_titles.append(n)
            h = splitmix64(np.uint64(i) * np.uint64(11400714819323198485)
                           + np.arange(1, 4, dtype=np.uint64))
            out_ids.append(i + 1_000_000)
            out_titles.append(" ".join(f"{int(x) % 10**8:08d}" for x in h))
        return pa.table({"test_index": pa.array(out_ids, pa.int64()),
                         "title": pa.array(out_titles, pa.string())})

    test = part.map_batches(to_queries, batch_format="pyarrow")
    cfg = MatchConfig(top_k=10, concurrency=2)
    matched = match_pipeline(test, part, cfg,
                             truth_id_col="p_partkey", truth_text_col="p_name")

    def widen(t: pa.Table) -> pa.Table:
        return pa.table({
            "test_index": t["test_index"],
            "title_id": t["title_id"],
            "prediction": pc.cast(t["prediction"], pa.float64()),
            "tier": t["tier"],
        })

    return matched.map_batches(widen, batch_format="pyarrow")


SQL_MATCH_TITLES = """
WITH d AS (SELECT min(p_partkey) AS pk FROM part GROUP BY p_name)
SELECT pk AS test_index, pk AS title_id, 1.0 AS prediction, 'exact' AS tier FROM d
UNION ALL
SELECT pk + 1000000, -1, 0.0, 'not_found' FROM d
"""


def _winnow_digest(t: pa.Table) -> np.ndarray:
    """Order-independent-set digest (hash of the sorted fp buffer) of each
    doc's winnowing fingerprints."""
    from ..functions.hashing import hash_bytes_rows
    from ..functions.textstats import winnow_fingerprints

    norm = normalize_array(t["text"], _QCFG.max_chars, _QCFG.n_grams)
    fps = [winnow_fingerprints(x, seed=_QCFG.seed) for x in norm.to_pylist()]
    lens = np.array([f.nbytes for f in fps], dtype=np.int64)
    offs = np.concatenate([np.zeros(1, np.int64), np.cumsum(lens)])
    data = (np.frombuffer(b"".join(f.tobytes() for f in fps), dtype=np.uint8)
            if len(fps) else np.empty(0, np.uint8))
    return hash_bytes_rows(data, offs, seed=7)


def q_winnow(sf_dir: str):
    """Winnowing fingerprint-set copy-consistency (oracle: TRUE per doc);
    raw fingerprint behaviour is pinned by the unit tests and the oracled
    containment query."""
    return _copy_consistency(sf_dir, _winnow_digest)


def _substring_corpus(sf_dir: str):
    """Per base doc i (unique 40-word hash vocabulary, as in
    q_containment_pairs):

    * +1_000_000 — the first 20 words: a TRUE substring (prefix) of the base
    * +2_000_000 — the 40 words with every 10th replaced by a fresh unique
      word: heavy fingerprint overlap (9-word shared runs ≫ w+k−1 chars)
      but NOT a substring of anything — the planted negative the
      certification tier must reject

    Unique per-doc vocabulary ⇒ no cross-doc pairs; expected certified
    output is exactly {(i, i+1e6)}: closed-form SQL."""
    def derive(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        _planted_guard(ids)
        out_i, out_t = [], []
        for i in ids:
            h = splitmix64(np.uint64(i) * np.uint64(1_000_003)
                           + np.arange(40, dtype=np.uint64))
            words = [f"{int(x):013x}"[:7] for x in h]
            out_i.append(int(i))
            out_t.append(" ".join(words))
            out_i.append(int(i) + 1_000_000)
            out_t.append(" ".join(words[:20]))
            rep = splitmix64(np.uint64(i) * np.uint64(1_000_033)
                             + np.uint64(77) + np.arange(4, dtype=np.uint64))
            variant = list(words)
            for j, x in zip((9, 19, 29, 39), rep):
                variant[j] = f"{int(x):013x}"[:7]
            out_i.append(int(i) + 2_000_000)
            out_t.append(" ".join(variant))
        return pa.table({"doc_id": pa.array(out_i, pa.int64()),
                         "norm_text": pa.array(out_t, pa.string())})

    return _docs(sf_dir, ["doc_id"]).map_batches(derive, batch_format="pyarrow")


def q_substring_pairs(sf_dir: str):
    """Substring-certified containment (the north_star's suffix/substring
    stage, stages/containment.py:substring_containment_pairs): low-bar
    winnowing candidates → text attach by hash join → exact substring
    certification. On the planted corpus the certified set is exactly the
    prefix pairs; the planted high-overlap NON-substring variants must be
    generated as candidates and rejected (asserted in
    tests/test_training.py::test_substring_certification_rejects_negatives)."""
    from ..stages.containment import substring_containment_pairs

    out = substring_containment_pairs(_substring_corpus(sf_dir))

    def certified(t: pa.Table) -> pa.Table:
        keep = t.filter(t["is_substring"])
        return pa.table({"left_id": keep["left_id"],
                         "right_id": keep["right_id"],
                         "contained_id": keep["contained_id"]})

    return out.map_batches(certified, batch_format="pyarrow")


SQL_SUBSTRING_PAIRS = (
    "SELECT doc_id AS left_id, doc_id + 1000000 AS right_id, "
    "doc_id + 1000000 AS contained_id FROM documents"
)


def _cdc_digest(t: pa.Table) -> np.ndarray:
    """Per-doc order-sensitive digest of the CDC chunk-hash sequence
    (`functions/cdc.py`) — byte-level, raw text (CDC is a storage/code
    dedup primitive; no normalization)."""
    from ..functions.cdc import cdc_row_digest
    from ..functions.hashing import _string_buffers

    arr = t["text"]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    data, offsets = _string_buffers(arr)
    return cdc_row_digest(data, offsets, len(t))


def q_cdc_chunks(sf_dir: str):
    """Content-defined chunking copy-consistency (oracle: TRUE per doc) —
    the raw boundary/chunk behaviour (shift robustness, max-cut, tiling)
    is pinned by `tests/test_cdc.py`; this certifies the chunk-hash
    SEQUENCE is deterministic and partition-invariant across blocks, the
    property chunk-level dedup at 100 TB rests on."""
    return _copy_consistency(sf_dir, _cdc_digest)


QUERIES.update({
    "containment_pairs": q_containment_pairs,
    "embedding_neardup_lsh": q_embedding_neardup_lsh,
    "cc_labels": q_cc_labels,
    "match_titles": q_match_titles,
    "winnow": q_winnow,
    "substring_pairs": q_substring_pairs,
    "cdc_chunks": q_cdc_chunks,
})

ORACLES.update({
    "cc_labels": SQL_CC_LABELS,
    "containment_pairs": SQL_CONTAINMENT_PAIRS,
    "embedding_neardup_lsh": SQL_EMBEDDING_NEARDUP_LSH,
    "match_titles": SQL_MATCH_TITLES,
    "winnow": SQL_COPY_CONSISTENT,
    "substring_pairs": SQL_SUBSTRING_PAIRS,
    "cdc_chunks": SQL_COPY_CONSISTENT,
})


# ---------------------------------------------------------------------------
# IDF-weighted Jaccard pairs (reference match_maker.py:16-52 semantics as a
# corpus-level operator, with an exact SQL oracle)
# ---------------------------------------------------------------------------

def q_idf_jaccard_pairs(sf_dir: str, threshold: float = 0.35):
    """All-pairs IDF-weighted (modified) Jaccard ≥ threshold over 3-gram
    sets — Σidf(common) / (Σidf(a)+Σidf(b)−Σidf(common)), idf = ln(N/df)
    from the corpus itself (A2+A3 feeding T2)."""
    import ray

    from ..functions.shingles import shingle_array
    from ..state.idf import build_idf_arrays, idf_weighted_jaccard

    def prep(t: pa.Table) -> pa.Table:
        norm = normalize_array(t["text"], _QCFG.max_chars, _QCFG.n_grams)
        return pa.table({"doc_id": t["doc_id"], "shingles": shingle_array(norm, 3)})

    docs = _docs(sf_dir, ["doc_id", "text"]).map_batches(prep, batch_format="pyarrow")
    docs = docs.materialize()
    n_docs = docs.count()
    codes, idf, max_idf = build_idf_arrays(docs, n_docs)

    rows = docs.take_all()
    ids = np.array([r["doc_id"] for r in rows], dtype=np.int64)
    sets = [np.asarray(r["shingles"], dtype=np.uint64) for r in rows]
    order = np.argsort(ids)
    ids = ids[order]
    sets = [sets[i] for i in order]
    ref = ray.put((ids, sets, codes, idf, max_idf))

    import ray.data as rd

    idx = rd.from_items([{"i": int(i)} for i in range(len(ids))])

    def pairs_for(batch: pa.Table) -> pa.Table:
        bids, bsets, bc, bi, bm = ray.get(ref)
        out_l, out_r, out_j = [], [], []
        for i in batch["i"].to_pylist():
            for j in range(i + 1, len(bids)):
                s = idf_weighted_jaccard(bsets[i], bsets[j], bc, bi, bm)
                if s >= threshold:
                    out_l.append(int(bids[i]))
                    out_r.append(int(bids[j]))
                    out_j.append(round(s, 6))
        return pa.table({"left_id": pa.array(out_l, pa.int64()),
                         "right_id": pa.array(out_r, pa.int64()),
                         "idf_jaccard": pa.array(out_j, pa.float64())})

    return idx.map_batches(pairs_for, batch_format="pyarrow", batch_size=32)


SQL_IDF_JACCARD_PAIRS = f"""
WITH n AS (SELECT doc_id, {_SQL_NORM} AS norm FROM documents),
e AS (SELECT doc_id, norm, unnest(range(1, length(norm) - 1)) AS i FROM n),
g AS (SELECT DISTINCT doc_id, substring(norm, CAST(i AS INT), 3) AS gram FROM e),
d AS (SELECT gram, count(*) AS df FROM g GROUP BY gram),
w AS (SELECT gram, ln((SELECT count(*) FROM documents) * 1.0 / df) AS idf FROM d),
s AS (SELECT g.doc_id, sum(w.idf) AS sw FROM g JOIN w USING (gram) GROUP BY g.doc_id),
i AS (SELECT a.doc_id AS l, b.doc_id AS r, sum(w.idf) AS wc
      FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
      JOIN w ON w.gram = a.gram
      GROUP BY a.doc_id, b.doc_id)
SELECT i.l AS left_id, i.r AS right_id,
       round(i.wc / (sa.sw + sb.sw - i.wc), 6) AS idf_jaccard
FROM i JOIN s sa ON sa.doc_id = i.l JOIN s sb ON sb.doc_id = i.r
WHERE i.wc / (sa.sw + sb.sw - i.wc) >= 0.35
"""

QUERIES["idf_jaccard_pairs"] = q_idf_jaccard_pairs
ORACLES["idf_jaccard_pairs"] = SQL_IDF_JACCARD_PAIRS


# ---------------------------------------------------------------------------
# Anti-join (D5/J2), sessionization, window top-k, broadcast dimension join
# ---------------------------------------------------------------------------

def q_customers_without_orders(sf_dir: str, min_price: float = 400_000.0):
    """Anti-join via broadcast key set (ray_guide 'Semi / anti join'):
    customers with NO order above min_price; the qualifying o_custkey set
    is collected once and filtered against per batch. (The unrestricted
    anti-join is empty in this dense synthetic data.)"""
    import ray

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    big = orders.map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], min_price))
                   .select(["o_custkey"]),
        batch_format="pyarrow")
    keys = big.unique("o_custkey")
    ref = ray.put(np.sort(np.array(keys, dtype=np.int64)))

    def anti(t: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        ids = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ks) == 0:  # nobody qualifies → every customer passes
            return pa.table({"c_custkey": pa.array(ids, pa.int64())})
        pos_c = np.minimum(np.searchsorted(ks, ids), len(ks) - 1)
        found = ks[pos_c] == ids
        return pa.table({"c_custkey": pa.array(ids[~found], pa.int64())})

    return _read(sf_dir, "customer", ["c_custkey"]).map_batches(anti, batch_format="pyarrow")


SQL_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_custkey FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
"""


def q_event_sessions(sf_dir: str, gap_minutes: int = 30, num_partitions: int = 32):
    """Sessionization (streaming-shaped op, ray_guide): per-user sorted
    event log, a new session starts when the gap exceeds 30 min. Ray Data
    has no event-time windows — the window is a groupby on a COARSE
    partition key (user_id % P, the same pattern as the LSH/exact tiers:
    P groups, not one Python call per user), with all users of a partition
    processed in one numpy lexsort + diff pass."""
    def per_partition(g):
        ts = g["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid, ts = uid[order], ts[order]
        new_user = np.ones(len(uid), dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        gap = np.zeros(len(uid), dtype=bool)
        gap[1:] = (ts[1:] - ts[:-1]) > gap_minutes * 60_000_000
        new_session = new_user | gap
        users = uid[new_user]
        run_id = np.cumsum(new_user) - 1
        n_sessions = np.bincount(run_id[new_session], minlength=len(users))
        n_events = np.bincount(run_id, minlength=len(users))
        return pa.table({"user_id": pa.array(users, pa.int64()),
                         "n_sessions": pa.array(n_sessions.astype(np.int64), pa.int64()),
                         "n_events": pa.array(n_events.astype(np.int64), pa.int64())})

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts"])

    def add_part(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("part", pa.array(u % num_partitions, pa.int64()))

    return ev.map_batches(add_part, batch_format="pyarrow") \
        .groupby("part").map_groups(per_partition, batch_format="pyarrow") \
        .select_columns(["user_id", "n_sessions", "n_events"])


SQL_EVENT_SESSIONS = """
WITH e AS (
  SELECT user_id,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
  FROM events)
SELECT user_id, CAST(1 + sum(new_s) AS BIGINT) AS n_sessions, count(*) AS n_events
FROM e GROUP BY user_id
"""


def q_top2_orders_per_customer(sf_dir: str, num_partitions: int = 32):
    """Grouped top-k (window row_number analogue) on a coarse partition key:
    one numpy lexsort per partition ranks every customer's orders at once —
    no per-customer Python (the fine-key map_groups pattern costs
    ~0.4 ms/group; millions of customers would serialize)."""
    def per_partition(g):
        ck = g["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ok = g["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        price = g["o_totalprice"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ok, -price, ck))
        ck, ok = ck[order], ok[order]
        new = np.ones(len(ck), dtype=bool)
        new[1:] = ck[1:] != ck[:-1]
        run_id = np.cumsum(new) - 1
        starts = np.nonzero(new)[0]
        rank = np.arange(len(ck)) - starts[run_id]
        keep = rank < 2
        return pa.table({"o_custkey": pa.array(ck[keep], pa.int64()),
                         "o_orderkey": pa.array(ok[keep], pa.int64())})

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def add_part(t: pa.Table) -> pa.Table:
        c = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("part", pa.array(c % num_partitions, pa.int64()))

    return orders.map_batches(add_part, batch_format="pyarrow") \
        .groupby("part").map_groups(per_partition, batch_format="pyarrow") \
        .select_columns(["o_custkey", "o_orderkey"])


SQL_TOP2_ORDERS_PER_CUSTOMER = """
SELECT o_custkey, o_orderkey FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) WHERE rn <= 2
"""


def q_customers_per_region(sf_dir: str):
    """Two broadcast dimension lookups (J4: nation, region ray.put once)
    + grouped count — the classic star-schema broadcast join."""
    import ray
    from ray.data.aggregate import Count

    nation = {r["n_nationkey"]: r["n_regionkey"]
              for r in _read(sf_dir, "nation").take_all()}
    region = {r["r_regionkey"]: r["r_name"]
              for r in _read(sf_dir, "region").take_all()}
    ref = ray.put((nation, region))

    def tag(t: pa.Table) -> pa.Table:
        nat, reg = ray.get(ref)
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False)
        names = [reg[nat[int(k)]] for k in nk]
        return pa.table({"r_name": pa.array(names, pa.string())})

    return _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("r_name").aggregate(Count(alias_name="n_customers"))


SQL_CUSTOMERS_PER_REGION = """
SELECT r.r_name, count(*) AS n_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""


def q_sample_fraction(sf_dir: str):
    """O4 deterministic-by-hash sampling (reference O4 is unseeded RNG —
    `feature_engineering.py:276-296` — which we replace with hash-gated
    membership: keep iff fmix32(doc_id ^ seed) < p·2^32). Unlike RNG
    sampling this is stable under retries and repartitioning (membership
    depends only on the row id) and exactly expressible in DuckDB SQL, so
    the sampler itself is oracled."""
    from ..functions.hashing import hash_sample_mask

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(hash_sample_mask(ids, 0.2, seed=42)))

    return _docs(sf_dir, ["doc_id"]).map_batches(fn, batch_format="pyarrow")


QUERIES.update({
    "customers_without_orders": q_customers_without_orders,
    "event_sessions": q_event_sessions,
    "top2_orders_per_customer": q_top2_orders_per_customer,
    "customers_per_region": q_customers_per_region,
    "sample_fraction": q_sample_fraction,
})
def _sql_sample_fraction() -> str:
    from ..functions.hashing import sql_hash_sample

    return sql_hash_sample("documents", "doc_id", 0.2, seed=42, select="doc_id")


ORACLES.update({
    "customers_without_orders": SQL_CUSTOMERS_WITHOUT_ORDERS,
    "event_sessions": SQL_EVENT_SESSIONS,
    "top2_orders_per_customer": SQL_TOP2_ORDERS_PER_CUSTOMER,
    "customers_per_region": SQL_CUSTOMERS_PER_REGION,
    "sample_fraction": _sql_sample_fraction(),
})


def q_revenue_by_nation(sf_dir: str):
    """TPC-H-Q5-ish multi-join chain: lineitem ⋈ orders ⋈ customer (two
    large hash joins) + nation broadcast lookup → grouped revenue. The
    big-side joins shuffle; the 25-row nation table is a ray.put lookup."""
    import ray
    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"], "rev": r})

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = {r["n_nationkey"]: r["n_name"] for r in _read(sf_dir, "nation").take_all()}
    ref = ray.put(nation)

    joined = li.map_batches(rev, batch_format="pyarrow") \
        .join(orders, join_type="inner", num_partitions=4,
              on=("l_orderkey",), right_on=("o_orderkey",)) \
        .join(cust, join_type="inner", num_partitions=4,
              on=("o_custkey",), right_on=("c_custkey",))

    def tag(t: pa.Table) -> pa.Table:
        nat = ray.get(ref)
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False)
        names = [nat[int(k)] for k in nk]
        return pa.table({"n_name": pa.array(names, pa.string()), "rev": t["rev"]})

    agg = joined.map_batches(tag, batch_format="pyarrow") \
        .groupby("n_name").aggregate(Sum("rev", alias_name="revenue"))
    return agg.map_batches(
        lambda t: pa.table({"n_name": t["n_name"],
                            "revenue": pc.round(t["revenue"], 2)}),
        batch_format="pyarrow")


SQL_REVENUE_BY_NATION = """
SELECT n.n_name, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


def q_event_type_counts(sf_dir: str):
    """Simple pivot-style grouped counts with mean value per event type."""
    from ray.data.aggregate import Count, Mean

    agg = _read(sf_dir, "events", ["event_type", "value"]) \
        .groupby("event_type").aggregate(Count(alias_name="n"),
                                         Mean("value", alias_name="avg_value"))

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t["event_type"],
                         "n": pc.cast(t["n"], pa.int64()),
                         "avg_value": pc.round(t["avg_value"], 4)})

    return agg.map_batches(fin, batch_format="pyarrow")


SQL_EVENT_TYPE_COUNTS = """
SELECT event_type, count(*) AS n, round(avg(value), 4) AS avg_value
FROM events GROUP BY event_type
"""


def q_doc_length_histogram(sf_dir: str, bucket: int = 50):
    """Bucketed length histogram over documents (n_chars // 50)."""
    from ray.data.aggregate import Count

    def bucketize(t: pa.Table) -> pa.Table:
        b = t["n_chars"].to_numpy(zero_copy_only=False) // bucket
        return pa.table({"length_bucket": pa.array(b * bucket, pa.int64())})

    return _docs(sf_dir, ["n_chars"]).map_batches(bucketize, batch_format="pyarrow") \
        .groupby("length_bucket").aggregate(Count(alias_name="n")) \
        .map_batches(lambda t: pa.table({"length_bucket": t["length_bucket"],
                                         "n": pc.cast(t["n"], pa.int64())}),
                     batch_format="pyarrow")


SQL_DOC_LENGTH_HISTOGRAM = """
SELECT (n_chars // 50) * 50 AS length_bucket, count(*) AS n
FROM documents GROUP BY (n_chars // 50) * 50
"""

QUERIES.update({
    "event_type_counts": q_event_type_counts,
    "doc_length_histogram": q_doc_length_histogram,
    "revenue_by_nation": q_revenue_by_nation,
})
ORACLES.update({
    "event_type_counts": SQL_EVENT_TYPE_COUNTS,
    "doc_length_histogram": SQL_DOC_LENGTH_HISTOGRAM,
    "revenue_by_nation": SQL_REVENUE_BY_NATION,
})


def q_asof_purchase_click(sf_dir: str, num_partitions: int = 32):
    """As-of join (operator Ray Data lacks — `stages/asof.py`): for every
    purchase event, the most recent click by the same user at-or-before
    the purchase time. Equivalent to DuckDB `p ASOF LEFT JOIN c ON
    p.user_id = c.user_id AND p.ts >= c.ts`; the SQL oracle below spells
    it with max()+join-back so (user_id, ts) ties resolve to the greatest
    click event_id exactly as the kernel does (deterministic hash)."""
    from ..stages.asof import asof_join

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    purchases = ev.filter(expr="event_type == 'purchase'")
    clicks = ev.filter(expr="event_type == 'click'")
    out = asof_join(purchases, clicks, by="user_id", on="ts",
                    left_id="event_id", right_id="event_id",
                    num_partitions=num_partitions)

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["event_id", "user_id", "ts", "click_ts", "click_event_id"])

    return out.map_batches(rename, batch_format="pyarrow")


SQL_ASOF_PURCHASE_CLICK = """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
     c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
     m AS (SELECT p.event_id, p.user_id, p.ts, max(c.ts) AS click_ts
           FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
           GROUP BY p.event_id, p.user_id, p.ts)
SELECT m.event_id, m.user_id, m.ts, m.click_ts,
       max(c.event_id) AS click_event_id
FROM m LEFT JOIN c ON c.user_id = m.user_id AND c.ts = m.click_ts
GROUP BY m.event_id, m.user_id, m.ts, m.click_ts
"""

QUERIES["asof_purchase_click"] = q_asof_purchase_click
ORACLES["asof_purchase_click"] = SQL_ASOF_PURCHASE_CLICK


def q_extract_text(sf_dir: str):
    """HTML → text extraction (`functions/html.py` — the webtext ingest
    stage the north_star's pages table implies; the reference has no HTML
    stage, `common.py:50-72` starts from CSV text, so the spec is this
    engine's own, documented in the module docstring). Pages are
    synthesized deterministically from `documents.text` by the same
    escape+wrap construction the fixtures use (no html column exists in
    the shared testdata), then extracted by the vectorized RE2 chain; the
    DuckDB oracle performs the identical construction AND the identical
    extraction with its own RE2, so the hash compares two independent
    engine implementations of the full spec."""
    from ..functions.html import (escape_html_array, extract_text_array,
                                  wrap_html_array)

    def fn(t: pa.Table) -> pa.Table:
        html = wrap_html_array(escape_html_array(t["text"]), t["doc_id"])
        return pa.table({
            "doc_id": t["doc_id"],
            "extracted": extract_text_array(html),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow")


def _sql_extract_text() -> str:
    from ..functions.html import sql_escape_wrap, sql_extract_text

    inner = sql_escape_wrap("text", "doc_id")
    return (f"SELECT doc_id, {sql_extract_text(inner)} AS extracted "
            "FROM documents")


QUERIES["extract_text"] = q_extract_text
ORACLES["extract_text"] = _sql_extract_text()


def q_url_canon(sf_dir: str):
    """URL canonicalization (`functions/urls.py` — the pages-table dedup
    key normalizer; no url column exists in the shared testdata, so messy
    capture urls are synthesized deterministically from doc_id with
    case/port/www/fragment/trailing-slash noise varying by doc_id % 5,
    identically in both engines). The DuckDB oracle reconstructs AND
    re-canonicalizes independently — a full cross-engine check of the spec."""
    from ..functions.urls import canon_url_array

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        messy = [_messy_url(int(i)) for i in ids]  # construction only — the
        # canon kernel below is the vectorized operator under test
        return pa.table({
            "doc_id": t["doc_id"],
            "canon_url": canon_url_array(pa.array(messy)),
        })

    return _docs(sf_dir, ["doc_id"]).map_batches(fn, batch_format="pyarrow")


def _messy_url(i: int) -> str:
    host = f"Site{i % 53}.Example.COM"
    scheme, port = ("HTTP", ":80") if i % 2 == 0 else ("https", ":443")
    www = "WWW." if i % 3 == 0 else ""
    tail = ["/", "#Sec2", "?q=X#y", "", "//"][i % 5]
    return f"{scheme}://{www}{host}{port}/Docs/{i}{tail}"


def _sql_url_canon() -> str:
    from ..functions.urls import sql_canon_url

    messy = (
        "(CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END || '://' || "
        "CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END || "
        "'Site' || (doc_id % 53)::VARCHAR || '.Example.COM' || "
        "CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END || "
        "'/Docs/' || doc_id::VARCHAR || "
        "CASE doc_id % 5 WHEN 0 THEN '/' WHEN 1 THEN '#Sec2' "
        "WHEN 2 THEN '?q=X#y' WHEN 3 THEN '' ELSE '//' END)"
    )
    return (f"SELECT doc_id, {sql_canon_url(messy)} AS canon_url "
            "FROM documents")


QUERIES["url_canon"] = q_url_canon
ORACLES["url_canon"] = _sql_url_canon()


def q_dup_words(sf_dir: str):
    """Gopher-style within-document repetition signal (Rae et al. 2021
    §A1.1 use duplicated-line/ngram fractions as quality filters): per doc,
    total ASCII-ws tokens, distinct tokens, and dup_word_ratio = 1 −
    distinct/total (0 for empty docs) — the fraction of token occurrences
    that repeat an earlier token. Tokenization contract matches `quality`
    (trim + RE2 \\s+ split, SQL_QUALITY above); ratio rounded by the shared
    half-up rule. The split is vectorized Arrow; the per-doc distinct count
    is a C-level pandas groupby-nunique over the flattened (doc, token)
    pairs — exact, no hashing."""
    import pandas as pd

    def fn(t: pa.Table) -> pa.Table:
        texts = pc.fill_null(t["text"], "")
        trimmed = pc.utf8_trim(texts, " ")
        empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        n_tokens = np.where(empty, 0, n)
        idx = np.repeat(np.arange(len(t), dtype=np.int64), n)
        words = toks.flatten().to_pandas()
        distinct = pd.Series(words.values).groupby(idx).nunique()
        n_distinct = np.zeros(len(t), dtype=np.int64)
        n_distinct[distinct.index.to_numpy()] = distinct.to_numpy()
        n_distinct = np.where(empty, 0, n_distinct)
        safe = np.maximum(n_tokens, 1).astype(np.float64)
        ratio = np.where(n_tokens == 0, 0.0, 1.0 - n_distinct / safe)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_distinct": pa.array(n_distinct, pa.int64()),
            "dup_word_ratio": pa.array(_round6_half_up(ratio), pa.float64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


SQL_DUP_WORDS = """
WITH t AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
           FROM documents WHERE trim(text) <> ''),
a AS (SELECT doc_id, count(*) AS n_tok, count(DISTINCT w) AS n_dis
      FROM t GROUP BY doc_id)
SELECT d.doc_id,
  coalesce(a.n_tok, 0) AS n_tokens,
  coalesce(a.n_dis, 0) AS n_distinct,
  CASE WHEN a.n_tok IS NULL THEN 0.0
       ELSE floor((1.0 - a.n_dis * 1.0 / greatest(a.n_tok, 1))
                  * 1000000 + 0.5) / 1000000 END AS dup_word_ratio
FROM documents d LEFT JOIN a ON d.doc_id = a.doc_id
"""

QUERIES["dup_words"] = q_dup_words
ORACLES["dup_words"] = SQL_DUP_WORDS


def q_boilerplate(sf_dir: str, n: int = 5, min_df: int = 2):
    """Cross-document boilerplate n-gram detection (CCNet/RefinedWeb-style
    duplicated-span removal, the line-dedup analogue for unstructured
    text): per doc, total word-5-gram occurrences, occurrences of "hot"
    grams (grams appearing in ≥ min_df distinct docs), and their ratio.

    Scale shape: pass 1 emits per-doc DISTINCT (doc, gram-hash) pairs —
    exact in-batch because each doc's grams are generated inside its own
    batch — then ONE groupby shuffle of 16 B rows yields document
    frequencies; the hot set (df ≥ min_df) is the boilerplate vocabulary,
    inherently low-cardinality, broadcast via ray.put (the same bounded-
    stop-set assumption as the containment tier's stop-fingerprints).
    Pass 2 recomputes grams per batch (cheaper than materializing the
    corpus-sized gram table; at 100 TB checkpoint the pair table instead
    if recompute grows dearer) and counts hot occurrences by
    np.searchsorted — no joins, no per-doc groupby. Gram identity is the
    64-bit chain hash (`functions/shingles.py:word_ngram_hashes`); the
    DuckDB oracle uses gram STRINGS, so agreement also certifies
    collision-freedom at test scale."""
    import ray
    from ray.data.aggregate import Count

    from ..functions.shingles import word_ngram_hashes

    def distinct_pairs(t: pa.Table) -> pa.Table:
        idx, g = word_ngram_hashes(t["text"], n, seed=_QCFG.seed)
        order = np.lexsort((g, idx))
        idx, g = idx[order], g[order]
        keep = np.ones(len(g), dtype=bool)
        keep[1:] = (idx[1:] != idx[:-1]) | (g[1:] != g[:-1])
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": pa.array(ids[idx[keep]], pa.int64()),
                         "gram": pa.array(g[keep].view(np.int64), pa.int64())})

    docs = _docs(sf_dir, ["doc_id", "text"])
    df = docs.map_batches(distinct_pairs, batch_format="pyarrow") \
        .groupby("gram").aggregate(Count(alias_name="gdf"))

    def only_hot(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        return t.filter(pc2.greater_equal(t["gdf"], min_df)).select(["gram"])

    hot_rows = df.map_batches(only_hot, batch_format="pyarrow").take_all()
    hot = np.sort(np.array([r["gram"] for r in hot_rows], np.int64))
    hot_ref = ray.put(hot)

    def per_doc(t: pa.Table) -> pa.Table:
        hot_sorted = ray.get(hot_ref)
        idx, g = word_ngram_hashes(t["text"], n, seed=_QCFG.seed)
        n_rows = len(t)
        n_grams = np.bincount(idx, minlength=n_rows).astype(np.int64)
        gi = g.view(np.int64)
        if len(hot_sorted):
            pos = np.searchsorted(hot_sorted, gi)
            pos = np.minimum(pos, len(hot_sorted) - 1)
            is_hot = hot_sorted[pos] == gi
        else:
            is_hot = np.zeros(len(gi), dtype=bool)
        n_boiler = np.bincount(idx[is_hot], minlength=n_rows).astype(np.int64)
        safe = np.maximum(n_grams, 1).astype(np.float64)
        ratio = np.where(n_grams == 0, 0.0, n_boiler / safe)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_grams": pa.array(n_grams, pa.int64()),
            "n_boiler": pa.array(n_boiler, pa.int64()),
            "boiler_ratio": pa.array(_round6_half_up(ratio), pa.float64()),
        })

    return docs.map_batches(per_doc, batch_format="pyarrow")


SQL_BOILERPLATE = """
WITH ws AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
            FROM documents WHERE trim(text) <> ''),
g AS (SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(w) - 3, 1)),
                                   i -> array_to_string(w[i:i+4], ' '))) AS gram
      FROM ws),
df AS (SELECT gram, count(DISTINCT doc_id) AS gdf FROM g GROUP BY gram),
per AS (SELECT g.doc_id, count(*) AS n_grams,
               count(*) FILTER (WHERE df.gdf >= 2) AS n_boiler
        FROM g JOIN df USING (gram) GROUP BY g.doc_id)
SELECT d.doc_id,
  coalesce(per.n_grams, 0) AS n_grams,
  coalesce(per.n_boiler, 0) AS n_boiler,
  CASE WHEN per.n_grams IS NULL THEN 0.0
       ELSE floor(per.n_boiler * 1.0 / greatest(per.n_grams, 1)
                  * 1000000 + 0.5) / 1000000 END AS boiler_ratio
FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
"""

QUERIES["boilerplate"] = q_boilerplate
ORACLES["boilerplate"] = SQL_BOILERPLATE


def q_length_quantiles(sf_dir: str, ps: tuple[float, ...] = (0.5, 0.9, 0.99)):
    """EXACT distributed quantiles of an integer column (doc length) via
    value histogram — the scale pattern for percentiles over 10^12 rows
    when the value domain is bounded (lengths, scores, counts): per-batch
    bincount partials, ONE groupby-sum shuffle over (value, count) rows
    (cardinality = distinct values, NOT corpus size), then nearest-rank
    selection over the collected histogram (driver state = the histogram,
    O(distinct values)). No sort of the corpus, no sampling error — unlike
    t-digest/GK sketches this is exact, because integer domains make the
    histogram small. Quantile definition (shared with the SQL oracle):
    lower nearest-rank, q(p) = smallest v with running_count(v) ≥
    ceil(p·n)."""
    import math

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        v = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        vals, cnts = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(vals, pa.int64()),
                         "cnt": pa.array(cnts, pa.int64())})

    hist_ds = _docs(sf_dir, ["n_chars"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("v").aggregate(Sum("cnt", alias_name="cnt"))
    rows = hist_ds.take_all()  # bounded: one row per distinct length
    vals = np.array([r["v"] for r in rows], np.int64)
    cnts = np.array([r["cnt"] for r in rows], np.int64)
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    run = np.cumsum(cnts)
    n = int(run[-1]) if len(run) else 0
    out_p, out_v = [], []
    for p in ps:
        rank = max(1, math.ceil(p * n))
        out_p.append(p)
        out_v.append(int(vals[np.searchsorted(run, rank)]))
    return pa.table({"p": pa.array(out_p, pa.float64()),
                     "q": pa.array(out_v, pa.int64())})


SQL_LENGTH_QUANTILES = """
WITH c AS (SELECT n_chars AS v, count(*) AS cnt FROM documents GROUP BY v),
r AS (SELECT v, sum(cnt) OVER (ORDER BY v) AS run,
             (SELECT count(*) FROM documents) AS n
      FROM c)
SELECT q.p, min(r.v) AS q
FROM r, (VALUES (0.5), (0.9), (0.99)) AS q(p)
WHERE r.run >= ceil(q.p * r.n)
GROUP BY q.p
"""

QUERIES["length_quantiles"] = q_length_quantiles
ORACLES["length_quantiles"] = SQL_LENGTH_QUANTILES


def q_quantiles_by_lang(sf_dir: str,
                        ps: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9)):
    """Per-GROUP exact quantiles (doc-length quartiles per language) — the
    grouped variant of `q_length_quantiles`: per-batch (lang, value)
    partials, ONE groupby-sum over (lang, value) rows (cardinality =
    langs × distinct lengths, corpus-independent), nearest-rank selection
    vectorized over the collected histogram. Same lower-nearest-rank
    definition as the global query, applied per partition key."""
    import math

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.select(["lang", "n_chars"]).to_pandas()
        g = df.groupby(["lang", "n_chars"], as_index=False).size()
        return pa.table({"lang": pa.array(g["lang"], pa.string()),
                         "v": pa.array(g["n_chars"].astype("int64")),
                         "cnt": pa.array(g["size"].astype("int64"))})

    hist = _docs(sf_dir, ["lang", "n_chars"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["lang", "v"]).aggregate(Sum("cnt", alias_name="cnt")) \
        .to_pandas()  # bounded: langs × distinct lengths
    hist = hist.sort_values(["lang", "v"])
    out_lang, out_p, out_q = [], [], []
    for lang, g in hist.groupby("lang", sort=True):
        vals = g["v"].to_numpy()
        run = g["cnt"].to_numpy().cumsum()
        n = int(run[-1])
        for p in ps:
            rank = max(1, math.ceil(p * n))
            out_lang.append(lang)
            out_p.append(p)
            out_q.append(int(vals[np.searchsorted(run, rank)]))
    return pa.table({"lang": pa.array(out_lang, pa.string()),
                     "p": pa.array(out_p, pa.float64()),
                     "q": pa.array(out_q, pa.int64())})


SQL_QUANTILES_BY_LANG = """
WITH c AS (SELECT lang, n_chars AS v, count(*) AS cnt
           FROM documents GROUP BY lang, v),
t AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
r AS (SELECT c.lang, c.v,
             sum(c.cnt) OVER (PARTITION BY c.lang ORDER BY c.v) AS run,
             t.n
      FROM c JOIN t USING (lang))
SELECT r.lang, q.p, min(r.v) AS q
FROM r, (VALUES (0.25), (0.5), (0.75), (0.9)) AS q(p)
WHERE r.run >= ceil(q.p * r.n)
GROUP BY r.lang, q.p
"""

QUERIES["quantiles_by_lang"] = q_quantiles_by_lang
ORACLES["quantiles_by_lang"] = SQL_QUANTILES_BY_LANG


def q_stratified_sample(sf_dir: str):
    """Stratified deterministic sampling: per-language fractions (en 10%,
    de 50%, fr 100%, others 0) with the same fmix32 hash gate as
    `sample_fraction` — membership depends only on (doc_id, seed, stratum
    fraction), so the sample is retry/repartition/resume-stable per
    stratum and exactly reproducible in SQL. The scale pattern for
    quota-balanced training mixes (upsample rare languages, downsample
    dominant ones) without a shuffle: one stateless map."""
    from ..functions.hashing import fmix32

    fracs = {"en": 0.10, "de": 0.50, "fr": 1.00}

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        thr = np.array([int(fracs.get(l, 0.0) * 2**32)
                        for l in t["lang"].to_pylist()], np.uint64)
        keep = fmix32(ids, seed=42) < thr
        return t.filter(pa.array(keep)).select(["doc_id", "lang"])

    return _docs(sf_dir, ["doc_id", "lang"]).map_batches(
        fn, batch_format="pyarrow")


def _sql_stratified_sample() -> str:
    from ..functions.hashing import sql_hash_sample

    # same fmix32 pipeline, threshold switched per stratum
    inner = sql_hash_sample("documents", "doc_id", 1.0, seed=42,
                            select="doc_id, lang")
    # sql_hash_sample filters at threshold 2^32 (keep-all); re-filter by
    # the per-lang threshold using the exposed _h5 hash? _h5 is not in the
    # select — inline the CASE threshold instead:
    return inner.replace(
        "WHERE _h5 < 4294967296",
        "WHERE _h5 < (CASE lang WHEN 'en' THEN 429496729 "
        "WHEN 'de' THEN 2147483648 WHEN 'fr' THEN 4294967296 "
        "ELSE 0 END)")


QUERIES["stratified_sample"] = q_stratified_sample
ORACLES["stratified_sample"] = _sql_stratified_sample()


def q_top_words_per_lang(sf_dir: str, k: int = 5):
    """Per-group heavy hitters: top-k most frequent words per language
    (vocabulary building / corpus profiling). Partial word counts combine
    inside each batch (C-level pandas groupby over (lang, word)), ONE
    groupby-sum shuffle over (lang, word, cnt) rows, then a bounded-
    cardinality per-lang top-k (languages are an enum — the same
    bounded-key argument as `event_type_counts`). Deterministic
    tie-break: (count DESC, word ASC), replicated in the SQL window."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        texts = pc.fill_null(t["text"], "")
        trimmed = pc.utf8_trim(texts, " ")
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        langs = np.repeat(np.asarray(t["lang"].to_pylist(), dtype=object), n)
        words = np.asarray(toks.flatten().to_pylist(), dtype=object)
        empty_doc = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
        keep = ~np.repeat(empty_doc, n)
        df = pd.DataFrame({"lang": langs[keep], "word": words[keep]})
        agg = df.groupby(["lang", "word"], sort=False).size() \
            .reset_index(name="cnt")
        return pa.Table.from_pandas(agg, preserve_index=False)

    counts = _docs(sf_dir, ["text", "lang"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["lang", "word"]).aggregate(Sum("cnt", alias_name="cnt"))

    def topk(g):
        return g.sort_values(["cnt", "word"],
                             ascending=[False, True]).head(k)

    return counts.groupby("lang").map_groups(topk, batch_format="pandas")


SQL_TOP_WORDS_PER_LANG = """
WITH w AS (SELECT lang, unnest(string_split_regex(trim(text), '\\s+')) AS word
           FROM documents WHERE trim(text) <> ''),
c AS (SELECT lang, word, count(*) AS cnt FROM w GROUP BY lang, word),
r AS (SELECT lang, word, cnt,
             row_number() OVER (PARTITION BY lang
                                ORDER BY cnt DESC, word ASC) AS rn
      FROM c)
SELECT lang, word, cnt FROM r WHERE rn <= 5
"""

QUERIES["top_words_per_lang"] = q_top_words_per_lang
ORACLES["top_words_per_lang"] = SQL_TOP_WORDS_PER_LANG


def q_weighted_sample(sf_dir: str, k: int = 100, seed: int = 7):
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    Spirakis A-Res): key = ln(u)/w with u the fmix32-derived uniform in
    (0,1) and w = n_chars; the k largest keys are a weight-proportional
    sample. Same determinism contract as `sample_fraction`: membership
    depends only on (doc_id, seed, weight) — retry/repartition/resume-
    stable, and the key formula replays exactly in SQL.

    Scale shape: each batch prunes locally to its top-k (argpartition), so
    the global sort sees ≤ k·n_batches rows, never the corpus; the corpus
    itself streams through one stateless map."""
    from ..functions.hashing import fmix32

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        w = np.maximum(
            t["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64), 1.0)
        u = (fmix32(ids, seed=seed).astype(np.float64) + 0.5) / 2**32
        key = np.log(u) / w
        idx = (np.argpartition(key, -k)[-k:] if len(key) > k
               else np.arange(len(key)))
        sel = pa.array(idx, pa.int64())
        return pa.table({"doc_id": t["doc_id"].take(sel),
                         "n_chars": t["n_chars"].take(sel),
                         "es_key": pa.array(key[idx], pa.float64())})

    top = _docs(sf_dir, ["doc_id", "n_chars"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .sort("es_key", descending=True).limit(k)
    return top.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"], "n_chars": t["n_chars"],
            "es_key": pa.array(
                _round6_half_up(t["es_key"].to_numpy(zero_copy_only=False)),
                pa.float64()),
        }), batch_format="pyarrow")


def _sql_weighted_sample(k: int = 100, seed: int = 7) -> str:
    from ..functions.hashing import sql_hash_sample

    inner = sql_hash_sample("documents", "doc_id", 1.0, seed=seed,
                            select="doc_id, n_chars, _h5")
    key = "ln((_h5 + 0.5) / 4294967296) / greatest(n_chars, 1)"
    return f"""
SELECT doc_id, n_chars,
       floor({key} * 1000000 + 0.5) / 1000000 AS es_key
FROM ({inner})
ORDER BY {key} DESC LIMIT {k}
"""


QUERIES["weighted_sample"] = q_weighted_sample
ORACLES["weighted_sample"] = _sql_weighted_sample()


def q_rollup_qty(sf_dir: str):
    """Multi-granularity aggregate (rollup (returnflag, linestatus) →
    (returnflag) → grand total) in ONE shuffle: each batch pre-aggregates
    ALL THREE levels locally (the coarser partials derive from the finest
    inside the batch), tagging rows with lvl + 'ALL' sentinels, so a
    single composite-key groupby finishes every level — vs the naive
    three-scan / three-shuffle GROUPING SETS plan. l_quantity is integral
    in double, so the sums are exact in both engines (no rounding rule
    needed)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.select(["l_returnflag", "l_linestatus", "l_quantity"]).to_pandas()
        g2 = df.groupby(["l_returnflag", "l_linestatus"], as_index=False) \
               .agg(qty_part=("l_quantity", "sum"))
        g2["lvl"] = 2
        g1 = g2.groupby("l_returnflag", as_index=False)["qty_part"].sum()
        g1["l_linestatus"] = "ALL"
        g1["lvl"] = 1
        g0 = pd.DataFrame({"l_returnflag": ["ALL"], "l_linestatus": ["ALL"],
                           "qty_part": [g2["qty_part"].sum()], "lvl": [0]})
        out = pd.concat([g2, g1, g0], ignore_index=True)
        return pa.Table.from_pandas(
            out[["lvl", "l_returnflag", "l_linestatus", "qty_part"]],
            preserve_index=False)

    agg = _read(sf_dir, "lineitem",
                ["l_returnflag", "l_linestatus", "l_quantity"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["lvl", "l_returnflag", "l_linestatus"]) \
        .aggregate(Sum("qty_part", alias_name="sum_qty"))
    return agg.map_batches(
        lambda t: pa.table({
            "lvl": pc.cast(t["lvl"], pa.int64()),
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "sum_qty": pc.cast(t["sum_qty"], pa.float64()),
        }), batch_format="pyarrow")


SQL_ROLLUP_QTY = """
SELECT CAST(2 AS BIGINT) AS lvl, l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty
FROM lineitem GROUP BY l_returnflag, l_linestatus
UNION ALL
SELECT CAST(1 AS BIGINT), l_returnflag, 'ALL', sum(l_quantity)
FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT CAST(0 AS BIGINT), 'ALL', 'ALL', sum(l_quantity) FROM lineitem
"""

QUERIES["rollup_qty"] = q_rollup_qty
ORACLES["rollup_qty"] = SQL_ROLLUP_QTY


# ---------------------------------------------------------------------------
# LLM-corpus tier (PII scrub / decontamination / line dedup / packing /
# domain stats / delta anti-join) — see pipelines/queries_corpus.py.
# Imported last: queries_corpus imports helpers from this module.
# ---------------------------------------------------------------------------

try:
    from .queries_corpus import CORPUS_ORACLES, CORPUS_QUERIES  # noqa: E402

    QUERIES.update(CORPUS_QUERIES)
    ORACLES.update(CORPUS_ORACLES)
except ImportError:
    # queries_corpus was imported first and is mid-initialization (it
    # imports helpers from this module); its own tail merges into the
    # QUERIES/ORACLES dicts instead.
    pass

try:
    from .queries_web import WEB_ORACLES, WEB_QUERIES  # noqa: E402

    QUERIES.update(WEB_QUERIES)
    ORACLES.update(WEB_ORACLES)
except ImportError:
    pass  # same mid-initialization convention as queries_corpus above

try:
    from .queries_quality import QUALITY_ORACLES, QUALITY_QUERIES  # noqa: E402

    QUERIES.update(QUALITY_QUERIES)
    ORACLES.update(QUALITY_ORACLES)
except ImportError:
    pass  # same mid-initialization convention as queries_corpus above

try:
    from .queries_sketches import SKETCH_ORACLES, SKETCH_QUERIES  # noqa: E402

    QUERIES.update(SKETCH_QUERIES)
    ORACLES.update(SKETCH_ORACLES)
except ImportError:
    pass  # same mid-initialization convention as queries_corpus above

try:
    from .queries_joins import JOIN_ORACLES, JOIN_QUERIES  # noqa: E402

    QUERIES.update(JOIN_QUERIES)
    ORACLES.update(JOIN_ORACLES)
except ImportError:
    pass  # same mid-initialization convention as queries_corpus above

try:
    from .queries_window import WINDOW_ORACLES, WINDOW_QUERIES  # noqa: E402

    QUERIES.update(WINDOW_QUERIES)
    ORACLES.update(WINDOW_ORACLES)
except ImportError:
    pass  # same mid-initialization convention as queries_corpus above

try:
    from .queries_semistruct import (  # noqa: E402
        SEMISTRUCT_ORACLES,
        SEMISTRUCT_QUERIES,
    )

    QUERIES.update(SEMISTRUCT_QUERIES)
    ORACLES.update(SEMISTRUCT_ORACLES)
except ImportError:
    pass  # same mid-initialization convention as queries_corpus above

try:
    from .queries_profile import PROFILE_ORACLES, PROFILE_QUERIES  # noqa: E402

    QUERIES.update(PROFILE_QUERIES)
    ORACLES.update(PROFILE_ORACLES)
except ImportError:
    pass  # same mid-initialization convention as queries_corpus above

try:
    from .queries_tokenizer import (  # noqa: E402
        TOKENIZER_ORACLES,
        TOKENIZER_QUERIES,
    )

    QUERIES.update(TOKENIZER_QUERIES)
    ORACLES.update(TOKENIZER_ORACLES)
except ImportError:
    pass  # same mid-initialization convention as queries_corpus above

try:
    from .queries_classifier import (  # noqa: E402
        CLASSIFIER_ORACLES,
        CLASSIFIER_QUERIES,
    )

    QUERIES.update(CLASSIFIER_QUERIES)
    ORACLES.update(CLASSIFIER_ORACLES)
except ImportError:
    pass  # same mid-initialization convention as queries_corpus above

try:
    from .queries_features import FEATURE_ORACLES, FEATURE_QUERIES  # noqa: E402

    QUERIES.update(FEATURE_QUERIES)
    ORACLES.update(FEATURE_ORACLES)
except ImportError:
    pass  # same mid-initialization convention as queries_corpus above


# ---------------------------------------------------------------------------
# Multimodal decode under the driver gate: synthesized two-stripe BMPs run
# through the REAL actor-pool decode (+ nearest resize), and the stripe
# construction makes the decoded per-channel means closed-form SQL — the
# binary-column plumbing (payload synthesis → ImageDecodeStage actor pool →
# fixed_size_list pixels → vectorized stats) is certified end-to-end, not
# just unit-tested.
# ---------------------------------------------------------------------------

def q_multimodal_image_stats(sf_dir: str):
    """Per doc: encode a 16×16 BMP with top-half color A(doc_id) =
    (id, 2id, 3id) mod 256 and bottom-half B(doc_id) = (5id, 7id, 11id)
    mod 256 (per-row Python is the synthesis HARNESS, the `_messy_url`
    convention — the operator under test is the decode stage). Decode with
    `stages/multimodal.py:ImageDecodeStage` (strict — a stub fallback
    would fail the oracle), resize 8×8 pixel-centre → exactly 32 A + 32 B
    pixels, so mean_c = (A_c + B_c)/2 exactly (integer halves are exact
    float64)."""
    from ..functions import codecs
    from ..stages.multimodal import decode_images

    def synth(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        payloads = []
        for i in ids:
            img = np.empty((16, 16, 3), np.uint8)
            img[:8] = np.array([i % 256, (2 * i) % 256, (3 * i) % 256],
                               np.uint8)
            img[8:] = np.array([(5 * i) % 256, (7 * i) % 256,
                                (11 * i) % 256], np.uint8)
            payloads.append(codecs.encode_bmp(img))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "payload": pa.array(payloads, pa.binary())})

    media = _docs(sf_dir, ["doc_id"]).map_batches(synth, batch_format="pyarrow")
    decoded = decode_images(media, target=(8, 8), channels=3,
                            batch_size=64, concurrency=2, strict=True)

    def stats(t: pa.Table) -> pa.Table:
        col = t["pixels"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mat = np.asarray(col.values, dtype=np.uint8) \
            .reshape(len(t), 8, 8, 3).astype(np.float64)
        means = mat.mean(axis=(1, 2))
        return pa.table({
            "doc_id": t["doc_id"],
            "mean_r": pa.array(_round6_half_up(means[:, 0]), pa.float64()),
            "mean_g": pa.array(_round6_half_up(means[:, 1]), pa.float64()),
            "mean_b": pa.array(_round6_half_up(means[:, 2]), pa.float64()),
        })

    return decoded.map_batches(stats, batch_format="pyarrow")


SQL_MULTIMODAL_IMAGE_STATS = """
SELECT doc_id,
       ((doc_id % 256) + ((5 * doc_id) % 256)) / 2.0 AS mean_r,
       (((2 * doc_id) % 256) + ((7 * doc_id) % 256)) / 2.0 AS mean_g,
       (((3 * doc_id) % 256) + ((11 * doc_id) % 256)) / 2.0 AS mean_b
FROM documents
"""

QUERIES["multimodal_image_stats"] = q_multimodal_image_stats
ORACLES["multimodal_image_stats"] = SQL_MULTIMODAL_IMAGE_STATS


def q_multimodal_audio_stats(sf_dir: str):
    """Audio twin of q_multimodal_image_stats: per doc a 512-sample
    constant-amplitude PCM-16 WAV with c(doc_id) = (doc_id % 1024) − 512.
    The REAL strict AudioFrameSampleStage decodes (stdlib RIFF parse),
    mono-mixes, splits into 8 equal 64-sample frames — a constant frame's
    float32 mean is EXACTLY c/32768 (c·2⁻¹⁵ is float32-exact; summing 64
    identical values scales by a power of two) and its std is exactly 0,
    so the decoded output is closed-form SQL with no rounding rule."""
    from ..functions import codecs
    from ..stages.multimodal import AudioFrameSampleStage

    def synth(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        payloads = []
        for i in ids:
            c = int(i % 1024) - 512
            payloads.append(codecs.encode_wav_pcm16(
                np.full(512, c, dtype=np.int16), sample_rate=16000))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "payload": pa.array(payloads, pa.binary())})

    media = _docs(sf_dir, ["doc_id"]).map_batches(synth, batch_format="pyarrow")
    sampled = media.map_batches(
        AudioFrameSampleStage, batch_format="pyarrow", batch_size=64,
        concurrency=2, num_cpus=1,
        fn_constructor_kwargs={"n_frames": 8, "strict": True})

    def stats(t: pa.Table) -> pa.Table:
        col = t["frames"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mat = np.asarray(col.values, dtype=np.float32).reshape(len(t), 16)
        return pa.table({
            "doc_id": t["doc_id"],
            "frame_mean": pa.array(mat[:, 0].astype(np.float64), pa.float64()),
            "frame_std": pa.array(mat[:, 1].astype(np.float64), pa.float64()),
            "sample_rate": pc.cast(t["sample_rate"], pa.int64()),
        })

    return sampled.map_batches(stats, batch_format="pyarrow")


SQL_MULTIMODAL_AUDIO_STATS = """
SELECT doc_id,
       ((doc_id % 1024) - 512) / 32768.0 AS frame_mean,
       0.0 AS frame_std,
       CAST(16000 AS BIGINT) AS sample_rate
FROM documents
"""

QUERIES["multimodal_audio_stats"] = q_multimodal_audio_stats
ORACLES["multimodal_audio_stats"] = SQL_MULTIMODAL_AUDIO_STATS
