"""LLM-corpus operators beyond the reference: PII redaction, benchmark
decontamination, line-level dedup (CCNet-style), sequence packing by
distributed prefix-sum, per-domain stats, and bloom-prefiltered delta
anti-join. Each entry follows the house contract of `queries.py`: one Ray
Data pipeline + one DuckDB oracle over the same parquet tables, column
names identical on both sides, floats rounded by the shared half-up rule.

The reference (`/root/reference/`) has no analogue for any of these — they
are the training-data-pipeline operators the 100 TB deployment needs
(dedup/quality tiers exist in `queries.py`; this module adds the scrub /
contamination / packing / ingest-delta tiers).

Where the shared testdata lacks the needed structure (no PII, no
benchmark split, no line breaks, no ingest deltas), the structure is
synthesized DETERMINISTICALLY from doc_id inside BOTH engines — the same
convention as `q_url_canon` / `q_extract_text`: the construction is the
test harness, the vectorized kernel under it is the operator.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .queries import _SQL_NORM, _docs

# Pipeline/oracle shared parameters: the SQL oracle strings below are built
# from THESE constants (f-strings), so changing a default cannot silently
# diverge a paired oracle (ADVICE r3). Callers passing non-default kwargs to
# the q_* functions must supply a matching oracle themselves.
DECONTAMINATE_NGRAM = 5
LINE_DEDUP_MIN_DF = 2
PACK_BUDGET = 512
SLIDING_WINDOW_HOURS = 3


def _mod_filter(ds, mod: int, residues: tuple[int, ...], negate: bool = False):
    """Keep rows with doc_id % mod in residues (or not, when negate) —
    vectorized batch mask (Ray's filter-expr parser lacks modulo)."""
    res = tuple(residues)

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keep = np.isin(ids % mod, res)
        if negate:
            keep = ~keep
        return t.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")

# ---------------------------------------------------------------------------
# PII redaction — vectorized RE2 scrub (emails / IPv4 / phone) + match counts
# ---------------------------------------------------------------------------

# One pattern per PII class, RE2-compatible so the SAME string drives
# Arrow's replace_substring_regex and DuckDB's regexp_replace.
_PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b555-\d{4}\b", "<PHONE>"),
)


def _pii_fragments(ids: np.ndarray) -> list[str]:
    """Deterministic PII injection per doc_id % 4 (0 email, 1 ip, 2 phone,
    3 all three) — the synthesized input construction, mirrored in SQL."""
    out = []
    for i in ids:
        i = int(i)
        email = f" reach user{i}@mail{i % 7}.example.com now"
        ip = f" node at 10.{i % 200}.{(i * 7) % 250}.{i % 250} up"
        phone = f" call 555-{1000 + i % 9000} today"
        k = i % 4
        if k == 0:
            out.append(email)
        elif k == 1:
            out.append(ip)
        elif k == 2:
            out.append(phone)
        else:
            out.append(email + ip + phone)
    return out


_SQL_PII_TEXT = (
    "(text || CASE doc_id % 4 "
    "WHEN 0 THEN ' reach user' || doc_id::VARCHAR || '@mail' || (doc_id % 7)::VARCHAR || '.example.com now' "
    "WHEN 1 THEN ' node at 10.' || (doc_id % 200)::VARCHAR || '.' || ((doc_id * 7) % 250)::VARCHAR || '.' || (doc_id % 250)::VARCHAR || ' up' "
    "WHEN 2 THEN ' call 555-' || (1000 + doc_id % 9000)::VARCHAR || ' today' "
    "ELSE ' reach user' || doc_id::VARCHAR || '@mail' || (doc_id % 7)::VARCHAR || '.example.com now'"
    " || ' node at 10.' || (doc_id % 200)::VARCHAR || '.' || ((doc_id * 7) % 250)::VARCHAR || '.' || (doc_id % 250)::VARCHAR || ' up'"
    " || ' call 555-' || (1000 + doc_id % 9000)::VARCHAR || ' today' "
    "END)"
)


def q_pii_redact(sf_dir: str):
    """PII scrub stage (the pre-training privacy pass every web-corpus
    pipeline runs before tokenization): replace emails / IPv4 / phone
    patterns with typed placeholders and count matches per class. Fully
    vectorized — one RE2 `replace_substring_regex` + one
    `count_substring_regex` per class over the whole Arrow batch, zero
    Python in the hot path; stateless map, no shuffle, so it streams at
    read bandwidth at any scale. PII is injected deterministically from
    doc_id (the corpus has none); the DuckDB oracle re-injects AND
    re-redacts with its own RE2 — a full cross-engine check of both the
    construction and the three patterns."""
    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        txt = pa.array(
            [a + b for a, b in zip(pc.fill_null(t["text"], "").to_pylist(),
                                   _pii_fragments(ids))],
            pa.string())
        n_pii = np.zeros(len(t), dtype=np.int64)
        red = txt
        for pat, repl in _PII_PATTERNS:
            n_pii += pc.count_substring_regex(red, pattern=pat) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            red = pc.replace_substring_regex(red, pattern=pat,
                                             replacement=repl)
        return pa.table({
            "doc_id": t["doc_id"],
            "redacted": red,
            "n_pii": pa.array(n_pii, pa.int64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow")


def _sql_pii_redact() -> str:
    red = _SQL_PII_TEXT
    counts = []
    for pat, repl in _PII_PATTERNS:
        counts.append(f"len(regexp_extract_all({red}, '{pat}'))")
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    n = " + ".join(counts)
    return (f"SELECT doc_id, {red} AS redacted, "
            f"CAST({n} AS BIGINT) AS n_pii FROM documents")


# ---------------------------------------------------------------------------
# Benchmark decontamination — word-n-gram overlap against a broadcast set
# ---------------------------------------------------------------------------

def q_decontaminate(sf_dir: str, n: int = DECONTAMINATE_NGRAM):
    """Benchmark decontamination (GPT-3 §C / PaLM-style n-gram filtering):
    flag corpus docs sharing any word-5-gram with a held-out benchmark
    set. The benchmark is SMALL by definition — its distinct gram hashes
    are collected once and broadcast (ray.put), then one stateless
    map_batches flags the corpus by np.searchsorted: no join, no shuffle
    over the corpus, the exact shape this runs at 100 TB (benchmark grams
    ~10^6, corpus 10^12 rows stream through).

    Benchmark split = doc_id % 20 == 0; contamination is planted
    deterministically (docs with doc_id % 10 == 3 append the first-5-word
    snippet of benchmark doc `doc_id - doc_id % 20`), identically in the
    SQL oracle, which re-derives everything from gram STRINGS — agreement
    also certifies the 64-bit gram-hash chain collision-free at test
    scale (same convention as `q_boilerplate`)."""
    import ray

    from ..functions.shingles import word_ngram_hashes

    docs = _docs(sf_dir, ["doc_id", "text"])
    bench = _mod_filter(docs, 20, (0,))

    def bench_grams(t: pa.Table) -> pa.Table:
        _, g = word_ngram_hashes(t["text"], n, seed=0)
        return pa.table({"gram": pa.array(np.unique(g).view(np.int64),
                                          pa.int64())})

    gram_rows = bench.map_batches(bench_grams, batch_format="pyarrow") \
        .take_all()  # bounded: benchmark-sized, not corpus-sized
    bench_set = np.unique(np.array([r["gram"] for r in gram_rows], np.int64))

    snip_rows = bench.take_all()  # benchmark-sized
    snippets = {int(r["doc_id"]): " ".join(str(r["text"] or "").split()[:5])
                for r in snip_rows}
    set_ref = ray.put(bench_set)
    snip_ref = ray.put(snippets)

    def flag(t: pa.Table) -> pa.Table:
        bset = ray.get(set_ref)
        snips = ray.get(snip_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = pc.fill_null(t["text"], "").to_pylist()
        # missing benchmark doc (non-contiguous ids) → text unmodified,
        # matching the oracle's `b.text IS NOT NULL` guard
        aug = [txt + " " + snips[k]
               if i % 10 == 3 and (k := int(i) - int(i) % 20) in snips
               else txt
               for i, txt in zip(ids, texts)]
        idx, g = word_ngram_hashes(pa.array(aug, pa.string()), n, seed=0)
        gi = g.view(np.int64)
        if len(bset):
            pos = np.minimum(np.searchsorted(bset, gi), len(bset) - 1)
            hit = bset[pos] == gi
        else:
            hit = np.zeros(len(gi), dtype=bool)
        contaminated = np.zeros(len(t), dtype=bool)
        contaminated[np.unique(idx[hit])] = True
        return pa.table({
            "doc_id": t["doc_id"],
            "contaminated": pa.array(contaminated, pa.bool_()),
        })

    return _mod_filter(docs, 20, (0,), negate=True).map_batches(
        flag, batch_format="pyarrow")


SQL_DECONTAMINATE = f"""
WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0),
aug AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % 10 = 3 AND b.text IS NOT NULL THEN coalesce(d.text, '') || ' ' ||
              array_to_string(string_split_regex(trim(b.text), '\\s+')[1:5], ' ')
              ELSE d.text END AS text
  FROM documents d
  LEFT JOIN bench b ON b.doc_id = d.doc_id - (d.doc_id % 20)
  WHERE d.doc_id % 20 <> 0),
bw AS (SELECT string_split_regex(trim(text), '\\s+') AS w
       FROM bench WHERE trim(text) <> ''),
bg AS (SELECT DISTINCT
         unnest(list_transform(range(1, greatest(len(w) - {DECONTAMINATE_NGRAM - 2}, 1)),
                               i -> array_to_string(w[i:i+{DECONTAMINATE_NGRAM - 1}], ' '))) AS gram
       FROM bw),
aw AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
       FROM aug WHERE trim(text) <> ''),
ag AS (SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(w) - {DECONTAMINATE_NGRAM - 2}, 1)),
                               i -> array_to_string(w[i:i+{DECONTAMINATE_NGRAM - 1}], ' '))) AS gram
       FROM aw),
hit AS (SELECT DISTINCT ag.doc_id FROM ag JOIN bg USING (gram))
SELECT a.doc_id, (hit.doc_id IS NOT NULL) AS contaminated
FROM aug a LEFT JOIN hit ON a.doc_id = hit.doc_id
"""


def q_contam_spans(sf_dir: str, n: int = DECONTAMINATE_NGRAM):
    """Span-level decontamination: the WORD-POSITION islands of benchmark
    n-gram hits inside each corpus doc — the masking complement of
    :func:`q_decontaminate` (drop the span, keep the doc; the doc-level
    flag wastes a whole document over one leaked sentence). Same
    benchmark split / planting / gram-hash chain as q_decontaminate, so
    the two operators agree on WHAT is contaminated.

    Shape is identical to the doc-level op and just as scale-safe: the
    benchmark gram set broadcasts once, the corpus streams through one
    stateless map_batches, and because a document is one Arrow row its
    whole gram stream sits in one batch — hit positions, island grouping
    (gap > n breaks a span) and the span fold are all vectorized
    in-batch; NOTHING shuffles. Output: one row per maximal span
    (doc_id, span_start, span_end 1-based inclusive word indices,
    n_grams = hits folded into the span)."""
    import ray

    from ..functions.shingles import word_ngram_hashes

    docs = _docs(sf_dir, ["doc_id", "text"])
    bench = _mod_filter(docs, 20, (0,))

    def bench_grams(t: pa.Table) -> pa.Table:
        _, g = word_ngram_hashes(t["text"], n, seed=0)
        return pa.table({"gram": pa.array(np.unique(g).view(np.int64),
                                          pa.int64())})

    gram_rows = bench.map_batches(bench_grams, batch_format="pyarrow") \
        .take_all()  # bounded: benchmark-sized, not corpus-sized
    bench_set = np.unique(np.array([r["gram"] for r in gram_rows], np.int64))
    snip_rows = bench.take_all()  # benchmark-sized
    snippets = {int(r["doc_id"]): " ".join(str(r["text"] or "").split()[:5])
                for r in snip_rows}
    set_ref = ray.put(bench_set)
    snip_ref = ray.put(snippets)

    def spans(t: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "span_start": pa.array([], pa.int64()),
                          "span_end": pa.array([], pa.int64()),
                          "n_grams": pa.array([], pa.int64())})
        bset = ray.get(set_ref)
        snips = ray.get(snip_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = pc.fill_null(t["text"], "").to_pylist()
        aug = [txt + " " + snips[k]
               if i % 10 == 3 and (k := int(i) - int(i) % 20) in snips
               else txt
               for i, txt in zip(ids, texts)]
        idx, g = word_ngram_hashes(pa.array(aug, pa.string()), n, seed=0)
        if not len(g) or not len(bset):
            return empty
        gi = g.view(np.int64)
        pos_in_filtered = np.arange(len(idx), dtype=np.int64)
        change = np.concatenate([[True], idx[1:] != idx[:-1]])
        seg_start = pos_in_filtered[change]
        # 1-based gram start word index within its doc (SQL range(1, ...))
        pos = pos_in_filtered - seg_start[np.cumsum(change) - 1] + 1
        lookup = np.minimum(np.searchsorted(bset, gi), len(bset) - 1)
        hit = bset[lookup] == gi
        if not hit.any():
            return empty
        hid, hpos = idx[hit], pos[hit]  # already (doc, pos)-sorted
        # islands: a gap of more than n gram-starts means the two
        # n-word windows neither overlap nor touch
        brk = np.concatenate([[True], (hid[1:] != hid[:-1])
                              | (hpos[1:] - hpos[:-1] > n)])
        gid = np.cumsum(brk) - 1
        starts = np.where(brk)[0]
        counts = np.diff(np.concatenate([starts, [len(gid)]]))
        did = t["doc_id"].to_numpy(zero_copy_only=False)[hid[starts]]
        return pa.table({
            "doc_id": pa.array(did.astype(np.int64), pa.int64()),
            "span_start": pa.array(hpos[starts], pa.int64()),
            "span_end": pa.array(
                hpos[starts + counts - 1] + n - 1, pa.int64()),
            "n_grams": pa.array(counts.astype(np.int64), pa.int64()),
        })

    return _mod_filter(docs, 20, (0,), negate=True).map_batches(
        spans, batch_format="pyarrow")


# same aug/bg/ag construction as SQL_DECONTAMINATE, then gaps-and-islands
# over DISTINCT hit positions: a new island starts when the gap between
# consecutive gram-start positions exceeds n (windows disjoint and not
# adjacent). DuckDB zips the parallel unnests of pos and gram.
SQL_CONTAM_SPANS = f"""
WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0),
aug AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % 10 = 3 AND b.text IS NOT NULL THEN coalesce(d.text, '') || ' ' ||
              array_to_string(string_split_regex(trim(b.text), '\\s+')[1:5], ' ')
              ELSE d.text END AS text
  FROM documents d
  LEFT JOIN bench b ON b.doc_id = d.doc_id - (d.doc_id % 20)
  WHERE d.doc_id % 20 <> 0),
bw AS (SELECT string_split_regex(trim(text), '\\s+') AS w
       FROM bench WHERE trim(text) <> ''),
bg AS (SELECT DISTINCT
         unnest(list_transform(range(1, greatest(len(w) - {DECONTAMINATE_NGRAM - 2}, 1)),
                               i -> array_to_string(w[i:i+{DECONTAMINATE_NGRAM - 1}], ' '))) AS gram
       FROM bw),
aw AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
       FROM aug WHERE trim(text) <> ''),
ag AS (SELECT doc_id,
         unnest(range(1, greatest(len(w) - {DECONTAMINATE_NGRAM - 2}, 1))) AS pos,
         unnest(list_transform(range(1, greatest(len(w) - {DECONTAMINATE_NGRAM - 2}, 1)),
                               i -> array_to_string(w[i:i+{DECONTAMINATE_NGRAM - 1}], ' '))) AS gram
       FROM aw),
hitpos AS (SELECT DISTINCT doc_id, pos FROM ag JOIN bg USING (gram)),
isl AS (SELECT doc_id, pos,
        CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                  <= {DECONTAMINATE_NGRAM} THEN 0 ELSE 1 END AS brk
        FROM hitpos),
grp AS (SELECT doc_id, pos,
        sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS UNBOUNDED PRECEDING) AS gid
        FROM isl)
SELECT doc_id, min(pos) AS span_start,
       max(pos) + {DECONTAMINATE_NGRAM - 1} AS span_end,
       count(*) AS n_grams
FROM grp GROUP BY doc_id, gid
"""


# ---------------------------------------------------------------------------
# Line-level dedup — CCNet/RefinedWeb duplicated-line removal, cleaned text
# ---------------------------------------------------------------------------

def q_line_dedup(sf_dir: str, min_df: int = LINE_DEDUP_MIN_DF):
    """Line-level dedup (CCNet Wenzek et al. 2020 §3.1 dedupe paragraphs by
    hash across the whole corpus; RefinedWeb does the same for lines):
    lines appearing in ≥ min_df DISTINCT docs (headers, footers, cookie
    banners) are removed; each doc's remaining lines are re-joined in
    order. Shape: pass 1 emits (doc, line-hash) pairs → ONE groupby count
    gives line document-frequencies; the hot-line set (boilerplate
    vocabulary, inherently low-cardinality — same bounded-stop-set
    assumption as `q_boilerplate`) is broadcast; pass 2 rebuilds each doc
    inside its own batch — lines never shuffle, only their 16 B hashes do.

    The corpus has no newlines, so 3-line pages are synthesized
    deterministically (shared header variant / unique-ish body / shared
    footer variant), identically in the SQL oracle, which keys lines by
    STRING — agreement certifies the line-hash collision-free at test
    scale. Output is the cleaned text (body survives, boilerplate lines
    drop), the operator's real product."""
    import ray
    from ray.data.aggregate import Count

    from ..functions.hashing import hash_strings

    docs = _docs(sf_dir, ["doc_id", "text"])

    def lines_of(t: pa.Table) -> tuple[np.ndarray, list[list[str]]]:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = pc.fill_null(t["text"], "").to_pylist()
        per_doc = [[f"hdr variant {int(i) % 7}", txt,
                    f"footer fine print {int(i) % 5}"]
                   for i, txt in zip(ids, texts)]
        return ids, per_doc

    def distinct_pairs(t: pa.Table) -> pa.Table:
        ids, per_doc = lines_of(t)
        flat = [ln for doc in per_doc for ln in doc]
        h = hash_strings(flat, seed=0).view(np.int64)
        did = np.repeat(ids.astype(np.int64), 3)
        order = np.lexsort((h, did))
        did, h = did[order], h[order]
        keep = np.ones(len(h), dtype=bool)
        keep[1:] = (did[1:] != did[:-1]) | (h[1:] != h[:-1])
        return pa.table({"doc_id": pa.array(did[keep], pa.int64()),
                         "line_hash": pa.array(h[keep], pa.int64())})

    df = docs.map_batches(distinct_pairs, batch_format="pyarrow") \
        .groupby("line_hash").aggregate(Count(alias_name="df"))

    def only_hot(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["df"], min_df)) \
            .select(["line_hash"])

    hot_rows = df.map_batches(only_hot, batch_format="pyarrow").take_all()
    hot = np.sort(np.array([r["line_hash"] for r in hot_rows], np.int64))
    hot_ref = ray.put(hot)

    def rebuild(t: pa.Table) -> pa.Table:
        hset = ray.get(hot_ref)
        _, per_doc = lines_of(t)
        flat = [ln for doc in per_doc for ln in doc]
        h = hash_strings(flat, seed=0).view(np.int64)
        if len(hset):
            pos = np.minimum(np.searchsorted(hset, h), len(hset) - 1)
            is_hot = hset[pos] == h
        else:
            is_hot = np.zeros(len(h), dtype=bool)
        out, j = [], 0
        for doc in per_doc:
            kept = [ln for k, ln in enumerate(doc) if not is_hot[j + k]]
            j += len(doc)
            out.append("\n".join(kept))
        return pa.table({"doc_id": t["doc_id"],
                         "clean_text": pa.array(out, pa.string())})

    return docs.map_batches(rebuild, batch_format="pyarrow")


SQL_LINE_DEDUP = f"""
WITH l AS (
  SELECT doc_id, 1 AS ln, 'hdr variant ' || (doc_id % 7)::VARCHAR AS line
  FROM documents
  UNION ALL SELECT doc_id, 2, coalesce(text, '') FROM documents
  UNION ALL
  SELECT doc_id, 3, 'footer fine print ' || (doc_id % 5)::VARCHAR
  FROM documents),
df AS (SELECT line, count(DISTINCT doc_id) AS df FROM l GROUP BY line),
k AS (SELECT l.doc_id, l.ln, l.line
      FROM l JOIN df USING (line) WHERE df.df < {LINE_DEDUP_MIN_DF})
SELECT d.doc_id,
       coalesce(string_agg(k.line, chr(10) ORDER BY k.ln), '') AS clean_text
FROM documents d LEFT JOIN k ON d.doc_id = k.doc_id
GROUP BY d.doc_id
"""


# ---------------------------------------------------------------------------
# Sequence packing — distributed prefix-sum over a deterministic doc order
# ---------------------------------------------------------------------------

def q_pack_sequences(sf_dir: str, budget: int = PACK_BUDGET, range_width: int = 32):
    """Token-budget sequence packing (training-batch assembly): docs in
    deterministic doc_id order are packed into sequences of `budget`
    tokens — doc d's seq_id = floor(exclusive_prefix_sum(n_tokens) /
    budget). The classic two-pass DISTRIBUTED PREFIX SUM: docs are
    range-partitioned by doc_id (fixed width, so the partition of a row
    is a pure function of its key — retry/resume-stable); pass 1 is one
    small groupby-sum of per-partition token totals, whose running sum
    gives each partition its exclusive global offset (driver state =
    O(partitions); at 10^12 rows the offsets themselves are computed by a
    second, recursive prefix-sum level rather than collected — same
    kernel, log_P depth); pass 2 sorts each partition locally and adds
    its offset. No global sort, no all-to-all: the only shuffle is the
    coarse range-partition groupby. Tokenization contract shared with
    `token_count` (trim + RE2 \\s+ split)."""
    from ray.data.aggregate import Sum

    from ..functions.textstats import whitespace_token_counts

    def tokens(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = whitespace_token_counts(t["text"]).astype(np.int64)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_tokens": pa.array(n, pa.int64()),
                         "part": pa.array(ids // range_width, pa.int64())})

    tok = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        tokens, batch_format="pyarrow")

    sums = tok.groupby("part").aggregate(
        Sum("n_tokens", alias_name="tot")).take_all()  # O(partitions)
    sums.sort(key=lambda r: r["part"])
    offsets, run = {}, 0
    for r in sums:
        offsets[int(r["part"])] = run
        run += int(r["tot"])

    def per_part(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        n = g["n_tokens"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        ids, n = ids[order], n[order]
        base = offsets[int(ids[0]) // range_width]
        excl = base + np.cumsum(n) - n
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_tokens": pa.array(n, pa.int64()),
                         "seq_id": pa.array(excl // budget, pa.int64())})

    return tok.groupby("part").map_groups(per_part, batch_format="pyarrow") \
        .select_columns(["doc_id", "n_tokens", "seq_id"])


SQL_PACK_SEQUENCES = f"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE length(string_split_regex(trim(text), '\\s+')) END AS n_tokens
  FROM documents)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(floor(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            / {PACK_BUDGET}) AS BIGINT) AS seq_id
FROM t
"""


# ---------------------------------------------------------------------------
# Per-domain stats — host extraction over canonicalized urls + groupby
# ---------------------------------------------------------------------------

def q_domain_stats(sf_dir: str):
    """Per-domain corpus profile (crawl curation: quota/blocklist decisions
    are made per registered domain): canonicalize the capture url
    (`functions/urls.py`, same synthesized messy-url construction as
    `q_url_canon`), extract the host with one vectorized RE2
    `extract_regex`, then ONE groupby over the low-cardinality host key —
    doc count and total chars per domain. The groupby ships 8 B ids +
    short host strings, nothing corpus-sized."""
    from ray.data.aggregate import Count, Sum

    from ..functions.urls import canon_url_array
    from .queries import _messy_url

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        messy = pa.array([_messy_url(int(i)) for i in ids], pa.string())
        canon = canon_url_array(messy)
        host = pc.struct_field(
            pc.extract_regex(canon, pattern=r"^https?://(?P<host>[^/]+)"),
            "host")
        return pa.table({"host": host, "n_chars": t["n_chars"]})

    agg = _docs(sf_dir, ["doc_id", "n_chars"]) \
        .map_batches(fn, batch_format="pyarrow") \
        .groupby("host").aggregate(Count(alias_name="n_docs"),
                                   Sum("n_chars", alias_name="total_chars"))
    return agg.map_batches(
        lambda t: pa.table({"host": t["host"],
                            "n_docs": pc.cast(t["n_docs"], pa.int64()),
                            "total_chars": pc.cast(t["total_chars"], pa.int64())}),
        batch_format="pyarrow")


def _sql_domain_stats() -> str:
    from ..functions.urls import sql_canon_url

    # Same messy-url construction as q_url_canon's oracle.
    messy = (
        "(CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END || '://' || "
        "CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END || "
        "'Site' || (doc_id % 53)::VARCHAR || '.Example.COM' || "
        "CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END || "
        "'/Docs/' || doc_id::VARCHAR || "
        "CASE doc_id % 5 WHEN 0 THEN '/' WHEN 1 THEN '#Sec2' "
        "WHEN 2 THEN '?q=X#y' WHEN 3 THEN '' ELSE '//' END)"
    )
    canon = sql_canon_url(messy)
    return (
        f"SELECT regexp_extract({canon}, '^https?://([^/]+)', 1) AS host, "
        "count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars "
        "FROM documents GROUP BY 1"
    )


# ---------------------------------------------------------------------------
# Bloom-prefiltered delta anti-join — incremental-ingest "what's new"
# ---------------------------------------------------------------------------

def q_bloom_delta(sf_dir: str, m_bits: int = 1 << 20, k_hashes: int = 4):
    """Delta-ingest novelty filter: which docs of a new crawl batch (delta
    = doc_id % 4 == 0) are NOT already in the base corpus by normalized
    text? The scale pattern is a BLOOM-PREFILTERED anti-join: the base
    side's norm-text hashes fold into a bloom filter built distributively
    (one fixed-size bitmap per block, OR-combined — 128 KiB each here;
    at 10^12 rows the partials tree-reduce instead of collecting flat,
    and m_bits sizes to the base cardinality); the broadcast filter
    definitively clears the typically-large "genuinely new" fraction with
    zero shuffle, and only bloom-POSITIVES (true dups + ~0.4% false
    positives at these parameters) pay the exact hash join against the
    base. Output is EXACT — the bloom only routes, never decides.

    Planted overlap: delta docs with doc_id % 20 == 0 take base doc
    (doc_id + 1)'s text, identically in the SQL oracle, which anti-joins
    on the norm STRING — agreement also certifies the 64-bit text hash
    collision-free at test scale."""
    import ray

    from ..functions.hashing import hash_strings
    from ..functions.normalize import normalize_array
    from .queries import _QCFG

    assert m_bits & (m_bits - 1) == 0, "m_bits must be a power of two"
    docs = _docs(sf_dir, ["doc_id", "text"])

    planted_rows = _mod_filter(docs, 20, (1,)).take_all()
    planted = {int(r["doc_id"]): str(r["text"] or "") for r in planted_rows}
    planted_ref = ray.put(planted)

    def norm_hash_base(t: pa.Table) -> pa.Table:
        h = hash_strings(
            normalize_array(t["text"], _QCFG.max_chars, _QCFG.n_grams),
            seed=7).view(np.int64)
        return pa.table({"h": pa.array(h, pa.int64())})

    base = _mod_filter(docs, 4, (0,), negate=True)
    base_h = base.map_batches(norm_hash_base, batch_format="pyarrow")

    words = m_bits // 64

    def _positions(h: np.ndarray) -> np.ndarray:
        """(len(h), k) bit positions by double hashing h1 + i*h2 mod m."""
        hu = h.view(np.uint64)
        h1 = hu & np.uint64(m_bits - 1)
        h2 = ((hu >> np.uint64(33)) | np.uint64(1)) & np.uint64(m_bits - 1)
        i = np.arange(k_hashes, dtype=np.uint64)
        with np.errstate(over="ignore"):
            return (h1[:, None] + i[None, :] * h2[:, None]) \
                & np.uint64(m_bits - 1)

    def bitmap_partial(t: pa.Table) -> pa.Table:
        h = t["h"].to_numpy(zero_copy_only=False)
        bits = np.zeros(words, dtype=np.uint64)
        pos = _positions(h).ravel()
        np.bitwise_or.at(bits, pos >> np.uint64(6),
                         np.uint64(1) << (pos & np.uint64(63)))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    partials = base_h.map_batches(bitmap_partial, batch_format="pyarrow",
                                  batch_size=65536).take_all()
    bloom = np.zeros(words, dtype=np.uint64)
    for r in partials:  # O(blocks) 128 KiB partials; tree-reduce at scale
        bloom |= np.frombuffer(r["bits"], dtype=np.uint64)
    bloom_ref = ray.put(bloom)

    def delta_hash(t: pa.Table) -> pa.Table:
        pl = ray.get(planted_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = pc.fill_null(t["text"], "").to_pylist()
        # planted source (doc_id+1) missing → the oracle's LEFT JOIN makes
        # the delta text NULL, whose NOT IN is NULL → row excluded; drop
        # the row here to match (degenerate, only on non-contiguous ids)
        keep = np.array([not (i % 20 == 0 and int(i) + 1 not in pl)
                         for i in ids], bool)
        if not keep.all():
            t = t.filter(pa.array(keep))
            ids = ids[keep]
            texts = [x for x, k in zip(texts, keep) if k]
        eff = [pl[int(i) + 1] if i % 20 == 0 else txt
               for i, txt in zip(ids, texts)]
        h = hash_strings(
            normalize_array(pa.array(eff, pa.string()),
                            _QCFG.max_chars, _QCFG.n_grams),
            seed=7).view(np.int64)
        return pa.table({"doc_id": pa.array(ids.astype(np.int64), pa.int64()),
                         "h": pa.array(h, pa.int64())})

    delta_h = _mod_filter(docs, 4, (0,)).map_batches(
        delta_hash, batch_format="pyarrow")

    def split_by_bloom(t: pa.Table) -> pa.Table:
        bl = ray.get(bloom_ref)
        h = t["h"].to_numpy(zero_copy_only=False)
        pos = _positions(h)
        hit = np.ones(len(h), dtype=bool)
        for j in range(k_hashes):
            p = pos[:, j]
            hit &= (bl[p >> np.uint64(6)]
                    >> (p & np.uint64(63))) & np.uint64(1) != 0
        return t.append_column("maybe_dup", pa.array(hit, pa.bool_()))

    flagged = delta_h.map_batches(split_by_bloom, batch_format="pyarrow")

    # Exact verify only for bloom-positives: tag-and-group semi-join (the
    # J1/J2 house pattern — one coarse hash-partition groupby, vectorized
    # np.isin inside; no acero join, so empty partitions are harmless).
    # The collected matched-id set is bounded by dups + bloom FPs — small.
    n_parts = 16

    def pos_tagged(t: pa.Table) -> pa.Table:
        t = t.filter(t["maybe_dup"]).select(["doc_id", "h"])
        h = t["h"].to_numpy(zero_copy_only=False)
        return t.append_column("part", pa.array(h % n_parts, pa.int64()))

    def base_tagged(t: pa.Table) -> pa.Table:
        h = t["h"].to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": pa.array(np.full(len(h), -1), pa.int64()),
                         "h": t["h"],
                         "part": pa.array(h % n_parts, pa.int64())})

    tagged = flagged.map_batches(pos_tagged, batch_format="pyarrow") \
        .union(base_h.map_batches(base_tagged, batch_format="pyarrow"))

    def semi(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        h = g["h"].to_numpy(zero_copy_only=False)
        is_pos = ids >= 0
        hit = np.isin(h[is_pos], h[~is_pos])
        return pa.table({"doc_id": pa.array(ids[is_pos][hit], pa.int64())})

    matched = tagged.groupby("part").map_groups(semi, batch_format="pyarrow")
    matched_ids = np.unique(np.array(
        [r["doc_id"] for r in matched.take_all()], np.int64))
    matched_ref = ray.put(matched_ids)

    def is_new(t: pa.Table) -> pa.Table:
        mi = ray.get(matched_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keep = ~np.isin(ids, mi)
        return t.filter(pa.array(keep)).select(["doc_id"])

    return flagged.map_batches(is_new, batch_format="pyarrow")


SQL_BLOOM_DELTA = f"""
WITH delta AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % 20 = 0 THEN b.text ELSE d.text END AS text
  FROM documents d LEFT JOIN documents b ON b.doc_id = d.doc_id + 1
  WHERE d.doc_id % 4 = 0),
base AS (SELECT {_SQL_NORM} AS n FROM documents WHERE doc_id % 4 <> 0),
dn AS (SELECT doc_id, {_SQL_NORM} AS n FROM delta)
-- NOT EXISTS, not NOT IN: one NULL norm in base would make NOT IN evaluate
-- NULL for every row and silently empty the result (Ray side fills nulls)
SELECT doc_id FROM dn WHERE NOT EXISTS (SELECT 1 FROM base WHERE base.n = dn.n)
"""


# ---------------------------------------------------------------------------
# LSH similarity join — both-sides-large fuzzy join (pipelines/fuzzy_join.py)
# ---------------------------------------------------------------------------

def q_lsh_join(sf_dir: str):
    """Both-sides-large near-duplicate JOIN (`pipelines/fuzzy_join.py`):
    left = salted base docs, right = salted 1-edit misspellings (ids
    +1_000_000, raw len ≥ 60 — the same planted-salted construction and
    closed-form argument as `minhash_lsh_clusters`: the shared salt pins
    each right row's ONLY near-duplicate to its own base, so the verified
    per-right argmax is exactly (base+1e6 → base)). Exercises the full
    bipartite path: two-sided band explode → cross-side bucket pairing →
    payload join → Jaccard/Levenshtein verify → coarse-partition argmax."""
    from ..functions.misspell import misspell
    from .fuzzy_join import lsh_similarity_join
    from .queries import _planted_guard, _salt

    def mk_left(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        _planted_guard(ids)
        texts = t["text"].to_pylist()
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([f"{_salt(i)} {x}" for i, x in zip(ids, texts)],
                             pa.string()),
        })

    def mk_right(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        _planted_guard(ids)
        texts = t["text"].to_pylist()
        out_i, out_t = [], []
        for i, x in zip(ids, texts):
            if len(x) >= 60:
                out_i.append(i + 1_000_000)
                out_t.append(f"{_salt(i)} {misspell(x, 10_000 + i, n_perturbations=1)}")
        return pa.table({"doc_id": pa.array(out_i, pa.int64()),
                         "text": pa.array(out_t, pa.string())})

    base = _docs(sf_dir, ["doc_id", "text"])
    left = base.map_batches(mk_left, batch_format="pyarrow")
    right = base.map_batches(mk_right, batch_format="pyarrow")
    from .queries import _QCFG

    out = lsh_similarity_join(left, right, _QCFG)
    return out.select_columns(["right_id", "left_id"])


SQL_LSH_JOIN = """
SELECT doc_id + 1000000 AS right_id, doc_id AS left_id
FROM documents WHERE length(text) >= 60
"""


# ---------------------------------------------------------------------------
# Sliding-window aggregate — window fan-out instead of a windowed shuffle
# ---------------------------------------------------------------------------

def q_events_sliding(sf_dir: str, window_hours: int = SLIDING_WINDOW_HOURS):
    """Sliding 3-hour window, 1-hour slide: per output hour h, count and
    value-sum of events in (h−2 .. h]. Ray Data has no event-time windows;
    the scale shape is WINDOW FAN-OUT — each event row expands to
    window/slide = 3 (hour, value) contributions (np.repeat on 16 B rows,
    in-batch) and ONE plain groupby does the rest. No ordering assumption,
    no per-window state, no sort: the classic streaming trick of turning a
    sliding window into a tumbling one by key replication."""
    from ray.data.aggregate import Count, Sum

    ev = _read(sf_dir, "events", ["ts", "value"])
    us_per_hour = 3_600_000_000

    def expand(t: pa.Table) -> pa.Table:
        h = pc.floor_temporal(t["ts"], unit="hour")
        h_us = pc.cast(pc.cast(h, pa.timestamp("us")), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False)
        k = np.tile(np.arange(window_hours, dtype=np.int64), len(h_us))
        hours = np.repeat(h_us, window_hours) + k * us_per_hour
        return pa.table({
            "hour": pa.array(hours, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(np.repeat(v, window_hours)),
        })

    agg = ev.map_batches(expand, batch_format="pyarrow") \
        .groupby("hour").aggregate(Count(alias_name="n_events"),
                                   Sum("value", alias_name="sum_value"))

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "hour": pc.cast(t["hour"], pa.timestamp("us")),
            "n_events": pc.cast(t["n_events"], pa.int64()),
            "sum_value": pc.round(t["sum_value"], 3),
        })

    return agg.map_batches(fin, batch_format="pyarrow")


SQL_EVENTS_SLIDING = f"""
WITH x AS (
  SELECT date_trunc('hour', ts) + to_hours(k) AS hour, value
  FROM events, (VALUES {", ".join(f"({k})" for k in range(SLIDING_WINDOW_HOURS))}) AS t(k))
SELECT hour, count(*) AS n_events, round(sum(value), 3) AS sum_value
FROM x GROUP BY hour
"""


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# Deterministic global shuffle — hash-range prefix-sum rank assignment
# ---------------------------------------------------------------------------

def q_shuffle_rank(sf_dir: str, seed: int = 42, log2_parts: int = 4):
    """Deterministic global shuffle for training export: each doc's rank is
    its position in fmix32(doc_id ^ seed) order — seed-stable, so reruns,
    retries and resumed exports see the SAME permutation (Ray's
    random_shuffle is neither deterministic across runs nor resumable).
    Shape: hash-RANGE partitions (part = top log2_parts bits of the hash —
    uniform by the mixer's avalanche, so no skew) + the same two-pass
    distributed prefix-sum as `pack_sequences`: one tiny per-partition
    count groupby → exclusive offsets (O(P) driver state; recursive at
    10^12 rows), then an in-partition sort by (hash, doc_id). No global
    sort of the corpus; the only shuffle is the coarse range groupby. The
    SQL oracle replays the identical fmix32 pipeline and ranks with a
    window — a full cross-engine check of mixer + ordering."""
    from ray.data.aggregate import Count

    from ..functions.hashing import fmix32

    def hashed(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = fmix32(ids, seed=seed).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "h": pa.array(h, pa.int64()),
            "part": pa.array(h >> (32 - log2_parts), pa.int64()),
        })

    hds = _docs(sf_dir, ["doc_id"]).map_batches(hashed, batch_format="pyarrow")
    counts = hds.groupby("part").aggregate(Count(alias_name="n")).take_all()
    counts.sort(key=lambda r: r["part"])
    offsets, run = {}, 0
    for r in counts:
        offsets[int(r["part"])] = run
        run += int(r["n"])

    def per_part(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        h = g["h"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))
        base = offsets[int(h[0]) >> (32 - log2_parts)]
        rank = base + np.arange(len(ids), dtype=np.int64)
        return pa.table({"doc_id": pa.array(ids[order], pa.int64()),
                         "rank": pa.array(rank, pa.int64())})

    return hds.groupby("part").map_groups(per_part, batch_format="pyarrow") \
        .select_columns(["doc_id", "rank"])


def _sql_shuffle_rank() -> str:
    from ..functions.hashing import sql_hash_sample

    inner = sql_hash_sample("documents", "doc_id", 1.0, seed=42,
                            select="doc_id, _h5 AS h")
    return (f"SELECT doc_id, row_number() OVER (ORDER BY h, doc_id) - 1 "
            f"AS rank FROM ({inner})")


# ---------------------------------------------------------------------------
# Deterministic train/valid/test split — hash-gated, repartition-stable
# ---------------------------------------------------------------------------

SPLIT_SEED = 1013
SPLIT_TRAIN, SPLIT_VALID = 0.90, 0.05  # rest = test


def q_split_assign(sf_dir: str):
    """Deterministic train/valid/test split assignment (every training-data
    pipeline's last step before packing): split = pure function of
    fmix32(doc_id ^ seed) against cumulative ratio thresholds — the same
    hash-gated membership contract as `sample_fraction` / `shuffle_rank`,
    so assignment is stable under retries, repartitioning, resume, AND
    later corpus growth (a doc's split never changes when neighbours are
    added or removed — the property RNG- or rank-based splits lack, and
    the reason leakage audits can re-derive membership offline). Embarrass-
    ingly parallel: one vectorized map_batches, no shuffle at any scale."""
    from ..functions.hashing import fmix32

    t1 = np.uint64(int(SPLIT_TRAIN * 2**32))
    t2 = np.uint64(int((SPLIT_TRAIN + SPLIT_VALID) * 2**32))

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        h = fmix32(ids, seed=SPLIT_SEED)
        split = np.where(h < t1, "train", np.where(h < t2, "valid", "test"))
        return pa.table({"doc_id": t["doc_id"],
                         "split": pa.array(split, pa.string())})

    return _docs(sf_dir, ["doc_id"]).map_batches(fn, batch_format="pyarrow")


def _sql_split_assign() -> str:
    from ..functions.hashing import sql_fmix32_subquery

    t1 = int(SPLIT_TRAIN * 2**32)
    t2 = int((SPLIT_TRAIN + SPLIT_VALID) * 2**32)
    sub = sql_fmix32_subquery("documents", "doc_id", seed=SPLIT_SEED)
    return (f"SELECT doc_id, CASE WHEN _h5 < {t1} THEN 'train' "
            f"WHEN _h5 < {t2} THEN 'valid' ELSE 'test' END AS split "
            f"FROM {sub}")


# ---------------------------------------------------------------------------
# Incremental delta-ingest clustering — oracled end-to-end
# ---------------------------------------------------------------------------

def q_incremental_clusters(sf_dir: str):
    """Delta-ingest dedup END-TO-END (`pipelines/incremental.py`): the base
    state is built by the full pipeline over salted originals + exact
    copies (+1e6), persisted, then a DELTA of salted 1-edit misspellings
    (+2e6, raw len ≥ 60) is clustered against it WITHOUT re-shuffling the
    base. The planted-salt argument (see `minhash_lsh_clusters`) makes the
    final partition closed-form — every variant clusters to its base
    doc_id — so the SAME SQL oracle certifies the full-run and the
    incremental-run paths produce the identical assignment. State lives in
    a per-call /tmp dir; the result is materialized before cleanup."""
    import shutil
    import tempfile

    from ..functions.misspell import misspell
    from .dedup import dedup_pipeline
    from .incremental import incremental_dedup, save_dedup_state
    from .queries import _QCFG, _planted_guard, _salt

    base = _docs(sf_dir, ["doc_id", "text"])

    def mk_base(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        _planted_guard(ids)
        texts = t["text"].to_pylist()
        out_i, out_t = [], []
        for i, x in zip(ids, texts):
            s = _salt(i)
            out_i.extend([i, i + 1_000_000])
            out_t.extend([f"{s} {x}", f"{s} {x}"])
        return pa.table({"doc_id": pa.array(out_i, pa.int64()),
                         "text": pa.array(out_t, pa.string())})

    def mk_delta(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        _planted_guard(ids)
        texts = t["text"].to_pylist()
        out_i, out_t = [], []
        for i, x in zip(ids, texts):
            if len(x) >= 60:
                out_i.append(i + 2_000_000)
                out_t.append(
                    f"{_salt(i)} {misspell(x, 10_000 + i, n_perturbations=1)}")
        return pa.table({"doc_id": pa.array(out_i, pa.int64()),
                         "text": pa.array(out_t, pa.string())})

    import time

    state_dir = tempfile.mkdtemp(prefix="graft_incr_state_", dir="/tmp")
    try:
        t0 = time.perf_counter()
        res = dedup_pipeline(base.map_batches(mk_base, batch_format="pyarrow"),
                             _QCFG)
        save_dedup_state(res, _QCFG, state_dir)
        t_save = time.perf_counter() - t0
        t0 = time.perf_counter()
        inc = incremental_dedup(
            state_dir, base.map_batches(mk_delta, batch_format="pyarrow"),
            _QCFG)
        out = inc.clusters.materialize()
        t_delta = time.perf_counter() - t0
        # bench reads the phase split (save-state is a one-off; the delta
        # path is what repeats daily at scale and must not hide behind it)
        q_incremental_clusters.last_phase_seconds = {
            "save": t_save, "delta": t_delta}
        return out
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)


SQL_INCREMENTAL_CLUSTERS = """
SELECT doc_id, doc_id AS cluster_id FROM documents
UNION ALL SELECT doc_id + 1000000, doc_id FROM documents
UNION ALL SELECT doc_id + 2000000, doc_id FROM documents WHERE length(text) >= 60
"""


# ---------------------------------------------------------------------------
# Vocabulary build + token-id export — the flattened training-export layout
# ---------------------------------------------------------------------------

VOCAB_SIZE = 64
VOCAB_MAX_TOKENS = 32


def q_vocab_encode(sf_dir: str, vocab_size: int = VOCAB_SIZE,
                   max_tokens: int = VOCAB_MAX_TOKENS):
    """Frequency-vocabulary build + token-id encoding (the export step a
    training pipeline runs after cleaning: text → fixed vocab ids).

    Vocab = top-``vocab_size`` words by (document frequency DESC, word ASC),
    ids 1..V; out-of-vocabulary words encode as 0 (UNK). Output is the
    flattened (doc_id, pos, token_id) layout — one row per encoded token,
    1-based ``pos`` over the doc's first ``max_tokens`` words.

    Scale shape: the corpus-wide DF aggregation reuses `_word_df_ds` (per-
    batch partial combine, |vocab|-sized shuffle); the top-V cut is driver-
    side on the tiny aggregated table; the vocab is broadcast (ray.put) and
    every doc encodes in one vectorized pc.index_in pass — the corpus never
    shuffles."""
    import ray

    from ..functions.normalize import normalize_array
    from .queries import _QCFG, _word_df_ds

    blocks = [t for t in ray.get(_word_df_ds(sf_dir).to_arrow_refs())
              if t.num_columns]
    tbl = pa.concat_tables(blocks, promote_options="none")
    words = np.asarray(tbl["word"].to_pylist(), dtype=object)
    df = tbl["df"].to_numpy(zero_copy_only=False).astype(np.int64)
    # rank by (df DESC, word ASC): lexsort keys are last-significant-first
    order = np.lexsort((words, -df))[:vocab_size]
    vocab_words = words[order]                       # vocab_words[i] → id i+1
    lex = np.argsort(vocab_words)
    vocab_ref = ray.put((list(vocab_words[lex]),
                         (lex + 1).astype(np.int64)))  # sorted words, their ids

    def encode(t: pa.Table) -> pa.Table:
        svoc, sids = ray.get(vocab_ref)
        norm = normalize_array(t["text"], _QCFG.max_chars, _QCFG.n_grams)
        wl = pc.split_pattern(norm, pattern=" ")
        if isinstance(wl, pa.ChunkedArray):
            wl = wl.combine_chunks()
        lens = pc.list_value_length(wl).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        pos = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(starts, lens) + 1
        keep = pos <= max_tokens
        hit = pc.index_in(wl.values, value_set=pa.array(svoc, pa.string()))
        valid = hit.is_valid().to_numpy(zero_copy_only=False)
        idx = pc.fill_null(hit, 0).to_numpy(zero_copy_only=False).astype(np.int64)
        tid = np.where(valid, sids[idx], 0).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, lens)[keep], pa.int64()),
            "pos": pa.array(pos[keep], pa.int64()),
            "token_id": pa.array(tid[keep], pa.int64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        encode, batch_format="pyarrow")


SQL_VOCAB_ENCODE = f"""
WITH n AS (SELECT doc_id, {_SQL_NORM} AS norm FROM documents),
w AS (SELECT doc_id, string_split(norm, ' ') AS ws FROM n),
df AS (SELECT word, count(DISTINCT doc_id) AS df
       FROM (SELECT doc_id, unnest(ws) AS word FROM w) GROUP BY word),
vocab AS (SELECT word, tid FROM (
    SELECT word, row_number() OVER (ORDER BY df DESC, word ASC) AS tid
    FROM df) WHERE tid <= {VOCAB_SIZE}),
tok AS (SELECT doc_id,
               unnest(range(1, least(len(ws), {VOCAB_MAX_TOKENS}) + 1)) AS i,
               ws FROM w),
t2 AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, ws[CAST(i AS INT)] AS word
       FROM tok)
SELECT t2.doc_id, t2.pos, CAST(coalesce(vocab.tid, 0) AS BIGINT) AS token_id
FROM t2 LEFT JOIN vocab USING (word)
"""


# ---------------------------------------------------------------------------
# Per-document character entropy — a classic cheap quality/garbage signal
# ---------------------------------------------------------------------------

def q_char_entropy(sf_dir: str):
    """Shannon entropy (bits) of the normalized text's character
    distribution — low entropy flags repetitive/garbage documents, high
    entropy flags binary-ish noise (a standard cheap curation signal next
    to the Gopher rules). Zero shuffle: normalized text is ASCII by
    construction (accents folded), so per-doc histograms are ONE packed
    np.bincount over the batch's flat utf8 buffer — no per-doc Python."""
    from ..functions.hashing import _string_buffers
    from ..functions.normalize import normalize_array
    from .queries import _QCFG, _round6_half_up

    def fn(t: pa.Table) -> pa.Table:
        norm = normalize_array(t["text"], _QCFG.max_chars, _QCFG.n_grams)
        data, off = _string_buffers(norm)
        n = len(t)
        lens = np.diff(off)
        doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        counts = np.bincount(doc_of * 128 + data.astype(np.int64),
                             minlength=n * 128).reshape(n, 128)
        with np.errstate(divide="ignore", invalid="ignore"):
            p = counts / np.maximum(lens, 1)[:, None]
            term = np.where(counts > 0, -p * np.log2(np.where(p > 0, p, 1.0)),
                            0.0)
        ent = _round6_half_up(term.sum(axis=1))
        return pa.table({"doc_id": t["doc_id"],
                         "entropy": pa.array(ent, pa.float64())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow")


SQL_CHAR_ENTROPY = f"""
WITH n AS (SELECT doc_id, {_SQL_NORM} AS norm FROM documents),
c AS (SELECT doc_id, substring(norm, CAST(i AS INT), 1) AS ch
      FROM (SELECT doc_id, norm, unnest(range(1, length(norm) + 1)) AS i
            FROM n)),
cc AS (SELECT doc_id, ch, count(*) AS cnt FROM c GROUP BY doc_id, ch),
tot AS (SELECT doc_id, sum(cnt) AS n_chars FROM cc GROUP BY doc_id)
SELECT cc.doc_id,
       round(-sum((CAST(cnt AS DOUBLE) / n_chars)
                  * log2(CAST(cnt AS DOUBLE) / n_chars)), 6) AS entropy
FROM cc JOIN tot USING (doc_id)
GROUP BY cc.doc_id
"""


# ---------------------------------------------------------------------------
# Longest repeated substring — suffix-array repetition signal
# ---------------------------------------------------------------------------
# Per-doc longest substring occurring at least twice (the intra-document
# repetition signal behind "remove documents whose longest repeat exceeds
# k" curation rules; Lee et al. 2022 use the same suffix-array machinery
# cross-doc). Computed with a REAL suffix array (functions/suffixes.py:
# numpy prefix-doubling + Kasai LCP; the answer is the max adjacent-rank
# LCP) over the first _LRS_CAP chars of the normalized text — the cap
# bounds per-doc work AND keeps the O(n²)-substring SQL oracle tractable.
# Shape: pure map_batches, embarrassingly parallel, zero shuffle; the
# cross-doc partition-level variant is documented in the module docstring.

_LRS_CAP = 192


def q_longest_repeat(sf_dir: str):
    from ..functions.normalize import normalize_array
    from ..functions.suffixes import longest_repeats_batch
    from .queries import _QCFG

    def fn(t: pa.Table) -> pa.Table:
        norm = normalize_array(t["text"], _QCFG.max_chars, _QCFG.n_grams)
        capped = pc.utf8_slice_codeunits(norm, 0, _LRS_CAP)
        lens = longest_repeats_batch(capped.to_pylist())
        return pa.table({"doc_id": t["doc_id"],
                         "lrs_len": pa.array(lens, pa.int64())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow")


# LRS length = max k such that some k-gram of the capped norm repeats;
# the oracle enumerates every (start, k) substring pair per doc (bounded
# by _LRS_CAP² — the reason for the cap) and takes the max repeating k.
SQL_LONGEST_REPEAT = f"""
WITH n AS (SELECT doc_id, substr({_SQL_NORM}, 1, {_LRS_CAP}) AS p
           FROM documents),
subs AS (SELECT n.doc_id, k.k, substr(n.p, i.i, k.k) AS s
         FROM n,
              generate_series(1, {_LRS_CAP}) i(i),
              generate_series(1, {_LRS_CAP}) k(k)
         WHERE i.i + k.k <= length(n.p) + 1),
rep AS (SELECT doc_id, max(k) AS m FROM subs
        GROUP BY doc_id, k, s HAVING count(*) >= 2),
best AS (SELECT doc_id, max(m) AS m FROM rep GROUP BY doc_id)
SELECT n.doc_id, coalesce(best.m, 0) AS lrs_len
FROM n LEFT JOIN best ON n.doc_id = best.doc_id
"""


# ---------------------------------------------------------------------------
# Cross-doc suffix-array substring pairs (stages/sa_substring.py)
# ---------------------------------------------------------------------------
# All doc pairs within a doc_id % _SA_PARTS partition sharing a common
# substring of length ≥ SA_MIN_LEN of the capped normalized text — found
# EXACTLY from one partition-level suffix array (exactness argument in the
# stage docstring). The oracle states the same set declaratively: a common
# substring of length ≥ L exists iff a shared L-gram does.


def q_sa_substring_pairs(sf_dir: str):
    from ..stages.sa_substring import sa_substring_pairs
    from .queries import _norm_docs_table

    docs = _norm_docs_table(sf_dir).map_batches(
        lambda t: t.rename_columns(["doc_id", "norm_text"]),
        batch_format="pyarrow")
    return sa_substring_pairs(docs)


def _sql_sa_substring() -> str:
    from ..stages.sa_substring import SA_CAP, SA_MIN_LEN, SA_PARTS

    return f"""
WITH n AS (SELECT doc_id, substr({_SQL_NORM}, 1, {SA_CAP}) AS p
           FROM documents),
g AS (SELECT doc_id, doc_id % {SA_PARTS} AS part, substr(p, i.i, {SA_MIN_LEN}) AS s
      FROM n, generate_series(1, {SA_CAP}) i(i)
      WHERE i.i + {SA_MIN_LEN} <= length(p) + 1),
d AS (SELECT DISTINCT part, s, doc_id FROM g)
SELECT DISTINCT a.doc_id AS left_id, b.doc_id AS right_id
FROM d a JOIN d b ON a.part = b.part AND a.s = b.s AND a.doc_id < b.doc_id
"""


# ---------------------------------------------------------------------------
# Passage chunking — fixed word window + stride (RAG / pretraining chunks)
# ---------------------------------------------------------------------------
# Split each doc into overlapping word windows (window _CHUNK_W, stride
# _CHUNK_S): the standard retrieval-corpus / long-doc-pretraining chunker.
# Shape: pure flat-map inside map_batches — one output row per chunk, zero
# shuffle, streams at read bandwidth. The per-chunk join is a Python
# ' '.join over the already-split word slice (string assembly, not
# compute); everything positional is numpy over the flattened word buffer.

_CHUNK_W = 64
_CHUNK_S = 48

# padded-norm mirror (normalize_array zero-pads norms shorter than the
# 3-gram width — same contract queries_web._SQL_NORM_PADDED documents;
# duplicated here because the module tails cross-merge and a top-level
# import would cycle)
_SQL_NORM_PAD = (
    f"(CASE WHEN length(coalesce({_SQL_NORM}, '')) < 3 "
    f"THEN lpad(coalesce({_SQL_NORM}, ''), 3, '0') ELSE {_SQL_NORM} END)"
)


def q_chunk_passages(sf_dir: str):
    from ..functions.normalize import normalize_array
    from .queries import _QCFG

    def fn(t: pa.Table) -> pa.Table:
        norm = normalize_array(t["text"], _QCFG.max_chars, _QCFG.n_grams)
        wl = pc.split_pattern(norm, pattern=" ")
        if isinstance(wl, pa.ChunkedArray):
            wl = wl.combine_chunks()
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        offs = np.asarray(wl.offsets)
        words = wl.values.to_pylist()
        out_id, out_chunk, out_txt, out_n = [], [], [], []
        for r in range(len(t)):
            ws = [w for w in words[offs[r]:offs[r + 1]] if w]
            n = len(ws)
            s, c = 0, 0
            # a start is emitted only if the PREVIOUS window didn't already
            # reach the end — no fully-contained redundant tail chunk
            while s < n and (c == 0 or s - _CHUNK_S + _CHUNK_W < n):
                e = min(s + _CHUNK_W, n)
                out_id.append(ids[r])
                out_chunk.append(c)
                out_txt.append(" ".join(ws[s:e]))
                out_n.append(e - s)
                s += _CHUNK_S
                c += 1
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "chunk_id": pa.array(out_chunk, pa.int64()),
            "passage": pa.array(out_txt, pa.string()),
            "n_words": pa.array(out_n, pa.int64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow")


SQL_CHUNK_PASSAGES = f"""
WITH n AS (SELECT doc_id, {_SQL_NORM_PAD} AS norm FROM documents),
t AS (SELECT doc_id,
        list_filter(string_split(norm, ' '), x -> x <> '') AS ws FROM n),
c AS (SELECT doc_id, s.s AS chunk_id,
        array_to_string(ws[s.s * {_CHUNK_S} + 1 :
                           least(s.s * {_CHUNK_S} + {_CHUNK_W}, len(ws))],
                        ' ') AS passage,
        least(s.s * {_CHUNK_S} + {_CHUNK_W}, len(ws)) - s.s * {_CHUNK_S}
          AS n_words
      FROM t, generate_series(0, 63) s(s)
      WHERE s.s * {_CHUNK_S} < len(ws)
        AND (s.s = 0 OR (s.s - 1) * {_CHUNK_S} + {_CHUNK_W} < len(ws)))
SELECT doc_id, chunk_id, passage, n_words FROM c
"""


# ---------------------------------------------------------------------------
# Distributed k-means over the embeddings table (Lloyd, k unrolled iters)
# ---------------------------------------------------------------------------
# The canonical iterative-ML-over-Dataset shape (same harness as
# queries_web.q_pagerank): embedding blocks are materialized ONCE as
# object-store refs and re-mapped per iteration; each batch computes
# nearest-centroid assignments (vectorized (n,k,d) squared distances) and
# emits per-cluster partial (sum, count) rows; ONE combine task per
# iteration folds partials into the next centroid matrix in the object
# store — never on the driver. Init is deterministic (the k smallest
# vec_ids), empty clusters keep their previous centroid, distance ties
# break to the lowest cluster — each rule mirrored in the unrolled SQL.
# Output is the final DISCRETE assignment (vec_id, cluster_id): robust to
# engine-order float summation ulps (an assignment flips only on an exact
# distance tie).

_KM_K = 4
_KM_ITERS = 3


def kmeans_assignments(sf_dir: str, keep_embedding: bool = False,
                       emb_ds=None):
    """Distributed Lloyd k-means over the embeddings table → assignment
    Dataset (vec_id, cluster_id [, embedding]). Shared by the
    ``kmeans_embed`` oracle entry and the SemDeDup tier
    (queries_quality.py), which needs the vectors co-located with their
    cluster label so its within-cluster prune never pays a payload join.
    ``emb_ds`` overrides the input Dataset (same (vec_id, embedding)
    schema) — semdedup feeds its planted derived corpus through here."""
    import ray
    import ray.data as rd

    from .queries import _read

    if emb_ds is None:
        emb_ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    emb_refs = emb_ds.to_arrow_refs()

    def _mat(t: pa.Table):
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        e = t["embedding"].combine_chunks()
        v = np.asarray(e.values, dtype=np.float64).reshape(len(t), -1)
        return ids, v

    def _init(*tables):
        live = [x for x in tables if x.num_columns]
        t = pa.concat_tables(live, promote_options="none")
        ids, v = _mat(t)
        order = np.argsort(ids)[:_KM_K]
        return v[order]  # cluster c = c-th smallest vec_id

    init = ray.remote(num_cpus=1)(_init)
    cent_ref = init.remote(*emb_refs)

    def partial(t: pa.Table, *, ref) -> pa.Table:
        cent = ray.get(ref)
        if not t.num_columns:
            return pa.table({"cluster": pa.array([], pa.int64()),
                             "s": pa.array([], pa.list_(pa.float64())),
                             "n": pa.array([], pa.int64())})
        _, v = _mat(t)
        d = ((v[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d, axis=1)  # ties -> lowest cluster
        k, dim = cent.shape
        sums = np.zeros((k, dim))
        np.add.at(sums, a, v)
        cnt = np.bincount(a, minlength=k).astype(np.int64)
        return pa.table({
            "cluster": pa.array(np.arange(k, dtype=np.int64), pa.int64()),
            "s": pa.array(list(sums), pa.list_(pa.float64())),
            "n": pa.array(cnt, pa.int64()),
        })

    def _step(cent, *parts):
        k, dim = cent.shape
        sums = np.zeros((k, dim))
        cnt = np.zeros(k, np.int64)
        for p in parts:
            if p.num_columns and len(p):
                c = p["cluster"].to_numpy(zero_copy_only=False)
                s = np.asarray(p["s"].combine_chunks().values,
                               dtype=np.float64).reshape(len(p), dim)
                np.add.at(sums, c, s)
                cnt += np.bincount(c, weights=p["n"].to_numpy(
                    zero_copy_only=False), minlength=k).astype(np.int64)
        new = cent.copy()
        live = cnt > 0
        new[live] = sums[live] / cnt[live, None]  # empty keeps old centroid
        return new

    step = ray.remote(num_cpus=1)(_step)
    for _ in range(_KM_ITERS):
        parts = rd.from_arrow_refs(emb_refs).map_batches(
            partial, batch_format="pyarrow", fn_kwargs={"ref": cent_ref})
        cent_ref = step.remote(cent_ref, *parts.to_arrow_refs())

    def assign(t: pa.Table, *, ref) -> pa.Table:
        cent = ray.get(ref)
        ids, v = _mat(t)
        d = ((v[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        cols = {"vec_id": pa.array(ids, pa.int64()),
                "cluster_id": pa.array(np.argmin(d, axis=1).astype(np.int64),
                                       pa.int64())}
        if keep_embedding:
            cols["embedding"] = t["embedding"]
        return pa.table(cols)

    return rd.from_arrow_refs(emb_refs).map_batches(
        assign, batch_format="pyarrow", fn_kwargs={"ref": cent_ref})


def q_kmeans_embed(sf_dir: str):
    return kmeans_assignments(sf_dir)


def _sql_kmeans(source: str = "embeddings") -> str:
    """Unrolled Lloyd iterations generated from the same constants; the
    embedding lists are unnested once to (vec_id, pos, val) rows.
    ``source`` names the (vec_id, embedding) relation — the semdedup oracle
    (queries_quality.py) points it at a derived planted-corpus CTE."""
    # DuckDB 1.0: no WITH ORDINALITY / lateral generate_series — index the
    # list with a fixed-range series guarded by len()
    head = f"""
WITH ev AS (SELECT vec_id, i.i - 1 AS pos, embedding[i.i]::DOUBLE AS val
            FROM {source}, generate_series(1, 64) i(i)
            WHERE i.i <= len(embedding)),
init AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cluster
         FROM {source} ORDER BY vec_id LIMIT {_KM_K}),
c1 AS (SELECT i.cluster, ev.pos, ev.val FROM init i
       JOIN ev ON i.vec_id = ev.vec_id)"""
    body = ""
    for i in range(1, _KM_ITERS + 1):
        body += f""",
d{i} AS (SELECT ev.vec_id, c.cluster, sum((ev.val - c.val) ^ 2) AS d
         FROM ev JOIN c{i} c ON ev.pos = c.pos
         GROUP BY ev.vec_id, c.cluster),
a{i} AS (SELECT vec_id, cluster FROM (
           SELECT vec_id, cluster,
                  row_number() OVER (PARTITION BY vec_id
                                     ORDER BY d, cluster) AS rn
           FROM d{i}) WHERE rn = 1),
cn{i} AS (SELECT a.cluster, ev.pos, avg(ev.val) AS val
          FROM a{i} a JOIN ev ON a.vec_id = ev.vec_id
          GROUP BY a.cluster, ev.pos),
c{i + 1} AS (SELECT o.cluster, o.pos, coalesce(n.val, o.val) AS val
             FROM c{i} o LEFT JOIN cn{i} n
               ON o.cluster = n.cluster AND o.pos = n.pos)"""
    last = _KM_ITERS + 1
    return head + body + f""",
df AS (SELECT ev.vec_id, c.cluster, sum((ev.val - c.val) ^ 2) AS d
       FROM ev JOIN c{last} c ON ev.pos = c.pos
       GROUP BY ev.vec_id, c.cluster)
SELECT vec_id, cluster AS cluster_id FROM (
  SELECT vec_id, cluster,
         row_number() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
  FROM df) WHERE rn = 1
"""


CORPUS_QUERIES = {
    "longest_repeat": q_longest_repeat,
    "sa_substring_pairs": q_sa_substring_pairs,
    "chunk_passages": q_chunk_passages,
    "kmeans_embed": q_kmeans_embed,
    "vocab_encode": q_vocab_encode,
    "char_entropy": q_char_entropy,
    "pii_redact": q_pii_redact,
    "decontaminate": q_decontaminate,
    "contam_spans": q_contam_spans,
    "line_dedup": q_line_dedup,
    "pack_sequences": q_pack_sequences,
    "domain_stats": q_domain_stats,
    "bloom_delta": q_bloom_delta,
    "lsh_join": q_lsh_join,
    "events_sliding": q_events_sliding,
    "shuffle_rank": q_shuffle_rank,
    "split_assign": q_split_assign,
    "incremental_clusters": q_incremental_clusters,
}

CORPUS_ORACLES = {
    "longest_repeat": SQL_LONGEST_REPEAT,
    "sa_substring_pairs": _sql_sa_substring(),
    "chunk_passages": SQL_CHUNK_PASSAGES,
    "kmeans_embed": _sql_kmeans(),
    "vocab_encode": SQL_VOCAB_ENCODE,
    "char_entropy": SQL_CHAR_ENTROPY,
    "pii_redact": _sql_pii_redact(),
    "decontaminate": SQL_DECONTAMINATE,
    "contam_spans": SQL_CONTAM_SPANS,
    "line_dedup": SQL_LINE_DEDUP,
    "pack_sequences": SQL_PACK_SEQUENCES,
    "domain_stats": _sql_domain_stats(),
    "bloom_delta": SQL_BLOOM_DELTA,
    "lsh_join": SQL_LSH_JOIN,
    "events_sliding": SQL_EVENTS_SLIDING,
    "shuffle_rank": _sql_shuffle_rank(),
    "split_assign": _sql_split_assign(),
    "incremental_clusters": SQL_INCREMENTAL_CLUSTERS,
}

# Merge into the main catalog here too, so the merge happens no matter
# which of the two modules is imported first (see queries.py tail).
from .queries import ORACLES as _MAIN_ORACLES  # noqa: E402
from .queries import QUERIES as _MAIN_QUERIES  # noqa: E402

_MAIN_QUERIES.update(CORPUS_QUERIES)
_MAIN_ORACLES.update(CORPUS_ORACLES)
