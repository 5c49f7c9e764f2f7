"""Tokenizer-training tier: distributed BPE merge learning.

``bpe_train`` learns the top-M byte-pair-encoding merges over the corpus
word table — the data-side half of training a BPE tokenizer (the other
half, applying a FIXED merge table, is ``bpe_tokens`` in queries.py).
No reference analogue (the reference has no tokenizer training); this is
a beyond-reference LLM-pipeline operator in the SURVEY §2.11 tier.

Algorithm (classic BPE, Sennrich et al. 2016 "Neural Machine Translation
of Rare Words with Subword Units", pure public knowledge):

1. word-frequency table over the normalized corpus (occurrences, not DF) —
   per-batch partial counts, then ONE (word) groupby-sum;
2. per merge round: count adjacent symbol pairs weighted by word frequency
   (OVERLAPPING occurrences: 'aaa' contributes (a,a) twice), pick the
   globally most frequent pair (ties: lexicographically smallest
   (left,right) symbol strings), and apply the merge greedily left-to-right
   within each word (in a same-symbol run 'aaa', greedy pairs positions
   0-1 and leaves 2 — the run-parity rule below).

Scale shape (the kmeans_embed / pagerank pattern): the word table's blocks
are pinned as object-store refs ONCE; each round re-maps the SAME refs with
the (tiny) merges-so-far list shipped in the task spec, producing per-block
pair-count partials whose cardinality is bounded by the symbol-pair
vocabulary — ONE combine task folds them in the object store and returns
only the winning pair. The driver holds O(M) state (the merge list); the
word table itself never re-shuffles after the initial word groupby, and at
10^12 docs the word table is the distinct-word set (Heaps' law: orders of
magnitude smaller than the corpus), hash-partitioned by word.

Symbols are tracked as integer ids (base chars = byte value; merge k mints
id 256+k globally, identically in every task), so the per-block kernels are
pure numpy over flattened (sym, word_id) arrays — no Python loop over
words. The SQL oracle unrolls the M rounds as CTEs (the kmeans pattern)
with the same run-parity greedy application; output columns are strings and
integers, so the cross-engine comparison is exact (no float rounding rule
needed).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_BPE_ROUNDS = 3
_BPE_MAX_WORD = 32  # bound the SQL unnest and skip degenerate mega-"words"


# ---------------------------------------------------------------------------
# numpy kernels over flattened (sym_id, word_id) arrays
# ---------------------------------------------------------------------------

def _explode_words(words: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Flatten an ascii string array to (sym_ids int32, word_ids int64)
    zero-copy from the Arrow buffers (norm text is [a-z0-9 ] by
    construction, so bytes == chars)."""
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    if pa.types.is_large_string(words.type):
        words = words.cast(pa.string())
    n = len(words)
    if n == 0:
        return (np.empty(0, np.int32), np.empty(0, np.int64))
    off = np.frombuffer(words.buffers()[1], dtype=np.int32)[
        words.offset:words.offset + n + 1]
    data = np.frombuffer(words.buffers()[2], dtype=np.uint8)
    syms = data[off[0]:off[-1]].astype(np.int32)
    lens = np.diff(off).astype(np.int64)
    wid = np.repeat(np.arange(n, dtype=np.int64), lens)
    return syms, wid


def apply_merge(syms: np.ndarray, wid: np.ndarray,
                a: int, b: int, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Greedy left-to-right application of merge (a,b)->m within words.

    Adjacent match positions p, p+1 can only both occur when a == b (a
    same-symbol run); greedy keeps every other match from the start of
    each run — 'aaaa' pairs (0,1) and (2,3), 'aaa' pairs (0,1) only.
    """
    if syms.size < 2:
        return syms, wid
    match = (syms[:-1] == a) & (syms[1:] == b) & (wid[:-1] == wid[1:])
    idx = np.flatnonzero(match)
    if idx.size == 0:
        return syms, wid
    if a == b:
        # runs of consecutive match positions -> keep even offsets in-run
        breaks = idx - np.arange(idx.size, dtype=idx.dtype)
        is_start = np.empty(idx.size, dtype=bool)
        is_start[0] = True
        is_start[1:] = breaks[1:] != breaks[:-1]
        run_first = idx[is_start][np.cumsum(is_start) - 1]
        idx = idx[((idx - run_first) % 2) == 0]
    keep = np.ones(syms.size, dtype=bool)
    keep[idx + 1] = False
    out = syms.copy()
    out[idx] = m
    return out[keep], wid[keep]


def pair_counts(syms: np.ndarray, wid: np.ndarray,
                weights: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Weighted adjacent-pair counts (overlapping). ``weights`` is the
    per-WORD frequency, indexed by word_id. Returns (left, right, count)."""
    if syms.size < 2:
        z = np.empty(0, np.int64)
        return z.astype(np.int32), z.astype(np.int32), z
    valid = wid[:-1] == wid[1:]
    left = syms[:-1][valid]
    right = syms[1:][valid]
    w = weights[wid[:-1][valid]]
    key = left.astype(np.int64) << 32 | right.astype(np.int64)
    uk, inv = np.unique(key, return_inverse=True)
    c = np.bincount(inv, weights=w.astype(np.float64))
    return ((uk >> 32).astype(np.int32), (uk & 0xFFFFFFFF).astype(np.int32),
            np.rint(c).astype(np.int64))


def _sym_str(sym_id: int, merges: list[tuple[int, int, int]]) -> str:
    """Resolve a symbol id to its string (base ids are byte values; merge k
    mints id 256+k = concat of its parts). Deterministic everywhere."""
    if sym_id < 256:
        return chr(sym_id)
    a, b, _ = merges[sym_id - 256]
    return _sym_str(a, merges) + _sym_str(b, merges)


# ---------------------------------------------------------------------------
# the distributed trainer
# ---------------------------------------------------------------------------

def bpe_train_merges(sf_dir: str, rounds: int = _BPE_ROUNDS):
    """Learn ``rounds`` BPE merges over the documents word corpus.

    Returns a tiny Dataset (merge_round:int64, left_sym:str, right_sym:str,
    pair_count:int64), one row per learned merge, ordered by round.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.normalize import normalize_array
    from .queries import _QCFG, _docs

    def to_words(t: pa.Table) -> pa.Table:
        """Per-batch partial word counts (one row per distinct word per
        batch, not per occurrence — the word_df combine pattern)."""
        import pyarrow.compute as pc

        # n_grams=0 disables the reference '0'-rjust pad for norms shorter
        # than the shingle width — the word corpus must match _SQL_NORM
        # exactly (a padded '000' word from an empty text would poison the
        # global pair counts, not just its own row).
        norm = normalize_array(t["text"], _QCFG.max_chars, 0)
        nonempty = pc.not_equal(norm, "")
        split = pc.split_pattern(norm.filter(nonempty), " ")
        flat = split.combine_chunks().flatten() if isinstance(
            split, pa.ChunkedArray) else split.flatten()
        ok = pc.and_(pc.not_equal(flat, ""),
                     pc.less_equal(pc.utf8_length(flat), _BPE_MAX_WORD))
        flat = flat.filter(ok)
        agg = pa.table({"word": flat}).group_by("word").aggregate(
            [("word", "count")])
        return pa.table({"word": agg["word"],
                         "cnt": agg["word_count"].cast(pa.int64())})

    wf = (_docs(sf_dir, ["text"])
          .map_batches(to_words, batch_format="pyarrow")
          .groupby("word").aggregate(Sum("cnt", alias_name="cnt")))
    wf_refs = wf.to_arrow_refs()

    def partial(t: pa.Table, *, merges) -> pa.Table:
        empty = pa.table({"l": pa.array([], pa.int32()),
                          "r": pa.array([], pa.int32()),
                          "c": pa.array([], pa.int64())})
        if not t.num_columns or not len(t):
            return empty
        syms, wid = _explode_words(t["word"])
        for a, b, m in merges:
            syms, wid = apply_merge(syms, wid, a, b, m)
        weights = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        left, right, c = pair_counts(syms, wid, weights)
        if not left.size:
            return empty
        return pa.table({"l": pa.array(left, pa.int32()),
                         "r": pa.array(right, pa.int32()),
                         "c": pa.array(c, pa.int64())})

    def _fold_best(merges, *parts):
        """Fold per-block partials; return the argmax pair (c desc, then
        lexicographically smallest (left_str, right_str)) or None."""
        keys, cnts = [], []
        for p in parts:
            if p.num_columns and len(p):
                left = p["l"].to_numpy(zero_copy_only=False).astype(np.int64)
                right = p["r"].to_numpy(zero_copy_only=False).astype(np.int64)
                keys.append(left << 32 | right)
                cnts.append(p["c"].to_numpy(zero_copy_only=False))
        if not keys:
            return None
        key = np.concatenate(keys)
        cnt = np.concatenate(cnts)
        uk, inv = np.unique(key, return_inverse=True)
        tot = np.bincount(inv, weights=cnt.astype(np.float64)).astype(np.int64)
        best = tot.max()
        cand = uk[tot == best]
        # ties: smallest (left_str, right_str) under STRING order (id order
        # differs: 'aa' (id>=256) sorts before 'z' (id 122) as a string)
        pairs = [((int(k) >> 32), int(k) & 0xFFFFFFFF) for k in cand]
        a, b = min(pairs, key=lambda p: (_sym_str(p[0], merges),
                                         _sym_str(p[1], merges)))
        return int(a), int(b), int(best)

    fold_best = ray.remote(num_cpus=1)(_fold_best)

    merges: list[tuple[int, int, int]] = []
    out_rows = []
    for rnd in range(1, rounds + 1):
        parts = rd.from_arrow_refs(wf_refs).map_batches(
            partial, batch_format="pyarrow", fn_kwargs={"merges": merges})
        best = ray.get(fold_best.remote(merges, *parts.to_arrow_refs()))
        if best is None:
            break
        a, b, c = best
        out_rows.append((rnd, _sym_str(a, merges), _sym_str(b, merges), c))
        merges.append((a, b, 256 + len(merges)))

    result = pa.table({
        "merge_round": pa.array([r[0] for r in out_rows], pa.int64()),
        "left_sym": pa.array([r[1] for r in out_rows], pa.string()),
        "right_sym": pa.array([r[2] for r in out_rows], pa.string()),
        "pair_count": pa.array([r[3] for r in out_rows], pa.int64()),
    })
    return rd.from_arrow(result)


def q_bpe_train(sf_dir: str):
    return bpe_train_merges(sf_dir)


# ---------------------------------------------------------------------------
# SQL oracle: M rounds unrolled as CTEs (the kmeans/pagerank oracle pattern)
# with the same overlapping pair counts, string tie-break, and run-parity
# greedy merge application.
# ---------------------------------------------------------------------------

def _sql_bpe_train(rounds: int = _BPE_ROUNDS) -> str:
    from .queries import _SQL_NORM

    head = f"""
WITH nrm AS (SELECT {_SQL_NORM} AS norm FROM documents),
w0 AS (SELECT unnest(string_split(norm, ' ')) AS word FROM nrm
       WHERE norm <> ''),
wf AS (SELECT word, count(*)::BIGINT AS cnt FROM w0
       WHERE word <> '' AND length(word) <= {_BPE_MAX_WORD} GROUP BY word),
wi AS (SELECT word, cnt, row_number() OVER (ORDER BY word) AS word_id
       FROM wf),
s1 AS (SELECT word_id, i.i - 1 AS pos, substr(word, i.i, 1) AS sym, cnt
       FROM wi, generate_series(1, {_BPE_MAX_WORD}) i(i)
       WHERE i.i <= length(word))"""
    body = ""
    for i in range(1, rounds + 1):
        body += f""",
pc{i} AS (SELECT x.sym AS ls, y.sym AS rs, sum(x.cnt) AS c
          FROM s{i} x JOIN s{i} y
            ON x.word_id = y.word_id AND y.pos = x.pos + 1
          GROUP BY 1, 2),
b{i} AS (SELECT ls, rs, c FROM pc{i} ORDER BY c DESC, ls, rs LIMIT 1),
m{i} AS (SELECT x.word_id, x.pos FROM s{i} x
         JOIN s{i} y ON x.word_id = y.word_id AND y.pos = x.pos + 1
         JOIN b{i} b ON x.sym = b.ls AND y.sym = b.rs),
k{i} AS (SELECT word_id, pos FROM (
           SELECT word_id, pos,
                  min(pos) OVER (PARTITION BY word_id, pos - rn)
                    AS run_first
           FROM (SELECT word_id, pos,
                        row_number() OVER (PARTITION BY word_id
                                           ORDER BY pos) AS rn
                 FROM m{i}))
         WHERE (pos - run_first) % 2 = 0),
s{i + 1} AS (SELECT word_id,
                    row_number() OVER (PARTITION BY word_id
                                       ORDER BY pos) - 1 AS pos,
                    sym, cnt
             FROM (
               SELECT x.word_id, x.pos,
                      CASE WHEN k.pos IS NOT NULL THEN x.sym || y.sym
                           ELSE x.sym END AS sym,
                      x.cnt
               FROM s{i} x
               LEFT JOIN k{i} k
                 ON x.word_id = k.word_id AND x.pos = k.pos
               LEFT JOIN s{i} y
                 ON x.word_id = y.word_id AND y.pos = x.pos + 1
               LEFT JOIN k{i} kp
                 ON x.word_id = kp.word_id AND x.pos = kp.pos + 1
               WHERE kp.pos IS NULL))"""
    selects = [
        f"SELECT {i}::BIGINT AS merge_round, ls AS left_sym, rs AS right_sym, "
        f"c::BIGINT AS pair_count FROM b{i}"
        for i in range(1, rounds + 1)
    ]
    return head + body + "\n" + "\nUNION ALL ".join(selects)


TOKENIZER_QUERIES = {
    "bpe_train": q_bpe_train,
}

TOKENIZER_ORACLES = {
    "bpe_train": _sql_bpe_train(),
}
