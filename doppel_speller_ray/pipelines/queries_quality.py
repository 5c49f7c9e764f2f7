"""Curation-quality tier (round 4b): repetition signals, quality-aware
duplicate-representative selection, SemDeDup, and SimHash-banded near-dup
pair generation — each a Ray Data pipeline with a closed-form DuckDB oracle.

Operators (no reference analogue — reference file n/a; these extend the
LLM-training-data surface the brief asks for beyond the reference's scope):

- ``repetition_signals`` — Gopher-style repetition filters (Rae et al. 2021,
  §A1.1) adapted to the single-line synthetic corpus: duplicate-word-token
  fraction, most-frequent-bigram character coverage, duplicated-bigram
  character coverage, over normalized words.
- ``cluster_representatives`` — exact-dup groups keep the BEST-QUALITY
  member (not min-id): per distinct normalized text, argmax by
  (quality_score desc, doc_id asc). The real-pipeline variant of D1 where
  you keep the cleanest copy instead of the first.
- ``semdedup`` — SemDeDup (Abbas et al. 2023): k-means over embeddings,
  then within each cluster drop any vector that has a LOWER-id neighbour
  with cosine ≥ τ. The k-means stage is the already-oracled distributed
  Lloyd (queries_corpus.kmeans_assignments); the prune is a per-cluster
  map_groups with blockwise GEMM (no n² materialization).
- ``simhash_neardup`` — banded SimHash candidate generation + Hamming ≤ 3
  verification (Manku et al. 2007). 4 bands × 16 bits: any pair within
  Hamming distance 3 shares ≥ 1 intact band (pigeonhole), so recovery of
  exact copies is GUARANTEED — which is what the closed-form oracle pins:
  the corpus is doubled with exact copies (id + offset) and the output is
  restricted to the cross-variant pair of each doc. General (cross-doc)
  pair generation is the same code path (stages/lsh.candidate_pairs) and
  is covered by unit tests with controlled bit flips.

Scale notes: repetition_signals is shuffle-free (per-batch numpy);
cluster_representatives is ONE coarse hash-partition groupby (the
stages/exact.py pattern, collision-checked); semdedup shuffles only
(vec_id, cluster_id, embedding) once on cluster_id — within-cluster cost
is O(|C|²·d) GEMM, bounded by choosing k ∝ n/target_cluster_size (the
SemDeDup paper's own knob); simhash_neardup moves 16 B/doc/band.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DedupConfig
from ..functions.hashing import hash_strings
from ..functions.normalize import normalize_array
from .queries import (
    _PLANTED_OFFSET,
    _QCFG,
    _SQL_NORM,
    SQL_QUALITY,
    _docs,
    _planted_guard,
    _round6_half_up,
    _simhash_values,
)

# ---------------------------------------------------------------------------
# repetition_signals
# ---------------------------------------------------------------------------


def _repetition_batch(t: pa.Table) -> pa.Table:
    """Vectorized per-batch repetition signals over normalized words.

    All grouping is composite-int64-key ``np.unique`` (doc, word-code) /
    (doc, code1, code2) — no per-row Python in the counting. The bigram
    tie-break (max count, then lexicographically smallest (w1, w2)) falls
    out of ``np.unique``'s sorted vocab: ascending code order IS ascending
    word order.
    """
    n_docs = t.num_rows
    zeros = np.zeros(n_docs, dtype=np.float64)
    out = {
        "doc_id": t["doc_id"],
        "dup_word_frac": zeros,
        "top_bigram_frac": zeros.copy(),
        "dup_bigram_frac": zeros.copy(),
    }

    norm = normalize_array(t["text"], _QCFG.max_chars, _QCFG.n_grams)
    wl = pc.split_pattern(norm, " ")
    if isinstance(wl, pa.ChunkedArray):
        wl = wl.combine_chunks()
    offs = wl.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = np.asarray(wl.values, dtype=object)
    r = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(offs))
    # empty norm splits to one '' token — drop empties (mask keeps order)
    tok_len = np.fromiter((len(w) for w in flat), count=len(flat), dtype=np.int64)
    keep = tok_len > 0
    flat, r = flat[keep], r[keep]
    if len(flat) == 0:
        return _finish_repetition(out)

    vocab, codes = np.unique(flat, return_inverse=True)
    V = len(vocab)
    vlen = np.fromiter((len(w) for w in vocab), count=V, dtype=np.int64)
    n_words = np.bincount(r, minlength=n_docs).astype(np.int64)
    tot_chars = np.bincount(r, weights=vlen[codes], minlength=n_docs).astype(np.int64)
    denom_w = np.maximum(n_words, 1).astype(np.float64)
    denom_c = np.maximum(tot_chars, 1).astype(np.float64)

    # duplicate word tokens: tokens whose (doc, word) multiplicity ≥ 2
    key1 = r * V + codes
    uk1, cnt1 = np.unique(key1, return_counts=True)
    m1 = cnt1 >= 2
    dup_tokens = np.bincount((uk1[m1] // V), weights=cnt1[m1].astype(np.float64),
                             minlength=n_docs)
    out["dup_word_frac"] = dup_tokens / denom_w

    # bigrams: adjacent surviving tokens of the same doc
    adj = r[1:] == r[:-1]
    if adj.any():
        b_r, b1, b2 = r[:-1][adj], codes[:-1][adj], codes[1:][adj]
        if n_docs * V * V < (1 << 62):
            key2 = (b_r * V + b1) * V + b2
            uk2, cnt2 = np.unique(key2, return_counts=True)
            u_r, u1, u2 = uk2 // (V * V), (uk2 // V) % V, uk2 % V
        else:  # composite key would overflow int64 — same order, slower
            uk2, cnt2 = np.unique(np.stack([b_r, b1, b2]), axis=1,
                                  return_counts=True)
            u_r, u1, u2 = uk2[0], uk2[1], uk2[2]
        cover = (vlen[u1] + vlen[u2]).astype(np.float64)

        # top bigram per doc: max count, tie → smallest (code1, code2)
        order = np.lexsort((u2, u1, -cnt2, u_r))
        _, first = np.unique(u_r[order], return_index=True)
        top_idx = order[first]
        top = np.zeros(n_docs, dtype=np.float64)
        top[u_r[top_idx]] = cnt2[top_idx] * cover[top_idx]
        out["top_bigram_frac"] = top / denom_c

        m2 = cnt2 >= 2
        dupb = np.bincount(u_r[m2], weights=cnt2[m2] * cover[m2],
                           minlength=n_docs)
        out["dup_bigram_frac"] = dupb / denom_c

    return _finish_repetition(out)


def _finish_repetition(out: dict) -> pa.Table:
    return pa.table({
        "doc_id": out["doc_id"],
        "dup_word_frac": pa.array(_round6_half_up(out["dup_word_frac"]),
                                  pa.float64()),
        "top_bigram_frac": pa.array(_round6_half_up(out["top_bigram_frac"]),
                                    pa.float64()),
        "dup_bigram_frac": pa.array(_round6_half_up(out["dup_bigram_frac"]),
                                    pa.float64()),
    })


def q_repetition_signals(sf_dir: str):
    """Gopher-style repetition signals — shuffle-free map_batches."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _repetition_batch, batch_format="pyarrow")


SQL_REPETITION_SIGNALS = f"""
WITH n AS (SELECT doc_id, {_SQL_NORM} AS norm FROM documents),
t AS (SELECT doc_id,
        list_filter(string_split(norm, ' '), x -> x <> '') AS ws FROM n),
w AS (SELECT doc_id, unnest(ws) AS w FROM t),
stats AS (SELECT doc_id, count(*) AS n_words, sum(length(w)) AS tc
          FROM w GROUP BY doc_id),
wc AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w),
dupw AS (SELECT doc_id, sum(c) AS dup_tokens FROM wc WHERE c >= 2
         GROUP BY doc_id),
big AS (SELECT doc_id, unnest(ws[1:len(ws)-1]) AS w1,
               unnest(ws[2:len(ws)]) AS w2
        FROM t WHERE len(ws) >= 2),
bc AS (SELECT doc_id, w1, w2, count(*) AS c FROM big GROUP BY doc_id, w1, w2),
topb AS (SELECT doc_id, c * (length(w1) + length(w2)) AS cover FROM (
           SELECT doc_id, w1, w2, c,
                  row_number() OVER (PARTITION BY doc_id
                                     ORDER BY c DESC, w1, w2) AS rn
           FROM bc) WHERE rn = 1),
dupb AS (SELECT doc_id, sum(c * (length(w1) + length(w2))) AS cover
         FROM bc WHERE c >= 2 GROUP BY doc_id)
SELECT d.doc_id,
  floor(coalesce(dupw.dup_tokens, 0) * 1.0
        / greatest(coalesce(stats.n_words, 0), 1) * 1000000 + 0.5)
    / 1000000 AS dup_word_frac,
  floor(coalesce(topb.cover, 0) * 1.0
        / greatest(coalesce(stats.tc, 0), 1) * 1000000 + 0.5)
    / 1000000 AS top_bigram_frac,
  floor(coalesce(dupb.cover, 0) * 1.0
        / greatest(coalesce(stats.tc, 0), 1) * 1000000 + 0.5)
    / 1000000 AS dup_bigram_frac
FROM documents d
LEFT JOIN stats ON d.doc_id = stats.doc_id
LEFT JOIN dupw ON d.doc_id = dupw.doc_id
LEFT JOIN topb ON d.doc_id = topb.doc_id
LEFT JOIN dupb ON d.doc_id = dupb.doc_id
"""


# ---------------------------------------------------------------------------
# cluster_representatives — keep the best-quality copy per exact-dup group
# ---------------------------------------------------------------------------


def _rep_quality_partition(group: pa.Table, **_kwargs) -> pa.Table:
    """One coarse partition: per distinct norm text emit (rep_id,
    group_size, quality_score) where rep = argmax(quality desc, doc_id asc).
    Follows stages/exact.exact_rep_partition's run recovery + 64-bit-hash
    collision check (only duplicated texts pay the string compare)."""
    h = group["norm_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    ids = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    qm = group["q_micro"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((ids, -qm, h))
    h_s, ids_s, qm_s = h[order], ids[order], qm[order]
    _, starts, counts = np.unique(h_s, return_index=True, return_counts=True)

    rep_ids = ids_s[starts]
    rep_q = qm_s[starts]
    sizes = counts.astype(np.int64)

    multi = counts > 1
    extra_ids, extra_q, extra_sz = [], [], []
    if multi.any():
        texts = group["norm_text"]
        drop = np.zeros(len(starts), dtype=bool)
        for gi, (s, c) in enumerate(zip(starts[multi], counts[multi])):
            seg_rows = order[s: s + c]
            seg_texts = [texts[int(rr)].as_py() for rr in seg_rows]
            if len(set(seg_texts)) > 1:
                # 64-bit collision: split the run by actual text
                gpos = np.nonzero(multi)[0][gi]
                drop[gpos] = True
                best: dict[str, tuple[int, int, int]] = {}
                for k, txt in enumerate(seg_texts):
                    cand = (qm_s[s + k], ids_s[s + k])
                    if txt not in best:
                        best[txt] = (cand[0], cand[1], 1)
                    else:
                        q0, i0, n0 = best[txt]
                        if (-cand[0], cand[1]) < (-q0, i0):
                            q0, i0 = cand
                        best[txt] = (q0, i0, n0 + 1)
                for q0, i0, n0 in best.values():
                    extra_ids.append(i0)
                    extra_q.append(q0)
                    extra_sz.append(n0)
        if drop.any():
            keep = ~drop
            rep_ids, rep_q, sizes = rep_ids[keep], rep_q[keep], sizes[keep]

    if extra_ids:
        rep_ids = np.concatenate([rep_ids, np.array(extra_ids, np.int64)])
        rep_q = np.concatenate([rep_q, np.array(extra_q, np.int64)])
        sizes = np.concatenate([sizes, np.array(extra_sz, np.int64)])

    return pa.table({
        "rep_id": pa.array(rep_ids, pa.int64()),
        "group_size": pa.array(sizes, pa.int64()),
        "quality_score": pa.array(rep_q.astype(np.float64) / 1e6, pa.float64()),
    })


def q_cluster_representatives(sf_dir: str):
    """Quality-argmax representative per exact-dup group (one coarse
    hash-partition shuffle; strings never leave their partition task).

    Planted derived corpus: each doc gets a twin at ``doc_id + OFFSET``
    with ``'??'`` appended — the normalizer strips non-alnum so the twin's
    NORMALIZED text collides with the base while its raw-text quality
    score differs, so the quality-argmax path genuinely engages at every
    scale factor (the raw sf0.01 gate corpus has zero duplicate texts)."""
    from ..functions.textstats import quality_features
    from ..util import default_task_partitions

    P = default_task_partitions()

    def derive(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        _planted_guard(ids)
        txt = t["text"].combine_chunks()
        twin = pc.binary_join_element_wise(txt, "??", "")
        return pa.table({
            "doc_id": pa.array(np.concatenate([ids, ids + _PLANTED_OFFSET]),
                               pa.int64()),
            "text": pa.concat_arrays([txt, twin.combine_chunks()
                                      if isinstance(twin, pa.ChunkedArray)
                                      else twin]),
        })

    def prep(t: pa.Table) -> pa.Table:
        norm = normalize_array(t["text"], _QCFG.max_chars, _QCFG.n_grams)
        q = quality_features(t["text"])["quality_score"]
        qm = np.floor(np.asarray(q, np.float64) * 1e6 + 0.5).astype(np.int64)
        h = hash_strings(norm, seed=_QCFG.seed)
        return pa.table({
            "doc_id": t["doc_id"],
            "norm_text": norm,
            "norm_hash": pa.array(h.view(np.int64), pa.int64()),
            "q_micro": pa.array(qm, pa.int64()),
            "hpart": pa.array((h % np.uint64(P)).astype(np.int64), pa.int64()),
        })

    both = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        derive, batch_format="pyarrow")
    prepped = both.map_batches(prep, batch_format="pyarrow")
    return prepped.groupby("hpart").map_groups(
        _rep_quality_partition, batch_format="pyarrow")


_SQL_QUALITY_BOTH = SQL_QUALITY.replace("FROM documents", "FROM corpus2")

SQL_CLUSTER_REPRESENTATIVES = f"""
WITH corpus2 AS (SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + {_PLANTED_OFFSET} AS doc_id,
                     text || '??' AS text FROM documents),
q AS ({_SQL_QUALITY_BOTH}),
n AS (SELECT doc_id, {_SQL_NORM} AS norm FROM corpus2),
j AS (SELECT n.doc_id, n.norm, q.quality_score
      FROM n JOIN q ON n.doc_id = q.doc_id),
r AS (SELECT doc_id, quality_score,
        row_number() OVER (PARTITION BY norm
                           ORDER BY quality_score DESC, doc_id) AS rn,
        count(*) OVER (PARTITION BY norm) AS group_size
      FROM j)
SELECT doc_id AS rep_id, group_size, quality_score FROM r WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# semdedup
# ---------------------------------------------------------------------------

_SEM_TAU = 0.98
_SEM_COL_BLOCK = 512  # GEMM column block: |C| × 512 × 8 B ≤ ~50 MB per task
#: Max cluster size fed to the quadratic prune. Inside an oversized
#: k-means cluster, exact-duplicate vectors are first collapsed to their
#: min-id representative CLOSED-FORM (identical nonzero vectors have
#: cosine exactly 1 ≥ τ, so every later copy is removed by the earliest
#: one, and removals are judged against ALL earlier vectors, so pruning
#: the survivors among representatives only is semantics-preserving);
#: the distinct representatives are then recursively 2-means-split on
#: the NORMALIZED rows (the prune's own cosine geometry — co-directional
#: scaled near-dups co-locate) and the quadratic prune runs within
#: leaves — bounding per-cluster compute to O(|C| · cap) FLOPs, the same
#: skew defense as the LSH tier's bucket cap. SemDeDup's own operating
#: assumption is that k scales with the corpus so clusters stay bounded;
#: the split only engages on pathological skew, where the dominant skew
#: driver (mass-duplicated boilerplate) is handled exactly by the
#: closed-form collapse. τ-near-but-distinct pairs falling on opposite
#: sides of a split is the documented approximation of capping. The
#: shared testdata's clusters sit far below the cap, so the SQL oracle's
#: exact semantics are untouched there.
_SEM_MAX_CLUSTER = 4096


def _split_leaves(mat: np.ndarray, idx: np.ndarray, cap: int) -> list:
    """Deterministic recursive 2-means split of rows ``idx`` (positions
    into ``mat`` — pass the NORMALIZED matrix so the split geometry
    matches the cosine prune; rows already min-id-first sorted) into
    leaves of ≤ cap.

    Seeding is data-deterministic: centroid A = the first row (lowest
    vec_id), centroid B = the row farthest from A; assignment by nearer
    centroid with ties going to A's side. One Lloyd refinement step
    sharpens the halves; a degenerate split (all rows one side — only
    reachable through pathological tie geometry once exact duplicates
    are pre-collapsed by the caller) falls back to an ordered halving so
    recursion always terminates."""
    if len(idx) <= cap:
        return [idx]
    sub = mat[idx]
    d_a = ((sub - sub[0]) ** 2).sum(axis=1)
    b = int(np.argmax(d_a))
    ca, cb = sub[0], sub[b]
    for _ in range(2):
        left = ((sub - ca) ** 2).sum(axis=1) <= ((sub - cb) ** 2).sum(axis=1)
        if left.all() or not left.any():
            break
        ca, cb = sub[left].mean(axis=0), sub[~left].mean(axis=0)
    if left.all() or not left.any():
        mid = len(idx) // 2
        return (_split_leaves(mat, idx[:mid], cap)
                + _split_leaves(mat, idx[mid:], cap))
    return (_split_leaves(mat, idx[left], cap)
            + _split_leaves(mat, idx[~left], cap))


def _prune_leaf(matn: np.ndarray, removed: np.ndarray,
                leaf: np.ndarray) -> None:
    """Min-id prune within one leaf: mark row b removed iff ∃ a earlier in
    the (id-sorted) leaf with cosine ≥ τ. Blockwise GEMM over column
    blocks so the similarity matrix is never materialized at |leaf|²."""
    sub = matn[leaf]
    n = len(leaf)
    row_idx = np.arange(n)
    for lo in range(0, n, _SEM_COL_BLOCK):
        hi = min(lo + _SEM_COL_BLOCK, n)
        sims = sub @ sub[lo:hi].T                         # (n, hi-lo)
        earlier = row_idx[:, None] < np.arange(lo, hi)[None, :]
        removed[leaf[lo:hi]] = ((sims >= _SEM_TAU) & earlier).any(axis=0)


def _semdedup_prune(group: pa.Table, **_kwargs) -> pa.Table:
    """Within one k-means cluster: drop vec b iff ∃ a < b (by vec_id) in the
    cluster with cosine(a, b) ≥ τ — the deterministic min-id variant of
    SemDeDup's per-cluster prune. Clusters above _SEM_MAX_CLUSTER are
    recursively 2-means-split first (see _split_leaves) so per-cluster
    compute stays O(|C| · cap)."""
    ids = group["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    emb = group["embedding"].combine_chunks()
    mat = np.asarray(emb.values, dtype=np.float64).reshape(len(group), -1)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    n = len(ids)
    norms = np.linalg.norm(mat, axis=1)
    matn = mat / np.where(norms == 0, 1, norms)[:, None]

    removed = np.zeros(n, dtype=bool)
    if n <= _SEM_MAX_CLUSTER:
        _prune_leaf(matn, removed, np.arange(n))
    else:
        # Oversized cluster. 1) Collapse exact-duplicate vectors closed-
        # form: a later copy of a NONZERO vector has cosine exactly 1
        # with its earliest copy → removed (a zero vector has cosine 0
        # with everything → never removed and never removes); survivors
        # among the distinct representatives are decided by earlier
        # vectors, of which the min-id copy is the strictest, so pruning
        # representatives only preserves the uncapped semantics exactly
        # for the skew case that matters (mass-duplicated rows).
        _, first, inverse = np.unique(mat, axis=0, return_index=True,
                                      return_inverse=True)
        rep_pos = first[inverse]           # min-id copy of each row
        nonzero = norms > 0
        removed = (np.arange(n) != rep_pos) & nonzero
        reps = np.flatnonzero(np.arange(n) == rep_pos)
        # 2) Split the distinct representatives on the NORMALIZED rows
        # (the prune's cosine geometry) and prune within leaves.
        for leaf in _split_leaves(matn, reps, _SEM_MAX_CLUSTER):
            _prune_leaf(matn, removed, leaf)

    cid = group["cluster_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "cluster_id": pa.array(cid[order], pa.int64()),
        "keep": pa.array(~removed, pa.bool_()),
    })


def q_semdedup(sf_dir: str):
    """SemDeDup: k-means (distributed Lloyd, oracled as kmeans_embed) then
    within-cluster cosine prune. One shuffle on cluster_id; the vectors ride
    with their label (kmeans_assignments keep_embedding=True), so the prune
    needs no payload join.

    Planted derived corpus: every vector gets an exact copy at
    ``vec_id + OFFSET``. A copy is co-assigned with its base (identical
    distances) and the doubled multiset leaves the Lloyd centroids
    unchanged (sums AND counts double), so the removal path engages on
    every copy (cosine exactly 1 ≥ τ against a lower id) while every base
    survives — the raw gate corpus has no pair within τ."""
    from .queries import _read
    from .queries_corpus import kmeans_assignments

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def derive(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        _planted_guard(ids)
        e = t["embedding"].combine_chunks()
        return pa.table({
            "vec_id": pa.array(np.concatenate([ids, ids + _PLANTED_OFFSET]),
                               pa.int64()),
            "embedding": pa.concat_arrays([e, e]),
        })

    both = emb.map_batches(derive, batch_format="pyarrow")
    assign = kmeans_assignments(sf_dir, keep_embedding=True, emb_ds=both)
    return assign.groupby("cluster_id").map_groups(
        _semdedup_prune, batch_format="pyarrow")


def _sql_semdedup() -> str:
    from .queries_corpus import _sql_kmeans

    return f"""
WITH src AS (SELECT vec_id, embedding FROM embeddings
             UNION ALL
             SELECT vec_id + {_PLANTED_OFFSET} AS vec_id, embedding
             FROM embeddings),
a AS ({_sql_kmeans(source="src")}),
j AS (SELECT a.vec_id, a.cluster_id, s.embedding
      FROM a JOIN src s ON a.vec_id = s.vec_id)
SELECT j.vec_id, j.cluster_id,
  NOT EXISTS (SELECT 1 FROM j j2
              WHERE j2.cluster_id = j.cluster_id AND j2.vec_id < j.vec_id
                AND list_cosine_similarity(j2.embedding, j.embedding)
                      >= {_SEM_TAU}) AS keep
FROM j
"""


# ---------------------------------------------------------------------------
# simhash_neardup
# ---------------------------------------------------------------------------

# max_bucket_size deliberately huge: the oracle pins EXACT recovery of every
# planted copy pair, so bucket chaining (which only guarantees recovery
# transitively, through connected components) must not engage. The engine
# default (64/chained) is the 100-TB path — covered by the flagship dedup
# pipeline's oracle, which DOES run CC after pairing.
_SIMNN_CFG = DedupConfig(max_chars=None, simhash_max_hamming=3,
                         max_bucket_size=100_000)
_SIMNN_BANDS = 4  # 4 × 16 bits: Hamming ≤ 3 ⇒ one band intact (pigeonhole)


def q_simhash_neardup(sf_dir: str):
    """Banded SimHash near-dup pairs over the doubled corpus, restricted to
    each doc's cross-variant pair (exact copy ⇒ Hamming 0 ⇒ guaranteed
    recovery — the closed-form oracle). Cross-doc pairs from the same
    machinery are exercised by unit tests with controlled bit flips."""
    from ..functions.simhash import simhash_band_keys
    from ..stages.lsh import candidate_pairs

    base = _docs(sf_dir, ["doc_id", "text"])

    def derive(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        _planted_guard(ids)
        return pa.table({
            "doc_id": pa.array(np.concatenate([ids, ids + _PLANTED_OFFSET]),
                               pa.int64()),
            "text": pa.concat_arrays([t["text"].combine_chunks(),
                                      t["text"].combine_chunks()]),
        })

    both = base.map_batches(derive, batch_format="pyarrow")

    def band(t: pa.Table) -> pa.Table:
        sim = _simhash_values(t)
        keys = simhash_band_keys(sim, bands=_SIMNN_BANDS, seed=_QCFG.seed)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, _SIMNN_BANDS), pa.int64()),
            "bucket": pa.array(keys.reshape(-1).view(np.int64), pa.int64()),
            "simhash": pa.array(np.repeat(sim, _SIMNN_BANDS).view(np.int64),
                                pa.int64()),
        })

    bands = both.map_batches(band, batch_format="pyarrow")
    pairs = candidate_pairs(bands, _SIMNN_CFG)

    def cross_variant(t: pa.Table) -> pa.Table:
        left = t["left_id"].to_numpy(zero_copy_only=False)
        right = t["right_id"].to_numpy(zero_copy_only=False)
        keep = (right - left == _PLANTED_OFFSET) & (left < _PLANTED_OFFSET)
        return pa.table({"left_id": pa.array(left[keep], pa.int64()),
                         "right_id": pa.array(right[keep], pa.int64())})

    return pairs.map_batches(cross_variant, batch_format="pyarrow")


SQL_SIMHASH_NEARDUP = f"""
SELECT doc_id AS left_id, doc_id + {_PLANTED_OFFSET} AS right_id
FROM documents
"""


QUALITY_QUERIES = {
    "repetition_signals": q_repetition_signals,
    "cluster_representatives": q_cluster_representatives,
    "semdedup": q_semdedup,
    "simhash_neardup": q_simhash_neardup,
}

QUALITY_ORACLES = {
    "repetition_signals": SQL_REPETITION_SIGNALS,
    "cluster_representatives": SQL_CLUSTER_REPRESENTATIVES,
    "semdedup": _sql_semdedup(),
    "simhash_neardup": SQL_SIMHASH_NEARDUP,
}

# Merge into the main catalog regardless of import order (the
# queries_corpus/queries_web convention).
from .queries import ORACLES as _MAIN_ORACLES  # noqa: E402
from .queries import QUERIES as _MAIN_QUERIES  # noqa: E402

_MAIN_QUERIES.update(QUALITY_QUERIES)
_MAIN_ORACLES.update(QUALITY_ORACLES)
