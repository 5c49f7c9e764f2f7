"""Cross-document suffix-array substring pairs (north_star's "suffix-array
substring stage"; Lee et al. 2022 shard-level suffix arrays).

Finds all doc pairs within a hash partition sharing a common substring of
length ≥ ``min_len``, EXACTLY, from one partition-level suffix array:

1. Each partition concatenates its (capped) texts with a sentinel byte
   after each doc and builds ONE suffix array + Kasai LCP
   (`functions/suffixes.py`).
2. Only suffixes with ≥ min_len chars remaining INSIDE their own doc
   participate. This filter is what makes a single shared sentinel exact:
   a kept suffix's first min_len bytes lie wholly inside its doc, so an
   LCP ≥ min_len between two kept suffixes certifies a genuine shared
   min_len-gram — sentinel-inflated matches can only involve filtered
   suffixes.
3. Kept suffixes are walked in rank order; pairwise LCP between kept
   neighbours is the min of the raw LCPs over the skipped range
   (np.minimum.reduceat). Maximal runs with neighbour-LCP ≥ min_len are
   exactly the groups of suffixes sharing a min_len-prefix, so the distinct
   docs of a run pairwise share a substring of length ≥ min_len.
4. Runs whose distinct-doc count exceeds ``max_run_docs`` (boilerplate
   substrings) emit only the capped prefix of their doc set and COUNT the
   truncation (the containment tier's DropCounter discipline — no silent
   recall loss); pairs are deduplicated per partition (a pair can share
   many substrings), and partitions are disjoint by construction
   (both endpoints live in ``doc_id % num_parts``).

Scale shape: the only shuffle is the partition groupby; per-partition
memory is O(docs_per_partition × cap) bytes for the concat plus the
integer SA arrays — on a real corpus ``num_parts`` is sized so a
partition's concat fits a worker heap, exactly like the exact-dedup tier's
hash partitions. Cross-partition pairs are out of scope by the same
partition-locality contract the containment tier documents; winnowing
(`stages/containment.py`) is the cross-partition candidate router.
The reference has no suffix-array analogue (its substring logic is the
title-containment heuristic, match_maker.py:16-71).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.suffixes import lcp_array, suffix_array

#: defaults shared with the SQL oracle (queries_corpus.SQL_SA_SUBSTRING)
SA_CAP = 192
SA_MIN_LEN = 24
SA_PARTS = 8


def sa_pairs_partition(group: pa.Table, *, min_len: int = SA_MIN_LEN,
                       cap: int = SA_CAP, max_run_docs: int = 256,
                       id_col: str = "doc_id",
                       text_col: str = "norm_text") -> pa.Table:
    """One partition's exact shared-substring pairs from one suffix array."""
    ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    texts = [t[:cap].encode("utf-8") for t in group[text_col].to_pylist()]
    lens = np.array([len(t) for t in texts], dtype=np.int64)
    n_docs = len(ids)
    empty = pa.table({"left_id": pa.array([], pa.int64()),
                      "right_id": pa.array([], pa.int64()),
                      "n_capped_runs": pa.array([], pa.int64())})
    if n_docs < 2 or not (lens >= min_len).any():
        return empty

    # concat with one sentinel byte per boundary (0xFF > any utf-8 ascii
    # norm byte; exactness argument in the module docstring)
    buf = bytearray()
    starts = np.empty(n_docs, np.int64)
    for i, t in enumerate(texts):
        starts[i] = len(buf)
        buf += t
        buf += b"\xff"
    s = np.frombuffer(bytes(buf), dtype=np.uint8)
    n = len(s)

    pos_doc = np.repeat(np.arange(n_docs, dtype=np.int64), lens + 1)
    ends = starts + lens  # doc text end (sentinel position)
    remaining = ends[pos_doc] - np.arange(n, dtype=np.int64)

    sa = suffix_array(s)
    lcp = lcp_array(s, sa)

    keep = remaining[sa] >= min_len  # in rank order
    kept_ranks = np.flatnonzero(keep)
    if len(kept_ranks) < 2:
        return empty
    # pairwise LCP between kept neighbours: min of lcp over the skipped
    # rank gap (lcp[r] covers (r-1, r); the gap for kept pair (k_i, k_{i+1})
    # is lcp[k_i+1 .. k_{i+1}])
    # reduceat segments are [kept_ranks[i]+1, kept_ranks[i+1]+1); the
    # appended 0 sentinel makes the final synthetic segment valid, then
    # it is dropped
    seg_starts = kept_ranks[:-1] + 1
    neigh = np.minimum.reduceat(
        np.append(lcp, np.int64(0)),
        np.concatenate([seg_starts, [kept_ranks[-1] + 1]]))[:-1]

    kept_docs = pos_doc[sa[kept_ranks]]
    run_break = np.concatenate([[True], neigh < min_len])
    run_id = np.cumsum(run_break) - 1

    pairs_l, pairs_r = [], []
    n_capped = 0
    order = np.lexsort((kept_docs, run_id))
    rid_sorted = run_id[order]
    docs_sorted = kept_docs[order]
    # unique (run, doc) then group by run
    first = np.concatenate([[True], (rid_sorted[1:] != rid_sorted[:-1])
                            | (docs_sorted[1:] != docs_sorted[:-1])])
    rid_u, docs_u = rid_sorted[first], docs_sorted[first]
    run_starts = np.flatnonzero(
        np.concatenate([[True], rid_u[1:] != rid_u[:-1]]))
    run_ends = np.append(run_starts[1:], len(rid_u))
    for a, b in zip(run_starts, run_ends):
        d = docs_u[a:b]
        if len(d) < 2:
            continue
        if len(d) > max_run_docs:
            n_capped += 1
            d = d[:max_run_docs]
        ii, jj = np.triu_indices(len(d), k=1)
        pairs_l.append(d[ii])
        pairs_r.append(d[jj])
    if not pairs_l:
        return empty
    li = ids[np.concatenate(pairs_l)]
    ri = ids[np.concatenate(pairs_r)]
    lo, hi = np.minimum(li, ri), np.maximum(li, ri)
    packed = np.unique(lo.astype(np.uint64) << np.uint64(32)
                       | hi.astype(np.uint64))
    lo = (packed >> np.uint64(32)).astype(np.int64)
    hi = (packed & np.uint64(0xFFFFFFFF)).astype(np.int64)
    return pa.table({
        "left_id": pa.array(lo, pa.int64()),
        "right_id": pa.array(hi, pa.int64()),
        "n_capped_runs": pa.array(np.full(len(lo), n_capped), pa.int64()),
    })


def sa_substring_pairs(docs_ds, *, min_len: int = SA_MIN_LEN,
                       cap: int = SA_CAP, num_parts: int = SA_PARTS,
                       max_run_docs: int = 256, id_col: str = "doc_id",
                       text_col: str = "norm_text"):
    """Distinct (left_id, right_id) pairs sharing a substring of length
    ≥ min_len within each ``doc_id % num_parts`` partition."""

    def add_part(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("spart", pa.array(ids % num_parts, pa.int64()))

    def run_part(t: pa.Table) -> pa.Table:
        out = sa_pairs_partition(t, min_len=min_len, cap=cap,
                                 max_run_docs=max_run_docs, id_col=id_col,
                                 text_col=text_col)
        return out.select(["left_id", "right_id"])

    return docs_ds.map_batches(add_part, batch_format="pyarrow") \
        .groupby("spart").map_groups(run_part, batch_format="pyarrow")
