"""Cardinality-sketch tier (round 4c): HyperLogLog and KMV (k-minimum
values) approximate distinct counts — the workhorse sketches of 100 TB
pipelines, where exact per-group distinct-counting is a full shuffle of
every key but a sketch is a few hundred bytes per group.

No reference analogue — reference file n/a; these extend the
LLM-training-data surface beyond the reference's scope.

Both sketches hash with the house fmix32 chain (functions/hashing.py:86),
which is exactly replicable in DuckDB BIGINT/HUGEINT arithmetic, so the
oracles pin the ESTIMATES bit-for-bit (modulo the shared 6-decimal
half-up rounding), not just "within error bounds":

- ``hll_distinct`` — HyperLogLog (Flajolet et al. 2007) with p=6 (m=64
  registers), small-range linear-counting correction. Register update is
  a per-batch ``np.maximum.at`` over composite (group, bucket) keys; each
  batch emits at most m pre-aggregated rows per group, so the ONE
  event_type shuffle moves O(m · groups · blocks) 24-byte rows no matter
  how many events stream through. 2^-register sums are dyadic rationals
  with numerator bound 2^33 < 2^53, so they are EXACT in float64 in both
  engines regardless of summation order.
- ``kmv_distinct`` — KMV / bottom-k (Bar-Yossef et al. 2002): keep the k
  smallest distinct hash values per group; estimate (k-1) · 2^32 / h_(k).
  Per-batch partial = k smallest distinct hashes (np.unique is sorted);
  merge in one bounded map_groups. With fewer than k distinct hashes the
  sketch IS the exact distinct count.

Scale notes: both are the canonical partial-combine shape — per-batch
pre-aggregation inside map_batches, one tiny groupby, bounded per-group
fold. At 100 TB the shuffle payload is KB/group; the estimate fold is
O(m) / O(k log k) per group on one task.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import fmix32
from ..functions.normalize import normalize_array
from .queries import _read, _round6_half_up

_HLL_P = 6
_HLL_M = 1 << _HLL_P            # 64 registers
_HLL_W = 32 - _HLL_P            # 26 payload bits
_HLL_SEED = 7
_HLL_ALPHA = 0.709              # alpha_64 (Flajolet et al., fig. 3)

_KMV_K = 64
_KMV_SEED = 7                   # same hash stream as HLL — one pass could
                                # feed both sketches in a fused pipeline


def _hash_events(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(group codes-as-strings, fmix32 hashes) for one events batch."""
    et = np.asarray(t["event_type"].to_numpy(zero_copy_only=False),
                    dtype=object)
    uids = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    return et, fmix32(uids, seed=_HLL_SEED)


def _hll_partial(t: pa.Table) -> pa.Table:
    """Per-batch register partial: max rank per (event_type, bucket).

    rank = W + 1 - bit_length(w) where w is the low-W-bit payload;
    ``np.frexp`` exponents ARE bit_length for integers < 2^53 (exact), and
    frexp(0) = 0 gives the w == 0 ⇒ rank = W + 1 case for free.
    """
    et, h = _hash_events(t)
    bucket = (h >> np.uint64(_HLL_W)).astype(np.int64)
    w = (h & np.uint64((1 << _HLL_W) - 1)).astype(np.int64)
    rank = (_HLL_W + 1) - np.frexp(w.astype(np.float64))[1]

    groups, inv = np.unique(et, return_inverse=True)
    regs = np.zeros(len(groups) * _HLL_M, dtype=np.int64)
    np.maximum.at(regs, inv * _HLL_M + bucket, rank)
    nz = np.nonzero(regs)[0]
    return pa.table({
        "event_type": pa.array(groups[nz // _HLL_M]),
        "bucket": pa.array(nz % _HLL_M, pa.int64()),
        "rank": pa.array(regs[nz], pa.int64()),
    })


def _hll_estimate(g: pa.Table, **_kwargs) -> pa.Table:
    regs = np.zeros(_HLL_M, dtype=np.int64)
    np.maximum.at(regs,
                  g["bucket"].to_numpy(zero_copy_only=False),
                  g["rank"].to_numpy(zero_copy_only=False))
    zeros = int((regs == 0).sum())
    # 2^-r terms are dyadic (denominator ≤ 2^27): exact float64 sum
    den = float(zeros) + float(np.sum(1.0 / (np.int64(1) << regs[regs > 0])))
    raw = (_HLL_ALPHA * float(_HLL_M * _HLL_M)) / den
    if raw <= 2.5 * _HLL_M and zeros > 0:
        est = _HLL_M * np.log(_HLL_M / float(zeros))  # linear counting
    else:
        est = raw
    return pa.table({
        "event_type": pa.array([g["event_type"][0].as_py()]),
        "approx_distinct": pa.array(
            [float(_round6_half_up(np.asarray([est]))[0])], pa.float64()),
    })


def q_hll_distinct(sf_dir: str):
    """HLL approximate distinct user_id per event_type."""
    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    parts = ev.map_batches(_hll_partial, batch_format="pyarrow")
    return parts.groupby("event_type").map_groups(
        _hll_estimate, batch_format="pyarrow")


def _sql_fmix32(col: str, seed: int) -> str:
    """fmix32 over an integer column as nested DuckDB selects (the
    hashing.sql_hash_sample chain, expression form)."""
    h0 = f"(xor({col}, {seed}) % 4294967296)"
    h1 = f"xor({h0}, {h0} >> 16)"
    h2 = f"CAST((CAST({h1} AS HUGEINT) * 2246822507) % 4294967296 AS BIGINT)"
    h3 = f"xor({h2}, {h2} >> 13)"
    h4 = f"CAST((CAST({h3} AS HUGEINT) * 3266489917) % 4294967296 AS BIGINT)"
    return f"CAST(xor({h4}, {h4} >> 16) AS BIGINT)"


SQL_HLL_DISTINCT = f"""
WITH h AS (SELECT event_type, {_sql_fmix32('user_id', _HLL_SEED)} AS hv
           FROM events),
r AS (SELECT event_type, hv // {1 << _HLL_W} AS bucket,
             CASE WHEN hv % {1 << _HLL_W} = 0 THEN {_HLL_W + 1}
                  ELSE {_HLL_W + 1} - length(bin(hv % {1 << _HLL_W})) END
               AS rank
      FROM h),
m AS (SELECT event_type, bucket, max(rank) AS mr
      FROM r GROUP BY event_type, bucket),
s AS (SELECT event_type, count(*) AS present,
             sum(1.0 / CAST(1 << mr AS DOUBLE)) AS ssum
      FROM m GROUP BY event_type),
e AS (SELECT event_type, {_HLL_M} - present AS zeros,
             ({_HLL_ALPHA} * {float(_HLL_M * _HLL_M)})
               / (({_HLL_M} - present) * 1.0 + ssum) AS raw
      FROM s)
SELECT event_type,
  floor(CASE WHEN raw <= {2.5 * _HLL_M} AND zeros > 0
             THEN {_HLL_M} * ln({_HLL_M} / (zeros * 1.0)) ELSE raw END
        * 1000000 + 0.5) / 1000000 AS approx_distinct
FROM e
"""


def _kmv_partial(t: pa.Table) -> pa.Table:
    """Per-batch partial: the k smallest DISTINCT hashes per event_type
    (np.unique on the composite key is sorted, so a stable head-k per
    group falls out of one pass)."""
    et, h = _hash_events(t)
    groups, inv = np.unique(et, return_inverse=True)
    # composite (group, hash) dedup + sort; hashes < 2^32 fit the low bits
    key = inv.astype(np.int64) * (1 << 32) + h.astype(np.int64)
    uk = np.unique(key)
    g = uk >> 32
    # head-k per group: position within group run
    starts = np.searchsorted(g, np.arange(len(groups)))
    pos = np.arange(len(uk)) - starts[g]
    keep = pos < _KMV_K
    return pa.table({
        "event_type": pa.array(groups[g[keep]]),
        "hv": pa.array(uk[keep] & ((1 << 32) - 1), pa.int64()),
    })


def _kmv_estimate(g: pa.Table, **_kwargs) -> pa.Table:
    hv = np.unique(g["hv"].to_numpy(zero_copy_only=False))
    if len(hv) < _KMV_K:
        est = float(len(hv))      # sketch is exact below k
    else:
        hk = float(hv[_KMV_K - 1])
        est = (_KMV_K - 1.0) * 4294967296.0 / hk
    return pa.table({
        "event_type": pa.array([g["event_type"][0].as_py()]),
        "approx_distinct": pa.array(
            [float(_round6_half_up(np.asarray([est]))[0])], pa.float64()),
    })


def q_kmv_distinct(sf_dir: str):
    """KMV / bottom-k approximate distinct user_id per event_type."""
    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    parts = ev.map_batches(_kmv_partial, batch_format="pyarrow")
    return parts.groupby("event_type").map_groups(
        _kmv_estimate, batch_format="pyarrow")


SQL_KMV_DISTINCT = f"""
WITH h AS (SELECT DISTINCT event_type,
                  {_sql_fmix32('user_id', _KMV_SEED)} AS hv
           FROM events),
r AS (SELECT event_type, hv,
             row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
             count(*) OVER (PARTITION BY event_type) AS nd
      FROM h)
SELECT event_type,
  floor(CASE WHEN nd < {_KMV_K} THEN nd * 1.0
             ELSE ({_KMV_K} - 1.0) * 4294967296.0 / hv END
        * 1000000 + 0.5) / 1000000 AS approx_distinct
FROM r
WHERE rn = CASE WHEN nd < {_KMV_K} THEN nd ELSE {_KMV_K} END
"""


# ---------------------------------------------------------------------------
# Count-Min sketch heavy hitters (exact-certified)
# ---------------------------------------------------------------------------

_CMS_D = 4                      # sketch depth (rows)
_CMS_W = 1024                   # sketch width (counters per row)
_CMS_THETA = 0.033              # heavy-hitter threshold (fraction of word
                                # occurrences) — shared with the SQL oracle
_CMS_SEED = 13


def _cms_partial(t: pa.Table) -> pa.Table:
    """One-pass per-batch partial for the CMS heavy-hitter pipeline.

    Emits three kinds of pre-aggregated rows in one union-schema table:
    - ``cms``  — the batch's Count-Min increments, ALREADY folded to at most
      D·(batch vocab) nonzero (row, col) counters;
    - ``cand`` — the batch's locally θ-heavy words. By averaging, a word
      with global frequency ≥ θ·N is ≥ θ-frequent in AT LEAST ONE batch, so
      the union of local candidates is a GUARANTEED superset of the true
      heavy hitters — this is what lets a sketch (which cannot enumerate
      keys) drive an exact top set;
    - ``tot``  — the batch's occurrence count.
    """
    from ..functions.hashing import hash_strings

    norm = normalize_array(t["text"], None, 3)
    words = pc.split_pattern(norm, pattern=" ")
    flat = words.values
    enc = flat.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = enc.dictionary
    v = len(vocab)
    empty_kind = pa.table({"kind": pa.array([], pa.string()),
                           "slot": pa.array([], pa.int64()),
                           "cnt": pa.array([], pa.int64()),
                           "word": pa.array([], pa.string())})
    if v == 0:
        return empty_kind
    cnt = np.bincount(codes, minlength=v).astype(np.int64)
    nonempty = np.asarray(pc.not_equal(vocab, "").to_numpy(zero_copy_only=False))
    cnt = np.where(nonempty, cnt, 0)
    local_total = int(cnt.sum())
    if local_total == 0:
        return empty_kind

    hv = hash_strings(vocab, seed=_CMS_SEED)
    kinds, slots, cnts, wrds = [], [], [], []
    for r in range(_CMS_D):
        col = (fmix32(hv, seed=101 + r) % np.uint64(_CMS_W)).astype(np.int64)
        # fold batch-vocab collisions into counters before emitting
        regs = np.bincount(col, weights=cnt, minlength=_CMS_W).astype(np.int64)
        nz = np.nonzero(regs)[0]
        kinds.append(np.full(len(nz), "cms", dtype=object))
        slots.append(r * _CMS_W + nz)
        cnts.append(regs[nz])
        wrds.append(np.full(len(nz), "", dtype=object))
    heavy = np.nonzero(cnt >= _CMS_THETA * local_total)[0]
    kinds.append(np.full(len(heavy), "cand", dtype=object))
    slots.append(np.zeros(len(heavy), dtype=np.int64))
    cnts.append(np.zeros(len(heavy), dtype=np.int64))
    wrds.append(np.asarray(vocab.take(pa.array(heavy, pa.int64())).to_pylist(),
                           dtype=object))
    kinds.append(np.asarray(["tot"], dtype=object))
    slots.append(np.zeros(1, dtype=np.int64))
    cnts.append(np.asarray([local_total], dtype=np.int64))
    wrds.append(np.asarray([""], dtype=object))
    return pa.table({"kind": pa.array(np.concatenate(kinds), pa.string()),
                     "slot": pa.array(np.concatenate(slots), pa.int64()),
                     "cnt": pa.array(np.concatenate(cnts), pa.int64()),
                     "word": pa.array(np.concatenate(wrds), pa.string())})


def q_cms_heavy_hitters(sf_dir: str):
    """Heavy hitters (words with ≥ θ of all occurrences), CMS-pruned and
    EXACT-certified — the sketch finds and prunes candidates, a second
    counting pass over ONLY the survivors produces exact counts, so the
    output equals the plain GROUP BY/HAVING oracle regardless of sketch
    error (CMS never underestimates ⇒ no true heavy hitter is pruned).

    Shape: pass 1 is one map_batches emitting bounded partials (D·W
    counters + ≤1/θ local candidates + 1 total per batch), materialized
    once (tiny) and folded with one slot-groupby; pass 2 re-reads the
    corpus with the survivor set broadcast and counts exactly via a
    per-batch bincount partial + one word-groupby. At 100 TB the shuffle
    payloads are O(D·W) and O(|survivors|) per block — never the corpus.
    """
    import ray
    from ray.data.aggregate import Sum

    from ..functions.hashing import hash_strings

    parts = _read(sf_dir, "documents", ["text"]) \
        .map_batches(_cms_partial, batch_format="pyarrow").materialize()

    total = parts.filter(expr="kind == 'tot'") \
        .aggregate(Sum("cnt", alias_name="total"))["total"] or 0
    cms_rows = parts.filter(expr="kind == 'cms'") \
        .groupby("slot").aggregate(Sum("cnt", alias_name="n")).take_all()
    cms = np.zeros(_CMS_D * _CMS_W, dtype=np.int64)
    for r in cms_rows:
        cms[r["slot"]] = r["n"]
    cand_words = sorted({r["word"] for r in
                         parts.filter(expr="kind == 'cand'").take_all()})
    cw = pa.array(cand_words, pa.string())
    hv = hash_strings(cw, seed=_CMS_SEED)
    est = np.full(len(cand_words), np.iinfo(np.int64).max, dtype=np.int64)
    for r in range(_CMS_D):
        col = (fmix32(hv, seed=101 + r) % np.uint64(_CMS_W)).astype(np.int64)
        est = np.minimum(est, cms[r * _CMS_W + col])
    survivors = np.asarray(cand_words, dtype=object)[est >= _CMS_THETA * total]
    surv_ref = ray.put(np.sort(survivors))

    def exact_partial(t: pa.Table) -> pa.Table:
        sv = ray.get(surv_ref)
        if len(sv) == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "n_part": pa.array([], pa.int64())})
        norm = normalize_array(t["text"], None, 3)
        flat = np.asarray(pc.split_pattern(norm, pattern=" ")
                          .values.to_numpy(zero_copy_only=False), dtype=object)
        pos = np.minimum(np.searchsorted(sv, flat), len(sv) - 1)
        hit = sv[pos] == flat
        cnt = np.bincount(pos[hit], minlength=len(sv)).astype(np.int64)
        nz = np.nonzero(cnt)[0]
        return pa.table({"word": pa.array(sv[nz], pa.string()),
                         "n_part": pa.array(cnt[nz], pa.int64())})

    exact = _read(sf_dir, "documents", ["text"]) \
        .map_batches(exact_partial, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("n_part", alias_name="n"))
    thresh = _CMS_THETA * total

    def fin(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = n >= thresh
        return pa.table({"word": t["word"].filter(pa.array(keep)),
                         "n": pa.array(n[keep], pa.int64())})

    return exact.map_batches(fin, batch_format="pyarrow")


SQL_CMS_HEAVY_HITTERS = f"""
WITH nm AS (SELECT trim(regexp_replace(regexp_replace(replace(lower(text),
              '-', ' '), '[^a-z0-9 ]+', '', 'g'), ' +', ' ', 'g')) AS norm
            FROM documents),
t AS (SELECT unnest(string_split(norm, ' ')) AS word
      FROM nm WHERE norm <> '')
SELECT word, count(*) AS n FROM t GROUP BY word
HAVING count(*) >= {_CMS_THETA} * (SELECT count(*) FROM t)
"""


SKETCH_QUERIES = {
    "hll_distinct": q_hll_distinct,
    "kmv_distinct": q_kmv_distinct,
    "cms_heavy_hitters": q_cms_heavy_hitters,
}

SKETCH_ORACLES = {
    "hll_distinct": SQL_HLL_DISTINCT,
    "kmv_distinct": SQL_KMV_DISTINCT,
    "cms_heavy_hitters": SQL_CMS_HEAVY_HITTERS,
}

# Merge into the main catalog regardless of import order (the
# queries_corpus/queries_web/queries_quality convention).
from .queries import ORACLES as _MAIN_ORACLES  # noqa: E402
from .queries import QUERIES as _MAIN_QUERIES  # noqa: E402

_MAIN_QUERIES.update(SKETCH_QUERIES)
_MAIN_ORACLES.update(SKETCH_ORACLES)
