"""Incremental (delta-ingest) dedup: cluster a NEW batch of documents
against an already-deduplicated corpus WITHOUT re-shuffling the base.

The 100 TB operational pattern: a crawl lands daily deltas against a
10^12-doc clustered corpus; re-running the full DAG re-pays the exact-tier
text shuffle, the band shuffle and — worst — the O(pairs) verify over the
whole history. This module persists the small derived state a rerun
actually needs and processes only delta-touching work:

  state/docs      with_rep table (doc_id, norm_text, norm_hash, rep_id,
                  is_rep, n_words, n_chars) — the exact-tier index
  state/reps      representatives incl. shingles (packed binary) + simhash
  state/bands     (doc_id, bucket[, simhash]) LSH band table of the reps
  state/clusters  (doc_id, cluster_id)
  state/STATE.json config fingerprint (a mismatched shingle/banding config
                  invalidates the state — checked on load)

Incremental run (``incremental_dedup``):
  1. light-prepare the delta (normalize/hash only);
  2. exact tier vs EXISTING: hash-join delta × stored reps on norm_hash
     (collision-safe: joined texts are compared, and a delta-sized coarse
     groupby resolves multi-match rows exactly), emitting
     (delta_doc → existing rep) exact pairs;
  3. exact tier WITHIN the unmatched delta (the normal exact_dedup
     shuffle, delta-sized);
  4. shingle delta reps, band-explode them, UNION with the stored band
     table (no recompute of existing bands), generate candidate pairs with
     the standard capped/chained kernel, then keep only pairs touching a
     delta doc — existing×existing candidates are already represented by
     the stored clustering (broadcast sorted delta-id membership; for
     deltas too large to broadcast, carry an is_new flag through the band
     rows instead);
  5. verify delta-touching pairs (broadcast payload = stored reps ∪ delta
     reps — same kernel as the main DAG);
  6. connected components over stored cluster EDGES (doc_id → cluster_id
     is already an edge list, cluster ids are member doc ids) ∪ all new
     pairs; assign over all ids.

Equivalence contract (``tests/test_incremental.py``): the incremental
partition equals ``dedup_pipeline(A ∪ B)``'s partition (labels normalized
to min member). Caveat, documented not hidden: in buckets driven past
``max_bucket_size`` BY THE DELTA, the full run's neighbour chaining may
emit a different (never larger-recall) existing-existing pair set than the
base run did — incremental keeps the base edges (monotone), so on such
corpora incremental recall ≥ full-run recall; the equality test runs below
the cap.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DedupConfig
from ..state.checkpoint import config_fingerprint
from .dedup import DedupResult, build_docs

#: Pure-execution knobs that do NOT define the persisted index — two runs
#: differing only in these produce byte-identical state, so they are
#: excluded from the state fingerprint (a daily incremental job with a
#: different checkpoint_dir or batch_size must not force a full rebuild).
_EXECUTION_KNOBS = frozenset({
    "batch_size", "broadcast_payload_max_bytes", "shuffle_partitions",
    "checkpoint_dir"})


def _index_fingerprint(cfg: DedupConfig) -> str:
    """Fingerprint of the INDEX-DEFINING config fields only (shingle,
    banding, SimHash, bucket-cap, containment, verify thresholds)."""
    from dataclasses import asdict

    return config_fingerprint(
        {k: v for k, v in asdict(cfg).items() if k not in _EXECUTION_KNOBS})


def save_dedup_state(result: DedupResult, cfg: DedupConfig, state_dir: str) -> None:
    """Persist the derived state an incremental run needs (see module doc).

    ``reps`` shingles are recomputed from the stored docs in one stateless
    map (the main DAG does not retain its shingled reps Dataset); bands are
    recomputed from those reps the same way. Both are maps over
    representatives only — no shuffle."""
    from ..stages.lsh import band_explode_batch
    from ..stages.prepare import add_shingles_batch

    docs = result.docs
    docs.write_parquet(os.path.join(state_dir, "docs"), mode="overwrite")

    reps = docs.map_batches(
        lambda t: t.filter(pc.equal(t["is_rep"], True)), batch_format="pyarrow"
    ).map_batches(add_shingles_batch, batch_format="pyarrow",
                  fn_kwargs={"cfg": cfg})
    reps = reps.map_batches(_pack_shingles, batch_format="pyarrow")
    reps.write_parquet(os.path.join(state_dir, "reps"), mode="overwrite")

    bands = _read_reps(state_dir).map_batches(
        band_explode_batch, batch_format="pyarrow", fn_kwargs={"cfg": cfg})
    bands.write_parquet(os.path.join(state_dir, "bands"), mode="overwrite")

    result.clusters.write_parquet(os.path.join(state_dir, "clusters"),
                                  mode="overwrite")
    with open(os.path.join(state_dir, "STATE.json"), "w") as f:
        json.dump({"config_fingerprint": _index_fingerprint(cfg)}, f)


def _pack_shingles(t: pa.Table) -> pa.Table:
    """list<uint64> shingles → binary for Parquet/join friendliness."""
    from ..functions.shingles import lists_to_binary

    packed = lists_to_binary(t["shingles"])
    return t.drop_columns(["shingles"]).append_column("shingles_bin", packed)


def _unpack_shingles(t: pa.Table) -> pa.Table:
    from ..functions.shingles import binary_to_flat

    flat, offsets = binary_to_flat(t["shingles_bin"])
    lists = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()),
        pa.array(flat, type=pa.uint64()))
    return t.drop_columns(["shingles_bin"]).append_column("shingles", lists)


def _read_reps(state_dir: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(state_dir, "reps")) \
        .map_batches(_unpack_shingles, batch_format="pyarrow")


def _collect_sorted_ids(ds, col: str = "doc_id") -> np.ndarray:
    """Stream a one-column id Dataset into one sorted numpy array (the
    broadcast membership set — delta-sized by the module's contract)."""
    chunks = [b[col] for b in ds.iter_batches(batch_size=262144,
                                              batch_format="numpy")]
    if not chunks:
        return np.empty(0, np.int64)
    return np.sort(np.concatenate(chunks).astype(np.int64))


def incremental_dedup(state_dir: str, delta_ds, cfg: DedupConfig,
                      *, id_col: str = "doc_id", text_col: str = "text",
                      num_partitions: int | None = None,
                      check_disjoint_ids: bool = True) -> DedupResult:
    """Cluster ``delta_ds`` against the saved state (see module doc).

    The returned :class:`DedupResult` is CHAINABLE: its ``docs`` field is
    the full prepared with_rep table of the new corpus (stored docs ∪
    delta rows), so ``save_dedup_state(result, cfg, new_state_dir)``
    rolls the state forward for the next delta.

    ``check_disjoint_ids``: delta doc_ids must be disjoint from the
    stored corpus — a recrawled id with changed text would otherwise
    verify against an arbitrary one of its two payload rows and emit
    duplicate output rows. The guard is one pruned scan of the stored id
    column against the broadcast delta id set; disable it only when the
    id scheme guarantees disjointness (e.g. monotonically increasing
    crawl ids)."""
    import ray
    import ray.data as rd

    from ..stages.exact import exact_dedup, split_exact
    from ..stages.lsh import band_explode_batch, candidate_pairs
    from ..stages.prepare import add_shingles_batch
    from ..stages.verify import verify_pairs_broadcast
    from ..state.unionfind import assign_clusters, cc_numpy, pairs_arrays

    with open(os.path.join(state_dir, "STATE.json")) as f:
        meta = json.load(f)
    if meta["config_fingerprint"] != _index_fingerprint(cfg):
        raise ValueError(
            "dedup state was built with a different config "
            "(shingle/banding/verify parameters define the index); rebuild "
            "the state or pass the original config")
    delta_docs = build_docs(delta_ds, cfg, id_col=id_col, text_col=text_col,
                            with_shingles=False).materialize()

    if check_disjoint_ids:
        delta_all_ids = _collect_sorted_ids(delta_docs)
        if len(delta_all_ids):
            delta_all_ref = ray.put(delta_all_ids)

            def _collisions(t: pa.Table) -> pa.Table:
                member = ray.get(delta_all_ref)
                ids = t["doc_id"].to_numpy(zero_copy_only=False)
                pos = np.minimum(np.searchsorted(member, ids),
                                 len(member) - 1)
                return pa.table({"n": pa.array(
                    [int((member[pos] == ids).sum())], pa.int64())})

            n_coll = rd.read_parquet(
                os.path.join(state_dir, "docs"), columns=["doc_id"]) \
                .map_batches(_collisions, batch_format="pyarrow") \
                .sum("n") or 0
            if n_coll:
                raise ValueError(
                    f"{n_coll} delta doc_id(s) already exist in the stored "
                    "corpus; incremental ingest requires disjoint ids "
                    "(updates/recrawls must re-run the full pipeline, or "
                    "use fresh ids). Pass check_disjoint_ids=False only "
                    "when the id scheme guarantees disjointness")

    if num_partitions is None:
        # size the hash exchanges to the DATA (bigger of stored reps and
        # the delta), capped by the cluster — each join/aggregate
        # partition spins an aggregator worker, and CPU-count partitions
        # at small scale pay ~cpus spin-ups per exchange for nothing
        # (util.sized_num_partitions; parquet count() is metadata-only)
        from ..util import sized_num_partitions

        n_prev = rd.read_parquet(os.path.join(state_dir, "reps")).count()
        num_partitions = sized_num_partitions(
            max(n_prev, delta_docs.count()))

    # --- 2. exact vs existing (join on norm_hash, text-verified) ----------
    prev_reps_light = rd.read_parquet(
        os.path.join(state_dir, "reps"),
        columns=["doc_id", "norm_hash", "norm_text"])

    def rename_prev(t: pa.Table) -> pa.Table:
        return pa.table({"prev_rep": t["doc_id"], "norm_hash": t["norm_hash"],
                         "prev_text": t["norm_text"]})

    prev_idx = prev_reps_light.map_batches(rename_prev, batch_format="pyarrow")
    joined = delta_docs.select_columns(["doc_id", "norm_hash", "norm_text"]) \
        .join(prev_idx, join_type="left_outer", num_partitions=num_partitions,
              on=("norm_hash",), right_on=("norm_hash",))

    def flag_match(t: pa.Table) -> pa.Table:
        ok = pc.and_kleene(pc.is_valid(t["prev_rep"]),
                           pc.equal(t["norm_text"], t["prev_text"]))
        ok = pc.fill_null(ok, False)
        rep = pc.if_else(ok, t["prev_rep"], pa.scalar(-1, pa.int64()))
        return pa.table({"doc_id": t["doc_id"],
                         "matched": pc.cast(ok, pa.int8()),
                         "prev_rep": rep})

    flags = joined.map_batches(flag_match, batch_format="pyarrow")

    # resolve join multiplicity exactly (a delta id meets every stored rep
    # sharing its 64-bit hash — text equality picks the real one): coarse
    # delta-sized groupby, vectorized max-per-id inside
    P = num_partitions

    def add_part(t: pa.Table) -> pa.Table:
        h = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column("part", pa.array(
            (h % np.uint64(P)).astype(np.int64), pa.int64()))

    def resolve(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        m = g["matched"].to_numpy(zero_copy_only=False)
        rep = g["prev_rep"].to_numpy(zero_copy_only=False)
        order = np.lexsort((-m, ids))  # per id: matched row first
        ids, m, rep = ids[order], m[order], rep[order]
        first = np.ones(len(ids), dtype=bool)
        first[1:] = ids[1:] != ids[:-1]
        return pa.table({"doc_id": pa.array(ids[first], pa.int64()),
                         "matched": pa.array(m[first].astype(np.int8), pa.int8()),
                         "prev_rep": pa.array(rep[first], pa.int64())})

    resolved = flags.map_batches(add_part, batch_format="pyarrow") \
        .groupby("part").map_groups(resolve, batch_format="pyarrow") \
        .materialize()

    def prev_pairs(t: pa.Table) -> pa.Table:
        hit = t.filter(pc.equal(t["matched"], 1))
        return pa.table({"left_id": hit["prev_rep"], "right_id": hit["doc_id"]})

    exact_prev_pairs = resolved.map_batches(prev_pairs, batch_format="pyarrow")

    matched_tbl = resolved.filter(expr="matched == 1") \
        .select_columns(["doc_id", "prev_rep"]).take_all()  # delta-sized
    matched_ids = np.sort(np.array([r["doc_id"] for r in matched_tbl],
                                   np.int64))
    matched_reps = np.array(
        [r["prev_rep"] for r in sorted(matched_tbl,
                                       key=lambda r: r["doc_id"])], np.int64)
    # broadcast ONCE (ray.put) — a closure capture would pickle the
    # delta-sized array into the UDF and re-ship it with every task
    matched_ref = ray.put((matched_ids, matched_reps))

    def drop_matched(t: pa.Table) -> pa.Table:
        member, _ = ray.get(matched_ref)
        if not len(member):
            return t
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(member, ids), len(member) - 1)
        return t.filter(pa.array(member[pos] != ids))

    fresh = delta_docs.map_batches(drop_matched, batch_format="pyarrow")

    # --- 3. exact tier within the unmatched delta -------------------------
    fresh_with_rep = exact_dedup(fresh, num_partitions=num_partitions)
    delta_reps, delta_exact_pairs = split_exact(fresh_with_rep)
    delta_reps = delta_reps.map_batches(
        add_shingles_batch, batch_format="pyarrow", fn_kwargs={"cfg": cfg}) \
        .materialize()

    # --- 4. bands: delta + stored; delta-touching candidates --------------
    delta_bands = delta_reps.map_batches(
        band_explode_batch, batch_format="pyarrow", fn_kwargs={"cfg": cfg})
    band_cols = ["doc_id", "bucket"] + (
        ["simhash"] if cfg.simhash_max_hamming is not None else [])
    prev_bands = rd.read_parquet(os.path.join(state_dir, "bands"),
                                 columns=band_cols)
    all_bands = prev_bands.union(delta_bands.select_columns(band_cols))
    cand = candidate_pairs(all_bands, cfg, num_partitions=num_partitions)

    delta_rep_ids = _collect_sorted_ids(delta_reps.select_columns(["doc_id"]))
    delta_ids_ref = ray.put(delta_rep_ids)

    def delta_touching(t: pa.Table) -> pa.Table:
        member = ray.get(delta_ids_ref)
        if not len(member):
            return t.slice(0, 0)
        l = t["left_id"].to_numpy(zero_copy_only=False)
        r = t["right_id"].to_numpy(zero_copy_only=False)

        def hit(x):
            pos = np.minimum(np.searchsorted(member, x), len(member) - 1)
            return member[pos] == x

        return t.filter(pa.array(hit(l) | hit(r)))

    cand_new = cand.map_batches(delta_touching, batch_format="pyarrow")

    # --- 5. verify (stored ∪ delta reps payload) — the same measured
    # broadcast↔join switch as the main DAG (dedup.py): below the byte
    # threshold the payload packs once into the object store; above it,
    # attach_payload's chained hash joins are the scale path (the whole-
    # corpus payload never fits one task's heap at 10^12 docs).
    payload_docs = _read_reps(state_dir).select_columns(
        ["doc_id", "norm_text", "shingles"]) \
        .union(delta_reps.select_columns(["doc_id", "norm_text", "shingles"]))
    payload_refs = payload_docs.to_arrow_refs()  # one execution, blocks stay
    payload_docs = rd.from_arrow_refs(payload_refs)
    payload_bytes = payload_docs.size_bytes() or 0
    if payload_bytes <= cfg.broadcast_payload_max_bytes:
        verified = verify_pairs_broadcast(cand_new, payload_docs, cfg,
                                          docs_refs=payload_refs) \
            .materialize()
    else:
        from ..stages.verify import attach_payload, verify_batch

        attached = attach_payload(cand_new, payload_docs,
                                  num_partitions=num_partitions,
                                  with_text=cfg.use_levenshtein)
        verified = attached.map_batches(verify_batch, batch_format="pyarrow",
                                        fn_kwargs={"cfg": cfg}).materialize()

    # --- 6. CC over stored DUPLICATE edges + new pairs; assign ------------
    # Singleton self-edges (doc_id == cluster_id — the overwhelming
    # majority of the corpus) are filtered out: assignment re-defaults
    # absent docs to their own id, so only true duplicate edges need to
    # flow into CC. Above the same pair threshold the main DAG uses, CC
    # runs distributed and labels stay a Dataset — the driver never holds
    # a corpus-sized edge or label array.
    prev_clusters = rd.read_parquet(os.path.join(state_dir, "clusters"))

    def cluster_edges(t: pa.Table) -> pa.Table:
        f = t.filter(pc.invert(pc.equal(t["doc_id"], t["cluster_id"])))
        return pa.table({"left_id": f["doc_id"], "right_id": f["cluster_id"]})

    def dup_only(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["is_dup"], True))
        return f.select(["left_id", "right_id"])

    prev_edges = prev_clusters.map_batches(
        cluster_edges, batch_format="pyarrow").materialize()
    all_edges = prev_edges \
        .union(exact_prev_pairs) \
        .union(delta_exact_pairs) \
        .union(verified.map_batches(dup_only, batch_format="pyarrow"))
    # upper-bound estimate (metadata-only counts): prev dup edges + new
    # verified pairs + at most two exact pairs per delta doc
    n_delta = delta_docs.count()
    n_edges_est = prev_edges.count() + verified.count() + 2 * n_delta

    prev_docs_full = rd.read_parquet(os.path.join(state_dir, "docs"))
    all_ids = prev_docs_full.select_columns(["doc_id"]) \
        .union(delta_docs.select_columns(["doc_id"]))

    from .dedup import DISTRIBUTED_CC_PAIR_THRESHOLD

    if n_edges_est > DISTRIBUTED_CC_PAIR_THRESHOLD:
        from ..state.cc import connected_components_distributed
        from ..state.unionfind import assign_clusters_join

        labels = connected_components_distributed(all_edges)
        clusters = assign_clusters_join(all_ids, labels)
        n_components = None  # would force an extra unique() shuffle
    else:
        left, right = pairs_arrays(all_edges, dup_only=False, has_flag=False)
        mapping = cc_numpy(left, right)
        clusters = assign_clusters(all_ids, mapping)
        _, roots = mapping
        n_components = int(np.unique(roots).size) if len(roots) else 0

    # --- 7. chainable docs: the new corpus's full with_rep table ----------
    # (stored docs ∪ fresh-delta with_rep ∪ matched-delta rows pointing at
    # their stored rep) — save_dedup_state(result, cfg, new_dir) rolls the
    # state forward. Canonical column order so the parquet union is
    # schema-stable regardless of helper-column drift.
    _DOC_COLS = ["doc_id", "norm_text", "norm_hash", "rep_id", "is_rep",
                 "n_words", "n_chars"]

    def matched_with_rep(t: pa.Table) -> pa.Table:
        member, reps = ray.get(matched_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        if not len(member):
            empty = t.slice(0, 0)
            return empty \
                .append_column("rep_id", pa.array([], pa.int64())) \
                .append_column("is_rep", pa.array([], pa.bool_())) \
                .select(_DOC_COLS)
        pos = np.minimum(np.searchsorted(member, ids), len(member) - 1)
        hit = member[pos] == ids
        sub = t.filter(pa.array(hit))
        rep = reps[pos[hit]]
        return sub.append_column("rep_id", pa.array(rep, pa.int64())) \
            .append_column("is_rep",
                           pa.array(np.zeros(len(sub), bool), pa.bool_())) \
            .select(_DOC_COLS)

    docs_out = prev_docs_full.select_columns(_DOC_COLS) \
        .union(fresh_with_rep.select_columns(_DOC_COLS)) \
        .union(delta_docs.map_batches(matched_with_rep,
                                      batch_format="pyarrow"))

    return DedupResult(
        clusters=clusters, verified_pairs=verified,
        exact_pairs=exact_prev_pairs.union(delta_exact_pairs),
        docs=docs_out,
        stats={"n_components": n_components,
               "n_delta_reps": int(len(delta_rep_ids)),
               "n_prev_matched": int(len(matched_ids))})
