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
        json.dump({"config_fingerprint": config_fingerprint(cfg)}, f)


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
                      num_partitions: int | None = None) -> DedupResult:
    """Cluster ``delta_ds`` against the saved state (see module doc)."""
    import ray
    import ray.data as rd

    from ..stages.exact import exact_dedup, split_exact
    from ..stages.lsh import band_explode_batch, candidate_pairs
    from ..stages.prepare import add_shingles_batch
    from ..stages.verify import verify_pairs_broadcast
    from ..state.unionfind import assign_clusters, cc_numpy, pairs_arrays
    from ..util import default_num_partitions

    with open(os.path.join(state_dir, "STATE.json")) as f:
        meta = json.load(f)
    if meta["config_fingerprint"] != config_fingerprint(cfg):
        raise ValueError(
            "dedup state was built with a different config "
            "(shingle/banding parameters define the index); rebuild the "
            "state or pass the original config")
    delta_docs = build_docs(delta_ds, cfg, id_col=id_col, text_col=text_col,
                            with_shingles=False).materialize()

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

    matched_ids = _collect_sorted_ids(
        resolved.filter(expr="matched == 1").select_columns(["doc_id"]))

    def drop_matched(t: pa.Table) -> pa.Table:
        if not len(matched_ids):
            return t
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(matched_ids, ids),
                         len(matched_ids) - 1)
        return t.filter(pa.array(matched_ids[pos] != ids))

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

    # --- 5. verify (broadcast payload over stored ∪ delta reps) -----------
    payload_docs = _read_reps(state_dir).select_columns(
        ["doc_id", "norm_text", "shingles"]) \
        .union(delta_reps.select_columns(["doc_id", "norm_text", "shingles"]))
    verified = verify_pairs_broadcast(cand_new, payload_docs, cfg) \
        .materialize()

    # --- 6. CC over stored edges + new pairs; assign ----------------------
    prev_clusters = rd.read_parquet(os.path.join(state_dir, "clusters"))

    def cluster_edges(t: pa.Table) -> pa.Table:
        return pa.table({"left_id": t["doc_id"], "right_id": t["cluster_id"]})

    def dup_only(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["is_dup"], True))
        return f.select(["left_id", "right_id"])

    all_edges = prev_clusters.map_batches(cluster_edges, batch_format="pyarrow") \
        .union(exact_prev_pairs) \
        .union(delta_exact_pairs) \
        .union(verified.map_batches(dup_only, batch_format="pyarrow"))
    left, right = pairs_arrays(all_edges, dup_only=False, has_flag=False)
    mapping = cc_numpy(left, right)

    prev_docs = rd.read_parquet(os.path.join(state_dir, "docs"),
                                columns=["doc_id"])
    all_ids = prev_docs.union(delta_docs.select_columns(["doc_id"]))
    clusters = assign_clusters(all_ids, mapping)
    nodes, roots = mapping
    return DedupResult(
        clusters=clusters, verified_pairs=verified,
        exact_pairs=exact_prev_pairs.union(delta_exact_pairs),
        docs=all_ids,
        stats={"n_components": int(len(set(roots.tolist()))) if len(roots) else 0,
               "n_delta_reps": int(len(delta_rep_ids)),
               "n_prev_matched": int(len(matched_ids))})
