"""Containment-duplicate detection (SURVEY.md §2.7 D6, north_star's
substring stage): pages whose text is (mostly) contained in another page.

LSH on whole-document shingle sets misses low-Jaccard containment (a short
page embedded in a long boilerplate-heavy page). This stage uses winnowing
fingerprints (Schleimer et al., SIGMOD'03 — functions/textstats.py): any
shared substring of length ≥ w + k − 1 yields shared fingerprints, so
containment shows up as |F(A) ∩ F(B)| / min(|F(A)|, |F(B)|) ≈ 1 regardless
of the size ratio.

Dataflow (no joins — sizes ride along with the inverted index):

    docs → map_batches winnow → explode (fp, doc_id, n_fp)
         → groupby(fp % P) → in-partition pair emission with a
           stop-fingerprint cap (fps shared by > max_df docs are dropped and
           counted — boilerplate fingerprints would otherwise explode pairs)
         → groupby(pair-hash % P) → shared-count → containment score filter
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import pair_hash
from ..functions.textstats import winnow_fingerprints
from ..util import default_task_partitions


def winnow_batch(batch: pa.Table, *, k: int = 8, w: int = 16, seed: int = 42,
                 id_col: str = "doc_id", text_col: str = "norm_text") -> pa.Table:
    """docs batch → exploded (fp, doc_id, n_fp) rows."""
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    texts = batch[text_col].to_pylist()
    fps = [winnow_fingerprints(t, k, w, seed) for t in texts]
    lens = np.array([len(f) for f in fps], dtype=np.int64)
    flat = np.concatenate(fps) if fps else np.empty(0, np.uint64)
    return pa.table({
        "fp": pa.array(flat, pa.uint64()),
        "doc_id": pa.array(np.repeat(ids, lens), pa.int64()),
        "n_fp": pa.array(np.repeat(lens, lens), pa.int64()),
    })


class DropCounter:
    """Ray actor accumulating stop-fingerprint drop counts across partition
    tasks — the north rule's "no silent recall loss": fingerprints shared by
    more than ``max_df`` docs are boilerplate and are not paired, and this
    surfaces how many were dropped instead of hiding it. One fire-and-forget
    call per partition, not per row."""

    def __init__(self) -> None:
        self.n_dropped = 0
        self.partitions_reporting = 0

    def add(self, n: int) -> None:
        self.n_dropped += int(n)
        self.partitions_reporting += 1

    def get(self) -> dict:
        return {"stop_fingerprints_dropped": self.n_dropped,
                "partitions_reporting": self.partitions_reporting}


def containment_pairs_with_stats(docs_ds, **kwargs):
    """Run :func:`containment_pairs` with a drop counter attached. Returns
    ``(pairs_ds, stats_fn)`` — call ``stats_fn()`` AFTER consuming the pairs
    Dataset to read the accumulated stop-fingerprint drop counts."""
    import ray

    counter = ray.remote(num_cpus=0)(DropCounter).remote()
    pairs = containment_pairs(docs_ds, drop_counter=counter, **kwargs)
    return pairs, (lambda: ray.get(counter.get.remote()))


def containment_pairs(docs_ds, *, min_containment: float = 0.7, k: int = 8,
                      w: int = 16, seed: int = 42, max_df: int = 64,
                      min_fps: int = 4, num_partitions: int | None = None,
                      drop_counter=None):
    """docs Dataset (doc_id, norm_text) → (left_id, right_id, containment).

    ``containment`` = shared fingerprints / min(total fingerprints); pairs
    below ``min_containment`` are dropped. Docs with < ``min_fps``
    fingerprints (shorter than ~w+k chars) are skipped — too little signal.
    ``drop_counter``: optional :class:`DropCounter` actor handle; each
    partition reports its stop-fingerprint drop count to it.
    """
    P = num_partitions or default_task_partitions()

    fps = docs_ds.map_batches(
        winnow_batch, batch_format="pyarrow",
        fn_kwargs={"k": k, "w": w, "seed": seed},
    )

    def add_part(t: pa.Table) -> pa.Table:
        f = t["fp"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column("part", pa.array((f % np.uint64(P)).astype(np.int64),
                                                pa.int64()))

    def pairs_in_partition(group: pa.Table) -> pa.Table:
        f = group["fp"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nfp = group["n_fp"].to_numpy(zero_copy_only=False).astype(np.int64)
        keepdoc = nfp >= min_fps
        f, ids, nfp = f[keepdoc], ids[keepdoc], nfp[keepdoc]
        order = np.lexsort((ids, f))
        f, ids, nfp = f[order], ids[order], nfp[order]
        _, starts, counts = np.unique(f, return_index=True, return_counts=True)
        # vectorized run prefilter BEFORE the Python loop — at web scale
        # most fingerprints are unique, and paying a loop iteration per
        # singleton run recreates the per-group-overhead bottleneck the
        # LSH stage was explicitly restructured to avoid (lsh.py counts>1
        # mask; measured there: 37 s → <1 s)
        n_stop = int((counts > max_df).sum())
        use = (counts >= 2) & (counts <= max_df)
        out = []
        for s, c in zip(starts[use], counts[use]):
            seg_ids = ids[s:s + c]
            seg_n = nfp[s:s + c]
            iu = np.triu_indices(c, k=1)
            out.append((seg_ids[iu[0]], seg_ids[iu[1]], seg_n[iu[0]], seg_n[iu[1]]))
        if drop_counter is not None and n_stop:
            import ray

            # SYNCHRONOUS add: a fire-and-forget .remote() has no delivery
            # ordering vs the driver's later counter.get — stats_fn could
            # read before in-flight adds land and silently under-report.
            # ray.get before the task returns makes dataset-consumed imply
            # all adds delivered; cost is one ~ms round-trip per partition
            # that actually dropped something.
            ray.get(drop_counter.add.remote(n_stop))
        if not out:
            z = np.empty(0, np.int64)
            return pa.table({"left_id": pa.array(z, pa.int64()),
                             "right_id": pa.array(z, pa.int64()),
                             "n_left": pa.array(z, pa.int64()),
                             "n_right": pa.array(z, pa.int64())})
        l = np.concatenate([o[0] for o in out])
        r = np.concatenate([o[1] for o in out])
        nl = np.concatenate([o[2] for o in out])
        nr = np.concatenate([o[3] for o in out])
        # canonical order (left < right)
        swap = l > r
        l2 = np.where(swap, r, l)
        r2 = np.where(swap, l, r)
        nl2 = np.where(swap, nr, nl)
        nr2 = np.where(swap, nl, nr)
        keep = l2 != r2
        return pa.table({"left_id": pa.array(l2[keep], pa.int64()),
                         "right_id": pa.array(r2[keep], pa.int64()),
                         "n_left": pa.array(nl2[keep], pa.int64()),
                         "n_right": pa.array(nr2[keep], pa.int64())})

    shared = fps.map_batches(add_part, batch_format="pyarrow") \
        .groupby("part").map_groups(pairs_in_partition, batch_format="pyarrow")

    def add_pp(t: pa.Table) -> pa.Table:
        h = pair_hash(t["left_id"].to_numpy(zero_copy_only=False),
                      t["right_id"].to_numpy(zero_copy_only=False))
        return t.append_column("ppart", pa.array((h % np.uint64(P)).astype(np.int64),
                                                 pa.int64()))

    def score_partition(group: pa.Table) -> pa.Table:
        l = group["left_id"].to_numpy(zero_copy_only=False)
        r = group["right_id"].to_numpy(zero_copy_only=False)
        nl = group["n_left"].to_numpy(zero_copy_only=False)
        nr = group["n_right"].to_numpy(zero_copy_only=False)
        order = np.lexsort((r, l))
        l, r, nl, nr = l[order], r[order], nl[order], nr[order]
        new = np.ones(len(l), dtype=bool)
        if len(l) > 1:
            new[1:] = (np.diff(l) != 0) | (np.diff(r) != 0)
        run_id = np.cumsum(new) - 1
        shared_count = np.bincount(run_id)
        firsts = np.nonzero(new)[0]
        lu, ru, nlu, nru = l[firsts], r[firsts], nl[firsts], nr[firsts]
        cont = shared_count / np.minimum(nlu, nru)
        keep = cont >= min_containment
        return pa.table({
            "left_id": pa.array(lu[keep], pa.int64()),
            "right_id": pa.array(ru[keep], pa.int64()),
            "containment": pa.array(np.round(cont[keep], 6), pa.float64()),
        })

    return shared.map_batches(add_pp, batch_format="pyarrow") \
        .groupby("ppart").map_groups(score_partition, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Substring verification tier (north_star's suffix-array substring stage)
# ---------------------------------------------------------------------------

_EMPTY_SUBSTR = pa.table({
    "left_id": pa.array([], pa.int64()),
    "right_id": pa.array([], pa.int64()),
    "containment": pa.array([], pa.float64()),
    "is_substring": pa.array([], pa.bool_()),
    "contained_id": pa.array([], pa.int64()),
})


def _certify_arrays(lid: np.ndarray, rid: np.ndarray,
                    left_texts, right_texts) -> tuple[np.ndarray, np.ndarray]:
    """Per-pair exact-substring certification kernel: is the shorter text a
    substring of the longer? CPython's two-way (Crochemore–Perrin) ``str``
    search — O(n+m) worst case, the same asymptotics a per-pair suffix
    automaton would give without its construction constant."""
    is_sub = np.zeros(len(lid), dtype=bool)
    contained = np.full(len(lid), -1, dtype=np.int64)
    for i in range(len(lid)):
        a, b = left_texts[i], right_texts[i]
        if len(a) <= len(b):
            short_txt, short_id = a, lid[i]
            long_txt = b
        else:
            short_txt, short_id = b, rid[i]
            long_txt = a
        if short_txt and short_txt in long_txt:
            is_sub[i] = True
            contained[i] = short_id
    return is_sub, contained


def _pack_text_payload(*tables):
    """Collect docs blocks into (sorted ids, permutation, flat utf8 buffer,
    offsets) — the text-only sibling of verify._build_payload_arrays. Runs
    as a Ray TASK so the corpus payload never transits the driver; every
    certify task reads the result zero-copy from the object store."""
    from ..functions.hashing import _string_buffers

    tables = [t.select(["doc_id", "norm_text"]) for t in tables if t.num_rows]
    if not tables:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.uint8), np.zeros(1, np.int64))
    tbl = pa.concat_tables(tables, promote_options="none")
    raw_ids = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    perm = np.argsort(raw_ids)
    ids = raw_ids[perm]
    tcol = tbl["norm_text"].combine_chunks()
    if pa.types.is_large_string(tcol.type):
        tcol = tcol.cast(pa.string())
    tdata, toff = _string_buffers(tcol)
    return ids, perm, tdata, toff


def substring_containment_pairs(docs_ds, *, min_candidate_containment: float = 0.35,
                                k: int = 8, w: int = 16, seed: int = 42,
                                max_df: int = 64, min_fps: int = 4,
                                num_partitions: int | None = None,
                                drop_counter=None,
                                broadcast_max_bytes: int = 1 << 30):
    """Containment with EXACT-substring certification (SURVEY.md §2.7 D6's
    "later milestone"; the north_star names a suffix-array substring stage).

    The winnowing-fingerprint score is a sampled estimate: a true substring
    pair can score < 1 (window sampling) and a heavy-overlap non-substring
    pair can score ≈ 1. This stage generates candidates at a LOW fingerprint
    bar (``min_candidate_containment``, default 0.35 — any shared substring
    of length ≥ w+k−1 already guarantees shared fingerprints), attaches the
    two texts, and certifies each pair with a direct substring search of the
    shorter text in the longer (see :func:`_certify_arrays`).

    Text attach uses the same measured broadcast-vs-join switch as the
    flagship verify tier (pipelines/dedup.py): a docs payload below
    ``broadcast_max_bytes`` is packed into flat numpy arrays by a Ray task
    (:func:`_pack_text_payload`) and read zero-copy by every certify batch —
    no hash-join aggregator actors at all, which removes the fragile
    chained-join shuffle at small scale (the round-3 driver red row was a
    HashShuffleAggregator startup death here). Above the threshold the
    chained ``Dataset.join`` path runs, with ONE retry on
    ``ray.exceptions.RayError`` actor/worker deaths.

    Returns (left_id, right_id, containment, is_substring, contained_id)
    where ``contained_id`` is the doc whose FULL text appears inside the
    other (−1 when is_substring is false — such pairs are fingerprint-
    overlap candidates that failed certification).
    """
    import ray
    import ray.data as rd

    from ..util import default_num_partitions, drop_empty_blocks

    cand = containment_pairs(
        docs_ds, min_containment=min_candidate_containment, k=k, w=w,
        seed=seed, max_df=max_df, min_fps=min_fps,
        num_partitions=num_partitions, drop_counter=drop_counter,
    )
    # schema-less empty blocks from empty groupby partitions break the
    # downstream hash join — filter them by ref (see util.drop_empty_blocks)
    cand = drop_empty_blocks(cand.materialize())
    if cand.count() == 0:
        return rd.from_arrow(_EMPTY_SUBSTR)

    payload = docs_ds.select_columns(["doc_id", "norm_text"]).materialize()

    if (payload.size_bytes() or 0) <= broadcast_max_bytes:
        # --- broadcast path: pack once (off-driver), look up per batch ----
        build = ray.remote(num_cpus=1)(_pack_text_payload)
        ref = build.remote(*payload.to_arrow_refs())

        def certify_broadcast(t: pa.Table) -> pa.Table:
            bids, bperm, btd, bto = ray.get(ref)
            lid = t["left_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            rid = t["right_id"].to_numpy(zero_copy_only=False).astype(np.int64)

            def texts(x: np.ndarray) -> list[str]:
                pos = np.searchsorted(bids, x)
                if len(bids) == 0 or (bids[np.minimum(pos, len(bids) - 1)] != x).any():
                    raise KeyError("pair references unknown doc_id")
                phys = bperm[pos]
                return [btd[bto[p]: bto[p + 1]].tobytes().decode("utf-8")
                        for p in phys]

            is_sub, contained = _certify_arrays(lid, rid, texts(lid), texts(rid))
            return pa.table({
                "left_id": t["left_id"], "right_id": t["right_id"],
                "containment": t["containment"],
                "is_substring": pa.array(is_sub),
                "contained_id": pa.array(contained, pa.int64()),
            })

        return cand.map_batches(certify_broadcast, batch_format="pyarrow")

    # --- join path (payload too large to broadcast) -----------------------
    join_parts = default_num_partitions()

    def rename(side):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({f"{side}_id": t["doc_id"],
                             f"{side}_text": t["norm_text"]})
        return fn

    def certify(t: pa.Table) -> pa.Table:
        lid = t["left_id"].to_numpy(zero_copy_only=False)
        rid = t["right_id"].to_numpy(zero_copy_only=False)
        is_sub, contained = _certify_arrays(
            lid, rid, t["left_text"].to_pylist(), t["right_text"].to_pylist())
        return pa.table({
            "left_id": t["left_id"], "right_id": t["right_id"],
            "containment": t["containment"],
            "is_substring": pa.array(is_sub),
            "contained_id": pa.array(contained, pa.int64()),
        })

    def run_join():
        att = cand.join(
            payload.map_batches(rename("left"), batch_format="pyarrow"),
            join_type="inner", num_partitions=join_parts,
            on=("left_id",), right_on=("left_id",))
        att = att.join(
            payload.map_batches(rename("right"), batch_format="pyarrow"),
            join_type="inner", num_partitions=join_parts,
            on=("right_id",), right_on=("right_id",))
        # materialize the SMALL certified output (pair ids + flags) so a
        # shuffle-aggregator actor death surfaces HERE, where the retry is
        return att.map_batches(certify, batch_format="pyarrow").materialize()

    try:
        return run_join()
    except ray.exceptions.RayError:
        # one retry: join aggregator actor pools occasionally die at startup
        # under churn (observed: HashShuffleAggregator "never ran"); the
        # inputs are materialized so a rerun is cheap and deterministic
        return run_join()
