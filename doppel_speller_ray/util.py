"""Small execution utilities."""

from __future__ import annotations


def default_task_partitions(mult: int = 4, cap: int = 128) -> int:
    """Partition count for coarse-key groupby stages (bucket % P,
    pair-hash % P, norm-hash % P).

    mult× the CPU count so per-partition load variance amortizes: with
    P == CPUs one heavy partition (e.g. a Levenshtein-dense pair range)
    becomes a straggler that sets the stage wall time (observed +8 s at
    P=32); with 4× oversubscription the scheduler back-fills.

    ``GRAFT_TASK_PARTITIONS`` overrides: at real scale partition count is
    DATA-sized (bytes / target block size), not CPU-sized, and a scaling
    measurement comparing two cluster widths must run the same physical
    plan on both — the CPU-derived default would confound it (128
    partitions at 32 CPUs vs 32 at 8).
    """
    import os

    env = os.environ.get("GRAFT_TASK_PARTITIONS")
    if env:
        return int(env)
    try:
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 8))
        else:
            cpus = 8
    except Exception:
        cpus = 8
    return max(8, min(cap, cpus * mult))


def sized_num_partitions(n_rows: int, rows_per_partition: int = 500_000) -> int:
    """Join/shuffle partition count sized to the DATA, capped by the
    cluster (default_num_partitions). Each hash-join/aggregate partition
    spins an aggregator worker — at toy scale, CPU-count partitions pay
    ~32 spin-ups to shuffle a few thousand rows (measured: pagerank
    15.2 s at sf0.1/32 CPUs with nparts=32, ~3 s with data-sized
    partitions). At 10^12 rows the rows_per_partition term dominates and
    the count grows with the data, which is the scale behavior the
    default alone can't express."""
    need = max(2, -(-int(n_rows) // int(rows_per_partition)))
    return min(need, default_num_partitions())


def default_num_partitions(cap: int = 64) -> int:
    """Join/shuffle partition count scaled to the current cluster.

    Hash-join aggregator pools reserve resources per partition; asking for
    more partitions than CPUs on a small cluster can starve the rest of the
    DAG into a backpressure deadlock (observed at num_cpus=4 with
    num_partitions=16). At scale, callers pass an explicit count sized to
    the data instead (e.g. total_bytes / 512MB). ``GRAFT_JOIN_PARTITIONS``
    overrides (clamped to the CPU count to avoid the deadlock above).
    """
    import os

    env = os.environ.get("GRAFT_JOIN_PARTITIONS")
    if env:
        try:
            import ray

            cpus = int(ray.cluster_resources().get("CPU", 8)) \
                if ray.is_initialized() else 8
        except Exception:
            cpus = 8
        return max(2, min(int(env), cpus))
    try:
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 8))
        else:
            cpus = 8
    except Exception:
        cpus = 8
    return max(2, min(cap, cpus))


def drop_empty_blocks(ds):
    """Rebuild a Dataset from only its nonempty blocks.

    Empty groupby/map_groups partitions emit SCHEMA-LESS empty blocks
    (observed schema ``[]``); an acero hash join whose hash partition
    receives only such blocks fails with "No match or multiple matches for
    key field". map_batches cannot fix them — Ray passes empty blocks
    through without invoking the UDF — so the blocks are filtered by ref:
    one O(1) remote ``len()`` task per block, block payloads stay in the
    object store, nothing corpus-sized touches the driver.

    If EVERY block is empty the first ref is kept so downstream ``count()``
    guards still see an (empty) dataset.
    """
    import ray
    import ray.data as rd

    refs = ds.to_arrow_refs()
    if len(refs) <= 1:
        return rd.from_arrow_refs(refs) if refs else ds

    @ray.remote(num_cpus=0)
    def _nonempty(t) -> bool:
        return len(t) > 0

    flags = ray.get([_nonempty.remote(r) for r in refs])
    keep = [r for r, ne in zip(refs, flags) if ne]
    if not keep:
        keep = refs[:1]
    return rd.from_arrow_refs(keep)


def file_sha256(path: str) -> str:
    """Content digest used for artifact provenance (abstainer ↔ pair
    model pairing); shared by the CLI check and tools/train_abstainer so
    the two sides can never drift."""
    import hashlib

    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()
