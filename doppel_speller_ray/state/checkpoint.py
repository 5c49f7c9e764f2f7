"""Stage checkpoints with per-partition lineage + metrics (north_rule).

Every checkpointed stage writes:

    <dir>/<stage>/data/part-*.parquet    (written by Ray, many part files)
    <dir>/<stage>/manifest.json
    <dir>/<stage>/_SUCCESS

The manifest records, per part file: row count, byte size, and a
content signature (uint64 hash of the file bytes, computed in parallel Ray
tasks — not on the driver), plus the stage's config fingerprint. A resume
(`read_or_run`) replays the stage from Parquet iff the manifest exists AND
its config fingerprint matches; a config change silently invalidating old
checkpoints is how stale-resume bugs happen, so the fingerprint gate is
mandatory.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, is_dataclass
from typing import Any


def config_fingerprint(cfg: Any, input_token: str = "") -> str:
    """Stable fingerprint of a config dataclass (or any jsonable dict),
    optionally mixed with an input-identity token (source paths + sizes) —
    without it, rerunning with the same checkpoint_dir and config but a
    DIFFERENT ``--input`` would silently replay the previous corpus's stage
    Parquet (stale-resume)."""
    from ..functions.hashing import hash_bytes_rows
    import numpy as np

    payload = json.dumps(
        {"cfg": asdict(cfg) if is_dataclass(cfg) else cfg, "input": input_token},
        sort_keys=True, default=str).encode()
    data = np.frombuffer(payload, dtype=np.uint8)
    h = hash_bytes_rows(data, np.array([0, len(data)], np.int64), seed=0)[0]
    return f"{int(h):016x}"


def input_identity_token(ds) -> str:
    """Best-effort identity of a Dataset's input: source file paths + byte
    sizes (metadata-only — no execution) for file-backed datasets, else the
    logical-plan repr. Used to invalidate checkpoints when the input
    changes under an unchanged config."""
    try:
        files = sorted(ds.input_files())
        sizes = []
        for f in files:
            try:
                sizes.append(os.path.getsize(f))
            except OSError:
                sizes.append(-1)
        if files:
            return ";".join(f"{p}:{s}" for p, s in zip(files, sizes))
    except Exception:
        pass
    try:
        return repr(ds._plan._logical_plan.dag)
    except Exception:
        return ""


def _file_stats_task(path: str) -> dict:
    import pyarrow.parquet as pq
    import numpy as np

    from ..functions.hashing import hash_bytes_rows

    meta = pq.ParquetFile(path).metadata
    with open(path, "rb") as f:
        raw = np.frombuffer(f.read(), dtype=np.uint8)
    sig = hash_bytes_rows(raw, np.array([0, len(raw)], np.int64), seed=0)[0]
    return {"file": os.path.basename(path), "rows": meta.num_rows,
            "bytes": os.path.getsize(path), "signature": f"{int(sig):016x}"}


def write_checkpoint(ds, out_dir: str, stage: str, fingerprint: str):
    """Write a stage Dataset to a checkpointed Parquet directory and return
    a re-read Dataset. Partition stats run as parallel Ray tasks."""
    import ray
    import ray.data as rd

    final = os.path.join(out_dir, stage)
    tmp = final + ".tmp"
    if os.path.exists(tmp):
        import shutil

        shutil.rmtree(tmp)
    data_dir = os.path.join(tmp, "data")
    ds.write_parquet(data_dir)

    stats_task = ray.remote(num_cpus=0.5)(_file_stats_task)
    files = sorted(
        os.path.join(data_dir, f) for f in os.listdir(data_dir) if f.endswith(".parquet")
    )
    stats = ray.get([stats_task.remote(f) for f in files])

    manifest = {
        "stage": stage,
        "fingerprint": fingerprint,
        "n_files": len(files),
        "total_rows": sum(s["rows"] for s in stats),
        "partitions": stats,
    }
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    if os.path.exists(final):
        import shutil

        shutil.rmtree(final)
    os.replace(tmp, final)
    with open(os.path.join(final, "_SUCCESS"), "w") as f:
        f.write("ok")
    return rd.read_parquet(os.path.join(final, "data"))


def checkpoint_valid(out_dir: str, stage: str, fingerprint: str) -> bool:
    final = os.path.join(out_dir, stage)
    if not os.path.exists(os.path.join(final, "_SUCCESS")):
        return False
    try:
        with open(os.path.join(final, "manifest.json")) as f:
            manifest = json.load(f)
    except (OSError, json.JSONDecodeError):
        return False
    return manifest.get("fingerprint") == fingerprint


def read_checkpoint(out_dir: str, stage: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(out_dir, stage, "data"))


def read_manifest(out_dir: str, stage: str) -> dict:
    with open(os.path.join(out_dir, stage, "manifest.json")) as f:
        return json.load(f)


def read_or_run(ds_factory, out_dir: str | None, stage: str, cfg: Any,
                input_token: str = ""):
    """Resume-aware stage boundary: re-read a valid checkpoint, else run
    the factory, checkpoint its output, and return the re-read Dataset.
    ``input_token`` (see :func:`input_identity_token`) is mixed into the
    fingerprint so a changed input invalidates the checkpoint chain.
    With no checkpoint dir the stage output is materialized instead (it is
    consumed by multiple downstream branches)."""
    if out_dir is None:
        return ds_factory().materialize()
    fp = config_fingerprint(cfg, input_token)
    if checkpoint_valid(out_dir, stage, fp):
        return read_checkpoint(out_dir, stage)
    return write_checkpoint(ds_factory(), out_dir, stage, fp)


def write_output_manifest(out_dir: str, extra: dict | None = None) -> dict:
    """Per-partition lineage + metrics for a FINAL output directory (the
    north_rule clause applies to the sink, not just intermediate stage
    checkpoints): walk every part file under ``out_dir`` (including hive
    shard subdirectories), record rows / bytes / content signature per
    file — stats computed in parallel Ray tasks, never on the driver —
    and write ``manifest.json`` at the directory root. A resuming or
    auditing consumer can verify any shard independently against it."""
    import ray

    files = []
    for root, _dirs, names in os.walk(out_dir):
        for n in sorted(names):
            if n.endswith(".parquet"):
                files.append(os.path.join(root, n))
    files.sort()
    stats_task = ray.remote(num_cpus=0.5)(_file_stats_task)
    stats = ray.get([stats_task.remote(f) for f in files])
    for path, s in zip(files, stats):
        s["file"] = os.path.relpath(path, out_dir)
    manifest = {
        "n_files": len(files),
        "total_rows": sum(s["rows"] for s in stats),
        "partitions": stats,
        **(extra or {}),
    }
    # underscore prefix: pyarrow/Ray parquet discovery skips _-prefixed
    # files, so read_parquet(out_dir) keeps working on the manifested dir
    with open(os.path.join(out_dir, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest
