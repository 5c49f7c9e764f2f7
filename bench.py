"""Benchmark harness (driver contract).

Runs the headline pipelines over $GRAFT_SF_DIR (default /root/testdata/sf0.1)
in a fresh local Ray session with num_cpus=$RAY_GRAFT_CPUS (default 32) and
prints ONE JSON line:

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, "docs_per_sec": ...}

`--scaling` re-runs the headline dedup pipeline in fresh subprocesses at
num_cpus=8 and num_cpus=32 on the same input — PAIRED interleaved legs,
median-of-pairs efficiency plus a CPU core-seconds efficiency (the
in-sandbox stand-in for the north rule's N→4N-node cluster criterion).

`--scale-path` runs the same corpus through the forced 100×-scale path
(distributed star CC + join payload attach/assignment) and asserts its
cluster assignment equals the default path's.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _psutil():
    """Ray vendors psutil (not importable top-level in this container)."""
    import ray

    sys.path.insert(0, os.path.join(os.path.dirname(ray.__file__),
                                    "thirdparty_files"))
    import psutil

    return psutil


def _total_cpu_seconds(psutil) -> float:
    """user+system CPU seconds of this process and every live descendant
    (raylet, workers). Sampled before ray.shutdown so workers still exist.
    Co-tenant activity steals WALL time but never lands in our processes'
    CPU accounting — which is why the scaling harness also reports a
    core-seconds efficiency (VERDICT r2 item 1)."""
    me = psutil.Process()
    total = sum(me.cpu_times()[:2])
    for child in me.children(recursive=True):
        try:
            total += sum(child.cpu_times()[:2])
        except psutil.Error:
            pass
    return total


def _init_ray(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import ray
    import ray.data as rd

    _init_ray(num_cpus)

    from doppel_speller_ray.config import DedupConfig
    from doppel_speller_ray.pipelines.dedup import dedup_pipeline
    from doppel_speller_ray.pipelines import queries as Q

    # warm the page cache so we measure compute + shuffle, not first disk read
    rd.read_parquet(f"{sf_dir}/documents.parquet").count()

    timings: dict[str, float] = {}
    n_docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"]).count()

    # This virtualized host sees co-tenant bursts that inflate a single wall
    # measurement 2-8x (observed: the same headline 9-74 s with identical
    # code); every timing below is a MIN over repeats, matching the paired
    # anti-jitter protocol of --scaling.
    repeats = int(os.environ.get("GRAFT_BENCH_REPEATS", "3"))

    # headline: full near-dup detection + clustering
    n_clusters = 0
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        res = dedup_pipeline(
            rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"]),
            DedupConfig(max_chars=None),
        )
        n_clusters = res.clusters.count()
        best = min(best, time.perf_counter() - t0)
    timings["dedup_pipeline"] = best

    # flagship + containment tier (north_star substring stage wired in):
    # adds the winnowing-fingerprint shuffle + substring certification
    best = float("inf")
    for _ in range(max(2, repeats - 1)):
        t0 = time.perf_counter()
        res_c = dedup_pipeline(
            rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"]),
            DedupConfig(max_chars=None, containment=True),
        )
        res_c.clusters.count()
        best = min(best, time.perf_counter() - t0)
    timings["dedup_containment"] = best

    # secondary pipelines (operator coverage under timing); simhash and
    # fingerprint time the raw per-doc value kernels — the catalog entries
    # of those names are the doubled-corpus consistency ORACLES, not the
    # operators themselves
    secondary = dict.fromkeys((
        "normalize", "word_df", "ngram_df", "exact_text_groups",
        "token_count", "simhash", "fingerprint", "lineitem_agg",
        "events_hourly", "ann_topk", "extract_text", "boilerplate",
        "pii_redact", "line_dedup", "pack_sequences",
        "url_dedup_latest", "link_graph", "gopher_quality", "tfidf_topk",
        "vocab_encode", "char_entropy", "lm_score", "pagerank",
        "pmi_bigrams", "anchor_text", "longest_repeat",
        "sa_substring_pairs", "chunk_passages", "kmeans_embed",
        "snapshot_changes", "repetition_signals", "cluster_representatives",
        "semdedup", "simhash_neardup", "hll_distinct", "kmv_distinct",
        "range_join", "prefix_jaccard_join", "posting_lists",
        "cms_heavy_hitters", "events_debounce", "time_to_next_event",
        "percent_rank_length", "json_props_stats", "pivot_user_values",
        "triangle_count", "bm25_topk", "cdc_chunks",
        "multimodal_image_stats", "multimodal_audio_stats",
        "table_profile", "sample_per_group", "knn_join", "value_quantiles",
        "bpe_train", "logreg_train",
        "decontaminate", "contam_spans", "domain_stats", "bloom_delta",
        "lsh_join", "events_sliding", "shuffle_rank", "split_assign",
        "incremental_clusters", "ts_corr_pairs", "pair_features"))
    secondary["simhash"] = Q.q_simhash_values
    secondary["fingerprint"] = Q.q_fingerprint_values
    for name, fn in secondary.items():
        best = float("inf")
        best_phases = None
        for _ in range(max(2, repeats - 1)):
            t0 = time.perf_counter()
            qfn = fn or Q.QUERIES[name]
            ds = qfn(sf_dir)
            # consume without driver materialization of big results
            if hasattr(ds, "count"):
                ds.count()
            el = time.perf_counter() - t0
            if el < best:
                best = el
                best_phases = getattr(qfn, "last_phase_seconds", None)
        timings[name] = best
        if best_phases:
            # e.g. incremental_clusters → save-state (one-off) vs delta
            # run (the daily-repeat path that matters at scale)
            for ph, sec in best_phases.items():
                timings[f"{name}_{ph}"] = sec

    headline = timings["dedup_pipeline"]
    out = {
        "metric": "dedup_e2e_seconds",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "n_docs": n_docs,
        "n_clusters": n_clusters,
        "docs_per_sec": round(n_docs / headline, 1),
    }
    ray.shutdown()
    return out


def _scaled_input_dir(sf_dir: str, replicate: int) -> str:
    """Deterministically replicate the documents table ×replicate (copy 0 =
    original; copies r>0 are seeded misspellings so the exact-dup tier does
    not collapse them). Built once, reused by both scaling runs.

    At sf0.1 the pipeline is fixed-overhead-bound (~15 s of shuffle/actor
    setup regardless of CPUs); the scaling criterion needs enough per-doc
    work that compute dominates, hence the larger derived input.
    """
    out = f"/tmp/graft_scaled_{os.path.basename(sf_dir.rstrip('/'))}_x{replicate}"
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    import pyarrow as pa
    import ray
    import ray.data as rd

    _init_ray(NUM_CPUS)
    from doppel_speller_ray.functions.misspell import misspell

    def expand(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        out_ids, out_txt = [], []
        for i, x in zip(ids, texts):
            for r in range(replicate):
                out_ids.append(i * replicate + r)
                out_txt.append(x if r == 0 else misspell(x, i * replicate + r))
        return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                         "text": pa.array(out_txt)})

    rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]) \
        .map_batches(expand, batch_format="pyarrow") \
        .write_parquet(out, mode="overwrite")
    with open(marker, "w") as f:
        f.write("ok")
    ray.shutdown()
    return out


def run_dedup_only(input_dir: str, num_cpus: int) -> dict:
    """One timed dedup run in this process. Env knobs (for --scaling /
    --scale-path parents): GRAFT_FORCE_SCALE_PATH=1 forces the
    distributed-CC + join-verify path (broadcast_payload_max_bytes=0);
    GRAFT_CLUSTERS_OUT writes the cluster assignment to Parquet so the
    parent can compare outputs across paths."""
    import ray
    import ray.data as rd

    psutil = _psutil()
    _init_ray(num_cpus)
    from doppel_speller_ray.config import DedupConfig
    from doppel_speller_ray.pipelines.dedup import dedup_pipeline

    force_scale = os.environ.get("GRAFT_FORCE_SCALE_PATH") == "1"
    clusters_out = os.environ.get("GRAFT_CLUSTERS_OUT")

    files = input_dir if os.path.isdir(input_dir) else input_dir
    n_docs = rd.read_parquet(files, columns=["doc_id"]).count()  # warms cache
    cfg = DedupConfig(max_chars=None,
                      broadcast_payload_max_bytes=0 if force_scale
                      else DedupConfig.broadcast_payload_max_bytes)
    cpu0 = _total_cpu_seconds(psutil)
    t0 = time.perf_counter()
    res = dedup_pipeline(rd.read_parquet(files, columns=["doc_id", "text"]),
                         cfg, use_distributed_cc=True if force_scale else None)
    if clusters_out:
        res.clusters.write_parquet(clusters_out, mode="overwrite")
    else:
        res.clusters.count()
    dt = time.perf_counter() - t0
    if os.environ.get("GRAFT_PRINT_STATS") == "1":
        # per-stage Ray Data execution stats (wall, cpu, rows, object-store
        # bytes per operator) — the tuning feedback loop, to stderr so the
        # stdout JSON contract is untouched
        print(res.clusters.stats(), file=sys.stderr)
    cpu = _total_cpu_seconds(psutil) - cpu0
    ray.shutdown()
    return {"metric": "dedup_e2e_seconds", "value": round(dt, 3), "unit": "sec",
            "num_cpus": num_cpus, "n_docs": n_docs,
            "docs_per_sec": round(n_docs / dt, 1),
            "cpu_core_seconds": round(cpu, 1),
            "forced_scale_path": force_scale}


def _dedup_subprocess(input_dir: str, ncpu: int, extra_env: dict | None = None) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_DEDUP_INPUT=input_dir)
    if extra_env:
        env.update(extra_env)
    out = subprocess.run([sys.executable, os.path.abspath(__file__),
                          "--dedup-only"],
                         env=env, capture_output=True, text=True,
                         check=True).stdout
    return json.loads(out.strip().splitlines()[-1])


def run_scaling() -> dict:
    """Same job, same input, fresh processes, two parallelism levels
    (8 vs 32 CPUs) — the in-sandbox stand-in for N vs 4N nodes.

    Jitter-robust design (VERDICT r2 item 1, replacing best-of-N legs):
    PAIRED legs — each trial runs one 8-CPU and one 32-CPU subprocess
    back-to-back (order alternating trial to trial) so slow host phases
    hit both legs of a pair, not one side of the comparison; the reported
    efficiency is the MEDIAN of the per-pair efficiencies over
    $GRAFT_SCALE_PAIRS (default 5) trials. A CPU core-seconds efficiency
    (work_8 / work_32, immune to co-tenant wall jitter: stolen cycles
    never enter our processes' CPU accounting) is reported alongside."""
    replicate = int(os.environ.get("GRAFT_SCALE_REPLICATE", "40"))
    input_dir = _scaled_input_dir(SF_DIR, replicate)
    n_pairs = int(os.environ.get("GRAFT_SCALE_PAIRS", "5"))
    # both legs run the SAME physical plan: partition count is pinned (as
    # it would be on a real cluster, where partitions are data-sized) —
    # otherwise the 32-CPU leg runs 128 task partitions vs the 8-CPU leg's
    # 32 and the comparison confounds plan shape with parallelism
    part_env = {"GRAFT_TASK_PARTITIONS":
                os.environ.get("GRAFT_TASK_PARTITIONS", "128")}

    trials = []
    for i in range(n_pairs):
        order = (8, 32) if i % 2 == 0 else (32, 8)
        legs = {ncpu: _dedup_subprocess(input_dir, ncpu, part_env)
                for ncpu in order}
        lo, hi = legs[8], legs[32]
        trials.append({
            "sec_8": lo["value"], "sec_32": hi["value"],
            "cpu_8": lo["cpu_core_seconds"], "cpu_32": hi["cpu_core_seconds"],
            "eff": round((lo["value"] / hi["value"]) / 4, 3),
        })

    def median(xs):
        xs = sorted(xs)
        n = len(xs)
        return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2

    effs = [t["eff"] for t in trials]
    med_8 = median([t["sec_8"] for t in trials])
    med_32 = median([t["sec_32"] for t in trials])
    cpu_med_8 = median([t["cpu_8"] for t in trials])
    cpu_med_32 = median([t["cpu_32"] for t in trials])
    n_docs = _dedup_count(input_dir)
    return {
        "metric": "scaling_efficiency",
        "value": round(median(effs), 3),           # median of paired effs
        "unit": "ratio",
        "eff_of_medians": round((med_8 / med_32) / 4, 3),
        "eff_pairs": effs,
        "eff_spread": [min(effs), max(effs)],
        "cpu_efficiency": round(cpu_med_8 / cpu_med_32, 3),
        "cpu_core_seconds_8": cpu_med_8, "cpu_core_seconds_32": cpu_med_32,
        "sec_8": med_8, "sec_32": med_32,
        "docs_per_sec_8": round(n_docs / med_8, 1),
        "docs_per_sec_32": round(n_docs / med_32, 1),
        "n_docs": n_docs, "n_pairs": n_pairs,
        "sf": SF_DIR, "replicate": replicate,
    }


def _dedup_count(input_dir: str) -> int:
    import pyarrow.parquet as pq

    return sum(pq.ParquetFile(os.path.join(input_dir, f)).metadata.num_rows
               for f in os.listdir(input_dir) if f.endswith(".parquet"))


def run_scale_path() -> dict:
    """Force the 100×-scale execution path end-to-end at bench scale
    (VERDICT r2 item 2): distributed large-star/small-star CC + join-based
    payload attach + join cluster assignment — the code that engages above
    the 200M-pair / broadcast-payload thresholds — on the same replicated
    corpus as --scaling, and assert its cluster assignment is IDENTICAL to
    the default (broadcast + driver-CC) path's."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    replicate = int(os.environ.get("GRAFT_SCALE_REPLICATE", "40"))
    input_dir = _scaled_input_dir(SF_DIR, replicate)
    out_default = "/tmp/graft_clusters_default"
    out_forced = "/tmp/graft_clusters_forced"

    base = _dedup_subprocess(input_dir, NUM_CPUS,
                             {"GRAFT_CLUSTERS_OUT": out_default})
    forced = _dedup_subprocess(input_dir, NUM_CPUS,
                               {"GRAFT_CLUSTERS_OUT": out_forced,
                                "GRAFT_FORCE_SCALE_PATH": "1"})

    def load(d):
        t = pq.read_table(d, columns=["doc_id", "cluster_id"])
        return t.sort_by("doc_id")

    a, b = load(out_default), load(out_forced)
    match = (len(a) == len(b)
             and pc.all(pc.equal(a["doc_id"], b["doc_id"])).as_py()
             and pc.all(pc.equal(a["cluster_id"], b["cluster_id"])).as_py())
    n_clusters = len(pc.unique(a["cluster_id"]))
    return {
        "metric": "dedup_scalepath_seconds",
        "value": forced["value"], "unit": "sec",
        "default_seconds": base["value"],
        "clusters_match": bool(match),
        "n_docs": forced["n_docs"], "n_clusters": n_clusters,
        "num_cpus": NUM_CPUS, "sf": SF_DIR, "replicate": replicate,
        "docs_per_sec": forced["docs_per_sec"],
    }


def run_recall() -> dict:
    """Dup-pair recall/precision at bench scale (the other half of the
    north-rule metric: 'throughput + dup-pair recall >= 0.99').

    Truth: the replicated corpus from :func:`_scaled_input_dir` — every
    ``replicate`` consecutive ids (``doc_id // replicate`` constant) are
    seeded-misspelling variants of one original, so all within-group pairs
    are true near-dups. Recall = fraction of those pairs the pipeline puts
    in one cluster. Precision is computed against the SAME group truth and
    is therefore a lower bound: two different originals that are genuinely
    similar in the base corpus count as false positives here.

    All pair counting is distributed (groupby-aggregate over the cluster
    table; Σ c·(c−1)/2 per group) — nothing corpus-sized on the driver, so
    the same code path measures a 10^12-row cluster table.
    """
    import ray
    import ray.data as rd

    replicate = int(os.environ.get("GRAFT_SCALE_REPLICATE", "40"))
    input_dir = _scaled_input_dir(SF_DIR, replicate)
    out_dir = "/tmp/graft_recall_clusters"
    run = _dedup_subprocess(input_dir, NUM_CPUS,
                            {"GRAFT_CLUSTERS_OUT": out_dir})

    _init_ray(NUM_CPUS)
    clusters = rd.read_parquet(out_dir, columns=["doc_id", "cluster_id"])
    stats = dup_pair_stats(clusters, replicate)
    ray.shutdown()
    return {
        "metric": "dup_pair_recall", "value": stats["recall"],
        "unit": "ratio",
        "precision_lower_bound": stats["precision_lower_bound"],
        "truth_pairs": stats["truth_pairs"], "hit_pairs": stats["hit_pairs"],
        "predicted_pairs": stats["predicted_pairs"],
        "n_docs": run["n_docs"], "dedup_seconds": run["value"],
        "docs_per_sec": run["docs_per_sec"], "num_cpus": NUM_CPUS,
        "sf": SF_DIR, "replicate": replicate,
    }


def _pair_sum(ds, keys) -> int:
    """Σ over groups of count·(count−1)/2, via groupby().count() then a
    vectorized per-batch partial sum."""
    import pyarrow as pa

    counts = ds.groupby(keys).count()

    def partial(t: pa.Table) -> pa.Table:
        import numpy as np

        c = t["count()"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"pairs": pa.array([int((c * (c - 1) // 2).sum())],
                                           pa.int64())})

    parts = counts.map_batches(partial, batch_format="pyarrow")
    return int(sum(r["pairs"] for r in parts.take_all()))


def dup_pair_stats(clusters_ds, replicate: int) -> dict:
    """Recall/precision of a (doc_id, cluster_id) Dataset against the
    replicated-corpus truth (``doc_id // replicate`` = original group).
    Fully distributed: three groupby-aggregates, O(1) driver state."""

    def with_orig(t):
        import pyarrow as pa

        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.append_column("orig_id",
                               pa.array(ids // replicate, pa.int64()))

    ds = clusters_ds.map_batches(with_orig, batch_format="pyarrow")
    hit = _pair_sum(ds, ["orig_id", "cluster_id"])
    truth = _pair_sum(ds, ["orig_id"])
    predicted = _pair_sum(ds, ["cluster_id"])
    return {
        "recall": round(hit / truth, 5) if truth else 1.0,
        "precision_lower_bound": round(hit / predicted, 5) if predicted else 1.0,
        "truth_pairs": truth, "hit_pairs": hit, "predicted_pairs": predicted,
    }


def run_ceiling(num_cpus: int) -> dict:
    """Control experiment: embarrassingly parallel, zero-shuffle numpy work.

    Bounds what ANY pipeline can show for 8→32 scaling on this machine —
    on this sandbox's virtualized cores the control itself reaches only
    ~0.55 efficiency (memory-bandwidth / host oversubscription), so
    pipeline efficiencies must be read against this ceiling, not 1.0.
    """
    import numpy as np
    import ray
    import ray.data as rd

    _init_ray(num_cpus)

    def burn(batch):
        x = np.random.default_rng(int(batch["id"][0])).normal(size=(600, 600))
        for _ in range(40):
            x = x @ x.T / 600
        return {"id": batch["id"], "v": np.full(len(batch["id"]), float(x[0, 0]))}

    psutil = _psutil()
    ds = rd.range(128).map_batches(burn, batch_format="numpy", batch_size=1)
    cpu0 = _total_cpu_seconds(psutil)
    t0 = time.perf_counter()
    ds.count()
    dt = time.perf_counter() - t0
    cpu = _total_cpu_seconds(psutil) - cpu0
    ray.shutdown()
    return {"metric": "ceiling_seconds", "value": round(dt, 3),
            "num_cpus": num_cpus, "cpu_core_seconds": round(cpu, 1)}


def run_ceiling_pair() -> dict:
    """The --ceiling measurement: the zero-shuffle numpy control at 8 and
    32 CPUs in fresh subprocesses; `value` is the wall scaling efficiency
    of the control (the honest ceiling any pipeline number must be read
    against on this host)."""
    lo = subprocess.run([sys.executable, os.path.abspath(__file__),
                         "--ceiling-one"],
                        env=dict(os.environ, RAY_GRAFT_CPUS="8"),
                        capture_output=True, text=True, check=True).stdout
    hi = subprocess.run([sys.executable, os.path.abspath(__file__),
                         "--ceiling-one"],
                        env=dict(os.environ, RAY_GRAFT_CPUS="32"),
                        capture_output=True, text=True, check=True).stdout
    lo_j = json.loads(lo.strip().splitlines()[-1])
    hi_j = json.loads(hi.strip().splitlines()[-1])
    lo_v, hi_v = lo_j["value"], hi_j["value"]
    return {"metric": "ceiling_efficiency",
            "value": round((lo_v / hi_v) / 4, 3),
            "sec_8": lo_v, "sec_32": hi_v,
            "cpu_core_seconds_8": lo_j.get("cpu_core_seconds"),
            "cpu_core_seconds_32": hi_j.get("cpu_core_seconds"),
            "cpu_efficiency": round(
                lo_j["cpu_core_seconds"] / hi_j["cpu_core_seconds"], 3)
            if lo_j.get("cpu_core_seconds") else None}


def run_scaling_watch() -> dict:
    """Window-catcher for the official scaling number: poll the
    host-ceiling gate (BASELINE round-3 protocol — an official --scaling
    attempt is honest only when the zero-shuffle control itself scales
    ≥ GRAFT_WATCH_GATE, default 0.58, from 8→32 CPUs) and fire
    run_scaling() the FIRST time the gate clears. Nothing else may run on
    the host during the watch. GRAFT_WATCH_TRIES attempts (default 8),
    GRAFT_WATCH_GAP seconds apart (default 900). Emits each gate check to
    stderr; stdout stays one JSON line (the scaling result, or the gate
    log if the window never opened)."""
    tries = int(os.environ.get("GRAFT_WATCH_TRIES", "8"))
    gap = int(os.environ.get("GRAFT_WATCH_GAP", "900"))
    gate = float(os.environ.get("GRAFT_WATCH_GATE", "0.58"))
    # a clear must come from a FAST 32-leg, not a storm-degraded 8-leg
    # (observed: sec_8 10.35 s vs its ~5.5 s clean norm opened the gate
    # spuriously and the fired run spread 0.221-0.802 across pairs)
    sec8_max = float(os.environ.get("GRAFT_WATCH_SEC8_MAX", "7.0"))
    log = []
    for i in range(tries):
        c = run_ceiling_pair()
        log.append(c["value"])
        print(json.dumps({"watch_attempt": i, **c}), file=sys.stderr,
              flush=True)
        if c["value"] >= gate and c["sec_8"] <= sec8_max:
            res = run_scaling()
            res["ceiling_at_fire"] = c["value"]
            res["ceiling_log"] = log
            return res
        if i < tries - 1:
            time.sleep(gap)
    return {"metric": "scaling_watch_gate_never_cleared", "gate": gate,
            "ceiling_log": log}


if __name__ == "__main__":
    if "--ceiling" in sys.argv:
        print(json.dumps(run_ceiling_pair()))
    elif "--scaling-watch" in sys.argv:
        print(json.dumps(run_scaling_watch()))
    elif "--ceiling-one" in sys.argv:
        print(json.dumps(run_ceiling(NUM_CPUS)))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--scale-path" in sys.argv:
        print(json.dumps(run_scale_path()))
    elif "--recall" in sys.argv:
        print(json.dumps(run_recall()))
    elif "--dedup-only" in sys.argv:
        # default to the documents table, not the sf dir (which holds
        # every table and would read mixed schemas)
        print(json.dumps(run_dedup_only(
            os.environ.get("GRAFT_DEDUP_INPUT",
                           os.path.join(SF_DIR, "documents.parquet")),
            NUM_CPUS)))
    else:
        print(json.dumps(run_bench(SF_DIR, NUM_CPUS)))
