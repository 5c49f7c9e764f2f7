"""doppel_speller_ray — a Ray-Data-native near-duplicate detection + clustering engine.

Re-expresses the capabilities of the reference `doppel-speller` project
(`/root/reference/`, mhaseebtariq/doppel-speller) as idiomatic Ray Data
pipelines: `ray.data.Dataset` → `map_batches` over zero-copy Arrow batches,
actor pools for stateful stages, groupby/aggregate shuffles for the wide
steps, and streaming execution throughout.

Layout:
    functions/  pure, vectorized kernels (normalize, shingle, minhash, simhash,
                levenshtein, text stats) — no Ray imports
    stages/     map_batches / map_groups stage callables (Ray-facing)
    sources/    readers, schema adapters, deterministic fixture generators
    state/      union-find / connected components, IDF tables, broadcasts
    pipelines/  end-to-end Dataset pipelines (dedup, matching, analysis, ann)

Nothing in this package calls ``ray.init()`` / ``ray.shutdown()`` — sessions
are owned by the caller (bench.py, CLI, test fixtures, or the driver).
"""

__version__ = "0.1.0"
