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
            # Driver parity: its gate is an EXACT value-hash over the
            # column-name-sorted frame, so any dtype difference (int64 5
            # vs float64 5.0) or value bit-difference is a red row there.
            # Rehearse with the same strictness — no rtol, no dtype slack.
            pd.testing.assert_frame_equal(
                ray_df, ora_df, check_dtype=True, check_exact=True)
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
