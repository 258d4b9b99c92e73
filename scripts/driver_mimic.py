"""Run the driver's correctness pass the way the DRIVER runs it: a
vanilla SparkSession (none of the engine's tuned confs pre-applied — they
must self-apply through catalog.load/tune inside each query), the
__spark_entry__ contract, and the first N registry entries compared
against their DuckDB oracles.

This is the difference between "check_all passes" (engine-owned session)
and "the sweep will pass" (driver-owned session): conf races, schema
inference, and timestamp-flavor handling only surface here.

Usage:
    python scripts/driver_mimic.py [N] [sf_dir]     # default 50 slots, sf0.01
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_slots = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("driver-mimic")
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(root, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # t1 smoke: entry() must produce >0 rows on a vanilla session.
    rows = mod.entry(spark).collect()
    print(f"entry(): {len(rows)} rows")
    assert rows, "entry() returned no rows"

    from tests._compare import compare_frames, duck_connection

    queries = mod.queries()
    oracles = mod.oracle_sql()
    head = list(queries)[:n_slots]
    con = duck_connection(sf_dir)
    failures = []
    for name in head:
        t0 = time.time()
        try:
            spark_pdf = queries[name](spark, sf_dir).toPandas()
            if name in oracles:
                compare_frames(spark_pdf, con.sql(oracles[name]).df(), name)
                verdict = "OK  "
            else:
                assert len(spark_pdf) >= 0
                verdict = "ROWS"
        except Exception as exc:  # noqa: BLE001 - report and continue
            verdict = "FAIL"
            failures.append((name, str(exc).splitlines()[0][:200]))
        print(f"{verdict}  {name:44s} {time.time() - t0:5.1f}s", flush=True)
    print(f"\n{len(head) - len(failures)}/{len(head)} passed")
    for name, err in failures:
        print(f"FAIL {name}: {err}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
