"""Fast iteration harness: run every registered query against its DuckDB
oracle in one Spark session; print a pass/fail table (doesn't stop on
first failure, unlike pytest -x)."""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dock_financial_data_pipelines_spark as engine
from dock_financial_data_pipelines_spark.session import get_spark
from tests._compare import compare_frames, duck_connection

engine.load_all()


def main() -> int:
    sf_dir = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")
    only = sys.argv[1:] or sorted(engine.QUERIES)
    spark = get_spark("check-all")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)
    failures = []
    for name in only:
        fn = engine.QUERIES[name]
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
            if name in engine.ORACLES:
                oracle_pdf = con.execute(engine.ORACLES[name]).df()
                compare_frames(spark_pdf, oracle_pdf, name)
                status = "OK   "
            else:
                status = "ROWS "
        except AssertionError as e:
            status = "DIFF "
            failures.append((name, str(e)))
        except Exception as e:
            status = "ERROR"
            failures.append((name, traceback.format_exc(limit=20)))
        print(f"{status} {name:40s} {time.time()-t0:6.1f}s", flush=True)
    print(f"\n{len(only) - len(failures)}/{len(only)} passed")
    for name, msg in failures:
        print(f"\n===== {name} =====\n{msg[:3000]}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
