"""Round-13 continuation scale probes: shallow clone, refs catalog,
polymorphic UDTF, collated compare, type-widened read, CBO advisor,
plus the SQL-surface batch (pipe syntax, parameter markers, session
variables, SQL-body UDFs, arrow-native UDF).

Expected shapes at 10x (/tmp/dock_sf1 from scripts/make_sf1_fixture.py):
clone/refs/UDTF are metadata- or constant-grain (flat); f11 is one
hash aggregate over customer (linear in the dim); s23 is a split
publish + widened scan of orders (linear, one-time fixture build
amortized by the warm pass); j18 is seven narrow stats scans (linear
in table bytes, the ANALYZE pass).

Methodology matches scale_probe_r9..r12: one warm pass thrown away,
3 timed passes, medians reported.

Run:  python scripts/scale_probe_r13b.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dock_financial_data_pipelines_spark as engine
from dock_financial_data_pipelines_spark.session import get_spark

engine.load_all()

SFS = {"sf0.1": "/root/testdata/sf0.1", "sf1": "/tmp/dock_sf1"}
NAMES = (
    "pipeline_shallow_clone",
    "pipeline_refs_catalog",
    "d8_udtf_dynamic_schema",
    "f11_collated_compare",
    "s23_type_widened_read",
    "j18_cbo_broadcast_advisor",
    "sql_pipe_syntax_report",
    "sql_parameterized_query",
    "sql_session_variables",
    "d9_sql_body_udf",
    "d10_arrow_native_udf",
    "pipeline_commit_constraints",
    "pipeline_row_lineage",
    "x26_python_datasource_stream",
)
N = 3


def timed(spark, name, sf_dir):
    t0 = time.time()
    engine.QUERIES[name](spark, sf_dir).collect()
    return round(time.time() - t0, 3)


def main() -> int:
    spark = get_spark("scale-probe-r13b")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for tag, sf_dir in SFS.items():
        for name in NAMES:
            timed(spark, name, sf_dir)  # warm
            xs = [timed(spark, name, sf_dir) for _ in range(N)]
            out[f"{name}@{tag}"] = round(statistics.median(xs), 3)
            print(f"{name}@{tag}: {xs} -> {out[f'{name}@{tag}']}", flush=True)

    for name in NAMES:
        a, b = out[f"{name}@sf0.1"], out[f"{name}@sf1"]
        out[f"{name}__ratio_10x"] = round(b / a, 2) if a else None
    print(json.dumps(out, indent=2))
    with open("/tmp/scale_probe_r13b.json", "w") as fh:
        json.dump(out, fh, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
