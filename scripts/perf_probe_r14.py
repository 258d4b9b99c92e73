"""Round-14 optimization probe: per-query timing breakdown.

For each named query, times the query-function call (the eager
protocol/drain part: stage writes, CAS commits, streaming drains) and
the noop-sink evaluation of the returned DataFrame separately, and
instruments the snapshot-protocol helpers with cumulative timers so
the expensive step inside a drain is attributable.

Usage:
    python scripts/perf_probe_r14.py [--sf DIR] [--reps N] name ...
    python scripts/perf_probe_r14.py --explain-dir plans/r14 --suffix before name ...

Never run concurrently with another Spark job (core contention).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dock_financial_data_pipelines_spark as engine
from dock_financial_data_pipelines_spark.session import get_spark

engine.load_all()

_ACC: dict[str, list] = defaultdict(lambda: [0, 0.0])  # name -> [calls, secs]


def _wrap(mod, fn_name: str):
    orig = getattr(mod, fn_name)

    def timed(*a, **kw):
        t0 = time.time()
        try:
            return orig(*a, **kw)
        finally:
            acc = _ACC[fn_name]
            acc[0] += 1
            acc[1] += time.time() - t0

    timed._perf_orig = orig
    setattr(mod, fn_name, timed)


def _instrument():
    from dock_financial_data_pipelines_spark.plans import pipeline as pl
    from dock_financial_data_pipelines_spark.sources import sinks as sk

    for name in (
        "_stage_version",
        "_commit_cas",
        "_read_visible",
        "_read_version",
        "_publish_version",
        "_commit_mor_delete",
        "_read_mor",
        "_shard_manifest",
        "_write_layout",
        "_append_commit_log",
    ):
        if hasattr(pl, name):
            _wrap(pl, name)
    for name in ("write_partitioned",):
        if hasattr(sk, name):
            _wrap(sk, name)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain-dir", default=None,
                    help="write df.explain('formatted') per query here")
    ap.add_argument("--suffix", default="probe",
                    help="filename suffix for --explain-dir files")
    ap.add_argument("--no-helpers", action="store_true")
    args = ap.parse_args()

    sf_dir = args.sf
    if sf_dir.startswith("/root/testdata/"):
        from scripts.make_bench_fixture import ensure_bench_fixture

        sf_dir = ensure_bench_fixture(
            sf_dir,
            f"/tmp/dock_bench_{os.path.basename(sf_dir.rstrip('/'))}_8f",
        )
    spark = get_spark("perf-probe-r14")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmups as bench.py so JIT/worker-pool state matches
    engine.QUERIES["a1_pricing_summary"](spark, sf_dir).collect()
    engine.QUERIES["l_model_quality_scorer"](spark, sf_dir).collect()

    if not args.no_helpers:
        _instrument()

    for name in args.names:
        fn = engine.QUERIES[name]
        for rep in range(args.reps):
            _ACC.clear()
            spark.sparkContext.setJobDescription(f"probe:{name}#{rep}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            helper_bits = "  ".join(
                f"{k}={v[1]:.3f}s/{v[0]}x"
                for k, v in sorted(_ACC.items(), key=lambda kv: -kv[1][1])
                if v[1] >= 0.05
            )
            print(
                f"{name} rep{rep}: build={t1 - t0:.3f}s sink={t2 - t1:.3f}s "
                f"total={t2 - t0:.3f}s  {helper_bits}",
                flush=True,
            )
            if args.explain_dir and rep == 0:
                os.makedirs(args.explain_dir, exist_ok=True)
                path = os.path.join(
                    args.explain_dir, f"{name}_{args.suffix}.txt"
                )
                with open(path, "w") as fh:
                    fh.write(df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution
                        .ExplainMode.fromString("formatted")))
                print(f"  explain -> {path}", flush=True)
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
