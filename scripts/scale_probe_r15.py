"""Round-15 scaling spot-check (VERDICT r14 item 4): 8 vs 32 cores at
sf1 on the bench's slowest queries, to separate per-job fixed overhead
(core-count-invariant) from genuinely parallel compute (should scale).

At sf0.1 the whole suite is within ~3% between 8 and 32 cores, so core
ratios there measure nothing; /tmp/dock_sf1 (scripts/make_sf1_fixture.py,
an honest 10x corpus: duplicate rate preserved, cross-copy collisions
impossible) is the smallest fixture where parallel sections dominate.

Methodology: per core count, ONE subprocess (master is fixed per
session), one warm pass thrown away, 3 timed noop-sink passes, medians.
Writes/merges SCALE_r15.json: {query: {c8: s, c32: s, ratio: c8/c32}}.

Run:
    python scripts/scale_probe_r15.py --cpus 32
    python scripts/scale_probe_r15.py --cpus 8
    (never concurrently — core contention poisons both)
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NAMES = (
    # bench's slowest at r15 round start (BENCH_DETAIL medians, sf0.1)
    "x23_stream_snapshot_publish",
    "l_wrapper_pair_audit",
    "l_semantic_dedup",
    "pipeline_compact_snapshot",
    "pipeline_partition_evolution",
    "pipeline_snapshot_delete_vectors",
    "l_substring_span_pairs",
    "l_ann_nprobe_curve",
    "pipeline_sharded_dedup",
    "pipeline_training_data_release",
)
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "SCALE_r15.json",
)
N = 3


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--sf", default="/tmp/dock_sf1")
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_CPUS"] = str(args.cpus)

    import dock_financial_data_pipelines_spark as engine
    from dock_financial_data_pipelines_spark.session import get_spark

    engine.load_all()
    spark = get_spark(f"scale-probe-r15-c{args.cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    engine.QUERIES["a1_pricing_summary"](spark, args.sf).collect()

    key = f"c{args.cpus}"
    res = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            res = json.load(fh)
    for name in NAMES:
        fn = engine.QUERIES[name]
        spark.sparkContext.setJobDescription(f"scale:{name}")
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        ts = []
        for _ in range(N):
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(time.time() - t0)
        med = round(statistics.median(ts), 3)
        res.setdefault(name, {})[key] = med
        if "c8" in res[name] and "c32" in res[name]:
            res[name]["ratio_c8_over_c32"] = round(
                res[name]["c8"] / res[name]["c32"], 3
            )
        print(f"{name} {key}: {med}s  samples={[round(t,3) for t in ts]}",
              flush=True)
        with open(OUT, "w") as fh:
            json.dump(res, fh, indent=2, sort_keys=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
