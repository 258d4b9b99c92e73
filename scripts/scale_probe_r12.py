"""Round-12 scale rehearsal probes: the snapshot-protocol family.

Measures every round-12 table-format query at sf0.1 vs the honest 10x
fixture (/tmp/dock_sf1 from scripts/make_sf1_fixture.py). Expected
shapes:

- timetravel / expire / schema-evolution / WAP: dominated by the
  publish writes (linear in data written) + metadata reads (flat);
- concurrent CAS: two publishes + two filtered repacks — linear;
- compaction + manifest-pruned read: deliberately publish at the
  SMALL budget (500 tokens/shard), so shard-directory COUNT grows 10x
  — these two are small-files stress tests by design and their wall
  is file-count-bound, not row-bound (the pruned read's DATA cost
  tracks selectivity; its publish cost is the stress);
- CDF merge/upsert: one key-shuffled full-outer join — linear;
- x23: 4 fixed micro-batches, each a stage+manifest+CAS cycle whose
  merge input grows linearly.

Methodology matches scale_probe_r9/r10/r11: one warm pass thrown
away, 3 timed passes, medians reported.

Run:  python scripts/scale_probe_r12.py
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
    "pipeline_snapshot_timetravel",
    "pipeline_concurrent_commit_cas",
    "pipeline_compact_snapshot",
    "pipeline_snapshot_expire",
    "pipeline_snapshot_changes",
    "pipeline_write_audit_publish",
    "pipeline_manifest_pruned_read",
    "pipeline_snapshot_schema_evolution",
    "pipeline_snapshot_merge_upsert",
    "x23_stream_snapshot_publish",
)
N = 3


def timed(spark, name, sf_dir):
    t0 = time.time()
    engine.QUERIES[name](spark, sf_dir).collect()
    return round(time.time() - t0, 3)


def main() -> int:
    spark = get_spark("scale-probe-r12")
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
    with open("/tmp/scale_probe_r12.json", "w") as fh:
        json.dump(out, fh, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
