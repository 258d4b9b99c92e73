"""Round-10 scale rehearsal probes (VERDICT r9 item 3).

Closes the two >2 s bench lines that lacked measured sf1 rows:

- l_wrapper_pair_audit   (wrapper/dedup pair audit; expected index- or
                         fixed-overhead-bounded like its family peers)
- l_ann_nprobe_curve     (IVF nProbe recall curve; probe-bounded — work
                         scales with nProbe x centroid size, not corpus)

Measures at sf0.1 and the honest 10x fixture (/tmp/dock_sf1, built by
scripts/make_sf1_fixture.py — token-suffixed document copies, rotated
embedding copies, join-consistent tiled facts). Methodology matches
scripts/scale_probe_r9.py: one warm pass thrown away, 3 timed passes,
medians reported.

Run:  python scripts/scale_probe_r10.py
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
    "l_wrapper_pair_audit",
    "l_ann_nprobe_curve",
    # round-10 sharded-dedup planning family: the end-to-end
    # rehearsal VERDICT r9 item 7 asked for, measured at 10x
    "l_shard_count_advisor",
    "l_sharded_dedup_rehearsal",
    "l_cross_shard_neardup_rate",
    "pipeline_sharded_dedup",
    # layout probes (manufactured row groups: s20 pays 3 global
    # sorts by design — measure what that costs at 10x) and the
    # relational join-skew advisor (key-grain bounded)
    "s18_rowgroup_pruning_probe",
    "s20_sort_layout_advisor",
    "j17_join_skew_advisor",
)
N = 3


def timed(spark, name, sf_dir):
    t0 = time.time()
    engine.QUERIES[name](spark, sf_dir).collect()
    return round(time.time() - t0, 3)


def main() -> int:
    spark = get_spark("scale-probe-r10")
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
    with open("/tmp/scale_probe_r10.json", "w") as fh:
        json.dump(out, fh, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
