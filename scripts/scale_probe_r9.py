"""Round-9 scale rehearsal probes (VERDICT r8 items 3b and 4).

Measures, at sf0.1 and at the honest 10x fixture (/tmp/dock_sf1, built
by scripts/make_sf1_fixture.py which now tiles orders/lineitem/events
facts 10x and copies dims verbatim):

- a48_bootstrap_ci        (heaviest non-dedup analytic in the bench)
- x17_stream_late_data_drop (stream drain: 4-chunk watermark staircase)
- j9_star_join            hinted vs broadcast-disabled (the r8 parity
                          anomaly: 0.59 s hinted vs 0.53 s noBroadcast
                          at sf0.1 — decide at 10x which plan wins)

Methodology matches SCALE.md's round-8 rehearsal: warm JVM (one thrown
away pass), then 3 timed passes per query, medians reported. Run:

    python scripts/scale_probe_r9.py
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
N = 3


def timed(spark, name, sf_dir):
    t0 = time.time()
    engine.QUERIES[name](spark, sf_dir).collect()
    return round(time.time() - t0, 3)


def main() -> int:
    spark = get_spark("scale-probe-r9")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for tag, sf_dir in SFS.items():
        for name in ("a48_bootstrap_ci", "x17_stream_late_data_drop"):
            timed(spark, name, sf_dir)  # warm
            xs = [timed(spark, name, sf_dir) for _ in range(N)]
            out[f"{name}@{tag}"] = round(statistics.median(xs), 3)
            print(f"{name}@{tag}: {xs} -> {out[f'{name}@{tag}']}", flush=True)

        # j9 hinted vs broadcast-disabled
        timed(spark, "j9_star_join", sf_dir)
        xs = [timed(spark, "j9_star_join", sf_dir) for _ in range(N)]
        out[f"j9_star_join@{tag}"] = round(statistics.median(xs), 3)
        print(f"j9_star_join@{tag}: {xs}", flush=True)

        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.dock.disableBroadcastHints", "true")
        try:
            timed(spark, "j9_star_join", sf_dir)
            xs = [timed(spark, "j9_star_join", sf_dir) for _ in range(N)]
            out[f"j9_star_join__noBroadcast@{tag}"] = round(
                statistics.median(xs), 3
            )
            print(f"j9_star_join__noBroadcast@{tag}: {xs}", flush=True)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.conf.set("spark.dock.disableBroadcastHints", "false")

    print(json.dumps(out, indent=2))
    with open("/tmp/scale_probe_r9.json", "w") as fh:
        json.dump(out, fh, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
