"""Pin the absolute per-query anchor for bench.py's fixed-anchor gate.

Reads the freshest BENCH_DETAIL.json (a full sf0.1 run that recorded
calib_py_sec/calib_jvm_sec) and writes BENCH_ANCHOR.json at the repo
root: per-query medians + the calibration probes + an era label.
bench.py then publishes vs_anchor (raw shared-subset ratio) and
vs_anchor_calib_adjusted (divided by the CPython single-core probe
ratio, calib_py — calib_jvm rides along as telemetry only; it was
rejected as the adjuster because JVM startup/JIT noise makes it too
volatile run-to-run) every run, so the "within 2x" gate reads against
this FIXED anchor
instead of compounding round-over-round container drift (which had
consumed 1.38x of the budget by round 10 with zero code regressions).

Re-run ONLY when deliberately re-basing (e.g. a container rebuild that
the calib probes cannot normalize, or a deliberate suite re-baseline);
note the era bump in the round log.

Usage: python scripts/make_bench_anchor.py <era-label>
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    era = sys.argv[1] if len(sys.argv) > 1 else "r11"
    with open(os.path.join(ROOT, "BENCH_DETAIL.json")) as fh:
        detail = json.load(fh)
    for key in ("calib_py_sec", "calib_jvm_sec"):
        if key not in detail:
            raise SystemExit(
                f"BENCH_DETAIL.json lacks {key} — run bench.py (r11+) first"
            )
    anchor = {
        "era": era,
        "sf": detail["sf"],
        "headline_stat": detail.get("headline_stat", "median"),
        "n_runs": detail.get("n_runs"),
        "spark": detail.get("spark"),
        "calib_py_sec": detail["calib_py_sec"],
        "calib_jvm_sec": detail["calib_jvm_sec"],
        # r13+: steady-state Arrow python-worker probe rides along as a
        # third telemetry channel (never an adjuster) so worker-side
        # drift is attributable separately from CPython/JVM drift.
        "calib_arrow_sec": detail.get("calib_arrow_sec"),
        "queries": detail["queries"],
    }
    out = os.path.join(ROOT, "BENCH_ANCHOR.json")
    with open(out, "w") as fh:
        json.dump(anchor, fh, indent=1)
    print(f"wrote {out}: era={era} sf={anchor['sf']} "
          f"n_queries={len(anchor['queries'])} "
          f"calib_jvm={anchor['calib_jvm_sec']}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
