"""Round-11 scale rehearsal probes (VERDICT r10 item 7 + r11 additions).

Closes the SCALE.md ledger gaps the round-10 judge named — the text
retrieval/divergence trio and the w23-w39 indicator family had no
measured sf1 row — and measures the four round-11 additions:

- l_bm25_score, l_jsd_source_divergence, l_source_overlap_matrix
- w23-w39 quant-indicator family (measured as min/median/max across
  the 17 members to keep the ledger readable; each member is also
  printed individually)
- s20_sort_layout_advisor_sampled (expect <= ~2x: the three sorts see
  only the 1% sample), l_model_quality_scorer (map-only: ~linear),
  l_shard_export_writer (sink-bound: ~linear), l_bpe_train_multistep
  (vocab-grain: sub-linear in corpus size; the 10x fixture suffixes
  tokens per copy, so vocab grows ~10x too — expect up to ~10x).

Methodology matches scale_probe_r9/r10: one warm pass thrown away,
3 timed passes, medians reported; sf0.1 vs the honest 10x fixture
(/tmp/dock_sf1 from scripts/make_sf1_fixture.py).

Run:  python scripts/scale_probe_r11.py
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
    "l_bm25_score",
    "l_jsd_source_divergence",
    "l_source_overlap_matrix",
    "s20_sort_layout_advisor_sampled",
    "l_model_quality_scorer",
    "l_shard_export_writer",
    "l_bpe_train_multistep",
) + tuple(f"w{i}_{n}" for i, n in (
    (23, "rsi"), (24, "donchian_channels"), (25, "stochastic_oscillator"),
    (26, "parkinson_volatility"), (27, "keltner_channels"), (28, "macd"),
    (29, "aroon"), (30, "ulcer_index"), (31, "obv"),
    (32, "chaikin_money_flow"), (33, "cci"), (34, "williams_r"),
    (35, "mfi"), (36, "trix"), (37, "vortex"), (38, "force_index"),
    (39, "elder_ray"),
))
N = 3


def timed(spark, name, sf_dir):
    t0 = time.time()
    engine.QUERIES[name](spark, sf_dir).collect()
    return round(time.time() - t0, 3)


def main() -> int:
    spark = get_spark("scale-probe-r11")
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
    w_ratios = [out[f"{n}__ratio_10x"] for n in NAMES if n.startswith("w")]
    out["w23_39_family_ratio_min_med_max"] = [
        min(w_ratios), round(statistics.median(w_ratios), 2), max(w_ratios)
    ]
    print(json.dumps(out, indent=2))
    with open("/tmp/scale_probe_r11.json", "w") as fh:
        json.dump(out, fh, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
