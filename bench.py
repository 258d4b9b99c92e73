"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline set: one representative per operator family — scan+agg, star
join, window, as-of, streaming twin, and the LLM-data operators (dedup,
similarity, text) whose 100 TB behavior the engine is designed around.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import dock_financial_data_pipelines_spark as engine
from dock_financial_data_pipelines_spark.session import get_spark

engine.load_all()

HEADLINE = [
    "flagship_segment_monthly_revenue",
    "a1_pricing_summary",
    "j1_inner_join",
    "j9_star_join",
    "j8_asof_join",
    "w3_running_balance",
    "w6_topk_per_group",
    "x1_tumbling_window",
    "x3_session_window",
    "q_daily_statement",
    "l2_term_frequency",
    "l3_exact_dedup_keep_first",
    "l4_minhash_lsh_neardup",
    "l5_cosine_topk",
    "l_quality_score",
    "f6_json_extraction",
    "tpch_q3_shipping_priority",
    "tpch_q10_returned_items",
    "j8_asof_join_sortmerge",
    "a9_salted_skew_agg",
    "report_region_market_share",
    "l5_ann_lsh_topk",
    # round-3 additions: decorrelated subqueries, text quality filters,
    # event-stream analytics
    "tpch_q21_waiting_suppliers",
    "tpch_q5_local_supplier_volume",
    "l_repetition_stats",
    "q_retention_cohorts",
    # round-4 additions (appended AFTER existing entries so round-over-
    # round stays attributable query-for-query): training-data prep
    "l_pack_sequences",
    "l_chunk_exact_dedup",
    "l_unigram_logprob",
    "q_ledger_reconciliation",
    # round-6 additions (appended AFTER existing entries): the ANN/dedup
    # family SQL-oracled in round 5 — their bucketed/broadcast plans are
    # the engine's 100 TB scale path, so they belong in the headline.
    "l5_ivf_topk",
    "l_semantic_dedup",
    "l_incremental_dedup",
    # round-7 additions (appended AFTER existing entries): the three
    # join-shape-bearing round-6 operators whose 100 TB plans deserve
    # round-over-round tracking — end-to-end dedup funnel, banded
    # duplicate-payment screen, anchor-join substring span dedup.
    "l_dedup_funnel_e2e",
    "q_duplicate_payments_fuzzy",
    "l_substring_span_pairs",
    # round-8 additions (appended AFTER existing entries): the new
    # ANN/dedup components with real join/training shapes — wrapper
    # pair audit (df-capped candidate join), IVF nProbe recall curve
    # (shared trained quantizer), PQ codebook training.
    "l_wrapper_pair_audit",
    "l_ann_nprobe_curve",
    "l_pq_codebook",
    # round-10 additions (appended AFTER existing entries): the
    # sharded-dedup planning family's plan-shape bearers — the
    # end-to-end two-pass staging pipeline (real sink round-trip),
    # the 4x-explode shard-count advisor, and the relational
    # join-skew advisor (frequency-table partition model).
    "pipeline_sharded_dedup",
    "l_shard_count_advisor",
    "j17_join_skew_advisor",
]


def _time_one(spark, name: str, sf_dir: str) -> float:
    t0 = time.time()
    df = engine.QUERIES[name](spark, sf_dir)
    # noop sink: materializes every column/row (count() would let
    # Catalyst prune the projections we're trying to measure).
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5")))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("dock-fdp-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen paths once so per-query numbers measure the
    # plan, not first-run JIT + session setup. The warmup run is timed
    # and recorded SEPARATELY (never mixed into the samples) so the
    # round record can attribute container-to-container JIT variance.
    t0 = time.time()
    engine.QUERIES["a1_pricing_summary"](spark, sf_dir).collect()
    warmup_sec = round(time.time() - t0, 3)

    # n_runs passes over the whole suite (pass-major order, so run k of
    # query A is separated from run k+1 by the full suite — adjacent
    # repeats would overstate cache warmth). Reported headline value is
    # the per-query MEDIAN of the n_runs samples (r6 showed 17.6-23.2 s
    # min-based spread across container runs; medians over 5 passes are
    # the stable comparator). Mins ride along in the detail file so
    # pre-r7 rounds, whose headline was min-based, stay diffable.
    samples: dict[str, list[float]] = {}
    for _ in range(n_runs):
        for name in HEADLINE:
            samples.setdefault(name, []).append(_time_one(spark, name, sf_dir))

        # Skew/scale probe: re-run the join-heavy headliners with ALL
        # broadcasting off (auto threshold -1 + engine hints disabled via
        # spark.dock.disableBroadcastHints) so the SortMergeJoin + AQE
        # skew-split path is what gets measured — the plan shape these
        # queries degrade to at 100 TB when a dimension outgrows the
        # broadcast threshold. Recorded as "<name>__noBroadcast".
        prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.dock.disableBroadcastHints", "true")
        try:
            for name in (
                "flagship_segment_monthly_revenue",
                "j9_star_join",
                "report_region_market_share",
            ):
                samples.setdefault(f"{name}__noBroadcast", []).append(
                    _time_one(spark, name, sf_dir)
                )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
            spark.conf.set("spark.dock.disableBroadcastHints", "false")

    per_query = {n: round(_median(xs), 3) for n, xs in samples.items()}
    mins = {n: round(min(xs), 3) for n, xs in samples.items()}
    total = round(sum(per_query.values()), 3)
    # Subtotals over the queries earlier rounds' suites also ran, so
    # "value" growing from suite EXPANSION can't read as a perf
    # regression: value_shared_r3 excludes everything added in r4+,
    # value_shared_r5 excludes the r6+r7 additions, value_shared_r6
    # excludes only the r7 additions.
    r8_added = {
        "l_wrapper_pair_audit",
        "l_ann_nprobe_curve",
        "l_pq_codebook",
    }
    r7_added = {
        "l_dedup_funnel_e2e",
        "q_duplicate_payments_fuzzy",
        "l_substring_span_pairs",
    } | r8_added
    r6_added = {
        "l5_ivf_topk",
        "l_semantic_dedup",
        "l_incremental_dedup",
    } | r7_added
    r4_added = {
        "l_pack_sequences",
        "l_chunk_exact_dedup",
        "l_unigram_logprob",
        "q_ledger_reconciliation",
    } | r6_added
    shared_r3 = round(
        sum(v for n, v in per_query.items() if n not in r4_added), 3
    )
    shared_r5 = round(
        sum(v for n, v in per_query.items() if n not in r6_added), 3
    )
    shared_r6 = round(
        sum(v for n, v in per_query.items() if n not in r7_added), 3
    )
    shared_r7 = round(
        sum(v for n, v in per_query.items() if n not in r8_added), 3
    )
    summary = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        # Statistic behind "value"/"queries". Rounds <= 6 used per-query
        # MIN (no marker field); round 7+ use per-query MEDIAN of n_runs
        # samples. Cross-round consumers must not diff a median-based
        # file against a min-based one — check this field first; mins
        # still ride along as "queries_min" in BENCH_DETAIL.json.
        "headline_stat": "median",
        "queries": per_query,
        "n_runs": n_runs,
        "warmup_sec": warmup_sec,
        "value_shared_r3": shared_r3,
        "value_shared_r5": shared_r5,
        "value_shared_r6": shared_r6,
        "value_shared_r7": shared_r7,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # environment attribution for round-over-round reads:
        # a rebuilt container (new Spark/JVM/testdata files)
        # shifts every query by a fixed offset.
        "spark": __import__("pyspark").__version__,
        # r8 root-cause note for the r3-suite drift (17.6->19.4 s over
        # rounds 3-7; a1 +50%, j1 +52% with unchanged code): an
        # isolated fresh-session probe (warmup + 7 reps of a1/j1 only,
        # no registry sweep, no suite) reproduces the full-bench
        # medians exactly (a1 ~1.25 s, j1 ~0.93 s), ruling out
        # registry-import/fixture-cache/session-state growth. The
        # fixture parquet is written as a SINGLE row group per table
        # (lineitem sf0.1: 600k rows / 1 row group / 10.8 MB), so the
        # scan+partial-agg stage runs on ONE task regardless of core
        # count; per-query time is single-core speed + fixed job
        # overhead, both of which move with each round's container
        # rebuild. Environmental, not code; compare shared subtotals
        # run-over-run, not across containers.
        "drift_note": "r3-suite drift is container-environmental: "
                      "isolated probe == full-bench medians; scan "
                      "parallelism capped at 1 by single-row-group "
                      "fixture parquet (see bench.py comment)",
    }
    # Full detail (per-query medians + raw samples) goes to a file: the
    # round driver captures only the last 2000 chars of stdout, and the
    # r4/r5 suite outgrew that when medians rode along on stdout
    # ("parsed": null in BENCH_r04/05.json). The stdout line carries the
    # compact summary; medians/samples live in BENCH_DETAIL.json.
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_DETAIL.json"),
    )
    with open(detail_path, "w") as fh:
        json.dump(
            {
                **summary,
                "queries_min": mins,
                "samples": {n: [round(x, 3) for x in xs]
                            for n, xs in samples.items()},
            },
            fh,
            indent=1,
        )
    line = json.dumps(summary)
    if len(line) > 1900:  # stay under the driver's 2000-char tail capture
        slim = dict(summary)
        slim["queries"] = {n: round(v, 2) for n, v in per_query.items()}
        line = json.dumps(slim)
        if len(line) > 1900:
            slim.pop("queries")
            slim["queries_in"] = os.path.basename(detail_path)
            line = json.dumps(slim)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
