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

import pandas as pd  # module-scope: pandas_udf type hints resolve here

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import dock_financial_data_pipelines_spark as engine
from dock_financial_data_pipelines_spark.session import get_spark
from pyspark.sql import functions as F

engine.load_all()

# Each headline entry carries the SUITE VERSION (round) it joined, and
# the shared-subtotal exclusion sets are DERIVED from these tags — the
# r10 regression was a hand-maintained exclusion chain that stopped at
# r8, so the three r10 additions silently leaked into every
# value_shared_* subtotal (published +24% r9->r10 drift where the true
# same-query drift was +7%). With tags, adding a query cannot corrupt
# an existing subtotal: value_shared_rK sums exactly the queries whose
# tag is <= K.
HEADLINE_ROUNDS: list[tuple[str, int]] = [
    ("flagship_segment_monthly_revenue", 1),
    ("a1_pricing_summary", 1),
    ("j1_inner_join", 1),
    ("j9_star_join", 1),
    ("j8_asof_join", 1),
    ("w3_running_balance", 1),
    ("w6_topk_per_group", 1),
    ("x1_tumbling_window", 1),
    ("x3_session_window", 1),
    ("q_daily_statement", 1),
    ("l2_term_frequency", 1),
    ("l3_exact_dedup_keep_first", 1),
    ("l4_minhash_lsh_neardup", 1),
    ("l5_cosine_topk", 1),
    ("l_quality_score", 1),
    ("f6_json_extraction", 1),
    ("tpch_q3_shipping_priority", 2),
    ("tpch_q10_returned_items", 2),
    ("j8_asof_join_sortmerge", 2),
    ("a9_salted_skew_agg", 2),
    ("report_region_market_share", 2),
    ("l5_ann_lsh_topk", 2),
    # round-3 additions: decorrelated subqueries, text quality filters,
    # event-stream analytics
    ("tpch_q21_waiting_suppliers", 3),
    ("tpch_q5_local_supplier_volume", 3),
    ("l_repetition_stats", 3),
    ("q_retention_cohorts", 3),
    # round-4 additions (appended AFTER existing entries so round-over-
    # round stays attributable query-for-query): training-data prep
    ("l_pack_sequences", 4),
    ("l_chunk_exact_dedup", 4),
    ("l_unigram_logprob", 4),
    ("q_ledger_reconciliation", 4),
    # round-6 additions: the ANN/dedup family SQL-oracled in round 5 —
    # their bucketed/broadcast plans are the engine's 100 TB scale path.
    ("l5_ivf_topk", 6),
    ("l_semantic_dedup", 6),
    ("l_incremental_dedup", 6),
    # round-7 additions: the three join-shape-bearing round-6 operators
    # whose 100 TB plans deserve round-over-round tracking.
    ("l_dedup_funnel_e2e", 7),
    ("q_duplicate_payments_fuzzy", 7),
    ("l_substring_span_pairs", 7),
    # round-8 additions: wrapper pair audit (df-capped candidate join),
    # IVF nProbe recall curve (shared trained quantizer), PQ codebook.
    ("l_wrapper_pair_audit", 8),
    ("l_ann_nprobe_curve", 8),
    ("l_pq_codebook", 8),
    # round-10 additions: sharded-dedup planning family plan-shape
    # bearers — two-pass staging pipeline (real sink round-trip),
    # 4x-explode shard-count advisor, join-skew advisor.
    ("pipeline_sharded_dedup", 10),
    ("l_shard_count_advisor", 10),
    ("j17_join_skew_advisor", 10),
    # round-11 additions: the plan-shape bearers — E2E release funnel
    # (real shard sink round-trip), iterative BPE training
    # (checkpointed vocab-grain rounds), Arrow-UDF model inference,
    # and the sampled layout advisor (the production probe whose cost
    # must track the sample, not the table).
    ("pipeline_training_data_release", 11),
    ("l_bpe_train_multistep", 11),
    ("l_model_quality_scorer", 11),
    ("s20_sort_layout_advisor_sampled", 11),
    ("l7_png_decode_audit", 12),
    ("pipeline_atomic_publish", 12),
    ("l_scorer_drift_monitor", 12),
    # snapshot-protocol bearers: compaction is the one full data pass
    # in the table-format layer; x23 prices the per-micro-batch
    # stage+manifest+CAS commit loop end-to-end.
    ("pipeline_compact_snapshot", 12),
    ("x23_stream_snapshot_publish", 12),
    # round-12 continuation bearers: merge-on-read deletes (broadcast
    # anti-join read + one scheduled compaction), incremental MV
    # maintenance (delta-sized aggregates + MV-grain merges), and the
    # recursive-CTE UnionLoop plan shape.
    ("pipeline_snapshot_delete_vectors", 12),
    ("pipeline_incremental_matview", 12),
    ("sql_recursive_bom_rollup", 12),
    # round-13 bearers: the flock-serialized CAS commit storm (the
    # table-format layer's concurrency price), spec-evolved pruned
    # reads, the inlined SQL-body UDF (zero-Python plan shape), and
    # the Arrow-native UDF boundary (ArrowEvalPython steady-state).
    ("pipeline_commit_storm", 13),
    ("pipeline_partition_evolution", 13),
    ("d9_sql_body_udf", 13),
    ("d10_arrow_native_udf", 13),
]
HEADLINE = [n for n, _ in HEADLINE_ROUNDS]
# The no-broadcast skew probes re-run round-1/2 queries; tag them with
# the base query's round so the derived subtotals keep their historical
# membership (the hand-built chain never excluded them either).
_ROUND_OF = {n: r for n, r in HEADLINE_ROUNDS}
for _base in (
    "flagship_segment_monthly_revenue",
    "j9_star_join",
    "report_region_market_share",
):
    _ROUND_OF[f"{_base}__noBroadcast"] = _ROUND_OF[_base]
# Suite-version boundaries the subtotals are published at. r3/r5/r6/r7
# keep their historical names and (now-corrected) membership; r9 is the
# pre-r10 suite, the comparator for r10+ rounds.
_SHARED_BOUNDARIES = (3, 5, 6, 7, 9)


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


def _calibrate_py() -> float:
    """Fixed single-core CPython probe: md5 chain over 256 MB in 64 KB
    blocks (deterministic work, no allocation churn). Per-query time at
    this fixture tracks container single-core speed (single-row-group
    parquet caps scan parallelism at 1 task — see drift_note), so this
    probe is the normalizer that separates code regressions from
    container drift."""
    import hashlib

    block = b"\x5a" * 65536
    t0 = time.time()
    h = hashlib.md5()
    for _ in range(4096):
        h.update(block)
    h.hexdigest()
    return round(time.time() - t0, 4)


def _calibrate_jvm(spark) -> float:
    """Fixed single-core JVM probe: 50M-row range sum on ONE partition
    (whole-stage codegen arithmetic, no I/O). Median of 3."""
    ts = []
    for _ in range(3):
        t0 = time.time()
        spark.range(0, 50_000_000, 1, 1).selectExpr(
            "sum(id * 2 + 1) AS s"
        ).collect()
        ts.append(time.time() - t0)
    return round(_median(ts), 4)


def _calibrate_arrow(spark) -> float:
    """Fixed Arrow python-worker probe: one tiny ArrowEvalPython
    round-trip (1M rows, identity pandas UDF, 1 partition). Median of
    3, run AFTER the Arrow pre-warm so it measures steady-state worker
    throughput, not spawn cost. Telemetry only — r12 attributed the
    l_model_quality_scorer 2.4x spread to python-worker spawn variance
    (0.37-3.7 s for identical work); this probe is the channel that
    confirms or acquits worker-side drift in future runs."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _ident(s: pd.Series) -> pd.Series:
        return s

    ts = []
    for _ in range(3):
        t0 = time.time()
        spark.range(0, 1_000_000, 1, 1).select(
            F.sum(_ident("id")).alias("s")
        ).collect()
        ts.append(time.time() - t0)
    return round(_median(ts), 4)


def _anchor_comparison(per_query: dict, calib_py: float, calib_jvm: float,
                       sf: str, calib_arrow: float = None) -> dict:
    """Compare this run against the pinned absolute anchor
    (BENCH_ANCHOR.json, written once per container era by
    scripts/make_bench_anchor.py). Returns {} when no anchor exists or
    the SF differs. vs_anchor is the raw shared-subset ratio;
    vs_anchor_calib_adjusted divides out container single-core drift
    (JVM probe ratio), so the within-2x gate reads against a FIXED
    anchor instead of compounding round-over-round container drift."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_ANCHOR.json")
    if not os.path.exists(path):
        return {}
    with open(path) as fh:
        anchor = json.load(fh)
    if str(anchor.get("sf")) != str(sf):
        return {}
    common = sorted(set(anchor["queries"]) & set(per_query))
    if not common:
        return {}
    cur = sum(per_query[n] for n in common)
    ref = sum(anchor["queries"][n] for n in common)
    out = {
        "anchor_era": anchor.get("era"),
        "anchor_shared_n": len(common),
        "vs_anchor": round(cur / ref, 4) if ref else None,
    }
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    if anchor.get("n_runs") not in (None, n_runs):
        # A 1-run smoke vs a 5-pass-median anchor compares cold first
        # touches (memoized index builds) against warm medians — flag
        # it so the ratio is not misread as a regression.
        out["anchor_n_runs_mismatch"] = True
    # Adjust with the CPython md5 probe, not the JVM one: measured
    # across r11 runs, calib_py held within ~3% while calib_jvm swung
    # 0.19-0.31 s (JIT/warmup-state volatile) against a ~7% query
    # move — adjusting by the volatile probe over-corrects. calib_jvm
    # still rides along as telemetry.
    a_py = anchor.get("calib_py_sec")
    if a_py and calib_py and ref:
        out["vs_anchor_calib_adjusted"] = round(
            (cur / ref) / (calib_py / a_py), 4
        )
    # Arrow worker drift channel (r13+): telemetry only, never an
    # adjuster — a big ratio here attributes slow ArrowEvalPython
    # queries to worker-side container state, not code.
    a_arrow = anchor.get("calib_arrow_sec")
    if a_arrow and calib_arrow:
        out["arrow_drift_vs_anchor"] = round(calib_arrow / a_arrow, 4)
    worst = None
    for n in common:
        if anchor["queries"][n] > 0.05:  # sub-50ms anchors are noise
            r = per_query[n] / anchor["queries"][n]
            if worst is None or r > worst[1]:
                worst = (n, round(r, 3))
    if worst:
        out["vs_anchor_worst_query"] = {worst[0]: worst[1]}
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5")))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    src_dir = sf_dir
    if sf_dir.startswith("/root/testdata/") and os.environ.get(
        "SPARK_GRAFT_BENCH_RAW_FIXTURE", ""
    ) != "1":
        # The driver-shipped parquet is ONE file + ONE row group per
        # table, which caps every scan stage at a single task (Spark
        # splits parquet by file byte ranges vs maxPartitionBytes) —
        # bench numbers then measure single-core container speed, not
        # the engine. Mirror into an 8-part-file fixture (rows byte-
        # identical, built/cached idempotently) so scans parallelize
        # the way any Spark-written table would. Opt out with
        # SPARK_GRAFT_BENCH_RAW_FIXTURE=1 to reproduce pre-r12 numbers.
        from scripts.make_bench_fixture import ensure_bench_fixture

        sf_dir = ensure_bench_fixture(
            sf_dir,
            f"/tmp/dock_bench_{os.path.basename(sf_dir.rstrip('/'))}_8f",
        )
    spark = get_spark("dock-fdp-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Scan-parallelism telemetry: partitions of a bare lineitem scan.
    scan_tasks = spark.read.parquet(
        os.path.join(sf_dir, "lineitem.parquet")
    ).rdd.getNumPartitions()

    # Warm the JVM/codegen paths once so per-query numbers measure the
    # plan, not first-run JIT + session setup. The warmup run is timed
    # and recorded SEPARATELY (never mixed into the samples) so the
    # round record can attribute container-to-container JIT variance.
    t0 = time.time()
    engine.QUERIES["a1_pricing_summary"](spark, sf_dir).collect()
    warmup_sec = round(time.time() - t0, 3)

    # Arrow pre-warm: spawn the python worker pool BEFORE any timed
    # sample so ArrowEvalPython queries (the r12 2.4x-variance shape)
    # measure steady-state reused workers, not first-spawn cost. One
    # pass of the scorer touches every partition's worker slot. Timed
    # separately, like warmup_sec, for round-record attribution.
    t0 = time.time()
    engine.QUERIES["l_model_quality_scorer"](spark, sf_dir).collect()
    warmup_arrow_sec = round(time.time() - t0, 3)

    # Container-speed calibration (run AFTER warmup so JIT is settled,
    # BEFORE the suite so it reflects the same container state).
    calib_py = _calibrate_py()
    calib_jvm = _calibrate_jvm(spark)
    calib_arrow = _calibrate_arrow(spark)

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
    # regression. Membership is DERIVED from HEADLINE_ROUNDS tags (see
    # comment there): value_shared_rK = sum of queries whose suite
    # round is <= K.
    # .get(n, 99): probe variants (e.g. __noBroadcast) and any future
    # untagged query fall outside every shared boundary instead of
    # KeyError-ing away the whole run's results.
    shared = {
        f"value_shared_r{k}": round(
            sum(v for n, v in per_query.items() if _ROUND_OF.get(n, 99) <= k),
            3,
        )
        for k in _SHARED_BOUNDARIES
    }
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
        "calib_py_sec": calib_py,
        "calib_jvm_sec": calib_jvm,
        "calib_arrow_sec": calib_arrow,
        "warmup_arrow_sec": warmup_arrow_sec,
        **shared,
        **_anchor_comparison(per_query, calib_py, calib_jvm, sf,
                             calib_arrow),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # Fixture attribution: the mirrored multi-file fixture (and the
        # scan parallelism it actually achieved) — r12 retired the
        # single-row-group scans that capped every stage at 1 task.
        "bench_fixture": sf_dir,
        "fixture_src": src_dir,
        "scan_tasks": scan_tasks,
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
        "drift_note": "r3-suite drift was container-environmental "
                      "(isolated probe == full-bench medians); the "
                      "single-row-group scan cap it documented is "
                      "RETIRED as of r12 — bench now runs on the "
                      "8-part-file mirror (see scripts/"
                      "make_bench_fixture.py and scan_tasks above)",
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
