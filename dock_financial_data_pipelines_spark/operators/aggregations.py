"""Aggregation operators (SURVEY.md §2-B A1-A7).

A1 is the TPC-H Q1 pricing-summary shape — the engine restatement of the
reference's daily balance report rollup (README:47-54). All hash
aggregates: Spark does partial (map-side) + final aggregation
automatically, so at 100 TB the shuffle carries only group keys ×
partial states, not raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dock_financial_data_pipelines_spark.catalog import dec_sum, load
from dock_financial_data_pipelines_spark.registry import query


# ---------------------------------------------------------------------------
# A1 — grouped sum/avg/min/max/count (TPC-H Q1 pricing summary)
# ---------------------------------------------------------------------------
@query(
    "a1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(CAST(l_extendedprice AS DECIMAL(27,2))), 2)::DOUBLE AS sum_base_price,
           round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))), 2)::DOUBLE AS sum_disc_price,
           round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(27,6))), 2)::DOUBLE AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           round(min(l_extendedprice), 2) AS min_price,
           round(max(l_extendedprice), 2) AS max_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY 1, 2
    """,
)
def a1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            dec_sum("l_extendedprice", scale=2).alias("sum_base_price"),
            dec_sum(disc_price).alias("sum_disc_price"),
            dec_sum(disc_price * (1 + F.col("l_tax")), scale=6).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# A2 — COUNT(DISTINCT)
# ---------------------------------------------------------------------------
@query(
    "a2_count_distinct",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_customers,
           count(*) AS n_orders
    FROM orders GROUP BY 1
    """,
)
def a2_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# A3 — approximate count-distinct (HLL). Sketch contents are
# engine-specific, so no SQL oracle: rows-only check. At 100 TB this is
# the *only* affordable distinct-count: one pass, bounded memory.
# ---------------------------------------------------------------------------
@query(
    "a3_approx_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_orders,
           count(DISTINCT o_custkey) AS exact_customers,
           TRUE AS approx_within_5pct
    FROM orders GROUP BY 1
    """,
)
def a3_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ sketch vs exact, tolerance-checked: the output carries the
    exact distinct count plus a boolean asserting the sketch landed
    within 5% (rsd=0.02 ⇒ ~3σ bound), so the DuckDB oracle hash-checks
    both the exact values and the approximation's accuracy."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_customers"),
            F.countDistinct("o_custkey").alias("exact_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            "o_orderstatus",
            "n_orders",
            "exact_customers",
            (
                F.abs(F.col("approx_customers") - F.col("exact_customers"))
                / F.col("exact_customers")
                <= 0.05
            ).alias("approx_within_5pct"),
        )
    )


# ---------------------------------------------------------------------------
# A4 — ROLLUP and CUBE
# ---------------------------------------------------------------------------
@query(
    "a4_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    -- Engine semantics: no input, no rows. Spark's rollup emits nothing
    -- on an empty relation; drop SQL's empty grand-total artifact (on
    -- non-empty input every rollup row aggregates >= 1 row, so this
    -- never changes a real result).
    HAVING count(*) >= 1
    """,
)
def a4_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


@query(
    "a4_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n,
           round(sum(CAST(o_totalprice AS DECIMAL(27,2))), 2)::DOUBLE AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    HAVING count(*) >= 1  -- engine semantics: no input, no rows (a4_rollup note)
    """,
)
def a4_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dec_sum("o_totalprice", scale=2).alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# A5 — HAVING
# ---------------------------------------------------------------------------
@query(
    "a5_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders,
           round(sum(CAST(o_totalprice AS DECIMAL(27,2))), 2)::DOUBLE AS total_spend
    FROM orders
    GROUP BY 1
    HAVING sum(o_totalprice) > 1500000
    """,
)
def a5_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(27,2)")).alias("_raw_total"),
        )
        .where(F.col("_raw_total") > 1500000)
        .select(
            "o_custkey",
            "n_orders",
            F.round("_raw_total", 2).cast("double").alias("total_spend"),
        )
    )


# ---------------------------------------------------------------------------
# A6 — pivot (event_type → columns); oracle uses FILTERed aggregates.
# ---------------------------------------------------------------------------
_EVENT_TYPES = ["click", "view", "signup", "purchase", "error"]


@query(
    "a6_pivot_event_types",
    oracle="""
    SELECT user_id,
           round(sum(CAST(value AS DECIMAL(27,6))) FILTER (WHERE event_type = 'click'), 2)::DOUBLE    AS click,
           round(sum(CAST(value AS DECIMAL(27,6))) FILTER (WHERE event_type = 'view'), 2)::DOUBLE     AS view,
           round(sum(CAST(value AS DECIMAL(27,6))) FILTER (WHERE event_type = 'signup'), 2)::DOUBLE   AS signup,
           round(sum(CAST(value AS DECIMAL(27,6))) FILTER (WHERE event_type = 'purchase'), 2)::DOUBLE AS purchase,
           round(sum(CAST(value AS DECIMAL(27,6))) FILTER (WHERE event_type = 'error'), 2)::DOUBLE    AS error
    FROM events GROUP BY 1
    """,
)
def a6_pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Explicit pivot values: avoids the extra distinct-values job and keeps
    # the output schema stable (required at scale and for the oracle).
    return (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.round(F.sum(F.col("value").cast("decimal(27,6)")), 2).cast("double"))
    )


# ---------------------------------------------------------------------------
# A7 — collect_set (order-insensitive via sort_array + join to string)
# ---------------------------------------------------------------------------
@query(
    "a7_collect_set",
    oracle="""
    SELECT l_returnflag,
           array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
           count(DISTINCT l_linestatus) AS n_statuses
    FROM lineitem GROUP BY 1
    """,
)
def a7_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.array_join(F.sort_array(F.collect_set("l_linestatus")), ",").alias(
                "statuses"
            ),
            F.countDistinct("l_linestatus").alias("n_statuses"),
        )
    )


# ---------------------------------------------------------------------------
# A8 — grouping sets via SQL surface (D5 also: spark.sql entry point)
# ---------------------------------------------------------------------------
@query(
    "a8_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    HAVING count(*) >= 1  -- engine semantics: no input, no rows (a4_rollup note)
    """,
)
def a8_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# ---------------------------------------------------------------------------
# A13 — statistical aggregates: correlation, covariance, stddev — the
# portfolio-risk numbers a financial consumer computes from balance
# data. Single hash-aggregate, map-side partial, no extra pass.
# ---------------------------------------------------------------------------
@query(
    "a13_stat_aggregates",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           round(covar_pop(l_quantity, l_discount), 6) AS qty_disc_covar,
           round(stddev_samp(l_extendedprice), 4) AS price_stddev,
           count(*) AS n
    FROM lineitem GROUP BY 1
    """,
)
def a13_stat_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "qty_price_corr"
            ),
            F.round(F.covar_pop("l_quantity", "l_discount"), 6).alias(
                "qty_disc_covar"
            ),
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# A14 — rolling 7-day distinct active users (sliding-window DAU/WAU):
# each event lands in 7 overlapping daily windows (F.window with slide),
# then a per-window distinct count. The explode-by-window formulation
# shuffles each row at most 7× — the affordable exact form; beyond that
# scale the HLL sketch (A3) merges per-day sketches instead.
# ---------------------------------------------------------------------------
@query(
    "a14_rolling_wau",
    oracle="""
    WITH days AS (
        SELECT DISTINCT date_trunc('day', ts) AS d FROM events
    )
    SELECT strftime(days.d, '%Y-%m-%d') AS window_end_day,
           count(DISTINCT e.user_id) AS active_users,
           count(*) AS n_events
    FROM days
    JOIN events e
      ON e.ts >= days.d - INTERVAL 6 DAY
     AND e.ts < days.d + INTERVAL 1 DAY
    GROUP BY 1
    """,
)
def a14_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # window('ts','7 days','1 day'): the window ENDING on day d covers
    # (d-6 .. d]; keep only windows whose end-1-day is an observed event
    # day so the frame matches the oracle's day list.
    days = ev.select(F.date_trunc("day", "ts").alias("d")).distinct()
    win = ev.groupBy(F.window("ts", "7 days", "1 day").alias("w")).agg(
        F.countDistinct("user_id").alias("active_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        win.join(
            days,
            F.col("w.end") - F.expr("INTERVAL 1 DAY") == F.col("d"),
        )
        .select(
            F.date_format(F.col("d"), "yyyy-MM-dd").alias("window_end_day"),
            "active_users",
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# A16 — unpivot/melt: wide per-segment aggregate back to long
# (metric, value) rows — the inverse of A6's pivot and the shape
# feature-store exports want.
# ---------------------------------------------------------------------------
@query(
    "a16_unpivot_melt",
    oracle="""
    WITH wide AS (
        SELECT c_mktsegment,
               round(sum(CAST(c_acctbal AS DECIMAL(27,2))), 2)::DOUBLE AS total_bal,
               round(avg(c_acctbal), 4) AS avg_bal,
               CAST(count(*) AS DOUBLE) AS n_customers
        FROM customer GROUP BY 1
    )
    SELECT c_mktsegment, metric, value
    FROM wide
    UNPIVOT (value FOR metric IN (total_bal, avg_bal, n_customers))
    """,
)
def a16_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = (
        load(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            dec_sum("c_acctbal", scale=2).alias("total_bal"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
            F.count(F.lit(1)).cast("double").alias("n_customers"),
        )
    )
    return wide.unpivot(
        ids=["c_mktsegment"],
        values=["total_bal", "avg_bal", "n_customers"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# ---------------------------------------------------------------------------
# A17 — bitmap-exact distinct count: bitmap_construct_agg builds a
# per-group roaring-style bitmap in one pass; bitmap_count reads the
# cardinality. Unlike HLL this is EXACT and the bitmaps are mergeable
# (bitmap_or_agg), so incremental daily rollups can maintain exact
# distincts — the oracle is plain count(DISTINCT).
# ---------------------------------------------------------------------------
@query(
    "a17_bitmap_distinct",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events
    FROM events GROUP BY 1
    """,
)
def a17_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Canonical two-level bitmap pattern: bucket by bitmap_bucket_number
    # (each bucket covers 32768 positions), one bitmap per
    # (group, bucket), cardinalities summed per group. The +1 shift keeps
    # id 0 addressable (bit positions are 1-based).
    ev = load(spark, sf_dir, "events").withColumn("_id1", F.col("user_id") + 1)
    per_bucket = (
        ev.groupBy("event_type", F.expr("bitmap_bucket_number(_id1)").alias("_b"))
        .agg(
            F.expr("bitmap_construct_agg(bitmap_bit_position(_id1))").alias("_bm"),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(_bm)")).alias("n_users"),
        F.sum("_n").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# A18 — mergeable HLL sketch rollup (Apache DataSketches, Spark 3.5+):
# per-day sketches built once, then UNION-merged to answer the
# whole-period distinct — the sketch form of S12's rollup-merge, and the
# only affordable incremental distinct at 100 TB. Tolerance oracle: the
# merged estimate must land within 5% of the exact distinct.
# ---------------------------------------------------------------------------
@query(
    "a18_hll_sketch_merge",
    oracle="""
    SELECT count(DISTINCT user_id) AS exact_users,
           CAST(count(DISTINCT strftime(date_trunc('day', ts), '%Y-%m-%d')) AS BIGINT)
               AS n_daily_sketches,
           TRUE AS merged_within_5pct
    FROM events
    """,
)
def a18_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(F.expr("hll_sketch_agg(user_id)").alias("sketch"))
    merged = daily.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sketch))").alias("est_users"),
        F.count(F.lit(1)).alias("n_daily_sketches"),
    )
    exact = ev.agg(F.countDistinct("user_id").alias("exact_users"))
    return merged.crossJoin(exact).select(
        "exact_users",
        "n_daily_sketches",
        # Vacuously true on an empty corpus (0/0 is no tolerance claim).
        F.when(F.col("exact_users") == 0, F.lit(True))
        .otherwise(
            F.abs(F.col("est_users") - F.col("exact_users"))
            / F.col("exact_users")
            <= 0.05
        )
        .alias("merged_within_5pct"),
    )


# ---------------------------------------------------------------------------
# A19 — multi-grain time rollup: one GROUPING SETS pass produces daily,
# monthly, and grand-total rows (grain tagged via grouping()) — the
# single-scan form of the reference's per-day report plus its monthly
# consolidation.
# ---------------------------------------------------------------------------
@query(
    "a19_time_grain_rollup",
    oracle="""
    SELECT CASE WHEN day IS NOT NULL THEN 'day'
                WHEN month IS NOT NULL THEN 'month'
                ELSE 'total' END AS grain,
           day, month,
           count(*) AS n_events,
           round(sum(CAST(value AS DECIMAL(27,6))), 2)::DOUBLE AS total_value
    FROM (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               strftime(date_trunc('month', ts), '%Y-%m') AS month,
               value
        FROM events
    )
    GROUP BY GROUPING SETS ((day), (month), ())
    HAVING count(*) >= 1  -- engine semantics: no input, no rows (a4_rollup note)
    """,
)
def a19_time_grain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.date_format(F.date_trunc("month", "ts"), "yyyy-MM").alias("month"),
        "value",
    )
    ev.createOrReplaceTempView("_a19_src")
    return ev.sparkSession.sql(
        """
        SELECT CASE WHEN day IS NOT NULL THEN 'day'
                    WHEN month IS NOT NULL THEN 'month'
                    ELSE 'total' END AS grain,
               day, month,
               count(*) AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(27,6))), 2) AS DOUBLE)
                   AS total_value
        FROM _a19_src
        GROUP BY GROUPING SETS ((day), (month), ())
        """
    )


# ---------------------------------------------------------------------------
# A22 — exact median + deterministic mode per group. Median is the
# interpolated 0.5-percentile (Spark `median` ≡ DuckDB `quantile_cont`);
# mode is computed as an explicit count + rank with a total-order
# tiebreak (highest count, then lowest value) rather than the engines'
# `mode()` functions, whose tie behavior is unspecified — the registry's
# "window outputs need total orderings" rule applied to an aggregate.
# ---------------------------------------------------------------------------
@query(
    "a22_median_mode",
    oracle="""
    WITH med AS (
        SELECT o_orderstatus,
               count(*) AS n,
               floor(quantile_cont(o_totalprice, 0.5) * 1e6 + 0.5) / 1e6
                   AS median_price
        FROM orders GROUP BY 1
    ),
    pc AS (
        SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        FROM orders GROUP BY 1, 2
    ),
    md AS (
        SELECT o_orderstatus, o_orderpriority AS mode_priority
        FROM (SELECT *, row_number() OVER (PARTITION BY o_orderstatus
                                           ORDER BY cnt DESC, o_orderpriority)
                         AS rk
              FROM pc)
        WHERE rk = 1
    )
    SELECT m.o_orderstatus, m.n, m.median_price, d.mode_priority
    FROM med m JOIN md d USING (o_orderstatus)
    """,
)
def a22_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    med = orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        (F.floor(F.median("o_totalprice") * 1e6 + 0.5) / 1e6).alias(
            "median_price"
        ),
    )
    pc = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("cnt").desc(), F.col("o_orderpriority")
    )
    md = (
        pc.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("o_orderstatus", F.col("o_orderpriority").alias("mode_priority"))
    )
    return med.join(md, "o_orderstatus").select(
        "o_orderstatus", "n", "median_price", "mode_priority"
    )


# ---------------------------------------------------------------------------
# A24 — 2-D histogram (heatmap feed): quantity-band × price-band counts
# over lineitem in one scan + one grouped aggregate. The binning is
# integer floor arithmetic so both engines bucket identically.
# ---------------------------------------------------------------------------
@query(
    "a24_histogram2d",
    oracle="""
    SELECT CAST(floor((l_quantity - 1) / 10) AS BIGINT) AS qty_band,
           CAST(floor(l_extendedprice / 10000) AS BIGINT) AS price_band,
           count(*) AS n,
           round(sum(CAST(l_extendedprice AS DECIMAL(27,2))), 2)::DOUBLE
               AS band_revenue
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def a24_histogram2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dock_financial_data_pipelines_spark.catalog import dec_sum

    return (
        load(spark, sf_dir, "lineitem")
        .groupBy(
            F.floor((F.col("l_quantity") - 1) / 10)
            .cast("bigint")
            .alias("qty_band"),
            F.floor(F.col("l_extendedprice") / 10000)
            .cast("bigint")
            .alias("price_band"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            dec_sum("l_extendedprice", scale=2).alias("band_revenue"),
        )
    )
