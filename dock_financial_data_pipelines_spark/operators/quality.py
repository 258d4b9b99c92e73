"""Data-quality check operators — the reference's inline null-guards
(SURVEY.md §2-A R11: `if not x: raise ValueError`, REPORT:45-46/75-76/
112-113) generalized into declarative, columnar assertions.

Each check is a DataFrame → violations DataFrame transformation; a check
passes when its violations frame is empty. ``run_checks`` evaluates a
suite in ONE pass (a single aggregate over the table — at 100 TB you
cannot afford one scan per rule) and returns a (check, violations)
report frame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dock_financial_data_pipelines_spark.catalog import dec_sum, load, local_frame, maybe_broadcast
from dock_financial_data_pipelines_spark.registry import query


def not_null(col: str) -> tuple[str, Column]:
    return f"not_null({col})", F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))


def accepted_values(col: str, values: list) -> tuple[str, Column]:
    return (
        f"accepted_values({col})",
        F.sum(F.when(~F.col(col).isin(values), 1).otherwise(0)),
    )


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    return (
        f"in_range({col},{lo},{hi})",
        F.sum(F.when(~F.col(col).between(lo, hi), 1).otherwise(0)),
    )


def unique_key(col: str) -> tuple[str, Column]:
    return f"unique({col})", (F.count(F.lit(1)) - F.countDistinct(col))


def run_checks(df: DataFrame, checks: list[tuple[str, Column]]) -> DataFrame:
    """All checks in one aggregate pass → (check, violations) rows."""
    agg = df.agg(*[expr.cast("bigint").alias(f"c{i}") for i, (_, expr) in enumerate(checks)])
    stack_args = ", ".join(f"'{name}', c{i}" for i, (name, _) in enumerate(checks))
    return agg.selectExpr(f"stack({len(checks)}, {stack_args}) AS (check, violations)")


@query(
    "q_data_quality_report",
    oracle="""
    SELECT 'not_null(o_custkey)' AS "check",
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations
    FROM orders
    UNION ALL
    SELECT 'accepted_values(o_orderstatus)',
           CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'in_range(o_totalprice,0,10000000)',
           CAST(sum(CASE WHEN o_totalprice NOT BETWEEN 0 AND 10000000 THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'unique(o_orderkey)', CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
    FROM orders
    """,
)
def q_data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return run_checks(
        orders,
        [
            not_null("o_custkey"),
            accepted_values("o_orderstatus", ["O", "F", "P"]),
            in_range("o_totalprice", 0, 10_000_000),
            unique_key("o_orderkey"),
        ],
    )


# ---------------------------------------------------------------------------
# Q2 — z-score anomaly detection: events whose value sits more than 3
# standard deviations from their user's mean — the data-quality screen a
# statement pipeline runs before publishing (the reference only
# null-guards envelope fields; the engine checks the *data*). Two-pass
# formulation (per-key stats join back) keeps the stats exact; at scale
# the stats side is tiny (one row per user) and broadcasts.
# ---------------------------------------------------------------------------
@query(
    "q_anomaly_zscore",
    oracle="""
    WITH stats AS (
        SELECT user_id, avg(value) AS mu, stddev_samp(value) AS sigma
        FROM events GROUP BY 1
    )
    SELECT e.event_id, e.user_id,
           round(e.value, 2) AS value,
           round((e.value - s.mu) / s.sigma, 4) AS zscore
    FROM events e JOIN stats s USING (user_id)
    WHERE s.sigma > 0 AND abs((e.value - s.mu) / s.sigma) > 3
    """,
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    stats = ev.groupBy("user_id").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), "user_id")
        .where((F.col("sigma") > 0) & (F.abs(z) > 3))
        .select(
            "event_id",
            "user_id",
            F.round("value", 2).alias("value"),
            F.round(z, 4).alias("zscore"),
        )
    )


# ---------------------------------------------------------------------------
# Q3 — referential-integrity audit: orphaned foreign keys across the
# star schema, each an anti-join (the check dbt's `relationships` test
# runs, expressed as one scan per edge).
# ---------------------------------------------------------------------------
@query(
    "q_referential_integrity",
    oracle="""
    SELECT 'orders.o_custkey -> customer' AS fk_edge,
           CAST(count(*) AS BIGINT) AS n_orphans
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'lineitem.l_orderkey -> orders',
           CAST(count(*) AS BIGINT)
    FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'events.user_id -> customer',
           CAST(count(*) AS BIGINT)
    FROM events e
    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)
    """,
)
def q_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    li = load(spark, sf_dir, "lineitem")
    ev = load(spark, sf_dir, "events")

    def orphans(child, key, parent, pkey, edge):
        return (
            child.join(parent, child[key] == parent[pkey], "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(edge).alias("fk_edge"), "n_orphans")
        )

    return (
        orphans(orders, "o_custkey", cust, "c_custkey",
                "orders.o_custkey -> customer")
        .unionByName(
            orphans(li, "l_orderkey", orders, "o_orderkey",
                    "lineitem.l_orderkey -> orders")
        )
        .unionByName(
            orphans(ev, "user_id", cust, "c_custkey",
                    "events.user_id -> customer")
        )
    )


# ---------------------------------------------------------------------------
# Q4 — calendar-spine gap fill: a generated continuous date spine
# left-joined against per-day activity, so silent days appear as
# explicit zero rows — the difference between "no row" and "zero
# activity" that daily reporting depends on.
# ---------------------------------------------------------------------------
@query(
    "q_date_spine_gapfill",
    oracle="""
    WITH spine AS (
        SELECT CAST(d AS DATE) AS day
        FROM generate_series(DATE '2024-01-01', DATE '2024-02-09',
                             INTERVAL 1 DAY) AS t(d)
    ),
    daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               count(*) AS n, round(sum(CAST(value AS DECIMAL(27,6))), 2)::DOUBLE AS total
        FROM events GROUP BY 1
    )
    SELECT strftime(s.day, '%Y-%m-%d') AS day,
           coalesce(d.n, 0) AS n_events,
           coalesce(d.total, 0.0) AS total_value
    FROM spine s LEFT JOIN daily d ON d.day = s.day
    """,
)
def q_date_spine_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    spine = load(spark, sf_dir, "events").sparkSession.sql(
        """
        SELECT explode(sequence(DATE '2024-01-01', DATE '2024-02-09',
                                INTERVAL 1 DAY)) AS day
        """
    )
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dec_sum("value", scale=6).alias("total"),
        )
    )
    return (
        spine.join(daily, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.coalesce("total", F.lit(0.0)).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Funnel conversion — ordered-stage attribution over the event stream:
# how many users viewed, then clicked after their first view, then
# purchased after that click. Each stage is a per-user min-timestamp
# aggregate joined to the previous stage (strictly-after semantics), so
# the whole funnel is three shuffles on user_id — at 100 TB the three
# stage frames co-partition on the same key and AQE keeps the final
# 1-row combine trivial.
# ---------------------------------------------------------------------------
@query(
    "q_funnel_conversion",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t_view
        GROUP BY 1
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        GROUP BY 1
    )
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_view_click,
           (SELECT count(*) FROM p) AS n_view_click_purchase
    """,
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    views = (
        events.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    clicks = (
        events.where(F.col("event_type") == "click")
        .join(views, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    # three 1-row aggregates combined — the crossJoins are 1-row x 1-row
    return (
        views.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(clicks.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(
            purchases.agg(F.count(F.lit(1)).alias("n_view_click_purchase"))
        )
    )


# ---------------------------------------------------------------------------
# Retention cohorts — the week-over-week retention grid: users bucketed
# by first-seen week, counted per (cohort_week, weeks-since-cohort).
# Both engines truncate weeks to Monday, and the offset divides an
# exact multiple of 7 days, so the grid is integer-exact. Two shuffles:
# first-seen per user, then the distinct (user, offset) roll-up.
# ---------------------------------------------------------------------------
@query(
    "q_retention_cohorts",
    oracle="""
    WITH firsts AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events GROUP BY 1
    ),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               CAST(date_diff('day', f.cohort_week,
                              date_trunc('week', e.ts)) / 7 AS BIGINT) AS week_offset
        FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           week_offset,
           count(*) AS n_users
    FROM activity GROUP BY 1, 2
    """,
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        events.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
    ).agg(F.count(F.lit(1)).alias("n_users"))


# ---------------------------------------------------------------------------
# Event-transition matrix — P(next event type | current event type) per
# user journey: the Markov view of the event stream that powers
# next-action prediction and anomaly screens. One shuffle on user_id
# for the lead() ordering, then a tiny (|types|²) aggregate; the
# probability normalization is a window over that matrix, never the
# fact.
# ---------------------------------------------------------------------------
@query(
    "q_event_transitions",
    oracle="""
    WITH seq AS (
        SELECT event_type AS cur_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    ),
    pairs AS (
        SELECT cur_type, next_type, count(*) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT cur_type, next_type, n,
           round(CAST(n AS DOUBLE)
                 / sum(n) OVER (PARTITION BY cur_type), 6) AS prob
    FROM pairs
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        load(spark, sf_dir, "events")
        .select(
            F.col("event_type").alias("cur_type"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        .where(F.col("next_type").isNotNull())
        .groupBy("cur_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wn = Window.partitionBy("cur_type")
    return pairs.select(
        "cur_type",
        "next_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wn), 6).alias("prob"),
    )


# ---------------------------------------------------------------------------
# Balance as-of snapshot — reconstruct every account's balance AS OF a
# cutoff from the event log (the point-in-time view behind the
# reference's daily balance report, REPORT:47-54, generalized to any
# historical date): last event and cumulative value per user over
# events at or before the cutoff, plus days-stale at the cutoff. One
# date-pruned scan (at 100 TB the cutoff prunes ingest-date
# partitions), one shuffle on user_id.
# ---------------------------------------------------------------------------
@query(
    "q_balance_asof_snapshot",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           round(sum(CAST(value AS DECIMAL(27,6))), 2)::DOUBLE AS balance,
           CAST(floor(epoch(max(ts))) AS BIGINT) AS last_event_epoch,
           date_diff('day', CAST(max(ts) AS DATE), DATE '2024-01-15')
               AS days_stale
    FROM events
    WHERE ts < TIMESTAMP '2024-01-15'
    GROUP BY 1
    """,
)
def q_balance_asof_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = "2024-01-15"
    ev = load(spark, sf_dir, "events").where(
        F.col("ts") < F.lit(cutoff).cast("timestamp")
    )
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        dec_sum("value", scale=6).alias("balance"),
        F.unix_timestamp(F.max("ts")).cast("bigint").alias("last_event_epoch"),
        F.datediff(F.lit(cutoff).cast("date"), F.max("ts").cast("date")).alias(
            "days_stale"
        ),
    )


# ---------------------------------------------------------------------------
# Q — column profiler (the Deequ/profiling shape): null count, exact
# distinct count, and min/max for every column of orders, computed in
# ONE scan — all 6×4 aggregates run in a single hash-aggregate pass and
# the per-column rows come from a stack() over the 1-row aggregate.
# The oracle pays 6 scans (UNION ALL), which is exactly the cost this
# operator avoids at 100 TB. Min/max are rendered with explicit
# per-type formatting (DECIMAL(18,2) for doubles, yyyy-MM-dd for
# timestamps) so the string reprs are engine-independent.
# ---------------------------------------------------------------------------
@query(
    "q_column_profile",
    oracle="""
    SELECT 'o_orderkey' AS col, count(*) - count(o_orderkey) AS n_nulls,
           count(DISTINCT o_orderkey) AS n_distinct,
           CAST(min(o_orderkey) AS VARCHAR) AS min_repr,
           CAST(max(o_orderkey) AS VARCHAR) AS max_repr
    FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*) - count(o_custkey),
           count(DISTINCT o_custkey),
           CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus),
           min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*) - count(o_totalprice),
           count(DISTINCT o_totalprice),
           CAST(CAST(min(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
           CAST(CAST(max(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', count(*) - count(o_orderdate),
           count(DISTINCT o_orderdate),
           strftime(min(o_orderdate), '%Y-%m-%d'),
           strftime(max(o_orderdate), '%Y-%m-%d')
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority),
           min(o_orderpriority), max(o_orderpriority)
    FROM orders
    """,
)
def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    n = F.count(F.lit(1))

    def prof(c, min_repr, max_repr):
        return [
            (n - F.count(c)).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            min_repr.alias(f"mn_{c}"),
            max_repr.alias(f"mx_{c}"),
        ]

    aggs = []
    aggs += prof(
        "o_orderkey",
        F.min("o_orderkey").cast("string"),
        F.max("o_orderkey").cast("string"),
    )
    aggs += prof(
        "o_custkey",
        F.min("o_custkey").cast("string"),
        F.max("o_custkey").cast("string"),
    )
    aggs += prof(
        "o_orderstatus", F.min("o_orderstatus"), F.max("o_orderstatus")
    )
    aggs += prof(
        "o_totalprice",
        F.min("o_totalprice").cast("decimal(18,2)").cast("string"),
        F.max("o_totalprice").cast("decimal(18,2)").cast("string"),
    )
    aggs += prof(
        "o_orderdate",
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd"),
    )
    aggs += prof(
        "o_orderpriority", F.min("o_orderpriority"), F.max("o_orderpriority")
    )
    wide = o.agg(*aggs)
    cols = [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ]
    stack = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack})"
        " AS (col, n_nulls, n_distinct, min_repr, max_repr)"
    )


# ---------------------------------------------------------------------------
# Q — duplicate-payment screen (the classic AP fraud/error audit): two
# orders by the same customer for the identical amount on the same day.
# One scan + one grouped aggregate on the natural blocking key
# (custkey, day, cents) — the blocking key IS the equality predicate,
# so no pairwise join is ever needed; groups with n > 1 are the
# suspects. Amounts compare in integer cents (floor(x*100+0.5), the
# per-row money convention) so float jitter can't split a group.
# ---------------------------------------------------------------------------
@query(
    "q_duplicate_payments",
    oracle="""
    SELECT o_custkey,
           strftime(o_orderdate, '%Y-%m-%d') AS day,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
           count(*) AS n_orders,
           min(o_orderkey) AS first_orderkey,
           max(o_orderkey) AS last_orderkey
    FROM orders
    GROUP BY 1, 2, 3
    HAVING count(*) > 1
    """,
)
def q_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy(
            "o_custkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("bigint")
            .alias("cents"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_orderkey").alias("first_orderkey"),
            F.max("o_orderkey").alias("last_orderkey"),
        )
        .where(F.col("n_orders") > 1)
    )


# ---------------------------------------------------------------------------
# Weekday seasonality profile — revenue share and seasonal index per
# day-of-week (index = weekday daily-average ÷ overall daily-average).
# The ops screen for "is Monday really our big day". DECIMAL-exact
# sums; the two scalar denominators ride a 1-row broadcast, so the
# final arithmetic is identical double math on both engines. One scan,
# one 7-row aggregate.
# ---------------------------------------------------------------------------
@query(
    "a32_weekday_seasonality",
    oracle="""
    WITH daily AS (
        SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
               CAST(dayofweek(o_orderdate) AS INT) AS dow,
               sum(CAST(o_totalprice AS DECIMAL(27,2))) AS rev
        FROM orders GROUP BY 1, 2
    ),
    per_dow AS (
        SELECT dow, count(*) AS n_days,
               sum(rev) AS rev_dow
        FROM daily GROUP BY 1
    ),
    tot AS (
        SELECT CAST(sum(rev_dow) AS DOUBLE) AS rev_all,
               CAST(sum(n_days) AS BIGINT) AS days_all
        FROM per_dow
    )
    SELECT p.dow AS day_of_week, CAST(p.n_days AS BIGINT) AS n_days,
           floor(CAST(p.rev_dow AS DOUBLE) / t.rev_all * 1e6 + 0.5) / 1e6
               AS revenue_share,
           floor((CAST(p.rev_dow AS DOUBLE) / p.n_days)
                 / (t.rev_all / t.days_all) * 1e6 + 0.5) / 1e6
               AS seasonal_index
    FROM per_dow p CROSS JOIN tot t
    ORDER BY 1
    """,
)
def a32_weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark dayofweek == DuckDB dayofweek + 1 (Spark: Sunday=1; DuckDB:
    # Sunday=0), so the engine subtracts 1 to match the oracle's value.
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
            (F.dayofweek("o_orderdate") - 1).cast("int").alias("dow"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(27,2)")).alias("rev"))
    )
    per_dow = daily.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("rev").alias("rev_dow")
    )
    tot = per_dow.agg(
        F.sum("rev_dow").cast("double").alias("rev_all"),
        F.sum("n_days").cast("long").alias("days_all"),
    )
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    rev_dow = F.col("rev_dow").cast("double")
    return (
        per_dow.crossJoin(F.broadcast(tot))
        .select(
            F.col("dow").alias("day_of_week"),
            F.col("n_days").cast("long").alias("n_days"),
            r6(rev_dow / F.col("rev_all")).alias("revenue_share"),
            r6(
                (rev_dow / F.col("n_days"))
                / (F.col("rev_all") / F.col("days_all"))
            ).alias("seasonal_index"),
        )
        .orderBy("day_of_week")
    )


# ---------------------------------------------------------------------------
# Data freshness audit — per ingest source table: max event/order date,
# its lag in days behind the freshest table in the warehouse, and row
# count. The first dashboard any pipeline operator builds. Each branch
# is a scan-level min/max aggregate (parquet footer statistics answer
# it at any scale); the cross-table lag rides a 3-row broadcast.
# ---------------------------------------------------------------------------
@query(
    "q_freshness_lag",
    oracle="""
    WITH per_table AS (
        SELECT 'orders' AS tbl, count(*) AS n_rows,
               strftime(max(o_orderdate), '%Y-%m-%d') AS max_day
        FROM orders
        UNION ALL
        SELECT 'lineitem', count(*),
               strftime(max(l_shipdate), '%Y-%m-%d')
        FROM lineitem
        UNION ALL
        SELECT 'events', count(*), strftime(max(ts), '%Y-%m-%d')
        FROM events
    ),
    freshest AS (SELECT max(max_day) AS global_max FROM per_table)
    SELECT p.tbl, p.n_rows, p.max_day,
           CAST(date_diff('day', CAST(p.max_day AS DATE),
                          CAST(f.global_max AS DATE)) AS BIGINT)
               AS lag_days
    FROM per_table p CROSS JOIN freshest f
    ORDER BY 1
    """,
)
def q_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    def branch(tbl: str, datecol: str) -> DataFrame:
        return load(spark, sf_dir, tbl).agg(
            F.lit(tbl).alias("tbl"),
            F.count(F.lit(1)).alias("n_rows"),
            F.date_format(F.max(datecol), "yyyy-MM-dd").alias("max_day"),
        )

    per_table = (
        branch("orders", "o_orderdate")
        .unionByName(branch("lineitem", "l_shipdate"))
        .unionByName(branch("events", "ts"))
    )
    freshest = per_table.agg(F.max("max_day").alias("global_max"))
    return (
        per_table.crossJoin(F.broadcast(freshest))
        .select(
            "tbl",
            "n_rows",
            "max_day",
            F.datediff(
                F.to_date("global_max"), F.to_date("max_day")
            ).cast("long").alias("lag_days"),
        )
        .orderBy("tbl")
    )


# ---------------------------------------------------------------------------
# RFM customer segmentation — the classic CRM screen: quartile-code
# every customer by Recency (days since last order, vs the global max
# date), Frequency (order count), Monetary (DECIMAL-exact revenue),
# then report each of the ≤64 R/F/M segments. ntile quartiles are
# deterministic because every ORDER BY carries the customer key as the
# tiebreak (total order); the global "today" rides a 1-row broadcast.
# One shuffle on custkey, one 64-row aggregate.
#
# Scale note: the three global ntile windows sort the CUSTOMER
# AGGREGATE (one row per customer), not raw orders — but a global
# window is still a single-partition sort. At 100 TB-scale customer
# counts the quartile codes come from three percentile cut-points per
# metric (a 9-value broadcast) + comparisons; the fixture keeps exact
# ntile because cut-points cannot reproduce ntile's row-ordered tie
# splitting, and the oracle contract is exactness.
# ---------------------------------------------------------------------------
@query(
    "q_rfm_segmentation",
    oracle="""
    WITH per_cust AS (
        SELECT o_custkey AS custkey,
               max(o_orderdate) AS last_order,
               count(*) AS frequency,
               sum(CAST(o_totalprice AS DECIMAL(27,2))) AS monetary
        FROM orders GROUP BY 1
    ),
    today AS (SELECT max(o_orderdate) AS t FROM orders),
    coded AS (
        SELECT custkey,
               ntile(4) OVER (ORDER BY date_diff('day', last_order, t),
                              custkey) AS r,
               ntile(4) OVER (ORDER BY frequency, custkey) AS f,
               ntile(4) OVER (ORDER BY monetary, custkey) AS m,
               monetary
        FROM per_cust CROSS JOIN today
    )
    SELECT r, f, m, count(*) AS n_customers,
           CAST(sum(monetary) AS DOUBLE) AS segment_revenue
    FROM coded GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
)
def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    per_cust = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(27,2)")).alias("monetary"),
    )
    today = o.agg(F.max("o_orderdate").alias("t"))
    coded = (
        per_cust.crossJoin(F.broadcast(today))
        .withColumn(
            "r",
            F.ntile(4).over(
                Window.orderBy(
                    F.datediff(F.col("t"), F.col("last_order")), "custkey"
                )
            ),
        )
        .withColumn("f", F.ntile(4).over(Window.orderBy("frequency", "custkey")))
        .withColumn("m", F.ntile(4).over(Window.orderBy("monetary", "custkey")))
    )
    return (
        coded.groupBy("r", "f", "m")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("monetary").cast("double").alias("segment_revenue"),
        )
        .orderBy("r", "f", "m")
    )


# ---------------------------------------------------------------------------
# W15 — inter-order gap distribution: per-customer day gaps between
# consecutive orders (lag over the per-customer order sequence), then
# the global gap percentiles — the re-purchase cadence every retention
# model starts from. Integer day gaps; the exact-percentile
# interpolation on integers is the proven a10 idiom.
# ---------------------------------------------------------------------------
@query(
    "w15_order_gap_percentiles",
    oracle="""
    WITH gaps AS (
        SELECT date_diff('day',
                   lag(o_orderdate) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey),
                   o_orderdate) AS gap
        FROM orders
    )
    SELECT count(*) AS n_gaps,
           round(quantile_cont(gap, 0.5), 4) AS p50_days,
           round(quantile_cont(gap, 0.9), 4) AS p90_days,
           CAST(max(gap) AS BIGINT) AS max_days
    FROM gaps WHERE gap IS NOT NULL
    """,
)
def w15_order_gap_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        load(spark, sf_dir, "orders")
        .select(
            F.datediff(
                F.col("o_orderdate"), F.lag("o_orderdate").over(w)
            ).alias("gap")
        )
        .where(F.col("gap").isNotNull())
    )
    return gaps.agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.expr("percentile(gap, 0.5)"), 4).alias("p50_days"),
        F.round(F.expr("percentile(gap, 0.9)"), 4).alias("p90_days"),
        F.max("gap").cast("long").alias("max_days"),
    )


# ---------------------------------------------------------------------------
# Marketing attribution — each purchase credited to the touch (view or
# click) that preceded it, under BOTH first-touch and last-touch rules
# in one pass: the comparison every attribution debate needs side by
# side. Candidates come from a (user) equi-join of purchases to prior
# touches; first/last pick is a min/max over integer microseconds
# (exact); revenue sums are DECIMAL-exact. Output: credited touch type
# × rule with purchase counts and revenue.
# ---------------------------------------------------------------------------
@query(
    "q_touch_attribution",
    oracle="""
    WITH purchases AS (
        SELECT event_id, user_id, ts, CAST(value AS DECIMAL(27,2)) AS rev
        FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
        SELECT user_id, ts, event_type FROM events
        WHERE event_type IN ('view', 'click')
    ),
    cand AS (
        SELECT p.event_id, p.rev, t.event_type,
               epoch_us(t.ts) AS t_us
        FROM purchases p JOIN touches t
          ON p.user_id = t.user_id AND t.ts < p.ts
    ),
    picked AS (
        SELECT event_id, rev,
               min_by(event_type, t_us) AS first_touch,
               max_by(event_type, t_us) AS last_touch
        FROM cand GROUP BY 1, 2
    )
    SELECT rule, touch, count(*) AS n_purchases,
           CAST(sum(rev) AS DOUBLE) AS revenue
    FROM (
        SELECT 'first_touch' AS rule, first_touch AS touch, rev FROM picked
        UNION ALL
        SELECT 'last_touch', last_touch, rev FROM picked
    ) GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("value").cast("decimal(27,2)").alias("rev"),
    )
    touches = events.where(
        F.col("event_type").isin("view", "click")
    ).select("user_id", F.col("ts").alias("t_ts"), "event_type")
    cand = purchases.join(touches, "user_id").where(
        F.col("t_ts") < F.col("p_ts")
    )
    # min_by/max_by over integer microseconds: exact tie behavior —
    # events carry unique µs timestamps per user in the fixture, and
    # the key is total (t_us) so both engines pick the same touch.
    picked = cand.groupBy("event_id", "rev").agg(
        F.expr("min_by(event_type, unix_micros(t_ts))").alias("first_touch"),
        F.expr("max_by(event_type, unix_micros(t_ts))").alias("last_touch"),
    )
    first = picked.select(
        F.lit("first_touch").alias("rule"),
        F.col("first_touch").alias("touch"),
        "rev",
    )
    last = picked.select(
        F.lit("last_touch").alias("rule"),
        F.col("last_touch").alias("touch"),
        "rev",
    )
    return (
        first.unionByName(last)
        .groupBy("rule", "touch")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("rev").cast("double").alias("revenue"),
        )
        .orderBy("rule", "touch")
    )


# ---------------------------------------------------------------------------
# Funnel time-to-convert: for users completing view → click → purchase
# (the q_funnel_conversion chain), the distribution of stage-to-stage
# delays — integer-second gaps, exact percentiles (the a10 idiom).
# The metric that turns a funnel COUNT into a funnel SLA.
# ---------------------------------------------------------------------------
@query(
    "q_funnel_time_to_convert",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
        SELECT e.user_id, v.t_view, min(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t_view
        GROUP BY 1, 2
    ),
    p AS (
        SELECT e.user_id, c.t_view, c.t_click, min(e.ts) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        GROUP BY 1, 2, 3
    ),
    gaps AS (
        SELECT (epoch_us(t_click) - epoch_us(t_view)) // 1000000
                   AS view_to_click_s,
               (epoch_us(t_purchase) - epoch_us(t_click)) // 1000000
                   AS click_to_purchase_s
        FROM p
    )
    SELECT count(*) AS n_converted,
           round(quantile_cont(view_to_click_s, 0.5), 4) AS p50_view_click_s,
           round(quantile_cont(click_to_purchase_s, 0.5), 4)
               AS p50_click_purchase_s,
           round(quantile_cont(view_to_click_s + click_to_purchase_s, 0.9), 4)
               AS p90_total_s
    FROM gaps
    """,
)
def q_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    v = (
        events.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        events.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id", "t_view")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        events.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id", "t_view", "t_click")
        .agg(F.min("ts").alias("t_purchase"))
    )
    # Integer DIV, not double division: a ratio an ulp under a whole
    # second could round up in floating point while DuckDB's // floors.
    gaps = p.select(
        F.expr(
            "(unix_micros(t_click) - unix_micros(t_view)) DIV 1000000"
        ).alias("view_to_click_s"),
        F.expr(
            "(unix_micros(t_purchase) - unix_micros(t_click)) DIV 1000000"
        ).alias("click_to_purchase_s"),
    )
    return gaps.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.expr("percentile(view_to_click_s, 0.5)"), 4).alias(
            "p50_view_click_s"
        ),
        F.round(F.expr("percentile(click_to_purchase_s, 0.5)"), 4).alias(
            "p50_click_purchase_s"
        ),
        F.round(
            F.expr("percentile(view_to_click_s + click_to_purchase_s, 0.9)"), 4
        ).alias("p90_total_s"),
    )


# ---------------------------------------------------------------------------
# Cohort LTV — cumulative revenue per signup-month cohort by month
# offset: the lifetime-value grid behind every retention/payback
# decision. Cohort = month of the customer's first order; revenue
# accumulates as DECIMAL along the offset axis via a cohort-partitioned
# running sum over the (cohort, offset) aggregate — never over raw
# orders. Integer month offsets are exact on both engines.
# ---------------------------------------------------------------------------
@query(
    "q_cohort_ltv",
    oracle="""
    WITH first_order AS (
        SELECT o_custkey, min(o_orderdate) AS first_dt
        FROM orders GROUP BY 1
    ),
    labeled AS (
        SELECT strftime(date_trunc('month', f.first_dt), '%Y-%m') AS cohort,
               (CAST(strftime(o.o_orderdate, '%Y') AS BIGINT) * 12
                + CAST(strftime(o.o_orderdate, '%m') AS BIGINT))
               - (CAST(strftime(f.first_dt, '%Y') AS BIGINT) * 12
                  + CAST(strftime(f.first_dt, '%m') AS BIGINT))
                   AS month_offset,
               CAST(o.o_totalprice AS DECIMAL(27,2)) AS rev
        FROM orders o JOIN first_order f ON o.o_custkey = f.o_custkey
    ),
    grid AS (
        SELECT cohort, month_offset,
               count(*) AS n_orders, sum(rev) AS rev
        FROM labeled GROUP BY 1, 2
    )
    SELECT cohort, month_offset, CAST(n_orders AS BIGINT) AS n_orders,
           CAST(sum(rev) OVER (PARTITION BY cohort ORDER BY month_offset
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS cumulative_revenue
    FROM grid ORDER BY 1, 2
    """,
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    first_order = o.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_dt")
    )
    months = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    labeled = o.join(first_order, "o_custkey").select(
        F.date_format(F.trunc("first_dt", "month"), "yyyy-MM").alias("cohort"),
        (months(F.col("o_orderdate")) - months(F.col("first_dt")))
        .cast("long")
        .alias("month_offset"),
        F.col("o_totalprice").cast("decimal(27,2)").alias("rev"),
    )
    grid = labeled.groupBy("cohort", "month_offset").agg(
        F.count(F.lit(1)).alias("n_orders"), F.sum("rev").alias("rev")
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("month_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return grid.select(
        "cohort",
        "month_offset",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.sum("rev").over(w).cast("double").alias("cumulative_revenue"),
    ).orderBy("cohort", "month_offset")


# ---------------------------------------------------------------------------
# Pareto 80/20 concentration — the smallest customer count whose
# revenue crosses 80% of the total, plus their share of the customer
# base: the "how top-heavy is revenue" headline the Gini coefficient
# summarizes abstractly. Customers rank by DECIMAL-exact revenue
# (ties broken by custkey), the running share uses exact decimal
# cumulative sums, and the crossing point is the min rank at ≥80% — an
# exact comparison. One shuffle on custkey, windows over the customer
# aggregate (single-partition sort of one-row-per-customer data; at
# 100 TB the same crossing point comes from a range-partitioned sort +
# per-partition prefix sums with offset carry — the l_pack_sequences
# sharded-prefix-sum machinery).
# ---------------------------------------------------------------------------
@query(
    "q_pareto_8020",
    oracle="""
    WITH per_cust AS (
        SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(27,2))) AS rev
        FROM orders GROUP BY 1
    ),
    ranked AS (
        SELECT rev,
               row_number() OVER (ORDER BY rev DESC, o_custkey) AS rk,
               sum(rev) OVER (ORDER BY rev DESC, o_custkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_rev,
               sum(rev) OVER () AS total_rev,
               count(*) OVER () AS n_cust
        FROM per_cust
    )
    SELECT CAST(min(rk) AS BIGINT) AS n_top_customers,
           CAST(max(n_cust) AS BIGINT) AS n_customers,
           floor(CAST(min(rk) AS DOUBLE) / max(n_cust) * 1e6 + 0.5) / 1e6
               AS top_share_of_base
    FROM ranked
    WHERE CAST(cum_rev AS DOUBLE) >= 0.8 * CAST(total_rev AS DOUBLE)
    """,
)
def q_pareto_8020(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    per_cust = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(27,2)")).alias("rev")
        )
    )
    order_w = Window.orderBy(F.desc("rev"), "o_custkey")
    ranked = per_cust.select(
        "rev",
        F.row_number().over(order_w).alias("rk"),
        F.sum("rev")
        .over(order_w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_rev"),
        F.sum("rev").over(Window.partitionBy()).alias("total_rev"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n_cust"),
    )
    crossed = ranked.where(
        F.col("cum_rev").cast("double")
        >= 0.8 * F.col("total_rev").cast("double")
    )
    return crossed.agg(
        F.min("rk").cast("long").alias("n_top_customers"),
        F.max("n_cust").cast("long").alias("n_customers"),
        (
            F.floor(
                F.min("rk").cast("double") / F.max("n_cust") * 1e6 + F.lit(0.5)
            )
            / 1e6
        ).alias("top_share_of_base"),
    )


# ---------------------------------------------------------------------------
# W16 — month-over-month revenue growth: monthly DECIMAL sums, lag,
# and the percent change from exact-moment doubles — the simplest
# number every finance review opens with. Calendar-bounded
# unpartitioned window (the a25 shape).
# ---------------------------------------------------------------------------
@query(
    "w16_mom_growth",
    oracle="""
    WITH monthly AS (
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
               sum(CAST(o_totalprice AS DECIMAL(27,2))) AS rev
        FROM orders GROUP BY 1
    )
    SELECT month, CAST(rev AS DOUBLE) AS revenue,
           floor((CAST(rev AS DOUBLE)
                  / CAST(lag(rev) OVER (ORDER BY month) AS DOUBLE) - 1.0)
                 * 1e6 + 0.5) / 1e6 AS mom_growth
    FROM monthly ORDER BY 1
    """,
)
def w16_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    monthly = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.date_format(F.trunc("o_orderdate", "month"), "yyyy-MM").alias(
                "month"
            )
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(27,2)")).alias("rev"))
    )
    prev = F.lag("rev").over(Window.orderBy("month"))
    growth = F.col("rev").cast("double") / prev.cast("double") - 1.0
    return monthly.select(
        "month",
        F.col("rev").cast("double").alias("revenue"),
        (F.floor(growth * 1e6 + F.lit(0.5)) / 1e6).alias("mom_growth"),
    ).orderBy("month")


# ---------------------------------------------------------------------------
# A37 — mix-shift analysis: each month's revenue share per order
# priority and its delta vs the prior month — the "did the mix move or
# the volume" decomposition every BI review runs. Shares divide
# DECIMAL-exact sums by the month total (window over the month×priority
# aggregate, never raw orders); the delta is a lag within priority.
# Final arithmetic on exact-moment doubles, floor-rounded (registry
# policy).
# ---------------------------------------------------------------------------
@query(
    "a37_priority_mix_shift",
    oracle="""
    WITH grid AS (
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
               o_orderpriority AS priority,
               sum(CAST(o_totalprice AS DECIMAL(27,2))) AS rev
        FROM orders GROUP BY 1, 2
    ),
    shared AS (
        SELECT month, priority,
               CAST(rev AS DOUBLE)
                   / CAST(sum(rev) OVER (PARTITION BY month) AS DOUBLE)
                   AS share
        FROM grid
    )
    SELECT month, priority,
           floor(share * 1e6 + 0.5) / 1e6 AS revenue_share,
           floor((share - lag(share) OVER (PARTITION BY priority
                                           ORDER BY month)) * 1e6 + 0.5)
               / 1e6 AS share_delta
    FROM shared ORDER BY 1, 2
    """,
)
def a37_priority_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    grid = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.date_format(F.trunc("o_orderdate", "month"), "yyyy-MM").alias(
                "month"
            ),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(27,2)")).alias("rev"))
    )
    share = F.col("rev").cast("double") / F.sum("rev").over(
        Window.partitionBy("month")
    ).cast("double")
    shared = grid.withColumn("share", share)
    delta = F.col("share") - F.lag("share").over(
        Window.partitionBy("priority").orderBy("month")
    )
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return shared.select(
        "month",
        "priority",
        r6(F.col("share")).alias("revenue_share"),
        r6(delta).alias("share_delta"),
    ).orderBy("month", "priority")


# ---------------------------------------------------------------------------
# Join-fanout audit — the lineitems-per-order distribution: the number
# a planner (or an engineer sizing a shuffle) needs BEFORE joining a
# fact to its parent. Histogram of fanout + the p99/max hot keys — the
# relational sibling of g_degree_distribution's graph skew screen.
# Pure integer counts, two equi-key aggregations.
# ---------------------------------------------------------------------------
@query(
    "q_join_fanout_audit",
    oracle="""
    WITH fan AS (
        SELECT l_orderkey, count(*) AS fanout
        FROM lineitem GROUP BY 1
    )
    SELECT fanout, count(*) AS n_orders,
           CAST(sum(fanout) AS BIGINT) AS n_lineitems
    FROM fan GROUP BY 1 ORDER BY 1
    """,
)
def q_join_fanout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    fan = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("fanout"))
    )
    return (
        fan.groupBy("fanout")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("fanout").cast("long").alias("n_lineitems"),
        )
        .orderBy("fanout")
    )


# ---------------------------------------------------------------------------
# Q — ABC inventory classification: parts ranked by net revenue, class A
# = first 80% of cumulative revenue share, B = next 15%, C = the tail.
# Revenue and the cumulative sums are decimal-exact (accumulation-order-
# independent), so the class boundary comparison is deterministic across
# engines. One fact aggregate, one global-ordered cumulative window
# (single reduce over the part-level rollup — small relative to the
# fact), one 3-row summary.
# ---------------------------------------------------------------------------
@query(
    "q_abc_classification",
    oracle="""
    WITH prev AS (
        SELECT l_partkey,
               sum(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(27,4))) AS rev
        FROM lineitem GROUP BY 1
    ),
    ranked AS (
        SELECT l_partkey, rev,
               sum(rev) OVER (ORDER BY rev DESC, l_partkey
                              ROWS UNBOUNDED PRECEDING) AS cum_rev,
               sum(rev) OVER () AS tot_rev
        FROM prev
    ),
    classed AS (
        SELECT CASE
                 WHEN CAST(cum_rev AS DOUBLE) / CAST(tot_rev AS DOUBLE)
                      <= 0.80 THEN 'A'
                 WHEN CAST(cum_rev AS DOUBLE) / CAST(tot_rev AS DOUBLE)
                      <= 0.95 THEN 'B'
                 ELSE 'C'
               END AS abc_class, rev
        FROM ranked
    )
    SELECT abc_class, count(*) AS n_parts,
           round(sum(rev), 2)::DOUBLE AS class_revenue
    FROM classed GROUP BY 1 ORDER BY 1
    """,
)
def q_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    prev = li.groupBy("l_partkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(27,4)"
            )
        ).alias("rev")
    )
    w_cum = (
        Window.orderBy(F.col("rev").desc(), F.col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = prev.select(
        "l_partkey",
        "rev",
        F.sum("rev").over(w_cum).alias("cum_rev"),
        F.sum("rev").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("tot_rev"),
    )
    share = F.col("cum_rev").cast("double") / F.col("tot_rev").cast("double")
    classed = ranked.select(
        F.when(share <= 0.80, F.lit("A"))
        .when(share <= 0.95, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
        "rev",
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.sum("rev"), 2).cast("double").alias("class_revenue"),
        )
        .orderBy("abc_class")
    )


# ---------------------------------------------------------------------------
# Q — order-total recomputation audit: rebuild each order's total from
# its lineitems (price·(1+tax)·(1−discount), decimal-exact) and bucket
# the relative deviation from o_totalprice into a signed-decile
# histogram — the reconciliation report a finance pipeline runs after
# every load. Orders missing lineitems land in a NULL bucket. One
# aggregate + one broadcast-free equi-join on the natural key + one
# tiny histogram aggregate.
# ---------------------------------------------------------------------------
@query(
    "q_totalprice_audit",
    oracle="""
    WITH recomputed AS (
        SELECT l_orderkey,
               CAST(sum(CAST(l_extendedprice * (1 + l_tax) * (1 - l_discount)
                             AS DECIMAL(27,6))) AS DOUBLE) AS recomputed
        FROM lineitem GROUP BY 1
    ),
    dev AS (
        SELECT o.o_orderkey,
               CASE WHEN r.l_orderkey IS NULL THEN NULL
                    ELSE least(greatest(CAST(floor(
                        (r.recomputed - o.o_totalprice) / o.o_totalprice * 10
                        ) AS INTEGER), -10), 9)
               END AS dev_decile
        FROM orders o LEFT JOIN recomputed r ON o.o_orderkey = r.l_orderkey
    )
    SELECT dev_decile, count(*) AS n_orders
    FROM dev GROUP BY 1 ORDER BY dev_decile NULLS FIRST
    """,
)
def q_totalprice_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    recomputed = li.groupBy("l_orderkey").agg(
        F.sum(
            (
                F.col("l_extendedprice")
                * (1 + F.col("l_tax"))
                * (1 - F.col("l_discount"))
            ).cast("decimal(27,6)")
        )
        .cast("double")
        .alias("recomputed")
    )
    dev = o.join(
        recomputed, o.o_orderkey == recomputed.l_orderkey, "left"
    ).select(
        F.when(
            F.col("l_orderkey").isNull(), F.lit(None).cast("int")
        )
        .otherwise(
            F.least(
                F.greatest(
                    F.floor(
                        (F.col("recomputed") - F.col("o_totalprice"))
                        / F.col("o_totalprice")
                        * 10
                    ).cast("int"),
                    F.lit(-10),
                ),
                F.lit(9),
            )
        )
        .alias("dev_decile")
    )
    return (
        dev.groupBy("dev_decile")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("dev_decile").asc_nulls_first())
    )


# ---------------------------------------------------------------------------
# Q — accounts-receivable aging: open (non-final) orders bucketed by
# age against the ledger's latest order date (0-30 / 31-60 / 61-90 /
# 90+ days), with count and decimal-exact open value per bucket — the
# collections report every finance close runs. The as-of date is an
# aggregate broadcast into the scan, never a driver-side collect.
# ---------------------------------------------------------------------------
@query(
    "q_invoice_aging",
    oracle="""
    WITH asof_d AS (SELECT max(o_orderdate) AS maxd FROM orders),
    aged AS (
        SELECT CASE
                 WHEN date_diff('day', o_orderdate, maxd) <= 30 THEN '0-30'
                 WHEN date_diff('day', o_orderdate, maxd) <= 60 THEN '31-60'
                 WHEN date_diff('day', o_orderdate, maxd) <= 90 THEN '61-90'
                 ELSE '90+'
               END AS age_bucket,
               o_totalprice
        FROM orders CROSS JOIN asof_d
        WHERE o_orderstatus <> 'F'
    )
    SELECT age_bucket, count(*) AS n_open,
           round(sum(CAST(o_totalprice AS DECIMAL(27,2))), 2)::DOUBLE
               AS open_value
    FROM aged GROUP BY 1 ORDER BY 1
    """,
)
def q_invoice_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    asof = o.agg(F.max("o_orderdate").alias("maxd"))
    age = F.datediff(F.col("maxd"), F.col("o_orderdate"))
    return (
        o.where(F.col("o_orderstatus") != "F")
        .crossJoin(F.broadcast(asof))
        .select(
            F.when(age <= 30, "0-30")
            .when(age <= 60, "31-60")
            .when(age <= 90, "61-90")
            .otherwise("90+")
            .alias("age_bucket"),
            "o_totalprice",
        )
        .groupBy("age_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_open"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(27,2)")), 2)
            .cast("double")
            .alias("open_value"),
        )
        .orderBy("age_bucket")
    )


# ---------------------------------------------------------------------------
# Q — revenue waterfall by month: gross extended price, the discount
# give-back, net revenue, the tax collected on net, and the final
# charge — each component a decimal-exact per-row product summed
# independently, so the bridge reconciles to the cent. One scan, one
# aggregate.
# ---------------------------------------------------------------------------
@query(
    "q_margin_waterfall",
    oracle="""
    SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
           round(sum(CAST(l_extendedprice AS DECIMAL(27,2))), 2)::DOUBLE
               AS gross,
           round(sum(CAST(l_extendedprice * l_discount
                          AS DECIMAL(27,4))), 2)::DOUBLE AS discount_amt,
           round(sum(CAST(l_extendedprice * (1 - l_discount)
                          AS DECIMAL(27,4))), 2)::DOUBLE AS net,
           round(sum(CAST(l_extendedprice * (1 - l_discount) * l_tax
                          AS DECIMAL(27,6))), 2)::DOUBLE AS tax_amt,
           round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                          AS DECIMAL(27,6))), 2)::DOUBLE AS total_charge
    FROM lineitem GROUP BY 1 ORDER BY 1
    """,
)
def q_margin_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = F.col("l_extendedprice")
    d = F.col("l_discount")
    t = F.col("l_tax")
    ds = lambda c, s: (  # noqa: E731
        F.round(F.sum(c.cast(f"decimal(27,{s})")), 2).cast("double")
    )
    return (
        li.groupBy(
            F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias(
                "month"
            )
        )
        .agg(
            ds(p, 2).alias("gross"),
            ds(p * d, 4).alias("discount_amt"),
            ds(p * (1 - d), 4).alias("net"),
            ds(p * (1 - d) * t, 6).alias("tax_amt"),
            ds(p * (1 - d) * (1 + t), 6).alias("total_charge"),
        )
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# Q — new-vs-returning revenue split per month: a customer's first-ever
# order month tags every later order as "returning". The cohort window
# (min over customer) shares its shuffle with nothing fact-sized — it
# runs over orders once; revenue sums are decimal-exact.
# ---------------------------------------------------------------------------
@query(
    "q_new_vs_returning",
    oracle="""
    WITH tagged AS (
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
               CASE WHEN date_trunc('month', o_orderdate)
                         = min(date_trunc('month', o_orderdate))
                             OVER (PARTITION BY o_custkey)
                    THEN 'new' ELSE 'returning' END AS cohort,
               o_totalprice
        FROM orders
    )
    SELECT month, cohort, count(*) AS n_orders,
           round(sum(CAST(o_totalprice AS DECIMAL(27,2))), 2)::DOUBLE
               AS revenue
    FROM tagged GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    m = F.date_trunc("month", "o_orderdate")
    first_m = F.min(m).over(Window.partitionBy("o_custkey"))
    tagged = o.select(
        F.date_format(m, "yyyy-MM").alias("month"),
        F.when(m == first_m, "new").otherwise("returning").alias("cohort"),
        "o_totalprice",
    )
    return (
        tagged.groupBy("month", "cohort")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(27,2)")), 2)
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("month", "cohort")
    )


# ---------------------------------------------------------------------------
# Q — shipping SLA report: per order priority, the share of orders
# whose FIRST shipment left within 7/30 days of order date, plus the
# mean first-ship lag. Min-shipdate is a per-order aggregate joined
# back on the natural key; day counts are exact integers and the mean
# is a decimal-cast ratio.
# ---------------------------------------------------------------------------
@query(
    "q_sla_shipping",
    oracle="""
    WITH first_ship AS (
        SELECT l_orderkey, min(l_shipdate) AS first_ship
        FROM lineitem GROUP BY 1
    ),
    lagd AS (
        SELECT o.o_orderpriority AS priority,
               date_diff('day', o.o_orderdate, f.first_ship) AS lag_days
        FROM orders o JOIN first_ship f ON o.o_orderkey = f.l_orderkey
    )
    SELECT priority, count(*) AS n_orders,
           CAST(sum(CASE WHEN lag_days <= 7 THEN 1 ELSE 0 END) AS BIGINT)
               AS within_7d,
           CAST(sum(CASE WHEN lag_days <= 30 THEN 1 ELSE 0 END) AS BIGINT)
               AS within_30d,
           floor(CAST(sum(CAST(lag_days AS DECIMAL(27,0))) AS DOUBLE)
                 / count(*) * 1e4 + 0.5) / 1e4 AS avg_lag_days
    FROM lagd GROUP BY 1 ORDER BY 1
    """,
)
def q_sla_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    first_ship = li.groupBy("l_orderkey").agg(
        F.min("l_shipdate").alias("first_ship")
    )
    lagd = o.join(first_ship, o.o_orderkey == first_ship.l_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(F.col("first_ship"), F.col("o_orderdate")).alias(
            "lag_days"
        ),
    )
    return (
        lagd.groupBy("priority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.when(F.col("lag_days") <= 7, 1).otherwise(0)).alias(
                "within_7d"
            ),
            F.sum(F.when(F.col("lag_days") <= 30, 1).otherwise(0)).alias(
                "within_30d"
            ),
            (
                F.floor(
                    F.sum(F.col("lag_days").cast("decimal(27,0)")).cast(
                        "double"
                    )
                    / F.count(F.lit(1))
                    * 1e4
                    + F.lit(0.5)
                )
                / 1e4
            ).alias("avg_lag_days"),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# Q — monthly seasonal index: each calendar month's revenue share of
# its year, × 12 — an index of 1.0 means "an average month". The
# classic ratio-to-yearly-average decomposition, exact because both
# numerator and denominator are decimal sums.
# ---------------------------------------------------------------------------
@query(
    "q_seasonal_index",
    oracle="""
    WITH monthly AS (
        SELECT CAST(date_part('year', o_orderdate) AS INTEGER) AS yr,
               CAST(date_part('month', o_orderdate) AS INTEGER) AS mth,
               sum(CAST(o_totalprice AS DECIMAL(27,2))) AS rev
        FROM orders GROUP BY 1, 2
    ),
    with_year AS (
        SELECT yr, mth, rev,
               sum(rev) OVER (PARTITION BY yr) AS yr_rev,
               count(*) OVER (PARTITION BY yr) AS n_months
        FROM monthly
    )
    SELECT yr, mth,
           round(rev, 2)::DOUBLE AS revenue,
           floor(CAST(rev AS DOUBLE) / CAST(yr_rev AS DOUBLE) * n_months
                 * 1e6 + 0.5) / 1e6 AS seasonal_index
    FROM with_year ORDER BY yr, mth
    """,
)
def q_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mth"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(27,2)")).alias("rev"))
    w = Window.partitionBy("yr")
    with_year = monthly.select(
        "yr",
        "mth",
        "rev",
        F.sum("rev").over(w).alias("yr_rev"),
        F.count(F.lit(1)).over(w).alias("n_months"),
    )
    return with_year.select(
        "yr",
        "mth",
        F.round("rev", 2).cast("double").alias("revenue"),
        (
            F.floor(
                F.col("rev").cast("double")
                / F.col("yr_rev").cast("double")
                * F.col("n_months")
                * 1e6
                + F.lit(0.5)
            )
            / 1e6
        ).alias("seasonal_index"),
    ).orderBy("yr", "mth")


# ---------------------------------------------------------------------------
# q_distribution_psi — Population Stability Index drift monitor: the
# order-total distribution after 1998-06-01 scored against decile bins
# fitted on the period before it (the deployed-model-vs-training-data
# check run before any corpus or feature refresh). Bin boundaries come
# from ntile(10) on the reference period with an o_orderkey tiebreak
# (total order → identical tiles cross-engine); both periods are then
# binned BY THE BOUNDARIES (1 + count of boundaries below v) via a
# broadcast 9-element array, so assignment is a map-side higher-order
# filter, no join. Laplace-smoothed shares guard empty bins; each bin's
# (p−q)·ln(p/q) term is rounded to DECIMAL(27,9) before the cross-bin
# sum (the l_zipf_fit cross-libm policy). Scale note: the reference
# ntile is the test-scale boundary fit — at 100 TB boundaries come from
# approx_percentile or a fixed grid (documented; the scoring side is
# already map-side-only either way).
# ---------------------------------------------------------------------------
_PSI_SPLIT = "1998-06-01"


@query(
    "q_distribution_psi",
    oracle=f"""
    WITH o AS (
        SELECT o_totalprice AS v, o_orderkey,
               CASE WHEN o_orderdate < TIMESTAMP '{_PSI_SPLIT} 00:00:00'
                    THEN 0 ELSE 1 END AS period
        FROM orders
    ),
    tiles AS (
        SELECT v, ntile(10) OVER (ORDER BY v, o_orderkey) AS tile
        FROM o WHERE period = 0
    ),
    bnds AS (
        SELECT list_sort(list(b)) AS bnds
        FROM (SELECT max(v) AS b FROM tiles WHERE tile <= 9 GROUP BY tile)
    ),
    assigned AS (
        SELECT o.period,
               1 + len(list_filter(bnds.bnds, x -> x < o.v)) AS bin
        FROM o, bnds
    ),
    counts AS (
        SELECT bin,
               sum(CASE WHEN period = 0 THEN 1 ELSE 0 END) AS n_ref,
               sum(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS n_cur
        FROM assigned GROUP BY bin
    ),
    shares AS (
        SELECT bin, n_ref, n_cur,
               sum(n_ref) OVER () AS t_ref,
               sum(n_cur) OVER () AS t_cur
        FROM counts
    ),
    terms AS (
        SELECT bin, n_ref, n_cur,
               CASE WHEN t_ref = 0 THEN 0.0
                    ELSE CAST(n_ref AS DOUBLE) / t_ref END AS share_ref,
               CASE WHEN t_cur = 0 THEN 0.0
                    ELSE CAST(n_cur AS DOUBLE) / t_cur END AS share_cur,
               CAST(((n_ref + 1.0) / (t_ref + 10) - (n_cur + 1.0) / (t_cur + 10))
                    * ln(((n_ref + 1.0) / (t_ref + 10))
                         / ((n_cur + 1.0) / (t_cur + 10)))
                    AS DECIMAL(27,9)) AS psi_term
        FROM shares
    )
    SELECT CAST(bin AS INT) AS bin,
           CAST(n_ref AS BIGINT) AS n_ref,
           CAST(n_cur AS BIGINT) AS n_cur,
           floor(share_ref * 1e6 + 0.5) / 1e6 AS share_ref,
           floor(share_cur * 1e6 + 0.5) / 1e6 AS share_cur,
           CAST(psi_term AS DOUBLE) AS psi_term,
           CAST(sum(psi_term) OVER () AS DOUBLE) AS psi_total
    FROM terms ORDER BY bin
    """,
)
def q_distribution_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("v"),
        "o_orderkey",
        F.when(F.col("o_orderdate") < F.lit(_PSI_SPLIT), 0)
        .otherwise(1)
        .alias("period"),
    )
    tiles = o.where(F.col("period") == 0).select(
        "v", F.ntile(10).over(Window.orderBy("v", "o_orderkey")).alias("tile")
    )
    bnds = (
        tiles.where(F.col("tile") <= 9)
        .groupBy("tile")
        .agg(F.max("v").alias("b"))
        .agg(F.sort_array(F.collect_list("b")).alias("bnds"))
    )
    assigned = o.crossJoin(F.broadcast(bnds)).selectExpr(
        "period", "1 + size(filter(bnds, x -> x < v)) AS bin"
    )
    counts = assigned.groupBy("bin").agg(
        F.sum(F.when(F.col("period") == 0, 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("period") == 1, 1).otherwise(0)).alias("n_cur"),
    )
    full = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    shares = counts.select(
        "bin",
        "n_ref",
        "n_cur",
        F.sum("n_ref").over(full).alias("t_ref"),
        F.sum("n_cur").over(full).alias("t_cur"),
    )
    n_ref, n_cur = F.col("n_ref"), F.col("n_cur")
    t_ref, t_cur = F.col("t_ref"), F.col("t_cur")
    p = (n_ref + 1.0) / (t_ref + 10)
    q = (n_cur + 1.0) / (t_cur + 10)
    terms = shares.select(
        "bin",
        "n_ref",
        "n_cur",
        F.when(t_ref == 0, 0.0)
        .otherwise(n_ref.cast("double") / t_ref)
        .alias("share_ref"),
        F.when(t_cur == 0, 0.0)
        .otherwise(n_cur.cast("double") / t_cur)
        .alias("share_cur"),
        ((p - q) * F.log(p / q)).cast("decimal(27,9)").alias("psi_term"),
    )
    return terms.select(
        F.col("bin").cast("int").alias("bin"),
        n_ref.cast("long").alias("n_ref"),
        n_cur.cast("long").alias("n_cur"),
        (F.floor(F.col("share_ref") * 1e6 + F.lit(0.5)) / 1e6).alias(
            "share_ref"
        ),
        (F.floor(F.col("share_cur") * 1e6 + F.lit(0.5)) / 1e6).alias(
            "share_cur"
        ),
        F.col("psi_term").cast("double").alias("psi_term"),
        F.sum("psi_term").over(full).cast("double").alias("psi_total"),
    ).orderBy("bin")


# ---------------------------------------------------------------------------
# q_markov_attribution — Markov removal-effect attribution (the
# data-driven alternative to first/last-touch in q_touch_attribution):
# model each user's event journey as a first-order chain
# (start → view/click/signup/error → conv|null, absorbing at the first
# purchase), then credit each channel by how much the K-step conversion
# probability drops when that channel's transitions are redirected to
# null (the standard removal-effect construction, no renormalization).
#
# Scale/exactness split: the DATA-sized work is the transition-count
# aggregate (one ordered window per user + one groupBy — linear, the
# q_event_transitions shape); the chain solve runs on the
# state-space-bounded count matrix (≤ (#event_types+2)² rows — NOT
# data-sized; it returns to the driver under the same bounded-collect
# contract as the IVF centroid matrix). Probabilities are scaled
# integers: pnum = cnt·1e12 div tot, iterates live at 1e6 scale, every
# update Σ(pnum·v) div 1e12 stays within BIGINT (Σpnum ≤ 1e12, v ≤ 1e6
# → ≤ 1e18) — non-negative throughout, so Python //, Spark DIV and
# DuckDB // agree, and the oracle replays all K=8 unrolled iterations
# per scenario bit-for-bit.
# ---------------------------------------------------------------------------
_MK_CHANNELS = ("click", "error", "signup", "view")
_MK_K = 8
_MK_TRANS_SQL = """
    ev AS (
        SELECT user_id,
               CASE WHEN event_type = 'purchase' THEN 'conv'
                    ELSE event_type END AS state,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ),
    cut AS (
        SELECT user_id,
               coalesce(min(CASE WHEN state = 'conv' THEN rn END),
                        2147483647) AS convrn
        FROM ev GROUP BY 1
    ),
    kept AS (
        SELECT e.user_id, e.state, e.rn
        FROM ev e JOIN cut c USING (user_id) WHERE e.rn <= c.convrn
    ),
    steps AS (
        SELECT state AS t,
               coalesce(lag(state) OVER (PARTITION BY user_id ORDER BY rn),
                        'start') AS f
        FROM kept
    ),
    ends AS (SELECT user_id, max(rn) AS mrn FROM kept GROUP BY 1),
    lasts AS (
        SELECT k.state AS f, 'null' AS t
        FROM kept k JOIN ends e ON k.user_id = e.user_id AND k.rn = e.mrn
        WHERE k.state <> 'conv'
    ),
    trans AS (
        SELECT f, t FROM steps UNION ALL SELECT f, t FROM lasts
    ),
    counts AS (SELECT f, t, count(*) AS cnt FROM trans GROUP BY 1, 2),
    tots AS (SELECT f, sum(cnt) AS tot FROM counts GROUP BY 1),
    pfull AS MATERIALIZED (
        SELECT c.f, c.t,
               CAST((c.cnt * 1000000000000) // t2.tot AS BIGINT) AS pnum
        FROM counts c JOIN tots t2 ON c.f = t2.f
    )
"""


def _mk_chain_ctes(tag: str, excl: str | None) -> str:
    where = f"WHERE t <> '{excl}'" if excl else ""
    out = [
        f"p{tag} AS (SELECT f, t, pnum FROM pfull {where})",
        f"v{tag}0 AS (SELECT 'conv' AS s, CAST(1000000 AS BIGINT) AS v)",
    ]
    prev = f"v{tag}0"
    for k in range(1, _MK_K + 1):
        out.append(
            f"""v{tag}{k} AS (
        SELECT p.f AS s,
               CAST(sum(p.pnum * coalesce(vp.v, 0)) // 1000000000000
                    AS BIGINT) AS v
        FROM p{tag} p LEFT JOIN {prev} vp ON vp.s = p.t
        GROUP BY p.f
        UNION ALL SELECT 'conv', CAST(1000000 AS BIGINT))"""
        )
        prev = f"v{tag}{k}"
    return ",\n    ".join(out)


def _mk_oracle_sql() -> str:
    chains = [_mk_chain_ctes("f0", None)] + [
        _mk_chain_ctes(f"x{i}", c) for i, c in enumerate(_MK_CHANNELS)
    ]
    start_v = (
        "coalesce((SELECT v FROM v{tag}%d WHERE s = 'start'), 0)" % _MK_K
    )
    rows = ",\n        ".join(
        f"('{c}', {start_v.format(tag='f0')}, {start_v.format(tag=f'x{i}')})"
        for i, c in enumerate(_MK_CHANNELS)
    )
    chains_sql = ",\n    ".join(chains)
    return f"""
    WITH {_MK_TRANS_SQL},
    {chains_sql},
    report(channel, vf, vr) AS (VALUES
        {rows})
    SELECT channel,
           CAST(vf AS DOUBLE) / 1e6 AS p_conv_full,
           CAST(vr AS DOUBLE) / 1e6 AS p_conv_removed,
           CASE WHEN vf = 0 THEN NULL
                ELSE floor(CAST(vf - vr AS DOUBLE) / vf * 1e6 + 0.5) / 1e6
           END AS removal_effect
    FROM report ORDER BY channel
    """


@query("q_markov_attribution", oracle=_mk_oracle_sql())
def q_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.when(F.col("event_type") == "purchase", "conv")
        .otherwise(F.col("event_type"))
        .alias("state"),
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("rn"),
    )
    cut = ev.groupBy("user_id").agg(
        F.coalesce(
            F.min(F.when(F.col("state") == "conv", F.col("rn"))),
            F.lit(2147483647),
        ).alias("convrn")
    )
    kept = ev.join(cut, "user_id").where(F.col("rn") <= F.col("convrn"))
    steps = kept.select(
        F.col("state").alias("t"),
        F.coalesce(
            F.lag("state").over(
                Window.partitionBy("user_id").orderBy("rn")
            ),
            F.lit("start"),
        ).alias("f"),
    )
    ends = kept.groupBy("user_id").agg(F.max("rn").alias("mrn"))
    lasts = (
        kept.join(ends, "user_id")
        .where((F.col("rn") == F.col("mrn")) & (F.col("state") != "conv"))
        .select(F.col("state").alias("f"), F.lit("null").alias("t"))
    )
    counts = (
        steps.unionByName(lasts)
        .groupBy("f", "t")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # State-space-bounded collect: ≤ (#event_types + 2)² rows ever reach
    # the driver — the transition MATRIX, never the transitions.
    rows = counts.collect()
    cnt = {(r["f"], r["t"]): int(r["cnt"]) for r in rows}
    tot: dict = {}
    for (f, _t), c in cnt.items():
        tot[f] = tot.get(f, 0) + c
    pnum = {
        (f, t): (c * 10**12) // tot[f] for (f, t), c in cnt.items()
    }

    def chain(excl: str | None) -> int:
        p = {k: v for k, v in pnum.items() if excl is None or k[1] != excl}
        v = {"conv": 10**6}
        for _ in range(_MK_K):
            nxt: dict = {}
            for (f, t), pn in p.items():
                nxt[f] = nxt.get(f, 0) + pn * v.get(t, 0)
            v = {f: s // 10**12 for f, s in nxt.items()}
            v["conv"] = 10**6
        return v.get("start", 0)

    vf = chain(None)
    out = []
    for c in _MK_CHANNELS:
        vr = chain(c)
        # vf == 0 (no start→conv path within K steps) would divide by
        # zero; emit NULL removal_effect — the oracle mirrors the guard.
        eff = (
            None
            if vf == 0
            else __import__("math").floor((vf - vr) / vf * 1e6 + 0.5) / 1e6
        )
        out.append((c, vf / 1e6, vr / 1e6, eff))
    return local_frame(spark, 
        out,
        "channel STRING, p_conv_full DOUBLE, p_conv_removed DOUBLE, "
        "removal_effect DOUBLE",
    ).orderBy("channel")


# ---------------------------------------------------------------------------
# q_abc_xyz_matrix — the inventory-planning classification grid: parts
# classed A/B/C by cumulative revenue share (80/95 cuts — the
# q_abc_classification rule) and X/Y/Z by demand variability
# (coefficient of variation of monthly quantities: <0.5 X, <1.0 Y,
# else Z). Revenue shares use exact decimal cumulative sums over the
# part rollup; CV comes from decimal moments (n·Σq² − (Σq)² rational
# core, divide-last). One scan builds both part-level aggregates; the
# 9-cell report is the planning artifact. Windows partition nothing
# data-sized except the part rollup (catalog-bounded).
# ---------------------------------------------------------------------------
@query(
    "q_abc_xyz_matrix",
    oracle="""
    WITH monthly AS (
        SELECT l_partkey, date_trunc('month', l_shipdate) AS m,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2))
                   AS q
        FROM lineitem GROUP BY 1, 2
    ),
    part_var AS (
        SELECT l_partkey, count(*) AS nm,
               CAST(sum(q) AS DOUBLE) AS sq,
               CAST(sum(CAST(q * q AS DECIMAL(38,4))) AS DOUBLE) AS sqq
        FROM monthly GROUP BY 1
    ),
    part_rev AS (
        SELECT l_partkey,
               sum(CAST(l_extendedprice AS DECIMAL(27,2))) AS rev
        FROM lineitem GROUP BY 1
    ),
    ranked AS (
        SELECT r.l_partkey, r.rev,
               sum(r.rev) OVER (ORDER BY r.rev DESC, r.l_partkey
                                ROWS UNBOUNDED PRECEDING) AS cum_rev,
               sum(r.rev) OVER () AS tot_rev
        FROM part_rev r
    ),
    classed AS (
        SELECT rk.l_partkey,
               CASE WHEN cum_rev * 100 <= tot_rev * 80 THEN 'A'
                    WHEN cum_rev * 100 <= tot_rev * 95 THEN 'B'
                    ELSE 'C' END AS abc,
               CASE WHEN pv.nm < 2 THEN 'Z'
                    WHEN sqrt(greatest(pv.nm * pv.sqq - pv.sq * pv.sq, 0)
                              / (pv.nm * (pv.nm - 1))) * pv.nm / pv.sq < 0.5
                        THEN 'X'
                    WHEN sqrt(greatest(pv.nm * pv.sqq - pv.sq * pv.sq, 0)
                              / (pv.nm * (pv.nm - 1))) * pv.nm / pv.sq < 1.0
                        THEN 'Y'
                    ELSE 'Z' END AS xyz,
               rk.rev
        FROM ranked rk JOIN part_var pv ON pv.l_partkey = rk.l_partkey
    )
    SELECT abc, xyz, CAST(count(*) AS BIGINT) AS n_parts,
           floor(CAST(sum(rev) AS DOUBLE) * 1e2 + 0.5) / 1e2 AS revenue
    FROM classed GROUP BY 1, 2 ORDER BY abc, xyz
    """,
)
def q_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        "l_partkey", F.date_trunc("month", F.col("l_shipdate")).alias("m")
    ).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("q")
    )
    part_var = monthly.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("nm"),
        F.sum("q").cast("double").alias("sq"),
        F.sum((F.col("q") * F.col("q")).cast("decimal(38,4)"))
        .cast("double")
        .alias("sqq"),
    )
    part_rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(27,2)")).alias("rev")
    )
    run = Window.orderBy(F.col("rev").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    full = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = part_rev.select(
        "l_partkey",
        "rev",
        F.sum("rev").over(run).alias("cum_rev"),
        F.sum("rev").over(full).alias("tot_rev"),
    )
    nm, sq, sqq = F.col("nm"), F.col("sq"), F.col("sqq")
    cv = (
        F.sqrt(
            F.greatest(nm * sqq - sq * sq, F.lit(0)) / (nm * (nm - 1))
        )
        * nm
        / sq
    )
    classed = ranked.join(part_var, "l_partkey").select(
        F.when(F.col("cum_rev") * 100 <= F.col("tot_rev") * 80, "A")
        .when(F.col("cum_rev") * 100 <= F.col("tot_rev") * 95, "B")
        .otherwise("C")
        .alias("abc"),
        F.when(nm < 2, "Z")
        .when(cv < 0.5, "X")
        .when(cv < 1.0, "Y")
        .otherwise("Z")
        .alias("xyz"),
        "rev",
    )
    return (
        classed.groupBy("abc", "xyz")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            (F.floor(F.sum("rev").cast("double") * 1e2 + F.lit(0.5)) / 1e2).alias(
                "revenue"
            ),
        )
        .orderBy("abc", "xyz")
    )


# ---------------------------------------------------------------------------
# q_fraud_velocity — transaction-velocity screen (the first-line card
# fraud rule): for every order, how many orders the same customer
# placed in the trailing 7 days, flagging customers whose peak
# velocity exceeds the threshold. RANGE window on epoch-day keyed per
# customer — partition-parallel, bounded frame, no self-join. Output is
# the flagged-customer summary (peak velocity, order count, span), the
# shape a rules engine consumes.
# ---------------------------------------------------------------------------
_VEL_DAYS = 7
_VEL_MAX = 4


@query(
    "q_fraud_velocity",
    oracle=f"""
    WITH o AS (
        SELECT o_custkey,
               CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS dd
        FROM orders
    ),
    vel AS (
        SELECT o_custkey, dd,
               count(*) OVER (PARTITION BY o_custkey ORDER BY dd
                              RANGE BETWEEN {_VEL_DAYS - 1} PRECEDING
                                        AND CURRENT ROW) AS v7
        FROM o
    )
    SELECT o_custkey AS custkey,
           CAST(max(v7) AS BIGINT) AS peak_velocity_7d,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(max(dd) - min(dd) AS BIGINT) AS active_span_days
    FROM vel GROUP BY 1 HAVING max(v7) >= {_VEL_MAX}
    ORDER BY peak_velocity_7d DESC, custkey
    """,
)
def q_fraud_velocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).alias("dd"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("dd")
        .rangeBetween(-(_VEL_DAYS - 1), 0)
    )
    vel = o.select(
        "o_custkey", "dd", F.count(F.lit(1)).over(w).alias("v7")
    )
    return (
        vel.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("v7").cast("long").alias("peak_velocity_7d"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            (F.max("dd") - F.min("dd")).cast("long").alias("active_span_days"),
        )
        .where(F.col("peak_velocity_7d") >= _VEL_MAX)
        .orderBy(F.col("peak_velocity_7d").desc(), "custkey")
    )


# ---------------------------------------------------------------------------
# q_bilateral_netting — bilateral settlement netting between nations:
# gross trade flow in each direction of every nation pair (revenue
# where the supplier sits in one nation and the customer in the other)
# and the net position after offsetting — the clearing-house
# computation that collapses two gross obligations into one net wire.
# Flows aggregate to the nation-pair grid BEFORE netting (exact
# DECIMAL), the two directions meet in a full-outer self-merge of the
# tiny grid, and dims broadcast into the fact scan (the tpch_q7 join
# shape without its year filter).
# ---------------------------------------------------------------------------
@query(
    "q_bilateral_netting",
    oracle="""
    WITH flows AS (
        SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
               sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                        AS DECIMAL(27,4))) AS gross
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation ns ON s.s_nationkey = ns.n_nationkey
        JOIN nation nc ON c.c_nationkey = nc.n_nationkey
        WHERE ns.n_name <> nc.n_name
        GROUP BY 1, 2
    ),
    paired AS (
        SELECT least(supp_nation, cust_nation) AS nation_a,
               greatest(supp_nation, cust_nation) AS nation_b,
               sum(CASE WHEN supp_nation < cust_nation
                        THEN gross ELSE CAST(0 AS DECIMAL(27,4)) END)
                   AS gross_ab,
               sum(CASE WHEN supp_nation > cust_nation
                        THEN gross ELSE CAST(0 AS DECIMAL(27,4)) END)
                   AS gross_ba
        FROM flows GROUP BY 1, 2
    )
    SELECT nation_a, nation_b,
           floor(CAST(gross_ab AS DOUBLE) * 1e2 + 0.5) / 1e2 AS gross_ab,
           floor(CAST(gross_ba AS DOUBLE) * 1e2 + 0.5) / 1e2 AS gross_ba,
           floor(CAST(gross_ab - gross_ba AS DOUBLE) * 1e2 + 0.5) / 1e2
               AS net_ab,
           CASE WHEN gross_ab >= gross_ba THEN nation_a ELSE nation_b END
               AS net_payee
    FROM paired ORDER BY nation_a, nation_b
    """,
)
def q_bilateral_netting(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    ns = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    nc = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    flows = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(c), o.o_custkey == c.c_custkey)
        .join(maybe_broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nk"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(27,4)"
                )
            ).alias("gross")
        )
    )
    zero = F.lit(0).cast("decimal(27,4)")
    paired = flows.groupBy(
        F.least("supp_nation", "cust_nation").alias("nation_a"),
        F.greatest("supp_nation", "cust_nation").alias("nation_b"),
    ).agg(
        F.sum(
            F.when(
                F.col("supp_nation") < F.col("cust_nation"), F.col("gross")
            ).otherwise(zero)
        ).alias("gross_ab"),
        F.sum(
            F.when(
                F.col("supp_nation") > F.col("cust_nation"), F.col("gross")
            ).otherwise(zero)
        ).alias("gross_ba"),
    )
    f2 = lambda c_: F.floor(c_.cast("double") * 1e2 + F.lit(0.5)) / 1e2
    return paired.select(
        "nation_a",
        "nation_b",
        f2(F.col("gross_ab")).alias("gross_ab"),
        f2(F.col("gross_ba")).alias("gross_ba"),
        f2(F.col("gross_ab") - F.col("gross_ba")).alias("net_ab"),
        F.when(
            F.col("gross_ab") >= F.col("gross_ba"), F.col("nation_a")
        )
        .otherwise(F.col("nation_b"))
        .alias("net_payee"),
    ).orderBy("nation_a", "nation_b")


# ---------------------------------------------------------------------------
# q_three_way_match — the accounts-payable three-way match control
# (PO × goods receipt × invoice): every line is classified as clean,
# quantity-mismatch, price-mismatch or both, with the money at risk
# per class. Receipt and invoice sides are deterministic derivations of
# the PO line (short-ship every 13th part, price-uplift every 11th) so
# the control has real exceptions to catch; tolerance is 1% on price,
# exact on quantity. One scan builds all three legs (no join needed for
# the simulation; in production this is a 3-way equi-join on the PO
# line key, which the classification logic here is agnostic to).
# Amounts are INTEGER CENTS end to end: the uplifted invoice quantizes
# with floor(x*100+0.5) on the IEEE double (bit-identical across
# engines), NOT a double→DECIMAL(18,2) cast — 100.50·1.03 = 103.515 is
# a 2-dp midpoint, and Spark rounds the double's shortest decimal
# representation (103.52) while DuckDB rounds the exact binary value
# (103.51), a divergence that first surfaced at sf0.1 aggregate
# magnitude (round-12 full drain). The tolerance comparison multiplies
# both sides (|inv−po|·100 ≤ po) so no division enters the predicate,
# and cent sums stay int64-exact (< 2^53) before one final /100.
# ---------------------------------------------------------------------------
@query(
    "q_three_way_match",
    oracle="""
    WITH legs AS (
        SELECT l_quantity AS po_qty,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                   AS po_cents,
               CASE WHEN l_partkey % 13 = 0 THEN l_quantity - 1
                    ELSE l_quantity END AS rcpt_qty,
               CASE WHEN l_partkey % 11 = 0
                    THEN CAST(floor(l_extendedprice * 1.03 * 100 + 0.5)
                              AS BIGINT)
                    ELSE CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                    END AS inv_cents
        FROM lineitem
    ),
    classed AS (
        SELECT *,
               CASE WHEN rcpt_qty <> po_qty AND
                         abs(inv_cents - po_cents) * 100 > po_cents
                        THEN 'qty_and_price'
                    WHEN rcpt_qty <> po_qty THEN 'qty_mismatch'
                    WHEN abs(inv_cents - po_cents) * 100 > po_cents
                        THEN 'price_mismatch'
                    ELSE 'clean' END AS verdict
        FROM legs
    )
    SELECT verdict,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(inv_cents) AS DOUBLE) / 1e2 AS invoiced_amount,
           CAST(sum(inv_cents - po_cents) AS DOUBLE) / 1e2
               AS amount_at_risk
    FROM classed GROUP BY verdict ORDER BY verdict
    """,
)
def q_three_way_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    po_cents = F.floor(
        F.col("l_extendedprice") * 100 + F.lit(0.5)
    ).cast("long")
    inv_cents = F.when(
        F.col("l_partkey") % 11 == 0,
        F.floor(F.col("l_extendedprice") * 1.03 * 100 + F.lit(0.5)).cast(
            "long"
        ),
    ).otherwise(po_cents)
    legs = li.select(
        F.col("l_quantity").alias("po_qty"),
        po_cents.alias("po_cents"),
        F.when(
            F.col("l_partkey") % 13 == 0, F.col("l_quantity") - 1
        )
        .otherwise(F.col("l_quantity"))
        .alias("rcpt_qty"),
        inv_cents.alias("inv_cents"),
    )
    price_bad = (
        F.abs(F.col("inv_cents") - F.col("po_cents")) * 100
        > F.col("po_cents")
    )
    qty_bad = F.col("rcpt_qty") != F.col("po_qty")
    classed = legs.withColumn(
        "verdict",
        F.when(qty_bad & price_bad, "qty_and_price")
        .when(qty_bad, "qty_mismatch")
        .when(price_bad, "price_mismatch")
        .otherwise("clean"),
    )
    return (
        classed.groupBy("verdict")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            (F.sum("inv_cents").cast("double") / 1e2).alias(
                "invoiced_amount"
            ),
            (
                F.sum(F.col("inv_cents") - F.col("po_cents")).cast("double")
                / 1e2
            ).alias("amount_at_risk"),
        )
        .orderBy("verdict")
    )


# ---------------------------------------------------------------------------
# q_duplicate_payments_fuzzy — the realistic AP double-payment screen
# (q_duplicate_payments' exact-match sibling): same customer, amounts
# within 1%, dates within 7 days — the pattern that catches re-keyed
# invoices exact matching misses. Candidate-then-verify shape: orders
# band by (customer, 7-day date bucket) with each order probing its own
# and BOTH adjacent buckets (pigeonhole: |Δdate| ≤ 7 ⇒ same or
# adjacent bucket, and okey order is independent of date order, so
# both directions must probe; DISTINCT collapses double matches), then
# the exact predicates verify. The
# amount tolerance is multiplication-only (|Δamt|·100 ≤ min·1 — no
# division) on integer cents. Fanout is bounded by per-customer weekly
# order volume — never a customer-wide cross product.
# ---------------------------------------------------------------------------
@query(
    "q_duplicate_payments_fuzzy",
    oracle="""
    WITH o AS (
        SELECT o_orderkey AS okey, o_custkey AS cust,
               CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS dd,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders
    ),
    probes AS (
        SELECT okey, cust, dd, cents,
               (dd // 7) + b.b AS bucket
        FROM o, (SELECT unnest(range(-1, 2)) AS b) b
    ),
    cand AS (
        SELECT DISTINCT a.cust, a.okey AS okey_a, c.okey AS okey_b,
               a.cents AS cents_a, c.cents AS cents_b,
               abs(a.dd - c.dd) AS day_gap
        FROM probes a JOIN o c
          ON a.cust = c.cust AND a.bucket = (c.dd // 7)
         AND a.okey < c.okey
    )
    SELECT cust AS custkey, okey_a, okey_b,
           floor(CAST(cents_a AS DOUBLE) / 100 * 1e2 + 0.5) / 1e2 AS amt_a,
           floor(CAST(cents_b AS DOUBLE) / 100 * 1e2 + 0.5) / 1e2 AS amt_b,
           CAST(day_gap AS BIGINT) AS day_gap
    FROM cand
    WHERE day_gap <= 7
      AND abs(cents_a - cents_b) * 100 <= least(cents_a, cents_b)
    ORDER BY custkey, okey_a, okey_b
    """,
)
def q_duplicate_payments_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_custkey").alias("cust"),
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).alias("dd"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    probes = o.select(
        "okey",
        "cust",
        "dd",
        "cents",
        F.explode(F.sequence(F.lit(-1), F.lit(1))).alias("b"),
    ).withColumn("bucket", F.expr("(dd div 7) + b"))
    c = o.select(
        F.col("okey").alias("okey_b"),
        F.col("cust").alias("cust_b"),
        F.col("dd").alias("dd_b"),
        F.col("cents").alias("cents_b"),
    )
    # No DISTINCT (r15): the oracle's DISTINCT is provably a no-op
    # here, so the engine drops its Exchange + two HashAggregates over
    # the candidate set. Proof: a pair (a, b) joins when
    # bucket(a) + off == bucket(b) for off ∈ {-1, 0, 1}; bucket(b) is a
    # single value, so EXACTLY ONE probe offset satisfies the equality
    # (the three probe rows of `a` carry three distinct bucket values),
    # and okey_a < okey_b orients each pair once — candidate rows are
    # already unique. The oracle keeps DISTINCT (its comment predates
    # the proof); the hash compare would catch any duplicate this
    # reasoning missed.
    cand = probes.join(
        c,
        (F.col("cust") == F.col("cust_b"))
        & (F.col("bucket") == F.expr("dd_b div 7"))
        & (F.col("okey") < F.col("okey_b")),
    ).select(
        "cust",
        F.col("okey").alias("okey_a"),
        "okey_b",
        F.col("cents").alias("cents_a"),
        "cents_b",
        F.abs(F.col("dd") - F.col("dd_b")).alias("day_gap"),
    )
    f2 = lambda col: F.floor(col.cast("double") / 100 * 1e2 + F.lit(0.5)) / 1e2
    return (
        cand.where(
            (F.col("day_gap") <= 7)
            & (
                F.abs(F.col("cents_a") - F.col("cents_b")) * 100
                <= F.least(F.col("cents_a"), F.col("cents_b"))
            )
        )
        .select(
            F.col("cust").alias("custkey"),
            "okey_a",
            "okey_b",
            f2(F.col("cents_a")).alias("amt_a"),
            f2(F.col("cents_b")).alias("amt_b"),
            F.col("day_gap").cast("long").alias("day_gap"),
        )
        .orderBy("custkey", "okey_a", "okey_b")
    )


# ---------------------------------------------------------------------------
# q_aging_buckets — the aging CONTROL MATRIX: q_invoice_aging's (r6)
# four bucket totals expanded into the bucket × priority grid with
# per-cell exposure SHARE of the open book — the drill-down a credit
# controller actually works from (which priority class is aging out),
# where q_invoice_aging is the one-line summary. Strictly-open 'O'
# status (vs its <>'F'), integer-cent sums (vs decimal), shares
# floored at 1e-6; as-of = ledger close (max order date over the WHOLE
# book — no wall clock, reproducible). One scan + one hash aggregate;
# the as-of scalar broadcasts; at 100 TB the status filter prunes the
# scan if the sink partitions by status.
# ---------------------------------------------------------------------------
@query(
    "q_aging_buckets",
    oracle="""
    WITH closing AS (SELECT max(CAST(o_orderdate AS DATE)) AS d0 FROM orders),
    aged AS (
        SELECT o_orderpriority AS priority,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
               (SELECT d0 FROM closing) - CAST(o_orderdate AS DATE) AS age
        FROM orders WHERE o_orderstatus = 'O'
    ),
    bucketed AS (
        SELECT CASE WHEN age <= 30 THEN '0-030'
                    WHEN age <= 60 THEN '031-060'
                    WHEN age <= 90 THEN '061-090'
                    ELSE '090+' END AS bucket,
               priority, cents
        FROM aged
    ),
    agg AS (
        SELECT bucket, priority, count(*) AS n_orders,
               sum(cents) AS c
        FROM bucketed GROUP BY 1, 2
    )
    SELECT bucket, priority, n_orders,
           floor(CAST(c AS DOUBLE) / 100 * 1e2 + 0.5) / 1e2 AS amount,
           floor(CAST(c AS DOUBLE) * 1e6
                 / (SELECT sum(c) FROM agg) + 0.5) / 1e6 AS share
    FROM agg ORDER BY bucket, priority
    """,
)
def q_aging_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    allo = load(spark, sf_dir, "orders")
    o = allo.where(F.col("o_orderstatus") == "O")
    # ledger close = max order date over the WHOLE book, not just the
    # open slice (the oracle's closing CTE does the same).
    asof = allo.agg(F.max(F.to_date("o_orderdate")).alias("d0"))
    aged = o.crossJoin(F.broadcast(asof)).select(
        F.col("o_orderpriority").alias("priority"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
        F.datediff(F.col("d0"), F.to_date("o_orderdate")).alias("age"),
    )
    bucket = (
        F.when(F.col("age") <= 30, "0-030")
        .when(F.col("age") <= 60, "031-060")
        .when(F.col("age") <= 90, "061-090")
        .otherwise("090+")
    )
    agg = (
        aged.select(bucket.alias("bucket"), "priority", "cents")
        .groupBy("bucket", "priority")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("cents").alias("c"))
    )
    tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return agg.select(
        "bucket",
        "priority",
        "n_orders",
        (F.floor(F.col("c").cast("double") / 100 * 1e2 + F.lit(0.5)) / 1e2).alias(
            "amount"
        ),
        (
            F.floor(
                F.col("c").cast("double") * 1e6 / F.sum("c").over(tot)
                + F.lit(0.5)
            )
            / 1e6
        ).alias("share"),
    ).orderBy("bucket", "priority")


# ---------------------------------------------------------------------------
# q_penny_allocation — exact installment splitting, the canonical
# money-exactness operator (billing engines call it penny allocation):
# each order's total is split into 3 monthly installments of
# cents DIV 3 with the remainder cents assigned to the FIRST
# (remainder) installments, so Σ installments ≡ total to the cent by
# construction. The report aggregates per installment index and emits
# the reconciliation as an UNCONDITIONAL boolean — a rounding bug
# flips the hash-compared value instead of hiding in a filtered-out
# row. All arithmetic on non-negative BIGINT cents (DIV/% portable).
# Map-side explode ×3, one aggregate; linear at any scale.
# ---------------------------------------------------------------------------
@query(
    "q_penny_allocation",
    oracle="""
    WITH o AS (
        SELECT o_orderkey,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders
    ),
    inst AS (
        SELECT o_orderkey, cents, n.n,
               cents // 3 + CASE WHEN n.n <= cents % 3 THEN 1 ELSE 0 END
                   AS icents
        FROM o, (SELECT unnest(range(1, 4)) AS n) n
    ),
    agg AS (
        SELECT n AS installment_no, count(*) AS n_orders,
               sum(icents) AS c
        FROM inst GROUP BY 1
    ),
    recon AS (
        SELECT (SELECT sum(icents) FROM inst) = (SELECT sum(cents) FROM o)
               AS exact_to_the_cent
    )
    SELECT installment_no, n_orders,
           floor(CAST(c AS DOUBLE) / 100 * 1e2 + 0.5) / 1e2
               AS installment_total,
           (SELECT exact_to_the_cent FROM recon) AS exact_to_the_cent
    FROM agg ORDER BY installment_no
    """,
)
def q_penny_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    inst = o.select(
        "o_orderkey",
        "cents",
        F.explode(F.sequence(F.lit(1), F.lit(3))).alias("n"),
    ).select(
        "o_orderkey",
        "cents",
        "n",
        (
            F.expr("cents div 3")
            + F.when(F.col("n") <= F.col("cents") % 3, 1).otherwise(0)
        ).alias("icents"),
    )
    agg = inst.groupBy(F.col("n").alias("installment_no")).agg(
        F.count(F.lit(1)).alias("n_orders"), F.sum("icents").alias("c")
    )
    recon = inst.agg(F.sum("icents").alias("si")).crossJoin(
        o.agg(F.sum("cents").alias("sc"))
    ).select((F.col("si") == F.col("sc")).alias("exact_to_the_cent"))
    return (
        agg.crossJoin(F.broadcast(recon))
        .select(
            "installment_no",
            "n_orders",
            (
                F.floor(F.col("c").cast("double") / 100 * 1e2 + F.lit(0.5))
                / 1e2
            ).alias("installment_total"),
            "exact_to_the_cent",
        )
        .orderBy("installment_no")
    )


# ---------------------------------------------------------------------------
# q_fulfillment_lag_buckets — order-to-ship fulfillment lag
# distribution: per (priority, lag bucket) line counts, shipped value
# and the mean lag (floored rational — exact). The operations report
# behind every SLA dashboard. One broadcast-dim-free equi-join
# (orders→lineitem on orderkey, both fact-sized → shuffle join on the
# key, AQE-splittable) + one aggregate. Lag is a DATE-level integer
# diff, portable across engines.
# ---------------------------------------------------------------------------
@query(
    "q_fulfillment_lag_buckets",
    oracle="""
    WITH j AS (
        SELECT o.o_orderpriority AS priority,
               CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE)
                   AS lag_days,
               CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    b AS (
        SELECT priority,
               CASE WHEN lag_days <= 7 THEN 'a_week'
                    WHEN lag_days <= 30 THEN 'b_month'
                    WHEN lag_days <= 60 THEN 'c_two_months'
                    ELSE 'd_over_60' END AS bucket,
               lag_days, cents
        FROM j
    )
    SELECT priority, bucket, count(*) AS n_lines,
           floor(CAST(sum(cents) AS DOUBLE) / 100 * 1e2 + 0.5) / 1e2
               AS shipped_value,
           floor(CAST(sum(lag_days) AS DOUBLE) * 1e6 / count(*) + 0.5) / 1e6
               AS mean_lag_days
    FROM b GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_fulfillment_lag_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderpriority").alias("priority"), "o_orderdate"
    )
    l = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice"
    )
    j = o.join(l, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "priority",
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias(
            "lag_days"
        ),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    bucket = (
        F.when(F.col("lag_days") <= 7, "a_week")
        .when(F.col("lag_days") <= 30, "b_month")
        .when(F.col("lag_days") <= 60, "c_two_months")
        .otherwise("d_over_60")
    )
    return (
        j.select("priority", bucket.alias("bucket"), "lag_days", "cents")
        .groupBy("priority", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (
                F.floor(
                    F.sum("cents").cast("double") / 100 * 1e2 + F.lit(0.5)
                )
                / 1e2
            ).alias("shipped_value"),
            (
                F.floor(
                    F.sum("lag_days").cast("double") * 1e6
                    / F.count(F.lit(1))
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("mean_lag_days"),
        )
        .orderBy("priority", "bucket")
    )


# ---------------------------------------------------------------------------
# q_customer_churn_flags — churn snapshot at the ledger close: each
# customer classed by recency of their LAST order (active ≤ 90 d,
# at-risk 91-180 d, churned > 180 d), rolled up per market segment
# with counts and segment share. The CRM health report every
# subscription/payments business runs daily; distinct from
# q_retention_cohorts (time-bucketed return RATES) — this is the
# point-in-time book classification. One customer-key aggregate + one
# broadcast dim join; shares exact rationals floored 1e-6.
# ---------------------------------------------------------------------------
@query(
    "q_customer_churn_flags",
    oracle="""
    WITH closing AS (
        SELECT max(CAST(o_orderdate AS DATE)) AS d0 FROM orders
    ),
    last_order AS (
        SELECT o_custkey,
               (SELECT d0 FROM closing) - max(CAST(o_orderdate AS DATE))
                   AS recency
        FROM orders GROUP BY 1
    ),
    classed AS (
        SELECT c.c_mktsegment AS segment,
               CASE WHEN lo.recency <= 90 THEN 'a_active'
                    WHEN lo.recency <= 180 THEN 'b_at_risk'
                    ELSE 'c_churned' END AS status
        FROM last_order lo JOIN customer c ON c.c_custkey = lo.o_custkey
    ),
    agg AS (
        SELECT segment, status, count(*) AS n_customers
        FROM classed GROUP BY 1, 2
    )
    SELECT segment, status, n_customers,
           floor(CAST(n_customers AS DOUBLE) * 1e6
                 / sum(n_customers) OVER (PARTITION BY segment) + 0.5) / 1e6
               AS segment_share
    FROM agg ORDER BY segment, status
    """,
)
def q_customer_churn_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    closing = o.agg(F.max(F.to_date("o_orderdate")).alias("d0"))
    last_order = (
        o.groupBy("o_custkey")
        .agg(F.max(F.to_date("o_orderdate")).alias("last_d"))
        .crossJoin(F.broadcast(closing))
        .select(
            "o_custkey", F.datediff(F.col("d0"), F.col("last_d")).alias("recency")
        )
    )
    status = (
        F.when(F.col("recency") <= 90, "a_active")
        .when(F.col("recency") <= 180, "b_at_risk")
        .otherwise("c_churned")
    )
    classed = last_order.join(
        maybe_broadcast(c), F.col("c_custkey") == F.col("o_custkey")
    ).select(F.col("c_mktsegment").alias("segment"), status.alias("status"))
    agg = classed.groupBy("segment", "status").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    seg = Window.partitionBy("segment")
    return agg.select(
        "segment",
        "status",
        "n_customers",
        (
            F.floor(
                F.col("n_customers").cast("double") * 1e6
                / F.sum("n_customers").over(seg)
                + F.lit(0.5)
            )
            / 1e6
        ).alias("segment_share"),
    ).orderBy("segment", "status")


# ---------------------------------------------------------------------------
# q_weekly_flash_report — the Monday-morning flash: per ISO week,
# order count, revenue, average order value, and week-over-week
# revenue growth. WoW uses a GRID SELF-JOIN on week − 7 days — the
# w22 lesson applied from the start: a lag() over the observed week
# grid silently compares non-adjacent weeks whenever a week has no
# orders. All money on integer cents; growth floored at 1e-6 with
# NULL for a missing prior week. Runs on the week rollup
# (calendar-bounded) — the daily-series family's plan shape.
# ---------------------------------------------------------------------------
@query(
    "q_weekly_flash_report",
    oracle="""
    WITH weekly AS (
        SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week,
               count(*) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1
    )
    SELECT w.week, w.n_orders,
           floor(CAST(w.cents AS DOUBLE) / 100 * 1e2 + 0.5) / 1e2 AS revenue,
           floor(CAST(w.cents AS DOUBLE) / w.n_orders / 100 * 1e2 + 0.5)
               / 1e2 AS avg_order_value,
           CASE WHEN p.cents IS NULL THEN NULL
                ELSE floor(CAST(w.cents - p.cents AS DOUBLE)
                           / p.cents * 1e6 + 0.5) / 1e6
           END AS wow_growth
    FROM weekly w
    LEFT JOIN weekly p ON p.week = w.week - 7
    ORDER BY w.week
    """,
)
def q_weekly_flash_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    weekly = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.to_date(F.date_trunc("week", F.col("o_orderdate"))).alias("week")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            )
            .cast("long")
            .alias("cents"),
        )
    )
    prior = weekly.select(
        F.date_add(F.col("week"), 7).alias("p_week"),
        F.col("cents").alias("p_cents"),
    )
    growth = F.when(F.col("p_cents").isNull(), F.lit(None)).otherwise(
        F.floor(
            (F.col("cents") - F.col("p_cents")).cast("double")
            / F.col("p_cents")
            * 1e6
            + F.lit(0.5)
        )
        / 1e6
    )
    return (
        weekly.join(
            F.broadcast(prior), F.col("week") == F.col("p_week"), "left"
        )
        .select(
            "week",
            "n_orders",
            (
                F.floor(F.col("cents").cast("double") / 100 * 1e2 + F.lit(0.5))
                / 1e2
            ).alias("revenue"),
            (
                F.floor(
                    F.col("cents").cast("double")
                    / F.col("n_orders")
                    / 100
                    * 1e2
                    + F.lit(0.5)
                )
                / 1e2
            ).alias("avg_order_value"),
            growth.alias("wow_growth"),
        )
        .orderBy("week")
    )


# ---------------------------------------------------------------------------
# q_t2_settlement_calendar — T+2 business-day settlement: each shipped
# line settles two BUSINESS days after its ship date (weekends roll
# forward — the standard securities/payments convention). The weekday
# shift is a closed-form CASE on the ISO weekday (Mon-Wed +2, Thu-Sat
# +4, Sun +3), identical integer arithmetic on both engines (Spark
# weekday() = DuckDB isodow − 1, both 0 = Monday). The report rolls
# settled value up per settlement weekday and emits the invariant —
# no settlement ever lands on a weekend — as an UNCONDITIONAL boolean
# the hash compare must agree on. Map-side date math + one aggregate.
# ---------------------------------------------------------------------------
@query(
    "q_t2_settlement_calendar",
    oracle="""
    WITH shifted AS (
        SELECT CAST(l_shipdate AS DATE)
               + CASE WHEN isodow(CAST(l_shipdate AS DATE)) - 1 <= 2 THEN 2
                      WHEN isodow(CAST(l_shipdate AS DATE)) - 1 <= 5 THEN 4
                      ELSE 3 END AS settle_date,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        FROM lineitem
    ),
    agg AS (
        SELECT isodow(settle_date) - 1 AS settle_weekday,
               count(*) AS n_lines, sum(cents) AS c,
               max(CASE WHEN isodow(settle_date) - 1 >= 5
                        THEN 1 ELSE 0 END) AS any_weekend
        FROM shifted GROUP BY 1
    )
    SELECT CAST(settle_weekday AS INT) AS settle_weekday, n_lines,
           floor(CAST(c AS DOUBLE) / 100 * 1e2 + 0.5) / 1e2
               AS settled_value,
           (SELECT max(any_weekend) FROM agg) = 0 AS weekend_free
    FROM agg ORDER BY settle_weekday
    """,
)
def q_t2_settlement_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    wd = F.expr("weekday(to_date(l_shipdate))")
    shift = (
        F.when(wd <= 2, 2).when(wd <= 5, 4).otherwise(3)
    )
    shifted = li.select(
        F.expr("date_add(to_date(l_shipdate), 0)").alias("ship_d"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
        shift.alias("shift"),
    ).select(
        F.expr("date_add(ship_d, shift)").alias("settle_date"), "cents"
    )
    agg = shifted.groupBy(
        F.expr("weekday(settle_date)").cast("int").alias("settle_weekday")
    ).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("cents").alias("c"),
        F.max(
            F.when(F.expr("weekday(settle_date)") >= 5, 1).otherwise(0)
        ).alias("any_weekend"),
    )
    full = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return agg.select(
        "settle_weekday",
        "n_lines",
        (F.floor(F.col("c").cast("double") / 100 * 1e2 + F.lit(0.5)) / 1e2).alias(
            "settled_value"
        ),
        (F.max("any_weekend").over(full) == 0).alias("weekend_free"),
    ).orderBy("settle_weekday")


# ---------------------------------------------------------------------------
# w25_seasonal_naive_error — forecast BACKTEST: the seasonal-naive
# model (next value = same weekday last week) evaluated over the whole
# daily-revenue history, per weekday: MAE and MAPE on integer cents,
# plus coverage (days with a 7-day-ago comparator). The sanity
# baseline every forecasting pipeline must beat — and the evaluation
# harness is the operator, so it ports to any model's predictions.
# Forecast joins the daily grid on day − 7 (the w22 grid-join rule:
# never lag over an observed grid). All error math on exact integer
# cents, ratios floored at 1e-6.
# ---------------------------------------------------------------------------
@query(
    "w25_seasonal_naive_error",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ),
    paired AS (
        SELECT a.day, a.cents, f.cents AS fc
        FROM daily a JOIN daily f ON f.day = a.day - 7
    )
    SELECT isodow(day) - 1 AS weekday,
           count(*) AS n_days,
           floor(CAST(sum(abs(cents - fc)) AS DOUBLE) / count(*)
                 / 100 * 1e2 + 0.5) / 1e2 AS mae,
           floor(sum(CAST(abs(cents - fc) AS DOUBLE) / fc) * 1e6
                 / count(*) + 0.5) / 1e6 AS mape
    FROM paired
    GROUP BY 1 ORDER BY 1
    """,
)
def w25_seasonal_naive_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            )
            .cast("long")
            .alias("cents")
        )
    )
    fc = daily.select(
        F.date_add(F.col("day"), 7).alias("f_day"),
        F.col("cents").alias("fc"),
    )
    paired = daily.join(
        F.broadcast(fc), F.col("day") == F.col("f_day")
    ).select("day", "cents", "fc")
    return (
        paired.groupBy(
            F.expr("weekday(day)").cast("bigint").alias("weekday")
        )
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            (
                F.floor(
                    F.sum(F.abs(F.col("cents") - F.col("fc")))
                    .cast("double")
                    / F.count(F.lit(1))
                    / 100
                    * 1e2
                    + F.lit(0.5)
                )
                / 1e2
            ).alias("mae"),
            (
                F.floor(
                    F.sum(
                        F.abs(F.col("cents") - F.col("fc")).cast("double")
                        / F.col("fc")
                    )
                    * 1e6
                    / F.count(F.lit(1))
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("mape"),
        )
        .orderBy("weekday")
    )


# ---------------------------------------------------------------------------
# q_vat_summary — the tax RETURN report: lines grouped by tax-rate
# band with net, tax and gross amounts on exact integer cents
# (tax cents = floor(net_cents · rate_bp / 10000) per line — the
# statutory per-line rounding, so the report reconciles to the
# invoice line level, not to a recomputed aggregate). Rate band =
# basis points from the l_tax fraction (exact: floor(tax·1e4+0.5)).
# One scan, one aggregate, grand-total row via ROLLUP.
# ---------------------------------------------------------------------------
@query(
    "q_vat_summary",
    oracle="""
    WITH lines AS (
        SELECT CAST(floor(l_tax * 1e4 + 0.5) AS BIGINT) AS rate_bp,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS net_c,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                   * CAST(floor(l_tax * 1e4 + 0.5) AS BIGINT) // 10000
                   AS tax_c
        FROM lineitem
    )
    SELECT coalesce(rate_bp, -1) AS rate_bp,
           count(*) AS n_lines,
           floor(CAST(sum(net_c) AS DOUBLE) / 100 * 1e2 + 0.5) / 1e2
               AS net_amount,
           floor(CAST(sum(tax_c) AS DOUBLE) / 100 * 1e2 + 0.5) / 1e2
               AS tax_amount,
           floor(CAST(sum(net_c + tax_c) AS DOUBLE) / 100 * 1e2 + 0.5) / 1e2
               AS gross_amount
    FROM lines GROUP BY ROLLUP (rate_bp)
    HAVING count(*) >= 1  -- engine semantics: no input, no rows (a4_rollup note)
    ORDER BY rate_bp
    """,
)
def q_vat_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = load(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_tax") * 1e4 + F.lit(0.5)).cast("long").alias(
            "rate_bp"
        ),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("net_c"),
    ).withColumn(
        "tax_c", F.expr("net_c * rate_bp div 10000")
    )
    f2 = lambda c: F.floor(c.cast("double") / 100 * 1e2 + F.lit(0.5)) / 1e2
    return (
        lines.rollup("rate_bp")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            f2(F.sum("net_c")).alias("net_amount"),
            f2(F.sum("tax_c")).alias("tax_amount"),
            f2(F.sum(F.col("net_c") + F.col("tax_c"))).alias("gross_amount"),
        )
        .select(
            F.coalesce(F.col("rate_bp"), F.lit(-1)).alias("rate_bp"),
            "n_lines",
            "net_amount",
            "tax_amount",
            "gross_amount",
        )
        .orderBy("rate_bp")
    )


# ---------------------------------------------------------------------------
# q_intercompany_elimination — consolidation eliminations: group
# revenue per customer nation, minus the INTERCOMPANY portion (lines
# whose supplier sits in the same nation as the customer — the
# transactions a consolidated group nets out), leaving external
# revenue. The two-ledger report every multi-entity close runs. Star
# join (lineitem→orders→customer broadcast, supplier broadcast);
# the elimination predicate is a nationkey equality, exact cents.
# ---------------------------------------------------------------------------
@query(
    "q_intercompany_elimination",
    oracle="""
    WITH j AS (
        SELECT c.c_nationkey AS nation,
               CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
               CASE WHEN s.s_nationkey = c.c_nationkey THEN 1 ELSE 0 END
                   AS ic
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
    )
    SELECT CAST(nation AS INT) AS nation,
           floor(CAST(sum(cents) AS DOUBLE) / 100 * 1e2 + 0.5) / 1e2
               AS gross_revenue,
           floor(CAST(sum(CASE WHEN ic = 1 THEN cents ELSE 0 END) AS DOUBLE)
                 / 100 * 1e2 + 0.5) / 1e2 AS eliminated,
           floor(CAST(sum(CASE WHEN ic = 0 THEN cents ELSE 0 END) AS DOUBLE)
                 / 100 * 1e2 + 0.5) / 1e2 AS external_revenue,
           CAST(sum(ic) AS BIGINT) AS n_ic_lines
    FROM j GROUP BY 1 ORDER BY 1
    """,
)
def q_intercompany_elimination(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    j = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(maybe_broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            F.col("c_nationkey").cast("int").alias("nation"),
            "cents",
            F.when(
                F.col("s_nationkey") == F.col("c_nationkey"), 1
            ).otherwise(0).alias("ic"),
        )
    )
    f2 = lambda c_: F.floor(c_.cast("double") / 100 * 1e2 + F.lit(0.5)) / 1e2
    return (
        j.groupBy("nation")
        .agg(
            f2(F.sum("cents")).alias("gross_revenue"),
            f2(F.sum(F.when(F.col("ic") == 1, F.col("cents")).otherwise(0))).alias(
                "eliminated"
            ),
            f2(F.sum(F.when(F.col("ic") == 0, F.col("cents")).otherwise(0))).alias(
                "external_revenue"
            ),
            F.sum("ic").cast("long").alias("n_ic_lines"),
        )
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# q_fifo_inventory — FIFO cost-layer valuation, the hardest classic in
# exact accounting, restated relationally: per part, receipts (odd
# line numbers — the fixture's movement direction) build cumulative
# quantity layers [rs, re); issues (even lines) consume cumulative
# ranges [is, ie); the quantity an issue takes from a layer is the
# INTERVAL OVERLAP of the two cumulative ranges — so FIFO matching,
# usually an imperative loop, becomes one per-part band join on
# cumulative sums. Layer cost allocates by integer floor-division
# (cost·overlap div qty, non-negative — portable), and the remaining
# value is cost − Σconsumed per layer, so value CONSERVES to the cent
# by construction — emitted as the unconditional `conserves` boolean.
# Rolled up per brand. Scale: windows and the band join both key on
# l_partkey (one hash shuffle); per-part fanout is movement-count
# bounded, never cross-part.
# ---------------------------------------------------------------------------
@query(
    "q_fifo_inventory",
    oracle="""
    WITH mv AS (
        SELECT l_partkey AS pk, l_orderkey AS ok, l_linenumber AS ln,
               l_shipdate AS sd,
               CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cost_c,
               l_linenumber % 2 = 1 AS is_receipt
        FROM lineitem
    ),
    receipts AS (
        SELECT pk, qty, cost_c,
               coalesce(sum(qty) OVER (PARTITION BY pk
                   ORDER BY sd, ok, ln
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS rs
        FROM mv WHERE is_receipt
    ),
    issues AS (
        SELECT pk, qty,
               coalesce(sum(qty) OVER (PARTITION BY pk
                   ORDER BY sd, ok, ln
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS istart
        FROM mv WHERE NOT is_receipt
    ),
    matched AS (
        SELECT r.pk, r.rs, r.qty AS rqty, r.cost_c,
               greatest(0, least(r.rs + r.qty, i.istart + i.qty)
                           - greatest(r.rs, i.istart)) AS o
        FROM receipts r JOIN issues i
          ON r.pk = i.pk
         AND r.rs < i.istart + i.qty AND i.istart < r.rs + r.qty
    ),
    layer AS (
        SELECT pk, rs, max(rqty) AS rqty, max(cost_c) AS cost_c,
               CAST(sum(o) AS BIGINT) AS consumed,
               CAST(sum(cost_c * o // rqty) AS BIGINT) AS cogs_c
        FROM matched GROUP BY pk, rs
    ),
    all_layers AS (
        SELECT r.pk, r.qty AS rqty, r.cost_c,
               coalesce(l.consumed, 0) AS consumed,
               coalesce(l.cogs_c, 0) AS cogs_c
        FROM receipts r
        LEFT JOIN layer l ON l.pk = r.pk AND l.rs = r.rs
    ),
    per_part AS (
        SELECT pk,
               CAST(sum(consumed) AS BIGINT) AS issued_qty,
               CAST(sum(cogs_c) AS BIGINT) AS cogs_c,
               CAST(sum(rqty - consumed) AS BIGINT) AS remaining_qty,
               CAST(sum(cost_c - cogs_c) AS BIGINT) AS remaining_c,
               CAST(sum(cost_c) AS BIGINT) AS received_c
        FROM all_layers GROUP BY 1
    )
    SELECT p.p_brand AS brand,
           count(*) AS n_parts,
           CAST(sum(pp.issued_qty) AS BIGINT) AS issued_qty,
           floor(CAST(sum(pp.cogs_c) AS DOUBLE) / 100 * 1e2 + 0.5) / 1e2
               AS cogs,
           CAST(sum(pp.remaining_qty) AS BIGINT) AS remaining_qty,
           floor(CAST(sum(pp.remaining_c) AS DOUBLE) / 100 * 1e2 + 0.5) / 1e2
               AS remaining_value,
           (SELECT sum(cogs_c + remaining_c) = sum(received_c)
            FROM per_part) AS conserves
    FROM per_part pp JOIN part p ON p.p_partkey = pp.pk
    GROUP BY 1 ORDER BY 1
    """,
)
def q_fifo_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    mv = load(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("pk"),
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
        F.col("l_shipdate").alias("sd"),
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("qty"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cost_c"),
        (F.col("l_linenumber") % 2 == 1).alias("is_receipt"),
    )
    wcum = (
        Window.partitionBy("pk")
        .orderBy("sd", "ok", "ln")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    receipts = (
        mv.where(F.col("is_receipt"))
        .select(
            "pk",
            "qty",
            "cost_c",
            F.coalesce(F.sum("qty").over(wcum), F.lit(0)).alias("rs"),
        )
    )
    issues = (
        mv.where(~F.col("is_receipt"))
        .select(
            "pk",
            F.col("qty").alias("iqty"),
            F.coalesce(F.sum("qty").over(wcum), F.lit(0)).alias("istart"),
        )
    )
    o = F.greatest(
        F.lit(0),
        F.least(F.col("rs") + F.col("qty"), F.col("istart") + F.col("iqty"))
        - F.greatest(F.col("rs"), F.col("istart")),
    )
    matched = (
        receipts.join(
            issues,
            (receipts.pk == issues.pk)
            & (F.col("rs") < F.col("istart") + F.col("iqty"))
            & (F.col("istart") < F.col("rs") + F.col("qty")),
        )
        .select(receipts.pk.alias("pk"), "rs", "qty", "cost_c", o.alias("o"))
    )
    layer = matched.groupBy("pk", "rs").agg(
        F.max("qty").alias("rqty"),
        F.max("cost_c").alias("lcost"),
        F.sum("o").cast("long").alias("consumed"),
        F.sum(F.expr("cost_c * o div qty")).cast("long").alias("cogs_c"),
    )
    all_layers = receipts.join(
        layer.select("pk", "rs", "consumed", "cogs_c"), ["pk", "rs"], "left"
    ).select(
        "pk",
        "qty",
        "cost_c",
        F.coalesce("consumed", F.lit(0)).alias("consumed"),
        F.coalesce("cogs_c", F.lit(0)).alias("cogs_c"),
    )
    per_part = all_layers.groupBy("pk").agg(
        F.sum("consumed").cast("long").alias("issued_qty"),
        F.sum("cogs_c").cast("long").alias("cogs_c"),
        F.sum(F.col("qty") - F.col("consumed")).cast("long").alias(
            "remaining_qty"
        ),
        F.sum(F.col("cost_c") - F.col("cogs_c")).cast("long").alias(
            "remaining_c"
        ),
        F.sum("cost_c").cast("long").alias("received_c"),
    )
    conserves = per_part.agg(
        (
            F.sum(F.col("cogs_c") + F.col("remaining_c"))
            == F.sum("received_c")
        ).alias("conserves")
    )
    p = load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pk"), F.col("p_brand").alias("brand")
    )
    f2 = lambda c: F.floor(c.cast("double") / 100 * 1e2 + F.lit(0.5)) / 1e2
    return (
        per_part.join(maybe_broadcast(p), "pk")
        .groupBy("brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("issued_qty").cast("long").alias("issued_qty"),
            f2(F.sum("cogs_c")).alias("cogs"),
            F.sum("remaining_qty").cast("long").alias("remaining_qty"),
            f2(F.sum("remaining_c")).alias("remaining_value"),
        )
        .crossJoin(F.broadcast(conserves))
        .select(
            "brand",
            "n_parts",
            "issued_qty",
            "cogs",
            "remaining_qty",
            "remaining_value",
            "conserves",
        )
        .orderBy("brand")
    )


# ---------------------------------------------------------------------------
# q_sales_mix_variance — the FP&A price/volume bridge per brand between
# 1995 and 1996: ΔR = (P₂-P₁)·Q₂ (price effect) + (Q₂-Q₁)·P₁ (volume
# effect), an exact identity the output certifies per row. Quantities
# and revenues accumulate as DECIMAL (exact); average prices and the
# bridge terms are per-row doubles. One lineitem∙part join + one hash
# aggregate at scale, with the year filter pushed to the scan.
# ---------------------------------------------------------------------------
@query(
    "q_sales_mix_variance",
    oracle="""
    WITH y AS (
        SELECT p.p_brand AS brand, year(l.l_shipdate) AS yr,
               sum(CAST(l.l_quantity AS DECIMAL(27,2))) AS q,
               sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                        AS DECIMAL(27,4))) AS r
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE year(l.l_shipdate) IN (1995, 1996)
        GROUP BY 1, 2
    ),
    w AS (
        SELECT brand,
               max(CASE WHEN yr = 1995 THEN CAST(q AS DOUBLE) END) AS q1,
               max(CASE WHEN yr = 1995 THEN CAST(r AS DOUBLE) END) AS r1,
               max(CASE WHEN yr = 1996 THEN CAST(q AS DOUBLE) END) AS q2,
               max(CASE WHEN yr = 1996 THEN CAST(r AS DOUBLE) END) AS r2
        FROM y GROUP BY 1
    ),
    calc AS (
        SELECT brand, q1, r1, q2, r2,
               (r2 / q2 - r1 / q1) * q2 AS price_var,
               (q2 - q1) * (r1 / q1) AS volume_var
        FROM w
        WHERE q1 IS NOT NULL AND q2 IS NOT NULL AND q1 > 0 AND q2 > 0
    )
    SELECT brand,
           floor(q1 * 1e2 + 0.5) / 1e2 AS qty_1995,
           floor(q2 * 1e2 + 0.5) / 1e2 AS qty_1996,
           floor(r1 * 1e2 + 0.5) / 1e2 AS rev_1995,
           floor(r2 * 1e2 + 0.5) / 1e2 AS rev_1996,
           floor(price_var * 1e2 + 0.5) / 1e2 AS price_variance,
           floor(volume_var * 1e2 + 0.5) / 1e2 AS volume_variance,
           CASE WHEN abs((r2 - r1) - (price_var + volume_var)) < 0.01
                THEN 1 ELSE 0 END AS bridge_reconciles
    FROM calc ORDER BY brand
    """,
)
def q_sales_mix_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    y = (
        li.where(F.year("l_shipdate").isin(1995, 1996))
        .join(maybe_broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.year("l_shipdate").alias("yr"),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(27,2)")).alias("q"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(27,4)"
                )
            ).alias("r"),
        )
    )

    def pick(yr, col):
        return F.max(
            F.when(F.col("yr") == yr, F.col(col).cast("double"))
        )

    w = y.groupBy("brand").agg(
        pick(1995, "q").alias("q1"),
        pick(1995, "r").alias("r1"),
        pick(1996, "q").alias("q2"),
        pick(1996, "r").alias("r2"),
    )
    price_var = (F.col("r2") / F.col("q2") - F.col("r1") / F.col("q1")) * F.col(
        "q2"
    )
    volume_var = (F.col("q2") - F.col("q1")) * (F.col("r1") / F.col("q1"))
    f2 = lambda c: F.floor(c * 1e2 + F.lit(0.5)) / 1e2  # noqa: E731
    return (
        w.where(
            F.col("q1").isNotNull()
            & F.col("q2").isNotNull()
            & (F.col("q1") > 0)
            & (F.col("q2") > 0)
        )
        .select(
            "brand",
            f2(F.col("q1")).alias("qty_1995"),
            f2(F.col("q2")).alias("qty_1996"),
            f2(F.col("r1")).alias("rev_1995"),
            f2(F.col("r2")).alias("rev_1996"),
            f2(price_var).alias("price_variance"),
            f2(volume_var).alias("volume_variance"),
            F.when(
                F.abs(
                    (F.col("r2") - F.col("r1")) - (price_var + volume_var)
                )
                < 0.01,
                1,
            )
            .otherwise(0)
            .alias("bridge_reconciles"),
        )
        .orderBy("brand")
    )


# ---------------------------------------------------------------------------
# q_landed_cost_allocation — penny-exact largest-remainder allocation:
# a synthetic 2% freight charge per order is spread over its line items
# proportionally to extended price, in integer CENTS. Base shares floor;
# the remainder cents go to the largest fractional shares (tie-broken by
# line number), so every order conserves exactly — the allocation
# pattern behind every invoice-proration and cost-distribution job.
# Integer arithmetic end-to-end → exact oracle. One window over
# (orderkey) at scale; no shuffle beyond the per-order repartition.
# ---------------------------------------------------------------------------
@query(
    "q_landed_cost_allocation",
    oracle="""
    WITH o AS (
        SELECT o_orderkey, o_orderpriority,
               CAST(floor(o_totalprice * 0.02 * 100 + 0.5) AS BIGINT)
                   AS freight_cents
        FROM orders
    ),
    l AS (
        SELECT l_orderkey, l_linenumber,
               CAST(l_extendedprice AS DECIMAL(27,2)) AS ep
        FROM lineitem
    ),
    tot AS (
        SELECT l_orderkey, sum(ep) AS s FROM l GROUP BY 1
    ),
    shares AS (
        SELECT l.l_orderkey, l.l_linenumber, o.o_orderpriority,
               o.freight_cents,
               CAST(l.ep AS DOUBLE) * o.freight_cents / CAST(t.s AS DOUBLE)
                   AS raw
        FROM l
        JOIN tot t ON l.l_orderkey = t.l_orderkey
        JOIN o ON l.l_orderkey = o.o_orderkey
    ),
    based AS (
        SELECT *, CAST(floor(raw) AS BIGINT) AS base, raw - floor(raw) AS frac,
               row_number() OVER (PARTITION BY l_orderkey
                                  ORDER BY raw - floor(raw) DESC,
                                           l_linenumber) AS rk,
               sum(CAST(floor(raw) AS BIGINT)) OVER (PARTITION BY l_orderkey)
                   AS base_sum
        FROM shares
    ),
    alloc AS (
        SELECT l_orderkey, o_orderpriority, freight_cents,
               base + CASE WHEN rk <= freight_cents - base_sum
                           THEN 1 ELSE 0 END AS cents
        FROM based
    ),
    per_order AS (
        SELECT l_orderkey, o_orderpriority, freight_cents,
               sum(cents) AS allocated, count(*) AS n_lines
        FROM alloc GROUP BY 1, 2, 3
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(n_lines) AS BIGINT) AS n_lines,
           CAST(sum(allocated) AS BIGINT) AS allocated_cents,
           CAST(sum(CASE WHEN allocated <> freight_cents THEN 1 ELSE 0 END)
                AS BIGINT) AS conservation_violations
    FROM per_order GROUP BY 1 ORDER BY 1
    """,
)
def q_landed_cost_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 0.02 * 100 + F.lit(0.5))
        .cast("long")
        .alias("freight_cents"),
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").cast("decimal(27,2)").alias("ep"),
    )
    tot = li.groupBy("l_orderkey").agg(F.sum("ep").alias("s"))
    shares = (
        li.join(tot, "l_orderkey")
        .join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_linenumber",
            "o_orderpriority",
            "freight_cents",
            (
                F.col("ep").cast("double")
                * F.col("freight_cents")
                / F.col("s").cast("double")
            ).alias("raw"),
        )
    )
    wk = Window.partitionBy("l_orderkey")
    based = shares.select(
        "*",
        F.floor("raw").cast("long").alias("base"),
        (F.col("raw") - F.floor("raw")).alias("frac"),
    ).select(
        "*",
        F.row_number()
        .over(wk.orderBy(F.col("frac").desc(), "l_linenumber"))
        .alias("rk"),
        F.sum("base").over(wk).alias("base_sum"),
    )
    alloc = based.select(
        "l_orderkey",
        "o_orderpriority",
        "freight_cents",
        (
            F.col("base")
            + F.when(
                F.col("rk") <= F.col("freight_cents") - F.col("base_sum"), 1
            ).otherwise(0)
        ).alias("cents"),
    )
    per_order = alloc.groupBy(
        "l_orderkey", "o_orderpriority", "freight_cents"
    ).agg(
        F.sum("cents").alias("allocated"), F.count(F.lit(1)).alias("n_lines")
    )
    return (
        per_order.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("n_lines").cast("long").alias("n_lines"),
            F.sum("allocated").cast("long").alias("allocated_cents"),
            F.sum(
                F.when(F.col("allocated") != F.col("freight_cents"), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("conservation_violations"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q_kaplan_meier_reorder — Kaplan-Meier survival of "days until the
# customer's next order", right-censored at the corpus end date: the
# correct churn/retention estimator when observation windows are
# incomplete (naive retention rates understate the tail). Risk sets and
# event counts are exact integers from one sorted pass over distinct
# gap lengths; the product Π(1-d/n) is taken as exp of a DECIMAL-cast
# prefix sum of per-row logs (order-independent). Survival is reported
# at the standard 7/14/30/60/90-day horizons. At 100 TB: one window
# over (customer, date) + one aggregate over distinct durations —
# thousands of rows regardless of corpus size.
# ---------------------------------------------------------------------------
@query(
    "q_kaplan_meier_reorder",
    oracle="""
    WITH mx AS (SELECT max(o_orderdate) AS m FROM orders),
    seq AS (
        SELECT o_custkey, o_orderdate,
               lead(o_orderdate) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey)
                   AS nxt
        FROM orders
    ),
    dur AS (
        SELECT CASE WHEN nxt IS NULL
                    THEN date_diff('day', o_orderdate, (SELECT m FROM mx))
                    ELSE date_diff('day', o_orderdate, nxt) END AS d,
               CASE WHEN nxt IS NULL THEN 0 ELSE 1 END AS ev
        FROM seq
    ),
    byd AS (
        SELECT d, count(*) AS c, sum(ev) AS de FROM dur GROUP BY 1
    ),
    risk AS (
        SELECT d, de,
               (SELECT count(*) FROM dur) -
               (sum(c) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) - c) AS n_risk
        FROM byd
    ),
    km AS (
        SELECT d,
               sum(CAST(ln(1 - CAST(de AS DOUBLE) / n_risk)
                        AS DECIMAL(27,9))) OVER
                   (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW) AS lsum
        FROM risk WHERE de > 0 AND de < n_risk
    ),
    hz AS (SELECT unnest([7, 14, 30, 60, 90]) AS h),
    pick AS (
        SELECT hz.h, max(km.d) AS td
        FROM hz LEFT JOIN km ON km.d <= hz.h
        GROUP BY 1
    )
    SELECT p.h AS horizon_days,
           CASE WHEN p.td IS NULL THEN 1.0
                ELSE floor(exp(CAST(k.lsum AS DOUBLE)) * 1e6 + 0.5) / 1e6
           END AS survival
    FROM pick p LEFT JOIN km k ON k.d = p.td
    ORDER BY 1
    """,
)
def q_kaplan_meier_reorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderdate").alias("m"))
    seq = o.select(
        "o_custkey",
        "o_orderdate",
        F.lead("o_orderdate")
        .over(
            Window.partitionBy("o_custkey").orderBy(
                "o_orderdate", "o_orderkey"
            )
        )
        .alias("nxt"),
    )
    dur = seq.crossJoin(F.broadcast(mx)).select(
        F.when(
            F.col("nxt").isNull(),
            F.datediff(F.col("m"), F.col("o_orderdate")),
        )
        .otherwise(F.datediff(F.col("nxt"), F.col("o_orderdate")))
        .alias("d"),
        F.when(F.col("nxt").isNull(), 0).otherwise(1).alias("ev"),
    )
    byd = dur.groupBy("d").agg(
        F.count(F.lit(1)).alias("c"), F.sum("ev").alias("de")
    )
    total = dur.agg(F.count(F.lit(1)).alias("n_total"))
    wp = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    risk = (
        byd.crossJoin(F.broadcast(total))
        .select(
            "d",
            "de",
            (
                F.col("n_total")
                - (F.sum("c").over(wp) - F.col("c"))
            ).alias("n_risk"),
        )
    )
    km = (
        risk.where((F.col("de") > 0) & (F.col("de") < F.col("n_risk")))
        .select(
            "d",
            F.log(1 - F.col("de").cast("double") / F.col("n_risk")).cast(
                "decimal(27,9)"
            ).alias("lt"),
        )
        .select("d", F.sum("lt").over(wp).alias("lsum"))
    )
    hz = spark.range(1).select(
        F.explode(F.array(*[F.lit(h) for h in (7, 14, 30, 60, 90)])).alias(
            "h"
        )
    )
    pick = (
        hz.join(km, km.d <= hz.h, "left")
        .groupBy("h")
        .agg(F.max("d").alias("td"))
    )
    return (
        pick.join(km, pick.td == km.d, "left")
        .select(
            F.col("h").alias("horizon_days"),
            F.when(F.col("td").isNull(), F.lit(1.0))
            .otherwise(
                F.floor(F.exp(F.col("lsum").cast("double")) * 1e6 + F.lit(0.5))
                / 1e6
            )
            .alias("survival"),
        )
        .orderBy("horizon_days")
    )


# ---------------------------------------------------------------------------
# q_eom_billing_cycle — monthly billing anniversaries with end-of-month
# clamping: a customer's billing day is the day-of-month of their first
# order; the next 12 bill dates are add_months(first, k), which clamps
# Jan 31 → Feb 28 etc. The operator audits, per calendar month, how
# many bills fall due and how many were CLAMPED — the date-semantics
# contract (Spark add_months ≡ engine-standard month addition with EOM
# clamp) that every billing/subscription pipeline silently depends on.
# Pure date arithmetic + a bounded 12-way explode; exact oracle.
# ---------------------------------------------------------------------------
@query(
    "q_eom_billing_cycle",
    oracle="""
    WITH first_o AS (
        SELECT o_custkey, CAST(min(o_orderdate) AS DATE) AS fd
        FROM orders GROUP BY 1
    ),
    bills AS (
        SELECT f.o_custkey, f.fd, k.k,
               CAST(f.fd + to_months(CAST(k.k AS INTEGER)) AS DATE) AS bill
        FROM first_o f, (SELECT unnest(range(12)) AS k) k
    )
    SELECT strftime(bill, '%Y-%m') AS bill_month,
           CAST(count(*) AS BIGINT) AS n_bills,
           CAST(sum(CASE WHEN day(bill) < day(fd) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clamped
    FROM bills
    GROUP BY 1 ORDER BY 1
    """,
)
def q_eom_billing_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    first_o = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.min(F.col("o_orderdate").cast("date")).alias("fd"))
    )
    bills = first_o.select(
        "o_custkey",
        "fd",
        F.explode(F.sequence(F.lit(0), F.lit(11))).alias("k"),
    ).select(
        "o_custkey",
        "fd",
        F.add_months(F.col("fd"), F.col("k")).alias("bill"),
    )
    return (
        bills.groupBy(F.date_format("bill", "yyyy-MM").alias("bill_month"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bills"),
            F.sum(
                F.when(
                    F.dayofmonth("bill") < F.dayofmonth("fd"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_clamped"),
        )
        .orderBy("bill_month")
    )


# ---------------------------------------------------------------------------
# q_open_order_float — weekly in-flight ("float") exposure: an order's
# value is outstanding from its order date until its last line ships,
# CAPPED at an 8-week SLA horizon (open longer than the cap counts as
# open through the cap — the cap is what makes the per-order explode
# bounded by POLICY, not by data, so the plan survives any corpus).
# Reports, per week, the total value and count of open orders. The
# interval-to-grain expansion is a ≤9-way explode then a plain hash
# aggregate: the scalable restatement of an interval join against a
# calendar spine. DECIMAL value sums → exact oracle.
# ---------------------------------------------------------------------------
@query(
    "q_open_order_float",
    oracle="""
    WITH span AS (
        SELECT o.o_orderkey, o.o_totalprice,
               date_trunc('week', o.o_orderdate) AS w0,
               -- floor: data has occasional ship < order; cap: 8-week SLA
               greatest(least(date_trunc('week', max(l.l_shipdate)),
                              date_trunc('week', o.o_orderdate)
                                  + to_days(56)),
                        date_trunc('week', o.o_orderdate)) AS w1
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2, 3
    ),
    wk AS (
        SELECT o_orderkey, o_totalprice,
               CAST(w0 + to_days(7 * CAST(k.k AS INTEGER)) AS DATE) AS week
        FROM span, (SELECT unnest(range(60)) AS k) k
        WHERE w0 + to_days(7 * CAST(k.k AS INTEGER)) <= w1
    )
    SELECT strftime(week, '%Y-%m-%d') AS week_start,
           CAST(count(*) AS BIGINT) AS n_open_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE)
               AS open_value
    FROM wk GROUP BY 1 ORDER BY 1
    """,
)
def q_open_order_float(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    span = (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy(
            "o_orderkey",
            "o_totalprice",
            F.date_trunc("week", "o_orderdate").alias("w0"),
        )
        .agg(
            # floor: data has occasional ship < order; cap: 8-week SLA
            F.greatest(
                F.least(
                    F.date_trunc("week", F.max("l_shipdate")),
                    F.col("w0") + F.expr("INTERVAL 56 DAYS"),
                ),
                F.col("w0"),
            ).alias("w1")
        )
    )
    wk = span.select(
        "o_orderkey",
        "o_totalprice",
        F.explode(
            F.sequence(
                F.col("w0").cast("date"),
                F.col("w1").cast("date"),
                F.expr("INTERVAL 7 DAYS"),
            )
        ).alias("week"),
    )
    return (
        wk.groupBy(F.date_format("week", "yyyy-MM-dd").alias("week_start"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_open_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(27,2)"))
            .cast("double")
            .alias("open_value"),
        )
        .orderBy("week_start")
    )


# ---------------------------------------------------------------------------
# q_revenue_recognition_daily — ratable (straight-line) revenue
# recognition: each order's total is recognized evenly across its
# service period (order date → last line-item ship date, capped at
# _REC_CAP_DAYS so the per-order explode is hard-bounded no matter how
# late a straggler ship date is — the residual recognizes in the final
# capped day's month). Cent amounts are integers end-to-end and the
# daily split uses the largest-remainder rule (cents // n with the
# first cents % n days getting the extra cent), so monthly recognized
# totals tie out to billed totals EXACTLY — the deferred-revenue
# balance is an integer running sum, never a float residue. Plan: one
# orderkey aggregate (max ship date), a bounded sequence explode
# (≤ _REC_CAP_DAYS rows per order), two monthly hash aggregates, and a
# full outer month join; the final cumulative window runs over the
# ~85-row monthly report only. Restates the reference's daily-batch
# revenue reporting (REPORT dataflow R12-R14 family) as an accrual view.
# ---------------------------------------------------------------------------
_REC_CAP_DAYS = 92


@query(
    "q_revenue_recognition_daily",
    oracle=f"""
    WITH ord AS (
        SELECT o.o_orderkey,
               CAST(o.o_orderdate AS DATE) AS d0,
               CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
               greatest(1, least(
                   coalesce(max(CAST(l.l_shipdate AS DATE)),
                            CAST(o.o_orderdate AS DATE))
                       - CAST(o.o_orderdate AS DATE) + 1,
                   {_REC_CAP_DAYS})) AS nd
        FROM orders o
        LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2, 3
    ),
    days AS (SELECT unnest(generate_series(0, {_REC_CAP_DAYS - 1})) AS i),
    sched AS (
        SELECT ord.d0 + CAST(d.i AS INTEGER) AS day,
               ord.cents // ord.nd
                   + CASE WHEN d.i < ord.cents % ord.nd THEN 1 ELSE 0 END
                   AS rec_cents
        FROM ord CROSS JOIN days d
        WHERE d.i < ord.nd
    ),
    monthly AS (
        SELECT strftime(day, '%Y-%m') AS month,
               CAST(sum(rec_cents) AS BIGINT) AS recognized_cents
        FROM sched GROUP BY 1
    ),
    billed AS (
        SELECT strftime(d0, '%Y-%m') AS month,
               CAST(sum(cents) AS BIGINT) AS billed_cents
        FROM ord GROUP BY 1
    )
    SELECT coalesce(m.month, b.month) AS month,
           coalesce(b.billed_cents, 0) AS billed_cents,
           coalesce(m.recognized_cents, 0) AS recognized_cents,
           CAST(sum(coalesce(b.billed_cents, 0)
                    - coalesce(m.recognized_cents, 0))
                OVER (ORDER BY coalesce(m.month, b.month)
                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS deferred_balance_cents
    FROM monthly m FULL JOIN billed b ON m.month = b.month
    ORDER BY 1
    """,
)
def q_revenue_recognition_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    base = o.join(li, o.o_orderkey == li.l_orderkey, "left").select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("d0"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
        F.col("l_shipdate").cast("date").alias("sd"),
    )
    ord_ = (
        base.groupBy("o_orderkey", "d0", "cents")
        .agg(F.max("sd").alias("msd"))
        .select(
            "d0",
            "cents",
            F.greatest(
                F.lit(1),
                F.least(
                    F.datediff(
                        F.coalesce(F.col("msd"), F.col("d0")), F.col("d0")
                    )
                    + 1,
                    F.lit(_REC_CAP_DAYS),
                ),
            ).alias("nd"),
        )
    )
    sched = ord_.select(
        "d0",
        "cents",
        "nd",
        F.explode(F.sequence(F.lit(0), F.col("nd") - 1)).alias("i"),
    ).select(
        F.date_add(F.col("d0"), F.col("i")).alias("day"),
        (
            F.expr("cents div nd")
            + F.when(F.col("i") < F.col("cents") % F.col("nd"), 1).otherwise(0)
        ).alias("rec_cents"),
    )
    monthly = sched.groupBy(
        F.date_format("day", "yyyy-MM").alias("month")
    ).agg(F.sum("rec_cents").cast("long").alias("recognized_cents"))
    billed = ord_.groupBy(
        F.date_format("d0", "yyyy-MM").alias("month")
    ).agg(F.sum("cents").cast("long").alias("billed_cents"))
    joined = monthly.alias("m").join(
        billed.alias("b"), F.col("m.month") == F.col("b.month"), "full"
    ).select(
        F.coalesce(F.col("m.month"), F.col("b.month")).alias("month"),
        F.coalesce(F.col("billed_cents"), F.lit(0)).alias("billed_cents"),
        F.coalesce(F.col("recognized_cents"), F.lit(0)).alias(
            "recognized_cents"
        ),
    )
    wcum = (
        Window.orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "month",
        "billed_cents",
        "recognized_cents",
        F.sum(F.col("billed_cents") - F.col("recognized_cents"))
        .over(wcum)
        .cast("long")
        .alias("deferred_balance_cents"),
    ).orderBy("month")


# ---------------------------------------------------------------------------
# q_reorder_point_policy — inventory reorder-point / safety-stock
# policy for the top-20 parts by shipped demand: per part, daily-demand
# mean and sample standard deviation over its active ship days, then
# ROP = μ·LT + z·σ·√LT with LT = 7 days and z = 1.65 (~95% service
# level). Exactness: daily demand is an exact DECIMAL sum of
# quantities; Σq stays DECIMAL, each q² is a deterministic double
# product cast to DECIMAL(38,6) at the sum (the a38 idiom); the
# variance/sqrt arithmetic is one fixed-shape double expression floored
# at 1e-6. Plan: two hash aggregates (partkey×day, then partkey) and a
# top-k — Spark side uses orderBy+limit (TakeOrderedAndProject, no
# global sort materialization); parts with < 8 active days are excluded
# so the sample σ is defined.
# ---------------------------------------------------------------------------
_ROP_LT_DAYS = 7.0
_ROP_Z = 1.65
_ROP_TOP = 20
_ROP_MIN_DAYS = 8


@query(
    "q_reorder_point_policy",
    oracle=f"""
    WITH demand AS (
        SELECT l_partkey AS partkey, CAST(l_shipdate AS DATE) AS day,
               CAST(CAST(sum(CAST(l_quantity AS DECIMAL(27,2)))
                    AS DECIMAL(27,2)) AS DOUBLE) AS q
        FROM lineitem GROUP BY 1, 2
    ),
    stats AS (
        SELECT partkey,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(CAST(q AS DECIMAL(27,2))) AS DOUBLE) AS sq,
               CAST(sum(CAST(q * q AS DECIMAL(38,6))) AS DOUBLE) AS sqq
        FROM demand GROUP BY 1
        HAVING count(*) >= {_ROP_MIN_DAYS}
    ),
    top AS (
        SELECT *, row_number() OVER (ORDER BY sq DESC, partkey) AS rk
        FROM stats QUALIFY rk <= {_ROP_TOP}
    )
    SELECT partkey, n_days,
           floor(sq / n_days * 1e6 + 0.5) / 1e6 AS mean_daily,
           floor(sqrt((n_days * sqq - sq * sq) / n_days / (n_days - 1))
                 * 1e6 + 0.5) / 1e6 AS sd_daily,
           floor({_ROP_Z} * sqrt((n_days * sqq - sq * sq)
                                 / n_days / (n_days - 1))
                 * sqrt({_ROP_LT_DAYS}) * 1e6 + 0.5) / 1e6 AS safety_stock,
           floor((sq / n_days * {_ROP_LT_DAYS}
                  + {_ROP_Z} * sqrt((n_days * sqq - sq * sq)
                                    / n_days / (n_days - 1))
                    * sqrt({_ROP_LT_DAYS})) * 1e6 + 0.5) / 1e6
               AS reorder_point
    FROM top ORDER BY partkey
    """,
)
def q_reorder_point_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    demand = (
        li.groupBy(
            F.col("l_partkey").alias("partkey"),
            F.col("l_shipdate").cast("date").alias("day"),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(27,2)"))
            .cast("decimal(27,2)")
            .cast("double")
            .alias("q")
        )
    )
    stats = (
        demand.groupBy("partkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum(F.col("q").cast("decimal(27,2)")).cast("double").alias(
                "sq"
            ),
            F.sum((F.col("q") * F.col("q")).cast("decimal(38,6)"))
            .cast("double")
            .alias("sqq"),
        )
        .where(F.col("n_days") >= _ROP_MIN_DAYS)
    )
    top = stats.orderBy(F.col("sq").desc(), "partkey").limit(_ROP_TOP)
    n, sq, sqq = F.col("n_days"), F.col("sq"), F.col("sqq")
    var = (n * sqq - sq * sq) / n / (n - 1)
    sd = F.sqrt(var)
    return top.select(
        "partkey",
        "n_days",
        (F.floor(sq / n * 1e6 + F.lit(0.5)) / 1e6).alias("mean_daily"),
        (F.floor(sd * 1e6 + F.lit(0.5)) / 1e6).alias("sd_daily"),
        (
            F.floor(
                F.lit(_ROP_Z) * sd * F.sqrt(F.lit(_ROP_LT_DAYS)) * 1e6
                + F.lit(0.5)
            )
            / 1e6
        ).alias("safety_stock"),
        (
            F.floor(
                (
                    sq / n * F.lit(_ROP_LT_DAYS)
                    + F.lit(_ROP_Z) * sd * F.sqrt(F.lit(_ROP_LT_DAYS))
                )
                * 1e6
                + F.lit(0.5)
            )
            / 1e6
        ).alias("reorder_point"),
    ).orderBy("partkey")


# ---------------------------------------------------------------------------
# q_target_encoding — leave-one-out target encoding with additive
# smoothing (the standard categorical-feature encoder for ML prep;
# leave-one-out so a row never sees its own label, smoothing toward the
# global prior so rare categories shrink to it): enc_i = (seg_sum - y_i
# + m*prior) / (seg_cnt - 1 + m), m = 20. Segment sums accumulate as
# DECIMAL(27,2) (order-independent), the prior is quantized once, and
# the per-row encode is scalar double arithmetic — so the whole thing
# is two map-side-combined aggregates (segment, global), two broadcast
# joins back to the fact, and zero row-order sensitivity. Output is
# per-order (the encoded training column itself).
# ---------------------------------------------------------------------------
_TE_M = 20


@query(
    "q_target_encoding",
    oracle=f"""
    WITH fact AS (
        SELECT o.o_orderkey, c.c_mktsegment AS segment,
               o.o_totalprice AS y
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    seg AS (
        SELECT segment, count(*) AS cnt,
               CAST(sum(CAST(y AS DECIMAL(27,2))) AS DOUBLE) AS ssum
        FROM fact GROUP BY 1
    ),
    gpr AS (
        SELECT floor(CAST(sum(CAST(y AS DECIMAL(27,2))) AS DOUBLE)
                     / count(*) * 1e6 + 0.5) / 1e6 AS prior
        FROM fact
    )
    SELECT f.o_orderkey, f.segment,
           floor((s.ssum - f.y + {_TE_M} * g.prior)
                 / (s.cnt - 1 + {_TE_M}) * 1e6 + 0.5) / 1e6
               AS loo_target_enc
    FROM fact f JOIN seg s USING (segment) CROSS JOIN gpr g
    """,
)
def q_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _TE_M
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.col("o_totalprice").alias("y")
    )
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    fact = orders.join(
        maybe_broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
    ).select("o_orderkey", "segment", "y")
    seg = fact.groupBy("segment").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("y").cast("decimal(27,2)"))
        .cast("double")
        .alias("ssum"),
    )
    glob = fact.agg(
        (
            F.floor(
                F.sum(F.col("y").cast("decimal(27,2)")).cast("double")
                / F.count(F.lit(1))
                * 1e6
                + F.lit(0.5)
            )
            / 1e6
        ).alias("prior")
    )
    return (
        fact.join(F.broadcast(seg), "segment")
        .crossJoin(F.broadcast(glob))
        .select(
            "o_orderkey",
            "segment",
            (
                F.floor(
                    (F.col("ssum") - F.col("y") + m * F.col("prior"))
                    / (F.col("cnt") - 1 + m)
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("loo_target_enc"),
        )
    )


# ---------------------------------------------------------------------------
# q_npv_discounted_cashflow — net present value of the per-region
# revenue stream at an 8% annual discount rate. The discount-factor
# table is a shared 10-row literal (t, 1/1.08^t rounded to 6dp) so the
# two engines multiply by bit-identical constants — the idiomatic way
# to keep pow() out of cross-engine arithmetic (libm pow differs in the
# last ulp). Yearly revenue accumulates as DECIMAL(27,2); the
# discounted terms are quantized to DECIMAL(27,6) before the final
# <=10-row sum. Cashflow years outside the factor horizon drop via the
# inner join on t (stated semantics, identical in both engines). Plan:
# one fact aggregate keyed (region, year), two broadcast dims, one
# 10-row broadcast factor join.
# ---------------------------------------------------------------------------
_NPV_BASE_YEAR = 1995
_NPV_FACTORS = [
    (0, 1.0),
    (1, 0.925926),
    (2, 0.857339),
    (3, 0.793832),
    (4, 0.73503),
    (5, 0.680583),
    (6, 0.63017),
    (7, 0.58349),
    (8, 0.540269),
    (9, 0.500249),
]


@query(
    "q_npv_discounted_cashflow",
    oracle=f"""
    WITH factors(t, f) AS (
        VALUES {", ".join(f"({t}, {f})" for t, f in _NPV_FACTORS)}
    ),
    rev AS (
        SELECT r.r_name,
               year(o.o_orderdate) - {_NPV_BASE_YEAR} AS t,
               CAST(sum(CAST(o.o_totalprice AS DECIMAL(27,2))) AS DOUBLE)
                   AS cf
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2
    ),
    disc AS (
        SELECT r_name,
               CAST(floor(cf * f * 1e6 + 0.5) / 1e6 AS DECIMAL(27,6))
                   AS dcf
        FROM rev JOIN factors USING (t)
    )
    SELECT r_name,
           CAST(count(*) AS BIGINT) AS n_years,
           -- via VARCHAR: correctly-rounded decimal→double (DuckDB's
           -- direct cast double-rounds and can differ from Spark by
           -- 1 ulp once sum(dcf)*10^6 exceeds 2^53 — seen at sf1)
           CAST(CAST(sum(dcf) AS VARCHAR) AS DOUBLE) AS npv
    FROM disc GROUP BY 1
    """,
)
def q_npv_discounted_cashflow(spark: SparkSession, sf_dir: str) -> DataFrame:
    factors = local_frame(spark, _NPV_FACTORS, "t int, f double")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region")
    rev = (
        orders.join(
            maybe_broadcast(cust),
            orders["o_custkey"] == cust["c_custkey"],
        )
        .join(maybe_broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
        .join(maybe_broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])
        .groupBy(
            "r_name",
            (F.year("o_orderdate") - _NPV_BASE_YEAR).alias("t"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(27,2)"))
            .cast("double")
            .alias("cf")
        )
    )
    disc = rev.join(F.broadcast(factors), "t").select(
        "r_name",
        (F.floor(F.col("cf") * F.col("f") * 1e6 + F.lit(0.5)) / 1e6)
        .cast("decimal(27,6)")
        .alias("dcf"),
    )
    return disc.groupBy("r_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_years"),
        F.sum("dcf").cast("double").alias("npv"),
    )
