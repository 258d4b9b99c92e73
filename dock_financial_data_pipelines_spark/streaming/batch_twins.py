"""Batch twins of the streaming operators (SURVEY.md §2-B X1-X3, X6).

Each query states the same windowing semantics Structured Streaming
applies incrementally, so the DuckDB oracle can check them; the true
``readStream`` forms live in ``streams.py``. Window starts are reported
as epoch-second bigints — Spark's `window()` aligns to the unix epoch,
which the oracle reproduces with floor arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from dock_financial_data_pipelines_spark.catalog import dec_sum, load
from dock_financial_data_pipelines_spark.registry import query


# ---------------------------------------------------------------------------
# X1 — tumbling window aggregation (5 minutes)
# ---------------------------------------------------------------------------
@query(
    "x1_tumbling_window",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS window_start,
           count(*) AS n_events,
           round(sum(CAST(value AS DECIMAL(27,6))), 2)::DOUBLE AS total_value
    FROM events GROUP BY 1
    """,
)
def x1_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value", scale=6).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("bigint").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# X2 — sliding window (10-minute windows every 5 minutes: each event
# belongs to exactly two windows, which the oracle enumerates).
# ---------------------------------------------------------------------------
@query(
    "x2_sliding_window",
    oracle="""
    WITH shifted AS (
        SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) - k AS window_start,
               value
        FROM events CROSS JOIN (VALUES (0), (300)) offsets(k)
    )
    SELECT window_start, count(*) AS n_events,
           round(sum(CAST(value AS DECIMAL(27,6))), 2)::DOUBLE AS total_value
    FROM shifted GROUP BY 1
    """,
)
def x2_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value", scale=6).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("bigint").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# X3 — session window (30-minute gap) per user; the oracle is the
# gaps-and-islands formulation.
# ---------------------------------------------------------------------------
@query(
    "x3_session_window",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM flagged
    )
    SELECT user_id,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
           count(*) AS n_events,
           round(sum(CAST(value AS DECIMAL(27,6))), 2)::DOUBLE AS total_value
    FROM sessions GROUP BY user_id, session_id
    """,
)
def x3_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value", scale=6).alias("total_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).cast("bigint").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# X6 — stream-static join, batch twin: events enriched by the customer
# dimension (the static side is broadcast in both forms).
# ---------------------------------------------------------------------------
@query(
    "x6_stream_static_join_twin",
    oracle="""
    SELECT c.c_mktsegment, e.event_type,
           count(*) AS n,
           round(sum(CAST(e.value AS DECIMAL(27,6))), 2)::DOUBLE AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def x6_stream_static_join_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cust = load(spark, sf_dir, "customer")
    return (
        ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dec_sum("value", scale=6).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# X7 batch twin — per-key running state (the streaming stateful operator's
# semantics): cumulative count + balance per user, final state only.
# ---------------------------------------------------------------------------
@query(
    "x7_stateful_final_state_twin",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           round(sum(CAST(value AS DECIMAL(27,6))), 2)::DOUBLE AS balance,
           CAST(floor(epoch(max(ts))) AS BIGINT) AS last_seen
    FROM events GROUP BY 1
    """,
)
def x7_stateful_final_state_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value", scale=6).alias("balance"),
            F.unix_timestamp(F.max("ts")).cast("bigint").alias("last_seen"),
        )
    )


# ---------------------------------------------------------------------------
# Statement report: per user per day — daily net + running balance
# (the reference's digital-account statement, STMTS:54, as one query).
# ---------------------------------------------------------------------------
@query(
    "q_daily_statement",
    oracle="""
    WITH daily AS (
        SELECT user_id,
               strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               round(sum(CAST(value AS DECIMAL(27,6))), 2)::DOUBLE AS daily_net,
               count(*) AS n_tx
        FROM events GROUP BY 1, 2
    )
    SELECT user_id, day, daily_net, n_tx,
           round(sum(CAST(daily_net AS DECIMAL(27,2))) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2)::DOUBLE AS running_balance
    FROM daily
    """,
)
def q_daily_statement(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            "user_id",
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        )
        .agg(
            dec_sum("value", scale=6).alias("daily_net"),
            F.count(F.lit(1)).alias("n_tx"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "user_id",
        "day",
        "daily_net",
        "n_tx",
        F.round(F.sum(F.col("daily_net").cast("decimal(27,2)")).over(w), 2)
        .cast("double")
        .alias("running_balance"),
    )


# ---------------------------------------------------------------------------
# X11 twin — the stream-stream attribution join as one batch range join,
# hash-checked against the oracle (the streaming form emits exactly
# these pairs once the watermark passes).
# ---------------------------------------------------------------------------
@query(
    "x11_stream_stream_join_twin",
    oracle="""
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id,
           p.user_id,
           CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_epoch,
           CAST(floor(epoch(c.ts)) AS BIGINT) AS click_epoch
    FROM events p
    JOIN events c
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 30 MINUTE
     AND c.ts <= p.ts
    WHERE p.event_type = 'purchase'
    """,
)
def x11_stream_stream_join_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
    ).select(
        "purchase_id",
        "click_id",
        F.col("p_user").alias("user_id"),
        F.unix_timestamp("p_ts").cast("bigint").alias("purchase_epoch"),
        F.unix_timestamp("c_ts").cast("bigint").alias("click_epoch"),
    )
