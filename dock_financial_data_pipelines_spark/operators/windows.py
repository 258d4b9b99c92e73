"""Window functions (SURVEY.md §2-B W1-W6).

W3 (running sum per account ordered by time) is the core financial-
statement semantics the reference ships as files (STMTS:54 — an account
statement over a period IS a running balance). Every window partitions
by a key (user/customer), so at 100 TB the shuffle is a single hash
repartition by that key; no global sort is ever required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from dock_financial_data_pipelines_spark.catalog import load
from dock_financial_data_pipelines_spark.registry import query


# ---------------------------------------------------------------------------
# W1 — ranking family. rank/dense_rank/percent_rank/cume_dist use the
# (possibly tied) price ordering — deterministic under ties; row_number
# and ntile get a unique tiebreak key.
# ---------------------------------------------------------------------------
@query(
    "w1_rank_functions",
    oracle="""
    SELECT o_custkey, o_orderkey,
           row_number()   OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
           rank()         OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk,
           dense_rank()   OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS drnk,
           ntile(4)       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS quartile,
           round(percent_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC), 6) AS pct_rank,
           round(cume_dist()    OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC), 6) AS cdist
    FROM orders
    WHERE o_custkey < 30
    """,
)
def w1_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    tied = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    uniq = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        load(spark, sf_dir, "orders")
        .where(F.col("o_custkey") < 30)
        .select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(uniq).alias("rn"),
            F.rank().over(tied).alias("rnk"),
            F.dense_rank().over(tied).alias("drnk"),
            F.ntile(4).over(uniq).alias("quartile"),
            F.round(F.percent_rank().over(tied), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(tied), 6).alias("cdist"),
        )
    )


# ---------------------------------------------------------------------------
# W2 — lag / lead (statement deltas per account)
# ---------------------------------------------------------------------------
@query(
    "w2_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           round(value - lag(value) OVER w, 2) AS delta,
           lead(event_type) OVER w AS next_type,
           lag(event_id, 2) OVER w AS prev2_id
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def w2_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta"),
        F.lead("event_type").over(w).alias("next_type"),
        F.lag("event_id", 2).over(w).alias("prev2_id"),
    )


# ---------------------------------------------------------------------------
# W3 — running sum: the account running balance (the statement operator)
# ---------------------------------------------------------------------------
@query(
    "w3_running_balance",
    oracle="""
    SELECT event_id, user_id,
           round(sum(CAST(value AS DECIMAL(27,6))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2)::DOUBLE AS running_balance
    FROM events
    """,
)
def w3_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.sum(F.col("value").cast("decimal(27,6)")).over(w), 2)
        .cast("double")
        .alias("running_balance"),
    )


# ---------------------------------------------------------------------------
# W4 — moving aggregate over a time range (1-hour trailing window).
# Ordering key is epoch seconds (bigint) so RANGE semantics match DuckDB.
# ---------------------------------------------------------------------------
@query(
    "w4_moving_time_range",
    oracle="""
    SELECT event_id, user_id,
           round(avg(value) OVER (
               PARTITION BY user_id
               ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           ), 4) AS avg_1h,
           count(*) OVER (
               PARTITION BY user_id
               ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           ) AS n_1h
    FROM events
    """,
)
def w4_moving_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "ts_epoch", F.unix_timestamp("ts").cast("bigint")
    )
    w = Window.partitionBy("user_id").orderBy("ts_epoch").rangeBetween(-3600, 0)
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 4).alias("avg_1h"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
    )


# ---------------------------------------------------------------------------
# W5 — first/last value per partition
# ---------------------------------------------------------------------------
@query(
    "w5_first_last",
    oracle="""
    SELECT DISTINCT user_id,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type)  OVER w AS last_type,
           round(first_value(value) OVER w, 2) AS first_value_amt,
           round(last_value(value)  OVER w, 2) AS last_value_amt
    FROM events
    WINDOW w AS (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
    """,
)
def w5_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            F.first("event_type").over(w).alias("first_type"),
            F.last("event_type").over(w).alias("last_type"),
            F.round(F.first("value").over(w), 2).alias("first_value_amt"),
            F.round(F.last("value").over(w), 2).alias("last_value_amt"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# W6 — top-k per group (window + filter; Spark pushes the limit into the
# sort within each partition)
# ---------------------------------------------------------------------------
@query(
    "w6_topk_per_group",
    oracle="""
    SELECT c_mktsegment, o_orderkey, round(o_totalprice, 2) AS total, rn
    FROM (
        SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
               row_number() OVER (
                   PARTITION BY c.c_mktsegment
                   ORDER BY o.o_totalprice DESC, o.o_orderkey
               ) AS rn
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) WHERE rn <= 3
    """,
)
def w6_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            "c_mktsegment",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total"),
            "rn",
        )
    )


# ---------------------------------------------------------------------------
# W7 — quantile bucketing (ntile): per-segment account-balance quartiles,
# the feature-binning primitive. Unique (balance, custkey) ordering makes
# the tile assignment total and oracle-exact.
# ---------------------------------------------------------------------------
@query(
    "w7_ntile_quartiles",
    oracle="""
    WITH tiled AS (
        SELECT c_mktsegment, c_acctbal,
               ntile(4) OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY c_acctbal, c_custkey
               ) AS quartile
        FROM customer
    )
    SELECT c_mktsegment, quartile,
           count(*) AS n,
           round(min(c_acctbal), 2) AS lo,
           round(max(c_acctbal), 2) AS hi
    FROM tiled GROUP BY 1, 2
    """,
)
def w7_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        load(spark, sf_dir, "customer")
        .withColumn("quartile", F.ntile(4).over(w))
        .groupBy("c_mktsegment", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("c_acctbal"), 2).alias("lo"),
            F.round(F.max("c_acctbal"), 2).alias("hi"),
        )
    )


# ---------------------------------------------------------------------------
# W8 — distribution ranks: cume_dist / percent_rank of order totals per
# priority class (the "where does this order sit" percentile surface).
# ---------------------------------------------------------------------------
@query(
    "w8_distribution_ranks",
    # cume_dist/percent_rank are exact rationals k/n that frequently land
    # ON the .5 rounding tie (e.g. 0.0640625 at 6 digits); round() then
    # differs across engines (HALF_UP vs half-even — observed at sf0.1),
    # so both sides use the tie-free floor(x*1e6 + 0.5)/1e6 convention.
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           floor(cume_dist() OVER w * 1e6 + 0.5) / 1e6 AS cd,
           floor(percent_rank() OVER w * 1e6 + 0.5) / 1e6 AS pr
    FROM orders
    WHERE o_totalprice > 350000
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def w8_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    def r6(c):
        return F.floor(c * 1e6 + 0.5).cast("double") / 1e6

    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        load(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 350000)
        .select(
            "o_orderkey",
            "o_orderpriority",
            r6(F.cume_dist().over(w)).alias("cd"),
            r6(F.percent_rank().over(w)).alias("pr"),
        )
    )


# ---------------------------------------------------------------------------
# W9 — finite-window EWMA: exponentially weighted moving average of each
# user's last 10 event values (α=0.3 decay over recency rank). The
# closed-form weighted sum over a bounded lookback keeps pow() exponents
# small (the unbounded recursive EWMA underflows pow at big n); both
# engines evaluate the identical arithmetic, so the oracle is exact.
# ---------------------------------------------------------------------------
@query(
    "w9_ewma_last10",
    oracle="""
    WITH ranked AS (
        SELECT user_id, value,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC
               ) AS r
        FROM events
    )
    SELECT user_id,
           round(sum(CAST(value * power(0.7, r - 1) AS DECIMAL(27,8)))::DOUBLE
                 / sum(CAST(power(0.7, r - 1) AS DECIMAL(27,8)))::DOUBLE, 4)
               AS ewma10,
           count(*) AS n_used
    FROM ranked WHERE r <= 10
    GROUP BY 1
    """,
)
def w9_ewma_last10(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    decay = F.pow(F.lit(0.7), F.col("r") - 1)
    return (
        load(spark, sf_dir, "events")
        .withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= 10)
        .groupBy("user_id")
        .agg(
            F.round(
                F.sum((F.col("value") * decay).cast("decimal(27,8)")).cast("double")
                / F.sum(decay.cast("decimal(27,8)")).cast("double"),
                4,
            ).alias("ewma10"),
            F.count(F.lit(1)).alias("n_used"),
        )
    )


# ---------------------------------------------------------------------------
# W10 — gap-based sessionization, the lag → flag → cumulative-sum
# composition (the manual form of X3's session_window, portable to any
# engine): a new session starts after a >30-minute silence.
# ---------------------------------------------------------------------------
@query(
    "w10_sessionize_gaps",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, event_id,
               CAST(sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_no
        FROM flagged
    )
    SELECT user_id, session_no, count(*) AS n_events
    FROM sessions GROUP BY 1, 2
    """,
)
def w10_sessionize_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # unix_timestamp, not cast("long"): ts is TIMESTAMP_NTZ in the parquet
    # fixtures and Spark refuses a direct numeric cast on NTZ.
    gap = F.unix_timestamp("ts") - F.lag(F.unix_timestamp("ts")).over(w)
    new_session = (
        F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0)
    )
    return (
        load(spark, sf_dir, "events")
        .withColumn("new_session", new_session)
        .withColumn("session_no", F.sum("new_session").over(wrun))
        .groupBy("user_id", "session_no")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


# ---------------------------------------------------------------------------
# W11 — sequence-pattern matching over per-user event streams (the
# MATCH_RECOGNIZE shape, restated portably): each user's events collapse
# to an ordered initial-string ('v'iew 'c'lick 'p'urchase …) and funnel
# occurrences are counted as non-overlapping regex matches of
# 'vc*p' — a view, any clicks, then a purchase. Output is the user
# histogram by funnel count.
#
# Scale: one shuffle (user groupBy); the per-user sequence is bounded by
# that user's event count, the regex runs JVM-side per row. The
# deterministic ordering inside collect_list uses the same
# sort_array(struct(ts, event_id, ch)) device as the packing
# materializer — Spark's aggregation order is not otherwise defined.
# A per-user event string is exactly the layout a session-replay store
# keeps; at 100 TB one would cap/sample per-user sequences (the fixture
# doesn't need it, max |seq| = user's events in range).
# ---------------------------------------------------------------------------
@query(
    "w11_event_pattern_match",
    oracle="""
    WITH seqs AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), ''
                          ORDER BY ts, event_id) AS seq
        FROM events GROUP BY 1
    ),
    m AS (
        SELECT user_id,
               len(regexp_extract_all(seq, 'vc*p')) AS n_funnels
        FROM seqs
    )
    SELECT n_funnels, count(*) AS n_users FROM m GROUP BY 1 ORDER BY 1
    """,
)
def w11_event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.substring("event_type", 1, 1).alias("ch"),
    )
    seqs = ev.groupBy("user_id").agg(
        F.array_join(
            F.expr(
                "transform(sort_array(collect_list(struct(ts, event_id, ch))),"
                " x -> x.ch)"
            ),
            "",
        ).alias("seq")
    )
    m = seqs.select(
        "user_id",
        F.size(F.expr("regexp_extract_all(seq, 'vc*p', 0)")).alias("n_funnels"),
    )
    return (
        m.groupBy("n_funnels")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("n_funnels")
    )


# ---------------------------------------------------------------------------
# W12 — activity-streak detection (gaps-and-islands): the longest run of
# CONSECUTIVE active days per user. The island id is the classic
# day_number − dense_rank() constant: consecutive days share it, any
# gap shifts it. Two window passes over (user, day) — both partitioned
# by user, so the shuffle is one hash partition and no global sort
# exists. Engagement/retention metric (DAU streaks) on the events
# stream.
# ---------------------------------------------------------------------------
@query(
    "w12_activity_streaks",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
        FROM events
    ),
    islands AS (
        SELECT user_id, d,
               d - dense_rank() OVER (PARTITION BY user_id ORDER BY d)
                   AS island
        FROM days
    ),
    streaks AS (
        SELECT user_id, island, count(*) AS len
        FROM islands GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(max(len) AS BIGINT) AS longest_streak,
           CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(sum(len) AS BIGINT) AS active_days
    FROM streaks GROUP BY 1
    """,
)
def w12_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    days = (
        load(spark, sf_dir, "events")
        .select("user_id", F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("d"))
        .distinct()
    )
    island = F.col("d") - F.dense_rank().over(
        Window.partitionBy("user_id").orderBy("d")
    )
    streaks = (
        days.withColumn("island", island)
        .groupBy("user_id", "island")
        .agg(F.count(F.lit(1)).alias("len"))
    )
    return streaks.groupBy("user_id").agg(
        F.max("len").cast("long").alias("longest_streak"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.sum("len").cast("long").alias("active_days"),
    )


# ---------------------------------------------------------------------------
# W14 — cumulative distinct users by day ("audience growth curve"):
# each user counts from their FIRST active day, so the curve is a
# first-seen aggregate (one shuffle on user_id) followed by a
# cumulative sum over the calendar-bounded daily series — never a
# running COUNT(DISTINCT) over raw events, which would hold the whole
# id set in every window frame at 100 TB.
# ---------------------------------------------------------------------------
@query(
    "w14_cumulative_distinct_users",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, min(strftime(ts, '%Y-%m-%d')) AS day
        FROM events GROUP BY 1
    ),
    new_per_day AS (
        SELECT day, count(*) AS n_new FROM first_seen GROUP BY 1
    )
    SELECT day, CAST(n_new AS BIGINT) AS n_new,
           CAST(sum(n_new) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cumulative_users
    FROM new_per_day ORDER BY day
    """,
)
def w14_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dock_financial_data_pipelines_spark.catalog import load

    first_seen = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.min(F.date_format("ts", "yyyy-MM-dd")).alias("day"))
    )
    new_per_day = first_seen.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_new")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        new_per_day.select(
            "day",
            F.col("n_new").cast("long").alias("n_new"),
            F.sum("n_new").over(w).cast("long").alias("cumulative_users"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# W17 — daily OHLC bars over the event value stream: open/high/low/
# close + volume + DECIMAL turnover per day — the financial
# time-series primitive. Open/close are row_number picks over the
# per-day (ts, event_id) total order (NOT min_by/max_by on a composite
# key, whose tie semantics differ across engines — the fixture plants
# tied timestamps deliberately); high/low/volume/turnover are plain
# aggregates. One shuffle on day, windows inside the day partition.
# ---------------------------------------------------------------------------
@query(
    "w17_daily_ohlc",
    oracle="""
    WITH base AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, value, ts, event_id
        FROM events
    ),
    flagged AS (
        SELECT day, value,
               row_number() OVER (PARTITION BY day
                                  ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (PARTITION BY day
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM base
    )
    SELECT day,
           max(CASE WHEN rn_a = 1 THEN value END) AS open,
           round(max(value), 2) AS high,
           round(min(value), 2) AS low,
           max(CASE WHEN rn_d = 1 THEN value END) AS close,
           count(*) AS volume,
           round(sum(CAST(value AS DECIMAL(27,6))), 2)::DOUBLE AS turnover
    FROM flagged GROUP BY 1 ORDER BY 1
    """,
)
def w17_daily_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dock_financial_data_pipelines_spark.catalog import dec_sum, load

    base = load(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "value",
        "ts",
        "event_id",
    )
    wa = Window.partitionBy("day").orderBy("ts", "event_id")
    wd = Window.partitionBy("day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    flagged = base.select(
        "day",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return (
        flagged.groupBy("day")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("volume"),
            dec_sum("value", scale=6).alias("turnover"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# W18 — maximum drawdown per customer: running balance over order
# history (decimal-exact cumulative sum), running peak, drawdown =
# peak − balance, reported as each customer's worst trough and when it
# happened. The canonical risk metric over any cumulative series. One
# shuffle on the partition key feeds all three windows; tiebreak on
# o_orderkey makes every window total-ordered.
# ---------------------------------------------------------------------------
@query(
    "w18_max_drawdown",
    oracle="""
    WITH tx AS (
        SELECT o_custkey,
               CAST(floor(epoch(o_orderdate)) AS BIGINT) AS ts, o_orderkey,
               CAST(CASE WHEN o_orderstatus = 'F' THEN -o_totalprice
                         ELSE o_totalprice END AS DECIMAL(27,2)) AS amt
        FROM orders
    ),
    bal_s AS (
        SELECT o_custkey, ts, o_orderkey,
               sum(amt) OVER (PARTITION BY o_custkey ORDER BY ts, o_orderkey
                              ROWS UNBOUNDED PRECEDING) AS bal
        FROM tx
    ),
    series AS (
        SELECT o_custkey, ts, o_orderkey, bal,
               max(bal) OVER (PARTITION BY o_custkey ORDER BY ts, o_orderkey
                              ROWS UNBOUNDED PRECEDING) AS peak
        FROM bal_s
    ),
    dd AS (
        SELECT o_custkey, ts,
               CAST(peak - bal AS DOUBLE) AS drawdown,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY CAST(peak - bal AS DOUBLE) DESC, ts, o_orderkey
               ) AS rn,
               count(*) OVER (PARTITION BY o_custkey) AS n_orders
        FROM series
    )
    SELECT o_custkey AS custkey, n_orders,
           round(drawdown, 2)::DOUBLE AS max_drawdown,
           ts AS trough_ts
    FROM dd WHERE rn = 1 AND n_orders >= 5
    """,
)
def w18_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    tx = o.select(
        "o_custkey",
        F.unix_timestamp("o_orderdate").alias("ts"),
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", -F.col("o_totalprice"))
        .otherwise(F.col("o_totalprice"))
        .cast("decimal(27,2)")
        .alias("amt"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("ts", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    series = tx.select(
        "o_custkey",
        "ts",
        "o_orderkey",
        F.sum("amt").over(w).alias("bal"),
    ).withColumn("peak", F.max("bal").over(w))
    ddown = (F.col("peak") - F.col("bal")).cast("double")
    dd = series.select(
        "o_custkey",
        "ts",
        ddown.alias("drawdown"),
        F.row_number()
        .over(
            Window.partitionBy("o_custkey").orderBy(
                ddown.desc(), "ts", "o_orderkey"
            )
        )
        .alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("o_custkey"))
        .alias("n_orders"),
    )
    return dd.where((F.col("rn") == 1) & (F.col("n_orders") >= 5)).select(
        F.col("o_custkey").alias("custkey"),
        "n_orders",
        F.round(F.col("drawdown"), 2).cast("double").alias("max_drawdown"),
        F.col("ts").alias("trough_ts"),
    )


# ---------------------------------------------------------------------------
# W19 — Bollinger bands over the daily revenue series: 7-day trailing
# mean ± 2 sample standard deviations, flagging days that pierce a
# band. The variance comes from decimal-exact window sums of x and x²
# ((n·s2 − s1²)/(n·(n−1))) — never stddev_samp(double), whose partial-
# aggregation order differs per engine. Daily rollup first (tiny), so
# the windows run over ~2.4k rows regardless of fact size.
# ---------------------------------------------------------------------------
@query(
    "w19_bollinger_bands",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               round(sum(CAST(o_totalprice AS DECIMAL(27,2))), 2) AS rev
        FROM orders GROUP BY 1
    ),
    win AS (
        -- decimal → double via VARCHAR: DuckDB's direct decimal cast
        -- double-rounds (hugeint→double, then /10^scale) and can land
        -- 1 ulp off Spark's correctly-rounded BigDecimal.doubleValue
        -- once the scaled value exceeds 2^53; the string round-trip is
        -- correctly rounded in both engines (caught at sf1, where a
        -- 1-ulp s2 skew flipped one band's .xx5 rounding boundary).
        SELECT day, CAST(rev AS DOUBLE) AS rev,
               count(*) OVER w AS n,
               CAST(CAST(sum(CAST(rev AS DECIMAL(27,2))) OVER w AS VARCHAR)
                    AS DOUBLE) AS s1,
               CAST(CAST(sum(CAST(rev * rev AS DECIMAL(38,4))) OVER w
                         AS VARCHAR) AS DOUBLE) AS s2
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    ),
    bands AS (
        SELECT day, rev, n,
               s1 / n AS ma7,
               sqrt((n * s2 - s1 * s1) / (n * (n - 1.0))) AS sd7
        FROM win WHERE n = 7
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, rev,
           floor(ma7 * 100 + 0.5) / 100 AS ma7,
           floor((ma7 + 2 * sd7) * 100 + 0.5) / 100 AS upper_band,
           floor((ma7 - 2 * sd7) * 100 + 0.5) / 100 AS lower_band,
           CASE WHEN rev > ma7 + 2 * sd7 THEN 'above'
                WHEN rev < ma7 - 2 * sd7 THEN 'below'
                ELSE 'inside' END AS band_position
    FROM bands
    """,
)
def w19_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(27,2)")), 2).alias(
            "rev_d"
        )
    )
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    win = daily.select(
        "day",
        F.col("rev_d").cast("double").alias("rev"),
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(F.col("rev_d").cast("decimal(27,2)"))
        .over(w)
        .cast("double")
        .alias("s1"),
        F.sum((F.col("rev_d") * F.col("rev_d")).cast("decimal(38,4)"))
        .over(w)
        .cast("double")
        .alias("s2"),
    )
    n = F.col("n").cast("double")
    ma7 = F.col("s1") / n
    sd7 = F.sqrt((n * F.col("s2") - F.col("s1") * F.col("s1")) / (n * (n - 1.0)))
    r2 = lambda e: F.floor(e * 100 + F.lit(0.5)) / 100  # noqa: E731
    return win.where(F.col("n") == 7).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "rev",
        r2(ma7).alias("ma7"),
        r2(ma7 + 2 * sd7).alias("upper_band"),
        r2(ma7 - 2 * sd7).alias("lower_band"),
        F.when(F.col("rev") > ma7 + 2 * sd7, F.lit("above"))
        .when(F.col("rev") < ma7 - 2 * sd7, F.lit("below"))
        .otherwise(F.lit("inside"))
        .alias("band_position"),
    )


# ---------------------------------------------------------------------------
# W20 — 30-day rolling correlation between daily order count and daily
# average order value: does volume move with ticket size? Pearson from
# decimal-exact rolling moment sums over the daily rollup (the w19
# policy: never corr(double) over a window — partial-aggregation order
# differs per engine). Windows with fewer than 10 days are suppressed.
# ---------------------------------------------------------------------------
@query(
    "w20_rolling_corr",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(count(*) AS DOUBLE) AS x,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(27,2))), 2)
                    AS DOUBLE) / count(*) AS y
        FROM orders GROUP BY 1
    ),
    q AS (
        SELECT day,
               CAST(x AS DECIMAL(27,6)) AS xq,
               CAST(y AS DECIMAL(27,6)) AS yq
        FROM daily
    ),
    win AS (
        SELECT day, count(*) OVER w AS n,
               CAST(sum(xq) OVER w AS DOUBLE) AS sx,
               CAST(sum(yq) OVER w AS DOUBLE) AS sy,
               CAST(sum(CAST(CAST(xq AS DOUBLE) * CAST(yq AS DOUBLE)
                             AS DECIMAL(38,9))) OVER w AS DOUBLE) AS sxy,
               CAST(sum(CAST(CAST(xq AS DOUBLE) * CAST(xq AS DOUBLE)
                             AS DECIMAL(38,9))) OVER w AS DOUBLE) AS sxx,
               CAST(sum(CAST(CAST(yq AS DOUBLE) * CAST(yq AS DOUBLE)
                             AS DECIMAL(38,9))) OVER w AS DOUBLE) AS syy
        FROM q
        WINDOW w AS (ORDER BY day ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, CAST(n AS BIGINT) AS n_days,
           floor((n*sxy - sx*sy)
                 / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy))
                 * 1e6 + 0.5) / 1e6 AS corr_count_value
    FROM win WHERE n >= 10
      AND (n*sxx - sx*sx) > 0 AND (n*syy - sy*sy) > 0
    """,
)
def w20_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("x"),
        (
            F.round(F.sum(F.col("o_totalprice").cast("decimal(27,2)")), 2)
            .cast("double")
            / F.count(F.lit(1))
        ).alias("y"),
    )
    q = daily.select(
        "day",
        F.col("x").cast("decimal(27,6)").alias("xq"),
        F.col("y").cast("decimal(27,6)").alias("yq"),
    )
    w = Window.orderBy("day").rowsBetween(-29, Window.currentRow)
    dprod = lambda a, b: (  # noqa: E731
        F.sum(
            (F.col(a).cast("double") * F.col(b).cast("double")).cast(
                "decimal(38,9)"
            )
        )
        .over(w)
        .cast("double")
    )
    win = q.select(
        "day",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("xq").over(w).cast("double").alias("sx"),
        F.sum("yq").over(w).cast("double").alias("sy"),
        dprod("xq", "yq").alias("sxy"),
        dprod("xq", "xq").alias("sxx"),
        dprod("yq", "yq").alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx"), F.col("sy")
    vx = n * F.col("sxx") - sx * sx
    vy = n * F.col("syy") - sy * sy
    corr = (n * F.col("sxy") - sx * sy) / (F.sqrt(vx) * F.sqrt(vy))
    return (
        win.where((F.col("n") >= 10) & (vx > 0) & (vy > 0))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("n").cast("long").alias("n_days"),
            (F.floor(corr * 1e6 + F.lit(0.5)) / 1e6).alias(
                "corr_count_value"
            ),
        )
    )


# ---------------------------------------------------------------------------
# W21 — month-anchored VWAP: per ship-day volume-weighted average price
# (Σ extendedprice / Σ quantity) plus the cumulative month-to-date VWAP
# (the anchored-VWAP execution benchmark reset at each month boundary).
# Numerator and denominator accumulate as DECIMALs — daily rollup first,
# then a month-partitioned running window over ~30 rows — and divide
# only in the final report. Plan: one scan, one hash aggregate on day,
# one bounded window; the window partition is the month, so parallelism
# survives any calendar length.
# ---------------------------------------------------------------------------
@query(
    "w21_anchored_vwap",
    oracle="""
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS day,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(27,2)))
                    AS DECIMAL(27,2)) AS pq,
               CAST(sum(CAST(l_quantity AS DECIMAL(27,2)))
                    AS DECIMAL(27,2)) AS qty
        FROM lineitem GROUP BY 1
    ),
    cum AS (
        SELECT day, pq, qty,
               sum(pq) OVER (PARTITION BY date_trunc('month', day)
                             ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum_pq,
               sum(qty) OVER (PARTITION BY date_trunc('month', day)
                              ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum_qty
        FROM daily
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           floor(CAST(pq AS DOUBLE) / CAST(qty AS DOUBLE) * 1e6 + 0.5) / 1e6
               AS daily_vwap,
           floor(CAST(cum_pq AS DOUBLE) / CAST(cum_qty AS DOUBLE) * 1e6 + 0.5)
               / 1e6 AS anchored_vwap
    FROM cum ORDER BY day
    """,
)
def w21_anchored_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    daily = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_shipdate").cast("date").alias("day"))
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(27,2)"))
            .cast("decimal(27,2)")
            .alias("pq"),
            F.sum(F.col("l_quantity").cast("decimal(27,2)"))
            .cast("decimal(27,2)")
            .alias("qty"),
        )
    )
    w = (
        Window.partitionBy(F.date_trunc("month", F.col("day")))
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = daily.select(
        "day",
        "pq",
        "qty",
        F.sum("pq").over(w).alias("cum_pq"),
        F.sum("qty").over(w).alias("cum_qty"),
    )
    return cum.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        (
            F.floor(
                F.col("pq").cast("double") / F.col("qty").cast("double") * 1e6
                + F.lit(0.5)
            )
            / 1e6
        ).alias("daily_vwap"),
        (
            F.floor(
                F.col("cum_pq").cast("double")
                / F.col("cum_qty").cast("double")
                * 1e6
                + F.lit(0.5)
            )
            / 1e6
        ).alias("anchored_vwap"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# W22 — YTD report with prior-year comparison: per (segment, month) —
# month revenue, year-to-date cumulative, the same month last year and
# YoY growth. The canonical BI report shape: everything runs on the
# month×segment ROLLUP (grid-bounded, never fact-sized); the YTD window
# partitions by (segment, year) so parallelism holds at any history
# length. The prior-year value comes from a SELF-JOIN of the grid on
# (segment, yr-1, mo) — NOT lag(12): a lag over the *observed* month
# grid silently compares the wrong months whenever a segment-month cell
# is missing (sparse small-SF data, partial first/last calendar years).
# Growth guards the missing-prior-year case with NULL (both engines
# agree on NULL arithmetic here — no fabricated zeros).
# ---------------------------------------------------------------------------
@query(
    "w22_ytd_report",
    oracle="""
    WITH grid AS (
        SELECT c.c_mktsegment AS segment,
               CAST(strftime(o.o_orderdate, '%Y') AS INT) AS yr,
               CAST(strftime(o.o_orderdate, '%m') AS INT) AS mo,
               CAST(sum(CAST(o.o_totalprice AS DECIMAL(27,2)))
                    AS DECIMAL(27,2)) AS rev
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2, 3
    ),
    win AS (
        SELECT g.segment, g.yr, g.mo, g.rev,
               sum(g.rev) OVER (PARTITION BY g.segment, g.yr ORDER BY g.mo
                                ROWS UNBOUNDED PRECEDING) AS ytd,
               p.rev AS prior_year
        FROM grid g
        LEFT JOIN grid p
          ON p.segment = g.segment AND p.yr = g.yr - 1 AND p.mo = g.mo
    )
    SELECT segment, yr, mo,
           floor(CAST(rev AS DOUBLE) * 1e2 + 0.5) / 1e2 AS revenue,
           floor(CAST(ytd AS DOUBLE) * 1e2 + 0.5) / 1e2 AS ytd_revenue,
           floor(CAST(prior_year AS DOUBLE) * 1e2 + 0.5) / 1e2
               AS prior_year_revenue,
           CASE WHEN prior_year IS NULL THEN NULL
                ELSE floor(CAST(rev - prior_year AS DOUBLE)
                           / CAST(prior_year AS DOUBLE) * 1e6 + 0.5) / 1e6
           END AS yoy_growth
    FROM win ORDER BY segment, yr, mo
    """,
)
def w22_ytd_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dock_financial_data_pipelines_spark.catalog import maybe_broadcast

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    grid = (
        o.join(maybe_broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(27,2)"))
            .cast("decimal(27,2)")
            .alias("rev")
        )
    )
    ytd = F.sum("rev").over(
        Window.partitionBy("segment", "yr")
        .orderBy("mo")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Prior-year month via grid self-join on (segment, yr-1, mo): exact
    # even when segment-month cells are missing (a lag(12) over the
    # observed grid would shift and compare the wrong months). The grid
    # is segments×months — broadcast-sized at any fact-table scale.
    prior_side = grid.select(
        F.col("segment").alias("p_segment"),
        (F.col("yr") + F.lit(1)).alias("p_yr"),
        F.col("mo").alias("p_mo"),
        F.col("rev").alias("prior_year"),
    )
    win = (
        grid.withColumn("ytd", ytd)
        .join(
            F.broadcast(prior_side),
            (F.col("segment") == F.col("p_segment"))
            & (F.col("yr") == F.col("p_yr"))
            & (F.col("mo") == F.col("p_mo")),
            "left",
        )
        .select("segment", "yr", "mo", "rev", "ytd", "prior_year")
    )
    f2 = lambda col: F.floor(col.cast("double") * 1e2 + F.lit(0.5)) / 1e2
    growth = F.when(
        F.col("prior_year").isNull(), F.lit(None).cast("double")
    ).otherwise(
        F.floor(
            (F.col("rev") - F.col("prior_year")).cast("double")
            / F.col("prior_year").cast("double")
            * 1e6
            + F.lit(0.5)
        )
        / 1e6
    )
    return win.select(
        "segment",
        "yr",
        "mo",
        f2(F.col("rev")).alias("revenue"),
        f2(F.col("ytd")).alias("ytd_revenue"),
        f2(F.col("prior_year")).alias("prior_year_revenue"),
        growth.alias("yoy_growth"),
    ).orderBy("segment", "yr", "mo")


# ---------------------------------------------------------------------------
# W23 — 14-day RSI (relative strength index, simple-average Cutler
# form) over the daily revenue series: day-over-day deltas split into
# gains/losses, trailing-14 sums, RSI = 100·Σgain/(Σgain+Σloss). The
# Cutler/SMA form is chosen over Wilder's recursive smoothing
# DELIBERATELY: it is a pure window aggregate (no recursion), so it
# parallelizes and carries an exact integer-cent oracle. Rows emit
# only once 14 full deltas exist; a flat 14-day stretch (Σ=0) emits
# NULL, mirrored on both engines. Day-grain global sort — bounded by
# calendar days (SCALE.md "audit-only global-sort legs" family (a)).
# ---------------------------------------------------------------------------
@query(
    "w23_rsi",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ),
    d AS (
        SELECT day, cents,
               cents - lag(cents) OVER (ORDER BY day) AS delta,
               row_number() OVER (ORDER BY day) AS rn
        FROM daily
    ),
    g AS (
        SELECT day, cents, rn,
               sum(greatest(delta, 0)) OVER (ORDER BY day
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS sg,
               sum(greatest(-delta, 0)) OVER (ORDER BY day
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS sl
        FROM d
    )
    SELECT day,
           floor(CAST(cents AS DOUBLE) / 100 * 1e2 + 0.5) / 1e2 AS revenue,
           CASE WHEN sg + sl = 0 THEN NULL
                ELSE floor(100.0 * sg / (sg + sl) * 1e4 + 0.5) / 1e4
           END AS rsi_14
    FROM g WHERE rn >= 15 ORDER BY day
    """,
)
def w23_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    wd = Window.orderBy("day")
    d = daily.select(
        "day",
        "cents",
        (F.col("cents") - F.lag("cents").over(wd)).alias("delta"),
        F.row_number().over(wd).alias("rn"),
    )
    w14 = Window.orderBy("day").rowsBetween(-13, 0)
    g = d.select(
        "day",
        "cents",
        "rn",
        F.sum(F.greatest(F.col("delta"), F.lit(0))).over(w14).alias("sg"),
        F.sum(F.greatest(-F.col("delta"), F.lit(0))).over(w14).alias("sl"),
    )
    rsi = F.when(F.col("sg") + F.col("sl") == 0, F.lit(None)).otherwise(
        F.floor(
            F.lit(100.0) * F.col("sg") / (F.col("sg") + F.col("sl")) * 1e4
            + F.lit(0.5)
        )
        / 1e4
    )
    return (
        g.where(F.col("rn") >= 15)
        .select(
            "day",
            (
                F.floor(F.col("cents").cast("double") / 100 * 1e2 + F.lit(0.5))
                / 1e2
            ).alias("revenue"),
            rsi.alias("rsi_14"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# W24 — 20-day Donchian channels over the daily revenue series:
# trailing high/low band (rolling max/min — exact on integer cents,
# unlike Bollinger's stddev), channel width, and the breakout flag
# (today's value touches the 20-day high). w19_bollinger_bands'
# order-statistic sibling; same day-grain bounded sort.
# ---------------------------------------------------------------------------
@query(
    "w24_donchian_channels",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ),
    w AS (
        SELECT day, cents,
               max(cents) OVER (ORDER BY day
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS hi,
               min(cents) OVER (ORDER BY day
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS lo,
               row_number() OVER (ORDER BY day) AS rn
        FROM daily
    )
    SELECT day,
           floor(CAST(cents AS DOUBLE) / 100 * 1e2 + 0.5) / 1e2 AS revenue,
           floor(CAST(hi AS DOUBLE) / 100 * 1e2 + 0.5) / 1e2 AS upper_band,
           floor(CAST(lo AS DOUBLE) / 100 * 1e2 + 0.5) / 1e2 AS lower_band,
           floor(CAST(hi - lo AS DOUBLE) / 100 * 1e2 + 0.5) / 1e2
               AS channel_width,
           cents = hi AS breakout_high
    FROM w WHERE rn >= 20 ORDER BY day
    """,
)
def w24_donchian_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    w20 = Window.orderBy("day").rowsBetween(-19, 0)
    wd = Window.orderBy("day")
    w = daily.select(
        "day",
        "cents",
        F.max("cents").over(w20).alias("hi"),
        F.min("cents").over(w20).alias("lo"),
        F.row_number().over(wd).alias("rn"),
    )
    f2 = lambda c: F.floor(c.cast("double") / 100 * 1e2 + F.lit(0.5)) / 1e2
    return (
        w.where(F.col("rn") >= 20)
        .select(
            "day",
            f2(F.col("cents")).alias("revenue"),
            f2(F.col("hi")).alias("upper_band"),
            f2(F.col("lo")).alias("lower_band"),
            f2(F.col("hi") - F.col("lo")).alias("channel_width"),
            (F.col("cents") == F.col("hi")).alias("breakout_high"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# W25 — stochastic oscillator (%K/%D) over the daily event-value bars:
# %K = 100·(close − L14)/(H14 − L14) over a 14-bar channel, %D = 3-bar
# SMA of %K. Channel extremes are exact (window min/max); the %D
# average goes through a per-row DECIMAL cast so the 3-term sum is
# order-independent. Only full 14-bar windows emit. One sort + one
# window pass at scale (same plan family as w19 Bollinger).
# ---------------------------------------------------------------------------
_OHLC_SQL = """
    base AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, value, ts, event_id
        FROM events
    ),
    flagged AS (
        SELECT day, value,
               row_number() OVER (PARTITION BY day
                                  ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (PARTITION BY day
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM base
    ),
    bars AS (
        SELECT day,
               max(CASE WHEN rn_a = 1 THEN value END) AS open,
               max(value) AS high,
               min(value) AS low,
               max(CASE WHEN rn_d = 1 THEN value END) AS close
        FROM flagged GROUP BY 1
    )
"""


def _daily_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dock_financial_data_pipelines_spark.catalog import load

    base = load(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "value",
        "ts",
        "event_id",
    )
    wa = Window.partitionBy("day").orderBy("ts", "event_id")
    wd = Window.partitionBy("day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        base.select(
            "day",
            "value",
            F.row_number().over(wa).alias("rn_a"),
            F.row_number().over(wd).alias("rn_d"),
        )
        .groupBy("day")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        )
    )


@query(
    "w25_stochastic_oscillator",
    oracle=f"""
    WITH {_OHLC_SQL},
    chan AS (
        SELECT day, close,
               min(low) OVER w AS l14,
               max(high) OVER w AS h14,
               count(*) OVER w AS n
        FROM bars
        WINDOW w AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    ),
    k AS (
        SELECT day,
               CASE WHEN h14 = l14 THEN 50.0
                    ELSE 100.0 * (close - l14) / (h14 - l14) END AS pk
        FROM chan WHERE n = 14
    ),
    d AS (
        SELECT day, pk,
               CAST(sum(CAST(pk AS DECIMAL(27,8))) OVER
                    (ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                    AS DOUBLE) / 3 AS pd,
               count(*) OVER (ORDER BY day ROWS BETWEEN 2 PRECEDING
                              AND CURRENT ROW) AS nd
        FROM k
    )
    SELECT day,
           floor(pk * 1e4 + 0.5) / 1e4 AS pct_k,
           floor(pd * 1e4 + 0.5) / 1e4 AS pct_d,
           CASE WHEN pk > 80 THEN 'overbought'
                WHEN pk < 20 THEN 'oversold' ELSE 'neutral' END AS signal
    FROM d WHERE nd = 3 ORDER BY day
    """,
)
def w25_stochastic_oscillator(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _daily_bars(spark, sf_dir)
    w14 = Window.orderBy("day").rowsBetween(-13, 0)
    chan = bars.select(
        "day",
        "close",
        F.min("low").over(w14).alias("l14"),
        F.max("high").over(w14).alias("h14"),
        F.count(F.lit(1)).over(w14).alias("n"),
    )
    k = chan.where(F.col("n") == 14).select(
        "day",
        F.when(F.col("h14") == F.col("l14"), F.lit(50.0))
        .otherwise(
            100.0
            * (F.col("close") - F.col("l14"))
            / (F.col("h14") - F.col("l14"))
        )
        .alias("pk"),
    )
    w3 = Window.orderBy("day").rowsBetween(-2, 0)
    d = k.select(
        "day",
        "pk",
        (
            F.sum(F.col("pk").cast("decimal(27,8)")).over(w3).cast("double")
            / 3
        ).alias("pd"),
        F.count(F.lit(1)).over(w3).alias("nd"),
    )
    return (
        d.where(F.col("nd") == 3)
        .select(
            "day",
            (F.floor(F.col("pk") * 1e4 + F.lit(0.5)) / 1e4).alias("pct_k"),
            (F.floor(F.col("pd") * 1e4 + F.lit(0.5)) / 1e4).alias("pct_d"),
            F.when(F.col("pk") > 80, "overbought")
            .when(F.col("pk") < 20, "oversold")
            .otherwise("neutral")
            .alias("signal"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# W26 — Parkinson range volatility over the daily bars: σ_P =
# √( Σln²(H/L) / (4·ln2·n) ), annualized by √252, on a rolling 20-bar
# window. The high-low estimator extracts ~5× more information per bar
# than close-to-close. Per-row ln² terms are DECIMAL-cast before the
# window sum (order-independent); all values are > 0 in this corpus so
# the log is total. Same one-window plan shape as w19/w25.
# ---------------------------------------------------------------------------
@query(
    "w26_parkinson_volatility",
    oracle=f"""
    WITH {_OHLC_SQL},
    t AS (
        -- Parkinson is defined for positive price series; bars whose
        -- low is not positive (hostile/synthetic data) are excluded
        -- identically on both engines rather than crashing the log.
        SELECT day,
               CAST(ln(high / low) * ln(high / low) AS DECIMAL(27,12)) AS l2
        FROM bars WHERE low > 0
    ),
    win AS (
        SELECT day,
               CAST(sum(l2) OVER w AS DOUBLE) AS s,
               count(*) OVER w AS n
        FROM t
        WINDOW w AS (ORDER BY day ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT day,
           floor(sqrt(s / (4 * ln(2) * n)) * sqrt(252) * 1e6 + 0.5) / 1e6
               AS parkinson_vol_ann
    FROM win WHERE n = 20 ORDER BY day
    """,
)
def w26_parkinson_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _daily_bars(spark, sf_dir).where(F.col("low") > 0)
    ln_hl = F.log(F.col("high") / F.col("low"))
    t = bars.select(
        "day", (ln_hl * ln_hl).cast("decimal(27,12)").alias("l2")
    )
    w20 = Window.orderBy("day").rowsBetween(-19, 0)
    win = t.select(
        "day",
        F.sum("l2").over(w20).cast("double").alias("s"),
        F.count(F.lit(1)).over(w20).alias("n"),
    )
    vol = F.sqrt(F.col("s") / (4 * F.log(F.lit(2.0)) * F.col("n"))) * F.sqrt(
        F.lit(252.0)
    )
    return (
        win.where(F.col("n") == 20)
        .select(
            "day",
            (F.floor(vol * 1e6 + F.lit(0.5)) / 1e6).alias(
                "parkinson_vol_ann"
            ),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# W27 — Keltner channels: truncated 10-bar EMA of typical price
# (H+L+C)/3 ± 2·ATR₁₀. The EMA is the explicit 10-term lag polynomial
# Σ tpₖ·0.8^k / Σ 0.8^k — one fixed arithmetic expression per row, so
# both engines evaluate the identical IEEE sequence (the w9 truncation
# idiom, windowed); true range needs lag(close) and ATR goes through
# the usual DECIMAL-cast window mean. Emits only rows with a full
# 10-bar EMA window and 10 valid TRs.
# ---------------------------------------------------------------------------
@query(
    "w27_keltner_channels",
    oracle=f"""
    WITH {_OHLC_SQL},
    tp AS (
        SELECT day, high, low, close,
               (high + low + close) / 3 AS tp,
               lag(close) OVER (ORDER BY day) AS pc,
               row_number() OVER (ORDER BY day) AS rn
        FROM bars
    ),
    tr AS (
        SELECT day, tp, rn,
               greatest(high - low, abs(high - pc), abs(low - pc)) AS tr
        FROM tp
    ),
    ema AS (
        SELECT day, rn,
               (tp
                + lag(tp, 1) OVER w * 0.8
                + lag(tp, 2) OVER w * power(0.8, 2)
                + lag(tp, 3) OVER w * power(0.8, 3)
                + lag(tp, 4) OVER w * power(0.8, 4)
                + lag(tp, 5) OVER w * power(0.8, 5)
                + lag(tp, 6) OVER w * power(0.8, 6)
                + lag(tp, 7) OVER w * power(0.8, 7)
                + lag(tp, 8) OVER w * power(0.8, 8)
                + lag(tp, 9) OVER w * power(0.8, 9))
               / ((1 - power(0.8, 10)) / (1 - 0.8)) AS ema10,
               CAST(sum(CAST(tr AS DECIMAL(27,8))) OVER
                    (ORDER BY day ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
                    AS DOUBLE) / 10 AS atr10,
               count(tr) OVER (ORDER BY day ROWS BETWEEN 9 PRECEDING
                               AND CURRENT ROW) AS ntr
        FROM tr
        WINDOW w AS (ORDER BY day)
    )
    SELECT day,
           floor(ema10 * 1e4 + 0.5) / 1e4 AS ema10,
           floor(atr10 * 1e4 + 0.5) / 1e4 AS atr10,
           floor((ema10 + 2 * atr10) * 1e4 + 0.5) / 1e4 AS upper_channel,
           floor((ema10 - 2 * atr10) * 1e4 + 0.5) / 1e4 AS lower_channel
    FROM ema WHERE rn >= 11 AND ntr = 10
    ORDER BY day
    """,
)
def w27_keltner_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _daily_bars(spark, sf_dir)
    wd = Window.orderBy("day")
    tp = bars.select(
        "day",
        "high",
        "low",
        "close",
        ((F.col("high") + F.col("low") + F.col("close")) / 3).alias("tp"),
        F.lag("close").over(wd).alias("pc"),
        F.row_number().over(wd).alias("rn"),
    )
    tr = tp.select(
        "day",
        "tp",
        "rn",
        F.greatest(
            F.col("high") - F.col("low"),
            F.abs(F.col("high") - F.col("pc")),
            F.abs(F.col("low") - F.col("pc")),
        ).alias("tr"),
    )
    ema_num = F.col("tp")
    for kk in range(1, 10):
        ema_num = ema_num + F.lag("tp", kk).over(wd) * F.pow(
            F.lit(0.8), F.lit(kk)
        )
    ema10 = ema_num / ((1 - 0.8 ** 10) / (1 - 0.8))
    w10 = Window.orderBy("day").rowsBetween(-9, 0)
    ema = tr.select(
        "day",
        "rn",
        ema10.alias("ema10"),
        (
            F.sum(F.col("tr").cast("decimal(27,8)")).over(w10).cast("double")
            / 10
        ).alias("atr10"),
        F.count("tr").over(w10).alias("ntr"),
    )
    f4 = lambda c: F.floor(c * 1e4 + F.lit(0.5)) / 1e4  # noqa: E731
    return (
        ema.where((F.col("rn") >= 11) & (F.col("ntr") == 10))
        .select(
            "day",
            f4(F.col("ema10")).alias("ema10"),
            f4(F.col("atr10")).alias("atr10"),
            f4(F.col("ema10") + 2 * F.col("atr10")).alias("upper_channel"),
            f4(F.col("ema10") - 2 * F.col("atr10")).alias("lower_channel"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Shared daily-volume compaction for the volume-weighted indicators
# (w31/w32): one row per day, so the downstream unpartitioned windows
# run over at most #days rows no matter how large the events table is —
# the only at-scale cost is the groupBy-day shuffle, identical to the
# bars compaction.
# ---------------------------------------------------------------------------
_VOL_SQL = """
    vol AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               CAST(count(*) AS BIGINT) AS vol
        FROM events GROUP BY 1
    )
"""


def _daily_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("vol"))
    )


# ---------------------------------------------------------------------------
# W28 — MACD on the HOURLY closes: truncated-lag-polynomial EMAs (the
# w9/w27 idiom — a FIXED per-row arithmetic expression, so both engines
# evaluate the identical IEEE sequence; no recursive state). EMA_n uses
# decay (n-1)/(n+1) over n explicit lag terms normalized by the
# geometric sum (1-d^n)/(1-d); MACD = EMA12 - EMA26, signal = 9-term
# EMA of MACD (decay 0.8), histogram = MACD - signal. Emitted only once
# every lag is populated (rn >= 34) — hourly bars (not daily) so the
# 34-bar warmup is satisfied at test scale; the compaction is still
# one hash-aggregate, one row per hour, so the unpartitioned window
# sees at most #hours rows at any corpus size. Restates the
# trend-following step of a batch market-monitoring report; net-new vs
# the reference.
# ---------------------------------------------------------------------------
_HCLOSE_SQL = """
    hser AS (
        SELECT hr, max(CASE WHEN rn_d = 1 THEN value END) AS close
        FROM (
            SELECT strftime(ts, '%Y-%m-%d %H') AS hr, value,
                   row_number() OVER (
                       PARTITION BY strftime(ts, '%Y-%m-%d %H')
                       ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM events)
        GROUP BY 1
    )
"""


def _hourly_close(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dock_financial_data_pipelines_spark.catalog import load

    base = load(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd HH").alias("hr"),
        "value",
        "ts",
        "event_id",
    )
    wd = Window.partitionBy("hr").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        base.select("hr", "value", F.row_number().over(wd).alias("rn_d"))
        .groupBy("hr")
        .agg(F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"))
    )
def _ema_poly_sql(col: str, decay: str, n: int) -> str:
    terms = [f"{col}"] + [
        f"lag({col}, {k}) OVER w * power({decay}, {k})" for k in range(1, n)
    ]
    return (
        "(" + "\n                + ".join(terms) + ")\n"
        f"               / ((1 - power({decay}, {n})) / (1 - {decay}))"
    )


def _ema_poly_spark(col: str, decay: float, n: int, wd) -> "F.Column":
    num = F.col(col)
    for k in range(1, n):
        num = num + F.lag(col, k).over(wd) * F.pow(F.lit(decay), F.lit(k))
    return num / ((1 - decay ** n) / (1 - decay))


@query(
    "w28_macd",
    oracle=f"""
    WITH {_HCLOSE_SQL},
    ser AS (
        SELECT hr, close, row_number() OVER (ORDER BY hr) AS rn
        FROM hser
    ),
    ema AS (
        SELECT hr, rn,
               {_ema_poly_sql("close", "11.0/13.0", 12)} AS ema12,
               {_ema_poly_sql("close", "25.0/27.0", 26)} AS ema26
        FROM ser
        WINDOW w AS (ORDER BY hr)
    ),
    macd AS (
        SELECT hr, rn, ema12, ema26, ema12 - ema26 AS macd
        FROM ema
    ),
    sig AS (
        SELECT hr, rn, ema12, ema26, macd,
               {_ema_poly_sql("macd", "0.8", 9)} AS signal
        FROM macd
        WINDOW w AS (ORDER BY hr)
    )
    SELECT hr,
           floor(ema12 * 1e4 + 0.5) / 1e4 AS ema12,
           floor(ema26 * 1e4 + 0.5) / 1e4 AS ema26,
           floor(macd * 1e4 + 0.5) / 1e4 AS macd,
           floor(signal * 1e4 + 0.5) / 1e4 AS signal,
           floor((macd - signal) * 1e4 + 0.5) / 1e4 AS histogram
    FROM sig WHERE rn >= 34
    ORDER BY hr
    """,
)
def w28_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _hourly_close(spark, sf_dir)
    wd = Window.orderBy("hr")
    base = bars.select(
        "hr", "close", F.row_number().over(wd).alias("rn")
    )
    ema = base.select(
        "hr",
        "rn",
        _ema_poly_spark("close", 11.0 / 13.0, 12, wd).alias("ema12"),
        _ema_poly_spark("close", 25.0 / 27.0, 26, wd).alias("ema26"),
    )
    macd = ema.select(
        "hr", "rn", "ema12", "ema26",
        (F.col("ema12") - F.col("ema26")).alias("macd"),
    )
    sig = macd.select(
        "hr", "rn", "ema12", "ema26", "macd",
        _ema_poly_spark("macd", 0.8, 9, wd).alias("signal"),
    )
    f4 = lambda c: F.floor(c * 1e4 + F.lit(0.5)) / 1e4  # noqa: E731
    return (
        sig.where(F.col("rn") >= 34)
        .select(
            "hr",
            f4(F.col("ema12")).alias("ema12"),
            f4(F.col("ema26")).alias("ema26"),
            f4(F.col("macd")).alias("macd"),
            f4(F.col("signal")).alias("signal"),
            f4(F.col("macd") - F.col("signal")).alias("histogram"),
        )
        .orderBy("hr")
    )


# ---------------------------------------------------------------------------
# W29 — Aroon indicator over a trailing 25-bar window: days since the
# 25-period high/low, tie broken to the MOST RECENT bar achieving the
# extreme (stated explicitly so both engines agree). Formulated as an
# rn-banded self-join (the a63 pattern — each anchor joins at most 25
# bars, a hard bound at any corpus size because the series is the
# one-row-per-day compaction), then a conditional max recovers the
# latest rn attaining the window extreme; double equality against the
# window max is exact because max returns one of the input values
# bit-for-bit. aroon_up = 100*(25-days_since_high)/25 = 4*(25-days),
# emitted as an exact INT.
# ---------------------------------------------------------------------------
@query(
    "w29_aroon",
    oracle=f"""
    WITH {_OHLC_SQL},
    ser AS (
        SELECT day, high, low, row_number() OVER (ORDER BY day) AS rn
        FROM bars
    ),
    pairs AS (
        SELECT a.day, a.rn, b.rn AS brn, b.high AS bhigh, b.low AS blow
        FROM ser a JOIN ser b
          ON b.rn BETWEEN a.rn - 24 AND a.rn
        WHERE a.rn >= 25
    ),
    ext AS (
        SELECT day, rn, max(bhigh) AS h25, min(blow) AS l25
        FROM pairs GROUP BY 1, 2
    ),
    arg AS (
        SELECT p.day, p.rn,
               max(CASE WHEN p.bhigh = e.h25 THEN p.brn END) AS hi_rn,
               max(CASE WHEN p.blow = e.l25 THEN p.brn END) AS lo_rn
        FROM pairs p JOIN ext e ON p.rn = e.rn
        GROUP BY 1, 2
    )
    SELECT day,
           CAST(rn - hi_rn AS INT) AS days_since_high,
           CAST(rn - lo_rn AS INT) AS days_since_low,
           CAST((25 - (rn - hi_rn)) * 4 AS INT) AS aroon_up,
           CAST((25 - (rn - lo_rn)) * 4 AS INT) AS aroon_down
    FROM arg ORDER BY day
    """,
)
def w29_aroon(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _daily_bars(spark, sf_dir)
    wd = Window.orderBy("day")
    base = bars.select(
        "day", "high", "low", F.row_number().over(wd).alias("rn")
    )
    a = base.alias("a")
    b = base.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("b.rn") >= F.col("a.rn") - 24)
            & (F.col("b.rn") <= F.col("a.rn")),
        )
        .where(F.col("a.rn") >= 25)
        .select(
            F.col("a.day").alias("day"),
            F.col("a.rn").alias("rn"),
            F.col("b.rn").alias("brn"),
            F.col("b.high").alias("bhigh"),
            F.col("b.low").alias("blow"),
        )
    )
    ext = pairs.groupBy("day", "rn").agg(
        F.max("bhigh").alias("h25"), F.min("blow").alias("l25")
    )
    arg = (
        pairs.join(ext.select("rn", "h25", "l25"), "rn")
        .groupBy("day", "rn")
        .agg(
            F.max(
                F.when(F.col("bhigh") == F.col("h25"), F.col("brn"))
            ).alias("hi_rn"),
            F.max(
                F.when(F.col("blow") == F.col("l25"), F.col("brn"))
            ).alias("lo_rn"),
        )
    )
    return arg.select(
        "day",
        (F.col("rn") - F.col("hi_rn")).cast("int").alias("days_since_high"),
        (F.col("rn") - F.col("lo_rn")).cast("int").alias("days_since_low"),
        ((25 - (F.col("rn") - F.col("hi_rn"))) * 4)
        .cast("int")
        .alias("aroon_up"),
        ((25 - (F.col("rn") - F.col("lo_rn"))) * 4)
        .cast("int")
        .alias("aroon_down"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# W30 — Ulcer index: per-bar percentage drawdown from the trailing
# 14-bar max close (a per-row double — identical on both engines), then
# UI = sqrt(mean of the 14 squared drawdowns), the squared terms
# DECIMAL-cast before the window sum. Two chained windows over the
# daily compaction; emitted once both are full (rn >= 27). Positive
# closes only (drawdown of a non-positive price series is undefined).
# ---------------------------------------------------------------------------
@query(
    "w30_ulcer_index",
    oracle=f"""
    WITH {_OHLC_SQL},
    ser AS (
        SELECT day, close, row_number() OVER (ORDER BY day) AS rn
        FROM bars WHERE close > 0
    ),
    dd AS (
        SELECT day, rn,
               100.0 * (close - max(close) OVER w14)
                     / max(close) OVER w14 AS ddown
        FROM ser
        WINDOW w14 AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    ),
    ui AS (
        SELECT day, rn, ddown,
               CAST(sum(CAST(ddown * ddown AS DECIMAL(27,10))) OVER w14
                    AS DOUBLE) / 14 AS msq,
               count(*) OVER w14 AS n
        FROM dd
        WINDOW w14 AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT day,
           floor(ddown * 1e6 + 0.5) / 1e6 AS drawdown_pct,
           floor(sqrt(msq) * 1e6 + 0.5) / 1e6 AS ulcer_index
    FROM ui WHERE rn >= 27 AND n = 14
    ORDER BY day
    """,
)
def w30_ulcer_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _daily_bars(spark, sf_dir).where(F.col("close") > 0)
    wd = Window.orderBy("day")
    w14 = Window.orderBy("day").rowsBetween(-13, 0)
    base = bars.select("day", "close", F.row_number().over(wd).alias("rn"))
    mx = F.max("close").over(w14)
    dd = base.select(
        "day",
        "rn",
        (100.0 * (F.col("close") - mx) / mx).alias("ddown"),
    )
    ui = dd.select(
        "day",
        "rn",
        "ddown",
        (
            F.sum(
                (F.col("ddown") * F.col("ddown")).cast("decimal(27,10)")
            )
            .over(w14)
            .cast("double")
            / 14
        ).alias("msq"),
        F.count(F.lit(1)).over(w14).alias("n"),
    )
    f6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return (
        ui.where((F.col("rn") >= 27) & (F.col("n") == 14))
        .select(
            "day",
            f6(F.col("ddown")).alias("drawdown_pct"),
            f6(F.sqrt(F.col("msq"))).alias("ulcer_index"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# W31 — on-balance volume: cumulative signed daily event volume, the
# sign taken from the close-to-close direction. All-integer arithmetic
# (BIGINT volume × {-1,0,+1}, cumulative BIGINT sum) — exact at any
# scale and order-independent. The first bar contributes 0 (no prior
# close). Joins the two per-day compactions on the day key.
# ---------------------------------------------------------------------------
@query(
    "w31_obv",
    oracle=f"""
    WITH {_OHLC_SQL},
    {_VOL_SQL},
    seq AS (
        SELECT b.day, b.close, v.vol,
               lag(b.close) OVER (ORDER BY b.day) AS pc
        FROM bars b JOIN vol v ON b.day = v.day
    ),
    signed AS (
        SELECT day, vol,
               CASE WHEN pc IS NULL OR close = pc THEN 0
                    WHEN close > pc THEN 1 ELSE -1 END AS direction
        FROM seq
    )
    SELECT day, CAST(direction AS INT) AS direction, vol,
           CAST(sum(direction * vol) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS obv
    FROM signed ORDER BY day
    """,
)
def w31_obv(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _daily_bars(spark, sf_dir)
    vol = _daily_volume(spark, sf_dir)
    wd = Window.orderBy("day")
    seq = bars.join(vol, "day").select(
        "day", "close", "vol", F.lag("close").over(wd).alias("pc")
    )
    signed = seq.select(
        "day",
        "vol",
        F.when(F.col("pc").isNull() | (F.col("close") == F.col("pc")), 0)
        .when(F.col("close") > F.col("pc"), 1)
        .otherwise(-1)
        .alias("direction"),
    )
    wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return signed.select(
        "day",
        F.col("direction").cast("int").alias("direction"),
        "vol",
        F.sum(F.col("direction") * F.col("vol"))
        .over(wc)
        .cast("long")
        .alias("obv"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# W32 — Chaikin money flow over 20 bars: money-flow multiplier
# ((C-L)-(H-C))/(H-L) (0 when H=L, stated identically in both engines),
# money-flow volume = multiplier × BIGINT day volume, CMF = Σ20 MFV /
# Σ20 vol with the MFV terms DECIMAL-cast before the window sum and the
# volume sum exact BIGINT. Same two-compaction join + one window plan
# as w31.
# ---------------------------------------------------------------------------
@query(
    "w32_chaikin_money_flow",
    oracle=f"""
    WITH {_OHLC_SQL},
    {_VOL_SQL},
    mf AS (
        SELECT b.day, v.vol,
               CASE WHEN b.high = b.low THEN 0.0
                    ELSE ((b.close - b.low) - (b.high - b.close))
                         / (b.high - b.low) END AS mfm
        FROM bars b JOIN vol v ON b.day = v.day
    ),
    win AS (
        SELECT day,
               floor(mfm * 1e6 + 0.5) / 1e6 AS mfm,
               CAST(sum(CAST(mfm * vol AS DECIMAL(27,8))) OVER w20
                    AS DOUBLE) AS mfv20,
               CAST(sum(vol) OVER w20 AS BIGINT) AS vol20,
               count(*) OVER w20 AS n
        FROM mf
        WINDOW w20 AS (ORDER BY day ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT day, mfm, vol20,
           floor(mfv20 / vol20 * 1e6 + 0.5) / 1e6 AS cmf
    FROM win WHERE n = 20 ORDER BY day
    """,
)
def w32_chaikin_money_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _daily_bars(spark, sf_dir)
    vol = _daily_volume(spark, sf_dir)
    mf = bars.join(vol, "day").select(
        "day",
        "vol",
        F.when(F.col("high") == F.col("low"), F.lit(0.0))
        .otherwise(
            ((F.col("close") - F.col("low")) - (F.col("high") - F.col("close")))
            / (F.col("high") - F.col("low"))
        )
        .alias("mfm"),
    )
    w20 = Window.orderBy("day").rowsBetween(-19, 0)
    f6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    win = mf.select(
        "day",
        f6(F.col("mfm")).alias("mfm"),
        F.sum((F.col("mfm") * F.col("vol")).cast("decimal(27,8)"))
        .over(w20)
        .cast("double")
        .alias("mfv20"),
        F.sum("vol").over(w20).cast("long").alias("vol20"),
        F.count(F.lit(1)).over(w20).alias("n"),
    )
    return (
        win.where(F.col("n") == 20)
        .select(
            "day",
            "mfm",
            "vol20",
            f6(F.col("mfv20") / F.col("vol20")).alias("cmf"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# W33 — Commodity Channel Index over 20 bars: CCI = (tp − SMA20(tp)) /
# (0.015 · MD20), where MD20 is the mean absolute deviation of the 20
# trailing typical prices from THAT window's SMA. MD is not
# decomposable into running sums (each window's deviations reference
# the window's own mean), so it is formulated as the w29/a63 rn-banded
# self-join on the one-row-per-day compaction — each anchor joins at
# most 20 bars, a hard bound at any corpus size — in two grouped
# passes (SMA, then deviations against it). Cross-row additions go
# through DECIMAL(27,8) so both engines accumulate exactly.
# Reference capability: rolling z-score-family indicators over event
# streams (reference repo has no analytics surface; engine mandate).
# ---------------------------------------------------------------------------
@query(
    "w33_cci",
    oracle=f"""
    WITH {_OHLC_SQL},
    tp AS (
        SELECT day, (high + low + close) / 3 AS tp,
               row_number() OVER (ORDER BY day) AS rn
        FROM bars
    ),
    pairs AS (
        SELECT a.day, a.tp, a.rn, b.tp AS btp
        FROM tp a JOIN tp b ON a.rn - b.rn BETWEEN 0 AND 19
    ),
    sma AS (
        SELECT day, max(tp) AS tp, max(rn) AS rn,
               CAST(sum(CAST(btp AS DECIMAL(27,8))) AS DOUBLE) / 20 AS sma20,
               count(*) AS n
        FROM pairs GROUP BY day
    ),
    md AS (
        SELECT p.day, s.tp, s.sma20,
               CAST(sum(CAST(abs(p.btp - s.sma20) AS DECIMAL(27,8)))
                    AS DOUBLE) / 20 AS md20
        FROM pairs p JOIN sma s ON p.day = s.day AND s.n = 20
        GROUP BY p.day, s.tp, s.sma20
    )
    SELECT day,
           floor(sma20 * 1e4 + 0.5) / 1e4 AS sma20,
           floor(md20 * 1e4 + 0.5) / 1e4 AS md20,
           floor((tp - sma20) / (0.015 * md20) * 1e4 + 0.5) / 1e4 AS cci
    FROM md WHERE md20 <> 0
    ORDER BY day
    """,
)
def w33_cci(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _daily_bars(spark, sf_dir)
    wd = Window.orderBy("day")
    tp = bars.select(
        "day",
        ((F.col("high") + F.col("low") + F.col("close")) / 3).alias("tp"),
        F.row_number().over(wd).alias("rn"),
    )
    a, b = tp.alias("a"), tp.alias("b")
    pairs = a.join(
        b,
        (F.col("a.rn") - F.col("b.rn") >= 0)
        & (F.col("a.rn") - F.col("b.rn") <= 19),
    ).select(
        F.col("a.day").alias("day"),
        F.col("a.tp").alias("tp"),
        F.col("b.tp").alias("btp"),
    )
    sma = pairs.groupBy("day").agg(
        F.max("tp").alias("tp"),
        (
            F.sum(F.col("btp").cast("decimal(27,8)")).cast("double") / 20
        ).alias("sma20"),
        F.count(F.lit(1)).alias("n"),
    )
    md = (
        pairs.join(
            sma.where(F.col("n") == 20).select("day", "sma20"),
            "day",
        )
        .groupBy("day", "tp", "sma20")
        .agg(
            (
                F.sum(
                    F.abs(F.col("btp") - F.col("sma20")).cast(
                        "decimal(27,8)"
                    )
                ).cast("double")
                / 20
            ).alias("md20")
        )
    )
    f4 = lambda c: F.floor(c * 1e4 + F.lit(0.5)) / 1e4  # noqa: E731
    return (
        md.where(F.col("md20") != 0)
        .select(
            "day",
            f4(F.col("sma20")).alias("sma20"),
            f4(F.col("md20")).alias("md20"),
            f4(
                (F.col("tp") - F.col("sma20"))
                / (0.015 * F.col("md20"))
            ).alias("cci"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# W34 — Williams %R over 14 bars: −100 · (HH14 − C) / (HH14 − LL14).
# Pure trailing-window min/max over the daily compaction (no joins,
# no state). Flat channels (HH = LL) are emitted by NEITHER engine —
# the indicator is undefined there; the guard is stated identically.
# ---------------------------------------------------------------------------
@query(
    "w34_williams_r",
    oracle=f"""
    WITH {_OHLC_SQL},
    chan AS (
        SELECT day, close,
               max(high) OVER w14 AS hh,
               min(low) OVER w14 AS ll,
               count(*) OVER w14 AS n
        FROM bars
        WINDOW w14 AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT day,
           floor(hh * 1e4 + 0.5) / 1e4 AS hh14,
           floor(ll * 1e4 + 0.5) / 1e4 AS ll14,
           floor(-100 * (hh - close) / (hh - ll) * 1e4 + 0.5) / 1e4
               AS williams_r
    FROM chan WHERE n = 14 AND hh <> ll
    ORDER BY day
    """,
)
def w34_williams_r(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _daily_bars(spark, sf_dir)
    w14 = Window.orderBy("day").rowsBetween(-13, 0)
    chan = bars.select(
        "day",
        "close",
        F.max("high").over(w14).alias("hh"),
        F.min("low").over(w14).alias("ll"),
        F.count(F.lit(1)).over(w14).alias("n"),
    )
    f4 = lambda c: F.floor(c * 1e4 + F.lit(0.5)) / 1e4  # noqa: E731
    return (
        chan.where((F.col("n") == 14) & (F.col("hh") != F.col("ll")))
        .select(
            "day",
            f4(F.col("hh")).alias("hh14"),
            f4(F.col("ll")).alias("ll14"),
            f4(
                F.lit(-100)
                * (F.col("hh") - F.col("close"))
                / (F.col("hh") - F.col("ll"))
            ).alias("williams_r"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# W35 — Money Flow Index over 14 bars: typical-price money flow
# (tp · volume) split into positive/negative by tp vs previous tp
# (ties flow to neither side), 14-bar DECIMAL-summed flows, MFI =
# 100 · pos / (pos + neg). Same two-compaction broadcast day-join as
# w31/w32. The first bar (no previous tp) contributes to neither sum
# — both engines state the CASE identically — and the row set starts
# at rn 15 so every window holds 14 fully-defined directional terms.
# ---------------------------------------------------------------------------
@query(
    "w35_mfi",
    oracle=f"""
    WITH {_OHLC_SQL},
    {_VOL_SQL},
    tp AS (
        SELECT b.day, (b.high + b.low + b.close) / 3 AS tp, v.vol,
               row_number() OVER (ORDER BY b.day) AS rn
        FROM bars b JOIN vol v ON b.day = v.day
    ),
    flow AS (
        SELECT day, rn,
               CASE WHEN tp > lag(tp) OVER w THEN tp * vol ELSE 0 END AS pos,
               CASE WHEN tp < lag(tp) OVER w THEN tp * vol ELSE 0 END AS neg
        FROM tp
        WINDOW w AS (ORDER BY day)
    ),
    s AS (
        SELECT day, rn,
               CAST(sum(CAST(pos AS DECIMAL(27,8))) OVER w14 AS DOUBLE)
                   AS pos14,
               CAST(sum(CAST(neg AS DECIMAL(27,8))) OVER w14 AS DOUBLE)
                   AS neg14
        FROM flow
        WINDOW w14 AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT day,
           floor(pos14 * 1e4 + 0.5) / 1e4 AS pos14,
           floor(neg14 * 1e4 + 0.5) / 1e4 AS neg14,
           floor(100 * pos14 / (pos14 + neg14) * 1e4 + 0.5) / 1e4 AS mfi
    FROM s WHERE rn >= 15 AND pos14 + neg14 <> 0
    ORDER BY day
    """,
)
def w35_mfi(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _daily_bars(spark, sf_dir)
    vol = _daily_volume(spark, sf_dir)
    wd = Window.orderBy("day")
    w14 = Window.orderBy("day").rowsBetween(-13, 0)
    tp = bars.join(vol, "day").select(
        "day",
        ((F.col("high") + F.col("low") + F.col("close")) / 3).alias("tp"),
        "vol",
        F.row_number().over(wd).alias("rn"),
    )
    flow = tp.select(
        "day",
        "rn",
        F.when(
            F.col("tp") > F.lag("tp").over(wd), F.col("tp") * F.col("vol")
        )
        .otherwise(F.lit(0.0))
        .alias("pos"),
        F.when(
            F.col("tp") < F.lag("tp").over(wd), F.col("tp") * F.col("vol")
        )
        .otherwise(F.lit(0.0))
        .alias("neg"),
    )
    s = flow.select(
        "day",
        "rn",
        F.sum(F.col("pos").cast("decimal(27,8)"))
        .over(w14)
        .cast("double")
        .alias("pos14"),
        F.sum(F.col("neg").cast("decimal(27,8)"))
        .over(w14)
        .cast("double")
        .alias("neg14"),
    )
    f4 = lambda c: F.floor(c * 1e4 + F.lit(0.5)) / 1e4  # noqa: E731
    return (
        s.where(
            (F.col("rn") >= 15)
            & (F.col("pos14") + F.col("neg14") != 0)
        )
        .select(
            "day",
            f4(F.col("pos14")).alias("pos14"),
            f4(F.col("neg14")).alias("neg14"),
            f4(
                F.lit(100)
                * F.col("pos14")
                / (F.col("pos14") + F.col("neg14"))
            ).alias("mfi"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# W36 — TRIX on the hourly closes: 1-bar rate of change of a TRIPLE
# 9-period EMA, each stage the same truncated-lag-polynomial the
# w9/w27/w28 family uses (a FIXED per-row expression — both engines
# evaluate the identical IEEE sequence; no recursive state). Stage k's
# polynomial reads stage k−1's projected column, so every value at
# rn ≥ 25 has all 3×8 lag terms defined; the ROC needs one more bar
# (rn ≥ 26). Emitted in basis points, floor-1e4-rounded.
# ---------------------------------------------------------------------------
@query(
    "w36_trix",
    oracle=f"""
    WITH {_HCLOSE_SQL},
    ser AS (
        SELECT hr, close, row_number() OVER (ORDER BY hr) AS rn
        FROM hser
    ),
    e1 AS (
        SELECT hr, rn, {_ema_poly_sql("close", "0.8", 9)} AS ema1
        FROM ser WINDOW w AS (ORDER BY hr)
    ),
    e2 AS (
        SELECT hr, rn, ema1, {_ema_poly_sql("ema1", "0.8", 9)} AS ema2
        FROM e1 WINDOW w AS (ORDER BY hr)
    ),
    e3 AS (
        SELECT hr, rn, ema2, {_ema_poly_sql("ema2", "0.8", 9)} AS ema3
        FROM e2 WINDOW w AS (ORDER BY hr)
    ),
    roc AS (
        SELECT hr, rn, ema3, lag(ema3) OVER (ORDER BY hr) AS pe3
        FROM e3
    )
    SELECT hr,
           floor(ema3 * 1e4 + 0.5) / 1e4 AS ema3,
           floor(10000 * (ema3 - pe3) / pe3 * 1e4 + 0.5) / 1e4 AS trix_bp
    FROM roc WHERE rn >= 26 AND pe3 <> 0
    ORDER BY hr
    """,
)
def w36_trix(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _hourly_close(spark, sf_dir)
    wd = Window.orderBy("hr")
    ser = bars.select("hr", "close", F.row_number().over(wd).alias("rn"))
    e1 = ser.select(
        "hr", "rn", _ema_poly_spark("close", 0.8, 9, wd).alias("ema1")
    )
    e2 = e1.select(
        "hr", "rn", _ema_poly_spark("ema1", 0.8, 9, wd).alias("ema2")
    )
    e3 = e2.select(
        "hr", "rn", _ema_poly_spark("ema2", 0.8, 9, wd).alias("ema3")
    )
    roc = e3.select(
        "hr", "rn", "ema3", F.lag("ema3").over(wd).alias("pe3")
    )
    f4 = lambda c: F.floor(c * 1e4 + F.lit(0.5)) / 1e4  # noqa: E731
    return (
        roc.where((F.col("rn") >= 26) & (F.col("pe3") != 0))
        .select(
            "hr",
            f4(F.col("ema3")).alias("ema3"),
            f4(
                F.lit(10000)
                * (F.col("ema3") - F.col("pe3"))
                / F.col("pe3")
            ).alias("trix_bp"),
        )
        .orderBy("hr")
    )


# ---------------------------------------------------------------------------
# W37 — Vortex indicator over 14 bars: VI+ = Σ14|H − prevL| / Σ14 TR,
# VI− = Σ14|L − prevH| / Σ14 TR, TR the usual true range against the
# previous close. One lag pass + three DECIMAL-summed trailing windows
# over the daily compaction; rows start at rn 15 so every window holds
# 14 fully-defined lag terms. Zero total true range (14 flat bars) is
# undefined on both engines.
# ---------------------------------------------------------------------------
@query(
    "w37_vortex",
    oracle=f"""
    WITH {_OHLC_SQL},
    lagged AS (
        SELECT day, high, low,
               lag(high) OVER w AS ph,
               lag(low) OVER w AS pl,
               lag(close) OVER w AS pc,
               row_number() OVER w AS rn
        FROM bars
        WINDOW w AS (ORDER BY day)
    ),
    terms AS (
        SELECT day, rn,
               abs(high - pl) AS vmp,
               abs(low - ph) AS vmm,
               greatest(high - low, abs(high - pc), abs(low - pc)) AS tr
        FROM lagged
    ),
    s AS (
        SELECT day, rn,
               CAST(sum(CAST(vmp AS DECIMAL(27,8))) OVER w14 AS DOUBLE)
                   AS vmp14,
               CAST(sum(CAST(vmm AS DECIMAL(27,8))) OVER w14 AS DOUBLE)
                   AS vmm14,
               CAST(sum(CAST(tr AS DECIMAL(27,8))) OVER w14 AS DOUBLE)
                   AS tr14
        FROM terms
        WINDOW w14 AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT day,
           floor(tr14 * 1e4 + 0.5) / 1e4 AS tr14,
           floor(vmp14 / tr14 * 1e4 + 0.5) / 1e4 AS vi_plus,
           floor(vmm14 / tr14 * 1e4 + 0.5) / 1e4 AS vi_minus
    FROM s WHERE rn >= 15 AND tr14 <> 0
    ORDER BY day
    """,
)
def w37_vortex(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _daily_bars(spark, sf_dir)
    wd = Window.orderBy("day")
    w14 = Window.orderBy("day").rowsBetween(-13, 0)
    lagged = bars.select(
        "day",
        "high",
        "low",
        F.lag("high").over(wd).alias("ph"),
        F.lag("low").over(wd).alias("pl"),
        F.lag("close").over(wd).alias("pc"),
        F.row_number().over(wd).alias("rn"),
    )
    terms = lagged.select(
        "day",
        "rn",
        F.abs(F.col("high") - F.col("pl")).alias("vmp"),
        F.abs(F.col("low") - F.col("ph")).alias("vmm"),
        F.greatest(
            F.col("high") - F.col("low"),
            F.abs(F.col("high") - F.col("pc")),
            F.abs(F.col("low") - F.col("pc")),
        ).alias("tr"),
    )
    s = terms.select(
        "day",
        "rn",
        F.sum(F.col("vmp").cast("decimal(27,8)"))
        .over(w14)
        .cast("double")
        .alias("vmp14"),
        F.sum(F.col("vmm").cast("decimal(27,8)"))
        .over(w14)
        .cast("double")
        .alias("vmm14"),
        F.sum(F.col("tr").cast("decimal(27,8)"))
        .over(w14)
        .cast("double")
        .alias("tr14"),
    )
    f4 = lambda c: F.floor(c * 1e4 + F.lit(0.5)) / 1e4  # noqa: E731
    return (
        s.where((F.col("rn") >= 15) & (F.col("tr14") != 0))
        .select(
            "day",
            f4(F.col("tr14")).alias("tr14"),
            f4(F.col("vmp14") / F.col("tr14")).alias("vi_plus"),
            f4(F.col("vmm14") / F.col("tr14")).alias("vi_minus"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# W38 — Elder's force index: FI(1) = (close − prev close) · volume,
# smoothed by a 13-period EMA (the truncated-lag polynomial, decay
# 12/14 = 6/7). Two-compaction broadcast day-join (w31 pattern);
# FI(1) is defined from rn 2, so rn ≥ 14 guarantees all 13 lag terms.
# ---------------------------------------------------------------------------
@query(
    "w38_force_index",
    oracle=f"""
    WITH {_OHLC_SQL},
    {_VOL_SQL},
    seq AS (
        SELECT b.day, b.close, v.vol,
               lag(b.close) OVER w AS pc,
               row_number() OVER w AS rn
        FROM bars b JOIN vol v ON b.day = v.day
        WINDOW w AS (ORDER BY b.day)
    ),
    fi AS (
        SELECT day, rn, (close - pc) * vol AS fi1
        FROM seq
    ),
    ema AS (
        SELECT day, rn, fi1, {_ema_poly_sql("fi1", "6.0/7.0", 13)} AS fi13
        FROM fi WINDOW w AS (ORDER BY day)
    )
    SELECT day,
           floor(fi1 * 1e4 + 0.5) / 1e4 AS fi1,
           floor(fi13 * 1e4 + 0.5) / 1e4 AS fi13
    FROM ema WHERE rn >= 14
    ORDER BY day
    """,
)
def w38_force_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _daily_bars(spark, sf_dir)
    vol = _daily_volume(spark, sf_dir)
    wd = Window.orderBy("day")
    seq = bars.join(vol, "day").select(
        "day",
        "close",
        "vol",
        F.lag("close").over(wd).alias("pc"),
        F.row_number().over(wd).alias("rn"),
    )
    fi = seq.select(
        "day",
        "rn",
        ((F.col("close") - F.col("pc")) * F.col("vol")).alias("fi1"),
    )
    ema = fi.select(
        "day",
        "rn",
        "fi1",
        _ema_poly_spark("fi1", 6.0 / 7.0, 13, wd).alias("fi13"),
    )
    f4 = lambda c: F.floor(c * 1e4 + F.lit(0.5)) / 1e4  # noqa: E731
    return (
        ema.where(F.col("rn") >= 14)
        .select(
            "day",
            f4(F.col("fi1")).alias("fi1"),
            f4(F.col("fi13")).alias("fi13"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# W39 — Elder-ray bull/bear power: high − EMA13(close) and
# low − EMA13(close) on the daily compaction (13-term lag polynomial,
# decay 6/7). Pure window expressions, no join, no state.
# ---------------------------------------------------------------------------
@query(
    "w39_elder_ray",
    oracle=f"""
    WITH {_OHLC_SQL},
    ser AS (
        SELECT day, high, low, close, row_number() OVER (ORDER BY day) AS rn
        FROM bars
    ),
    ema AS (
        SELECT day, rn, high, low,
               {_ema_poly_sql("close", "6.0/7.0", 13)} AS ema13
        FROM ser WINDOW w AS (ORDER BY day)
    )
    SELECT day,
           floor(ema13 * 1e4 + 0.5) / 1e4 AS ema13,
           floor((high - ema13) * 1e4 + 0.5) / 1e4 AS bull_power,
           floor((low - ema13) * 1e4 + 0.5) / 1e4 AS bear_power
    FROM ema WHERE rn >= 13
    ORDER BY day
    """,
)
def w39_elder_ray(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _daily_bars(spark, sf_dir)
    wd = Window.orderBy("day")
    ser = bars.select(
        "day", "high", "low", "close", F.row_number().over(wd).alias("rn")
    )
    ema = ser.select(
        "day",
        "rn",
        "high",
        "low",
        _ema_poly_spark("close", 6.0 / 7.0, 13, wd).alias("ema13"),
    )
    f4 = lambda c: F.floor(c * 1e4 + F.lit(0.5)) / 1e4  # noqa: E731
    return (
        ema.where(F.col("rn") >= 13)
        .select(
            "day",
            f4(F.col("ema13")).alias("ema13"),
            f4(F.col("high") - F.col("ema13")).alias("bull_power"),
            f4(F.col("low") - F.col("ema13")).alias("bear_power"),
        )
        .orderBy("day")
    )
