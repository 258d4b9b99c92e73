"""Financial-risk operators: VaR/CVaR, Sharpe/Sortino, CAPM beta,
amortization schedules, roll-rate matrices, day-count interest accrual,
FX triangulation, ECL staging, liquidity ladders, and contribution
margins.

The reference system (``/root/reference/dock_etl_pipelines`` — Airflow
DAGs moving balance-report/account-statement files) publishes financial
reports downstream; these operators are the analytics a finance/risk
team runs ON that data, re-expressed as Spark DataFrame plans with
DuckDB twin oracles (the engine mandate — the reference itself has no
query surface).

Cross-engine exactness follows the registry conventions: per-row
arithmetic stays in IEEE doubles (identical on both engines), every
cross-row sum goes through a per-row DECIMAL cast, libm-dependent
constants enter as shared literals, and order statistics are rank-based
(never interpolation-formula-dependent) wherever a threshold feeds a
membership test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dock_financial_data_pipelines_spark.catalog import load, local_frame, maybe_broadcast
from dock_financial_data_pipelines_spark.registry import query


def _dec(col, s: int):
    return F.sum(col.cast(f"decimal(27,{s})")).cast("double")


def _r6(col):
    return F.floor(col * 1e6 + F.lit(0.5)) / 1e6


_SEG_RETURNS_SQL = """
    daily AS (
        SELECT c.c_mktsegment AS seg,
               strftime(o.o_orderdate, '%Y-%m-%d') AS day,
               CAST(sum(CAST(o.o_totalprice AS DECIMAL(27,2))) AS DOUBLE)
                   AS rev
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ),
    rets AS (
        SELECT seg, day,
               (rev - lag(rev) OVER (PARTITION BY seg ORDER BY day))
                   / lag(rev) OVER (PARTITION BY seg ORDER BY day) AS r
        FROM daily
    ),
    rets2 AS (SELECT seg, day, r FROM rets WHERE r IS NOT NULL)
"""


def _seg_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment daily revenue simple returns (the shared CTE twin)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    daily = (
        o.join(maybe_broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(27,2)"))
            .cast("double")
            .alias("rev")
        )
    )
    w = Window.partitionBy("seg").orderBy("day")
    return (
        daily.select(
            "seg",
            "day",
            ((F.col("rev") - F.lag("rev").over(w)) / F.lag("rev").over(w)).alias(
                "r"
            ),
        )
        .where(F.col("r").isNotNull())
    )


# ---------------------------------------------------------------------------
# q_var_cvar — historical Value-at-Risk and Conditional VaR (expected
# shortfall) of per-segment daily revenue returns at 95%. Rank-based
# formulation: k = ceil(0.05·n) worst returns; VaR95 = the k-th worst
# (an exact order statistic — deliberately NOT an interpolated
# quantile, because the CVaR membership test must not depend on two
# engines' interpolation formulas agreeing in the last ulp); CVaR95 =
# the mean of those k (decimal-exact sum). Ties at the boundary break
# by day, so membership is a total order. The tail selection is a
# per-segment window over the calendar-bounded daily series — never a
# global sort of the fact table.
# ---------------------------------------------------------------------------
@query(
    "q_var_cvar",
    oracle=f"""
    WITH {_SEG_RETURNS_SQL},
    ranked AS (
        SELECT seg, day, r,
               row_number() OVER (PARTITION BY seg ORDER BY r, day) AS rn,
               count(*) OVER (PARTITION BY seg) AS n
        FROM rets2
    ),
    tail AS (
        SELECT seg, r, rn, n, CAST(ceil(0.05 * n) AS BIGINT) AS k
        FROM ranked WHERE rn <= CAST(ceil(0.05 * n) AS BIGINT)
    )
    SELECT seg,
           CAST(max(n) AS BIGINT) AS n_days,
           CAST(max(k) AS BIGINT) AS k_tail,
           floor(max(CASE WHEN rn = k THEN r END) * 1e6 + 0.5) / 1e6
               AS var95,
           floor(CAST(sum(CAST(r AS DECIMAL(27,9))) AS DOUBLE) / max(k)
                 * 1e6 + 0.5) / 1e6 AS cvar95
    FROM tail GROUP BY seg ORDER BY seg
    """,
)
def q_var_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    rets = _seg_returns(spark, sf_dir)
    w = Window.partitionBy("seg").orderBy("r", "day")
    ranked = rets.select(
        "seg",
        "r",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("seg")).alias("n"),
    )
    k = F.ceil(0.05 * F.col("n")).cast("long")
    tail = ranked.where(F.col("rn") <= k).select(
        "seg", "r", "rn", "n", k.alias("k")
    )
    return (
        tail.groupBy("seg")
        .agg(
            F.max("n").cast("long").alias("n_days"),
            F.max("k").cast("long").alias("k_tail"),
            _r6(F.max(F.when(F.col("rn") == F.col("k"), F.col("r")))).alias(
                "var95"
            ),
            _r6(_dec(F.col("r"), 9) / F.max("k")).alias("cvar95"),
        )
        .orderBy("seg")
    )


# ---------------------------------------------------------------------------
# q_sharpe_sortino — per-segment annualized Sharpe and Sortino ratios
# of daily revenue returns (zero risk-free): mean/std and
# mean/downside-std scaled by √252. All moments are DECIMAL-exact
# sums; the downside second moment sums only negative returns (count
# via count(CASE), the zero-on-empty idiom). Segments whose return
# variance is zero emit no row (undefined ratio — the a56 contract).
# ---------------------------------------------------------------------------
@query(
    "q_sharpe_sortino",
    oracle=f"""
    WITH {_SEG_RETURNS_SQL},
    m AS (
        SELECT seg,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(CAST(r AS DECIMAL(27,9))) AS DOUBLE) AS s,
               CAST(sum(CAST(r * r AS DECIMAL(27,12))) AS DOUBLE) AS q,
               CAST(sum(CAST(CASE WHEN r < 0 THEN r * r END
                             AS DECIMAL(27,12))) AS DOUBLE) AS qd,
               CAST(count(CASE WHEN r < 0 THEN 1 END) AS DOUBLE) AS nd
        FROM rets2 GROUP BY 1
    )
    SELECT seg, CAST(n AS BIGINT) AS n_days,
           floor(s / n * 1e6 + 0.5) / 1e6 AS mean_ret,
           floor(sqrt((q - s * s / n) / (n - 1)) * 1e6 + 0.5) / 1e6
               AS std_ret,
           floor(s / n / sqrt((q - s * s / n) / (n - 1)) * sqrt(252.0)
                 * 1e6 + 0.5) / 1e6 AS sharpe_annual,
           CASE WHEN nd > 0 AND qd > 0
                THEN floor(s / n / sqrt(qd / nd) * sqrt(252.0) * 1e6 + 0.5)
                     / 1e6 END AS sortino_annual
    FROM m
    WHERE n >= 2 AND q - s * s / n > 0
    ORDER BY seg
    """,
)
def q_sharpe_sortino(spark: SparkSession, sf_dir: str) -> DataFrame:
    rets = _seg_returns(spark, sf_dir)
    r = F.col("r")
    m = rets.groupBy("seg").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        _dec(r, 9).alias("s"),
        _dec(r * r, 12).alias("q"),
        _dec(F.when(r < 0, r * r), 12).alias("qd"),
        F.count(F.when(r < 0, F.lit(1))).cast("double").alias("nd"),
    )
    n, s, q = F.col("n"), F.col("s"), F.col("q")
    qd, nd = F.col("qd"), F.col("nd")
    std = F.sqrt((q - s * s / n) / (n - 1))
    return (
        m.where((n >= 2) & (q - s * s / n > 0))
        .select(
            "seg",
            n.cast("long").alias("n_days"),
            _r6(s / n).alias("mean_ret"),
            _r6(std).alias("std_ret"),
            _r6(s / n / std * F.sqrt(F.lit(252.0))).alias("sharpe_annual"),
            F.when(
                (nd > 0) & (qd > 0),
                _r6(s / n / F.sqrt(qd / nd) * F.sqrt(F.lit(252.0))),
            ).alias("sortino_annual"),
        )
        .orderBy("seg")
    )


# ---------------------------------------------------------------------------
# q_beta_capm — CAPM beta/alpha of each segment's daily returns
# against the "market" (all-segment total revenue) return series:
# β = cov(r_seg, r_mkt)/var(r_mkt), α = mean(r_seg) − β·mean(r_mkt).
# The market series aggregates the same daily frame once and joins
# back by day (broadcast — the daily series is calendar-bounded); all
# second moments accumulate as per-row DECIMAL casts. The
# concentration/diversification screen for a portfolio of segments.
# ---------------------------------------------------------------------------
@query(
    "q_beta_capm",
    oracle=f"""
    WITH {_SEG_RETURNS_SQL},
    mdaily AS (
        SELECT day,
               CAST(sum(CAST(rev AS DECIMAL(27,2))) AS DOUBLE) AS mrev
        FROM daily GROUP BY 1
    ),
    mrets AS (
        SELECT day,
               (mrev - lag(mrev) OVER (ORDER BY day))
                   / lag(mrev) OVER (ORDER BY day) AS rm
        FROM mdaily
    ),
    joined AS (
        SELECT s.seg, s.r, m.rm
        FROM rets2 s JOIN mrets m ON s.day = m.day
        WHERE m.rm IS NOT NULL
    ),
    mom AS (
        SELECT seg,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(CAST(r AS DECIMAL(27,9))) AS DOUBLE) AS sr,
               CAST(sum(CAST(rm AS DECIMAL(27,9))) AS DOUBLE) AS sm,
               CAST(sum(CAST(r * rm AS DECIMAL(27,12))) AS DOUBLE) AS srm,
               CAST(sum(CAST(rm * rm AS DECIMAL(27,12))) AS DOUBLE) AS smm
        FROM joined GROUP BY 1
    )
    SELECT seg, CAST(n AS BIGINT) AS n_days,
           floor((n * srm - sr * sm) / (n * smm - sm * sm) * 1e6 + 0.5)
               / 1e6 AS beta,
           floor((sr / n - (n * srm - sr * sm) / (n * smm - sm * sm)
                  * sm / n) * 1e6 + 0.5) / 1e6 AS alpha
    FROM mom WHERE n >= 2 AND n * smm - sm * sm <> 0
    ORDER BY seg
    """,
)
def q_beta_capm(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    daily = (
        o.join(maybe_broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(27,2)"))
            .cast("double")
            .alias("rev")
        )
    )
    ws = Window.partitionBy("seg").orderBy("day")
    rets = daily.select(
        "seg",
        "day",
        ((F.col("rev") - F.lag("rev").over(ws)) / F.lag("rev").over(ws)).alias(
            "r"
        ),
    ).where(F.col("r").isNotNull())
    mdaily = daily.groupBy("day").agg(
        F.sum(F.col("rev").cast("decimal(27,2)")).cast("double").alias("mrev")
    )
    wm = Window.orderBy("day")
    mrets = mdaily.select(
        "day",
        (
            (F.col("mrev") - F.lag("mrev").over(wm))
            / F.lag("mrev").over(wm)
        ).alias("rm"),
    ).where(F.col("rm").isNotNull())
    joined = rets.join(F.broadcast(mrets), "day").select("seg", "r", "rm")
    r, rm = F.col("r"), F.col("rm")
    mom = joined.groupBy("seg").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        _dec(r, 9).alias("sr"),
        _dec(rm, 9).alias("sm"),
        _dec(r * rm, 12).alias("srm"),
        _dec(rm * rm, 12).alias("smm"),
    )
    n, sr, sm = F.col("n"), F.col("sr"), F.col("sm")
    srm, smm = F.col("srm"), F.col("smm")
    beta = (n * srm - sr * sm) / (n * smm - sm * sm)
    return (
        mom.where((n >= 2) & (n * smm - sm * sm != 0))
        .select(
            "seg",
            n.cast("long").alias("n_days"),
            _r6(beta).alias("beta"),
            _r6(sr / n - beta * sm / n).alias("alpha"),
        )
        .orderBy("seg")
    )


# ---------------------------------------------------------------------------
# q_amortization_schedule — 12-period level-payment amortization of a
# loan sized at each region's average order value (1%/period). The
# growth factors (1.01)^t enter as a shared 12-row literal table (the
# q_npv idiom — keeps libm pow() out of cross-engine arithmetic);
# payment and per-period balances are closed-form expressions on the
# exact-moment principal, so the schedule needs no recursion: one
# region aggregate, one 12-row broadcast join.
#   payment = P·i·g_n/(g_n − 1);  balance_t = P·g_t − payment·(g_t − 1)/i
# ---------------------------------------------------------------------------
_AMORT_RATE = 0.01
_AMORT_G = [
    (1, 1.01),
    (2, 1.0201),
    (3, 1.030301),
    (4, 1.04060401),
    (5, 1.0510100501),
    (6, 1.061520150601),
    (7, 1.0721353521070098),
    (8, 1.08285670562808),
    (9, 1.0936852726843609),
    (10, 1.1046221254112045),
    (11, 1.1156683466653166),
    (12, 1.1268250301319698),
]
_AMORT_GN = _AMORT_G[-1][1]


@query(
    "q_amortization_schedule",
    oracle=f"""
    WITH g(t, gt) AS (
        VALUES {", ".join(f"({t}, {v!r})" for t, v in _AMORT_G)}
    ),
    principal AS (
        SELECT r.r_name,
               CAST(sum(CAST(o.o_totalprice AS DECIMAL(27,2))) AS DOUBLE)
                   / count(*) AS p
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1 HAVING count(*) > 0
    ),
    sched AS (
        SELECT p.r_name, g.t, p.p,
               p.p * {_AMORT_RATE} * {_AMORT_GN!r}
                   / ({_AMORT_GN!r} - 1) AS pmt,
               p.p * g.gt
                   - p.p * {_AMORT_RATE} * {_AMORT_GN!r}
                     / ({_AMORT_GN!r} - 1) * (g.gt - 1) / {_AMORT_RATE}
                   AS bal
        FROM principal p CROSS JOIN g
    )
    SELECT r_name, t AS period,
           floor(p * 1e2 + 0.5) / 1e2 AS principal,
           floor(pmt * 1e2 + 0.5) / 1e2 AS payment,
           floor(bal * 1e2 + 0.5) / 1e2 AS balance_after,
           floor((coalesce(lag(bal) OVER (PARTITION BY r_name ORDER BY t),
                           p)
                  - bal) * 1e2 + 0.5) / 1e2 AS principal_paid
    FROM sched ORDER BY r_name, t
    """,
)
def q_amortization_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = local_frame(spark, _AMORT_G, "t int, gt double")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    principal = (
        o.join(maybe_broadcast(c), o.o_custkey == c.c_custkey)
        .join(maybe_broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(maybe_broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            (
                F.sum(F.col("o_totalprice").cast("decimal(27,2)")).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("p")
        )
    )
    pmt = (
        F.col("p") * _AMORT_RATE * _AMORT_GN / (_AMORT_GN - 1)
    )
    sched = principal.crossJoin(F.broadcast(g)).select(
        "r_name",
        "t",
        "p",
        pmt.alias("pmt"),
        (
            F.col("p") * F.col("gt")
            - pmt * (F.col("gt") - 1) / _AMORT_RATE
        ).alias("bal"),
    )
    r2 = lambda c_: F.floor(c_ * 1e2 + F.lit(0.5)) / 1e2  # noqa: E731
    w = Window.partitionBy("r_name").orderBy("t")
    return sched.select(
        "r_name",
        F.col("t").alias("period"),
        r2(F.col("p")).alias("principal"),
        r2(F.col("pmt")).alias("payment"),
        r2(F.col("bal")).alias("balance_after"),
        r2(
            F.coalesce(F.lag("bal").over(w), F.col("p")) - F.col("bal")
        ).alias("principal_paid"),
    ).orderBy("r_name", "period")


# ---------------------------------------------------------------------------
# q_roll_rate_matrix — order-value bucket transition rates between each
# customer's consecutive orders (the credit-risk "roll rate" shape:
# how accounts migrate between value bands period over period).
# Consecutive pairs come from a per-customer lag window ordered by
# (orderdate, orderkey) — a total order; the matrix is exact counts
# plus the within-prev-bucket share. One shuffle on custkey, one
# count aggregate — no join at all.
# ---------------------------------------------------------------------------
_BUCKET_SQL = """CASE WHEN {v} < 150000 THEN 'low'
                     WHEN {v} < 300000 THEN 'mid'
                     ELSE 'high' END"""


@query(
    "q_roll_rate_matrix",
    oracle=f"""
    WITH seq AS (
        SELECT o_custkey,
               {_BUCKET_SQL.format(v="o_totalprice")} AS b,
               lag({_BUCKET_SQL.format(v="o_totalprice")})
                   OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey) AS pb
        FROM orders
    ),
    pairs AS (SELECT pb, b FROM seq WHERE pb IS NOT NULL),
    m AS (
        SELECT pb AS from_bucket, b AS to_bucket,
               CAST(count(*) AS BIGINT) AS n_transitions
        FROM pairs GROUP BY 1, 2
    )
    SELECT from_bucket, to_bucket, n_transitions,
           floor(CAST(n_transitions AS DOUBLE)
                 / sum(n_transitions) OVER (PARTITION BY from_bucket)
                 * 1e6 + 0.5) / 1e6 AS roll_rate
    FROM m ORDER BY from_bucket, to_bucket
    """,
)
def q_roll_rate_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 150000, "low")
        .when(F.col("o_totalprice") < 300000, "mid")
        .otherwise("high")
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey",
        bucket.alias("b"),
        F.lag(bucket).over(w).alias("pb"),
    ).where(F.col("pb").isNotNull())
    m = seq.groupBy(
        F.col("pb").alias("from_bucket"), F.col("b").alias("to_bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    wf = Window.partitionBy("from_bucket")
    return m.select(
        "from_bucket",
        "to_bucket",
        "n_transitions",
        _r6(
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(wf)
        ).alias("roll_rate"),
    ).orderBy("from_bucket", "to_bucket")


# ---------------------------------------------------------------------------
# q_interest_accrual_daycount — accrued interest on each order's value
# from orderdate to a 45-day settlement under two day-count
# conventions, aggregated monthly: ACT/360 (actual days — constant 45
# here, the control) vs 30E/360 (European: clamp both day-of-months to
# 30, count months as 30 days). The 30E/360 day count varies with the
# start date's position in the month, so the basis difference is the
# interesting output. All date arithmetic is integer date-part math
# (identical in both engines); interest terms are per-row doubles
# summed as DECIMALs.
# ---------------------------------------------------------------------------
_ACCRUAL_RATE = 0.06


@query(
    "q_interest_accrual_daycount",
    oracle=f"""
    WITH base AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS mon,
               o_totalprice AS p,
               CAST(o_orderdate AS DATE) AS d1,
               CAST(o_orderdate + INTERVAL 45 DAY AS DATE) AS d2
        FROM orders
    ),
    dc AS (
        SELECT mon, p,
               45 AS act_days,
               360 * (year(d2) - year(d1))
               + 30 * (month(d2) - month(d1))
               + (least(day(d2), 30) - least(day(d1), 30)) AS e360_days
        FROM base
    )
    SELECT mon,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(
               floor(p * {_ACCRUAL_RATE} * act_days / 360 * 1e2 + 0.5) / 1e2
               AS DECIMAL(27,2))) AS DOUBLE) AS interest_act360,
           CAST(sum(CAST(
               floor(p * {_ACCRUAL_RATE} * e360_days / 360 * 1e2 + 0.5) / 1e2
               AS DECIMAL(27,2))) AS DOUBLE) AS interest_30e360,
           CAST(sum(CAST(
               floor(p * {_ACCRUAL_RATE} * act_days / 360 * 1e2 + 0.5) / 1e2
               - floor(p * {_ACCRUAL_RATE} * e360_days / 360 * 1e2 + 0.5)
                 / 1e2
               AS DECIMAL(27,2))) AS DOUBLE) AS basis_difference
    FROM dc GROUP BY mon ORDER BY mon
    """,
)
def q_interest_accrual_daycount(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    d1 = F.to_date("o_orderdate")
    d2 = F.date_add(F.to_date("o_orderdate"), 45)
    base = o.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("mon"),
        F.col("o_totalprice").alias("p"),
        d1.alias("d1"),
        d2.alias("d2"),
    )
    e360 = (
        360 * (F.year("d2") - F.year("d1"))
        + 30 * (F.month("d2") - F.month("d1"))
        + (
            F.least(F.dayofmonth("d2"), F.lit(30))
            - F.least(F.dayofmonth("d1"), F.lit(30))
        )
    )
    cents = lambda c_: F.floor(c_ * 1e2 + F.lit(0.5)) / 1e2  # noqa: E731
    act_i = cents(F.col("p") * _ACCRUAL_RATE * 45 / 360)
    e360_i = cents(F.col("p") * _ACCRUAL_RATE * e360 / 360)
    return (
        base.groupBy("mon")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            _dec(act_i, 2).alias("interest_act360"),
            _dec(e360_i, 2).alias("interest_30e360"),
            _dec(act_i - e360_i, 2).alias("basis_difference"),
        )
        .orderBy("mon")
    )


# ---------------------------------------------------------------------------
# q_fx_triangulation — convert lineitem revenue from the customer's
# currency to the supplier's currency through a base currency, with
# deterministic per-nation rates (1 + nationkey/20 — a literal formula
# shared by both engines, standing in for a rates feed). The engine
# point: the two nation joins stay broadcast (25-row dims), the
# cross-rate is per-row double arithmetic, and revenue sums are
# per-row DECIMAL casts grouped by the (customer-nation,
# supplier-nation) corridor — the remittance-corridor report shape.
# ---------------------------------------------------------------------------
@query(
    "q_fx_triangulation",
    oracle="""
    WITH fact AS (
        SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
               l.l_extendedprice * (1 - l.l_discount) AS rev,
               (1 + sn.n_nationkey / 20.0)
                   / (1 + cn.n_nationkey / 20.0) AS cross_rate
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    )
    SELECT cust_nation, supp_nation,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(rev AS DECIMAL(27,4))) AS DOUBLE) AS rev_cust_ccy,
           CAST(sum(CAST(floor(rev * cross_rate * 1e4 + 0.5) / 1e4
                         AS DECIMAL(27,4))) AS DOUBLE) AS rev_supp_ccy
    FROM fact GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_fx_triangulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_name").alias("cust_nation"),
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    fact = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(c), o.o_custkey == c.c_custkey)
        .join(maybe_broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(maybe_broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(maybe_broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .select(
            "cust_nation",
            "supp_nation",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "rev"
            ),
            (
                (1 + F.col("sn_key") / 20.0) / (1 + F.col("cn_key") / 20.0)
            ).alias("cross_rate"),
        )
    )
    return (
        fact.groupBy("cust_nation", "supp_nation")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            _dec(F.col("rev"), 4).alias("rev_cust_ccy"),
            _dec(
                F.floor(F.col("rev") * F.col("cross_rate") * 1e4 + F.lit(0.5))
                / 1e4,
                4,
            ).alias("rev_supp_ccy"),
        )
        .orderBy("cust_nation", "supp_nation")
    )


# ---------------------------------------------------------------------------
# q_ecl_staging — IFRS-9-shaped expected-credit-loss staging: each
# order stages by its fulfillment delay (first line shipped ≤30d →
# stage 1, ≤60d → stage 2, else stage 3; never shipped → stage 3) and
# provisions at literal stage rates (1% / 5% / 50%). Per-region staged
# exposure and provision totals — a left join from orders to the
# per-order first-ship compaction (orders with no lines stay, the
# defaulted book), then the broadcast dim chain. Provision cents are
# per-row floor-quantized before the DECIMAL sum (the money contract).
# ---------------------------------------------------------------------------
@query(
    "q_ecl_staging",
    oracle="""
    WITH first_ship AS (
        SELECT l_orderkey, min(l_shipdate) AS fs FROM lineitem GROUP BY 1
    ),
    staged AS (
        SELECT r.r_name, o.o_totalprice AS p,
               CASE WHEN f.fs IS NULL THEN 3
                    WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                                   CAST(f.fs AS DATE)) <= 30 THEN 1
                    WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                                   CAST(f.fs AS DATE)) <= 60 THEN 2
                    ELSE 3 END AS stage
        FROM orders o
        LEFT JOIN first_ship f ON o.o_orderkey = f.l_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
    )
    SELECT r_name, stage,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(p AS DECIMAL(27,2))) AS DOUBLE) AS exposure,
           CAST(sum(CAST(
               floor(p * (CASE stage WHEN 1 THEN 0.01 WHEN 2 THEN 0.05
                          ELSE 0.5 END) * 1e2 + 0.5) / 1e2
               AS DECIMAL(27,2))) AS DOUBLE) AS provision
    FROM staged GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_ecl_staging(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    first_ship = li.groupBy("l_orderkey").agg(F.min("l_shipdate").alias("fs"))
    delay = F.datediff(F.to_date("fs"), F.to_date("o_orderdate"))
    stage = (
        F.when(F.col("fs").isNull(), 3)
        .when(delay <= 30, 1)
        .when(delay <= 60, 2)
        .otherwise(3)
    )
    staged = (
        o.join(first_ship, o.o_orderkey == first_ship.l_orderkey, "left")
        .join(maybe_broadcast(c), o.o_custkey == c.c_custkey)
        .join(maybe_broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(maybe_broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("r_name", F.col("o_totalprice").alias("p"), stage.alias("stage"))
    )
    rate = (
        F.when(F.col("stage") == 1, 0.01)
        .when(F.col("stage") == 2, 0.05)
        .otherwise(0.5)
    )
    cents = lambda c_: F.floor(c_ * 1e2 + F.lit(0.5)) / 1e2  # noqa: E731
    return (
        staged.groupBy("r_name", "stage")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            _dec(F.col("p"), 2).alias("exposure"),
            _dec(cents(F.col("p") * rate), 2).alias("provision"),
        )
        .orderBy("r_name", "stage")
    )


# ---------------------------------------------------------------------------
# q_liquidity_ladder — maturity-bucketed expected cash inflows as of
# the book's last order date: each order's value matures at
# orderdate + 45d; remaining term buckets into matured / 0-7 / 8-30 /
# 31-90 / 90+ days, with the cumulative share of total expected cash
# (the treasury liquidity-coverage shape). The as-of date is a 1-row
# aggregate broadcast onto the fact (never a driver round-trip);
# bucket ordering uses an explicit rank column so the cumulative
# window is a total order.
# ---------------------------------------------------------------------------
@query(
    "q_liquidity_ladder",
    oracle="""
    WITH asof_d AS (SELECT max(CAST(o_orderdate AS DATE)) AS ad FROM orders),
    fact AS (
        SELECT o.o_totalprice AS p,
               date_diff('day', a.ad,
                         CAST(o.o_orderdate + INTERVAL 45 DAY AS DATE))
                   AS rem
        FROM orders o CROSS JOIN asof_d a
    ),
    bucketed AS (
        SELECT CASE WHEN rem < 0 THEN 0 WHEN rem <= 7 THEN 1
                    WHEN rem <= 30 THEN 2 WHEN rem <= 90 THEN 3
                    ELSE 4 END AS brank,
               CASE WHEN rem < 0 THEN 'matured' WHEN rem <= 7 THEN 'd0_7'
                    WHEN rem <= 30 THEN 'd8_30' WHEN rem <= 90 THEN 'd31_90'
                    ELSE 'd90_plus' END AS bucket,
               p
        FROM fact
    ),
    agg AS (
        SELECT brank, bucket,
               CAST(count(*) AS BIGINT) AS n_orders,
               sum(CAST(p AS DECIMAL(27,2))) AS cash
        FROM bucketed GROUP BY 1, 2
    )
    SELECT bucket, n_orders,
           CAST(cash AS DOUBLE) AS expected_cash,
           floor(CAST(sum(cash) OVER (ORDER BY brank) AS DOUBLE)
                 / CAST(sum(cash) OVER () AS DOUBLE) * 1e6 + 0.5) / 1e6
               AS cumulative_share
    FROM agg ORDER BY brank
    """,
)
def q_liquidity_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    asof = o.agg(F.max(F.to_date("o_orderdate")).alias("ad"))
    fact = o.crossJoin(F.broadcast(asof)).select(
        F.col("o_totalprice").alias("p"),
        F.datediff(
            F.date_add(F.to_date("o_orderdate"), 45), F.col("ad")
        ).alias("rem"),
    )
    rem = F.col("rem")
    bucketed = fact.select(
        F.when(rem < 0, 0)
        .when(rem <= 7, 1)
        .when(rem <= 30, 2)
        .when(rem <= 90, 3)
        .otherwise(4)
        .alias("brank"),
        F.when(rem < 0, "matured")
        .when(rem <= 7, "d0_7")
        .when(rem <= 30, "d8_30")
        .when(rem <= 90, "d31_90")
        .otherwise("d90_plus")
        .alias("bucket"),
        "p",
    )
    agg = bucketed.groupBy("brank", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("p").cast("decimal(27,2)")).alias("cash"),
    )
    wcum = Window.orderBy("brank").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        agg.select(
            "brank",
            "bucket",
            "n_orders",
            F.col("cash").cast("double").alias("expected_cash"),
            _r6(
                F.sum("cash").over(wcum).cast("double")
                / F.sum("cash").over(wall).cast("double")
            ).alias("cumulative_share"),
        )
        .orderBy("brank")
        .drop("brank")
    )


# ---------------------------------------------------------------------------
# q_contribution_breakeven — unit-economics per brand: unit price
# realized (net of discount) minus a literal 80%-of-retail variable
# cost gives unit contribution; brand totals and the breakeven volume
# against a shared fixed-cost literal. Emitted only for brands with
# positive unit contribution (breakeven is undefined otherwise — the
# empty-on-undefined contract). One fact aggregate after a broadcast
# part join.
# ---------------------------------------------------------------------------
_FIXED_COST = 1_000_000.0


@query(
    "q_contribution_breakeven",
    oracle=f"""
    WITH fact AS (
        SELECT p.p_brand,
               l.l_quantity AS qty,
               l.l_extendedprice * (1 - l.l_discount) AS net_rev,
               0.8 * p.p_retailprice * l.l_quantity AS var_cost
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    m AS (
        SELECT p_brand,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(CAST(qty AS DECIMAL(27,2))) AS DOUBLE) AS units,
               CAST(sum(CAST(net_rev - var_cost AS DECIMAL(27,6)))
                    AS DOUBLE) AS contribution
        FROM fact GROUP BY 1
    )
    SELECT p_brand, n_lines,
           CAST(floor(units + 0.5) AS BIGINT) AS units,
           floor(contribution * 1e2 + 0.5) / 1e2 AS contribution,
           floor(contribution / units * 1e6 + 0.5) / 1e6
               AS contribution_per_unit,
           CAST(ceil({_FIXED_COST!r} / (contribution / units)) AS BIGINT)
               AS breakeven_units
    FROM m WHERE units > 0 AND contribution > 0
    ORDER BY p_brand
    """,
)
def q_contribution_breakeven(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    fact = li.join(maybe_broadcast(p), li.l_partkey == p.p_partkey).select(
        "p_brand",
        F.col("l_quantity").alias("qty"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "net_rev"
        ),
        (0.8 * F.col("p_retailprice") * F.col("l_quantity")).alias(
            "var_cost"
        ),
    )
    m = fact.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        _dec(F.col("qty"), 2).alias("units"),
        _dec(F.col("net_rev") - F.col("var_cost"), 6).alias("contribution"),
    )
    units, contrib = F.col("units"), F.col("contribution")
    return (
        m.where((units > 0) & (contrib > 0))
        .select(
            "p_brand",
            "n_lines",
            F.floor(units + F.lit(0.5)).cast("long").alias("units"),
            (F.floor(contrib * 1e2 + F.lit(0.5)) / 1e2).alias("contribution"),
            _r6(contrib / units).alias("contribution_per_unit"),
            F.ceil(_FIXED_COST / (contrib / units))
            .cast("long")
            .alias("breakeven_units"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# q_supplier_hhi — Herfindahl-Hirschman concentration of supplier
# revenue within each nation: share_i = supplier i's net lineitem
# revenue / nation total, HHI = Σ share_i² (0..1 scale), classified
# against the DOJ-style 0.15/0.25 thresholds. The sourcing-risk
# report a finance team runs on the reference's supplier data. Shares
# divide two decimal-exact sums as doubles; the share² cross-row sum
# goes through a per-row DECIMAL(27,12) cast (the a38 pattern);
# classification compares the ROUNDED hhi so the boundary is
# engine-portable. supplier/nation are broadcast dims; lineitem
# shuffles once on suppkey.
# ---------------------------------------------------------------------------
@query(
    "q_supplier_hhi",
    oracle="""
    WITH rev AS (
        SELECT s.s_nationkey, l.l_suppkey,
               CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(27,6))) AS DOUBLE) AS sup_rev
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2
    ),
    nat AS (
        SELECT s_nationkey,
               CAST(sum(CAST(sup_rev AS DECIMAL(27,6))) AS DOUBLE)
                   AS nat_rev,
               CAST(count(*) AS BIGINT) AS n_suppliers
        FROM rev GROUP BY 1
    ),
    shares AS (
        SELECT r.s_nationkey, r.sup_rev / n.nat_rev AS share
        FROM rev r JOIN nat n USING (s_nationkey)
        WHERE n.nat_rev > 0
    ),
    h AS (
        SELECT s_nationkey,
               floor(CAST(sum(CAST(share * share AS DECIMAL(27,12)))
                          AS DOUBLE) * 1e6 + 0.5) / 1e6 AS hhi,
               floor(max(share) * 1e6 + 0.5) / 1e6 AS top_share
        FROM shares GROUP BY 1
    )
    SELECT nn.n_name AS nation, nat.n_suppliers, h.hhi, h.top_share,
           CASE WHEN h.hhi > 0.25 THEN 'concentrated'
                WHEN h.hhi > 0.15 THEN 'moderate'
                ELSE 'competitive' END AS classification
    FROM h
    JOIN nat USING (s_nationkey)
    JOIN nation nn ON h.s_nationkey = nn.n_nationkey
    ORDER BY nation
    """,
)
def q_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    nn = load(spark, sf_dir, "nation")
    rev = (
        li.join(maybe_broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            _dec(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 6
            ).alias("sup_rev")
        )
    )
    nat = rev.groupBy("s_nationkey").agg(
        _dec(F.col("sup_rev"), 6).alias("nat_rev"),
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
    )
    shares = (
        rev.join(maybe_broadcast(nat), "s_nationkey")
        .where(F.col("nat_rev") > 0)
        .select(
            "s_nationkey", (F.col("sup_rev") / F.col("nat_rev")).alias("share")
        )
    )
    h = shares.groupBy("s_nationkey").agg(
        _r6(
            F.sum((F.col("share") * F.col("share")).cast("decimal(27,12)"))
            .cast("double")
        ).alias("hhi"),
        _r6(F.max("share")).alias("top_share"),
    )
    return (
        h.join(maybe_broadcast(nat), "s_nationkey")
        .join(maybe_broadcast(nn), h.s_nationkey == nn.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            "n_suppliers",
            "hhi",
            "top_share",
            F.when(F.col("hhi") > 0.25, "concentrated")
            .when(F.col("hhi") > 0.15, "moderate")
            .otherwise("competitive")
            .alias("classification"),
        )
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# q_dupont_decomposition — two-factor DuPont per market segment:
# net margin (contribution profit / net revenue) × asset turnover
# (net revenue / account-balance asset base) = return on assets;
# the ratio tree a finance team reads off the reference's balance
# report. Profit reuses the contribution idiom (net revenue minus the
# 0.8 · retailprice · qty variable-cost proxy); the asset base is the
# segment's summed customer account balances (the balance-report
# domain). Every cross-row sum is decimal-cast; ratios divide doubles
# and each reported ratio is independently floor-quantized (the
# margin × turnover = ROA identity holds pre-quantization). Dims
# broadcast; lineitem shuffles once on orderkey.
# ---------------------------------------------------------------------------
@query(
    "q_dupont_decomposition",
    oracle="""
    WITH li AS (
        SELECT o.o_custkey,
               l.l_extendedprice * (1 - l.l_discount) AS net_rev,
               l.l_extendedprice * (1 - l.l_discount)
                   - 0.8 * p.p_retailprice * l.l_quantity AS profit
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN part p ON l.l_partkey = p.p_partkey
    ),
    seg AS (
        SELECT c.c_mktsegment AS segment,
               CAST(sum(CAST(li.net_rev AS DECIMAL(27,6))) AS DOUBLE)
                   AS revenue,
               CAST(sum(CAST(li.profit AS DECIMAL(27,6))) AS DOUBLE)
                   AS profit
        FROM li JOIN customer c ON li.o_custkey = c.c_custkey
        GROUP BY 1
    ),
    assets AS (
        SELECT c_mktsegment AS segment,
               CAST(sum(CAST(c_acctbal AS DECIMAL(27,2))) AS DOUBLE)
                   AS asset_base
        FROM customer GROUP BY 1
    )
    SELECT s.segment,
           floor(s.revenue * 1e2 + 0.5) / 1e2 AS revenue,
           floor(s.profit * 1e2 + 0.5) / 1e2 AS profit,
           floor(s.profit / s.revenue * 1e6 + 0.5) / 1e6 AS net_margin,
           floor(s.revenue / a.asset_base * 1e6 + 0.5) / 1e6
               AS asset_turnover,
           floor(s.profit / a.asset_base * 1e6 + 0.5) / 1e6 AS roa
    FROM seg s JOIN assets a USING (segment)
    WHERE s.revenue > 0 AND a.asset_base > 0
    ORDER BY s.segment
    """,
)
def q_dupont_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    p = load(spark, sf_dir, "part")
    c = load(spark, sf_dir, "customer")
    net_rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    fact = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(p), li.l_partkey == p.p_partkey)
        .select(
            "o_custkey",
            net_rev.alias("net_rev"),
            (
                net_rev - 0.8 * F.col("p_retailprice") * F.col("l_quantity")
            ).alias("profit"),
        )
    )
    seg = (
        fact.join(maybe_broadcast(c), fact.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            _dec(F.col("net_rev"), 6).alias("revenue"),
            _dec(F.col("profit"), 6).alias("profit"),
        )
    )
    assets = c.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        _dec(F.col("c_acctbal"), 2).alias("asset_base")
    )
    f2 = lambda col: F.floor(col * 1e2 + F.lit(0.5)) / 1e2  # noqa: E731
    return (
        seg.join(maybe_broadcast(assets), "segment")
        .where((F.col("revenue") > 0) & (F.col("asset_base") > 0))
        .select(
            "segment",
            f2(F.col("revenue")).alias("revenue"),
            f2(F.col("profit")).alias("profit"),
            _r6(F.col("profit") / F.col("revenue")).alias("net_margin"),
            _r6(F.col("revenue") / F.col("asset_base")).alias(
                "asset_turnover"
            ),
            _r6(F.col("profit") / F.col("asset_base")).alias("roa"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# q_receivables_aging — the accounts-receivable aging report: open
# orders (status 'O' or 'P' — not yet finalized) bucketed by days
# outstanding against a fixed as-of date, per market segment: current
# (not yet due), 1-30, 31-60, 61-90, over 90 days, each with order
# count and decimal-exact amount. The collections report every
# finance team runs on the reference's order book. Age is calendar
# datediff (exact integers on both engines); bucket labels carry a
# sort prefix so ORDER BY is engine-portable. One broadcast dim join
# + one (segment, bucket) aggregate.
# ---------------------------------------------------------------------------
_AGING_ASOF = "1998-08-02"


@query(
    "q_receivables_aging",
    oracle=f"""
    WITH open_orders AS (
        SELECT c.c_mktsegment AS segment,
               date_diff('day', CAST(o.o_orderdate AS DATE),
                         DATE '{_AGING_ASOF}') AS age_days,
               o.o_totalprice
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_orderstatus IN ('O', 'P')
    ),
    bucketed AS (
        SELECT segment,
               CASE WHEN age_days <= 0 THEN 'a_current'
                    WHEN age_days <= 30 THEN 'b_1_30'
                    WHEN age_days <= 60 THEN 'c_31_60'
                    WHEN age_days <= 90 THEN 'd_61_90'
                    ELSE 'e_over_90' END AS bucket,
               o_totalprice
        FROM open_orders
    )
    SELECT segment, bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           floor(CAST(sum(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE)
                 * 1e2 + 0.5) / 1e2 AS amount
    FROM bucketed GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_receivables_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    aged = (
        o.where(F.col("o_orderstatus").isin("O", "P"))
        .join(maybe_broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.datediff(
                F.lit(_AGING_ASOF).cast("date"),
                F.col("o_orderdate").cast("date"),
            ).alias("age_days"),
            "o_totalprice",
        )
    )
    bucketed = aged.select(
        "segment",
        F.when(F.col("age_days") <= 0, "a_current")
        .when(F.col("age_days") <= 30, "b_1_30")
        .when(F.col("age_days") <= 60, "c_31_60")
        .when(F.col("age_days") <= 90, "d_61_90")
        .otherwise("e_over_90")
        .alias("bucket"),
        "o_totalprice",
    )
    return (
        bucketed.groupBy("segment", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            (
                F.floor(
                    F.sum(F.col("o_totalprice").cast("decimal(27,2)"))
                    .cast("double")
                    * 1e2
                    + F.lit(0.5)
                )
                / 1e2
            ).alias("amount"),
        )
        .orderBy("segment", "bucket")
    )
