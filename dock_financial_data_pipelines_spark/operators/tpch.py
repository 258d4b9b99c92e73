"""TPC-H-shaped reporting queries over the fixture star schema — the
"daily business reports" a consumer of the reference's balance/statement
files would actually produce downstream (README:47-63), expressed as
single declarative plans.

Q1 lives in aggregations.py (a1_pricing_summary); here: Q3 (shipping
priority), Q10 (returned-item reporting), and a market-share style
report. All joins are dim-broadcast + single fact shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dock_financial_data_pipelines_spark.catalog import dec_sum, load, maybe_broadcast
from dock_financial_data_pipelines_spark.registry import query


@query(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(27,4))), 2)::DOUBLE AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY 1, 3, 4
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
    )


@query(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(27,4))), 2)::DOUBLE AS revenue,
           round(c.c_acctbal, 2) AS acctbal,
           n.n_name AS nation
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01'
    GROUP BY 1, 2, 4, 5
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = load(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "acctbal", "nation")
    )


@query(
    "tpch_q18_large_orders",
    # Written on the SQL surface with an IN-subquery so Catalyst's
    # subquery decorrelation (rewrite to semi-join) is exercised.
    oracle="""
    SELECT c.c_name, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           round(o.o_totalprice, 2) AS totalprice,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    GROUP BY 1, 2, 3, 4
    """,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dock_financial_data_pipelines_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_name, o.o_orderkey,
               date_format(o.o_orderdate, 'yyyy-MM-dd') AS orderdate,
               round(o.o_totalprice, 2) AS totalprice,
               round(sum(l.l_quantity), 2) AS total_qty
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING sum(l_quantity) > 150
        )
        GROUP BY 1, 2, 3, 4
        """
    )


@query(
    "tpch_q22_scalar_subquery",
    # Correlated + scalar subqueries on the SQL surface: customers above
    # the global average balance with no RECENT orders (TPC-H Q22
    # shape; the recency bound keeps the answer non-degenerate at every
    # fixture SF — with no bound, every customer has some order and
    # both engines would vacuously return zero rows).
    oracle="""
    SELECT substr(c_name, 10, 2) AS cntry,
           count(*) AS n_custs,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(27,2))), 2) AS DOUBLE) AS total_bal
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (
              SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '1999-01-01'
          )
    GROUP BY 1
    """,
)
def tpch_q22_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dock_financial_data_pipelines_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT substr(c_name, 10, 2) AS cntry,
               count(*) AS n_custs,
               CAST(round(sum(CAST(c_acctbal AS DECIMAL(27,2))), 2) AS DOUBLE) AS total_bal
        FROM customer c
        WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (
              SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '1999-01-01'
          )
        GROUP BY 1
        """
    )


@query(
    "report_region_market_share",
    oracle="""
    WITH rev AS (
        SELECT r.r_name AS region,
               year(o.o_orderdate) AS yr,
               sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(27,4)))::DOUBLE AS revenue
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2
    )
    SELECT region, yr,
           round(revenue, 2) AS revenue,
           round(revenue / sum(revenue) OVER (PARTITION BY yr), 6) AS share
    FROM rev
    """,
)
def report_region_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(maybe_broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(maybe_broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"), F.year("o_orderdate").alias("yr")
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(27,4)"
                )
            )
            .cast("double")
            .alias("_rev")
        )
    )
    w = Window.partitionBy("yr")
    return rev.select(
        "region",
        "yr",
        F.round("_rev", 2).alias("revenue"),
        F.round(F.col("_rev") / F.sum("_rev").over(w), 6).alias("share"),
    )


# ---------------------------------------------------------------------------
# Q6 — forecasting revenue change: pure scan + filter + agg, the
# pushdown/codegen benchmark query (no join, no shuffle beyond the
# final 1-row combine).
# ---------------------------------------------------------------------------
@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(27,4))), 2)::DOUBLE AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dec_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q12-shaped — late-shipment accounting by order priority (the fixture
# schema carries no l_shipmode/l_receiptdate, so "late" is ship-lag
# against the order date; the plan shape — fact-fact equi-join plus
# conditional aggregation — is Q12's).
# ---------------------------------------------------------------------------
@query(
    "tpch_q12_late_shipments",
    oracle="""
    SELECT o.o_orderpriority,
           count(*) AS n_lines,
           CAST(sum(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                    THEN 1 ELSE 0 END) AS BIGINT) AS late_lines
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def tpch_q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    ).cast("long")
    return (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(late).alias("late_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q14 — promotion revenue share: broadcast part join + conditional
# numerator over one fact scan.
# ---------------------------------------------------------------------------
@query(
    "tpch_q14_promo_revenue",
    oracle="""
    SELECT round(
             100.0 * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4
           ) AS promo_pct,
           count(*) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-04-01'
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        li.join(maybe_broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo_rev) / F.sum(rev), 4).alias("promo_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q4 — order-priority checking: orders with at least one late line
# (EXISTS with a correlated predicate), counted by priority. Catalyst
# decorrelates the subquery into a semi-join; the fixture has no
# l_commitdate, so "late" is ship-lag > 90 days (as in Q12's adaptation).
# ---------------------------------------------------------------------------
@query(
    "tpch_q4_priority_check",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY 1
    """,
)
def tpch_q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dock_financial_data_pipelines_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o.o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
          AND o.o_orderdate <  TIMESTAMP '1996-10-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
          )
        GROUP BY 1
        """
    )


# ===========================================================================
# The remaining TPC-H query shapes, adapted to the fixture schema. The
# fixture carries no partsupp table and no l_commitdate/l_receiptdate/
# p_container/p_mfgr columns, so the queries that depend on them
# (Q2/Q9/Q11/Q16/Q17/Q19/Q20/Q21) substitute fixture-derivable stand-ins
# — each adaptation is noted per query; the PLAN SHAPE (the thing that
# matters at 100 TB: join topology, subquery decorrelation, disjunctive
# pushdown) is the original query's.
#
# Join-heavy queries use the DataFrame API with maybe_broadcast dims;
# subquery-heavy ones use the SQL surface so Catalyst's decorrelation
# (correlated scalar/EXISTS → joins) is exercised end-to-end.
# ===========================================================================


@query(
    "tpch_q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(27,4))), 2)::DOUBLE AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: revenue from local suppliers (customer and supplier share a
    nation) within one region-year. Two fact-side equi-joins plus three
    broadcast dims; the c_nationkey = s_nationkey condition rides the
    supplier join, so no extra shuffle."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            maybe_broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(maybe_broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(maybe_broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


@query(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(27,4))), 2)::DOUBLE AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN region r1  ON n1.n_regionkey = r1.r_regionkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    JOIN region r2  ON n2.n_regionkey = r2.r_regionkey
    WHERE ((r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA')
        OR (r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: bilateral trade volume between two trading blocs by nation
    pair and year (the original's two fixed nations become two fixed
    REGIONS so the answer is non-degenerate at every fixture SF; the
    symmetric-disjunction shape is Q7's). The pair filter lands on
    broadcast nation+region copies, so the fact side still shuffles
    only on its join keys."""
    supp = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    n1 = nation.join(region, nation.n_regionkey == region.r_regionkey).select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_name").alias("supp_nation"),
        F.col("r_name").alias("supp_region"),
    )
    n2 = nation.join(region, nation.n_regionkey == region.r_regionkey).select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("cust_nation"),
        F.col("r_name").alias("cust_region"),
    )
    pair = (
        (F.col("supp_region") == "EUROPE") & (F.col("cust_region") == "ASIA")
    ) | ((F.col("supp_region") == "ASIA") & (F.col("cust_region") == "EUROPE"))
    return (
        supp.join(li, supp.s_suppkey == li.l_suppkey)
        .join(orders, orders.o_orderkey == li.l_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        .join(maybe_broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(maybe_broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


@query(
    "tpch_q8_national_market_share",
    oracle="""
    WITH all_nations AS (
        SELECT year(o.o_orderdate) AS o_year,
               CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(27,4)) AS volume,
               n2.n_name AS supp_nation
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
        JOIN region r   ON n1.n_regionkey = r.r_regionkey
        JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
    )
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
    FROM all_nations
    GROUP BY 1
    """,
)
def tpch_q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: one nation's share of ECONOMY-part revenue sold into AMERICA,
    by year (p_mfgr absent; p_type carries the product filter). Both
    numerator and denominator accumulate in DECIMAL so the share is
    order-independent before the final double division."""
    part = load(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    volume = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(27,4)"
    )
    return (
        maybe_broadcast(part)
        .join(li, F.col("p_partkey") == li.l_partkey)
        .join(maybe_broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(maybe_broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(maybe_broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(maybe_broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .withColumn("volume", volume)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                    .otherwise(F.lit(0).cast("decimal(27,4)"))
                ).cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


@query(
    "tpch_q9_product_type_profit",
    oracle="""
    SELECT n.n_name AS nation,
           year(o.o_orderdate) AS o_year,
           round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                          - 0.6 * p.p_retailprice * l.l_quantity AS DECIMAL(27,4))), 2)::DOUBLE AS profit
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9: profit on 'red' parts by supplier nation and year. The fixture
    has no partsupp, so unit cost is proxied as 0.6 * p_retailprice —
    the four-way fact join topology and nation/year rollup are Q9's."""
    part = load(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        maybe_broadcast(part)
        .join(li, F.col("p_partkey") == li.l_partkey)
        .join(maybe_broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(maybe_broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(dec_sum(amount).alias("profit"))
    )


@query(
    "tpch_q11_important_stock",
    oracle="""
    WITH flows AS (
        SELECT l.l_partkey,
               CAST(l.l_quantity * p.p_retailprice AS DECIMAL(27,4)) AS v
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        JOIN part p     ON l.l_partkey = p.p_partkey
        WHERE r.r_name = 'EUROPE'
    )
    SELECT l_partkey AS partkey, round(sum(v), 2)::DOUBLE AS value
    FROM flows
    GROUP BY 1
    HAVING sum(v) > (SELECT 1.5 * sum(v) / count(DISTINCT l_partkey) FROM flows)
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11: parts whose flow value through a region's suppliers
    exceeds 1.5x the per-part average for the region (partsupp absent:
    value is shipped quantity x retail price; the fixed-fraction
    threshold becomes an average-relative one so the answer is
    non-degenerate at every fixture SF). SQL surface: the HAVING's scalar
    subquery over the same CTE is Catalyst's scalar-subquery-to-
    broadcast rewrite; at scale the threshold is one extra 1-row stage,
    never a recompute of the flow."""
    from dock_financial_data_pipelines_spark.catalog import register_views

    register_views(spark, sf_dir)
    # Engine form: the oracle keeps the scalar-subquery HAVING; here the
    # threshold is a window over the grouped flows (sum/count OVER ()),
    # so the 4-way join runs once — the subquery form recomputed it
    # (partial ReusedExchange aside), and at 100 TB a second pass over
    # the fact join is the dominant cost.
    return spark.sql(
        """
        WITH flows AS (
            SELECT l.l_partkey,
                   CAST(l.l_quantity * p.p_retailprice AS DECIMAL(27,4)) AS v
            FROM lineitem l
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n   ON s.s_nationkey = n.n_nationkey
            JOIN region r   ON n.n_regionkey = r.r_regionkey
            JOIN part p     ON l.l_partkey = p.p_partkey
            WHERE r.r_name = 'EUROPE'
        ),
        grouped AS (
            SELECT l_partkey, sum(v) AS pv FROM flows GROUP BY 1
        )
        SELECT l_partkey AS partkey, CAST(round(pv, 2) AS DOUBLE) AS value
        FROM (
            SELECT l_partkey, pv,
                   1.5 * sum(pv) OVER () / count(*) OVER () AS threshold
            FROM grouped
        )
        WHERE pv > threshold
        """
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY 1
    )
    GROUP BY 1
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: distribution of per-customer order counts (the o_comment
    NOT LIKE filter becomes an order-priority exclusion). The join-side
    predicate must stay in the LEFT JOIN's ON clause — as a WHERE it
    would silently drop the zero-order customers the query exists to
    count."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, round(r.total_revenue, 2)::DOUBLE AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: the quarter's top revenue supplier. The oracle keeps the
    original scalar-max-subquery form; the engine replaces the twice-
    referenced revenue view with ONE aggregate plus an unbounded window
    max — Catalyst inlines re-referenced CTEs (measured: the subquery
    form scanned lineitem 6x with zero exchange reuse), while the window
    form scans the fact once and runs the max over |suppliers| rows.
    DECIMAL accumulation keeps the max equality exact."""
    from dock_financial_data_pipelines_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY 1
        ),
        ranked AS (
            SELECT supplier_no, total_revenue,
                   max(total_revenue) OVER () AS max_revenue
            FROM revenue
        )
        SELECT s.s_suppkey, s.s_name, CAST(round(r.total_revenue, 2) AS DOUBLE) AS total_revenue
        FROM supplier s JOIN ranked r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = r.max_revenue
        """
    )


@query(
    "tpch_q16_parts_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#11'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def tpch_q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16: distinct supplier counts per (brand, type, size) bucket,
    excluding flagged suppliers (complaint comments become negative
    account balances; lineitem stands in for partsupp as the
    part-supplier bridge). NOT IN over a filtered dim is a broadcast
    null-aware anti-join."""
    from dock_financial_data_pipelines_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p.p_brand, p.p_type, p.p_size,
               count(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#11'
          AND p.p_type <> 'PROMO'
          AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
          AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
        """
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(CAST(l.l_extendedprice AS DECIMAL(27,4))) / 7.0, 2)::DOUBLE AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#11' AND p.p_type = 'SMALL'
      AND l.l_quantity < (
          SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = p.p_partkey
      )
    """,
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: revenue lost if below-half-average-quantity orders were not
    taken (p_container filter becomes p_type). The correlated average
    decorrelates into a per-part aggregate joined back to the fact — at
    scale that is one extra partial agg over the probed parts only."""
    from dock_financial_data_pipelines_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(27,4))) / 7.0, 2) AS DOUBLE) AS avg_yearly,
               count(*) AS n_lines
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#11' AND p.p_type = 'SMALL'
          AND l.l_quantity < (
              SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
              WHERE l2.l_partkey = p.p_partkey
          )
        """
    )


@query(
    "tpch_q19_discounted_revenue",
    oracle="""
    SELECT round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(27,4))), 2)::DOUBLE AS revenue,
           count(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#16' AND p.p_size BETWEEN 10 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#21' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: revenue under three disjunctive brand/size/quantity bands
    (p_container ranges become p_size ranges). The OR-of-ANDs spans both
    join sides, but Catalyst derives single-side prefilters (any-band
    brand/size on part, any-band quantity on lineitem) so the join never
    sees unbandable rows."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    bands = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#16")
            & F.col("p_size").between(10, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#21")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(maybe_broadcast(part), li.l_partkey == part.p_partkey)
        .where(bands)
        .agg(
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q20_potential_promotion",
    oracle="""
    SELECT s.s_name, n.n_name AS nation
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_name LIKE 'small%'
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY 1
        HAVING sum(l.l_quantity) > 100
    )
    """,
)
def tpch_q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20: suppliers who moved real volume of 'small*' parts in a year
    (partsupp availqty absent: the excess-stock threshold becomes a
    shipped-quantity threshold over the same nested IN-subquery shape).
    The IN decorrelates to a semi-join against the aggregated inner."""
    from dock_financial_data_pipelines_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s.s_name, n.n_name AS nation
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE s.s_suppkey IN (
            SELECT l.l_suppkey
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_name LIKE 'small%'
              AND l.l_shipdate >= TIMESTAMP '1996-01-01'
              AND l.l_shipdate <  TIMESTAMP '1997-01-01'
            GROUP BY 1
            HAVING sum(l.l_quantity) > 100
        )
        """
    )


@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY 1
    """,
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21: suppliers solely responsible for late multi-supplier orders
    (no l_receiptdate/l_commitdate: "late" is ship-lag > 90 days, as in
    the Q4/Q12 adaptations). The oracle keeps the EXISTS + NOT EXISTS
    form; the engine folds both subqueries into per-order window
    aggregates over ONE pass of lineitem⋈orders — EXISTS(other
    supplier) ⇔ the order has ≥ 2 distinct suppliers, NOT EXISTS(other
    LATE supplier) ⇔ the order's distinct late-supplier count is
    exactly 1 (l1 itself is late, so "no other late supplier" is "one
    late supplier total"; lateness is per-order, o_orderdate being
    unique per orderkey). r14's aggregate-then-join-back form computed
    the lineitem⋈orders subtree TWICE (the og-side partial aggregate
    made its Exchange child differ from the l1 side, so no
    ReusedExchange fired); the window form shuffles the fact ONCE by
    l_orderkey and evaluates both distinct counts in the same Window
    operator (size(collect_set(...)) — per-order groups are ≤7 rows in
    TPC-H, so the set state is bounded). r15: 2 Exchanges + double
    subtree → 1 Exchange, fact scanned once."""
    from dock_financial_data_pipelines_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH lo AS (
            SELECT l.l_orderkey, l.l_suppkey,
                   CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                        THEN 1 ELSE 0 END AS late
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            WHERE o.o_orderstatus = 'F'
        ),
        flagged AS (
            SELECT l_suppkey, late,
                   size(collect_set(l_suppkey)
                        OVER (PARTITION BY l_orderkey)) AS n_supp,
                   size(collect_set(CASE WHEN late = 1 THEN l_suppkey END)
                        OVER (PARTITION BY l_orderkey)) AS n_late_supp
            FROM lo
        )
        SELECT s.s_name, count(*) AS numwait
        FROM flagged l1
        JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        WHERE l1.late = 1 AND l1.n_supp >= 2 AND l1.n_late_supp = 1
        GROUP BY 1
        """
    )


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH offer AS (
        SELECT l.l_partkey, l.l_suppkey,
               min(l.l_extendedprice / l.l_quantity) AS unit_price
        FROM lineitem l
        GROUP BY 1, 2
    )
    SELECT round(s.s_acctbal, 2) AS acctbal, s.s_name, n.n_name AS nation,
           p.p_partkey, p.p_type
    FROM part p
    JOIN offer o    ON p.p_partkey = o.l_partkey
    JOIN supplier s ON o.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'LARGE' AND r.r_name = 'EUROPE'
      AND o.unit_price = (
          SELECT min(o2.unit_price) FROM offer o2
          WHERE o2.l_partkey = p.p_partkey
      )
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2: for each qualifying part, the supplier offering it cheapest
    (partsupp absent: the offer relation is each supplier's minimum
    observed unit price from lineitem). The oracle keeps the original
    correlated-min form; the engine computes the per-part best price
    with a window min over the offer aggregate — Catalyst inlines
    re-referenced CTEs (measured: the correlated form scanned lineitem
    4x), while the window form scans the fact once and the min runs
    over the already-aggregated (part, supplier) frame. Unit prices are
    IEEE-double divisions of identical operands in both engines, so the
    min-equality matches exactly."""
    from dock_financial_data_pipelines_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH offer AS (
            SELECT l.l_partkey, l.l_suppkey,
                   min(l.l_extendedprice / l.l_quantity) AS unit_price
            FROM lineitem l
            GROUP BY 1, 2
        ),
        best AS (
            SELECT l_partkey, l_suppkey, unit_price,
                   min(unit_price) OVER (PARTITION BY l_partkey) AS best_price
            FROM offer
        )
        SELECT round(s.s_acctbal, 2) AS acctbal, s.s_name, n.n_name AS nation,
               p.p_partkey, p.p_type
        FROM part p
        JOIN best o     ON p.p_partkey = o.l_partkey
                       AND o.unit_price = o.best_price
        JOIN supplier s ON o.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'LARGE' AND r.r_name = 'EUROPE'
        """
    )
