"""UDF / UDAF / UDTF surface (SURVEY.md §2-B D1-D5).

Policy (SURVEY.md §4.3): built-in functions first; when Python is
genuinely needed, Arrow-batched pandas UDFs (`@pandas_udf`,
`applyInPandas`) — never row-at-a-time Python in a hot path. D1
deliberately demonstrates the row-at-a-time form once (the reference's
URL-builder, REPORT:62, is exactly this shape) so the surface is
complete, but on a column the optimizer has already pruned to a small
slice.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa  # module-level: arrow_udf type hints resolve here

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

from dock_financial_data_pipelines_spark.catalog import load
from dock_financial_data_pipelines_spark.registry import query


# ---------------------------------------------------------------------------
# D1 — Python scalar UDF: the reference's URL/path builder (REPORT:62)
# ---------------------------------------------------------------------------
@query(
    "d1_python_udf_urls",
    oracle="""
    SELECT o_orderkey,
           concat('https://api.dock.example/transactions?day=',
                  strftime(o_orderdate, '%Y-%m-%d'),
                  '&priority=', substr(o_orderpriority, 1, 1)) AS request_url
    FROM orders WHERE o_orderkey < 100
    """,
)
def d1_python_udf_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.udf(returnType=StringType())
    def build_url(day: str, priority: str) -> str:
        return (
            f"https://api.dock.example/transactions?day={day}&priority={priority[0]}"
        )

    return (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") < 100)
        .select(
            "o_orderkey",
            build_url(
                F.date_format("o_orderdate", "yyyy-MM-dd"), F.col("o_orderpriority")
            ).alias("request_url"),
        )
    )


# ---------------------------------------------------------------------------
# D2 — pandas scalar UDF (Arrow-vectorized)
# ---------------------------------------------------------------------------
@query(
    "d2_pandas_udf_net_price",
    # floor(x*100+0.5)/100 on both sides: see p1_project_compute.
    oracle="""
    SELECT l_returnflag,
           round(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100
                        AS DECIMAL(27,2))), 2)::DOUBLE
               AS net_revenue,
           count(*) AS n
    FROM lineitem GROUP BY 1
    """,
)
def d2_pandas_udf_net_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    @F.pandas_udf(DoubleType())
    def net_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        return np.floor(price * (1.0 - discount) * 100 + 0.5) / 100

    return (
        load(spark, sf_dir, "lineitem")
        .withColumn("np", net_price("l_extendedprice", "l_discount"))
        .groupBy("l_returnflag")
        .agg(
            F.round(F.sum(F.col("np").cast("decimal(27,2)")), 2)
            .cast("double")
            .alias("net_revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# D3 — pandas grouped-aggregate UDF: discount-weighted average price
# ---------------------------------------------------------------------------
@query(
    "d3_grouped_agg_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
               AS weighted_avg_price
    FROM lineitem GROUP BY 1
    """,
)
def d3_grouped_agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(DoubleType())
    def weighted_avg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(weighted_avg("l_extendedprice", "l_quantity"), 4).alias(
                "weighted_avg_price"
            )
        )
    )


# ---------------------------------------------------------------------------
# D4 — applyInPandas (UDTF-style per-group transform): rows above the
# group mean. The oracle states the same semantics with a window average.
# ---------------------------------------------------------------------------
@query(
    "d4_apply_in_pandas_above_mean",
    oracle="""
    SELECT l_returnflag,
           count(*) FILTER (WHERE l_quantity > grp_avg) AS n_above_mean,
           count(*) AS n_total
    FROM (
        SELECT l_returnflag, l_quantity,
               avg(l_quantity) OVER (PARTITION BY l_returnflag) AS grp_avg
        FROM lineitem
    ) GROUP BY 1
    """,
)
def d4_apply_in_pandas_above_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    schema = StructType(
        [
            StructField("l_returnflag", StringType()),
            StructField("n_above_mean", LongType()),
            StructField("n_total", LongType()),
        ]
    )

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        mean_q = pdf["l_quantity"].mean()
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "n_above_mean": [int((pdf["l_quantity"] > mean_q).sum())],
                "n_total": [len(pdf)],
            }
        )

    return (
        load(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity")
        .groupBy("l_returnflag")
        .applyInPandas(per_group, schema)
    )


# ---------------------------------------------------------------------------
# D6 — Python UDTF (table function, Spark 3.5+): expand each order into
# scheduled installment rows (a statement-generation shape).
# ---------------------------------------------------------------------------
@query(
    "d6_python_udtf_installments",
    oracle="""
    SELECT o.o_orderkey,
           i.n AS installment,
           floor(o.o_totalprice / 3 * 100 + 0.5) / 100 AS amount
    FROM orders o CROSS JOIN (VALUES (1), (2), (3)) i(n)
    WHERE o.o_orderkey < 100
    """,
)
def d6_python_udtf_installments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="o_orderkey: bigint, installment: int, amount: double")
    class Installments:
        def eval(self, orderkey: int, totalprice: float):
            import math

            for n in (1, 2, 3):
                # floor(x*100+0.5)/100: same IEEE ops as the oracle
                # (python round() is half-even; see p1_project_compute)
                yield orderkey, n, math.floor(totalprice / 3 * 100 + 0.5) / 100

    spark.udtf.register("installments", Installments)
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT i.o_orderkey, i.installment, i.amount
        FROM orders o,
        LATERAL installments(o.o_orderkey, o.o_totalprice) i
        WHERE o.o_orderkey < 100
        """
    )


# ---------------------------------------------------------------------------
# D5 — SQL-registered UDF used from spark.sql (SQL/DataFrame parity)
# ---------------------------------------------------------------------------
@query(
    "d5_sql_registered_udf",
    oracle="""
    SELECT CASE WHEN c_acctbal < 0 THEN 'overdrawn'
                WHEN c_acctbal < 2500 THEN 'low'
                ELSE 'high' END AS balance_tier,
           count(*) AS n_customers
    FROM customer GROUP BY 1
    """,
)
def d5_sql_registered_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    def tier(bal: float) -> str:
        if bal < 0:
            return "overdrawn"
        if bal < 2500:
            return "low"
        return "high"

    spark.udf.register("balance_tier", tier, StringType())
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT balance_tier(c_acctbal) AS balance_tier,
               count(*) AS n_customers
        FROM customer GROUP BY 1
        """
    )


# ---------------------------------------------------------------------------
# D7 — mapInArrow: the zero-copy Arrow batch surface (Spark 3.3+). Same
# distributed shape as mapInPandas but the UDF sees pyarrow RecordBatch
# objects directly — the fastest lane for columnar Python libraries
# (no pandas conversion at all). Here: net-price computation on Arrow
# arrays, verified against plain SQL.
# ---------------------------------------------------------------------------
@query(
    "d7_map_in_arrow",
    oracle="""
    SELECT l_orderkey,
           floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100 AS net_price
    FROM lineitem WHERE l_orderkey < 200
    """,
)
def d7_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    def net(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            ep = batch.column("l_extendedprice")
            disc = batch.column("l_discount")
            raw = pc.multiply(ep, pc.subtract(pa.scalar(1.0), disc))
            money = pc.divide(
                pc.floor(pc.add(pc.multiply(raw, pa.scalar(100.0)), pa.scalar(0.5))),
                pa.scalar(100.0),
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column("l_orderkey"), money], ["l_orderkey", "net_price"]
            )

    src = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") < 200)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return src.mapInArrow(net, "l_orderkey bigint, net_price double")


# ---------------------------------------------------------------------------
# D8 — POLYMORPHIC Python UDTF (Spark 4 public API): the output schema
# is not declared statically but computed by a static ``analyze()``
# from the call's CONSTANT argument — the engine resolves a different
# relation type per call site. The reference hand-parses its JSON
# envelopes with fixed field lists (REPORT:92-112); a polymorphic
# extractor is that utility done once: the field list rides the SQL
# text, the planner gets real per-call columns (pruning, not a map
# blob), and a typo'd field surfaces as an all-NULL column, not a
# KeyError at executor depth. UDTFs are the D-surface slow path like
# every Python eval — demonstrator-scoped here, bounded by the same
# event_id predicate as the other D queries.
# ---------------------------------------------------------------------------
@query(
    "d8_udtf_dynamic_schema",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(NULL AS BIGINT) AS missing
    FROM events WHERE event_id < 200
    """,
)
def d8_udtf_dynamic_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import LongType, StructField as SF_, StructType as ST_
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class JsonFields:
        @staticmethod
        def analyze(
            props: AnalyzeArgument, fields: AnalyzeArgument
        ) -> AnalyzeResult:
            if not fields.isConstantExpression or fields.value is None:
                raise ValueError(
                    "json_fields: the field list must be a constant"
                )
            return AnalyzeResult(
                ST_([SF_(c, LongType()) for c in fields.value.split(",")])
            )

        def eval(self, props: str, fields: str):
            import json as _json

            d = _json.loads(props) if props else {}
            yield tuple(
                int(d[c]) if d.get(c) is not None else None
                for c in fields.split(",")
            )

    spark.udtf.register("json_fields", udtf(JsonFields))
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT e.event_id, j.k, j.missing
        FROM events e,
        LATERAL json_fields(e.props, 'k,missing') j
        WHERE e.event_id < 200
        """
    )


# ---------------------------------------------------------------------------
# D9 — SQL-body UDFs (Spark 4 `CREATE FUNCTION ... RETURN <expr>` /
# `RETURNS TABLE`): user functions whose bodies are SQL, not Python.
# Unlike D1-D5, Catalyst INLINES these into the calling plan — the
# scalar classifier folds into the scan's codegen stage and the
# table function becomes an ordinary subquery, so there is no Python
# worker, no Arrow boundary, no serialization at any scale
# (explain_audit pins BatchEvalPython absent). This is the right
# default for shareable business logic at 100 TB: catalog-registered
# like a UDF, costed like a view. The scalar fn buckets discounts;
# the TVF parameterizes the priced-order band it aggregates.
# ---------------------------------------------------------------------------
@query(
    "d9_sql_body_udf",
    oracle="""
    SELECT CASE WHEN l_discount < 0.03 THEN 'thin'
                WHEN l_discount < 0.07 THEN 'mid'
                ELSE 'deep' END AS discount_band,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(CAST(l_extendedprice * (1 - l_discount)
                          AS DECIMAL(27,4))), 2)::DOUBLE AS revenue
    FROM lineitem
    WHERE l_quantity >= 10
    GROUP BY 1
    """,
)
def d9_sql_body_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION discount_band(d DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN d < 0.03 THEN 'thin'
                    WHEN d < 0.07 THEN 'mid'
                    ELSE 'deep' END
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION band_revenue(min_qty DOUBLE)
        RETURNS TABLE(discount_band STRING, n_lines BIGINT, revenue DOUBLE)
        RETURN SELECT discount_band(l_discount) AS discount_band,
                      count(*) AS n_lines,
                      CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                     AS DECIMAL(27,4))), 2) AS DOUBLE)
                          AS revenue
               FROM lineitem
               WHERE l_quantity >= min_qty
               GROUP BY 1
        """
    )
    return spark.sql("SELECT * FROM band_revenue(10)")


# ---------------------------------------------------------------------------
# D10 — Arrow-native scalar UDF (Spark 4 `arrow_udf`): the D2 shape
# with pyarrow.compute kernels instead of pandas — batches cross the
# boundary as Arrow arrays and stay Arrow inside the UDF (no
# pandas materialization round-trip), the cheapest Python boundary
# Spark offers for vectorizable logic. Same per-row money convention
# as D2 (floor(x*100+0.5)/100, then exact decimal accumulation), so
# the oracle is the identical statement.
# ---------------------------------------------------------------------------
@query(
    "d10_arrow_native_udf",
    oracle="""
    SELECT l_returnflag,
           round(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100
                        AS DECIMAL(27,2))), 2)::DOUBLE
               AS net_revenue,
           count(*) AS n
    FROM lineitem GROUP BY 1
    """,
)
def d10_arrow_native_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow.compute as pc

    from pyspark.sql.functions import arrow_udf

    @arrow_udf(DoubleType())
    def net_price(price: pa.Array, discount: pa.Array) -> pa.Array:
        net = pc.multiply(price, pc.subtract(pa.scalar(1.0), discount))
        cents = pc.floor(pc.add(pc.multiply(net, pa.scalar(100.0)),
                                pa.scalar(0.5)))
        return pc.divide(cents, pa.scalar(100.0))

    return (
        load(spark, sf_dir, "lineitem")
        .withColumn("np", net_price("l_extendedprice", "l_discount"))
        .groupBy("l_returnflag")
        .agg(
            F.round(F.sum(F.col("np").cast("decimal(27,2)")), 2)
            .cast("double")
            .alias("net_revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )
