"""Sinks (SURVEY.md §2-B S5): partitioned parquet with dynamic
partition-overwrite — the engine restatement of the reference's
idempotent SFTP→S3 copy (`replace=True, confirm=True`, REPORT:172-174):
re-running a day replaces exactly that day's partition and nothing else.

At 100 TB the same write shape holds: partition by ingest date (and
bucket by the join key if downstream joins dominate); dynamic overwrite
keeps re-runs O(one day), not O(table).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dock_financial_data_pipelines_spark.catalog import load
from dock_financial_data_pipelines_spark.registry import query


def write_partitioned(
    df: DataFrame, path: str, partition_col: str, mode: str = "overwrite"
) -> None:
    """Idempotent partitioned write (dynamic overwrite)."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.write.mode(mode).partitionBy(partition_col).parquet(path)


@query(
    "s5_partitioned_sink_roundtrip",
    oracle="""
    SELECT year(o_orderdate) AS order_year,
           count(*) AS n,
           round(sum(CAST(o_totalprice AS DECIMAL(27,2))), 2)::DOUBLE AS total
    FROM orders GROUP BY 1
    """,
)
def s5_partitioned_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = os.path.join(
        tempfile.gettempdir(),
        "dock_fdp_spark",
        f"sink_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    orders = load(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    write_partitioned(orders, out, "order_year")
    # Write the last year again: dynamic overwrite must replace in place,
    # leaving the read-back identical to the source (idempotence check).
    last_year = orders.agg(F.max("order_year")).collect()[0][0]
    write_partitioned(orders.where(F.col("order_year") == last_year), out, "order_year")
    return (
        spark.read.parquet(out)
        .groupBy(F.col("order_year").cast("bigint").alias("order_year"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(27,2)")), 2)
            .cast("double")
            .alias("total"),
        )
    )
