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
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dock_financial_data_pipelines_spark.catalog import load, read_parquet_or_empty
from dock_financial_data_pipelines_spark.registry import query


def write_partitioned(
    df: DataFrame, path: str, partition_col: str, mode: str = "overwrite"
) -> None:
    """Idempotent partitioned write (dynamic overwrite).

    Dynamic mode is a per-write option, not a session conf: a session-
    wide setting would leak into every later plain overwrite on a shared
    session and leave stale partitions behind."""
    (
        df.write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )


@dataclass
class SinkLocation:
    """The filesystem knob for every sink path (reference: the S3 output
    bucket, REPORT:166-178).

    The engine writes through Hadoop's FileSystem API, so pointing the
    same jobs at an object store is configuration, not code: set
    ``base_uri="s3a://bucket/prefix"`` (plus the ``hadoop-aws`` jars and
    the confs from :func:`s3a_conf` on the cluster) and every
    ``write_partitioned`` / ``driver.run_job`` path becomes an object-
    store path. In this sandbox the default stays a local ``file://``
    root; tests exercise the resolution logic, not a network."""

    base_uri: str = "file://" + os.path.join(
        tempfile.gettempdir(), "dock_fdp_spark", "warehouse"
    )

    def path(self, *dataset: str) -> str:
        parts = [p.strip("/") for p in dataset if p]
        return "/".join([self.base_uri.rstrip("/")] + parts)


def s3a_conf(
    bucket_region: str | None = None, anonymous: bool = False
) -> dict[str, str]:
    """The Spark/Hadoop confs an ``s3a://`` SinkLocation needs — returned
    as data (apply with ``spark.conf.set`` or ``--conf``) so the sandbox
    never has to reach a network to cover the logic. Credentials come
    from the standard provider chain (env/instance profile); nothing here
    embeds a secret."""
    conf = {
        # Committer: the magic committer avoids the O(files) rename that
        # makes classic FileOutputCommitter quadratic on object stores.
        "spark.sql.sources.commitProtocolClass": (
            "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
        ),
        "spark.sql.parquet.output.committer.class": (
            "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"
        ),
        "spark.hadoop.fs.s3a.committer.name": "magic",
        # Multipart upload sized for large parquet parts.
        "spark.hadoop.fs.s3a.multipart.size": "134217728",
        "spark.hadoop.fs.s3a.fast.upload": "true",
        "spark.hadoop.fs.s3a.connection.maximum": "96",
    }
    if bucket_region:
        conf["spark.hadoop.fs.s3a.endpoint.region"] = bucket_region
    if anonymous:
        conf["spark.hadoop.fs.s3a.aws.credentials.provider"] = (
            "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider"
        )
    return conf


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
        read_parquet_or_empty(spark, out, orders.schema)
        .groupBy(F.col("order_year").cast("bigint").alias("order_year"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(27,2)")), 2)
            .cast("double")
            .alias("total"),
        )
    )
