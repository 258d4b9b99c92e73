"""Multimodal column handling (SURVEY.md §2-B L7, S4).

Policy: image/audio/video travel as opaque ``binary`` columns next to a
typed metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` over iterator-of-batches (never whole-partition
materialization — SURVEY.md §4.3). The container has no image/audio
libraries, so the decode step is a clearly-marked deterministic stub
(`_fake_decode`); the Spark-side plumbing — schema, batching, UDF
signatures, partitioning — is real and tested.

The binary payloads here are the documents' utf-8 bytes, standing in for
media blobs exactly the way the reference moves opaque ZIP bytes it
never parses (REPORT:200, README:11).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from dock_financial_data_pipelines_spark.catalog import load
from dock_financial_data_pipelines_spark.registry import query


def to_multimodal(docs: DataFrame) -> DataFrame:
    """documents → (asset_id, content: binary, meta: struct)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.encode("text", "utf-8")).alias("n_bytes"),
        ).alias("meta"),
    )


_DECODED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("lang", StringType()),
        StructField("byte_len", LongType()),
        StructField("feature", LongType()),
    ]
)


def _fake_decode(content: bytes) -> int:
    """STUB decode/feature-extract. A real deployment would decode the
    media here (PIL / torchaudio / ffmpeg are not in this container).
    Deterministic fake feature: sum of the first 16 bytes."""
    return int(sum(content[:16]))


def decode_assets(assets: DataFrame) -> DataFrame:
    """mapInPandas decode: iterator-of-batches in, iterator out."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "lang": [m["lang"] for m in pdf["meta"]],
                    "byte_len": [len(c) for c in pdf["content"]],
                    "feature": [_fake_decode(c) for c in pdf["content"]],
                }
            )

    return assets.mapInPandas(decode, _DECODED_SCHEMA)


# ---------------------------------------------------------------------------
# L7 — multimodal pipeline: encode → binary column + metadata struct →
# mapInPandas decode → aggregate. byte_len == length(text) for the ascii
# fixture text, which gives the SQL oracle.
# ---------------------------------------------------------------------------
@query(
    "l7_multimodal_decode",
    oracle="""
    SELECT lang,
           count(*) AS n_assets,
           CAST(sum(length(text)) AS BIGINT) AS total_bytes
    FROM documents GROUP BY 1
    """,
)
def l7_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = to_multimodal(load(spark, sf_dir, "documents"))
    return (
        decode_assets(assets)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum("byte_len").alias("total_bytes"),
        )
    )


# ---------------------------------------------------------------------------
# L7b — binary frame-sampling shape: slice fixed-width "frames" out of the
# binary payload JVM-side (substr on binary), no Python at all.
# ---------------------------------------------------------------------------
@query(
    "l7_binary_frame_sample",
    oracle="""
    SELECT CAST(doc_id % 10 AS BIGINT) AS shard,
           count(*) AS n_assets,
           CAST(sum(least(length(text), 32)) AS BIGINT) AS sampled_bytes
    FROM documents GROUP BY 1
    """,
)
def l7_binary_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = to_multimodal(load(spark, sf_dir, "documents")).withColumn(
        "frame", F.expr("substr(content, 1, 32)")
    )
    return assets.groupBy(
        (F.col("asset_id") % 10).cast("bigint").alias("shard")
    ).agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum(F.octet_length("frame")).alias("sampled_bytes"),
    )


# ---------------------------------------------------------------------------
# L7c — media transform (resize) plumbing: binary in → binary out with
# updated metadata, over iterator-of-batches mapInPandas. The "resize"
# is a deterministic stub (truncate payload to a byte budget — the
# container ships no image libs); the REAL parts are the contract a
# production transform drops into: binary columns both directions,
# struct metadata rewrite, Arrow batching, and per-batch bounded memory.
# ---------------------------------------------------------------------------
_RESIZE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("content", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes_in", LongType()),
        StructField("n_bytes_out", LongType()),
    ]
)

_RESIZE_BUDGET = 64  # stub "target resolution" in bytes


def resize_assets(assets: DataFrame, budget: int = _RESIZE_BUDGET) -> DataFrame:
    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "asset_id": pdf["asset_id"],
                "content": [bytes(c)[:budget] for c in pdf["content"]],
                "mime": [m["mime"] for m in pdf["meta"]],
                "n_bytes_in": [int(m["n_bytes"]) for m in pdf["meta"]],
                "n_bytes_out": [min(len(bytes(c)), budget) for c in pdf["content"]],
            }
            yield pd.DataFrame(out)

    return assets.mapInPandas(resize, _RESIZE_SCHEMA)


@query(
    "l7_resize_stub",
    oracle=f"""
    SELECT count(*) AS n_assets,
           CAST(sum(least(length(text), {_RESIZE_BUDGET})) AS BIGINT) AS total_out_bytes,
           CAST(sum(length(text)) AS BIGINT) AS total_in_bytes
    FROM documents
    """,
)
def l7_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = to_multimodal(load(spark, sf_dir, "documents"))
    resized = resize_assets(assets)
    return resized.agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum("n_bytes_out").alias("total_out_bytes"),
        F.sum("n_bytes_in").alias("total_in_bytes"),
    )


# ---------------------------------------------------------------------------
# L7d — binary-payload dedup: group media assets by md5 of the raw
# bytes — the baseline every image/audio dedup pipeline runs before
# any perceptual hashing (exact-duplicate files are the bulk of crawl
# waste). Hashing happens ON the binary column (JVM md5 over bytes);
# the oracle hashes the same utf-8 bytes via DuckDB's md5(text). Same
# one-shuffle shape as l3 exact dedup, but over the multimodal
# carrier — at 100 TB only (hash, asset_id, n_bytes) shuffles, never
# the payload.
# ---------------------------------------------------------------------------
@query(
    "l7_binary_dedup",
    oracle="""
    SELECT md5(text) AS content_md5,
           count(*) AS n_copies,
           min(doc_id) AS kept_asset,
           CAST(sum(length(text)) AS BIGINT) AS total_bytes
    FROM documents
    GROUP BY 1
    """,
)
def l7_binary_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = to_multimodal(load(spark, sf_dir, "documents"))
    return (
        assets.groupBy(F.md5("content").alias("content_md5"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("asset_id").alias("kept_asset"),
            F.sum(F.col("meta.n_bytes")).cast("long").alias("total_bytes"),
        )
    )
