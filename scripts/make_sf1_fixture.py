"""Build the sf1 rehearsal fixture (10x sf0.1) at /tmp/dock_sf1.

The driver ships sf0.001/0.01/0.1; the 100x-scale argument for the
heavy dedup family is otherwise plan-shape reasoning only. This script
manufactures an honest 10x corpus from sf0.1 for a measured data point
(VERDICT r7 item 7):

- documents: 10 copies; copy c != 0 suffixes every token with "_c{c}".
  Within-copy duplicate/near-duplicate structure is preserved EXACTLY
  (token-level bijection), while cross-copy shingle/minhash collisions
  are impossible — so the duplicate RATE stays at the sf0.1 level
  instead of the pathological 10x-everything-duplicated a naive tile
  would create.
- embeddings: 10 copies; copy c circularly rotates the 64-dim vector by
  c positions. Rotation preserves norms and all within-copy distances
  exactly; cross-copy similarities decorrelate.

Run:  python scripts/make_sf1_fixture.py [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dock_financial_data_pipelines_spark.catalog import load
from dock_financial_data_pipelines_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
N_COPIES = 10
ID_STRIDE = 10_000_000


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dock_sf1"
    spark = get_spark("make-sf1")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load(spark, SRC, "documents")
    copies = spark.range(N_COPIES).select(F.col("id").cast("int").alias("c"))
    d = (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("c").cast("long") * ID_STRIDE).alias(
                "doc_id"
            ),
            F.when(F.col("c") == 0, F.col("text"))
            .otherwise(
                F.array_join(
                    F.transform(
                        F.split("text", " "),
                        lambda t: F.concat(
                            t, F.lit("_c"), F.col("c").cast("string")
                        ),
                    ),
                    " ",
                )
            )
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )
    d.repartition(8).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )

    emb = load(spark, SRC, "embeddings")
    e = (
        emb.crossJoin(copies)
        .select(
            (F.col("vec_id") + F.col("c").cast("long") * ID_STRIDE).alias(
                "vec_id"
            ),
            F.when(F.col("c") == 0, F.col("embedding"))
            .otherwise(
                F.concat(
                    F.slice(
                        F.col("embedding"),
                        F.col("c") + 1,
                        F.size("embedding") - F.col("c"),
                    ),
                    F.slice(F.col("embedding"), 1, F.col("c")),
                )
            )
            .alias("embedding"),
            "label",
        )
    )
    e.repartition(4).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )

    # Relational 10x (round-9: extend the rehearsal beyond the document
    # family — VERDICT r8 item 3b/4). Honest scale-up shape: FACTS tile
    # 10x with key striding (orders/lineitem stay join-consistent via
    # the same o_orderkey stride; foreign keys into dims are left
    # unchanged so per-dim fan-in grows 10x, exactly what a real
    # volume scale-up does), DIMS are copied verbatim (dim cardinality
    # does not grow with fact volume).
    orders = load(spark, SRC, "orders")
    (
        orders.crossJoin(copies)
        .select(
            (F.col("o_orderkey") + F.col("c").cast("long") * ID_STRIDE).alias(
                "o_orderkey"
            ),
            *[c for c in orders.columns if c != "o_orderkey"],
        )
        .repartition(16)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "orders.parquet"))
    )
    li = load(spark, SRC, "lineitem")
    (
        li.crossJoin(copies)
        .select(
            (F.col("l_orderkey") + F.col("c").cast("long") * ID_STRIDE).alias(
                "l_orderkey"
            ),
            *[c for c in li.columns if c != "l_orderkey"],
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "lineitem.parquet"))
    )
    ev = load(spark, SRC, "events")
    (
        # stride is a multiple of 4 so copy 0's event_id % 4 chunk
        # assignment (the x17 batch composition) is preserved per copy
        ev.crossJoin(copies)
        .select(
            (F.col("event_id") + F.col("c").cast("long") * ID_STRIDE).alias(
                "event_id"
            ),
            *[c for c in ev.columns if c != "event_id"],
        )
        .repartition(16)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "events.parquet"))
    )
    for dim in ("customer", "supplier", "part", "nation", "region"):
        load(spark, SRC, dim).write.mode("overwrite").parquet(
            os.path.join(out, f"{dim}.parquet")
        )

    print(
        f"sf1 fixture at {out}: "
        f"{spark.read.parquet(os.path.join(out, 'documents.parquet')).count()} docs, "
        f"{spark.read.parquet(os.path.join(out, 'embeddings.parquet')).count()} vectors"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
