"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``dock_financial_data_pipelines_spark``: the package's
registry holds one entry per implemented operator from SURVEY.md §2
(relational core, joins, windows, aggregations, streaming twins +
readStream smoke, sources/sinks, UDF surface, LLM-data operators), each
with a DuckDB oracle where the semantics are SQL-expressible.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

import dock_financial_data_pipelines_spark as engine

engine.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return engine.QUERIES["flagship_segment_monthly_revenue"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(engine.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable SQL twins; keys without one get rows-only checks."""
    return dict(engine.ORACLES)
