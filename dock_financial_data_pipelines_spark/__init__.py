"""dock_financial_data_pipelines_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of
``nathadriele/dock-financial-data-pipelines`` (an Airflow ETL system for
financial balance reports / account statements; see
``/root/reference/dock_etl_pipelines/``) as first-class Spark DataFrame /
SQL operators, plus the LLM-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis) required for 100 TB-scale
training-data processing.

Layout
------
- ``session``    : SparkSession construction with scale-oriented defaults.
- ``catalog``    : fixture table loading + temp-view registration.
- ``registry``   : the query/oracle registry consumed by ``__spark_entry__``.
- ``operators/`` : relational, window, aggregation, dedup, similarity,
                   text-analysis and multimodal operators.
- ``sources/``   : readers (parquet/csv/json/binary+zip) and sinks
                   (partitioned overwrite) — the engine restatement of the
                   reference's SFTP→S3→Lambda-unzip dataflow.
- ``streaming/`` : Structured Streaming surface (windows, watermark,
                   dedup, stateful) + batch twins.
- ``plans/``     : pipeline drivers restating the reference's two DAGs.
"""

from dock_financial_data_pipelines_spark.registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    query,
)

__version__ = "0.1.0"


def load_all() -> None:
    """Import every operator module so registry decorators run."""
    import dock_financial_data_pipelines_spark.functions  # noqa: F401
    import dock_financial_data_pipelines_spark.operators.aggregations  # noqa: F401
    import dock_financial_data_pipelines_spark.operators.dedup  # noqa: F401
    import dock_financial_data_pipelines_spark.operators.joins  # noqa: F401
    import dock_financial_data_pipelines_spark.operators.multimodal  # noqa: F401
    import dock_financial_data_pipelines_spark.operators.quality  # noqa: F401
    import dock_financial_data_pipelines_spark.operators.relational  # noqa: F401
    import dock_financial_data_pipelines_spark.operators.scale  # noqa: F401
    import dock_financial_data_pipelines_spark.operators.similarity  # noqa: F401
    import dock_financial_data_pipelines_spark.operators.text  # noqa: F401
    import dock_financial_data_pipelines_spark.operators.tpch  # noqa: F401
    import dock_financial_data_pipelines_spark.operators.udfs  # noqa: F401
    import dock_financial_data_pipelines_spark.operators.windows  # noqa: F401
    import dock_financial_data_pipelines_spark.plans.pipeline  # noqa: F401
    import dock_financial_data_pipelines_spark.sources.readers  # noqa: F401
    import dock_financial_data_pipelines_spark.sources.pyds  # noqa: F401
    import dock_financial_data_pipelines_spark.sources.rest  # noqa: F401
    import dock_financial_data_pipelines_spark.sources.sinks  # noqa: F401
    import dock_financial_data_pipelines_spark.streaming.batch_twins  # noqa: F401
    import dock_financial_data_pipelines_spark.streaming.streams  # noqa: F401
