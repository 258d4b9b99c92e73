"""REAL Spark Connect smoke test (env-gated).

Runs a 20-query sample of the registry against a genuine Connect
session (``SparkSession.builder.remote(...)``). Requires:

- the Connect client deps (grpcio, grpcio-status,
  googleapis-common-protos) — absent in this sandbox, so the module
  skips cleanly here (the facade-based tests/test_connect_compat.py
  and the o_connect_compat_report oracle query pin the degrade
  contract without a server);
- a Connect endpoint, from ``SPARK_CONNECT_REMOTE`` (e.g.
  ``sc://localhost:15002``) or the in-process ``local`` mode that
  spark-connect ships when the server jars are on the classpath.

On a real deployment: ``pip install 'pyspark[connect]'`` and run
``pytest tests/test_connect_smoke.py`` against the cluster endpoint.
"""

from __future__ import annotations

import os

import pytest

pytest.importorskip(
    "grpc", reason="Spark Connect client deps (grpcio) not installed"
)

import dock_financial_data_pipelines_spark as engine  # noqa: E402

REMOTE = os.environ.get("SPARK_CONNECT_REMOTE", "local")
SF = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")

# A cross-family sample: scans, joins, aggs, windows, dedup, text,
# similarity, finance, SQL surface — none requiring py4j introspection.
SAMPLE = [
    "s1_parquet_scan",
    "p1_project_compute",
    "f1_string_functions",
    "f4_array_functions",
    "j1_inner_join",
    "j2_broadcast_dim_join",
    "j8_asof_join",
    "a1_pricing_summary",
    "a4_rollup",
    "a11_approx_percentiles",
    "w1_rank_functions",
    "w3_running_balance",
    "t2_global_topk",
    "u3_dedup_keep_latest",
    "l1_token_stats",
    "l3_exact_dedup_summary",
    "l5_cosine_topk",
    "q_daily_statement",
    "tpch_q6_forecast_revenue",
    "sql_pipe_syntax_report",
]


@pytest.fixture(scope="module")
def connect_spark():
    from pyspark.sql import SparkSession

    try:
        spark = SparkSession.builder.remote(REMOTE).getOrCreate()
    except Exception as exc:  # no server reachable
        pytest.skip(f"no Spark Connect endpoint at {REMOTE!r}: {exc}")
    yield spark
    spark.stop()


@pytest.mark.parametrize("name", SAMPLE)
def test_connect_query_runs(connect_spark, name):
    engine.load_all()
    df = engine.QUERIES[name](connect_spark, SF)
    assert df.count() >= 0  # runs end-to-end through the Connect planner


def test_connect_plan_metrics_degrade_loudly(connect_spark):
    from dock_financial_data_pipelines_spark import connect_compat as cc
    from dock_financial_data_pipelines_spark.observability import (
        MetricsStore,
        run_with_metrics,
    )

    assert cc.is_connect(connect_spark) is True
    store = MetricsStore()
    run_with_metrics(
        "connect", connect_spark.range(10).groupBy().count(), store
    )
    assert store.runs[-1].plan_metrics_ok is False  # degraded, recorded
