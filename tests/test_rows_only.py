"""Rows-only queries (no SQL oracle): must run, return a stable schema,
and be deterministic across two executions."""

from __future__ import annotations

import pytest

import dock_financial_data_pipelines_spark as engine

engine.load_all()

ROWS_ONLY = sorted(set(engine.QUERIES) - set(engine.ORACLES))
# Streaming smoke queries are exercised separately (slower: checkpoint setup)
_STREAMING = {n for n in ROWS_ONLY if n.startswith("x")}
_BATCH_ROWS_ONLY = [n for n in ROWS_ONLY if n not in _STREAMING]


@pytest.mark.parametrize("name", _BATCH_ROWS_ONLY)
def test_rows_only_runs_and_is_deterministic(spark, sf_dir, name):
    fn = engine.QUERIES[name]
    first = fn(spark, sf_dir)
    schema1 = first.schema
    pdf1 = first.toPandas()
    second = fn(spark, sf_dir)
    assert second.schema == schema1
    pdf2 = second.toPandas()
    assert len(pdf1) == len(pdf2)


@pytest.mark.parametrize("name", sorted(_STREAMING))
def test_streaming_smoke(spark, sf_dir, name):
    pdf = engine.QUERIES[name](spark, sf_dir).toPandas()
    assert len(pdf) >= 0
