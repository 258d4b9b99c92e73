"""The core correctness gate: every SQL-oracled query must match DuckDB
exactly (row count + schema + values), mirroring the driver's t2 check."""

from __future__ import annotations

import pytest

import dock_financial_data_pipelines_spark as engine
from tests._compare import run_and_compare

engine.load_all()

ORACLED = sorted(engine.ORACLES)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, sf_dir, name):
    run_and_compare(spark, sf_dir, name, engine.QUERIES[name], engine.ORACLES[name])
