"""Spark ↔ DuckDB comparison harness mirroring the driver's t2 gate:
row-count + column names + order-insensitive exact value equality."""

from __future__ import annotations

import os

import duckdb
import pandas as pd

from dock_financial_data_pipelines_spark.catalog import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.isdir(path):
            # Spark-written table (a directory of part files), e.g. the
            # /tmp/dock_sf1 rehearsal fixture: glob the parts.
            con.execute(
                f"CREATE VIEW {name} AS "
                f"SELECT * FROM read_parquet('{path}/*.parquet')"
            )
        else:
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(
        drop=True
    )


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    s = _canon(spark_pdf)
    o = _canon(oracle_pdf)
    for c in s.columns:
        sc, oc = s[c], o[c]
        # int-vs-float dtype drift (e.g. DuckDB HUGEINT sums arriving as
        # float64) would survive a value-coerced compare but break the
        # driver's hash — treat it as a schema mismatch.
        assert not (
            (sc.dtype.kind in "iu") != (oc.dtype.kind in "iu")
        ), f"{name}: dtype kind mismatch on {c}: spark={sc.dtype} oracle={oc.dtype}"
        if sc.dtype.kind == "f" or oc.dtype.kind == "f":
            import numpy as np

            sa = sc.astype(float).to_numpy()
            oa = oc.astype(float).to_numpy()
            both_nan = pd.isna(sa) & pd.isna(oa)
            equal = (sa == oa) | both_nan
            assert equal.all(), (
                f"{name}: float column {c} differs at rows "
                f"{np.where(~equal)[0][:5]}: "
                f"spark={sa[~equal][:5]} oracle={oa[~equal][:5]}"
            )
        else:
            sc = sc.astype(str)
            oc = oc.astype(str)
            diff = sc != oc
            assert not diff.any(), (
                f"{name}: column {c} differs at rows {list(diff[diff].index[:5])}: "
                f"spark={list(sc[diff][:5])} oracle={list(oc[diff][:5])}"
            )


def run_and_compare(spark, sf_dir: str, name: str, fn, oracle: str):
    spark_pdf = fn(spark, sf_dir).toPandas()
    con = duck_connection(sf_dir)
    try:
        oracle_pdf = con.execute(oracle).df()
    finally:
        con.close()
    compare_frames(spark_pdf, oracle_pdf, name)
