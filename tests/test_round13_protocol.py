"""Round-13 additions: partition-spec evolution and _metadata lineage.

Brute-force references recomputed from raw parquet with plain
pandas/Python (no Spark, no DuckDB) so a defect shared by the engine
query and its oracle twin would still surface, plus pure-protocol
tests for the spec-record / pruning primitives and a filesystem audit
that spec evolution really leaves v1's files untouched."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pytest

import dock_financial_data_pipelines_spark as engine
from dock_financial_data_pipelines_spark.catalog import sf_tag
from dock_financial_data_pipelines_spark.plans.pipeline import (
    _PE_DOM_SPLIT,
    _pe_dirs,
    _pe_prune,
    _pe_read_spec,
    _pe_write_spec,
)

SF = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


def _skip_if_empty(table: str) -> None:
    import pyarrow.parquet as pq

    if pq.read_metadata(f"{SF}/{table}.parquet").num_rows == 0:
        pytest.skip(f"{table} empty: covered by the empty-fixture sweep")


# ---------------------------------------------------------------------------
# Pure protocol: spec records + spec-aware pruning
# ---------------------------------------------------------------------------
def test_spec_record_roundtrip(tmp_path):
    root = str(tmp_path / "t")
    _pe_write_spec(root, 1, 1, "identity")
    _pe_write_spec(root, 2, 2, "month")
    assert _pe_read_spec(root, 1) == {
        "spec_id": 1, "transform": "identity", "source": "day",
    }
    assert _pe_read_spec(root, 2)["transform"] == "month"


def test_prune_identity_exact_and_month_coarse():
    days = ["2024-01-02", "2024-01-03", "2024-02-01"]
    months = ["2024-01", "2024-02"]
    ident = {"transform": "identity"}
    month = {"transform": "month"}
    assert _pe_prune(days, ident, "2024-01-03") == ["2024-01-03"]
    assert _pe_prune(days, ident, "2024-01-31") == []
    # the month transform matches the day's month — coarser on purpose
    assert _pe_prune(months, month, "2024-01-17") == ["2024-01"]
    assert _pe_prune(months, month, "2024-03-01") == []


def test_pe_dirs_missing_version_is_empty(tmp_path):
    assert _pe_dirs(str(tmp_path / "nope"), 7) == []


# ---------------------------------------------------------------------------
# Brute-force: the full query vs a pandas recomputation
# ---------------------------------------------------------------------------
def _events_days() -> pd.DataFrame:
    df = pd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "ts"])
    ts = pd.to_datetime(df["ts"])
    out = pd.DataFrame(
        {
            "day": ts.dt.strftime("%Y-%m-%d"),
            "ym": ts.dt.strftime("%Y-%m"),
            "dom": ts.dt.day,
        }
    )
    return out


def test_partition_evolution_matches_pandas(spark):
    _skip_if_empty("events")
    got = (
        engine.QUERIES["pipeline_partition_evolution"](spark, SF)
        .toPandas()
        .set_index("stage_ord")
    )
    e = _events_days()
    v1 = e[e["dom"] <= _PE_DOM_SPLIT]
    v2 = e[e["dom"] > _PE_DOM_SPLIT]

    assert got.loc[0, "n_rows"] == len(v1)
    assert got.loc[0, "n_dirs"] == v1["day"].nunique()
    assert got.loc[1, "n_rows"] == len(v2)
    assert got.loc[1, "n_dirs"] == v2["ym"].nunique()
    assert got.loc[2, "n_rows"] == len(e)
    assert got.loc[2, "n_dirs"] == v1["day"].nunique() + v2["ym"].nunique()

    if len(v1):
        p1 = v1["day"].min()
        assert got.loc[3, "n_rows"] == int((v1["day"] == p1).sum())
        assert got.loc[3, "n_dirs"] == 1
    if len(v2):
        p2 = v2["day"].max()
        scanned = v2[v2["ym"] == p2[:7]]
        assert got.loc[4, "n_rows"] == int((v2["day"] == p2).sum())
        assert got.loc[4, "n_dirs"] == 1
        assert got.loc[5, "n_rows"] == len(scanned)
        assert got.loc[5, "n_dirs"] == scanned["day"].nunique()
        # the honest trade: the coarse era scans >= what it returns
        assert got.loc[5, "n_rows"] >= got.loc[4, "n_rows"]

    # spec_id column: one per era, current spec on the merged read
    assert list(got["spec_id"]) == [1, 2, 2, 1, 2, 2]


def test_partition_evolution_layout_on_disk(spark):
    """After the query runs, the physical layout must show the
    evolution: v1 dirs are day-named, v2 dirs month-named, both spec
    records present — and v1's data files were committed BEFORE v2
    (spec evolution never rewrites history)."""
    _skip_if_empty("events")
    engine.QUERIES["pipeline_partition_evolution"](spark, SF).collect()
    root = os.path.join(
        tempfile.gettempdir(),
        "dock_fdp_spark",
        f"partition_evolution_{sf_tag(SF)}",
    )
    d1, d2 = _pe_dirs(root, 1), _pe_dirs(root, 2)
    assert d1 and all(len(p) == 10 for p in d1)      # yyyy-MM-dd
    if d2:
        assert all(len(p) == 7 for p in d2)          # yyyy-MM
    assert _pe_read_spec(root, 1)["spec_id"] == 1
    if d2:
        assert _pe_read_spec(root, 2)["spec_id"] == 2
    # every v1 data file predates (or equals) the v2 commit's files:
    # nothing in v1 was rewritten when the spec evolved
    def newest(version):
        mt = 0.0
        base = os.path.join(root, "data", f"v={version}")
        for dirpath, _, names in os.walk(base):
            for n in names:
                if n.endswith(".parquet"):
                    mt = max(mt, os.stat(os.path.join(dirpath, n)).st_mtime)
        return mt

    if d2:
        assert newest(1) <= newest(2)


def test_file_metadata_lineage_matches_pandas(spark):
    _skip_if_empty("orders")
    got = (
        engine.QUERIES["s22_file_metadata_lineage"](spark, SF)
        .toPandas()
        .set_index("part_key")
        .sort_index()
    )
    raw = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderstatus"])
    want = raw["o_orderstatus"].value_counts().sort_index()
    assert list(got.index) == list(want.index)
    assert list(got["n_rows"]) == list(want)
    # one task per partition dir -> dense row_index 0..n-1 in one file
    assert (got["row_index_span"] == got["n_rows"]).all()
    assert (got["n_files"] == 1).all()
