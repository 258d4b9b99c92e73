"""Brute-force references for the round-9 layout probes (VERDICT r9
item 5): s17_compaction_binpack (greedy prefix-sum bin walk over the
monthly partition list) and s18_rowgroup_pruning_probe (dict min/max
per 1000-row chunk, literal predicate vs stats vs rows). Textbook
plain-Python recomputation from the raw orders parquet, independent of
the SQL twin oracles — a defect shared by both engines still surfaces
here. Honors TEST_SF_DIR like every other brute-force module."""

from __future__ import annotations

import os
from collections import defaultdict

import pandas as pd
import pytest

import dock_financial_data_pipelines_spark as engine

SF = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")

COMPACT_TARGET = 2000  # mirrors readers._COMPACT_TARGET
RG_ROWS = 1000  # mirrors s18's synthetic row-group size


def _run(spark, name: str) -> pd.DataFrame:
    return engine.QUERIES[name](spark, SF).toPandas()


def _skip_if_empty(table: str) -> None:
    import pyarrow.parquet as pq

    if pq.read_metadata(f"{SF}/{table}.parquet").num_rows == 0:
        pytest.skip(f"{table} empty: covered by the empty-fixture sweep")


def _orders() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/orders.parquet")


def test_compaction_binpack_matches_greedy_prefix_walk(spark):
    _skip_if_empty("orders")
    o = _orders()
    counts = defaultdict(int)
    for ts in o["o_orderdate"]:
        counts[ts.strftime("%Y-%m")] += 1

    # greedy first-fit walk in month order: a partition lands in bin
    # floor(rows_seen_before_it / target)
    bins = defaultdict(lambda: {"months": [], "rows": 0})
    seen = 0
    for mon in sorted(counts):
        b = seen // COMPACT_TARGET
        bins[b]["months"].append(mon)
        bins[b]["rows"] += counts[mon]
        seen += counts[mon]

    got = _run(spark, "s17_compaction_binpack")
    assert list(got["bin"]) == sorted(bins)
    for _, row in got.iterrows():
        ref = bins[row["bin"]]
        assert row["n_partitions"] == len(ref["months"])
        assert row["first_month"] == ref["months"][0]
        assert row["last_month"] == ref["months"][-1]
        assert row["total_rows"] == ref["rows"]
    # invariant of the greedy walk: bins are contiguous 0..max and
    # every bin except possibly the last closes at >= target rows
    tot = 0
    for b in sorted(bins)[:-1]:
        tot += bins[b]["rows"]
        assert tot >= (b + 1) * COMPACT_TARGET


def test_rowgroup_pruning_probe_matches_chunked_minmax(spark):
    _skip_if_empty("orders")
    o = _orders()
    if o["o_orderkey"].duplicated().any():
        pytest.skip(
            "duplicate o_orderkey: row_number chunk boundaries are "
            "tie-order-dependent; parity pins this fixture instead"
        )
    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1998-01-01")
    rows = sorted(zip(o["o_orderkey"], o["o_orderdate"]))

    outcome = defaultdict(lambda: [0, 0, 0])  # n_rowgroups, scanned, matching
    for start in range(0, len(rows), RG_ROWS):
        chunk = [d for _, d in rows[start : start + RG_ROWS]]
        mn, mx = min(chunk), max(chunk)
        matching = sum(1 for d in chunk if lo <= d < hi)
        if mx < lo or mn >= hi:
            key = "pruned"
        elif matching > 0:
            key = "scan_hit"
        else:
            key = "scan_false_positive"
        outcome[key][0] += 1
        outcome[key][1] += len(chunk)
        outcome[key][2] += matching

    got = _run(spark, "s18_rowgroup_pruning_probe")
    assert list(got["outcome"]) == sorted(outcome)
    for _, row in got.iterrows():
        n_rg, scanned, matching = outcome[row["outcome"]]
        assert row["n_rowgroups"] == n_rg
        assert row["rows_scanned"] == scanned
        assert row["rows_matching"] == matching
    # conservation: every row lands in exactly one outcome class
    assert got["rows_scanned"].sum() == len(rows)
    # stats are sound: a pruned group can never contain a matching row
    pruned = got[got["outcome"] == "pruned"]
    assert pruned.empty or int(pruned["rows_matching"].iloc[0]) == 0


def test_sort_layout_advisor_matches_three_layout_walk(spark):
    _skip_if_empty("orders")
    o = _orders()
    if o["o_orderkey"].duplicated().any():
        pytest.skip(
            "duplicate o_orderkey: insertion-layout chunk boundaries "
            "are tie-order-dependent; parity pins this fixture instead"
        )
    dlo, dhi = pd.Timestamp("1997-01-01"), pd.Timestamp("1998-01-01")
    chi = 500
    rows = list(zip(o["o_orderkey"], o["o_orderdate"], o["o_custkey"]))
    layouts = {
        "a_insertion": sorted(rows, key=lambda r: r[0]),
        "b_by_date": sorted(rows, key=lambda r: (r[1], r[0])),
        "c_by_cust_date": sorted(rows, key=lambda r: (r[2], r[1], r[0])),
    }
    got = engine.QUERIES["s20_sort_layout_advisor"](spark, SF).toPandas()
    assert list(got["layout"]) == sorted(layouts)
    for _, row in got.iterrows():
        ordered = layouts[row["layout"]]
        n_rg = pruned = fp = scanned = matching = 0
        for start in range(0, len(ordered), RG_ROWS):
            chunk = ordered[start : start + RG_ROWS]
            dates = [d for _, d, _ in chunk]
            custs = [c for _, _, c in chunk]
            m = sum(
                1
                for _, d, c in chunk
                if dlo <= d < dhi and c < chi
            )
            matching += m
            n_rg += 1
            if max(dates) < dlo or min(dates) >= dhi or min(custs) >= chi:
                pruned += 1
            else:
                scanned += len(chunk)
                if m == 0:
                    fp += 1
        assert row["n_rowgroups"] == n_rg
        assert row["groups_pruned"] == pruned
        assert row["groups_false_positive"] == fp
        assert row["rows_scanned"] == scanned
        assert row["rows_matching"] == matching
    # conservation: matching rows are layout-invariant
    assert got["rows_matching"].nunique() == 1
