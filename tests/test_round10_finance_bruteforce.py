"""Brute-force references for the round-10 finance additions:
q_supplier_hhi (explicit share loop), q_dupont_decomposition (ratio
tree from raw sums), q_receivables_aging (calendar day-count walk).
Plain-Python recomputation from raw parquet — independent of the SQL
twin oracles. Honors TEST_SF_DIR."""

from __future__ import annotations

import math
import os
from collections import defaultdict

import pandas as pd
import pytest

import dock_financial_data_pipelines_spark as engine

SF = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")

TOL = 1.1e-6


def _run(spark, name: str) -> pd.DataFrame:
    return engine.QUERIES[name](spark, SF).toPandas()


def _skip_if_empty(table: str) -> None:
    import pyarrow.parquet as pq

    if pq.read_metadata(f"{SF}/{table}.parquet").num_rows == 0:
        pytest.skip(f"{table} empty: covered by the empty-fixture sweep")


def _r6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _r2(x: float) -> float:
    return math.floor(x * 1e2 + 0.5) / 1e2


def _t(table: str) -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/{table}.parquet")


def test_supplier_hhi_matches_share_loop(spark):
    _skip_if_empty("lineitem")
    _skip_if_empty("supplier")
    li, sup, nat = _t("lineitem"), _t("supplier"), _t("nation")
    nation_of_sup = dict(zip(sup["s_suppkey"], sup["s_nationkey"]))
    name_of_nat = dict(zip(nat["n_nationkey"], nat["n_name"]))
    rev = defaultdict(float)  # (nationkey, suppkey) -> fsum accumulator
    parts = defaultdict(list)
    for sk, ep, dc in zip(
        li["l_suppkey"], li["l_extendedprice"], li["l_discount"]
    ):
        if sk in nation_of_sup:
            parts[(nation_of_sup[sk], sk)].append(ep * (1 - dc))
    rev = {k: math.fsum(v) for k, v in parts.items()}
    by_nat = defaultdict(dict)
    for (nk, sk), r in rev.items():
        by_nat[nk][sk] = r
    got = _run(spark, "q_supplier_hhi")
    expected_rows = {}
    for nk, sups in by_nat.items():
        tot = math.fsum(sups.values())
        if tot <= 0:
            continue
        shares = [r / tot for r in sups.values()]
        hhi = _r6(math.fsum(s * s for s in shares))
        cls = (
            "concentrated"
            if hhi > 0.25
            else "moderate" if hhi > 0.15 else "competitive"
        )
        expected_rows[name_of_nat[nk]] = (
            len(sups),
            hhi,
            _r6(max(shares)),
            cls,
        )
    assert set(got["nation"]) == set(expected_rows)
    for _, row in got.iterrows():
        n_sup, hhi, top, cls = expected_rows[row["nation"]]
        assert row["n_suppliers"] == n_sup
        # decimal-cast sums vs fsum agree well inside the 1e-6 grid
        assert abs(row["hhi"] - hhi) < 2e-6
        assert abs(row["top_share"] - top) < 2e-6
        assert row["classification"] == cls


def test_dupont_decomposition_matches_ratio_tree(spark):
    _skip_if_empty("lineitem")
    _skip_if_empty("customer")
    li, o, p, c = _t("lineitem"), _t("orders"), _t("part"), _t("customer")
    cust_of_order = dict(zip(o["o_orderkey"], o["o_custkey"]))
    seg_of_cust = dict(zip(c["c_custkey"], c["c_mktsegment"]))
    price_of_part = dict(zip(p["p_partkey"], p["p_retailprice"]))
    revs, profits = defaultdict(list), defaultdict(list)
    for ok, pk, qty, ep, dc in zip(
        li["l_orderkey"],
        li["l_partkey"],
        li["l_quantity"],
        li["l_extendedprice"],
        li["l_discount"],
    ):
        if ok not in cust_of_order or pk not in price_of_part:
            continue
        seg = seg_of_cust.get(cust_of_order[ok])
        if seg is None:
            continue
        nr = ep * (1 - dc)
        revs[seg].append(nr)
        profits[seg].append(nr - 0.8 * price_of_part[pk] * qty)
    assets = defaultdict(list)
    for ck, seg, bal in zip(
        c["c_custkey"], c["c_mktsegment"], c["c_acctbal"]
    ):
        assets[seg].append(bal)
    got = _run(spark, "q_dupont_decomposition")
    for _, row in got.iterrows():
        seg = row["segment"]
        rev = math.fsum(revs[seg])
        prof = math.fsum(profits[seg])
        base = math.fsum(assets[seg])
        assert rev > 0 and base > 0
        assert abs(row["revenue"] - _r2(rev)) < 0.02
        assert abs(row["profit"] - _r2(prof)) < 0.02
        assert abs(row["net_margin"] - _r6(prof / rev)) < 2e-6
        assert abs(row["asset_turnover"] - _r6(rev / base)) < 2e-6
        assert abs(row["roa"] - _r6(prof / base)) < 2e-6
    # every segment with positive revenue and assets must appear
    want_segs = {
        s
        for s in revs
        if math.fsum(revs[s]) > 0 and math.fsum(assets[s]) > 0
    }
    assert set(got["segment"]) == want_segs


def test_receivables_aging_matches_daycount_walk(spark):
    _skip_if_empty("orders")
    _skip_if_empty("customer")
    o, c = _t("orders"), _t("customer")
    seg_of_cust = dict(zip(c["c_custkey"], c["c_mktsegment"]))
    asof = pd.Timestamp("1998-08-02")
    out = defaultdict(lambda: [0, []])  # (segment, bucket) -> [n, amts]
    for ck, st, ts, amt in zip(
        o["o_custkey"], o["o_orderstatus"], o["o_orderdate"], o["o_totalprice"]
    ):
        if st not in ("O", "P") or ck not in seg_of_cust:
            continue
        age = (asof - ts.normalize()).days
        b = (
            "a_current"
            if age <= 0
            else "b_1_30"
            if age <= 30
            else "c_31_60" if age <= 60 else "d_61_90" if age <= 90 else "e_over_90"
        )
        cell = out[(seg_of_cust[ck], b)]
        cell[0] += 1
        cell[1].append(amt)
    got = _run(spark, "q_receivables_aging")
    assert {(r["segment"], r["bucket"]) for _, r in got.iterrows()} == set(
        out
    )
    for _, row in got.iterrows():
        n, amts = out[(row["segment"], row["bucket"])]
        assert row["n_orders"] == n
        assert abs(row["amount"] - _r2(math.fsum(amts))) < 0.02
