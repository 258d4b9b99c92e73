"""Brute-force references for the round-6 statistics battery
(a38-a47): Spearman, chi-square independence, category entropy,
Herfindahl, gap-fill interpolation, MAD outliers, the runs test,
weighted median, the two-sample KS test, and Mann-Whitney U — each
recomputed from raw parquet with pandas/numpy textbook formulations,
independent of the SQL twin oracles."""

from __future__ import annotations

import math
import os
from collections import Counter

import numpy as np
import pandas as pd

import dock_financial_data_pipelines_spark as engine

# Respect the harness fixture override so the hostile-fixture sweeps
# (adversarial/minimal/empty, other SFs) drive these references too.
SF = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


def _run(spark, name: str) -> pd.DataFrame:
    return engine.QUERIES[name](spark, SF).toPandas()


def _skip_if_empty(table: str) -> None:
    import pyarrow.parquet as pq
    import pytest

    if pq.read_metadata(f"{SF}/{table}.parquet").num_rows == 0:
        pytest.skip(f"{table} empty: contract covered by the empty-fixture sweep")


def _orders_seg() -> pd.DataFrame:
    o = pd.read_parquet(f"{SF}/orders.parquet")
    c = pd.read_parquet(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    return o.merge(c, left_on="o_custkey", right_on="c_custkey").rename(
        columns={"c_mktsegment": "seg"}
    )


def _daily_rev() -> pd.Series:
    o = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    cents = (o["o_totalprice"] * 100).round().astype("int64")
    return (
        pd.DataFrame({"day": o["o_orderdate"].dt.normalize(), "c": cents})
        .groupby("day")["c"]
        .sum()
        .sort_index()
        / 100.0
    )


def test_spearman_matches_pandas_rank_pearson(spark):
    _skip_if_empty("lineitem")
    got = _run(spark, "a38_spearman_corr").set_index("flag")
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    li = li[li["l_quantity"] > 0]
    for flag, grp in li.groupby("l_returnflag"):
        rx = grp["l_quantity"].rank(method="average")
        ry = (grp["l_extendedprice"] / grp["l_quantity"]).rank(
            method="average"
        )
        if flag not in got.index:
            assert len(grp) < 2 or rx.nunique() == 1 or ry.nunique() == 1
            continue
        rho = float(np.corrcoef(rx, ry)[0, 1])
        row = got.loc[flag]
        assert row["n_lines"] == len(grp), flag
        assert abs(row["spearman_rho"] - rho) < 2e-6, flag


def test_chi2_independence_matches_contingency_table(spark):
    _skip_if_empty("orders")
    df = _orders_seg()
    tbl = df.groupby(["seg", "o_orderpriority"]).size().unstack(fill_value=0)
    got_df = _run(spark, "a39_chi2_independence")
    if tbl.shape[0] < 2 or tbl.shape[1] < 2:
        assert len(got_df) == 0
        return
    got = got_df.iloc[0]
    n = tbl.values.sum()
    exp = np.outer(tbl.sum(axis=1), tbl.sum(axis=0)) / n
    chi2 = float(((tbl.values - exp) ** 2 / exp).sum())
    v = math.sqrt(chi2 / (n * (min(tbl.shape) - 1)))
    assert got["n_orders"] == n
    assert got["dof"] == (tbl.shape[0] - 1) * (tbl.shape[1] - 1)
    assert abs(got["chi2"] - chi2) < 1e-4
    assert abs(got["cramers_v"] - v) < 2e-6


def test_category_entropy_matches_direct_formula(spark):
    _skip_if_empty("orders")
    got = _run(spark, "a40_category_entropy").set_index("seg")
    df = _orders_seg()
    for seg, grp in df.groupby("seg"):
        counts = grp["o_orderpriority"].value_counts()
        p = counts / counts.sum()
        h = float(-(p * np.log(p)).sum())
        row = got.loc[seg]
        assert row["n_orders"] == len(grp), seg
        assert row["n_priorities"] == len(counts), seg
        assert abs(row["entropy_nats"] - h) < 2e-6, seg
        if len(counts) > 1:
            assert abs(row["entropy_norm"] - h / math.log(len(counts))) < 2e-6


def test_herfindahl_matches_share_squares(spark):
    _skip_if_empty("lineitem")
    got = _run(spark, "a41_herfindahl_index").set_index("nation")
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
    )
    sup = pd.read_parquet(
        f"{SF}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).set_index("s_suppkey")
    nat = pd.read_parquet(
        f"{SF}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).set_index("n_nationkey")
    li["nk"] = li["l_suppkey"].map(sup["s_nationkey"])
    li["rev"] = li["l_extendedprice"] * (1 - li["l_discount"])
    srev = li.groupby(["nk", "l_suppkey"])["rev"].sum()
    for nk, by_sup in srev.groupby(level=0):
        shares = 100 * by_sup / by_sup.sum()
        hhi = float((shares**2).sum())
        row = got.loc[nat.loc[nk, "n_name"]]
        assert row["n_suppliers"] == len(by_sup), nk
        assert abs(row["hhi"] - hhi) < 5e-3, nk


def test_gapfill_interpolation_matches_linear_walk(spark):
    _skip_if_empty("orders")
    got = _run(spark, "a42_gapfill_interpolation").set_index("day")
    daily = _daily_rev()
    days = pd.date_range(daily.index.min(), daily.index.max(), freq="D")
    known = {d: v for d, v in daily.items()}
    known_days = sorted(known)
    assert len(got) == len(days)
    for d in days:
        key = d.strftime("%Y-%m-%d")
        row = got.loc[key]
        if d in known:
            assert row["was_gap"] == 0, key
            assert abs(row["rev_filled"] - known[d]) < 1e-6, key
            continue
        assert row["was_gap"] == 1, key
        prevs = [k for k in known_days if k < d]
        nexts = [k for k in known_days if k > d]
        if not prevs:
            want = known[nexts[0]]
        elif not nexts:
            want = known[prevs[-1]]
        else:
            p, nx = prevs[-1], nexts[0]
            frac = (d - p).days / (nx - p).days
            raw = known[p] + (known[nx] - known[p]) * frac
            want = math.floor(raw * 100 + 0.5) / 100
        # one-cent slack: when raw*100+0.5 lands exactly on an integer,
        # a 1-ulp difference between this expression and the engines'
        # shared form flips the floor by a cent
        assert abs(row["rev_filled"] - want) < 0.011, key


def test_mad_outliers_match_quantile_formula(spark):
    _skip_if_empty("orders")
    got = _run(spark, "a43_mad_outliers").set_index("status")
    o = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderstatus", "o_totalprice"]
    )
    for status, grp in o.groupby("o_orderstatus"):
        x = grp["o_totalprice"].to_numpy()
        med = float(np.quantile(x, 0.5))
        mad = float(np.quantile(np.abs(x - med), 0.5))
        outliers = int((np.abs(x - med) > 3.5 * 1.4826 * mad).sum())
        row = got.loc[status]
        assert row["n_orders"] == len(x), status
        assert abs(row["median_price"] - med) < 1e-3, status
        assert abs(row["mad"] - mad) < 1e-3, status
        assert row["n_outliers"] == outliers, status


def test_runs_test_matches_sequential_scan(spark):
    _skip_if_empty("orders")
    got = _run(spark, "a44_runs_test").iloc[0]
    daily = _daily_rev()
    med = float(np.quantile(daily.to_numpy(), 0.5))
    signs = [1 if v > med else 0 for v in daily if v != med]
    r = sum(
        1
        for i, s in enumerate(signs)
        if i == 0 or signs[i - 1] != s
    )
    n1, n2 = sum(signs), len(signs) - sum(signs)
    if n1 + n2 == 0:
        # every day sits exactly on the median: no signs, all-NULL row
        assert got.isna().all()
        return
    exp = 2 * n1 * n2 / (n1 + n2) + 1
    z = (r - exp) / math.sqrt(
        2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
        / ((n1 + n2) ** 2 * (n1 + n2 - 1))
    )
    assert got["n_above"] == n1 and got["n_below"] == n2
    assert got["n_runs"] == r
    assert abs(got["expected_runs"] - exp) < 2e-6
    assert abs(got["z_score"] - z) < 2e-6


def test_weighted_median_matches_cumulative_walk(spark):
    _skip_if_empty("lineitem")
    got = _run(spark, "a45_weighted_median").set_index("flag")
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    li = li[li["l_quantity"] > 0]
    li["price"] = li["l_extendedprice"] / li["l_quantity"]
    li["wgt"] = li["l_quantity"].astype("int64")
    for flag, grp in li.groupby("l_returnflag"):
        rolled = grp.groupby("price")["wgt"].sum().sort_index()
        tot = int(rolled.sum())
        cum = 0
        for price, w in rolled.items():
            cum += w
            if 2 * cum >= tot:
                break
        row = got.loc[flag]
        assert row["total_quantity"] == tot, flag
        assert abs(row["weighted_median_price"] - price) < 2e-6, flag


def _two_arm_prices():
    o = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )
    o = o[o["o_orderpriority"].isin(("1-URGENT", "5-LOW"))]
    a = o[o["o_orderpriority"] == "1-URGENT"]["o_totalprice"].to_numpy()
    b = o[o["o_orderpriority"] == "5-LOW"]["o_totalprice"].to_numpy()
    return a, b


def test_ks_test_matches_ecdf_sup(spark):
    _skip_if_empty("orders")
    a, b = _two_arm_prices()
    got_df = _run(spark, "a46_ks_test")
    if len(a) == 0 or len(b) == 0:
        assert len(got_df) == 0
        return
    got = got_df.iloc[0]
    n1, n2 = len(a), len(b)
    values = np.unique(np.concatenate([a, b]))
    c1 = np.searchsorted(np.sort(a), values, side="right")
    c2 = np.searchsorted(np.sort(b), values, side="right")
    d = float(np.max(np.abs(c1 / n1 - c2 / n2)))
    crit = 1.358 * math.sqrt((n1 + n2) / (n1 * n2))
    assert got["n_urgent"] == n1 and got["n_low"] == n2
    assert abs(got["ks_d"] - d) < 2e-6
    assert abs(got["ks_crit_05"] - crit) < 2e-6
    assert bool(got["distributions_differ"]) == (d > crit)


def test_mann_whitney_matches_rank_formula(spark):
    _skip_if_empty("orders")
    a, b = _two_arm_prices()
    got_df = _run(spark, "a47_mann_whitney_u")
    if len(a) == 0 or len(b) == 0:
        assert got_df.empty or got_df.iloc[0].isna().any()
        return
    got = got_df.iloc[0]
    pooled = pd.Series(np.concatenate([a, b]))
    ranks = pooled.rank(method="average").to_numpy()
    n1, n2 = len(a), len(b)
    r1 = float(ranks[:n1].sum())
    u1 = r1 - n1 * (n1 + 1) / 2
    ties = Counter(pooled)
    tie_term = sum(t**3 - t for t in ties.values())
    z = (u1 - n1 * n2 / 2) / math.sqrt(
        n1 * n2 / 12
        * ((n1 + n2 + 1) - tie_term / ((n1 + n2) * (n1 + n2 - 1)))
    )
    assert got["n_urgent"] == n1 and got["n_low"] == n2
    assert abs(got["u1"] - u1) < 0.11
    assert abs(got["z_score"] - z) < 2e-6
