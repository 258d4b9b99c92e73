"""Brute-force references for the round-5/6 analytics operators
(Benford chi-square, Theil index, Mann-Kendall, Welch's t, Gini,
lag-1 autocorrelation, OLS regression moments, skew/kurtosis) — the
same independent plain-Python recomputation contract as the other
*_bruteforce modules."""

from __future__ import annotations

import math
import os

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
        pd.DataFrame(
            {"day": o["o_orderdate"].dt.strftime("%Y-%m-%d"), "c": cents}
        )
        .groupby("day")["c"]
        .sum()
        .sort_index()
        / 100.0
    )


def test_benford_chi2_matches_digit_counting(spark):
    _skip_if_empty("orders")
    o = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_totalprice"])
    vals = o[o["o_totalprice"] >= 1]["o_totalprice"]
    got_df = _run(spark, "q_benford_chi2")
    if vals.empty:
        assert len(got_df) == 0
        return
    got = got_df.iloc[0]
    digits = vals.apply(lambda v: int(str(int(math.floor(v)))[0]))
    counts = digits.value_counts()
    t = int(counts.sum())
    chi2 = 0.0
    for d, n in counts.items():
        e = math.floor(math.log10(1 + 1 / d) * 1e9 + 0.5) / 1e9
        chi2 += (n - t * e) ** 2 / (t * e)
    assert got["n_orders"] == t
    assert abs(got["chi2"] - chi2) < max(1e-4, chi2 * 1e-6)
    assert got["df"] == 8
    assert bool(got["reject_benford_5pct"]) == (chi2 > 15.507)


def test_theil_index_matches_direct_formula(spark):
    _skip_if_empty("orders")
    got = _run(spark, "a28_theil_index").set_index("seg")
    for seg, grp in _orders_seg().groupby("seg"):
        x = grp["o_totalprice"].to_numpy()
        mu = x.mean()
        theil = float((x / mu * np.log(x / mu)).mean())
        row = got.loc[seg]
        assert row["n_orders"] == len(x), seg
        assert abs(row["theil_t"] - theil) < 2e-6, seg


def test_mann_kendall_matches_quadratic_scan(spark):
    _skip_if_empty("orders")
    got = _run(spark, "a29_trend_mann_kendall").iloc[0]
    # exact-cents comparison mirrors the engines' DECIMAL equality
    rev = [int(round(v * 100)) for v in _daily_rev()]
    s = 0
    n_pairs = 0
    for i in range(len(rev)):
        for j in range(i + 1, len(rev)):
            n_pairs += 1
            s += (rev[j] > rev[i]) - (rev[j] < rev[i])
    assert got["mk_s"] == s
    assert got["n_pairs"] == n_pairs
    assert abs(got["kendall_tau"] - s / n_pairs) < 2e-6


def test_welch_ttest_matches_textbook_formula(spark):
    _skip_if_empty("orders")
    got = _run(spark, "a30_welch_ttest").set_index(["seg_a", "seg_b"])
    groups = {
        seg: grp["o_totalprice"].to_numpy()
        for seg, grp in _orders_seg().groupby("seg")
    }
    segs = sorted(groups)
    checked = 0
    for i, a in enumerate(segs):
        for b in segs[i + 1 :]:
            xa, xb = groups[a], groups[b]
            if len(xa) < 2 or len(xb) < 2:
                continue
            va, vb = xa.var(ddof=1), xb.var(ddof=1)
            se2 = va / len(xa) + vb / len(xb)
            t = (xa.mean() - xb.mean()) / math.sqrt(se2)
            df = se2**2 / (
                (va / len(xa)) ** 2 / (len(xa) - 1)
                + (vb / len(xb)) ** 2 / (len(xb) - 1)
            )
            row = got.loc[(a, b)]
            assert row["n_a"] == len(xa) and row["n_b"] == len(xb)
            assert abs(row["t_stat"] - t) < 1e-5, (a, b)
            assert abs(row["welch_df"] - df) < max(1e-4, df * 1e-6), (a, b)
            checked += 1
    assert checked == len(got)


def test_gini_matches_rank_formula(spark):
    _skip_if_empty("orders")
    got = _run(spark, "a26_gini_concentration").set_index("seg")
    for seg, grp in _orders_seg().groupby("seg"):
        grp = grp.sort_values(["o_totalprice", "o_orderkey"])
        x = grp["o_totalprice"].to_numpy()
        n = len(x)
        r = np.arange(1, n + 1)
        gini = 2 * float((r * x).sum()) / (n * x.sum()) - (n + 1) / n
        row = got.loc[seg]
        assert row["n_orders"] == n, seg
        assert abs(row["gini"] - gini) < 2e-6, seg


def test_lag1_autocorr_matches_numpy(spark):
    _skip_if_empty("orders")
    got = _run(spark, "a25_autocorrelation").iloc[0]
    rev = _daily_rev().to_numpy()
    x, y = rev[:-1], rev[1:]
    assert got["n_pairs"] == len(x)
    if len(x) < 2 or np.var(x) == 0 or np.var(y) == 0:
        # constant series: r is 0/0 — which way the raw-moment form
        # resolves is cancellation noise; cross-engine hash parity
        # already pins that the two engines agree with each other
        return
    rho = float(np.corrcoef(x, y)[0, 1])
    assert abs(got["lag1_autocorr"] - rho) < 2e-6


def test_regression_moments_match_lstsq(spark):
    _skip_if_empty("lineitem")
    got = _run(spark, "a23_regression_moments").set_index("l_returnflag")
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    for flag, grp in li.groupby("l_returnflag"):
        x = grp["l_quantity"].to_numpy()
        y = grp["l_extendedprice"].to_numpy()
        slope, intercept = np.polyfit(x, y, 1)
        r2 = float(np.corrcoef(x, y)[0, 1]) ** 2
        row = got.loc[flag]
        assert row["n"] == len(x), flag
        assert abs(row["slope"] - slope) < max(1e-5, abs(slope) * 1e-6)
        assert abs(row["intercept"] - intercept) < max(
            1e-4, abs(intercept) * 1e-6
        )
        assert abs(row["r2"] - r2) < 1e-5, flag


def test_skew_kurtosis_match_central_moments(spark):
    _skip_if_empty("orders")
    got = _run(spark, "a33_skew_kurtosis").set_index("seg")
    for seg, grp in _orders_seg().groupby("seg"):
        x = grp["o_totalprice"].to_numpy()
        d = x - x.mean()
        m2 = (d**2).mean()
        skew = (d**3).mean() / m2**1.5
        exk = (d**4).mean() / m2**2 - 3
        row = got.loc[seg]
        assert row["n_orders"] == len(x), seg
        assert abs(row["skewness"] - skew) < 1e-4, seg
        assert abs(row["excess_kurtosis"] - exk) < 1e-4, seg
