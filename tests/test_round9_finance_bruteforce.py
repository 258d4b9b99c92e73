"""Brute-force references for the round-9 finance/risk family:
VaR/CVaR, Sharpe/Sortino, CAPM beta, amortization, roll rates,
day-count accrual, FX triangulation, ECL staging, liquidity ladder,
contribution/breakeven. Textbook plain-Python recomputation from the
raw parquet (explicit loops, math.fsum), independent of the SQL twin
oracles."""

from __future__ import annotations

import math
import os
from collections import Counter, defaultdict

import pandas as pd
import pytest

import dock_financial_data_pipelines_spark as engine

SF = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


def _run(spark, name: str) -> pd.DataFrame:
    return engine.QUERIES[name](spark, SF).toPandas()


def _skip_if_empty(table: str) -> None:
    import pyarrow.parquet as pq

    if pq.read_metadata(f"{SF}/{table}.parquet").num_rows == 0:
        pytest.skip(f"{table} empty: covered by the empty-fixture sweep")


def _orders() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/orders.parquet")


def _seg_returns():
    o = _orders().merge(
        pd.read_parquet(f"{SF}/customer.parquet"),
        left_on="o_custkey",
        right_on="c_custkey",
    )
    o["day"] = o["o_orderdate"].dt.strftime("%Y-%m-%d")
    out = defaultdict(list)
    for (seg, day), g in sorted(
        o.groupby(["c_mktsegment", "day"]), key=lambda kv: kv[0]
    ):
        out[seg].append((day, math.fsum(g["o_totalprice"])))
    rets = {}
    for seg, series in out.items():
        series.sort()
        rets[seg] = [
            (series[i][0], (series[i][1] - series[i - 1][1]) / series[i - 1][1])
            for i in range(1, len(series))
        ]
    return rets


def test_var_cvar_matches_sorted_tail(spark):
    _skip_if_empty("orders")
    rets = _seg_returns()
    got = _run(spark, "q_var_cvar")
    want_segs = sorted(s for s in rets if rets[s])
    assert got["seg"].tolist() == want_segs
    for seg in want_segs:
        rs = sorted((r, d) for d, r in rets[seg])
        n = len(rs)
        k = math.ceil(0.05 * n)
        tail = [r for r, _ in rs[:k]]
        row = got[got["seg"] == seg].iloc[0]
        assert row["n_days"] == n and row["k_tail"] == k
        assert abs(row["var95"] - tail[-1]) < 1.1e-6
        assert abs(row["cvar95"] - math.fsum(tail) / k) < 1.1e-6


def test_sharpe_sortino_matches_moment_loop(spark):
    _skip_if_empty("orders")
    rets = _seg_returns()
    got = _run(spark, "q_sharpe_sortino")
    for seg, series in sorted(rets.items()):
        rs = [r for _, r in series]
        n = len(rs)
        if n < 2:
            assert seg not in set(got["seg"])
            continue
        mu = math.fsum(rs) / n
        var = math.fsum((r - mu) ** 2 for r in rs) / (n - 1)
        if var <= 0:
            assert seg not in set(got["seg"])
            continue
        row = got[got["seg"] == seg].iloc[0]
        assert row["n_days"] == n
        assert abs(row["mean_ret"] - mu) < 1e-5
        assert abs(row["std_ret"] - math.sqrt(var)) < 1e-5
        assert (
            abs(row["sharpe_annual"] - mu / math.sqrt(var) * math.sqrt(252))
            < 1e-4
        )
        downs = [r for r in rs if r < 0]
        if downs:
            dstd = math.sqrt(math.fsum(r * r for r in downs) / len(downs))
            if dstd > 0:
                assert (
                    abs(row["sortino_annual"] - mu / dstd * math.sqrt(252))
                    < 1e-4
                )


def test_beta_capm_matches_cov_loop(spark):
    _skip_if_empty("orders")
    o = _orders().merge(
        pd.read_parquet(f"{SF}/customer.parquet"),
        left_on="o_custkey",
        right_on="c_custkey",
    )
    o["day"] = o["o_orderdate"].dt.strftime("%Y-%m-%d")
    seg_daily = defaultdict(dict)
    for (seg, day), g in o.groupby(["c_mktsegment", "day"]):
        seg_daily[seg][day] = math.fsum(g["o_totalprice"])
    mkt_daily = {}
    for day, g in o.groupby("day"):
        mkt_daily[day] = math.fsum(g["o_totalprice"])
    mdays = sorted(mkt_daily)
    mret = {
        mdays[i]: (mkt_daily[mdays[i]] - mkt_daily[mdays[i - 1]])
        / mkt_daily[mdays[i - 1]]
        for i in range(1, len(mdays))
    }
    got = _run(spark, "q_beta_capm")
    for seg, daily in sorted(seg_daily.items()):
        days = sorted(daily)
        pairs = []
        for i in range(1, len(days)):
            d = days[i]
            if d in mret:
                r = (daily[d] - daily[days[i - 1]]) / daily[days[i - 1]]
                pairs.append((r, mret[d]))
        n = len(pairs)
        if n < 2:
            assert seg not in set(got["seg"])
            continue
        sr = math.fsum(r for r, _ in pairs)
        sm = math.fsum(m for _, m in pairs)
        srm = math.fsum(r * m for r, m in pairs)
        smm = math.fsum(m * m for _, m in pairs)
        if n * smm - sm * sm == 0:
            assert seg not in set(got["seg"])
            continue
        beta = (n * srm - sr * sm) / (n * smm - sm * sm)
        row = got[got["seg"] == seg].iloc[0]
        assert row["n_days"] == n
        assert abs(row["beta"] - beta) < 1e-4
        assert abs(row["alpha"] - (sr / n - beta * sm / n)) < 1e-5


def test_amortization_schedule_matches_recursion(spark):
    _skip_if_empty("orders")
    _skip_if_empty("customer")
    _skip_if_empty("nation")
    _skip_if_empty("region")
    o = (
        _orders()
        .merge(
            pd.read_parquet(f"{SF}/customer.parquet"),
            left_on="o_custkey",
            right_on="c_custkey",
        )
        .merge(
            pd.read_parquet(f"{SF}/nation.parquet"),
            left_on="c_nationkey",
            right_on="n_nationkey",
        )
        .merge(
            pd.read_parquet(f"{SF}/region.parquet"),
            left_on="n_regionkey",
            right_on="r_regionkey",
        )
    )
    got = _run(spark, "q_amortization_schedule")
    i = 0.01
    for region, g in o.groupby("r_name"):
        p = math.fsum(g["o_totalprice"]) / len(g)
        gn = 1.01**12
        pmt = p * i * gn / (gn - 1)
        # explicit recursion — the closed form must reproduce it
        bal, prev = p, p
        sub = got[got["r_name"] == region].sort_values("period")
        assert len(sub) == 12
        for t in range(1, 13):
            bal = bal * 1.01 - pmt
            row = sub[sub["period"] == t].iloc[0]
            assert abs(row["payment"] - pmt) < 0.02
            assert abs(row["balance_after"] - bal) < 0.02, (region, t)
            assert abs(row["principal_paid"] - (prev - bal)) < 0.03
            prev = bal
        assert abs(bal) < 1e-6 * max(1.0, p)  # fully amortized


def test_roll_rate_matrix_matches_transition_loop(spark):
    _skip_if_empty("orders")
    o = _orders()

    def bucket(v):
        return "low" if v < 150000 else ("mid" if v < 300000 else "high")

    trans = Counter()
    for _, g in o.groupby("o_custkey"):
        g = g.sort_values(["o_orderdate", "o_orderkey"])
        vals = [bucket(v) for v in g["o_totalprice"]]
        for i in range(1, len(vals)):
            trans[(vals[i - 1], vals[i])] += 1
    got = _run(spark, "q_roll_rate_matrix")
    assert len(got) == len(trans)
    fro_tot = Counter()
    for (f, _), c in trans.items():
        fro_tot[f] += c
    for (f, t), c in trans.items():
        row = got[(got["from_bucket"] == f) & (got["to_bucket"] == t)].iloc[0]
        assert row["n_transitions"] == c
        assert abs(row["roll_rate"] - c / fro_tot[f]) < 1.1e-6


def test_interest_accrual_matches_date_loop(spark):
    _skip_if_empty("orders")
    o = _orders()
    got = _run(spark, "q_interest_accrual_daycount")
    acc = defaultdict(lambda: [0, 0.0, 0.0])
    for _, row in o.iterrows():
        d1 = row["o_orderdate"].date()
        d2 = (row["o_orderdate"] + pd.Timedelta(days=45)).date()
        e360 = (
            360 * (d2.year - d1.year)
            + 30 * (d2.month - d1.month)
            + (min(d2.day, 30) - min(d1.day, 30))
        )
        p = row["o_totalprice"]
        ia = math.floor(p * 0.06 * 45 / 360 * 100 + 0.5) / 100
        ie = math.floor(p * 0.06 * e360 / 360 * 100 + 0.5) / 100
        mon = d1.strftime("%Y-%m")
        acc[mon][0] += 1
        acc[mon][1] += ia
        acc[mon][2] += ie
    assert got["mon"].tolist() == sorted(acc)
    for mon, (n, ia, ie) in acc.items():
        row = got[got["mon"] == mon].iloc[0]
        assert row["n_orders"] == n
        assert abs(row["interest_act360"] - ia) < 0.011
        assert abs(row["interest_30e360"] - ie) < 0.011
        assert abs(row["basis_difference"] - (ia - ie)) < 0.011


def test_ecl_staging_matches_stage_loop(spark):
    _skip_if_empty("orders")
    _skip_if_empty("customer")
    _skip_if_empty("nation")
    _skip_if_empty("region")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    first_ship = (
        li.groupby("l_orderkey")["l_shipdate"].min()
        if len(li)
        else pd.Series(dtype="datetime64[ns]")
    )
    o = (
        _orders()
        .merge(
            pd.read_parquet(f"{SF}/customer.parquet"),
            left_on="o_custkey",
            right_on="c_custkey",
        )
        .merge(
            pd.read_parquet(f"{SF}/nation.parquet"),
            left_on="c_nationkey",
            right_on="n_nationkey",
        )
        .merge(
            pd.read_parquet(f"{SF}/region.parquet"),
            left_on="n_regionkey",
            right_on="r_regionkey",
        )
    )
    got = _run(spark, "q_ecl_staging")
    acc = defaultdict(lambda: [0, 0.0, 0.0])
    rates = {1: 0.01, 2: 0.05, 3: 0.5}
    for _, row in o.iterrows():
        fs = first_ship.get(row["o_orderkey"])
        if fs is None or pd.isna(fs):
            stage = 3
        else:
            delay = (fs.date() - row["o_orderdate"].date()).days
            stage = 1 if delay <= 30 else (2 if delay <= 60 else 3)
        p = row["o_totalprice"]
        key = (row["r_name"], stage)
        acc[key][0] += 1
        acc[key][1] += p
        acc[key][2] += math.floor(p * rates[stage] * 100 + 0.5) / 100
    assert len(got) == len(acc)
    for (region, stage), (n, exp, prov) in acc.items():
        row = got[(got["r_name"] == region) & (got["stage"] == stage)].iloc[0]
        assert row["n_orders"] == n
        assert abs(row["exposure"] - exp) < 0.02
        assert abs(row["provision"] - prov) < 0.02


def test_liquidity_ladder_matches_bucket_loop(spark):
    _skip_if_empty("orders")
    o = _orders()
    asof = max(d.date() for d in o["o_orderdate"])
    buckets = {0: "matured", 1: "d0_7", 2: "d8_30", 3: "d31_90", 4: "d90_plus"}
    acc = defaultdict(lambda: [0, 0.0])
    for _, row in o.iterrows():
        rem = ((row["o_orderdate"] + pd.Timedelta(days=45)).date() - asof).days
        b = 0 if rem < 0 else (1 if rem <= 7 else (2 if rem <= 30 else (3 if rem <= 90 else 4)))
        acc[b][0] += 1
        acc[b][1] += row["o_totalprice"]
    got = _run(spark, "q_liquidity_ladder")
    assert got["bucket"].tolist() == [buckets[b] for b in sorted(acc)]
    total = math.fsum(v for _, v in acc.values())
    cum = 0.0
    for b in sorted(acc):
        cum += acc[b][1]
        row = got[got["bucket"] == buckets[b]].iloc[0]
        assert row["n_orders"] == acc[b][0]
        assert abs(row["expected_cash"] - acc[b][1]) < 0.02
        assert abs(row["cumulative_share"] - cum / total) < 1e-5


def test_contribution_breakeven_matches_unit_loop(spark):
    _skip_if_empty("lineitem")
    _skip_if_empty("part")
    li = pd.read_parquet(f"{SF}/lineitem.parquet").merge(
        pd.read_parquet(f"{SF}/part.parquet"),
        left_on="l_partkey",
        right_on="p_partkey",
    )
    got = _run(spark, "q_contribution_breakeven")
    for brand, g in li.groupby("p_brand"):
        units = math.fsum(g["l_quantity"])
        contrib = math.fsum(
            e * (1 - d) - 0.8 * rp * q
            for e, d, rp, q in zip(
                g["l_extendedprice"],
                g["l_discount"],
                g["p_retailprice"],
                g["l_quantity"],
            )
        )
        if units <= 0 or contrib <= 0:
            assert brand not in set(got["p_brand"])
            continue
        row = got[got["p_brand"] == brand].iloc[0]
        assert row["n_lines"] == len(g)
        assert row["units"] == int(units)
        assert abs(row["contribution"] - contrib) < 0.02
        cpu = contrib / units
        assert abs(row["contribution_per_unit"] - cpu) < 1e-4
        assert row["breakeven_units"] == math.ceil(1_000_000.0 / cpu)
