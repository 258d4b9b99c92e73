"""Brute-force references for the round-9 statistics family (a66–a73):
Durbin-Watson, Cronbach's alpha, Cohen's kappa, Kruskal-Wallis,
Ljung-Box, Hurst R/S, Grubbs, Yule-Walker PACF. Textbook plain-Python
recomputation from the raw orders parquet (explicit loops, math.fsum,
numpy lstsq for nothing — closed forms only), independent of the SQL
twin oracles — a defect shared by both engines still surfaces here."""

from __future__ import annotations

import math
import os
from collections import Counter

import pandas as pd
import pytest

import dock_financial_data_pipelines_spark as engine

SF = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")

TOL = 1.1e-6  # engine outputs floor(x*1e6+0.5)/1e6; one grid step


def _run(spark, name: str) -> pd.DataFrame:
    return engine.QUERIES[name](spark, SF).toPandas()


def _skip_if_empty(table: str) -> None:
    import pyarrow.parquet as pq

    if pq.read_metadata(f"{SF}/{table}.parquet").num_rows == 0:
        pytest.skip(f"{table} empty: covered by the empty-fixture sweep")


def _orders() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/orders.parquet")


def _daily_revenue():
    o = _orders()
    o["day"] = o["o_orderdate"].dt.strftime("%Y-%m-%d")
    return sorted(
        (day, math.fsum(g["o_totalprice"]))
        for day, g in o.groupby("day", sort=True)
    )


def _daily_counts():
    o = _orders()
    o["day"] = o["o_orderdate"].dt.strftime("%Y-%m-%d")
    return sorted((day, float(len(g))) for day, g in o.groupby("day"))


def test_durbin_watson_matches_residual_loop(spark):
    _skip_if_empty("orders")
    daily = _daily_revenue()
    n = len(daily)
    if n < 3:
        pytest.skip("series too short: DW undefined")
    got = _run(spark, "a66_durbin_watson")
    t = list(range(1, n + 1))
    y = [v for _, v in daily]
    st, sy = math.fsum(t), math.fsum(y)
    sty = math.fsum(ti * yi for ti, yi in zip(t, y))
    stt = math.fsum(ti * ti for ti in t)
    b1 = (n * sty - st * sy) / (n * stt - st * st)
    b0 = (sy - b1 * st) / n
    e = [yi - (b0 + b1 * ti) for ti, yi in zip(t, y)]
    sse = math.fsum(ei * ei for ei in e)
    ssd = math.fsum((e[i] - e[i - 1]) ** 2 for i in range(1, n))
    assert len(got) == 1
    row = got.iloc[0]
    assert row["n_days"] == n
    assert abs(row["dw"] - ssd / sse) < 1e-4
    assert abs(row["rho_hat"] - (1 - ssd / sse / 2)) < 1e-4


def test_cronbach_alpha_matches_item_variances(spark):
    _skip_if_empty("lineitem")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    n = len(li)
    if n < 2:
        pytest.skip("too few rows: variance undefined")
    got = _run(spark, "a67_cronbach_alpha")

    def var(xs):
        m = math.fsum(xs) / len(xs)
        return math.fsum((x - m) ** 2 for x in xs) / (len(xs) - 1)

    v1 = var(li["l_quantity"].tolist())
    v2 = var(li["l_discount"].tolist())
    v3 = var(li["l_tax"].tolist())
    vt = var(
        [
            q + d + t
            for q, d, t in zip(li["l_quantity"], li["l_discount"], li["l_tax"])
        ]
    )
    if vt <= 0:
        assert len(got) == 0
        return
    alpha = 1.5 * (1 - (v1 + v2 + v3) / vt)
    assert len(got) == 1
    row = got.iloc[0]
    assert row["n_rows"] == n and row["k_items"] == 3
    for col, want in [
        ("var_quantity", v1),
        ("var_discount", v2),
        ("var_tax", v3),
        ("var_total", vt),
        ("cronbach_alpha", alpha),
    ]:
        assert abs(row[col] - want) < 1e-4, col


def test_cohens_kappa_matches_confusion_counts(spark):
    _skip_if_empty("orders")
    o = _orders()
    got = _run(spark, "a68_cohens_kappa")
    ra = [
        1 if p in ("1-URGENT", "2-HIGH") else 0 for p in o["o_orderpriority"]
    ]
    rb = [1 if v > 250000 else 0 for v in o["o_totalprice"]]
    n = len(ra)
    a11 = sum(1 for x, y in zip(ra, rb) if x == 1 and y == 1)
    a10 = sum(1 for x, y in zip(ra, rb) if x == 1 and y == 0)
    a01 = sum(1 for x, y in zip(ra, rb) if x == 0 and y == 1)
    a00 = n - a11 - a10 - a01
    po = (a11 + a00) / n
    pe = ((a11 + a10) * (a11 + a01) + (a01 + a00) * (a10 + a00)) / (n * n)
    if pe >= 1:
        assert len(got) == 0
        return
    assert len(got) == 1
    row = got.iloc[0]
    assert (
        row["both_yes"],
        row["a_only"],
        row["b_only"],
        row["both_no"],
    ) == (a11, a10, a01, a00)
    assert abs(row["kappa"] - (po - pe) / (1 - pe)) < TOL


def test_kruskal_wallis_matches_midrank_loop(spark):
    _skip_if_empty("orders")
    o = _orders()
    n = len(o)
    if n < 2:
        pytest.skip("too few rows")
    got = _run(spark, "a69_kruskal_wallis")
    xs = sorted(o["o_totalprice"].tolist())
    # mid-rank per value: average of 1-based positions of the tie run
    first = {}
    cnt = Counter(xs)
    pos = 1
    for v in xs:
        if v not in first:
            first[v] = pos
        pos += 1
    midrank = {v: first[v] + (cnt[v] - 1) / 2 for v in cnt}
    rsums = Counter()
    ns = Counter()
    for grp, v in zip(o["o_orderpriority"], o["o_totalprice"]):
        rsums[grp] += midrank[v]
        ns[grp] += 1
    h = 12 / (n * (n + 1)) * math.fsum(
        rsums[g] ** 2 / ns[g] for g in ns
    ) - 3 * (n + 1)
    tsum = math.fsum(c**3 - c for c in cnt.values())
    if tsum >= n**3 - n:
        assert len(got) == 0
        return
    hc = h / (1 - tsum / (n**3 - n))
    assert len(got) == 1
    row = got.iloc[0]
    assert row["n_orders"] == n and row["k_groups"] == len(ns)
    assert abs(row["h_stat"] - h) < 1e-4
    assert abs(row["h_corrected"] - hc) < 1e-4


def _acf(y, maxlag):
    n = len(y)
    mu = math.fsum(y) / n
    d = [v - mu for v in y]
    s0 = math.fsum(x * x for x in d)
    if s0 <= 0:
        return None
    return [
        math.fsum(d[i] * d[i - k] for i in range(k, n)) / s0
        for k in range(1, maxlag + 1)
    ]


def test_ljung_box_matches_acf_loop(spark):
    _skip_if_empty("orders")
    daily = _daily_counts()
    n = len(daily)
    if n < 9:
        pytest.skip("series shorter than max lag + 2")
    got = _run(spark, "a70_ljung_box").sort_values("lag")
    rho = _acf([v for _, v in daily], 7)
    if rho is None:
        assert len(got) == 0
        return
    assert got["lag"].tolist() == list(range(1, 8))
    q = 0.0
    for k in range(1, 8):
        q += rho[k - 1] ** 2 / (n - k)
        row = got[got["lag"] == k].iloc[0]
        assert row["n_days"] == n
        assert abs(row["rho"] - rho[k - 1]) < 1e-5
        assert abs(row["q_ljung_box"] - n * (n + 2) * q) < 1e-3


def test_hurst_rs_matches_block_loop(spark):
    _skip_if_empty("orders")
    daily = _daily_revenue()
    y = [v for _, v in daily]
    got = _run(spark, "a71_hurst_rs").sort_values("block_size")
    pts = []
    per_size = {}
    for sz in (8, 16, 32):
        ratios = []
        for b in range(len(y) // sz):
            blk = y[b * sz : (b + 1) * sz]
            m = math.fsum(blk) / sz
            z, cum = [], 0.0
            for v in blk:
                cum += v - m
                z.append(cum)
            var = math.fsum((v - m) ** 2 for v in blk) / sz
            if var > 0:
                ratios.append((max(z) - min(z)) / math.sqrt(var))
        if ratios:
            mean_rs = math.fsum(ratios) / len(ratios)
            if mean_rs > 0:
                per_size[sz] = (len(ratios), mean_rs)
                pts.append((math.log(sz), math.log(mean_rs)))
    if len(pts) < 2:
        assert len(got) == 0
        return
    np_ = len(pts)
    sx = math.fsum(x for x, _ in pts)
    sy = math.fsum(v for _, v in pts)
    sxy = math.fsum(x * v for x, v in pts)
    sxx = math.fsum(x * x for x, _ in pts)
    hurst = (np_ * sxy - sx * sy) / (np_ * sxx - sx * sx)
    assert got["block_size"].tolist() == sorted(per_size)
    for sz, (nb, mean_rs) in per_size.items():
        row = got[got["block_size"] == sz].iloc[0]
        assert row["n_blocks"] == nb
        assert abs(row["mean_rs"] - mean_rs) < 1e-4
        assert abs(row["hurst"] - hurst) < 1e-4


def test_grubbs_matches_argmax_loop(spark):
    _skip_if_empty("orders")
    daily = _daily_revenue()
    n = len(daily)
    if n < 3:
        pytest.skip("series too short")
    got = _run(spark, "a72_grubbs_statistic")
    y = [v for _, v in daily]
    mu = math.fsum(y) / n
    ss = math.fsum((v - mu) ** 2 for v in y)
    if ss <= 0:
        assert len(got) == 0
        return
    sd = math.sqrt(ss / (n - 1))
    best = min(
        (d for d in daily), key=lambda d: (-abs(d[1] - mu), d[0])
    )
    assert len(got) == 1
    row = got.iloc[0]
    assert row["n_days"] == n
    assert row["outlier_day"] == best[0]
    assert abs(row["grubbs_g"] - abs(best[1] - mu) / sd) < 1e-4


def test_pacf_matches_durbin_levinson(spark):
    _skip_if_empty("orders")
    daily = _daily_counts()
    n = len(daily)
    if n < 5:
        pytest.skip("series too short for lag 3")
    got = _run(spark, "a73_yule_walker_pacf").sort_values("lag")
    rho = _acf([v for _, v in daily], 3)
    if rho is None or 1 - rho[0] ** 2 == 0:
        assert len(got) == 0
        return
    r1, r2, r3 = rho
    p11 = r1
    p22 = (r2 - r1 * r1) / (1 - r1 * r1)
    p21 = r1 * (1 - p22)
    denom = 1 - p21 * r1 - p22 * r2
    if denom == 0:
        assert len(got) == 0
        return
    p33 = (r3 - p21 * r2 - p22 * r1) / denom
    assert got["lag"].tolist() == [1, 2, 3]
    for lag, (rr, pp) in {
        1: (r1, p11),
        2: (r2, p22),
        3: (r3, p33),
    }.items():
        row = got[got["lag"] == lag].iloc[0]
        assert row["n_days"] == n
        assert abs(row["rho"] - rr) < 1e-5
        assert abs(row["pacf"] - pp) < 1e-4
