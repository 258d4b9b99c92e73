"""Independent brute-force references for the remaining round-8 FP&A,
calendar, sampling, and volatility operators (largest-remainder cost
allocation, EOM billing clamps, open-order float, price/volume bridge,
Efraimidis-Spirakis weighted sampling, effect sizes, stochastic
oscillator, Parkinson volatility, Keltner channels). Same contract as
the sibling *_bruteforce modules: plain-Python recomputation from raw
parquet, no SQL-twin replay."""

from __future__ import annotations

import hashlib
import math
import os
from collections import defaultdict

import pandas as pd

import dock_financial_data_pipelines_spark as engine

# Respect the harness fixture override so the hostile-fixture sweeps
# (adversarial/minimal/empty, other SFs) drive these references too.
SF = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


def _run(spark, name: str) -> pd.DataFrame:
    return engine.QUERIES[name](spark, SF).toPandas()


def _skip_if_empty(table: str) -> None:
    """The empty-input contracts are oracle-checked (check_all on the
    empty fixture + tests/test_degenerate_fixtures.py); a brute-force
    reference adds nothing there, so skip rather than re-derive every
    empty shape."""
    import pyarrow.parquet as pq
    import pytest

    if pq.read_metadata(f"{SF}/{table}.parquet").num_rows == 0:
        pytest.skip(f"{table} empty: contract covered by the empty-fixture sweep")



def _daily_bars() -> pd.DataFrame:
    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["ts", "value", "event_id"]
    ).sort_values(["ts", "event_id"])
    ev["day"] = ev["ts"].dt.strftime("%Y-%m-%d")
    g = ev.groupby("day")["value"]
    return pd.DataFrame(
        {"open": g.first(), "high": g.max(), "low": g.min(), "close": g.last()}
    ).sort_index()


def test_landed_cost_allocation_conserves_per_order(spark):
    """Replay the proportional largest-remainder split per order and
    require per-priority totals to match with zero conservation
    violations."""
    got = _run(spark, "q_landed_cost_allocation").set_index(
        "o_orderpriority"
    )
    o = pd.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    ).set_index("o_orderkey")
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
    )
    agg = defaultdict(lambda: [0, 0, 0])  # n_orders, n_lines, cents
    for ok, grp in li.groupby("l_orderkey"):
        prio = o.loc[ok, "o_orderpriority"]
        freight = int(math.floor(o.loc[ok, "o_totalprice"] * 0.02 * 100 + 0.5))
        s = grp["l_extendedprice"].sum()
        raws = [
            (ep * freight / s, ln)
            for ep, ln in zip(grp["l_extendedprice"], grp["l_linenumber"])
        ]
        base = [math.floor(r) for r, _ in raws]
        short = freight - sum(base)
        order = sorted(
            range(len(raws)),
            key=lambda i: (-(raws[i][0] - base[i]), raws[i][1]),
        )
        cents = list(base)
        for i in order[:short]:
            cents[i] += 1
        assert sum(cents) == freight, ok  # per-order conservation
        st = agg[prio]
        st[0] += 1
        st[1] += len(cents)
        st[2] += sum(cents)
    assert set(got.index) == set(agg)
    for prio, (n_ord, n_lines, cents) in agg.items():
        row = got.loc[prio]
        assert row["n_orders"] == n_ord, prio
        assert row["n_lines"] == n_lines, prio
        assert row["allocated_cents"] == cents, prio
        assert row["conservation_violations"] == 0, prio


def test_eom_billing_cycle_matches_dateoffset_clamping(spark):
    """Billing anniversaries via pandas DateOffset month addition (which
    clamps to month end exactly like Spark's add_months): per-month bill
    and clamp counts."""
    got = _run(spark, "q_eom_billing_cycle").set_index("bill_month")
    o = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )
    first = o.groupby("o_custkey")["o_orderdate"].min().dt.normalize()
    bills = defaultdict(lambda: [0, 0])
    for fd in first:
        for k in range(12):
            b = fd + pd.DateOffset(months=k)
            st = bills[b.strftime("%Y-%m")]
            st[0] += 1
            st[1] += int(b.day < fd.day)
    assert list(got.index) == sorted(bills)
    for mo, (n, clamped) in bills.items():
        assert got.loc[mo, "n_bills"] == n, mo
        assert got.loc[mo, "n_clamped"] == clamped, mo


def test_open_order_float_matches_week_expansion(spark):
    """Weekly in-flight exposure replayed with Monday-truncated spans
    capped at the 8-week SLA."""
    got = _run(spark, "q_open_order_float").set_index("week_start")
    o = pd.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_totalprice"],
    ).set_index("o_orderkey")
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )

    def monday(ts):
        ts = ts.normalize()
        return ts - pd.Timedelta(days=ts.weekday())

    weeks = defaultdict(lambda: [0, 0])  # count, cents
    for ok, grp in li.groupby("l_orderkey"):
        w0 = monday(o.loc[ok, "o_orderdate"])
        w1 = max(
            min(monday(grp["l_shipdate"].max()), w0 + pd.Timedelta(days=56)),
            w0,
        )
        cents = int(round(o.loc[ok, "o_totalprice"] * 100))
        w = w0
        while w <= w1:
            st = weeks[w.strftime("%Y-%m-%d")]
            st[0] += 1
            st[1] += cents
            w += pd.Timedelta(days=7)
    assert set(got.index) == set(weeks)
    for wk, (n, cents) in weeks.items():
        assert got.loc[wk, "n_open_orders"] == n, wk
        assert abs(got.loc[wk, "open_value"] - cents / 100.0) < 1e-6, wk


def test_sales_mix_variance_bridge_identity(spark):
    """The price/volume bridge recomputed per brand, plus the exact
    identity dR = price_var + volume_var the output certifies."""
    got = _run(spark, "q_sales_mix_variance").set_index("brand")
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_quantity", "l_extendedprice", "l_discount"],
    )
    part = pd.read_parquet(
        f"{SF}/part.parquet", columns=["p_partkey", "p_brand"]
    ).set_index("p_partkey")
    li["yr"] = li["l_shipdate"].dt.year
    li = li[li["yr"].isin((1995, 1996))]
    li["brand"] = li["l_partkey"].map(part["p_brand"])
    li["rev"] = li["l_extendedprice"] * (1 - li["l_discount"])
    agg = li.groupby(["brand", "yr"]).agg(
        q=("l_quantity", "sum"), r=("rev", "sum")
    )
    checked = 0
    for brand in agg.index.get_level_values(0).unique():
        try:
            q1, r1 = agg.loc[(brand, 1995)]
            q2, r2 = agg.loc[(brand, 1996)]
        except KeyError:
            assert brand not in got.index
            continue
        if q1 <= 0 or q2 <= 0:
            assert brand not in got.index
            continue
        price_var = (r2 / q2 - r1 / q1) * q2
        volume_var = (q2 - q1) * (r1 / q1)
        row = got.loc[brand]
        assert abs(row["qty_1995"] - q1) < 0.02, brand
        assert abs(row["qty_1996"] - q2) < 0.02, brand
        assert abs(row["rev_1995"] - r1) < 0.02, brand
        assert abs(row["rev_1996"] - r2) < 0.02, brand
        assert abs(row["price_variance"] - price_var) < 0.02, brand
        assert abs(row["volume_variance"] - volume_var) < 0.02, brand
        assert abs((r2 - r1) - (price_var + volume_var)) < 0.01, brand
        assert row["bridge_reconciles"] == 1, brand
        checked += 1
    assert checked == len(got)


def test_weighted_sample_matches_es_reservoir(spark):
    """Efraimidis-Spirakis A-Res replayed with hashlib-derived uniform
    draws: the exact top-100 membership, order, and weight share."""
    _skip_if_empty("part")
    got = _run(spark, "u18_weighted_sample")
    part = pd.read_parquet(
        f"{SF}/part.parquet", columns=["p_partkey", "p_retailprice"]
    )
    part = part[part["p_retailprice"] > 0]
    den = float(1 << 60) + 1.0
    keyed = []
    for pk, w in zip(part["p_partkey"], part["p_retailprice"]):
        u = (
            int(hashlib.md5(str(pk).encode()).hexdigest()[:15], 16) + 1.0
        ) / den
        keyed.append((math.log(u) / w, pk, w))
    keyed.sort(key=lambda t: (-t[0], t[1]))
    k = min(100, len(keyed))  # small fixtures have fewer than K parts
    top = keyed[:k]
    share = sum(round(w * 100) for _, _, w in top) / sum(
        round(w * 100) for w in part["p_retailprice"]
    )
    assert got["p_partkey"].tolist() == [pk for _, pk, _ in top]
    assert got["sample_rank"].tolist() == list(range(1, k + 1))
    for row, (k, pk, w) in zip(got.itertuples(), top):
        assert abs(row.weight - w) < 0.005, pk
        assert abs(row.es_key - k) < 2e-9, pk
    assert abs(got["sampled_weight_share"].iloc[0] - share) < 2e-6


def test_effect_sizes_match_textbook_formulas(spark):
    """Cohen's d / Hedges' g from the two-sample definition computed on
    raw values (mean/variance via pandas, not raw-moment algebra)."""
    got = _run(spark, "a59_effect_sizes").iloc[0]
    o = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    c = pd.read_parquet(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    df = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    a = df[df["c_mktsegment"] == "BUILDING"]["o_totalprice"]
    b = df[df["c_mktsegment"] == "MACHINERY"]["o_totalprice"]
    n1, n2 = len(a), len(b)
    if n1 == 0 or n2 == 0 or n1 + n2 < 3:
        # a side missing (or zero pooled dof): the stats are undefined
        # and the operator's pivot row carries NULLs
        for col in ("pooled_sd", "cohens_d", "hedges_g"):
            assert pd.isna(got[col]), col
        return
    sp = math.sqrt(
        ((a - a.mean()) ** 2).sum() + ((b - b.mean()) ** 2).sum()
    ) / math.sqrt(n1 + n2 - 2)
    d = (a.mean() - b.mean()) / sp
    g = d * (1 - 3.0 / (4 * (n1 + n2) - 9))
    assert got["n_building"] == n1 and got["n_machinery"] == n2
    assert abs(got["mean_building"] - a.mean()) < 0.01
    assert abs(got["mean_machinery"] - b.mean()) < 0.01
    assert abs(got["pooled_sd"] - sp) < 0.01
    assert abs(got["cohens_d"] - d) < 1e-5
    assert abs(got["hedges_g"] - g) < 1e-5


def test_stochastic_oscillator_matches_rolling_scan(spark):
    """%K over the trailing 14-bar channel and %D as its 3-bar mean,
    via explicit rolling scans."""
    got = _run(spark, "w25_stochastic_oscillator").set_index("day")
    bars = _daily_bars()
    days = bars.index.tolist()
    pk = {}
    for i in range(13, len(days)):
        h14 = bars["high"].iloc[i - 13 : i + 1].max()
        l14 = bars["low"].iloc[i - 13 : i + 1].min()
        close = bars["close"].iloc[i]
        pk[days[i]] = (
            50.0 if h14 == l14 else 100.0 * (close - l14) / (h14 - l14)
        )
    kdays = days[13:]
    for j in range(2, len(kdays)):
        day = kdays[j]
        pd3 = sum(pk[kdays[j - t]] for t in range(3)) / 3
        row = got.loc[day]
        assert abs(row["pct_k"] - pk[day]) < 1e-3, day
        assert abs(row["pct_d"] - pd3) < 1e-3, day
        want_sig = (
            "overbought"
            if pk[day] > 80
            else "oversold" if pk[day] < 20 else "neutral"
        )
        assert row["signal"] == want_sig, day
    assert len(got) == max(0, len(kdays) - 2)


def test_parkinson_volatility_matches_rolling_scan(spark):
    """Annualized Parkinson volatility over the 20-bar window from the
    direct ln(high/low)^2 sums."""
    got = _run(spark, "w26_parkinson_volatility").set_index("day")
    bars = _daily_bars()
    bars = bars[bars["low"] > 0]
    l2 = [
        math.log(h / lo) ** 2 for h, lo in zip(bars["high"], bars["low"])
    ]
    days = bars.index.tolist()
    for i in range(19, len(days)):
        s = sum(l2[i - 19 : i + 1])
        vol = math.sqrt(s / (4 * math.log(2) * 20)) * math.sqrt(252.0)
        assert abs(got.loc[days[i], "parkinson_vol_ann"] - vol) < 2e-6
    assert len(got) == max(0, len(days) - 19)


def test_keltner_channels_match_rolling_scan(spark):
    """Keltner: truncated-EMA(10) of the typical price, ATR(10) as the
    mean true range, channels at ±2·ATR — explicit loops."""
    got = _run(spark, "w27_keltner_channels").set_index("day")
    bars = _daily_bars()
    days = bars.index.tolist()
    tp = [
        (h + lo + c) / 3
        for h, lo, c in zip(bars["high"], bars["low"], bars["close"])
    ]
    tr = []
    prev_close = None
    for h, lo in zip(bars["high"], bars["low"]):
        if prev_close is None:
            tr.append(h - lo)
        else:
            tr.append(max(h - lo, abs(h - prev_close), abs(lo - prev_close)))
        prev_close = bars["close"].iloc[len(tr) - 1]
    for i in range(10, len(days)):
        ema10 = sum(tp[i - k] * 0.8**k for k in range(10)) / (
            (1 - 0.8**10) / (1 - 0.8)
        )
        atr10 = sum(tr[i - 9 : i + 1]) / 10
        row = got.loc[days[i]]
        assert abs(row["ema10"] - ema10) < 1e-3, days[i]
        assert abs(row["atr10"] - atr10) < 1e-3, days[i]
        assert abs(row["upper_channel"] - (ema10 + 2 * atr10)) < 2e-3
        assert abs(row["lower_channel"] - (ema10 - 2 * atr10)) < 2e-3
    assert len(got) == max(0, len(days) - 10)
