"""Independent brute-force references for the finance/quant operators
added in rounds 7-8 (FIFO costing, ratable revenue recognition,
bitemporal as-of, Page-Hinkley, lead-lag correlation, Aroon, OBV,
Chaikin money flow, keep-latest-K). Same rationale as
test_stats_bruteforce.py: the registry oracles are algorithm twins, so
these recompute each result from raw parquet with plain-Python
simulations (explicit FIFO queue walk, per-order schedules, O(n·w)
rolling scans) and require the operators to agree."""

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
    """The empty-input contracts are oracle-checked (check_all on the
    empty fixture + tests/test_degenerate_fixtures.py); a brute-force
    reference adds nothing there, so skip rather than re-derive every
    empty shape."""
    import pyarrow.parquet as pq
    import pytest

    if pq.read_metadata(f"{SF}/{table}.parquet").num_rows == 0:
        pytest.skip(f"{table} empty: contract covered by the empty-fixture sweep")



def _daily_bars():
    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["ts", "value", "event_id"]
    )
    ev = ev.sort_values(["ts", "event_id"])
    ev["day"] = ev["ts"].dt.strftime("%Y-%m-%d")
    g = ev.groupby("day")["value"]
    bars = pd.DataFrame(
        {
            "open": g.first(),
            "high": g.max(),
            "low": g.min(),
            "close": g.last(),
            "vol": g.size(),
        }
    ).sort_index()
    return bars


def test_revenue_recognition_schedule_ties_out_exactly(spark):
    """Replay the largest-remainder schedule per order in plain Python:
    monthly billed/recognized cents and the deferred running balance
    must match to the cent, and total recognized must equal total
    billed (the conservation the largest-remainder rule guarantees)."""
    got = _run(spark, "q_revenue_recognition_daily").set_index("month")
    o = pd.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_totalprice"],
    )
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )
    maxship = li.groupby("l_orderkey")["l_shipdate"].max()
    billed: dict = {}
    recognized: dict = {}
    for _, r in o.iterrows():
        d0 = r["o_orderdate"].normalize()
        cents = int(math.floor(r["o_totalprice"] * 100 + 0.5))
        ship = maxship.get(r["o_orderkey"])
        last = max(d0, ship.normalize()) if ship is not None else d0
        nd = max(1, min((last - d0).days + 1, 92))
        q, rem = divmod(cents, nd)
        billed[d0.strftime("%Y-%m")] = (
            billed.get(d0.strftime("%Y-%m"), 0) + cents
        )
        for i in range(nd):
            mo = (d0 + pd.Timedelta(days=i)).strftime("%Y-%m")
            recognized[mo] = recognized.get(mo, 0) + q + (1 if i < rem else 0)
    months = sorted(set(billed) | set(recognized))
    assert list(got.index) == months
    deferred = 0
    for mo in months:
        b, rec = billed.get(mo, 0), recognized.get(mo, 0)
        deferred += b - rec
        assert got.loc[mo, "billed_cents"] == b, mo
        assert got.loc[mo, "recognized_cents"] == rec, mo
        assert got.loc[mo, "deferred_balance_cents"] == deferred, mo
    assert sum(billed.values()) == sum(recognized.values())
    assert deferred == 0


def test_fifo_inventory_matches_queue_simulation(spark):
    """Walk the movements per part with an explicit FIFO layer queue
    (receipts = odd line numbers) and reproduce the per-brand issued
    quantity, COGS, and remaining value; conservation must hold."""
    got = _run(spark, "q_fifo_inventory").set_index("brand")
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=[
            "l_partkey",
            "l_orderkey",
            "l_linenumber",
            "l_shipdate",
            "l_quantity",
            "l_extendedprice",
        ],
    )
    part = pd.read_parquet(
        f"{SF}/part.parquet", columns=["p_partkey", "p_brand"]
    ).set_index("p_partkey")
    li = li.sort_values(["l_shipdate", "l_orderkey", "l_linenumber"])
    li["qty"] = (li["l_quantity"] + 0.5).astype("int64")
    li["cost_c"] = (li["l_extendedprice"] * 100 + 0.5).astype("int64")
    per_part = {}
    for pk, grp in li.groupby("l_partkey", sort=False):
        grp = grp.sort_values(["l_shipdate", "l_orderkey", "l_linenumber"])
        layers = []  # [rqty, cost_c, consumed, cogs_c] in receipt order
        issues = []
        for _, r in grp.iterrows():
            if r["l_linenumber"] % 2 == 1:
                layers.append([int(r["qty"]), int(r["cost_c"]), 0, 0])
            else:
                issues.append(int(r["qty"]))
        # interval-match the cumulative issue stream against the
        # cumulative receipt layers, applying the per-segment floor the
        # operator uses for each (layer, issue) overlap
        rs = 0
        bounds = []
        for L in layers:
            bounds.append((rs, rs + L[0]))
            rs += L[0]
        istart = 0
        for iq in issues:
            ilo, ihi = istart, istart + iq
            for (llo, lhi), L in zip(bounds, layers):
                o = max(0, min(lhi, ihi) - max(llo, ilo))
                if o:
                    L[2] += o
                    L[3] += L[1] * o // L[0]
            istart += iq
        per_part[pk] = {
            "issued": sum(L[2] for L in layers),
            "cogs_c": sum(L[3] for L in layers),
            "remaining_qty": sum(L[0] - L[2] for L in layers),
            "remaining_c": sum(L[1] - L[3] for L in layers),
            "received_c": sum(L[1] for L in layers),
            "has_receipts": bool(layers),
        }
    rows = {}
    for pk, s in per_part.items():
        if not s["has_receipts"]:
            continue
        b = part.loc[pk, "p_brand"]
        agg = rows.setdefault(
            b, {"n": 0, "issued": 0, "cogs": 0, "rq": 0, "rc": 0}
        )
        agg["n"] += 1
        agg["issued"] += s["issued"]
        agg["cogs"] += s["cogs_c"]
        agg["rq"] += s["remaining_qty"]
        agg["rc"] += s["remaining_c"]
    assert set(got.index) == set(rows)
    for b, agg in rows.items():
        row = got.loc[b]
        assert row["n_parts"] == agg["n"], b
        assert row["issued_qty"] == agg["issued"], b
        assert abs(row["cogs"] - agg["cogs"] / 100.0) < 1e-6, b
        assert row["remaining_qty"] == agg["rq"], b
        assert abs(row["remaining_value"] - agg["rc"] / 100.0) < 1e-6, b
        assert bool(row["conserves"]) is True, b
    total = per_part.values()
    assert all(
        s["cogs_c"] + s["remaining_c"] == s["received_c"] for s in total
    )


def test_bitemporal_asof_matches_bruteforce(spark):
    """Recompute both temporal picks with plain filters and argmax:
    what was known at (V, T) vs what is known now, per customer."""
    got = _run(spark, "u17_bitemporal_asof").set_index("custkey")
    o = pd.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    o["valid_from"] = o["o_orderdate"].dt.normalize()
    v_date = o["valid_from"].max() - pd.Timedelta(days=180)
    t_date = v_date + pd.Timedelta(days=1)
    o["tx_time"] = o["valid_from"] + pd.to_timedelta(
        o["o_orderkey"] % 3, unit="D"
    )

    def pick(df):
        df = df.sort_values(
            ["valid_from", "o_orderkey"], ascending=[False, False]
        )
        return df.iloc[0] if len(df) else None

    n_checked = 0
    for cust, grp in o.groupby("o_custkey"):
        now_rows = grp[grp["valid_from"] <= v_date]
        then_rows = now_rows[now_rows["tx_time"] <= t_date]
        now = pick(now_rows)
        then = pick(then_rows)
        if now is None:
            assert cust not in got.index
            continue
        row = got.loc[cust]
        assert row["prio_known_now"] == now["o_orderpriority"], cust
        assert pd.Timestamp(row["vf_now"]) == now["valid_from"], cust
        if then is None:
            assert pd.isna(row["prio_known_at_t"]), cust
            assert bool(row["was_corrected"]) is True, cust
        else:
            assert row["prio_known_at_t"] == then["o_orderpriority"], cust
            assert pd.Timestamp(row["vf_then"]) == then["valid_from"], cust
            assert bool(row["was_corrected"]) == (
                then["o_orderpriority"] != now["o_orderpriority"]
            ), cust
        n_checked += 1
    assert n_checked == len(got)


def test_page_hinkley_matches_sequential_scan(spark):
    """Run the PH recursion as the literal sequential loop: m_t =
    Σ(x_i − mean_i), PH_t = m_t − min m; peak day, alarm-day count and
    the max statistic must match."""
    _skip_if_empty("orders")
    got = _run(spark, "a61_page_hinkley").iloc[0]
    o = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    o["day"] = o["o_orderdate"].dt.strftime("%Y-%m-%d")
    cents = (o["o_totalprice"] * 100).round().astype("int64")
    daily = (
        pd.DataFrame({"day": o["day"], "c": cents})
        .groupby("day")["c"]
        .sum()
        .sort_index()
    )
    s = 0
    mt = 0.0
    mmin = 0.0
    peak = (None, -1.0)
    alarms = 0
    for i, (day, c) in enumerate(daily.items(), start=1):
        rev = c / 100.0
        s += c
        mt += rev - (s / 100.0) / i
        mmin = min(mmin, mt)
        ph = mt - mmin
        if ph > peak[1]:
            peak = (day, ph)
        if ph > 100000.0:
            alarms += 1
    assert got["peak_day"] == peak[0]
    assert got["n_days"] == len(daily)
    assert got["n_alarm_days"] == alarms
    assert abs(got["ph_stat"] - peak[1]) < 0.05


def test_lead_lag_xcorr_matches_numpy_pearson(spark):
    """Pearson r at each lag recomputed with numpy's corrcoef over the
    aligned day pairs."""
    got = _run(spark, "a64_lead_lag_xcorr").set_index("lag")
    o = pd.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )
    c = pd.read_parquet(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    df = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    df["dd"] = (
        df["o_orderdate"].dt.normalize() - pd.Timestamp("1970-01-01")
    ).dt.days
    df["cents"] = (df["o_totalprice"] * 100).round().astype("int64")
    series = {
        seg: grp.groupby("dd")["cents"].sum() / 100.0
        for seg, grp in df.groupby("c_mktsegment")
        if seg in ("BUILDING", "MACHINERY")
    }
    if "BUILDING" not in series or "MACHINERY" not in series:
        # a segment absent from the fixture: the day join is empty and
        # the operator emits no rows at all
        assert len(got) == 0
        return
    x, y = series["BUILDING"], series["MACHINERY"]
    best = (None, -1.0)
    for lag in range(-7, 8):
        xs, ys = [], []
        for dd, xv in x.items():
            if dd + lag in y.index:
                xs.append(xv)
                ys.append(y[dd + lag])
        if lag not in got.index:
            # no aligned days for this lag: no output row on either side
            assert len(xs) == 0, lag
            continue
        row = got.loc[lag]
        assert row["n_days"] == len(xs), lag
        if len(xs) < 2 or len(set(xs)) == 1 or len(set(ys)) == 1:
            # degenerate series: r undefined on both sides
            assert pd.isna(row["xcorr"]), lag
            continue
        rho = float(np.corrcoef(xs, ys)[0, 1])
        assert abs(row["xcorr"] - rho) < 2e-6, lag
        if abs(rho) > best[1]:
            best = (lag, abs(rho))
    if best[0] is not None:
        assert got[got["is_best_lag"] == 1].index.tolist() == [best[0]]


def test_aroon_matches_rolling_scan(spark):
    """Days-since-extreme over each trailing 25-bar window, most recent
    bar winning ties, recomputed with an explicit O(n·25) scan."""
    got = _run(spark, "w29_aroon").set_index("day")
    bars = _daily_bars()
    highs = bars["high"].tolist()
    lows = bars["low"].tolist()
    days = bars.index.tolist()
    for i in range(24, len(days)):
        win_h = highs[i - 24 : i + 1]
        win_l = lows[i - 24 : i + 1]
        hmax, lmin = max(win_h), min(win_l)
        since_high = 24 - max(k for k, v in enumerate(win_h) if v == hmax)
        since_low = 24 - max(k for k, v in enumerate(win_l) if v == lmin)
        row = got.loc[days[i]]
        assert row["days_since_high"] == since_high, days[i]
        assert row["days_since_low"] == since_low, days[i]
        assert row["aroon_up"] == (25 - since_high) * 4, days[i]
        assert row["aroon_down"] == (25 - since_low) * 4, days[i]
    assert len(got) == max(0, len(days) - 24)


def test_obv_matches_sequential_scan(spark):
    """On-balance volume replayed as the literal running loop over
    close-to-close directions."""
    got = _run(spark, "w31_obv").set_index("day")
    bars = _daily_bars()
    obv = 0
    prev = None
    for day, row in bars.iterrows():
        if prev is None or row["close"] == prev:
            d = 0
        elif row["close"] > prev:
            d = 1
        else:
            d = -1
        obv += d * int(row["vol"])
        g = got.loc[day]
        assert g["direction"] == d, day
        assert g["vol"] == row["vol"], day
        assert g["obv"] == obv, day
        prev = row["close"]


def test_chaikin_money_flow_matches_rolling_scan(spark):
    """20-bar CMF recomputed with the explicit multiplier/volume rolling
    sums."""
    got = _run(spark, "w32_chaikin_money_flow").set_index("day")
    bars = _daily_bars()
    mfm = []
    for _, r in bars.iterrows():
        if r["high"] == r["low"]:
            mfm.append(0.0)
        else:
            mfm.append(
                ((r["close"] - r["low"]) - (r["high"] - r["close"]))
                / (r["high"] - r["low"])
            )
    vols = bars["vol"].tolist()
    days = bars.index.tolist()
    for i in range(19, len(days)):
        mfv = sum(m * v for m, v in zip(mfm[i - 19 : i + 1], vols[i - 19 : i + 1]))
        v20 = sum(vols[i - 19 : i + 1])
        row = got.loc[days[i]]
        assert row["vol20"] == v20, days[i]
        assert abs(row["mfm"] - mfm[i]) < 2e-6, days[i]
        assert abs(row["cmf"] - mfv / v20) < 1e-5, days[i]
    assert len(got) == max(0, len(days) - 19)


def test_keep_latest_k_matches_bruteforce(spark):
    """Retention dedup: exactly the newest 3 orders per customer
    (date desc, orderkey desc) survive, with correct ranks."""
    got = _run(spark, "u16_keep_latest_k")
    o = pd.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate"],
    )
    keep = set()
    ranks = {}
    for cust, grp in o.groupby("o_custkey"):
        grp = grp.sort_values(
            ["o_orderdate", "o_orderkey"], ascending=[False, False]
        ).head(3)
        for rk, (_, r) in enumerate(grp.iterrows(), start=1):
            keep.add(r["o_orderkey"])
            ranks[r["o_orderkey"]] = rk
    assert set(got["o_orderkey"]) == keep
    for _, r in got.iterrows():
        assert r["keep_rank"] == ranks[r["o_orderkey"]]
