"""Independent brute-force references for the round-8 statistics
operators. The registry oracles are algorithm twins (the same plan
re-stated in DuckDB SQL), which cannot catch a defect shared by both
sides — these tests recompute each statistic from the raw parquet with
plain Python/pandas using the textbook definition (O(n²) loops, erfc
instead of the polynomial normal approximation, recursive products) and
require the operator to agree. This methodology caught the Bloom-filter
false-negative bug (see test_round8_invariants.py); here it fences the
a57/a60/a62/a63/a65, Kaplan-Meier, and MACD family the same way."""

from __future__ import annotations

import math
import os

import pandas as pd

import dock_financial_data_pipelines_spark as engine

# Respect the harness fixture override so the hostile-fixture sweeps
# (adversarial/minimal/empty, other SFs) drive these references too.
SF = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


def _run(spark, name: str) -> pd.DataFrame:
    return engine.QUERIES[name](spark, SF).toPandas()


def _orders_with_segment() -> pd.DataFrame:
    o = pd.read_parquet(f"{SF}/orders.parquet")
    c = pd.read_parquet(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    df = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    # exact money: work in integer cents wherever the engine sums DECIMAL
    df["cents"] = (df["o_totalprice"] * 100).round().astype("int64")
    return df.rename(columns={"c_mktsegment": "seg"})


def test_kendall_tau_matches_quadratic_bruteforce(spark):
    """tau-b from the O(n²) definition over exact-cents monthly revenue:
    concordant/discordant/tied pair counts and the tie-corrected tau."""
    got = _run(spark, "a57_kendall_tau").set_index("seg")
    df = _orders_with_segment()
    df["mon"] = df["o_orderdate"].dt.strftime("%Y-%m")
    monthly = df.groupby(["seg", "mon"])["cents"].sum().reset_index()
    for seg, grp in monthly.groupby("seg"):
        rev = grp.sort_values("mon")["cents"].tolist()
        n = len(rev)
        conc = disc = tied = 0
        for i in range(n):
            for j in range(i + 1, n):
                if rev[j] > rev[i]:
                    conc += 1
                elif rev[j] < rev[i]:
                    disc += 1
                else:
                    tied += 1
        n0 = n * (n - 1) // 2
        tau = (conc - disc) / math.sqrt(n0 * (n0 - tied))
        row = got.loc[seg]
        assert row["n_months"] == n
        assert row["concordant"] == conc
        assert row["discordant"] == disc
        assert row["tied"] == tied
        assert abs(row["tau_b"] - tau) < 2e-6, seg


def test_jarque_bera_matches_central_moment_bruteforce(spark):
    """Skewness/kurtosis/JB from CENTRAL moments computed directly
    (mean-subtracted powers), the numerically independent route to the
    operator's raw-moment algebra."""
    got = _run(spark, "a60_jarque_bera").set_index("seg")
    df = _orders_with_segment()
    for seg, grp in df.groupby("seg"):
        x = grp["o_totalprice"].to_numpy()
        n = len(x)
        mu = x.mean()
        d = x - mu
        m2 = (d**2).mean()
        s = (d**3).mean() / m2**1.5
        k = (d**4).mean() / m2**2
        jb = n * (s * s / 6 + (k - 3) ** 2 / 24)
        row = got.loc[seg]
        assert row["n_orders"] == n
        assert abs(row["skewness"] - s) < 1e-4, seg
        assert abs(row["kurtosis"] - k) < 1e-4, seg
        assert abs(row["jb_stat"] - jb) < max(1e-3, jb * 1e-5), seg
        assert row["non_normal_95"] == int(jb > 5.991), seg


def test_benjamini_hochberg_matches_erfc_bruteforce(spark):
    """The BH step-up procedure recomputed with the EXACT normal tail
    (math.erfc) instead of the Abramowitz-Stegun polynomial both engines
    share: z-stats, the p-value ordering, and the rejected set must all
    agree (the polynomial's |error| < 7.5e-8 cannot flip any of the
    fixture's comparisons)."""
    got = _run(spark, "a62_benjamini_hochberg")
    df = _orders_with_segment()
    cells = (
        df.groupby(["seg", "o_orderpriority"])
        .agg(
            n=("o_orderkey", "size"),
            x=("o_orderstatus", lambda v: int((v == "F").sum())),
        )
        .reset_index()
    )
    pp = cells["x"].sum() / cells["n"].sum()
    cells["z"] = (cells["x"] / cells["n"] - pp) / (
        (pp * (1 - pp) / cells["n"]) ** 0.5
    )
    cells["p"] = [math.erfc(abs(z) / math.sqrt(2)) for z in cells["z"]]
    cells = cells.sort_values(
        ["p", "seg", "o_orderpriority"]
    ).reset_index(drop=True)
    m = len(cells)
    cells["rk"] = range(1, m + 1)
    kmax = max(
        (rk for rk, p in zip(cells["rk"], cells["p"]) if p <= rk * 0.05 / m),
        default=0,
    )
    cells["rejected"] = (cells["rk"] <= kmax).astype(int)
    want = cells.set_index(["seg", "o_orderpriority"])
    gi = got.set_index(["seg", "pri"])
    assert set(gi.index) == set(want.index)
    for key, row in gi.iterrows():
        w = want.loc[key]
        assert row["n_orders"] == w["n"]
        assert row["n_final"] == w["x"]
        assert abs(row["z"] - w["z"]) < 2e-6, key
        assert abs(row["p_value"] - w["p"]) < 2e-6, key
        assert row["p_rank"] == w["rk"], key
        assert row["rejected"] == w["rejected"], key


def test_theil_sen_matches_quadratic_bruteforce(spark):
    """Median-of-pairwise-slopes recomputed with a plain O(n²) loop and
    a positional median over the sorted slope multiset."""
    got = _run(spark, "a63_theil_sen_slope").set_index("seg")
    df = _orders_with_segment()
    df["dd"] = (
        df["o_orderdate"].dt.normalize() - pd.Timestamp("1970-01-01")
    ).dt.days
    daily = df.groupby(["seg", "dd"])["cents"].sum().reset_index()
    for seg, grp in daily.groupby("seg"):
        grp = grp.sort_values("dd", ascending=False).head(40)
        pts = list(zip(grp["dd"], grp["cents"] / 100.0))
        slopes = sorted(
            (ra[1] - rb[1]) / (ra[0] - rb[0])
            for i, ra in enumerate(pts)
            for rb in pts[i + 1 :]
        )
        mcount = len(slopes)
        lo, hi = (mcount + 1) // 2, (mcount + 2) // 2
        med = (slopes[lo - 1] + slopes[hi - 1]) / 2
        row = got.loc[seg]
        assert row["n_days"] == len(pts)
        assert row["n_pairs"] == mcount
        assert abs(row["theil_sen_slope"] - med) < 2e-6, seg


def test_cusum_changepoint_matches_exhaustive_scan(spark):
    """The binary-segmentation first split recomputed by scanning every
    candidate t with exact integer-cent arithmetic: argmax of
    |n·S_t − t·S_n| (earliest day wins ties)."""
    got = _run(spark, "a65_changepoint_cusum").set_index("seg")
    df = _orders_with_segment()
    df["dd"] = (
        df["o_orderdate"].dt.normalize() - pd.Timestamp("1970-01-01")
    ).dt.days
    daily = df.groupby(["seg", "dd"])["cents"].sum().reset_index()
    for seg, grp in daily.groupby("seg"):
        grp = grp.sort_values("dd")
        revs = grp["cents"].tolist()
        days = grp["dd"].tolist()
        n = len(revs)
        sn = sum(revs)
        best = None  # (d, t, st)
        st = 0
        for t in range(1, n):
            st += revs[t - 1]
            d = abs(n * st - t * sn)
            if best is None or d > best[0]:
                best = (d, t, st)
        d, t, st = best
        row = got.loc[seg]
        assert row["split_index"] == t, seg
        assert row["n_days"] == n, seg
        assert (
            row["change_day"]
            == (
                pd.Timestamp("1970-01-01") + pd.Timedelta(days=days[t - 1])
            ).strftime("%Y-%m-%d")
        ), seg
        assert abs(row["cusum_stat"] - d / 100.0 / n) < 1e-5, seg
        assert abs(row["mean_before"] - st / 100.0 / t) < 1e-5, seg
        assert (
            abs(row["mean_after"] - (sn - st) / 100.0 / (n - t)) < 1e-5
        ), seg


def test_kaplan_meier_matches_product_limit_bruteforce(spark):
    """The product-limit estimator recomputed as an explicit product of
    (1 − d_i/n_i) over event days (skipping degenerate full-death days,
    the operator's stated domain), read off at each horizon."""
    got = _run(spark, "q_kaplan_meier_reorder").set_index("horizon_days")
    o = pd.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate"],
    )
    mx = o["o_orderdate"].max()
    durations = []
    for _, grp in o.groupby("o_custkey"):
        grp = grp.sort_values(["o_orderdate", "o_orderkey"])
        dates = grp["o_orderdate"].tolist()
        for i, dt in enumerate(dates):
            if i + 1 < len(dates):
                durations.append(((dates[i + 1] - dt).days, 1))
            else:
                durations.append(((mx - dt).days, 0))
    total = len(durations)
    byd = {}
    for d, ev in durations:
        c, de = byd.get(d, (0, 0))
        byd[d] = (c + 1, de + ev)
    surv = {}
    s = 1.0
    removed = 0
    for d in sorted(byd):
        c, de = byd[d]
        n_risk = total - removed
        if 0 < de < n_risk:
            s *= 1 - de / n_risk
        removed += c
        surv[d] = s
    event_days = sorted(surv)
    for h in (7, 14, 30, 60, 90):
        prior = [d for d in event_days if d <= h]
        want = surv[prior[-1]] if prior else 1.0
        assert abs(got.loc[h, "survival"] - want) < 2e-6, h


def test_macd_matches_pure_python_lag_polynomial(spark):
    """The truncated-EMA MACD recomputed in pure Python from the raw
    events table: hourly last-value closes, the 12/26 lag polynomials,
    the 9-term signal over the macd series, warmup cut at bar 34."""
    got = _run(spark, "w28_macd").set_index("hr")
    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["ts", "value", "event_id"]
    )
    ev["hr"] = ev["ts"].dt.strftime("%Y-%m-%d %H")
    closes = (
        ev.sort_values(["ts", "event_id"])
        .groupby("hr")
        .last()["value"]
        .sort_index()
    )
    xs = closes.tolist()

    def trunc_ema(series, decay, n, i):
        num = sum(
            series[i - k] * decay**k for k in range(n) if i - k >= 0
        )
        return num / ((1 - decay**n) / (1 - decay))

    ema12 = [trunc_ema(xs, 11.0 / 13.0, 12, i) for i in range(len(xs))]
    ema26 = [trunc_ema(xs, 25.0 / 27.0, 26, i) for i in range(len(xs))]
    macd = [a - b for a, b in zip(ema12, ema26)]
    signal = [trunc_ema(macd, 0.8, 9, i) for i in range(len(macd))]
    hrs = closes.index.tolist()
    assert set(got.index) == set(hrs[33:])
    for i in range(33, len(xs)):
        row = got.loc[hrs[i]]
        assert abs(row["ema12"] - ema12[i]) < 1e-3, hrs[i]
        assert abs(row["ema26"] - ema26[i]) < 1e-3, hrs[i]
        assert abs(row["macd"] - macd[i]) < 1e-3, hrs[i]
        assert abs(row["signal"] - signal[i]) < 1e-3, hrs[i]
        assert (
            abs(row["histogram"] - (macd[i] - signal[i])) < 2e-3
        ), hrs[i]
