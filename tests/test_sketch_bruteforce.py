"""Brute-force references for the sketch/resampling family: the
hash-derived bootstrap CI, the weekly seasonal decomposition, the
normal-equation multiple regression (vs numpy least squares), count-min
heavy hitters (including the never-underestimate invariant), the
uniform-sample quantile sketch, and the KMV distinct sketch with union
algebra — all replayed in plain Python with hashlib."""

from __future__ import annotations

import hashlib
import math
import os
from collections import Counter, defaultdict

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


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _daily_rev_cents() -> pd.Series:
    o = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    cents = (o["o_totalprice"] * 100).round().astype("int64")
    return (
        pd.DataFrame({"day": o["o_orderdate"].dt.normalize(), "c": cents})
        .groupby("day")["c"]
        .sum()
        .sort_index()
    )


def test_bootstrap_ci_matches_hash_resampling(spark):
    """The deterministic bootstrap replayed with hashlib draws: the
    exact 2.5%/97.5% order statistics of the 200 resample means."""
    _skip_if_empty("orders")
    got = _run(spark, "a48_bootstrap_ci").iloc[0]
    daily = _daily_rev_cents()
    rev = (daily / 100.0).tolist()
    n = len(rev)
    means = []
    for b in range(1, 201):
        s = sum(rev[_md5_60(f"{b}:{i}") % n] for i in range(1, n + 1))
        means.append((s, b))
    means.sort()
    lo = means[5 - 1][0] / n   # ceil(0.025*200) = 5
    hi = means[195 - 1][0] / n  # ceil(0.975*200) = 195
    assert got["n_days"] == n
    assert got["b_resamples"] == 200
    assert abs(got["mean_daily_rev"] - sum(rev) / n) < 2e-6
    assert abs(got["ci_lo"] - lo) < 1e-4
    assert abs(got["ci_hi"] - hi) < 1e-4
    assert got["ci_lo"] <= got["mean_daily_rev"] <= got["ci_hi"]


def test_weekly_decompose_matches_centered_window(spark):
    """Detrended day-of-week means replayed with an explicit dd-RANGE
    centered 7-day window (only fully-covered days contribute)."""
    _skip_if_empty("orders")
    got = _run(spark, "a49_weekly_decompose").set_index("dow")
    o = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    cents = (o["o_totalprice"] * 100).round().astype("int64")
    dd = (
        o["o_orderdate"].dt.normalize() - pd.Timestamp("1970-01-01")
    ).dt.days
    daily = (
        pd.DataFrame({"dd": dd, "c": cents}).groupby("dd")["c"].sum()
    )
    per_dow = defaultdict(lambda: [0, 0, 0])  # n, sum_detr7_cents, sum_rev
    for d, c in daily.items():
        window = [daily.get(d + k) for k in range(-3, 4)]
        if any(v is None for v in window):
            continue
        detr7 = 7 * c - sum(window)
        st = per_dow[d % 7]
        st[0] += 1
        st[1] += detr7
        st[2] += c
    assert set(got.index) == set(per_dow)
    for dow, (n, sdetr, srev) in per_dow.items():
        row = got.loc[dow]
        assert row["n_days"] == n, dow
        assert abs(row["seasonal_component"] - sdetr / 100.0 / n / 7) < 2e-6
        assert abs(row["mean_daily_rev"] - srev / 100.0 / n) < 2e-6


def test_multiple_regression_matches_numpy_lstsq(spark):
    """The Cramer's-rule 2-predictor OLS against numpy least squares on
    the same quantized design matrix."""
    _skip_if_empty("lineitem")
    got = _run(spark, "a50_multiple_regression").set_index("flag")
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice", "l_discount"],
    )
    li = li[li["l_quantity"] > 0]
    q9 = lambda v: math.floor(v * 1e9 + 0.5) / 1e9  # noqa: E731
    for flag, grp in li.groupby("l_returnflag"):
        x1 = np.array(
            [q9(math.log(p / q)) for p, q in zip(grp["l_extendedprice"], grp["l_quantity"])]
        )
        x2 = grp["l_discount"].to_numpy(dtype=float)
        y = np.array([q9(math.log(q)) for q in grp["l_quantity"]])
        if flag not in got.index:
            continue
        X = np.column_stack([np.ones(len(x1)), x1, x2])
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        row = got.loc[flag]
        assert row["n_lines"] == len(x1), flag
        assert abs(row["intercept"] - beta[0]) < 1e-4, flag
        assert abs(row["beta_ln_price"] - beta[1]) < 1e-4, flag
        assert abs(row["beta_discount"] - beta[2]) < 1e-3, flag
    assert set(got.index) <= set(li["l_returnflag"].unique())


def test_countmin_never_underestimates_and_matches_replay(spark):
    """The defining CMS guarantee — estimates never undercount — plus
    an exact hashlib replay of the 4x256 table for the top-10 probes."""
    _skip_if_empty("documents")
    got = _run(spark, "a51_countmin_heavy_hitters")
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    true_counts: Counter = Counter()
    for text in docs["text"]:
        true_counts.update(text.split(" "))
    cells = defaultdict(int)
    for w, cnt in true_counts.items():
        for r in range(4):
            cells[(r, _md5_60(f"{w}#cm{r}") % 256)] += cnt
    top10 = sorted(true_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got["term"].tolist() == [w for w, _ in sorted(
        top10, key=lambda kv: (-kv[1], kv[0])
    )]
    gi = got.set_index("term")
    for w, cnt in top10:
        est = min(cells[(r, _md5_60(f"{w}#cm{r}") % 256)] for r in range(4))
        row = gi.loc[w]
        assert row["true_count"] == cnt, w
        assert row["cms_estimate"] == est, w
        assert row["cms_estimate"] >= row["true_count"], w  # CMS invariant
        assert row["overestimate"] == est - cnt, w


def test_quantile_sketch_matches_hash_sample_replay(spark):
    """The md5-ordered uniform sample and its quantile picks replayed
    exactly; the exact-side quantiles from full sorted ranks."""
    _skip_if_empty("orders")
    got = _run(spark, "a52_sample_quantile_sketch").set_index("q")
    o = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    n = len(o)
    k = min(n, 500)
    by_hash = sorted(
        zip(o["o_orderkey"], o["o_totalprice"]),
        key=lambda t: (hashlib.md5(str(t[0]).encode()).hexdigest(), t[0]),
    )[:k]
    samp = sorted((v, okey) for okey, v in by_hash)
    exact = sorted(zip(o["o_totalprice"], o["o_orderkey"]))
    for q in (0.50, 0.90, 0.99):
        est = samp[math.ceil(q * k) - 1][0]
        ex = exact[math.ceil(q * n) - 1][0]
        row = got.loc[q]
        assert abs(row["est"] - est) < 1e-9, q
        assert abs(row["exact_value"] - ex) < 1e-9, q
        assert abs(row["rel_error"] - abs(est - ex) / ex) < 2e-6, q


def test_kmv_sketch_matches_hash_replay(spark):
    """KMV distinct estimates for the two date partitions, their union
    (bottom-k of the merged hash set), and the inclusion-exclusion
    intersection, replayed with hashlib."""
    _skip_if_empty("orders")
    got_df = _run(spark, "a53_kmv_distinct_sketch")
    o = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )
    cut = pd.Timestamp("1998-06-01")
    parts = {0: set(), 1: set()}
    for ck, dt in zip(o["o_custkey"], o["o_orderdate"]):
        parts[0 if dt < cut else 1].add(_md5_60(str(ck)))
    if not parts[0] or not parts[1]:
        # one date partition empty: the two-partition report has no row
        assert len(got_df) == 0
        return
    got = got_df.iloc[0]

    def est(hs: set) -> float:
        if len(hs) < 64:
            return float(len(hs))
        kth = sorted(hs)[64 - 1]
        return 63 * float(2**60) / kth

    e0, e1 = est(parts[0]), est(parts[1])
    eu = est(parts[0] | parts[1])
    nu = len(parts[0] | parts[1])
    assert got["exact_p0"] == len(parts[0])
    assert got["exact_p1"] == len(parts[1])
    assert got["exact_union"] == nu
    assert abs(got["est_p0"] - e0) < 0.011
    assert abs(got["est_p1"] - e1) < 0.011
    assert abs(got["est_union"] - eu) < 0.011
    assert abs(got["est_intersection"] - (e0 + e1 - eu)) < 0.03
    assert abs(got["union_rel_error"] - abs(eu - nu) / nu) < 2e-6
