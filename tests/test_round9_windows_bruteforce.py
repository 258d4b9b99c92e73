"""Brute-force references for the round-9 indicator family (w33–w39):
CCI, Williams %R, MFI, TRIX, vortex, force index, elder-ray. Textbook
plain-Python recomputation from the raw events parquet (explicit
window loops, math.fsum accumulation), independent of the SQL twin
oracles — a defect shared by both engines still surfaces here."""

from __future__ import annotations

import math
import os

import pandas as pd
import pytest

import dock_financial_data_pipelines_spark as engine

SF = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")

# engine outputs are floor(x*1e4+0.5)/1e4-rounded; the references
# accumulate with fsum, so one grid step covers any residual ulp drift
TOL = 1.1e-4


def _run(spark, name: str) -> pd.DataFrame:
    return engine.QUERIES[name](spark, SF).toPandas()


def _skip_if_empty(table: str) -> None:
    import pyarrow.parquet as pq

    if pq.read_metadata(f"{SF}/{table}.parquet").num_rows == 0:
        pytest.skip(f"{table} empty: covered by the empty-fixture sweep")


def _bars():
    """(day, open, high, low, close, vol) per day, (ts, event_id)
    ordering for open/close — the _daily_bars compaction replayed."""
    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["ts", "event_id", "value"]
    ).sort_values(["ts", "event_id"])
    ev["day"] = ev["ts"].dt.strftime("%Y-%m-%d")
    out = []
    for day, g in ev.groupby("day", sort=True):
        v = g["value"].tolist()
        out.append((day, v[0], max(v), min(v), v[-1], len(v)))
    return out


def _hourly_close():
    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["ts", "event_id", "value"]
    ).sort_values(["ts", "event_id"])
    ev["hr"] = ev["ts"].dt.strftime("%Y-%m-%d %H")
    return [
        (hr, g["value"].tolist()[-1]) for hr, g in ev.groupby("hr", sort=True)
    ]


def _ema_poly(series, i, decay, n):
    """Truncated lag-polynomial EMA, None when any lag is undefined
    (mirrors SQL NULL propagation through lag())."""
    if i - (n - 1) < 0:
        return None
    num = math.fsum(series[i - k] * decay**k for k in range(n))
    return num / ((1 - decay**n) / (1 - decay))


def test_cci_matches_window_loop(spark):
    _skip_if_empty("events")
    got = _run(spark, "w33_cci")
    bars = _bars()
    tp = [(h + lo + c) / 3 for _, _, h, lo, c, _ in bars]
    rows = []
    for i in range(19, len(bars)):
        w = tp[i - 19 : i + 1]
        sma = math.fsum(w) / 20
        md = math.fsum(abs(x - sma) for x in w) / 20
        if md != 0:
            rows.append((bars[i][0], sma, md, (tp[i] - sma) / (0.015 * md)))
    assert len(got) == len(rows)
    for g, (day, sma, md, cci) in zip(got.itertuples(), rows):
        assert g.day == day
        assert abs(g.sma20 - sma) < TOL
        assert abs(g.md20 - md) < TOL
        assert abs(g.cci - cci) < max(TOL, abs(cci) * 1e-9), day


def test_williams_r_matches_window_loop(spark):
    _skip_if_empty("events")
    got = _run(spark, "w34_williams_r")
    bars = _bars()
    rows = []
    for i in range(13, len(bars)):
        hh = max(b[2] for b in bars[i - 13 : i + 1])
        ll = min(b[3] for b in bars[i - 13 : i + 1])
        c = bars[i][4]
        if hh != ll:
            rows.append((bars[i][0], hh, ll, -100 * (hh - c) / (hh - ll)))
    assert len(got) == len(rows)
    for g, (day, hh, ll, wr) in zip(got.itertuples(), rows):
        assert g.day == day
        assert abs(g.hh14 - hh) < TOL and abs(g.ll14 - ll) < TOL
        assert abs(g.williams_r - wr) < TOL, day


def test_mfi_matches_window_loop(spark):
    _skip_if_empty("events")
    got = _run(spark, "w35_mfi")
    bars = _bars()
    tp = [(h + lo + c) / 3 for _, _, h, lo, c, _ in bars]
    vol = [b[5] for b in bars]
    pos = [0.0] + [
        tp[i] * vol[i] if tp[i] > tp[i - 1] else 0.0
        for i in range(1, len(bars))
    ]
    neg = [0.0] + [
        tp[i] * vol[i] if tp[i] < tp[i - 1] else 0.0
        for i in range(1, len(bars))
    ]
    rows = []
    for i in range(14, len(bars)):
        p = math.fsum(pos[i - 13 : i + 1])
        n = math.fsum(neg[i - 13 : i + 1])
        if p + n != 0:
            rows.append((bars[i][0], p, n, 100 * p / (p + n)))
    assert len(got) == len(rows)
    for g, (day, p, n, mfi) in zip(got.itertuples(), rows):
        assert g.day == day
        assert abs(g.pos14 - p) < max(TOL, p * 1e-9)
        assert abs(g.neg14 - n) < max(TOL, n * 1e-9)
        assert abs(g.mfi - mfi) < TOL, day


def test_trix_matches_triple_ema_loop(spark):
    _skip_if_empty("events")
    got = _run(spark, "w36_trix")
    ser = _hourly_close()
    close = [c for _, c in ser]
    e1 = [_ema_poly(close, i, 0.8, 9) for i in range(len(close))]
    # stage-k polynomial needs 9 defined stage-(k-1) values
    e2 = [None if i < 16 else _ema_poly(e1, i, 0.8, 9)
          for i in range(len(e1))]
    e3 = [None if i < 24 else _ema_poly(e2, i, 0.8, 9)
          for i in range(len(e2))]
    rows = []
    for i in range(25, len(ser)):
        if e3[i] is not None and e3[i - 1] not in (None, 0):
            rows.append(
                (ser[i][0], e3[i], 1e4 * (e3[i] - e3[i - 1]) / e3[i - 1])
            )
    assert len(got) == len(rows)
    for g, (hr, e, t) in zip(got.itertuples(), rows):
        assert g.hr == hr
        assert abs(g.ema3 - e) < max(TOL, abs(e) * 1e-9)
        assert abs(g.trix_bp - t) < max(TOL, abs(t) * 1e-6), hr


def test_vortex_matches_window_loop(spark):
    _skip_if_empty("events")
    got = _run(spark, "w37_vortex")
    bars = _bars()
    vmp, vmm, tr = [None], [None], [None]
    for i in range(1, len(bars)):
        _, _, h, lo, c, _ = bars[i]
        _, _, ph, pl, pc, _ = bars[i - 1]
        vmp.append(abs(h - pl))
        vmm.append(abs(lo - ph))
        tr.append(max(h - lo, abs(h - pc), abs(lo - pc)))
    rows = []
    for i in range(14, len(bars)):
        t = math.fsum(tr[i - 13 : i + 1])
        if t != 0:
            rows.append(
                (
                    bars[i][0],
                    t,
                    math.fsum(vmp[i - 13 : i + 1]) / t,
                    math.fsum(vmm[i - 13 : i + 1]) / t,
                )
            )
    assert len(got) == len(rows)
    for g, (day, t, vp, vm) in zip(got.itertuples(), rows):
        assert g.day == day
        assert abs(g.tr14 - t) < max(TOL, t * 1e-9)
        assert abs(g.vi_plus - vp) < TOL and abs(g.vi_minus - vm) < TOL, day


def test_force_index_matches_ema_loop(spark):
    _skip_if_empty("events")
    got = _run(spark, "w38_force_index")
    bars = _bars()
    fi1 = [None] + [
        (bars[i][4] - bars[i - 1][4]) * bars[i][5]
        for i in range(1, len(bars))
    ]
    rows = []
    for i in range(13, len(bars)):
        e = _ema_poly(fi1[1:], i - 1, 6.0 / 7.0, 13)
        rows.append((bars[i][0], fi1[i], e))
    assert len(got) == len(rows)
    for g, (day, f1, f13) in zip(got.itertuples(), rows):
        assert g.day == day
        assert abs(g.fi1 - f1) < max(TOL, abs(f1) * 1e-9)
        assert abs(g.fi13 - f13) < max(TOL, abs(f13) * 1e-9), day


def test_elder_ray_matches_ema_loop(spark):
    _skip_if_empty("events")
    got = _run(spark, "w39_elder_ray")
    bars = _bars()
    close = [b[4] for b in bars]
    rows = []
    for i in range(12, len(bars)):
        e = _ema_poly(close, i, 6.0 / 7.0, 13)
        rows.append((bars[i][0], e, bars[i][2] - e, bars[i][3] - e))
    assert len(got) == len(rows)
    for g, (day, e, bull, bear) in zip(got.itertuples(), rows):
        assert g.day == day
        assert abs(g.ema13 - e) < max(TOL, abs(e) * 1e-9)
        assert abs(g.bull_power - bull) < TOL
        assert abs(g.bear_power - bear) < TOL, day
