"""Regression locks for bench.py's measurement instrument (pure Python,
no Spark): the round-10 defect was a hand-maintained exclusion chain
that silently corrupted every shared subtotal when the suite grew.
These tests pin the tag-derived design so it cannot regress."""

from __future__ import annotations

import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench_namespace() -> dict:
    """Extract HEADLINE_ROUNDS/_ROUND_OF/_SHARED_BOUNDARIES without
    importing bench.py (its import starts the engine registry)."""
    src = open(os.path.join(ROOT, "bench.py")).read()
    m = re.search(
        r"HEADLINE_ROUNDS.*?\n\]", src, re.S
    )
    ns: dict = {}
    exec(m.group(0).replace(": list[tuple[str, int]]", ""), ns)
    rounds = dict(ns["HEADLINE_ROUNDS"])
    for base in (
        "flagship_segment_monthly_revenue",
        "j9_star_join",
        "report_region_market_share",
    ):
        rounds[f"{base}__noBroadcast"] = rounds[base]
    bounds = tuple(
        int(x) for x in re.search(
            r"_SHARED_BOUNDARIES = \(([\d, ]+)\)", src
        ).group(1).split(",") if x.strip()
    )
    return {"rounds": rounds, "bounds": bounds,
            "headline": [n for n, _ in ns["HEADLINE_ROUNDS"]]}


def test_every_headline_entry_has_a_round_tag():
    ns = _bench_namespace()
    assert len(ns["headline"]) == len(set(ns["headline"]))
    assert all(isinstance(r, int) for r in ns["rounds"].values())


def test_shared_subtotals_in_detail_file_match_tag_derivation():
    """BENCH_DETAIL.json's published value_shared_* must equal the sum
    over exactly the tag-derived name sets — the recomputation check
    the round-10 VERDICT prescribed, now a standing test."""
    path = os.path.join(ROOT, "BENCH_DETAIL.json")
    if not os.path.exists(path):
        return
    d = json.load(open(path))
    if "calib_jvm_sec" not in d:
        return  # pre-r11 detail file: different membership rules
    ns = _bench_namespace()
    rounds = ns["rounds"]
    for k in ns["bounds"]:
        expect = round(
            sum(v for n, v in d["queries"].items()
                if rounds.get(n, 99) <= k),
            3,
        )
        assert abs(d[f"value_shared_r{k}"] - expect) < 0.002, k


def test_anchor_matches_detail_queries():
    """BENCH_ANCHOR.json must be a faithful copy of a detail file's
    medians: same stat, calibration recorded, per-query values sane."""
    path = os.path.join(ROOT, "BENCH_ANCHOR.json")
    if not os.path.exists(path):
        return
    a = json.load(open(path))
    assert a["headline_stat"] == "median"
    assert a["calib_jvm_sec"] > 0 and a["calib_py_sec"] > 0
    assert all(v >= 0 for v in a["queries"].values())
