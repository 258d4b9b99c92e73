"""Skew-stress for the two round-6 banded joins (VERDICT r6 item 6),
modeled on tests/test_lsh_skew.py.

1. q_duplicate_payments_fuzzy — one hot (customer, week) bucket: 40
   orders from one customer in a single week with identical amounts.
   Every pair collides in the same band bucket, so the candidate join
   degenerates to a quadratic hot key; correctness must hold (all
   C(40,2) pairs, nothing else) and the join must stay an equi-join so
   AQE skew-splitting can redistribute it at scale.

2. l_substring_span_pairs — a pathological repeated-text document pair:
   every 8-token shingle in both docs hashes identically, so the
   position match join concentrates len² matches on ONE shingle-hash
   key. The gaps-and-islands span assembly must still produce the
   closed-form result (one maximal span per diagonal), and the hot-key
   join must stay an equi-join.

Fixtures are tiny on purpose: local AQE won't physically split below
skewedPartitionThresholdInBytes, and forcing that would only slow the
suite. What is asserted is exact correctness under the skewed key
distribution plus the plan SHAPE that makes the runtime split possible
(equi-join, AQE armed) — the same contract test_lsh_skew.py pins.
"""

from __future__ import annotations

import os

import pytest

import dock_financial_data_pipelines_spark as engine

engine.load_all()

N_HOT_ORDERS = 40
N_REP_TOKENS = 60  # repeated-token doc length; 53 shingles per doc


@pytest.fixture(scope="module")
def skew_sf_dir(spark, tmp_path_factory) -> str:
    """A minimal fixture dir with skew-stressed orders + documents."""
    d = str(tmp_path_factory.mktemp("banded_skew_sf"))

    # --- orders: one hot (customer, week) bucket + filtered background.
    rows = [
        # hot: 40 same-customer orders, same day, identical amount ->
        # one band bucket holds all of them; every pair must verify.
        (i + 1, 1, "1995-03-07", 100.00)
        for i in range(N_HOT_ORDERS)
    ] + [
        # background A: same customer+amount but 8 days apart -> banded
        # as adjacent-bucket candidates, killed by the day_gap<=7 verify.
        (1001, 200, "1995-03-01", 500.00),
        (1002, 200, "1995-03-09", 500.00),
        # background B: same customer+day but 2% amount gap -> candidate
        # killed by the 1% amount verify.
        (1003, 300, "1995-03-07", 100.00),
        (1004, 300, "1995-03-07", 102.00),
    ]
    spark.createDataFrame(
        [(k, c, dt, amt) for k, c, dt, amt in rows],
        "o_orderkey long, o_custkey long, o_orderdate string, "
        "o_totalprice double",
    ).selectExpr(
        "o_orderkey",
        "o_custkey",
        "CAST(o_orderdate AS DATE) AS o_orderdate",
        "o_totalprice",
    ).coalesce(1).write.parquet(os.path.join(d, "orders.parquet"))

    # --- documents: a repeated-token doc pair (hot shingle hash) + a
    # normal shared-paragraph pair + distinct background docs.
    rep = " ".join(["dup"] * N_REP_TOKENS)
    para = " ".join(f"para{j}" for j in range(16))
    docs = [
        (1, rep),
        (2, rep),
        (3, para + " " + " ".join(f"tailA{j}" for j in range(10))),
        (4, " ".join(f"headB{j}" for j in range(10)) + " " + para),
    ] + [
        (100 + i, " ".join(f"bg{i}w{j}" for j in range(30)))
        for i in range(20)
    ]
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(
        1
    ).write.parquet(os.path.join(d, "documents.parquet"))
    return d


def test_fuzzy_payments_hot_bucket_exact(spark, skew_sf_dir):
    got = (
        engine.QUERIES["q_duplicate_payments_fuzzy"](spark, skew_sf_dir)
        .toPandas()
    )
    got_pairs = set(zip(got.okey_a.astype(int), got.okey_b.astype(int)))
    want = {
        (a, b)
        for a in range(1, N_HOT_ORDERS + 1)
        for b in range(1, N_HOT_ORDERS + 1)
        if a < b
    }
    assert got_pairs == want, (
        f"hot-bucket pairs wrong: missing {len(want - got_pairs)}, "
        f"extra {sorted(got_pairs - want)[:5]}"
    )
    assert (got.day_gap == 0).all() and (got.custkey == 1).all()
    # background verifies were filtered, not silently included
    assert not (got.okey_a >= 1000).any()


def test_fuzzy_payments_join_stays_equi_join(spark, skew_sf_dir):
    df = engine.QUERIES["q_duplicate_payments_fuzzy"](spark, skew_sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert (
        "CartesianProduct" not in plan
        and "BroadcastNestedLoop" not in plan
    ), "band-bucket join must stay an equi-join for AQE skew-split"
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    ), f"expected a hash/merge equi-join, got:\n{plan[:2000]}"


def test_substring_spans_repeated_text_exact(spark, skew_sf_dir):
    got = (
        engine.QUERIES["l_substring_span_pairs"](spark, skew_sf_dir)
        .toPandas()
        .set_index(["doc_a", "doc_b"])
    )
    n_sh = N_REP_TOKENS - 8 + 1  # stride-1 8-token shingles per doc
    # repeated-token pair: every shingle matches every position ->
    # one maximal span per diagonal, closed forms below.
    rep = got.loc[(1, 2)]
    assert int(rep.max_span_tokens) == N_REP_TOKENS
    assert int(rep.n_spans) == 2 * n_sh - 1
    assert int(rep.n_matched_shingles) == n_sh * n_sh
    # normal shared 16-token paragraph: 9 consecutive shingle matches
    # on one diagonal -> ONE maximal span of 9 + 7 = 16 tokens.
    para = got.loc[(3, 4)]
    assert int(para.max_span_tokens) == 16
    assert int(para.n_spans) == 1
    assert int(para.n_matched_shingles) == 9
    # background docs share no 8-grams with anything
    assert set(got.index) == {(1, 2), (3, 4)}


def test_substring_spans_join_stays_equi_join(spark, skew_sf_dir):
    df = engine.QUERIES["l_substring_span_pairs"](spark, skew_sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert (
        "CartesianProduct" not in plan
        and "BroadcastNestedLoop" not in plan
    ), "shingle-hash match join must stay an equi-join for AQE skew-split"
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    ), f"expected a hash/merge equi-join, got:\n{plan[:2000]}"


def test_aqe_skew_split_armed(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


# ---------------------------------------------------------------------------
# l_containment_pairs skew stress (VERDICT r7 item 5): the containment
# sibling of the LSH/substring-span family. One boilerplate 3-gram
# shared by 60 docs sits JUST under the docfreq cap (64), so the
# candidate equi-join concentrates C(60,2) = 1770 pairs on ONE
# shingle-hash key; every one must be killed by the exact containment
# verify (1 shared shingle / 5 per doc = 0.2 < 0.6). A second
# boilerplate shared by 70 docs exceeds the cap and must be dropped
# BEFORE the join (zero candidate pairs from it). True positives —
# a prefix-contained doc pair and a repeated-token pair — must survive
# with exact closed-form containment.
# ---------------------------------------------------------------------------
N_BOIL_HOT = 60   # shares "hota hotb hotc": df 60 <= cap 64 -> hot key
N_BOIL_OVER = 70  # shares "ova ovb ovc":    df 70 >  cap 64 -> dropped


@pytest.fixture(scope="module")
def containment_sf_dir(spark, tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("containment_skew_sf"))
    contained = "c1 c2 c3 c4 c5 c6"  # 4 shingles, all inside the next doc
    docs = (
        [
            # hot-but-under-cap group: 1 shared boilerplate shingle + 4
            # doc-unique shingles each -> containment 1/5 = 0.2, killed.
            (
                1000 + i,
                f"hota hotb hotc u{i}a u{i}b u{i}c u{i}d",
            )
            for i in range(N_BOIL_HOT)
        ]
        + [
            # over-cap group: shared shingle df 70 > 64, dropped pre-join.
            (
                2000 + i,
                f"ova ovb ovc v{i}a v{i}b v{i}c v{i}d",
            )
            for i in range(N_BOIL_OVER)
        ]
        + [
            # true containment: doc 1 is a prefix of doc 2.
            (1, contained),
            (2, contained + " x1 x2 x3 x4 x5 x6"),
            # repeated-token pair: each doc = ONE distinct shingle.
            (3, " ".join(["dup"] * 50)),
            (4, " ".join(["dup"] * 30)),
        ]
    )
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(
        1
    ).write.parquet(os.path.join(d, "documents.parquet"))
    return d


def test_containment_hot_key_verify_kills_all(spark, containment_sf_dir):
    got = (
        engine.QUERIES["l_containment_pairs"](spark, containment_sf_dir)
        .toPandas()
        .set_index(["doc_a", "doc_b"])
    )
    # the 1770 hot-key candidates and every over-cap doc produced NOTHING
    assert set(got.index) == {(1, 2), (3, 4)}, sorted(got.index)[:10]
    pre = got.loc[(1, 2)]
    # doc 1: 6 tokens -> 4 shingles (n-2), all present in doc 2
    # (12 tokens -> 10 shingles)
    assert int(pre.n_common) == 4
    assert int(pre.size_a) == 4 and int(pre.size_b) == 10
    assert float(pre.containment) == 1.0
    rep = got.loc[(3, 4)]
    assert int(rep.n_common) == 1
    assert int(rep.size_a) == 1 and int(rep.size_b) == 1
    assert float(rep.containment) == 1.0


def test_containment_join_stays_equi_join(spark, containment_sf_dir):
    df = engine.QUERIES["l_containment_pairs"](spark, containment_sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert (
        "CartesianProduct" not in plan
        and "BroadcastNestedLoop" not in plan
    ), "containment candidate join must stay an equi-join for AQE skew-split"
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    ), f"expected a hash/merge equi-join, got:\n{plan[:2000]}"
