"""Skew-stress for the banded LSH candidate join (VERDICT r5 item 7).

A pathological near-dup cluster — many documents sharing identical text
— lands every member in the SAME band bucket for all four bands, so the
bucket self-join degenerates to a quadratic hot key on one task. The
engine's answer is AQE skew-join splitting (spark.sql.adaptive.*, on by
default in session.tune): the hot bucket's partition is split into
multiple tasks at runtime while results stay exactly correct.

This test builds a synthetic corpus with one hot cluster (60 identical
docs → 1770 intra-cluster pairs from a single bucket) plus distinct
background docs, then asserts:

1. correctness under skew — the candidate set contains exactly the
   hot-cluster pairs (completeness is the pigeonhole property: identical
   docs have identical signatures);
2. the plan keeps the bucket join an equi-join (SortMergeJoin /
   ShuffledHashJoin / BroadcastHashJoin — never a cartesian product),
   which is the property that lets AQE redistribute it;
3. AQE skew handling is actually armed on the session
   (skewJoin.enabled), so the 100 TB shape has the advertised escape
   hatch.

The fixture is deliberately tiny (local AQE won't trigger a physical
split below spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes;
forcing that here would just slow the suite) — what matters and is
asserted is correctness of the skewed result and the join SHAPE that
makes the runtime split possible.
"""

from __future__ import annotations

import pandas as pd
import pytest

import dock_financial_data_pipelines_spark as engine
from dock_financial_data_pipelines_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
)

engine.load_all()

N_HOT = 60
N_BACKGROUND = 40


@pytest.fixture(scope="module")
def skewed_docs(spark):
    rows = [
        # hot cluster: identical text → identical signatures → one bucket
        (i, "the quick brown fox jumps over the lazy dog again and again")
        for i in range(N_HOT)
    ] + [
        # background: distinct texts, no shared 3-shingles with the cluster
        (
            1000 + i,
            " ".join(f"tok{i}w{j}" for j in range(12)),
        )
        for i in range(N_BACKGROUND)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_skewed_cluster_pairs_exact(spark, skewed_docs):
    sigs = minhash_signatures(skewed_docs).localCheckpoint(eager=True)
    got = lsh_candidate_pairs(sigs).toPandas()
    got_pairs = set(zip(got.doc_a.astype(int), got.doc_b.astype(int)))
    want = {
        (a, b) for a in range(N_HOT) for b in range(N_HOT) if a < b
    }
    # completeness on the hot cluster (pigeonhole: identical signatures)
    assert want <= got_pairs, (
        f"missing {len(want - got_pairs)} of {len(want)} hot-cluster pairs"
    )
    # background docs share no shingles with the cluster; any candidate
    # involving them would be a hash-family accident (possible but with
    # 60-bit hashes vanishingly unlikely — treat as failure)
    extras = got_pairs - want
    assert not extras, f"unexpected cross-bucket candidates: {sorted(extras)[:5]}"


def test_skewed_join_stays_equi_join(spark, skewed_docs):
    sigs = minhash_signatures(skewed_docs).localCheckpoint(eager=True)
    cand = lsh_candidate_pairs(sigs)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, (
        "bucket join must stay an equi-join for AQE skew-split to apply"
    )
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    ), f"expected a hash/merge equi-join, got:\n{plan[:2000]}"


def test_aqe_skew_split_armed(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_band_occupancy_audit_reports_hot_bucket(spark, skewed_docs, sf_dir):
    """The l4_band_occupancy_audit query shape over the skewed fixture:
    each of the 4 bands must report exactly one bucket of size N_HOT,
    and its candidate_pairs must be the closed-form N*(N-1)/2."""
    from pyspark.sql import functions as F
    from dock_financial_data_pipelines_spark.operators.dedup import (
        _BANDS,
        _MINHASH_K,
        _ROWS_PER_BAND,
    )

    sigs = minhash_signatures(skewed_docs).localCheckpoint(eager=True)
    stack_args = []
    for b in range(_BANDS):
        cols = [f"mh{b * _ROWS_PER_BAND + r}" for r in range(_ROWS_PER_BAND)]
        sig = " , ".join(f"CAST({c} AS STRING)" for c in cols)
        stack_args.append(f"{b}, concat_ws('_', {sig})")
    banded = sigs.selectExpr(
        "doc_id", f"stack({_BANDS}, {', '.join(stack_args)}) AS (band, sig)"
    )
    occ = (
        banded.groupBy("band", "sig")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .where(F.col("bucket_size") == N_HOT)
        .toPandas()
    )
    assert len(occ) == _BANDS, (
        f"expected one size-{N_HOT} hot bucket per band, got\n{occ}"
    )
    assert _MINHASH_K == _BANDS * _ROWS_PER_BAND
    hot_pairs = N_HOT * (N_HOT - 1) // 2
    assert hot_pairs == 1770
