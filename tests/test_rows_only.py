"""Rows-only queries (no SQL oracle): must run, return a stable schema,
and be deterministic across two executions."""

from __future__ import annotations

import pytest

import dock_financial_data_pipelines_spark as engine

engine.load_all()

ROWS_ONLY = sorted(set(engine.QUERIES) - set(engine.ORACLES))
# Streaming smoke queries are exercised separately (slower: checkpoint setup)
_STREAMING = {n for n in ROWS_ONLY if n.startswith("x")}
_BATCH_ROWS_ONLY = [n for n in ROWS_ONLY if n not in _STREAMING]


@pytest.mark.parametrize("name", _BATCH_ROWS_ONLY)
def test_rows_only_runs_and_is_deterministic(spark, sf_dir, name):
    fn = engine.QUERIES[name]
    first = fn(spark, sf_dir)
    schema1 = first.schema
    pdf1 = first.toPandas()
    second = fn(spark, sf_dir)
    assert second.schema == schema1
    pdf2 = second.toPandas()
    # Full value determinism, not just cardinality: sort canonically and
    # require row-for-row equality between two executions.
    cols = sorted(pdf1.columns)
    a = pdf1[cols].astype(str).sort_values(cols).reset_index(drop=True)
    b = pdf2[cols].astype(str).sort_values(cols).reset_index(drop=True)
    assert a.equals(b), f"{name}: two runs produced different values"


@pytest.mark.parametrize("name", sorted(_STREAMING))
def test_streaming_smoke(spark, sf_dir, name):
    pdf = engine.QUERIES[name](spark, sf_dir).toPandas()
    assert len(pdf) >= 0


def test_ivf_recall_vs_exact(spark, sf_dir):
    """IVF with Lloyd-trained centroids, nProbe=4 of 8 cells, and 2-way
    corpus multi-assignment: ≥0.8 top-5 recall against exact brute force
    (0.92 measured on the near-orthogonal fixture — the hardest regime
    for a coarse quantizer)."""
    exact = engine.QUERIES["l5_cosine_topk"](spark, sf_dir).toPandas()
    ivf = engine.QUERIES["l5_ivf_topk"](spark, sf_dir).toPandas()
    truth = set(zip(exact.query_id, exact.neighbor_id))
    found = set(zip(ivf.query_id, ivf.neighbor_id))
    recall = len(truth & found) / len(truth)
    print(f"IVF top-5 recall = {recall:.3f} over {len(truth)} truth pairs")
    assert recall >= 0.8, f"IVF recall {recall:.3f} < 0.8"


def test_ann_lsh_recall_vs_exact(spark, sf_dir):
    """Multi-probe sign-LSH must reach ≥0.9 top-5 recall against the
    exact brute-force ground truth, even on the near-orthogonal fixture
    vectors (the hardest regime for angular LSH)."""
    exact = engine.QUERIES["l5_cosine_topk"](spark, sf_dir).toPandas()
    ann = engine.QUERIES["l5_ann_lsh_topk"](spark, sf_dir).toPandas()
    truth = set(zip(exact.query_id, exact.neighbor_id))
    found = set(zip(ann.query_id, ann.neighbor_id))
    recall = len(truth & found) / len(truth)
    print(f"ANN top-5 recall = {recall:.3f} over {len(truth)} truth pairs")
    assert recall >= 0.9, f"ANN recall {recall:.3f} < 0.9"


def test_registry_fully_oracled():
    """Round-5 invariant: the rows-only class is EMPTY — every
    registered query carries a DuckDB oracle. A new registration
    without an oracle must be a deliberate, documented decision, not a
    default; this test makes the regression loud."""
    missing = sorted(set(engine.QUERIES) - set(engine.ORACLES))
    assert missing == [], (
        f"queries registered without a SQL oracle: {missing} — add an "
        "oracle (see COVERAGE.md 'Registry state (round 5)' for the "
        "determinism idioms) or document why rows-only is unavoidable"
    )
