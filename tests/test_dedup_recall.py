"""Recall/completeness guarantees of the probabilistic dedup operators,
measured against exact ground truth computed independently in pandas.

- MinHash+LSH (4 bands × 3 rows): banding threshold ≈ (1/4)^(1/3) ≈ 0.63,
  so for true shingle-Jaccard ≥ 0.8 the candidate probability is ≥ 0.94
  per pair — recall on the verified output should be near-total.
- SimHash 16-bit-chunk bucketing: the pigeonhole argument guarantees
  100% recall at Hamming distance ≤ 3 — an exactness property, not a
  probabilistic one, so it is asserted exactly.
"""

from __future__ import annotations

import itertools

import pandas as pd

import dock_financial_data_pipelines_spark as engine

engine.load_all()


def _shingles(text: str, w: int = 3) -> set:
    toks = text.split(" ")
    if len(toks) <= w:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)}


def test_minhash_lsh_recall_on_high_jaccard_pairs(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    sh = {int(r.doc_id): _shingles(r.text) for r in docs.itertuples()}
    truth = set()
    for a, b in itertools.combinations(sorted(sh), 2):
        inter = len(sh[a] & sh[b])
        if inter == 0:
            continue
        j = inter / len(sh[a] | sh[b])
        if j >= 0.8:
            truth.add((a, b))
    assert truth, "fixture should contain high-Jaccard near-dup pairs"

    found_df = engine.QUERIES["l4_minhash_lsh_neardup"](spark, sf_dir).toPandas()
    found = set(zip(found_df.doc_a.astype(int), found_df.doc_b.astype(int)))
    recall = len(truth & found) / len(truth)
    print(f"MinHash-LSH recall on J>=0.8 pairs: {recall:.3f} over {len(truth)}")
    assert recall >= 0.9, f"LSH recall {recall:.3f} < 0.9 on J>=0.8 pairs"


def test_simhash_bucketing_is_complete_at_radius_3(spark, sf_dir):
    sigs_df = engine.QUERIES["l4_simhash_signatures"](spark, sf_dir).toPandas()
    sigs = dict(zip(sigs_df.doc_id.astype(int), sigs_df.simhash.astype(int)))
    truth = set()
    for a, b in itertools.combinations(sorted(sigs), 2):
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3:
            truth.add((a, b))

    found_df = engine.QUERIES["l4_simhash_neardup"](spark, sf_dir).toPandas()
    found = set(zip(found_df.doc_a.astype(int), found_df.doc_b.astype(int)))
    assert found == truth, (
        f"pigeonhole bucketing must be exact at radius 3: "
        f"missing={truth - found}, extra={found - truth}"
    )
