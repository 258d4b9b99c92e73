"""Recall/completeness guarantees of the probabilistic dedup operators,
measured against exact ground truth computed independently in pandas.

- MinHash+LSH (4 bands × 3 rows): banding threshold ≈ (1/4)^(1/3) ≈ 0.63,
  so for true shingle-Jaccard ≥ 0.8 the candidate probability is ≥ 0.94
  per pair — recall on the verified output should be near-total.
- SimHash 15-bit-chunk bucketing over the 60-bit md5 signature: the
  pigeonhole argument guarantees 100% recall at Hamming distance ≤ 3 —
  an exactness property, not a probabilistic one, so it is asserted
  exactly.
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


def test_semantic_dedup_within_cell_exact(spark, sf_dir):
    """l_semantic_dedup's keep rule is deterministic given the cells:
    recompute the within-cell min-id dedup brute-force and compare the
    per-cell counts exactly."""
    import math

    import dock_financial_data_pipelines_spark as engine
    from dock_financial_data_pipelines_spark.catalog import load, memo_index, sf_tag
    from dock_financial_data_pipelines_spark.operators.dedup import _SEM_TAU
    from dock_financial_data_pipelines_spark.operators.similarity import (
        _ivf_assign,
        _ivf_train_centroids,
    )
    from pyspark.sql import functions as F

    engine.load_all()
    got = {
        r["cell"]: (r["n_vectors"], r["n_dropped"], r["n_kept"])
        for r in engine.QUERIES["l_semantic_dedup"](spark, sf_dir).collect()
    }

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    centroids = memo_index(
        spark,
        f"semdedup_centroids:{sf_tag(sf_dir)}",
        lambda: _ivf_train_centroids(spark, emb).localCheckpoint(eager=True),
    )
    cells = _ivf_assign(
        emb.select(F.col("vec_id").alias("_id"), F.col("e").alias("ce")),
        centroids, "ce", 1,
    ).collect()
    by_cell: dict = {}
    for r in cells:
        by_cell.setdefault(r["cell"], []).append((r["_id"], list(r["ce"])))

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    want = {}
    for cell, vecs in by_cell.items():
        vecs.sort()
        dropped = set()
        for i, (ida, ea) in enumerate(vecs):
            for idb, eb in vecs[i + 1:]:
                if cos(ea, eb) >= _SEM_TAU:
                    dropped.add(idb)
        want[cell] = (len(vecs), len(dropped), len(vecs) - len(dropped))
    assert got == want


def test_semantic_dedup_second_geometry(spark, tmp_path):
    """Keep-rule exactness on a SECOND, hostile cell geometry (round-4
    verdict ask #7): anchored clusters whose pairs straddle the
    _SEM_TAU cosine boundary at tau±0.05, near-identical duplicates,
    and antipodal vectors — nothing like the fixture's random normals,
    so a threshold-comparison or keep-rule bug that the smooth fixture
    masks would surface here. Ground truth is recomputed brute-force
    within the engine's own cell assignment, same as the fixture test."""
    import math

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dock_financial_data_pipelines_spark.catalog import memo_index, sf_tag
    from dock_financial_data_pipelines_spark.operators.dedup import _SEM_TAU
    from dock_financial_data_pipelines_spark.operators.similarity import (
        _ivf_assign,
        _ivf_train_centroids,
    )
    from pyspark.sql import functions as F

    rng = np.random.RandomState(11)
    dim = 16
    anchors = np.linalg.qr(rng.randn(dim, 6))[0].T  # 6 orthonormal anchors

    def at_cosine(a: np.ndarray, c: float) -> np.ndarray:
        r = rng.randn(dim)
        p = r - np.dot(r, a) * a
        p /= np.linalg.norm(p)
        return c * a + math.sqrt(1.0 - c * c) * p

    vecs = []
    for a in anchors:
        vecs.append(a)                                  # the anchor
        vecs.append(-a)                                 # antipodal (cos=-1)
        vecs.append(at_cosine(a, 0.999))                # near-identical dup
        vecs.append(at_cosine(a, _SEM_TAU + 0.05))      # just above tau
        vecs.append(at_cosine(a, _SEM_TAU - 0.05))      # just below tau
    out = str(tmp_path / "geom2")
    import os

    os.makedirs(out, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(list(range(len(vecs))), pa.int64()),
                "embedding": pa.array(
                    [[float(x) for x in v] for v in vecs], pa.list_(pa.float32())
                ),
            }
        ),
        os.path.join(out, "embeddings.parquet"),
    )

    got = {
        r["cell"]: (r["n_vectors"], r["n_dropped"], r["n_kept"])
        for r in engine.QUERIES["l_semantic_dedup"](spark, out).collect()
    }

    from dock_financial_data_pipelines_spark.catalog import load

    emb = load(spark, out, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    centroids = memo_index(
        spark,
        f"semdedup_centroids:{sf_tag(out)}",
        lambda: _ivf_train_centroids(spark, emb).localCheckpoint(eager=True),
    )
    cells = _ivf_assign(
        emb.select(F.col("vec_id").alias("_id"), F.col("e").alias("ce")),
        centroids, "ce", 1,
    ).collect()
    by_cell: dict = {}
    for r in cells:
        by_cell.setdefault(r["cell"], []).append((r["_id"], list(r["ce"])))

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    want = {}
    n_dup_pairs = 0
    for cell, cv in by_cell.items():
        cv.sort()
        dropped = set()
        for i, (ida, ea) in enumerate(cv):
            for idb, eb in cv[i + 1:]:
                if cos(ea, eb) >= _SEM_TAU:
                    dropped.add(idb)
                    n_dup_pairs += 1
        want[cell] = (len(cv), len(dropped), len(cv) - len(dropped))
    assert n_dup_pairs > 0, "geometry must exercise the >= tau branch"
    assert got == want
