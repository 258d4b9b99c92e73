"""Cross-engine determinism on FRESH random vector geometries — the
property behind the round-5 "every query SQL-oracled" claim must not
be fixture luck. For each seeded geometry this test writes a brand-new
embeddings table (the other tables are borrowed from sf0.001) and
hash-compares the three integer-decision pipelines (quantized-LSH ANN,
integer k-means IVF, SemDeDup) against their DuckDB oracles: bucket
signs, Lloyd training, cell assignment and the exact re-rank must all
replay bit-for-bit on data no one tuned for."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import dock_financial_data_pipelines_spark as engine
from dock_financial_data_pipelines_spark.catalog import TABLES
from tests._compare import compare_frames, duck_connection

engine.load_all()

_SRC = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")
_QUERIES = ["l5_ann_lsh_topk", "l5_ivf_topk", "l_semantic_dedup",
            "l_pca_power_iteration"]
_N, _DIM = 300, 64


def _write_embeddings(path: str, seed: int, clustered: bool) -> None:
    rng = np.random.default_rng(seed)
    if clustered:
        centers = rng.normal(size=(6, _DIM))
        idx = rng.integers(0, 6, size=_N)
        x = centers[idx] + 0.15 * rng.normal(size=(_N, _DIM))
    else:
        x = rng.normal(size=(_N, _DIM))
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(_N), type=pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in x],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(rng.integers(0, 5, size=_N), type=pa.int32()),
        }
    )
    pq.write_table(tbl, path)


@pytest.fixture(scope="module", params=[(7, False), (13, True)],
                ids=["gaussian", "clustered"])
def geom_dir(request, tmp_path_factory) -> str:
    seed, clustered = request.param
    out = str(tmp_path_factory.mktemp(f"geom{seed}"))
    for name in TABLES:
        if name == "embeddings":
            continue
        src = os.path.join(_SRC, f"{name}.parquet")
        if os.path.exists(src):
            shutil.copy(src, os.path.join(out, f"{name}.parquet"))
    _write_embeddings(os.path.join(out, "embeddings.parquet"), seed, clustered)
    return out


@pytest.mark.parametrize("name", _QUERIES)
def test_random_geometry_parity(spark, geom_dir, name):
    con = duck_connection(geom_dir)
    spark_pdf = engine.QUERIES[name](spark, geom_dir).toPandas()
    assert len(spark_pdf) > 0, f"{name}: empty result on random geometry"
    compare_frames(spark_pdf, con.sql(engine.ORACLES[name]).df(), name)


def test_pca_power_iteration_converges(spark, tmp_path_factory):
    """Quality gate for the integer power iteration: on a geometry with
    a real spectral gap (clustered vectors), 5 rounds must land within
    cosine 0.9 of numpy's exact dominant eigenvector of the quantized
    second-moment matrix. (The sf fixtures are near-isotropic — gap
    ~1.07 — where a dominant direction barely exists; determinism is
    what the parity test above checks there.)"""
    out = str(tmp_path_factory.mktemp("pcageom"))
    for name in TABLES:
        if name == "embeddings":
            continue
        src = os.path.join(_SRC, f"{name}.parquet")
        if os.path.exists(src):
            shutil.copy(src, os.path.join(out, f"{name}.parquet"))
    _write_embeddings(os.path.join(out, "embeddings.parquet"), 11, True)
    pdf = engine.QUERIES["l_pca_power_iteration"](spark, out).toPandas()
    v = pdf.sort_values("dim")["loading_fp"].to_numpy().astype(float)

    import pyarrow.parquet as papq

    x = np.stack(
        papq.read_table(os.path.join(out, "embeddings.parquet"))
        .to_pandas()["embedding"]
        .to_numpy()
    )
    xq = np.floor(x * 4096 + 0.5)
    _, vecs = np.linalg.eigh(xq.T @ xq)
    top = vecs[:, -1]
    cos = abs(v @ top / (np.linalg.norm(v) * np.linalg.norm(top)))
    assert cos >= 0.9, f"power iteration off-axis: cosine {cos:.3f}"
