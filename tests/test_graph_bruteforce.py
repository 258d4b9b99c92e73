"""Brute-force references for the co-purchase graph operators:
triangle count (per-node set intersections over the ordered
orientation), degree histogram, and neighbor-set Jaccard top-k —
recomputed with plain Python dict/set arithmetic from raw lineitem."""

from __future__ import annotations

import math
import os
from collections import Counter, defaultdict

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


def _copurchase_adjacency() -> dict:
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).drop_duplicates()
    adj = defaultdict(set)
    for _, grp in li.groupby("l_orderkey"):
        parts = grp["l_partkey"].tolist()
        for i, a in enumerate(parts):
            for b in parts[i + 1 :]:
                if a != b:
                    adj[a].add(b)
                    adj[b].add(a)
    return adj


def test_triangle_count_matches_set_intersections(spark):
    _skip_if_empty("lineitem")
    adj = _copurchase_adjacency()
    got_df = _run(spark, "g_triangle_count")
    if not adj:
        assert len(got_df) == 0 or got_df.iloc[0]["n_edges"] == 0
        return
    got = got_df.iloc[0]
    n_edges = sum(len(v) for v in adj.values()) // 2
    tri = 0
    for a in adj:
        for b in adj[a]:
            if a < b:
                # common neighbors above b close (a,b) into an ordered
                # triangle exactly once
                tri += sum(1 for c in adj[a] & adj[b] if c > b)
    assert got["n_nodes"] == len(adj)
    assert got["n_edges"] == n_edges
    assert got["n_triangles"] == tri


def test_degree_distribution_matches_dict_counting(spark):
    _skip_if_empty("lineitem")
    adj = _copurchase_adjacency()
    got = _run(spark, "g_degree_distribution").set_index("degree")
    hist = Counter(len(v) for v in adj.values())
    assert set(got.index) == set(hist)
    for degree, n_parts in hist.items():
        assert got.loc[degree, "n_parts"] == n_parts, degree


def test_jaccard_similar_parts_matches_set_arithmetic(spark):
    _skip_if_empty("lineitem")
    adj = _copurchase_adjacency()
    got = _run(spark, "g_jaccard_similar_parts")
    want = []
    for a in sorted(adj):
        if a >= 200:
            continue
        scored = []
        for b in sorted(adj):
            if b == a:
                continue
            common = len(adj[a] & adj[b])
            if common < 2:
                continue
            j = common / (len(adj[a]) + len(adj[b]) - common)
            scored.append((-j, b, common))
        scored.sort()
        for rk, (negj, b, common) in enumerate(scored[:5], start=1):
            want.append(
                (a, b, common, rk, math.floor(-negj * 1e6 + 0.5) / 1e6)
            )
    got_rows = sorted(
        zip(got["part_a"], got["part_b"], got["common"], got["rk"],
            got["jaccard"])
    )
    assert len(got_rows) == len(want)
    for g, w in zip(got_rows, sorted(want)):
        assert g[0] == w[0] and g[1] == w[1], (g, w)
        assert g[2] == w[2] and g[3] == w[3], (g, w)
        assert abs(g[4] - w[4]) < 2e-6, (g, w)
