"""Unit test for the connected-components operator on a known graph."""

from __future__ import annotations

from dock_financial_data_pipelines_spark.operators.dedup import connected_components


def test_connected_components_known_graph(spark):
    # Components: {0,1,2} (chain), {3,4} (edge), {5} (isolated).
    nodes = spark.createDataFrame([(i,) for i in range(6)], ["node"])
    edges = spark.createDataFrame([(0, 1), (1, 2), (3, 4)], ["src", "dst"])
    got = {
        r.node: r.component
        for r in connected_components(nodes, edges).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5}


def test_connected_components_long_chain_converges(spark):
    # A 12-node chain needs several propagation rounds; label must reach
    # the far end (min id = 0 everywhere).
    n = 12
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["node"])
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["src", "dst"])
    comps = {r.component for r in connected_components(nodes, edges).collect()}
    assert comps == {0}


def test_maybe_broadcast_respects_disable_conf(spark, sf_dir):
    from dock_financial_data_pipelines_spark.catalog import load, maybe_broadcast

    nation = load(spark, sf_dir, "nation")
    assert "ResolvedHint" in maybe_broadcast(nation)._jdf.queryExecution().analyzed().toString()
    spark.conf.set("spark.dock.disableBroadcastHints", "true")
    try:
        assert "ResolvedHint" not in maybe_broadcast(nation)._jdf.queryExecution().analyzed().toString()
    finally:
        spark.conf.set("spark.dock.disableBroadcastHints", "false")
