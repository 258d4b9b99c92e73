"""Unit test for the connected-components operator on a known graph."""

from __future__ import annotations

from pyspark.sql import functions as F

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


def test_repetition_stats_one_word_doc_yields_no_bigram_row(spark, tmp_path):
    """ADVICE r3: sequence(1, size-1) on a 1-word doc is Spark's
    DESCENDING [1, 0], which fabricated two junk bigrams while the
    DuckDB oracle's range(1, 1) is empty. The engine must now drop
    bigram-less docs exactly like the oracle's inner join."""
    from dock_financial_data_pipelines_spark.operators.text import (
        l_repetition_stats,
    )

    spark.createDataFrame(
        [(1, "solo"), (2, "two words"), (3, "a a a b")],
        ["doc_id", "text"],
    ).write.parquet(str(tmp_path / "documents.parquet"))
    rows = {r.doc_id: r for r in l_repetition_stats(spark, str(tmp_path)).collect()}
    assert set(rows) == {2, 3}, "1-word doc must drop (no bigrams)"
    assert rows[2].n_words == 2 and rows[2].top_bigram_frac == 1.0
    # doc 3: words a,a,a,b -> bigrams (a a),(a a),(a b): top 2/3.
    assert rows[3].n_words == 4
    assert abs(rows[3].top_bigram_frac - 2 / 3) < 1e-6


def test_currency_asof_drops_facts_before_first_rate(spark, tmp_path):
    """ADVICE r3: an order dated before its currency's first rate fix
    (1995-01-01) must DROP, matching the oracle's inner ASOF JOIN —
    the carry window would otherwise keep it with a NULL rate."""
    import datetime

    from dock_financial_data_pipelines_spark.operators.joins import (
        j12_currency_asof_convert,
    )

    orders = [
        # pre-first-fix order: must not appear in any group's n_orders
        (1, 10, "O", 100.0, datetime.datetime(1994, 6, 1), "1-URGENT"),
        (2, 10, "O", 200.0, datetime.datetime(1995, 6, 1), "1-URGENT"),
        (3, 11, "O", 300.0, datetime.datetime(1996, 1, 2), "1-URGENT"),
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    res = j12_currency_asof_convert(spark, str(tmp_path)).collect()
    assert sum(r.n_orders for r in res) == 2
    assert {(r.yr, r.cur) for r in res} == {(1995, 0), (1996, 1)}


def test_pack_materializer_reassembles_corpus_exactly(spark, sf_dir):
    """packed_sequence_texts must be a lossless re-cut of the corpus:
    per shard, concatenating sequences in seq_id order reproduces the
    concatenation of documents in doc_id order token-for-token, and
    every non-final sequence is exactly at capacity."""
    from dock_financial_data_pipelines_spark.catalog import load
    from dock_financial_data_pipelines_spark.operators.training import (
        pack_assignments,
        packed_sequence_texts,
    )

    C, S = 64, 4
    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 40)
    seqs = packed_sequence_texts(docs, capacity=C, shards=S).collect()
    by_shard: dict = {}
    for r in seqs:
        by_shard.setdefault(r.shard, []).append(r)
    src = {
        s: [
            w
            for row in docs.where(F.col("doc_id") % S == s)
            .orderBy("doc_id")
            .collect()
            for w in row.text.split(" ")
        ]
        for s in range(S)
    }
    for s, rows in by_shard.items():
        rows.sort(key=lambda r: r.seq_id)
        rebuilt = [w for r in rows for w in r.text.split(" ")]
        assert rebuilt == src[s], f"shard {s} token stream differs"
        for r in rows[:-1]:
            assert r.n_tokens == C, "non-final sequence must be full"
        assert 0 < rows[-1].n_tokens <= C

    # The assignment plan agrees with the stats query's occupancy.
    plan = pack_assignments(docs, capacity=C, shards=S)
    tot = plan.groupBy().agg(
        F.sum(F.col("doc_tok_end") - F.col("doc_tok_start")).alias("t")
    ).collect()[0].t
    assert tot == sum(len(v) for v in src.values())


def test_fixture_timestamps_never_ntz(spark, sf_dir):
    """Regression guard for the round-4 testdata regeneration: fixture
    parquet stores timestamps without the isAdjustedToUTC flag, which a
    default Spark 4 session infers as TIMESTAMP_NTZ — a type watermarks
    reject and numeric casts refuse. catalog.load must always hand back
    session-timezone TIMESTAMP columns regardless of how the conf race
    went."""
    from pyspark.sql.types import TimestampNTZType

    from dock_financial_data_pipelines_spark.catalog import TABLES, load

    for name in TABLES:
        for field in load(spark, sf_dir, name).schema.fields:
            assert not isinstance(field.dataType, TimestampNTZType), (
                f"{name}.{field.name} surfaced as TIMESTAMP_NTZ"
            )


def test_load_cache_invalidates_on_rewrite(spark, tmp_path):
    """load() memoizes per (app, path, mtime); rewriting the file must
    produce the new contents, not the cached plan."""
    import os
    import time

    from dock_financial_data_pipelines_spark.catalog import load

    p = str(tmp_path / "t.parquet")
    spark.range(3).toDF("n").coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "stage1")
    )
    # single FILE (the cacheable shape): copy the part file to t.parquet
    part = next(
        f for f in os.listdir(tmp_path / "stage1") if f.endswith(".parquet")
    )
    os.replace(str(tmp_path / "stage1" / part), p)
    assert load(spark, str(tmp_path), "t").count() == 3
    assert load(spark, str(tmp_path), "t") is load(spark, str(tmp_path), "t")

    spark.range(5).toDF("n").coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "stage2")
    )
    part = next(
        f for f in os.listdir(tmp_path / "stage2") if f.endswith(".parquet")
    )
    time.sleep(0.02)  # ensure a distinct mtime
    os.replace(str(tmp_path / "stage2" / part), p)
    assert load(spark, str(tmp_path), "t").count() == 5
