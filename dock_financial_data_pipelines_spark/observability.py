"""Observability surface (SURVEY.md §2-A R15).

The reference logs every pipeline stage with structured messages
(REPORT:34, :69, :106, :144, :177, :215); the engine restates that as
*query-execution metrics*: every query run under ``run_with_metrics``
records wall time, output rows, and physical-plan execution metrics
(shuffle bytes/records, spilled bytes) into an in-process
``MetricsStore`` that is itself queryable as a DataFrame.

Two mechanisms, both Spark-native and cluster-safe:

- ``pyspark.sql.Observation`` — named aggregates collected piggyback on
  the action (no extra job), the Structured-Streaming-compatible path.
- Executed-plan metrics — after the action, walk
  ``df.queryExecution().executedPlan()`` via the py4j handle and sum the
  ``SQLMetric`` values Spark already collected per operator (the same
  numbers the SQL UI tab shows). Read-only, no listener callback server,
  so it works on any driver-owned session.

At 100 TB nothing changes: SQLMetrics are aggregated executor-side by
the existing Spark machinery; reading them is a driver-side constant.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dock_financial_data_pipelines_spark.registry import query

# SQLMetric map keys we aggregate across the executed plan. These are
# Spark's own metric keys (ShuffleExchangeExec / HashAggregateExec /
# FileSourceScanExec), stable public API surface of the SQL UI.
_METRIC_KEYS = {
    "shuffleBytesWritten": "shuffle_bytes_written",
    "shuffleRecordsWritten": "shuffle_records_written",
    "spillSize": "spill_bytes",
    "numFiles": "files_read",
}


@dataclass
class QueryMetrics:
    query_name: str
    wall_ms: float
    n_rows: int
    shuffle_bytes_written: int = 0
    shuffle_records_written: int = 0
    spill_bytes: int = 0
    files_read: int = 0
    plan_metrics_ok: bool = False


@dataclass
class MetricsStore:
    """Append-only per-session run log (the engine's 'structured log')."""

    runs: list[QueryMetrics] = field(default_factory=list)

    def record(self, m: QueryMetrics) -> None:
        self.runs.append(m)

    def to_df(self, spark: SparkSession) -> DataFrame:
        rows = [
            (
                m.query_name,
                float(m.wall_ms),
                int(m.n_rows),
                int(m.shuffle_bytes_written),
                int(m.shuffle_records_written),
                int(m.spill_bytes),
                int(m.files_read),
                bool(m.plan_metrics_ok),
            )
            for m in self.runs
        ]
        return spark.createDataFrame(
            rows,
            "query_name string, wall_ms double, n_rows long, "
            "shuffle_bytes_written long, shuffle_records_written long, "
            "spill_bytes long, files_read long, plan_metrics_ok boolean",
        )


def _walk_plan_metrics(jplan, acc: dict, seen: set | None = None) -> None:
    """Sum SQLMetric values over a JVM SparkPlan tree (py4j, read-only).

    AQE wraps the plan in AdaptiveSparkPlanExec (whose ``children()`` is
    empty — the real tree hangs off ``executedPlan()``), and materialized
    stages appear as QueryStageExec nodes wrapping their stage via
    ``plan()``; descend through both. Node ids already visited are
    skipped so a subtree reachable twice — a ReusedExchangeExec pointing
    at an exchange also walked via its original parent, or a node
    exposing both an unwrap and children — is summed exactly once."""
    if seen is None:
        seen = set()
    try:
        node_id = jplan.id()
        if node_id in seen:
            return
        seen.add(node_id)
    except Exception:
        pass  # id() missing on some wrappers: walk it, unwraps still dedup
    it = jplan.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        key = kv._1()
        if key in _METRIC_KEYS:
            acc[_METRIC_KEYS[key]] += max(0, kv._2().value())
    for unwrap in ("executedPlan", "plan"):
        try:
            inner = getattr(jplan, unwrap)()
            _walk_plan_metrics(inner, acc, seen)
        except Exception:
            pass
    kids = jplan.children().iterator()
    while kids.hasNext():
        _walk_plan_metrics(kids.next(), acc, seen)


def run_with_metrics(
    name: str, df: DataFrame, store: MetricsStore, max_rows: int = 100_000
) -> int:
    """Execute ``df`` and record wall time, rows, and executed-plan
    metrics into ``store``. Returns the row count.

    The action is ``collect()`` on *this* DataFrame: ``count()`` or a
    noop write would run a different QueryExecution, leaving the metrics
    of ``df.queryExecution()`` untouched (all zeros). Because of that,
    the recorder is for *bounded* results (aggregates, reports, samples).
    Before collecting, a ``limit(max_rows + 1).count()`` probe (a
    CollectLimit plan — it stops producing past the cap, so the probe
    itself is bounded) rejects oversized results, so an unbounded result
    is never materialized on the driver — pre-aggregate or ``limit`` the
    measured query instead (raise the cap explicitly if a larger bounded
    result is intended). The probe runs the plan an extra time; for a
    recorder that's the right trade — metrics runs are measurements, not
    the production path."""
    probe = df.limit(max_rows + 1).count()
    if probe > max_rows:
        raise ValueError(
            f"run_with_metrics({name!r}): result exceeds max_rows="
            f"{max_rows} (probe saw {probe} rows before collecting). The "
            "recorder collects the measured plan to the driver; aggregate "
            "or limit the query, or pass an explicit larger max_rows."
        )
    t0 = time.monotonic()
    rows = df.collect()
    n_rows = len(rows)
    del rows
    wall_ms = (time.monotonic() - t0) * 1000.0
    acc = {v: 0 for v in _METRIC_KEYS.values()}
    ok = False
    try:
        _walk_plan_metrics(df._jdf.queryExecution().executedPlan(), acc)
        ok = True
    except Exception:  # pragma: no cover - Connect sessions have no _jdf
        pass
    store.record(QueryMetrics(name, wall_ms, n_rows, plan_metrics_ok=ok, **acc))
    return n_rows


# ---------------------------------------------------------------------------
# o_metrics_report — run a representative query mix under the metrics
# recorder and return the run log. Wall times and shuffle bytes are
# non-deterministic, so the query projects only the stable columns —
# which ARE SQL-derivable (each n_rows is the cardinality of the
# measured aggregate), so the run log is held to a real oracle.
# ---------------------------------------------------------------------------
@query(
    "o_metrics_report",
    oracle="""
    SELECT 'scan_filter' AS query_name, CAST(1 AS BIGINT) AS n_rows,
           TRUE AS plan_metrics_ok
    UNION ALL
    SELECT 'group_agg', (SELECT count(DISTINCT o_orderstatus) FROM orders), TRUE
    UNION ALL
    SELECT 'join_dim',
           (SELECT count(DISTINCT c.c_mktsegment)
            FROM customer c WHERE EXISTS (
                SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)),
           TRUE
    """,
)
def o_metrics_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dock_financial_data_pipelines_spark.catalog import load

    store = MetricsStore()

    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")

    # Keep every collected result bounded (aggregates / tiny projections):
    # the recorder's action is collect() on the measured plan itself.
    run_with_metrics(
        "scan_filter",
        orders.where(F.col("o_totalprice") > 1000).agg(
            F.count(F.lit(1)).alias("n")
        ),
        store,
    )
    run_with_metrics(
        "group_agg",
        orders.groupBy("o_orderstatus").agg(F.sum("o_totalprice").alias("t")),
        store,
    )
    run_with_metrics(
        "join_dim",
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n")),
        store,
    )
    return store.to_df(spark).select(
        "query_name", "n_rows", "plan_metrics_ok"
    )
