"""Query/oracle registry.

Every operator from SURVEY.md §2-B registers here as a named query:
a callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible)
an equivalent ANSI-SQL string DuckDB runs over the same parquet files.
``__spark_entry__.queries()`` / ``oracle_sql()`` read these dicts.

Hash-parity conventions (the driver compares row-count + schema +
order-insensitive value-hash, with columns sorted by name):

- Alias every computed column identically in the DataFrame code and SQL.
- Timestamps in outputs → epoch-second ``bigint`` or formatted strings;
  dates → ``yyyy-MM-dd`` strings (avoids ns/us/ms dtype drift).
- Money/value aggregates → per-row ``CAST(... AS DECIMAL(27,s))`` before
  ``sum`` (``catalog.dec_sum``): decimal accumulation is exact and
  order-independent, where ``round(sum(double), 2)`` flips the last cent
  whenever reordered partial sums straddle a .xx5 boundary. ``s`` = the
  exact digit count of the product (price×rate → 4, ×2 rates → 6) or 6
  for continuous values. Ratios divide the decimal sums only AFTER
  casting to double (decimal division scale rules differ per engine).
- Exact rational outputs (cume_dist, percent_rank) → the tie-free
  ``floor(x*1e6 + 0.5)/1e6``, never ``round`` (HALF_UP vs half-even
  differ on exact ties). Same convention as per-row money rounding.
- Per-row float arithmetic is IEEE-deterministic; only cross-row
  accumulation order varies — that is the only thing needing decimals.
- Window/rank outputs → total orderings (unique tiebreak keys).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle=None`` → rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
