"""Generate an EMPTY fixture set: every table schema-identical to the
driver's testdata with zero rows.

Purpose: the fourth hostile axis. Content (adversarial fixture),
parallelism (local[5]/7 partitions), cardinality starvation (minimal
fixture) — and this one: total absence. Empty partitions/days are
routine at production scale (a new tenant, a quiet source, a
date-pruned read that matches nothing); every query must return its
empty-input answer and agree with DuckDB instead of crashing on
schema inference, dividing by an empty count, or emitting a NULL row
the oracle doesn't.

The round-8 sweep over this fixture found 26 real issues (7 sink
round-trips reading back 0-row writes, 4 driver-side/ANSI crashes on
empty aggregates, 15 empty-relation semantic divergences) — see the
"empty-input semantics" notes in the fixed operators.

Writes /tmp/dock_emptyfix/{table}.parquet. Usage:

    python scripts/make_empty_fixture.py
    TEST_SF_DIR=/tmp/dock_emptyfix python scripts/check_all.py
"""

from __future__ import annotations

import os

import duckdb

SRC = os.environ.get("EMPTY_FIX_SRC", "/root/testdata/sf0.001")
OUT = os.environ.get("EMPTY_FIX_DIR", "/tmp/dock_emptyfix")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet') "
            f"LIMIT 0) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t:12s} empty written")


if __name__ == "__main__":
    main()
