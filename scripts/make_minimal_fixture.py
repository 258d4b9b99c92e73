"""Generate a MINIMAL fixture set: the same schemas as the driver's
testdata, sliced down to cardinality-starved micro-tables — fewer rows
than the engine's window frames, fewer vectors than k-means K, fewer
documents than top-k, a single event user, two calendar days.

Purpose: the third hostile axis. The adversarial fixture
(make_adversarial_fixture.py) attacks CONTENT (boundary values, ties,
duplicates); the local[5]/7-partition run attacks PARALLELISM; this
one attacks CARDINALITY — every query must still agree with its DuckDB
oracle (usually on a 0-row or 1-row result) instead of throwing
(IndexError on a collected scalar, division by an empty count,
k-means with n < K, window frames that never fill).

Built by referentially-coherent slicing of the sf0.001 parquet with
DuckDB, so schemas and physical types match the driver's data exactly:
2 customers -> their first 3 orders -> those orders' lineitems -> the
parts/suppliers those lineitems reference; 5 events from one user; 2
documents; 2 embeddings. region/nation kept whole (they are tiny and
several oracles enumerate them).

Writes /tmp/dock_minfix/{table}.parquet. Usage:

    python scripts/make_minimal_fixture.py
    TEST_SF_DIR=/tmp/dock_minfix python scripts/check_all.py
"""

from __future__ import annotations

import os

import duckdb

SRC = os.environ.get("MIN_FIX_SRC", "/root/testdata/sf0.001")
OUT = os.environ.get("MIN_FIX_DIR", "/tmp/dock_minfix")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW src_{t} AS "
            f"SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        )

    # Deterministic slices, FK-coherent from the customer outward.
    con.execute(
        """
        CREATE TABLE t_customer AS
        SELECT * FROM src_customer ORDER BY c_custkey LIMIT 2
        """
    )
    con.execute(
        """
        CREATE TABLE t_orders AS
        SELECT o.* FROM (
            SELECT o.*, row_number() OVER (
                PARTITION BY o.o_custkey ORDER BY o.o_orderkey) AS rn
            FROM src_orders o
            JOIN t_customer c ON o.o_custkey = c.c_custkey
        ) o WHERE rn <= 3
        """
    )
    # DuckDB's SELECT o.* above keeps rn; drop it explicitly.
    con.execute("ALTER TABLE t_orders DROP COLUMN rn")
    con.execute(
        """
        CREATE TABLE t_lineitem AS
        SELECT l.* FROM src_lineitem l
        JOIN t_orders o ON l.l_orderkey = o.o_orderkey
        """
    )
    con.execute(
        """
        CREATE TABLE t_part AS
        SELECT DISTINCT p.* FROM src_part p
        JOIN t_lineitem l ON p.p_partkey = l.l_partkey
        """
    )
    con.execute(
        """
        CREATE TABLE t_supplier AS
        SELECT DISTINCT s.* FROM src_supplier s
        JOIN t_lineitem l ON s.s_suppkey = l.l_suppkey
        """
    )
    # One user's first 5 events: starves sessionization, watermarks,
    # every >5-bar indicator window, and daily compactions (2-3 days).
    con.execute(
        """
        CREATE TABLE t_events AS
        SELECT e.* FROM src_events e
        WHERE e.user_id = (SELECT min(user_id) FROM src_events)
        ORDER BY e.ts, e.event_id LIMIT 5
        """
    )
    # Two documents: below every shingle width > min doc length, below
    # top-k, below LSH band counts.
    con.execute(
        """
        CREATE TABLE t_documents AS
        SELECT * FROM src_documents ORDER BY doc_id LIMIT 2
        """
    )
    # Two embeddings: n < K for every k-means (IVF K=8, PQ K=4,
    # SemDeDup cells), n < top-k.
    con.execute(
        """
        CREATE TABLE t_embeddings AS
        SELECT * FROM src_embeddings ORDER BY vec_id LIMIT 2
        """
    )
    con.execute("CREATE TABLE t_region AS SELECT * FROM src_region")
    con.execute("CREATE TABLE t_nation AS SELECT * FROM src_nation")

    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"COPY t_{t} TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM t_{t}").fetchone()[0]
        print(f"{t:12s} {n} rows")


if __name__ == "__main__":
    main()
