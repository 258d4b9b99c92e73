"""Mirror a driver-shipped scale-factor dir into a bench fixture whose
large tables are split into multiple parquet part-files.

Why: the shipped sf0.1 parquet is ONE file with ONE row group per table
(lineitem: 600k rows / 10.8 MB), and Spark assigns parquet splits by
file byte ranges against spark.sql.files.maxPartitionBytes (128 MB) —
so every scan stage ran on a single task regardless of core count.
That capped scan parallelism at 1, depressed absolute bench numbers,
made scan-bound queries look FASTER at sf1 (Spark-written, multi-file)
than sf0.1, and let per-round container drift dominate the medians
(see bench.py's r8 root-cause note). Splitting each large table into
_N_FILES part-files gives every scan stage real parallelism while the
ROWS stay byte-identical, so plans and results are unchanged.

Row identity: each part-file is a contiguous row slice of the source
table in source order (pyarrow Table.slice), written with parquet
version 2.6 so the events table's TIMESTAMP(NANOS) column round-trips
exactly. Small tables (< _SPLIT_MIN rows) stay single-file.

Usage:
    python scripts/make_bench_fixture.py [src_dir] [dst_dir]
Defaults: /root/testdata/sf0.1 -> /tmp/dock_bench_sf0.1_8f

bench.py calls ensure_bench_fixture() automatically when pointed at a
driver-shipped /root/testdata dir; the mirror is rebuilt only when
missing or stale (row-count mismatch).
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

import pyarrow.parquet as pq

_N_FILES = 8
_SPLIT_MIN = 64_000  # tables smaller than this stay single-file

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _mirror_table(src: str, dst: str) -> int:
    """Copy one table; split into _N_FILES contiguous slices if large.
    Returns the row count."""
    t = pq.read_table(src)
    n = t.num_rows
    if n < _SPLIT_MIN:
        shutil.copyfile(src, dst)
        return n
    os.makedirs(dst, exist_ok=True)
    per = -(-n // _N_FILES)
    for i in range(_N_FILES):
        lo = i * per
        if lo >= n:
            break
        pq.write_table(
            t.slice(lo, min(per, n - lo)),
            os.path.join(dst, f"part-{i:05d}.parquet"),
            version="2.6",  # keeps TIMESTAMP(NANOS) exact (events)
        )
    return n


def _rows_of(path: str) -> int:
    if os.path.isdir(path):
        return sum(
            pq.read_metadata(f).num_rows
            for f in sorted(glob.glob(os.path.join(path, "*.parquet")))
        )
    return pq.read_metadata(path).num_rows


def ensure_bench_fixture(src_dir: str, dst_dir: str) -> str:
    """Idempotent: (re)build dst only when absent or row counts drift."""
    marker = os.path.join(dst_dir, "_BUILT_FROM")
    if os.path.exists(marker):
        try:
            with open(marker) as fh:
                if fh.read().strip() == src_dir and all(
                    _rows_of(os.path.join(dst_dir, f"{t}.parquet"))
                    == pq.read_metadata(
                        os.path.join(src_dir, f"{t}.parquet")
                    ).num_rows
                    for t in TABLES
                ):
                    return dst_dir
        except Exception:
            pass  # stale/corrupt mirror: rebuild below
    shutil.rmtree(dst_dir, ignore_errors=True)
    os.makedirs(dst_dir, exist_ok=True)
    for t in TABLES:
        _mirror_table(
            os.path.join(src_dir, f"{t}.parquet"),
            os.path.join(dst_dir, f"{t}.parquet"),
        )
    with open(marker, "w") as fh:
        fh.write(src_dir)
    return dst_dir


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = (
        sys.argv[2]
        if len(sys.argv) > 2
        else f"/tmp/dock_bench_{os.path.basename(src.rstrip('/'))}_8f"
    )
    out = ensure_bench_fixture(src, dst)
    for t in TABLES:
        p = os.path.join(out, f"{t}.parquet")
        kind = f"{len(glob.glob(os.path.join(p, '*.parquet')))} files" if os.path.isdir(p) else "1 file"
        print(f"{t:12s} {_rows_of(p):>9d} rows  {kind}")
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
