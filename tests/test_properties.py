"""Property-based checks (hypothesis) for the cross-engine conventions
the oracle parity relies on. These run WITHOUT Spark — they validate the
arithmetic identities in plain Python/DuckDB, which is what makes the
hash comparisons trustworthy rather than coincidental."""

from __future__ import annotations

import math

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st


def money_py(x: float) -> float:
    """The engine's money rounding: floor(x*100 + 0.5)/100 — pure IEEE
    arithmetic, identical in Spark, DuckDB, and Python (registry.py)."""
    return math.floor(x * 100 + 0.5) / 100


@settings(max_examples=300, deadline=None)
@given(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False))
def test_money_rounding_matches_duckdb(x):
    got = duckdb.execute(
        "SELECT floor(CAST(? AS DOUBLE) * 100 + 0.5) / 100", [x]
    ).fetchone()[0]
    assert got == money_py(x)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=2**62))
def test_md5_bucket_matches_duckdb(k):
    """u6/u7/train-test split keying: Spark's
    conv(substring(md5(k),1,8),16,10) must equal DuckDB's
    ('0x'||substr(md5(k),1,8))::bigint for any key."""
    import hashlib

    py = int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16)
    duck = duckdb.sql(
        f"SELECT ('0x' || substr(md5(CAST({k} AS VARCHAR)), 1, 8))::BIGINT"
    ).fetchone()[0]
    assert duck == py


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
        min_size=4,
        max_size=64,
    )
)
def test_int8_quantization_error_bound(vec):
    """l9's guarantee: per-component int8 quantization error ≤ 0.5/127,
    the basis of the ≤2% cosine error assertion."""
    for x in vec:
        q = math.floor(x * 127 + 0.5)
        assert abs(q / 127 - x) <= 0.5 / 127 + 1e-12
