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


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=9131, max_value=11688))  # day numbers 1995..2001
def test_fx_asof_carry_closed_form(day_num):
    """j12's as-of carry over 3-day-cadence fixes has a closed form:
    the rate applied on day d is the fix published on
    d - ((d - base) % 3). The union+window carry and DuckDB's ASOF JOIN
    must both equal it — validated here in plain arithmetic."""
    base = 9131  # 1995-01-01
    fix_day = day_num - ((day_num - base) % 3)
    for cur in range(5):
        expected = 4.5 + cur + ((fix_day * 7919 + cur * 131) % 1000) / 1000.0
        got = duckdb.execute(
            """
            WITH rates AS (
                SELECT CAST(d AS DATE) AS rate_date,
                       4.5 + ? + ((date_diff('day', DATE '1970-01-01',
                                             CAST(d AS DATE)) * 7919
                                   + ? * 131) % 1000) / 1000.0 AS rate
                FROM (SELECT unnest(generate_series(DATE '1995-01-01',
                                                    DATE '2001-12-31',
                                                    INTERVAL 3 DAY)) AS d)
            )
            SELECT rate FROM rates
            WHERE rate_date <= DATE '1970-01-01' + INTERVAL (?) DAY
            ORDER BY rate_date DESC LIMIT 1
            """,
            [cur, cur, day_num],
        ).fetchone()[0]
        assert got == expected, (day_num, cur, got, expected)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta"]),
        min_size=2,
        max_size=60,
    )
)
def test_repetition_stats_invariants(words):
    """l_repetition_stats ratio identities on arbitrary token streams:
    distinct_ratio and top fractions live in (0, 1], a constant stream
    maximizes both, and top_word_frac >= 1/n_distinct always."""
    from collections import Counter

    n = len(words)
    wc = Counter(words)
    bigrams = Counter(zip(words, words[1:]))
    distinct_ratio = len(wc) / n
    top_word_frac = max(wc.values()) / n
    top_bigram_frac = max(bigrams.values()) / (n - 1)
    assert 0 < distinct_ratio <= 1
    assert 0 < top_word_frac <= 1
    assert 0 < top_bigram_frac <= 1
    assert top_word_frac >= 1 / len(wc) - 1e-12
    if len(wc) == 1:
        assert top_word_frac == 1.0 and top_bigram_frac == 1.0


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=5,
        max_size=200,
    )
)
def test_winsorized_mean_bounds(xs):
    """a21's winsorized mean is always within [p05, p95] (linear-
    interpolated, DuckDB quantile_cont ≡ Spark percentile), and
    clamping never increases |mean - median|-style spread beyond the
    raw extremes."""
    lo, hi = duckdb.execute(
        "SELECT quantile_cont(x, 0.05), quantile_cont(x, 0.95) "
        "FROM (SELECT unnest(?) AS x)",
        [xs],
    ).fetchone()
    clamped = [min(max(x, lo), hi) for x in xs]
    wmean = sum(clamped) / len(clamped)
    assert lo - 1e-9 <= wmean <= hi + 1e-9
    # 1-ulp slack: sum([1.1]*6)/6 == 1.0999999999999999 < min(xs) in
    # IEEE double — the bound holds only up to accumulation rounding.
    span = max(abs(min(xs)), abs(max(xs)), 1.0)
    assert min(xs) - 1e-12 * span <= wmean <= max(xs) + 1e-12 * span


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=200), min_size=1, max_size=80),
    st.integers(min_value=8, max_value=64),
)
def test_pack_sequences_occupancy_identities(tok_counts, capacity):
    """l_pack_sequences invariants, mirrored in pure python on one
    shard: per-sequence occupancies sum to the corpus token count,
    every non-final sequence is exactly full, and a doc spans
    ceil-consistent sequence ranges."""
    cum = 0
    occ: dict = {}
    docs_per_seq: dict = {}
    for n in tok_counts:
        prev, cum = cum, cum + n
        first, last = prev // capacity, (cum - 1) // capacity
        for s in range(first, last + 1):
            lo, hi = max(prev, s * capacity), min(cum, (s + 1) * capacity)
            occ[s] = occ.get(s, 0) + (hi - lo)
            docs_per_seq[s] = docs_per_seq.get(s, 0) + 1
    assert sum(occ.values()) == sum(tok_counts)
    last_seq = max(occ)
    for s, filled in occ.items():
        if s != last_seq:
            assert filled == capacity, "non-final sequences must be full"
        assert 0 < filled <= capacity
        assert docs_per_seq[s] >= 1


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=100000),  # doc_id
            st.integers(min_value=1, max_value=300),  # n_tok
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=100, max_value=5000),  # budget
)
def test_token_budget_mixture_bounds(docs, budget):
    """l_token_budget_mixture invariants for one language: the rate is
    in (0, 1], saturates when the language fits the budget, and the
    deterministic keep rule is reproducible."""
    total = sum(n for _, n in docs)
    rate = min(1.0, budget / total)
    assert 0 < rate <= 1
    if total <= budget:
        assert rate == 1.0
    kept1 = {d for d, _ in docs if ((d * 2654435761) % 10000) / 10000.0 < rate}
    kept2 = {d for d, _ in docs if ((d * 2654435761) % 10000) / 10000.0 < rate}
    assert kept1 == kept2, "hash sampling must be reproducible"
    if rate == 1.0:
        assert len(kept1) == len({d for d, _ in docs}), "rate 1 keeps all"


@settings(max_examples=100, deadline=None)
@given(st.lists(st.floats(min_value=1.0, max_value=9.5e5), min_size=9, max_size=200))
def test_benford_fractions_sum_to_one(prices):
    """q_benford_first_digit identities: observed fractions sum to 1,
    and the Benford expectation itself sums to 1 over digits 1-9."""
    import math
    from collections import Counter

    digits = Counter(str(int(math.floor(p)))[0] for p in prices)
    total = sum(digits.values())
    assert abs(sum(n / total for n in digits.values()) - 1.0) < 1e-9
    benford = sum(math.log10(1 + 1 / d) for d in range(1, 10))
    assert abs(benford - 1.0) < 1e-12


def test_pagerank_fixed_point_invariants(spark, sf_dir):
    """Fixed-point PageRank invariants that hold for ANY graph:
    every rank ≥ the damping floor 0.15e12, and total rank mass can
    only shrink relative to N·1e12 (integer floor-division truncates,
    never creates mass)."""
    import dock_financial_data_pipelines_spark as engine

    engine.load_all()
    rows = engine.QUERIES["g_pagerank_copurchase"](spark, sf_dir).collect()
    assert rows, "top-20 must be non-empty on the fixture"
    n_nodes = (
        engine.QUERIES["g_triangle_count"](spark, sf_dir)
        .collect()[0]["n_nodes"]
    )
    for r in rows:
        assert r["rank_fp"] >= 150_000_000_000
        assert r["rank_fp"] <= n_nodes * 1_000_000_000_000
        assert r["degree"] >= 1
    # top-20 is rank-sorted with part_key tiebreak
    ranks = [(-r["rank_fp"], r["part_key"]) for r in rows]
    assert ranks == sorted(ranks)


def test_nearest_event_join_matches_bruteforce(spark, tmp_path):
    """The (user, bucket±1) candidate trick must find EXACTLY the
    nearest click found by a brute-force scan, on adversarial data:
    gaps right at the ±6h window edge, ties, multi-user interleaving."""
    import datetime as dt
    import itertools

    import dock_financial_data_pipelines_spark as engine

    engine.load_all()
    base = dt.datetime(2024, 1, 1)
    W = 6 * 3600
    rows = []
    eid = itertools.count()
    # user 1: clicks straddling bucket edges and exact-window boundaries
    offsets = [0, 1, W - 1, W, W + 1, 2 * W, 3 * W + 7, -W, -W - 1, -5]
    for off in offsets:
        rows.append((next(eid), base + dt.timedelta(seconds=off), 1, "click", 1.0, "{}"))
    rows.append((next(eid), base, 1, "purchase", 9.9, "{}"))
    rows.append((next(eid), base + dt.timedelta(seconds=2 * W), 1, "purchase", 9.9, "{}"))
    # user 2: equidistant tie — smaller event_id must win
    t2 = base + dt.timedelta(days=3)
    a = next(eid); b = next(eid)
    rows.append((a, t2 - dt.timedelta(seconds=100), 2, "click", 1.0, "{}"))
    rows.append((b, t2 + dt.timedelta(seconds=100), 2, "click", 1.0, "{}"))
    rows.append((next(eid), t2, 2, "purchase", 9.9, "{}"))
    # user 3: no click inside the window at all
    rows.append((next(eid), base + dt.timedelta(days=9), 3, "purchase", 9.9, "{}"))
    rows.append((next(eid), base + dt.timedelta(days=9, seconds=W + 1), 3, "click", 1.0, "{}"))

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   str(tmp_path / "events.parquet"))

    got = {
        (r["purchase_id"], r["click_id"], r["gap_us"])
        for r in engine.QUERIES["j13_nearest_event_join"](
            spark, str(tmp_path)
        ).collect()
    }

    want = set()
    purchases = [r for r in rows if r[3] == "purchase"]
    clicks = [r for r in rows if r[3] == "click"]
    for p in purchases:
        best = None
        for c in clicks:
            if c[2] != p[2]:
                continue
            gap = abs(int((c[1] - p[1]).total_seconds() * 1_000_000))
            if gap <= W * 1_000_000:
                k = (gap, c[0])
                if best is None or k < best:
                    best = k
        if best:
            want.add((p[0], best[1], best[0]))
    assert got == want


def test_pagerank_matches_integer_reference(spark, sf_dir):
    """The distributed fixed-point PageRank must equal a pure-Python
    integer reference on the same edge list, bit for bit — integer
    arithmetic leaves no accumulation-order slack."""
    import dock_financial_data_pipelines_spark as engine
    from dock_financial_data_pipelines_spark.operators.graph import (
        _SCALE,
        _TOP,
        _directed_edges,
    )

    engine.load_all()
    edges = [
        (r["src"], r["dst"])
        for r in _directed_edges(spark, sf_dir).collect()
    ]
    deg: dict = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    ranks = {n: _SCALE for n in deg}
    for _ in range(2):
        inflow: dict = {}
        for s, d in edges:
            inflow[d] = inflow.get(d, 0) + ranks[s] // deg[s]
        ranks = {
            n: 150_000_000_000 + (85 * s) // 100 for n, s in inflow.items()
        }
    want = sorted(
        ((n, deg[n], r) for n, r in ranks.items()),
        key=lambda x: (-x[2], x[0]),
    )[:_TOP]
    got = [
        (r["part_key"], r["degree"], r["rank_fp"])
        for r in engine.QUERIES["g_pagerank_copurchase"](spark, sf_dir).collect()
    ]
    assert got == want


@given(
    st.lists(st.integers(min_value=1, max_value=12), min_size=1, max_size=40)
)
def test_survivorship_group_accounting_equals_pair_accounting(group_sizes):
    """l_dedup_survivorship_report uses two accountings that must agree:
    hash-group methods compute (Σ C(n,2), Σ n over n>1 groups, Σ (n−1))
    in closed form, pair methods count (|pairs|, |docs in pairs|,
    |greedy keep-min removals|) from the explicit pair set. For any
    grouping these are the same numbers — build the explicit pair set
    per group and check."""
    import itertools

    n_pairs_closed = sum(n * (n - 1) // 2 for n in group_sizes if n > 1)
    flagged_closed = sum(n for n in group_sizes if n > 1)
    removed_closed = sum(n - 1 for n in group_sizes if n > 1)

    pairs = []
    doc = 0
    for n in group_sizes:
        ids = list(range(doc, doc + n))
        doc += n
        pairs.extend(itertools.combinations(ids, 2))
    flagged = {d for p in pairs for d in p}
    removed = {b for _, b in pairs}  # greedy keep-min: larger id drops
    assert len(pairs) == n_pairs_closed
    assert len(flagged) == flagged_closed
    assert len(removed) == removed_closed
