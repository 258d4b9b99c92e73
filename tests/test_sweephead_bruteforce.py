"""Brute-force references for the round-7 sweep-head backlog entries
(the queries at the front of the round-8 driver sample): RSI, Donchian,
decile lift, the two-proportion z-test, vocabulary-drift PSI, the
source shingle-overlap matrix, the shingle document-frequency spectrum,
hash-derived Laplace DP noise, and the span-mask ratio. Plain-Python
recomputation from raw parquet, independent of the SQL twin oracles."""

from __future__ import annotations

import hashlib
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
    """The empty-input contracts are oracle-checked (check_all on the
    empty fixture + tests/test_degenerate_fixtures.py); a brute-force
    reference adds nothing there, so skip rather than re-derive every
    empty shape."""
    import pyarrow.parquet as pq
    import pytest

    if pq.read_metadata(f"{SF}/{table}.parquet").num_rows == 0:
        pytest.skip(f"{table} empty: contract covered by the empty-fixture sweep")



def _daily_cents() -> pd.Series:
    o = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    cents = (o["o_totalprice"] * 100 + 0.5).apply(math.floor).astype("int64")
    return (
        pd.DataFrame({"day": o["o_orderdate"].dt.normalize(), "c": cents})
        .groupby("day")["c"]
        .sum()
        .sort_index()
    )


def test_rsi_matches_sequential_scan(spark):
    got = _run(spark, "w23_rsi")
    daily = _daily_cents()
    vals = daily.tolist()
    days = daily.index.tolist()
    deltas = [None] + [b - a for a, b in zip(vals, vals[1:])]
    rows = []
    for i in range(14, len(days)):
        window = [d for d in deltas[i - 13 : i + 1] if d is not None]
        sg = sum(max(d, 0) for d in window)
        sl = sum(max(-d, 0) for d in window)
        rsi = None if sg + sl == 0 else 100.0 * sg / (sg + sl)
        rows.append((days[i], vals[i], rsi))
    assert len(got) == len(rows)
    for g, (day, cents, rsi) in zip(got.itertuples(), rows):
        assert pd.Timestamp(g.day) == day
        assert abs(g.revenue - cents / 100.0) < 1e-6
        if rsi is None:
            assert pd.isna(g.rsi_14)
        else:
            assert abs(g.rsi_14 - rsi) < 1e-3, day


def test_donchian_matches_rolling_scan(spark):
    got = _run(spark, "w24_donchian_channels")
    daily = _daily_cents()
    vals = daily.tolist()
    days = daily.index.tolist()
    rows = []
    for i in range(19, len(days)):
        hi = max(vals[i - 19 : i + 1])
        lo = min(vals[i - 19 : i + 1])
        rows.append((days[i], vals[i], hi, lo))
    assert len(got) == len(rows)
    for g, (day, c, hi, lo) in zip(got.itertuples(), rows):
        assert pd.Timestamp(g.day) == day
        assert abs(g.revenue - c / 100.0) < 1e-6
        assert abs(g.upper_band - hi / 100.0) < 1e-6
        assert abs(g.lower_band - lo / 100.0) < 1e-6
        assert abs(g.channel_width - (hi - lo) / 100.0) < 1e-6
        assert bool(g.breakout_high) == (c == hi), day


def test_decile_lift_matches_explicit_ntile(spark):
    """ntile(10) replayed explicitly: the first (n mod 10) deciles get
    the extra customer; shares/lift from exact cent sums."""
    got = _run(spark, "a54_decile_lift_table").set_index("decile")
    o = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    o["cents"] = (o["o_totalprice"] * 100 + 0.5).apply(math.floor)
    spend = o.groupby("o_custkey")["cents"].sum().reset_index()
    spend = spend.sort_values(
        ["cents", "o_custkey"], ascending=[False, True]
    ).reset_index(drop=True)
    n = len(spend)
    base, extra = divmod(n, 10)
    sizes = [base + (1 if d < extra else 0) for d in range(10)]
    total = spend["cents"].sum()
    pos = 0
    cum = 0
    for d, sz in enumerate(sizes, start=1):
        if sz == 0:
            # fewer customers than deciles: ntile emits no row for the
            # empty tiles
            assert d not in got.index, d
            continue
        chunk = spend.iloc[pos : pos + sz]
        pos += sz
        c = chunk["cents"].sum()
        cum += c
        row = got.loc[d]
        assert row["n_customers"] == sz, d
        assert abs(row["revenue"] - c / 100.0) < 1e-6, d
        assert abs(row["share"] - c / total) < 2e-6, d
        assert abs(row["cum_share"] - cum / total) < 2e-6, d
        assert abs(row["lift"] - c * 10 / total) < 2e-4, d


def test_two_proportion_ztest_matches_direct_formula(spark):
    _skip_if_empty("events")
    got = _run(spark, "a55_two_proportion_ztest").iloc[0]
    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["user_id", "event_type"]
    )
    conv = (
        ev.assign(c=(ev["event_type"] == "purchase").astype(int))
        .groupby("user_id")["c"]
        .max()
    )
    grp = conv.groupby(conv.index % 2)
    sides = {g: (len(v), int(v.sum())) for g, v in grp}
    if 0 not in sides or 1 not in sides:
        # a whole arm missing: its pivot cells (and z) are NULL.
        # group 0 fills the *_a columns, group 1 the *_b columns.
        present = 0 if 0 in sides else 1
        have, miss = ("a", "b") if present == 0 else ("b", "a")
        n, x = sides[present]
        assert got[f"n_{have}"] == n and got[f"conv_{have}"] == x
        assert pd.isna(got[f"n_{miss}"]) and pd.isna(got["z"])
        return
    n0, x0 = sides[0]
    n1, x1 = sides[1]
    p0, p1 = x0 / n0, x1 / n1
    pp = (x0 + x1) / (n0 + n1)
    assert got["n_a"] == n0 and got["conv_a"] == x0
    assert got["n_b"] == n1 and got["conv_b"] == x1
    assert abs(got["rate_a"] - p0) < 2e-6
    assert abs(got["rate_b"] - p1) < 2e-6
    if pp * (1 - pp) == 0:
        # degenerate pooled proportion: z undefined on both engines
        assert pd.isna(got["z"]) and pd.isna(got["significant_95"])
    else:
        z = (p0 - p1) / math.sqrt(pp * (1 - pp) * (1 / n0 + 1 / n1))
        assert abs(got["z"] - z) < 2e-6
        assert got["significant_95"] == int(abs(z) > 1.96)


def test_vocab_drift_psi_matches_dict_model(spark):
    got = _run(spark, "l_vocab_drift_psi").set_index("bin")
    docs = pd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    ref: Counter = Counter()
    cur: Counter = Counter()
    for _, d in docs.iterrows():
        (ref if d["doc_id"] % 2 == 0 else cur).update(d["text"].split(" "))
    all_toks = set(ref) | set(cur)
    topk = sorted(all_toks, key=lambda t: (-ref[t], t))[:20]
    top_set = set(topk)
    bins = defaultdict(lambda: [0, 0])
    for t in all_toks:
        b = t if t in top_set else "<OTHER>"
        bins[b][0] += ref[t]
        bins[b][1] += cur[t]
    t_ref = sum(v[0] for v in bins.values())
    t_cur = sum(v[1] for v in bins.values())
    psi_total = 0.0
    terms = {}
    for b, (nr, nc) in bins.items():
        sr = (nr + 1.0) / (t_ref + 21)
        sc = (nc + 1.0) / (t_cur + 21)
        term = (sr - sc) * math.log(sr / sc)
        terms[b] = (nr, nc, sr, sc, term)
        psi_total += term
    assert set(got.index) == set(bins)
    for b, (nr, nc, sr, sc, term) in terms.items():
        row = got.loc[b]
        assert row["n_ref"] == nr and row["n_cur"] == nc, b
        assert abs(row["share_ref"] - sr) < 2e-6, b
        assert abs(row["share_cur"] - sc) < 2e-6, b
        assert abs(row["psi_term"] - term) < 1e-8, b
        assert abs(row["psi_total"] - psi_total) < 1e-7, b


def _shingle_sets(key: str) -> dict:
    docs = pd.read_parquet(
        f"{SF}/documents.parquet", columns=[key, "text"]
    )
    out = defaultdict(set)
    for _, d in docs.iterrows():
        ws = d["text"].split(" ")
        n_sh = max(len(ws) - 3, 0) + 1
        out[d[key]].update(
            " ".join(ws[i : i + 3]) for i in range(n_sh)
        )
    return out


def test_source_overlap_matrix_matches_set_arithmetic(spark):
    got = _run(spark, "l_source_overlap_matrix").set_index(
        ["source_a", "source_b"]
    )
    sets = _shingle_sets("source")
    srcs = sorted(sets)
    want = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            shared = len(sets[a] & sets[b])
            if shared:
                want[(a, b)] = (shared, len(sets[a]), len(sets[b]))
    assert set(got.index) == set(want)
    for key, (shared, va, vb) in want.items():
        row = got.loc[key]
        assert row["n_shared"] == shared, key
        assert row["vocab_a"] == va and row["vocab_b"] == vb, key
        assert abs(row["containment"] - shared / min(va, vb)) < 2e-6, key


def test_shingle_df_spectrum_matches_dict_counting(spark):
    got = _run(spark, "l_shingle_df_spectrum").set_index("band")
    sets = _shingle_sets("doc_id")
    df: Counter = Counter()
    for hs in sets.values():
        df.update(hs)
    bands = defaultdict(lambda: [0, 0])
    for _, d in df.items():
        band = (
            "a_unique"
            if d == 1
            else "b_2_4"
            if d <= 4
            else "c_5_16"
            if d <= 16
            else "d_17_64"
            if d <= 64
            else "e_over_64"
        )
        bands[band][0] += 1
        bands[band][1] += d
    tot = sum(v[1] for v in bands.values())
    assert set(got.index) == set(bands)
    for band, (ns, occ) in bands.items():
        row = got.loc[band]
        assert row["n_shingles"] == ns and row["n_occurrences"] == occ
        assert abs(row["occurrence_share"] - occ / tot) < 2e-6, band


def test_dp_noised_counts_match_inverse_cdf(spark):
    """Hash-derived Laplace noise replayed with hashlib + the inverse
    CDF; released = true + noise exactly."""
    got = _run(spark, "l_dp_noised_counts").set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["source"])
    counts = docs["source"].value_counts()
    assert set(got.index) == set(counts.index)
    for src, n in counts.items():
        uv = int(hashlib.md5(src.encode()).hexdigest()[:15], 16) / float(
            1 << 60
        )
        if uv >= 0.5:
            noise = -math.log(1 - 2 * (uv - 0.5))
        else:
            noise = math.log(1 - 2 * (0.5 - uv))
        row = got.loc[src]
        assert row["true_count"] == n, src
        assert abs(row["noise"] - noise) < 1e-8, src
        assert abs(row["released_count"] - (n + noise)) < 1e-8, src


def test_span_mask_ratio_matches_hash_replay(spark):
    got = _run(spark, "l_span_mask_ratio").set_index("length_bucket")
    docs = pd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    buckets = defaultdict(lambda: [0, 0, 0])
    for _, d in docs.iterrows():
        n_tok = len(d["text"].split(" "))
        masked = sum(
            1
            for pos in range(n_tok)
            if int(
                hashlib.md5(f"{d['doc_id']}:{pos}".encode()).hexdigest()[
                    :15
                ],
                16,
            )
            % 100
            < 15
        )
        b = (
            "a_short"
            if n_tok < 64
            else "b_medium" if n_tok < 128 else "c_long"
        )
        st = buckets[b]
        st[0] += 1
        st[1] += n_tok
        st[2] += masked
    assert set(got.index) == set(buckets)
    for b, (n, tk, mk) in buckets.items():
        row = got.loc[b]
        assert row["n_docs"] == n and row["n_tokens"] == tk
        assert row["n_masked"] == mk, b
        assert abs(row["mask_ratio"] - mk / tk) < 2e-6, b
