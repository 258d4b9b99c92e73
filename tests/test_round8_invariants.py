"""Semantic invariants for the final round-8 operator batch, checked
against independent pandas brute-force references at sf0.001. These are
NOT oracle twins: each test asserts a property the algorithm must hold
(no Bloom false negatives, interval islands partition the order set,
grid-pruned nearest equals the global nearest when it is in range,
leave-one-out encodings are convex blends) rather than replaying the
DuckDB SQL, so a bug that slipped into both engine and oracle the same
way would still be caught here."""

from __future__ import annotations

import math
import os

import pandas as pd
import pytest

import dock_financial_data_pipelines_spark as engine
from dock_financial_data_pipelines_spark.operators.joins import _GRID_CELL
from dock_financial_data_pipelines_spark.operators.quality import _TE_M
from dock_financial_data_pipelines_spark.operators.text import _BM25_TERMS
from dock_financial_data_pipelines_spark.operators.training import _FHASH_D

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



def test_bloom_filter_has_no_false_negatives(spark):
    """The defining Bloom-filter guarantee: membership probes may
    over-approximate but never under-approximate. missed_rows is the
    count of true build-side members the bit probes rejected — any
    value other than zero means the hash families diverged between the
    build and probe sides."""
    _skip_if_empty("lineitem")
    row = _run(spark, "j15_bloom_filter_join").iloc[0]
    assert row["missed_rows"] == 0
    assert row["candidate_rows"] == row["true_rows"] + row["false_positives"]
    assert 0 <= row["candidate_rows"] <= row["probe_rows"]
    lineitem = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_suppkey"],
    )
    # The fixture deliberately carries duplicate (orderkey, linenumber)
    # rows; the probe audits each distinct keyed row once.
    assert row["probe_rows"] == len(lineitem.drop_duplicates())


def test_interval_merge_matches_bruteforce_island_partition(spark):
    """Gaps-and-islands must partition each customer's orders: a plain
    O(n log n) sweep-line merge in pandas has to produce the same
    island count, order total, largest island, and covered days."""
    got = (
        _run(spark, "u19_interval_merge")
        .set_index("c_custkey")
        .sort_index()
    )
    orders = pd.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate"],
    )
    seven = pd.Timedelta(days=7)
    for cust, grp in orders.groupby("o_custkey"):
        grp = grp.sort_values(["o_orderdate", "o_orderkey"])
        islands = []  # [start, max_end, n_orders]
        for _, r in grp.iterrows():
            s = r["o_orderdate"]
            if islands and islands[-1][1] >= s:
                islands[-1][1] = max(islands[-1][1], s + seven)
                islands[-1][2] += 1
            else:
                islands.append([s, s + seven, 1])
        want_days = sum(int((e - s).days) for s, e, _ in islands)
        row = got.loc[cust]
        assert row["n_islands"] == len(islands), cust
        assert row["n_orders"] == len(grp), cust
        assert row["max_island_orders"] == max(n for _, _, n in islands)
        assert row["covered_days"] == want_days, cust
    assert set(got.index) == set(orders["o_custkey"].unique())


def _grid_points(sf: str):
    cust = pd.read_parquet(f"{sf}/customer.parquet", columns=["c_custkey"])
    sup = pd.read_parquet(f"{sf}/supplier.parquet", columns=["s_suppkey"])
    cust["cx"] = (cust["c_custkey"] * 37) % 1000
    cust["cy"] = (cust["c_custkey"] * 91) % 1000
    sup["fx"] = (sup["s_suppkey"] * 53) % 1000
    sup["fy"] = (sup["s_suppkey"] * 17) % 1000
    return cust, sup


def test_grid_nearest_equals_global_nearest_when_in_neighborhood(spark):
    """The 3x3 cell probe is exact whenever the true nearest facility
    falls inside the customer's neighbor cells — for those customers
    the operator must return the globally nearest facility (suppkey
    tiebreak), at the recomputed squared distance. Customers whose
    whole neighborhood is facility-free must be absent, never wrong."""
    _skip_if_empty("supplier")
    got = _run(spark, "j16_grid_nearest_facility").set_index("c_custkey")
    cust, sup = _grid_points(SF)
    G = _GRID_CELL
    checked_exact = 0
    for _, c in cust.iterrows():
        d2 = (sup["fx"] - c["cx"]) ** 2 + (sup["fy"] - c["cy"]) ** 2
        best = sup.assign(d2=d2).sort_values(["d2", "s_suppkey"]).iloc[0]
        in_hood = (
            abs(best["fx"] // G - c["cx"] // G) <= 1
            and abs(best["fy"] // G - c["cy"] // G) <= 1
        )
        if in_hood:
            row = got.loc[c["c_custkey"]]
            assert row["nearest_facility"] == best["s_suppkey"]
            assert row["dist2"] == best["d2"]
            checked_exact += 1
        else:
            hood = sup[
                ((sup["fx"] // G) - (c["cx"] // G)).abs().le(1)
                & ((sup["fy"] // G) - (c["cy"] // G)).abs().le(1)
            ]
            if hood.empty:
                assert c["c_custkey"] not in got.index
    assert checked_exact > 0  # the property must actually bite


def test_target_encoding_is_convex_blend_of_loo_mean_and_prior(spark):
    """m-estimate smoothing is a convex combination: every row's
    leave-one-out encoding must lie between its segment's LOO mean and
    the global prior (up to the 1e-6 quantization plus float slack).
    Singleton segments must collapse exactly to the prior."""
    _skip_if_empty("orders")
    got = _run(spark, "q_target_encoding")
    orders = pd.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    cust = pd.read_parquet(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    fact = orders.merge(
        cust, left_on="o_custkey", right_on="c_custkey"
    ).rename(columns={"c_mktsegment": "segment", "o_totalprice": "y"})
    prior = math.floor(fact["y"].sum() / len(fact) * 1e6 + 0.5) / 1e6
    seg = fact.groupby("segment")["y"].agg(["sum", "count"])
    merged = got.merge(fact[["o_orderkey", "y"]], on="o_orderkey")
    assert len(merged) == len(fact)
    for _, r in merged.iterrows():
        ssum, cnt = seg.loc[r["segment"]]
        if cnt == 1:
            assert abs(r["loo_target_enc"] - prior) < 1e-3
            continue
        loo = (ssum - r["y"]) / (cnt - 1)
        lo, hi = min(loo, prior), max(loo, prior)
        assert lo - 1e-2 <= r["loo_target_enc"] <= hi + 1e-2, (
            r["o_orderkey"],
            loo,
            prior,
        )


def test_bm25_covers_exactly_the_hitting_docs_with_positive_scores(spark):
    """BM25 with the log(1+...) idf is strictly positive, and the
    result set must be exactly the documents containing at least one
    query term (whitespace tokenization), with the brute-force per-doc
    hit-term count."""
    got = _run(spark, "l_bm25_score").set_index("doc_id")
    docs = pd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    terms = set(_BM25_TERMS)
    want_hits = {}
    for _, d in docs.iterrows():
        toks = set(d["text"].split(" "))
        n = len(terms & toks)
        if n:
            want_hits[d["doc_id"]] = n
    assert set(got.index) == set(want_hits)
    for doc_id, n in want_hits.items():
        assert got.loc[doc_id, "n_hit_terms"] == n
    assert (got["bm25"] > 0).all()


def test_feature_hashing_conserves_tokens_and_sign_parity(spark):
    """The hashing trick redistributes but never invents tokens:
    bucket token counts must sum to the corpus token count, bucket ids
    must stay inside [0, D), and each bucket's signed weight must have
    the magnitude bound and parity of its token count (every token
    contributes exactly +1 or -1)."""
    got = _run(spark, "l_feature_hashing")
    docs = pd.read_parquet(
        f"{SF}/documents.parquet", columns=["text"]
    )
    total_tokens = int(docs["text"].str.split(" ").str.len().sum())
    assert int(got["n_tokens"].sum()) == total_tokens
    assert got["bucket"].between(0, _FHASH_D - 1).all()
    assert (got["signed_weight"].abs() <= got["n_tokens"]).all()
    assert ((got["signed_weight"] - got["n_tokens"]) % 2 == 0).all()
    assert (got["n_distinct_terms"] <= got["n_tokens"]).all()


def test_bom_explosion_matches_bruteforce_closure(spark):
    """Replay the closure with a plain Python DFS over the same
    deterministic hierarchy (child c >= 10, parent c//10 if present,
    qty (c%5)+1) and require identical component counts, unit totals,
    and depth per assembly."""
    got = _run(spark, "q_bom_explosion").set_index("assembly_key")
    part = pd.read_parquet(
        f"{SF}/part.parquet", columns=["p_partkey", "p_retailprice"]
    )
    keys = set(part["p_partkey"])
    children = {}  # parent -> [(child, qty)]
    for c in sorted(keys):
        p = c // 10
        if c >= 10 and p in keys:
            children.setdefault(p, []).append((c, c % 5 + 1))

    def walk(anc):
        # (descendant, multiplicity, level) triples, self included
        out = [(anc, 1, 0)]
        for child, qty in children.get(anc, ()):
            out.extend(
                (d, m * qty, l + 1) for d, m, l in walk(child)
            )
        return out

    for anc in keys:
        rows = walk(anc)
        row = got.loc[anc]
        assert row["n_components"] == len(rows), anc
        assert row["total_units"] == sum(m for _, m, _ in rows), anc
        assert row["subtree_depth"] == max(l for _, _, l in rows), anc
    assert set(got.index) == keys


def test_npv_n_years_bounded_by_factor_horizon(spark):
    """Every region's NPV must discount at most the 10 published
    factor years, and the undiscounted yearly revenue must dominate
    the discounted sum (factors are <= 1)."""
    got = _run(spark, "q_npv_discounted_cashflow")
    assert (got["n_years"] <= 10).all()
    assert (got["n_years"] >= 1).all()
    orders = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_totalprice"]
    )
    assert (got["npv"] > 0).all()
    assert got["npv"].sum() <= float(orders["o_totalprice"].sum())


@pytest.fixture(scope="module", autouse=True)
def _loaded():
    engine.load_all()
