"""Brute-force references for the round-10 sharded-dedup planning
family (l_shard_count_advisor, l_sharded_dedup_rehearsal,
l_cross_shard_neardup_rate, l_hot_bucket_skew_advisor,
l_dedup_stage_cost_model) and s19_partition_size_advisor. Plain-Python
recomputation from raw parquet with hashlib md5 replays, explicit
shingle loops and Counter arithmetic — independent of the SQL twin
oracles, so a defect shared by both engines still surfaces here.
Honors TEST_SF_DIR like every other brute-force module."""

from __future__ import annotations

import hashlib
import math
import os
from collections import Counter, defaultdict

import pandas as pd
import pytest

import dock_financial_data_pipelines_spark as engine

SF = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")

MINHASH_K = 12
ROWS_PER_BAND = 3
CONT_CAP = 64
S19_TARGET = 131072


def _run(spark, name: str) -> pd.DataFrame:
    return engine.QUERIES[name](spark, SF).toPandas()


def _skip_if_empty(table: str) -> None:
    import pyarrow.parquet as pq

    if pq.read_metadata(f"{SF}/{table}.parquet").num_rows == 0:
        pytest.skip(f"{table} empty: covered by the empty-fixture sweep")


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _h60(s: str) -> int:
    return int(_md5(s)[:15], 16)


def _docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/documents.parquet")


def _r6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _shingles(text: str) -> set:
    ws = text.split(" ")
    return {
        " ".join(ws[i : i + 3]) for i in range(max(len(ws) - 3, 0) + 1)
    }


def _band_sigs(text: str) -> list:
    sh = _shingles(text)
    mins = [
        min(_h60(f"{s}#{f}") for s in sh) for f in range(MINHASH_K)
    ]
    return [
        (b, "_".join(str(v) for v in mins[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]))
        for b in range(MINHASH_K // ROWS_PER_BAND)
    ]


def _c2(n: int) -> int:
    return n * (n - 1) // 2


def test_shard_count_advisor_matches_hash_replay(spark):
    _skip_if_empty("documents")
    docs = _docs()
    got = _run(spark, "l_shard_count_advisor")
    for n in (4, 8, 16, 32):
        shard_rows = Counter()
        groups = defaultdict(lambda: [0, set()])  # dg -> [count, shards]
        for doc_id, text in zip(docs["doc_id"], docs["text"]):
            shard = _h60(str(doc_id)) % n
            shard_rows[shard] += 1
            g = groups[_md5(text)]
            g[0] += 1
            g[1].add(shard)
        dups = {k: v for k, v in groups.items() if v[0] > 1}
        cross = {k: v for k, v in dups.items() if len(v[1]) > 1}
        row = got[got["n_shards"] == n].iloc[0]
        assert row["shards_nonempty"] == len(shard_rows)
        assert row["max_shard_rows"] == max(shard_rows.values())
        assert row["min_shard_rows"] == min(shard_rows.values())
        assert (
            abs(
                row["skew_ratio"]
                - _r6(max(shard_rows.values()) * n / len(docs))
            )
            < 1.1e-6
        )
        assert row["dup_groups"] == len(dups)
        assert row["groups_cross_shard"] == len(cross)
        assert row["rows_needing_global_pass"] == sum(
            v[0] - 1 for v in cross.values()
        )
        want_rate = _r6(len(cross) / len(dups)) if dups else 0.0
        assert abs(row["cross_shard_group_rate"] - want_rate) < 1.1e-6


def test_sharded_dedup_rehearsal_is_lossless_and_exact(spark):
    _skip_if_empty("documents")
    docs = _docs()
    local = Counter()  # (shard, dg) -> count
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        local[(_h60(str(doc_id)) % 16, _md5(text))] += 1
    survivors = len(local)
    local_removed = sum(c - 1 for c in local.values())
    global_g = Counter(dg for _, dg in local)
    global_removed = sum(c - 1 for c in global_g.values())
    distinct = len({_md5(t) for t in docs["text"]})

    got = _run(spark, "l_sharded_dedup_rehearsal")
    assert len(got) == 1
    row = got.iloc[0]
    assert row["n_docs"] == len(docs)
    assert row["local_removed"] == local_removed
    assert row["survivors"] == survivors
    assert row["global_removed"] == global_removed
    assert row["two_pass_final"] == len(global_g)
    assert row["single_pass_final"] == distinct
    # losslessness is a theorem, not a fixture property
    assert bool(row["two_pass_lossless"]) is True
    assert len(global_g) == distinct
    assert local_removed + global_removed == len(docs) - distinct


def _bucket_tables():
    docs = _docs()
    bucket = Counter()  # (band, sig) -> size
    bucket_shard = Counter()  # (band, sig, shard) -> size
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        shard = _h60(str(doc_id)) % 16
        for band, sig in _band_sigs(text):
            bucket[(band, sig)] += 1
            bucket_shard[(band, sig, shard)] += 1
    return bucket, bucket_shard


def test_cross_shard_neardup_rate_matches_minhash_replay(spark):
    _skip_if_empty("documents")
    bucket, bucket_shard = _bucket_tables()
    total = sum(_c2(c) for c in bucket.values())
    within = sum(_c2(c) for c in bucket_shard.values())
    got = _run(spark, "l_cross_shard_neardup_rate")
    assert len(got) == 1
    row = got.iloc[0]
    assert row["total_pairs"] == total
    assert row["within_pairs"] == within
    assert row["cross_shard_pairs"] == total - within
    want = _r6((total - within) / total) if total else 0.0
    assert abs(row["cross_shard_pair_rate"] - want) < 1.1e-6


def test_hot_bucket_skew_advisor_matches_tier_walk(spark):
    _skip_if_empty("documents")
    bucket, _ = _bucket_tables()
    sized = [c for c in bucket.values() if c >= 2]
    if not sized:
        got = _run(spark, "l_hot_bucket_skew_advisor")
        assert len(got) == 0
        return
    total = sum(_c2(c) for c in sized)
    tiers = defaultdict(lambda: [0, 0, 0])  # n_buckets, max_size, pairs
    for c in sized:
        t = (
            "d_ge64"
            if c >= 64
            else "c_16_63" if c >= 16 else "b_4_15" if c >= 4 else "a_2_3"
        )
        tiers[t][0] += 1
        tiers[t][1] = max(tiers[t][1], c)
        tiers[t][2] += _c2(c)
    got = _run(spark, "l_hot_bucket_skew_advisor")
    assert list(got["tier"]) == sorted(tiers)
    for _, row in got.iterrows():
        n_b, mx, p = tiers[row["tier"]]
        assert row["n_buckets"] == n_b
        assert row["max_bucket_size"] == mx
        assert row["candidate_pairs"] == p
        assert abs(row["pair_share"] - _r6(p / total)) < 1.1e-6
    assert got["candidate_pairs"].sum() == total


def test_dedup_stage_cost_model_matches_counter_replay(spark):
    _skip_if_empty("documents")
    docs = _docs()
    if len(docs) < 2:
        got = _run(spark, "l_dedup_stage_cost_model")
        assert len(got) == 0
        return
    all_pairs = _c2(len(docs))

    exact = Counter(_md5(t) for t in docs["text"])
    bucket, _ = _bucket_tables()
    posting = defaultdict(set)  # shingle-hash -> docs
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        for s in _shingles(text):
            posting[_h60(s)].add(doc_id)
    kept = {h: d for h, d in posting.items() if len(d) <= CONT_CAP}

    want = {
        "a_exact_digest": (len(exact), sum(_c2(c) for c in exact.values())),
        "b_minhash_lsh": (len(bucket), sum(_c2(c) for c in bucket.values())),
        "c_containment_capped": (
            len(kept),
            sum(_c2(len(d)) for d in kept.values()),
        ),
    }
    got = _run(spark, "l_dedup_stage_cost_model")
    assert list(got["stage"]) == sorted(want)
    for _, row in got.iterrows():
        units, pairs = want[row["stage"]]
        assert row["candidate_units"] == units
        assert row["candidate_pairs"] == pairs
        assert row["all_pairs"] == all_pairs
        assert abs(row["pair_fraction"] - _r6(pairs / all_pairs)) < 1.1e-6


def test_partition_size_advisor_matches_byte_walk(spark):
    _skip_if_empty("orders")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    months = defaultdict(lambda: [0, 0])  # rows, bytes
    for ts, st, pr in zip(
        o["o_orderdate"], o["o_orderstatus"], o["o_orderpriority"]
    ):
        m = months[ts.strftime("%Y-%m")]
        m[0] += 1
        m[1] += 32 + len(st.encode("utf-8")) + len(pr.encode("utf-8"))
    got = _run(spark, "s19_partition_size_advisor")
    assert list(got["mon"]) == sorted(months)
    for _, row in got.iterrows():
        n_rows, est = months[row["mon"]]
        assert row["n_rows"] == n_rows
        assert row["est_bytes"] == est
        assert row["target_files"] == max(
            math.ceil(est / float(S19_TARGET)), 1
        )
        want = (
            "coalesce"
            if est < S19_TARGET // 2
            else "split" if est > S19_TARGET * 2 else "ok"
        )
        assert row["verdict"] == want


def test_pipeline_sharded_dedup_matches_two_pass_queue(spark):
    _skip_if_empty("documents")
    docs = _docs()
    # pass 1: explicit per-shard keep-first walk
    pass1 = {}  # (shard, dg) -> min doc_id
    groups = defaultdict(list)
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        shard = _h60(str(doc_id)) % 16
        dg = _md5(text)
        k = (shard, dg)
        pass1[k] = min(pass1.get(k, doc_id), doc_id)
        groups[dg].append(doc_id)
    # pass 2: keep-first over shard survivors
    pass2 = {}
    for (shard, dg), keep in pass1.items():
        pass2[dg] = min(pass2.get(dg, keep), keep)
    direct = {dg: min(ids) for dg, ids in groups.items()}

    got = _run(spark, "pipeline_sharded_dedup")
    assert len(got) == 1
    row = got.iloc[0]
    assert row["n_docs"] == len(docs)
    assert row["pass1_survivors"] == len(pass1)
    assert row["final_rows"] == len(pass2)
    assert row["removed_total"] == len(docs) - len(pass2)
    assert row["keep_mismatches"] == 0
    # associativity of keep-first is a theorem; assert it independently
    assert pass2 == direct


def test_join_skew_advisor_matches_partition_model(spark):
    _skip_if_empty("events")
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    freq = Counter(ev["user_id"])
    top = max(freq.values())
    total = sum(freq.values())
    got = _run(spark, "j17_join_skew_advisor")
    assert list(got["n_partitions"]) == [8, 32, 128]
    for p in (8, 32, 128):
        loads = Counter()
        for uid, c in freq.items():
            loads[_h60(str(uid)) % p] += c
        row = got[got["n_partitions"] == p].iloc[0]
        assert row["partitions_nonempty"] == len(loads)
        assert row["max_partition_rows"] == max(loads.values())
        assert (
            abs(row["skew_ratio"] - _r6(max(loads.values()) * p / total))
            < 1.1e-6
        )
        assert row["top_key_rows"] == top
        lf = top * p / total
        assert abs(row["top_key_load_factor"] - _r6(lf)) < 1.1e-6
        assert row["recommended_salt"] == max(math.ceil(lf), 1)
