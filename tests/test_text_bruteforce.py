"""Independent brute-force references for the round-7/8 text and
tokenizer-training operators (PMI collocations, repeated-n-gram
coverage, one BPE merge step, Kneser-Ney cross-entropy, pairwise JSD,
content-hash shard balance). As with the stats/finance siblings, each
test recomputes the result from the raw documents table with plain
Python dict counting — the classic single-machine formulation — so a
defect shared by the Spark plan and its DuckDB twin oracle still
surfaces."""

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



def _docs() -> pd.DataFrame:
    return pd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "source", "text"]
    )


def test_pmi_bigrams_matches_dict_counting(spark):
    """PMI over adjacent bigrams from plain Counter tallies, with the
    c>=5 and lift>=50 gates applied on exact integers."""
    got = _run(spark, "l_pmi_bigrams").set_index(["tok_a", "tok_b"])
    uni: Counter = Counter()
    big: Counter = Counter()
    for text in _docs()["text"]:
        ws = text.split(" ")
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    n = sum(uni.values())
    want = {}
    for (a, b), c12 in big.items():
        if c12 < 5:
            continue
        lift = n * c12 / (uni[a] * uni[b])
        if lift >= 50.0:
            want[(a, b)] = (c12, math.floor(math.log(lift) * 1e6 + 0.5) / 1e6)
    assert set(got.index) == set(want)
    for key, (c12, pmi) in want.items():
        assert got.loc[key, "n_pair"] == c12, key
        assert abs(got.loc[key, "pmi"] - pmi) < 2e-6, key


def test_repeated_ngram_coverage_matches_dict_counting(spark):
    """The Gopher dup-n-gram character fractions recomputed per doc
    with Counters over joined gram strings (gram length includes the
    joining spaces), capped at 1, then averaged per source."""
    got = _run(spark, "l_repeated_ngram_coverage").set_index("source")
    # Domain note (matches both engines): a doc contributes to the
    # n-gram stats only if it HAS at least one n-gram (>= n tokens) —
    # 1-word docs have no repetition fraction to speak of. n_docs is
    # the 2-gram domain size.
    per_source = defaultdict(lambda: {2: [], 3: []})
    for _, d in _docs().iterrows():
        ws = d["text"].split(" ")
        n_chars = len(d["text"])
        st = per_source[d["source"]]
        for n in (2, 3):
            if len(ws) < n:
                continue
            grams = Counter(
                " ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)
            )
            covered = sum(
                c * len(g) for g, c in grams.items() if c >= 2
            )
            st[n].append(min(covered / n_chars, 1.0) if n_chars else 0.0)
    expected_srcs = {s for s, st in per_source.items() if st[2]}
    assert set(got.index) == expected_srcs
    for src in expected_srcs:
        st = per_source[src]
        row = got.loc[src]
        assert row["n_docs"] == len(st[2]), src
        for n, mcol, fcol, thr in (
            (2, "mean_dup2gram_char_frac", "n_fail_dup2gram", 0.2),
            (3, "mean_dup3gram_char_frac", "n_fail_dup3gram", 0.18),
        ):
            if not st[n]:
                assert pd.isna(row[mcol]), (src, n)
                continue
            mean = sum(st[n]) / len(st[n])
            assert abs(row[mcol] - mean) < 2e-6, (src, n)
            assert row[fcol] == sum(1 for f in st[n] if f > thr), (src, n)


def test_bpe_merge_step_matches_greedy_scan(spark):
    """One BPE training step recomputed the single-machine way: pair
    counts over the word-frequency table, (count desc, pair asc)
    selection, and a LEFT-GREEDY scan per word type for the merge
    application (the independent formulation of the operator's
    island-parity trick)."""
    _skip_if_empty("documents")
    got = _run(spark, "l_bpe_merge_step").iloc[0]
    vocab: Counter = Counter()
    for text in _docs()["text"]:
        vocab.update(w for w in text.split(" ") if w)
    paircnt: Counter = Counter()
    for w, cnt in vocab.items():
        for a, b in zip(w, w[1:]):
            paircnt[(a, b)] += cnt
    (a, b), pc = min(
        paircnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
    )
    n_types = n_inst = merged_occurrences = 0
    for w, cnt in vocab.items():
        merges = 0
        i = 0
        while i < len(w) - 1:
            if w[i] == a and w[i + 1] == b:
                merges += 1
                i += 2  # left-greedy: consumed both symbols
            else:
                i += 1
        if merges:
            n_types += 1
            n_inst += cnt
            merged_occurrences += cnt * merges
    before = sum(cnt * len(w) for w, cnt in vocab.items())
    assert got["merge_left"] == a and got["merge_right"] == b
    assert got["pair_count"] == pc
    assert got["n_word_types"] == n_types
    assert got["n_word_instances"] == n_inst
    assert got["tokens_before"] == before
    assert got["tokens_after"] == before - merged_occurrences


def test_kneser_ney_matches_dict_model(spark):
    """KN and add-one bigram cross-entropies rebuilt from dict count
    tables with float math (no decimal staging) — agreement within the
    quantization tolerance."""
    _skip_if_empty("documents")
    got = _run(spark, "l_kneser_ney_bigram").iloc[0]
    c12: Counter = Counter()
    vocab = set()
    for text in _docs()["text"]:
        ws = text.split(" ")
        vocab.update(ws)
        c12.update(zip(ws, ws[1:]))
    c1: Counter = Counter()
    fo1: Counter = Counter()
    fi2: Counter = Counter()
    for (w1, w2), n12 in c12.items():
        c1[w1] += n12
        fo1[w1] += 1
        fi2[w2] += 1
    t = len(c12)
    v = len(vocab)
    n_tok = sum(c12.values())
    kn = ao = 0.0
    for (w1, w2), n12 in c12.items():
        p_kn = (n12 - 0.75) / c1[w1] + 0.75 * fo1[w1] / c1[w1] * (
            fi2[w2] / t
        )
        kn += n12 * math.log(p_kn)
        ao += n12 * (math.log(n12 + 1) - math.log(c1[w1] + v))
    assert got["n_bigram_tokens"] == n_tok
    assert got["n_bigram_types"] == t
    assert abs(got["kn_cross_entropy_nats"] - (-kn / n_tok)) < 2e-6
    assert abs(got["addone_cross_entropy_nats"] - (-ao / n_tok)) < 2e-6


def test_jsd_source_divergence_matches_dict_model(spark):
    """Pairwise Jensen-Shannon over top-30+OTHER bins recomputed with
    dict tallies and plain float terms."""
    got = _run(spark, "l_jsd_source_divergence").set_index(
        ["src_a", "src_b"]
    )
    counts = defaultdict(Counter)
    for _, d in _docs().iterrows():
        counts[d["source"]].update(d["text"].split(" "))
    total: Counter = Counter()
    for c in counts.values():
        total.update(c)
    top = sorted(total.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    top_set = {tok for tok, _ in top}
    binned = {}
    bins_present = set()
    for src, c in counts.items():
        bc = Counter()
        for tok, n in c.items():
            bc[tok if tok in top_set else "<OTHER>"] += n
        binned[src] = bc
        bins_present.update(bc)
    nb = len(bins_present)
    shares = {
        src: {
            b: (bc.get(b, 0) + 1.0) / (sum(bc.values()) + nb)
            for b in bins_present
        }
        for src, bc in binned.items()
    }
    srcs = sorted(shares)
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1 :]:
            jsd = sum(
                0.5
                * (
                    shares[sa][b] * math.log(2 * shares[sa][b] / (shares[sa][b] + shares[sb][b]))
                    + shares[sb][b] * math.log(2 * shares[sb][b] / (shares[sa][b] + shares[sb][b]))
                )
                for b in bins_present
            )
            row = got.loc[(sa, sb)]
            assert row["n_bins"] == nb, (sa, sb)
            assert abs(row["jsd"] - jsd) < 1e-8, (sa, sb)
    assert len(got) == len(srcs) * (len(srcs) - 1) // 2


def test_shard_balance_matches_md5_bruteforce(spark):
    """Content-hash shard assignment replayed with hashlib: per-shard
    doc/token/char loads and the basis-point deviations."""
    got = _run(spark, "l_shard_assignment_balance").set_index("shard")
    per = defaultdict(lambda: [0, 0, 0])
    for text in _docs()["text"]:
        shard = int(hashlib.md5(text.encode()).hexdigest()[:15], 16) % 16
        st = per[shard]
        st[0] += 1
        st[1] += len(text.split(" "))
        st[2] += len(text)
    td = sum(v[0] for v in per.values())
    tt = sum(v[1] for v in per.values())
    assert set(got.index) == set(per)
    for shard, (nd, ntk, nch) in per.items():
        row = got.loc[shard]
        assert row["n_docs"] == nd, shard
        assert row["n_tokens"] == ntk, shard
        assert row["n_chars"] == nch, shard
        assert row["doc_share_dev_bp"] == math.floor(
            (nd / td - 1 / 16) * 1e4 + 0.5
        ), shard
        assert row["token_share_dev_bp"] == math.floor(
            (ntk / tt - 1 / 16) * 1e4 + 0.5
        ), shard
