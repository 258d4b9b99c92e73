"""Brute-force references for the round-9 corpus-screen family:
cross-shard dup rate, fingerprint collision audit, stopword profile,
char-class profile, numeric density, word-length profile, hapax ratio,
common-ngram blocklist. Plain-Python recomputation (hashlib, Counters,
explicit loops) from the raw documents parquet, independent of the SQL
twin oracles."""

from __future__ import annotations

import hashlib
import math
import os
import re
from collections import Counter, defaultdict

import pandas as pd
import pytest

import dock_financial_data_pipelines_spark as engine

SF = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


def _run(spark, name: str) -> pd.DataFrame:
    return engine.QUERIES[name](spark, SF).toPandas()


def _docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/documents.parquet")


def _skip_if_no_docs(df) -> None:
    if len(df) == 0:
        pytest.skip("documents empty: covered by the empty-fixture sweep")


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def test_cross_shard_dup_rate_matches_hash_replay(spark):
    docs = _docs()
    _skip_if_no_docs(docs)
    got = _run(spark, "l_cross_shard_dup_rate")
    groups = defaultdict(list)
    for did, text in zip(docs["doc_id"], docs["text"]):
        shard = int(_md5(str(did))[:15], 16) % 16
        groups[_md5(text)].append(shard)
    dups = {k: v for k, v in groups.items() if len(v) > 1}
    cross = [v for v in dups.values() if len(set(v)) > 1]
    row = got.iloc[0]
    assert row["dup_groups"] == len(dups)
    assert row["groups_cross_shard"] == len(cross)
    assert row["removable_rows"] == sum(len(v) - 1 for v in dups.values())
    assert row["rows_needing_global_pass"] == sum(len(v) - 1 for v in cross)
    if dups:
        assert abs(row["cross_shard_group_rate"] - len(cross) / len(dups)) < 1.1e-6


def test_fingerprint_collision_audit_matches_truncation(spark):
    docs = _docs()
    _skip_if_no_docs(docs)
    got = _run(spark, "l_fingerprint_collision_audit").sort_values("bits")
    digests = {_md5(t) for t in docs["text"]}
    m = len(digests)
    assert got["bits"].tolist() == [24, 32, 40]
    for bits, hexchars in [(24, 6), (32, 8), (40, 10)]:
        fps = {d[:hexchars] for d in digests}
        row = got[got["bits"] == bits].iloc[0]
        assert row["n_texts"] == m
        assert row["n_fingerprints"] == len(fps)
        assert row["collisions"] == m - len(fps)
        assert (
            abs(row["expected_collisions"] - m * (m - 1) / 2 ** (bits + 1))
            < 1.1e-6
        )


_STOP = {"the", "a", "and", "of", "to", "in", "is", "it", "on", "for"}


def test_stopword_profile_matches_token_loop(spark):
    docs = _docs()
    _skip_if_no_docs(docs)
    got = _run(spark, "l_stopword_profile")
    acc = defaultdict(lambda: [0, 0, 0, 0, 0])  # docs, tok, stop, low, high
    for src, lang, text in zip(docs["source"], docs["lang"], docs["text"]):
        toks = text.split(" ")
        ns = sum(1 for t in toks if t in _STOP)
        a = acc[(src, lang)]
        a[0] += 1
        a[1] += len(toks)
        a[2] += ns
        if len(toks) > 0 and ns / len(toks) < 0.05:
            a[3] += 1
        if len(toks) > 0 and ns / len(toks) > 0.5:
            a[4] += 1
    keys = sorted(k for k, v in acc.items() if v[1] > 0)
    assert list(zip(got["source"], got["lang"])) == keys
    for k in keys:
        nd, nt, ns, lo, hi = acc[k]
        row = got[(got["source"] == k[0]) & (got["lang"] == k[1])].iloc[0]
        assert row["n_docs"] == nd and row["total_tokens"] == nt
        assert row["stop_tokens"] == ns
        assert abs(row["stop_share"] - ns / nt) < 1.1e-6
        assert row["docs_low_stop"] == lo and row["docs_high_stop"] == hi


def test_char_class_profile_matches_char_loop(spark):
    docs = _docs()
    _skip_if_no_docs(docs)
    got = _run(spark, "l_char_class_profile")
    punct = set(".,;:!?'\"()[]{}-")
    acc = defaultdict(lambda: [0, 0, 0, 0, 0, 0, 0])
    for src, text in zip(docs["source"], docs["text"]):
        a = acc[src]
        a[0] += 1
        for ch in text:
            a[1] += 1
            if ("a" <= ch <= "z") or ("A" <= ch <= "Z"):
                a[2] += 1
            elif "0" <= ch <= "9":
                a[3] += 1
            elif ch == " ":
                a[4] += 1
            elif ch in punct:
                a[5] += 1
            else:
                a[6] += 1
    keys = sorted(k for k, v in acc.items() if v[1] > 0)
    assert got["source"].tolist() == keys
    for k in keys:
        nd, tot, let, dig, sp, pu, oth = acc[k]
        row = got[got["source"] == k].iloc[0]
        assert row["n_docs"] == nd and row["total_chars"] == tot
        assert abs(row["letter_share"] - let / tot) < 1.1e-6
        assert abs(row["digit_share"] - dig / tot) < 1.1e-6
        assert abs(row["space_share"] - sp / tot) < 1.1e-6
        assert abs(row["punct_share"] - pu / tot) < 1.1e-6
        assert abs(row["other_share"] - oth / tot) < 1.1e-6


def test_numeric_density_matches_band_loop(spark):
    docs = _docs()
    _skip_if_no_docs(docs)
    got = _run(spark, "l_numeric_density_filter")
    numtok = re.compile(r"^[0-9.,%$+\-]+$")
    acc = defaultdict(lambda: [0, 0, 0, 0])  # docs, digits, numtoks, toks
    for src, text in zip(docs["source"], docs["text"]):
        nc = len(text)
        nd = sum(1 for ch in text if "0" <= ch <= "9")
        toks = text.split(" ")
        nn = sum(1 for t in toks if numtok.match(t))
        band = (
            "low"
            if nc == 0 or nd / nc < 0.05
            else ("mid" if nd / nc < 0.2 else "high")
        )
        a = acc[(src, band)]
        a[0] += 1
        a[1] += nd
        a[2] += nn
        a[3] += len(toks)
    keys = sorted(k for k, v in acc.items() if v[3] > 0)
    assert list(zip(got["source"], got["band"])) == keys
    for k in keys:
        ndoc, ndig, nnum, ntok = acc[k]
        row = got[(got["source"] == k[0]) & (got["band"] == k[1])].iloc[0]
        assert row["n_docs"] == ndoc
        assert row["digit_chars"] == ndig
        assert row["numeric_tokens"] == nnum
        assert abs(row["numeric_token_share"] - nnum / ntok) < 1.1e-6


def test_word_length_profile_matches_loop(spark):
    docs = _docs()
    _skip_if_no_docs(docs)
    got = _run(spark, "l_word_length_profile")
    acc = defaultdict(list)
    for src, text in zip(docs["source"], docs["text"]):
        acc[src].extend(len(t) for t in text.split(" "))
    assert got["source"].tolist() == sorted(acc)
    for src, lens in acc.items():
        row = got[got["source"] == src].iloc[0]
        n = len(lens)
        mean = math.fsum(lens) / n
        assert row["n_tokens"] == n
        assert abs(row["mean_word_len"] - mean) < 1.1e-6
        assert abs(row["short_share"] - sum(1 for x in lens if x <= 2) / n) < 1.1e-6
        assert abs(row["long_share"] - sum(1 for x in lens if x > 15) / n) < 1.1e-6
        assert row["passes_gopher_rule"] == (1 if 3 <= mean <= 10 else 0)


def test_hapax_ratio_matches_counter(spark):
    docs = _docs()
    _skip_if_no_docs(docs)
    got = _run(spark, "l_hapax_ratio")
    acc = defaultdict(Counter)
    for src, text in zip(docs["source"], docs["text"]):
        acc[src].update(text.split(" "))
    assert got["source"].tolist() == sorted(acc)
    for src, tf in acc.items():
        row = got[got["source"] == src].iloc[0]
        vocab = len(tf)
        hapax = sum(1 for c in tf.values() if c == 1)
        assert row["vocab_size"] == vocab
        assert row["n_tokens"] == sum(tf.values())
        assert row["hapax_count"] == hapax
        assert abs(row["hapax_share"] - hapax / vocab) < 1.1e-6
        assert abs(row["tokens_per_type"] - sum(tf.values()) / vocab) < 1.1e-6


def test_common_ngram_blocklist_matches_df_loop(spark):
    docs = _docs()
    _skip_if_no_docs(docs)
    got = _run(spark, "l_common_ngram_blocklist")
    doc_grams = {}
    df = Counter()
    for did, src, text in zip(docs["doc_id"], docs["source"], docs["text"]):
        w = text.split(" ")
        grams = {
            " ".join(w[i : i + 5]) for i in range(len(w) - 4)
        } if len(w) >= 5 else set()
        doc_grams[did] = (src, grams)
        df.update(grams)
    top = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    block = {g for g, _ in top}
    acc = defaultdict(lambda: [0, 0])
    for did, (src, grams) in doc_grams.items():
        hits = len(grams & block)
        if hits:
            acc[src][0] += 1
            acc[src][1] += hits
    assert got["source"].tolist() == sorted(acc)
    for src, (ndoc, nhit) in acc.items():
        row = got[got["source"] == src].iloc[0]
        assert row["docs_with_blocklisted"] == ndoc
        assert row["total_hits"] == nhit
        assert abs(row["mean_hits_per_doc"] - nhit / ndoc) < 1.1e-6
