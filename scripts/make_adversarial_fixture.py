"""Generate an ADVERSARIAL fixture set: same schemas as the driver's
testdata, but every row is an edge case — 1-and-2-word documents,
exact-duplicate texts, shared 8-token prefixes, events exactly on
window boundaries and with tied (user, ts) pairs, orders at predicate
boundary dates with tied amounts on the same day, lineitems at the
flagship filter's exact cut-off, near-parallel and near-orthogonal
embeddings.

Purpose: the oracle-parity suite re-run over this data
(``TEST_SF_DIR=/tmp/dock_advfix python scripts/check_all.py``) hunts
latent engine↔oracle divergences that the generator's smooth data never
exercises — the class of bug round 3's review found twice (descending
``sequence(1,0)`` fabricating bigrams for 1-word docs; as-of rows
before the first FX fix). Both engines read the same parquet, so any
hash mismatch here is a real semantic divergence, not bad data.

Writes /tmp/dock_advfix/{table}.parquet (timestamp[us], no UTC flag —
the same physical flavor as the round-4 driver data).
"""

from __future__ import annotations

import datetime as dt
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.environ.get("ADV_FIX_DIR", "/tmp/dock_advfix")

BASE = dt.datetime(2024, 1, 1)
ODATE = dt.datetime(1996, 1, 1)


def _write(name: str, table: pa.Table) -> None:
    os.makedirs(OUT, exist_ok=True)
    pq.write_table(table, os.path.join(OUT, f"{name}.parquet"))


def region_nation() -> None:
    _write(
        "region",
        pa.table(
            {
                "r_regionkey": pa.array([0, 1, 2], pa.int32()),
                "r_name": ["AMERICA", "ASIA", "EUROPE"],
            }
        ),
    )
    _write(
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(list(range(6)), pa.int32()),
                "n_name": ["BRAZIL", "CANADA", "JAPAN", "CHINA", "FRANCE", "GERMANY"],
                "n_regionkey": pa.array([0, 0, 1, 1, 2, 2], pa.int32()),
            }
        ),
    )


def customer_supplier_part() -> None:
    n = 40
    _write(
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(list(range(n)), pa.int64()),
                # names differing in ≤2 digit positions (fuzzy-match ties)
                "c_name": [f"Customer#{k:09d}" for k in range(n)],
                "c_nationkey": pa.array([k % 6 for k in range(n)], pa.int32()),
                # tied balances (rank/percentile tie semantics)
                "c_acctbal": [round(100.0 * (k // 4), 2) for k in range(n)],
                "c_mktsegment": [
                    ["BUILDING", "FURNITURE", "MACHINERY"][k % 3] for k in range(n)
                ],
            }
        ),
    )
    _write(
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(list(range(8)), pa.int64()),
                "s_name": [f"Supplier#{k:09d}" for k in range(8)],
                "s_nationkey": pa.array([k % 6 for k in range(8)], pa.int32()),
                # exactly at the j6 filter boundary 3000
                "s_acctbal": [3000.0, 3000.01, 2999.99, 4500.5, 100.0, 0.0, 7000.25, 3000.0],
            }
        ),
    )
    _write(
        "part",
        pa.table(
            {
                "p_partkey": pa.array(list(range(12)), pa.int64()),
                "p_name": [f"part {k}" for k in range(12)],
                "p_brand": [f"Brand#{k % 3}" for k in range(12)],
                "p_type": [
                    ["ECONOMY ANODIZED STEEL", "PROMO BURNISHED COPPER", "STANDARD PLATED TIN"][k % 3]
                    for k in range(12)
                ],
                # sizes exactly on the q16 IN-list / q19 band boundaries
                "p_size": pa.array(
                    [1, 9, 14, 15, 19, 23, 25, 36, 45, 49, 50, 10], pa.int32()
                ),
                "p_retailprice": [round(900 + 10.1 * k, 2) for k in range(12)],
            }
        ),
    )


def orders_lineitem() -> None:
    rows = []
    ok = 0
    for day in range(12):
        d = ODATE + dt.timedelta(days=day * 61)  # crosses month/quarter edges
        for j in range(6):
            cust = (ok * 7) % 40
            # duplicate payments: same cust/day/amount pairs (j even/odd)
            price = round(1000.0 + 111.115 * (j // 2), 2)  # .xx5 rounding bait
            status = "OF"[ok % 2]
            rows.append(
                (
                    ok,
                    cust,
                    status,
                    price,
                    d,
                    ["1-URGENT", "3-MEDIUM", "5-LOW"][ok % 3],
                )
            )
            ok += 1
    o = list(zip(*rows))
    _write(
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(o[0], pa.int64()),
                "o_custkey": pa.array(o[1], pa.int64()),
                "o_orderstatus": list(o[2]),
                "o_totalprice": list(o[3]),
                "o_orderdate": pa.array(o[4], pa.timestamp("us")),
                "o_orderpriority": list(o[5]),
            }
        ),
    )
    li = []
    for k in range(ok):
        for line in range(1 + k % 3):
            qty = float(1 + (k + line) % 50)
            price = round(901.0 + 13.13 * ((k * 3 + line) % 77), 2)
            disc = [0.0, 0.05, 0.1][line % 3]
            tax = [0.0, 0.04, 0.08][k % 3]
            # shipdate exactly on the common predicate boundaries
            ship = [
                dt.datetime(1996, 1, 1),
                dt.datetime(1996, 3, 31),
                dt.datetime(1997, 1, 1),
                dt.datetime(1998, 3, 15),
            ][(k + line) % 4]
            li.append(
                (
                    k,
                    (k * 5 + line) % 12,
                    (k + line) % 8,
                    line + 1,
                    qty,
                    price,
                    disc,
                    tax,
                    "ARN"[(k + line) % 3],
                    "OF"[k % 2],
                    ship,
                )
            )
    c = list(zip(*li))
    _write(
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(c[0], pa.int64()),
                "l_partkey": pa.array(c[1], pa.int64()),
                "l_suppkey": pa.array(c[2], pa.int64()),
                "l_linenumber": pa.array(c[3], pa.int32()),
                "l_quantity": list(c[4]),
                "l_extendedprice": list(c[5]),
                "l_discount": list(c[6]),
                "l_tax": list(c[7]),
                "l_returnflag": list(c[8]),
                "l_linestatus": list(c[9]),
                "l_shipdate": pa.array(c[10], pa.timestamp("us")),
            }
        ),
    )


def events() -> None:
    rows = []
    eid = 0
    types = ["view", "click", "purchase", "signup", "error"]
    for u in range(6):
        for i in range(30):
            # exact window boundaries (10-min multiples), session-gap
            # boundaries (exactly 1800 s), and tied timestamps
            sec = [0, 599, 600, 1799, 1800, 1801, 3600][i % 7] + 7200 * (i // 7)
            ts = BASE + dt.timedelta(seconds=sec)
            rows.append((eid, ts, u, types[(u + i) % 5], round(0.5 * i - 3.0, 2), "{}"))
            eid += 1
            if i % 9 == 0:  # duplicate (user, ts) pair, distinct event_id
                rows.append((eid, ts, u, types[(u + i + 1) % 5], 0.0, "{}"))
                eid += 1
    c = list(zip(*rows))
    _write(
        "events",
        pa.table(
            {
                "event_id": pa.array(c[0], pa.int64()),
                "ts": pa.array(c[1], pa.timestamp("us")),
                "user_id": pa.array(c[2], pa.int64()),
                "event_type": list(c[3]),
                "value": list(c[4]),
                "props": list(c[5]),
            }
        ),
    )


def documents() -> None:
    texts = []
    # 1-word and 2-word docs (the round-3 bigram bug class)
    texts += ["alpha", "beta gamma", "x", "y z"]
    # exact duplicates
    texts += ["the quick brown fox jumps over the lazy dog again and again"] * 3
    # shared 8-token prefix, divergent tails
    base8 = "one two three four five six seven eight"
    texts += [f"{base8} tail{k} extra words here now" for k in range(4)]
    # heavy repetition (repetition-stats extremes)
    texts += ["spam " * 20, "a b " * 15]
    # Unicode hostility (round 8): multibyte accents/CJK/emoji (length()
    # must count codepoints identically on both engines), U+FFFD
    # replacement chars, NBSP, untrimmed whitespace, and double spaces
    # (split on ' ' yields EMPTY tokens — both engines must agree).
    texts += [
        "café naïve résumé über straße",
        "日本語 テスト 中文 文字",
        "emoji \U0001f600 test \U0001f680 rocket \U0001f9ea lab",
        "bad�byte repl�ced twice",
        "nbsp joined tokens here",
        "  leading and trailing  ",
        "double  space  tokens  inside",
    ]
    # One LONG document (2k tokens): shingle/token paths must stay O(n)
    # per doc and agree on the tail.
    texts += [" ".join(f"tok{i % 97}x{i}" for i in range(2000))]
    # pHash near-collision plants (r12 verdict: l7_phash_decoded_neardup
    # was a vacuous 0-rows-vs-0-rows green). The l7 fingerprint is the
    # first 60 bits of md5(text); these suffix pairs were found by an
    # offline 12M-candidate birthday search over "phash probe <i>" and
    # sit at Hamming 2 and 3 — at or under _PHASH_HAMMING=3, so the
    # 4x15-bit banded join MUST surface both pairs (md5 is stable, the
    # plant is deterministic). Texts are <64 bytes, so the prefix-64
    # variant (l7_phash_neardup) sees the same hashes.
    texts += [
        "phash probe 4858339",    # 346f47c0e737698
        "phash probe 6262094",    # 346f47c0e717498 (Hamming 2)
        "phash probe 617385",     # 7c5df76a18bec75
        "phash probe 10941074",   # 7c5df76a08b6d75 (Hamming 3)
    ]
    # ordinary filler to keep aggregates non-trivial
    texts += [
        " ".join(f"w{(i * 7 + j) % 23}" for j in range(10 + i % 13)) for i in range(40)
    ]
    langs = [["en", "pt", "es", "fr"][i % 4] for i in range(len(texts))]
    srcs = [["web", "chat", "docs"][i % 3] for i in range(len(texts))]
    _write(
        "documents",
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": texts,
                "lang": langs,
                "source": srcs,
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
    )


def embeddings() -> None:
    rng = np.random.RandomState(7)
    dim = 64
    vecs = []
    base = rng.randn(dim).astype(np.float32)
    for i in range(40):
        if i % 5 == 0:
            v = base + 0.01 * rng.randn(dim).astype(np.float32)  # near-parallel
        elif i % 5 == 1:
            v = -base + 0.01 * rng.randn(dim).astype(np.float32)  # near-antipodal
        else:
            v = rng.randn(dim).astype(np.float32)
        n = float(np.linalg.norm(v))
        vecs.append((v / max(n, 1e-3)).astype(np.float32))
    _write(
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(list(range(40)), pa.int64()),
                "embedding": pa.array([list(map(float, v)) for v in vecs], pa.list_(pa.float32())),
                "label": pa.array([i % 4 for i in range(40)], pa.int32()),
            }
        ),
    )


if __name__ == "__main__":
    region_nation()
    customer_supplier_part()
    orders_lineitem()
    events()
    documents()
    embeddings()
    print(f"adversarial fixture written to {OUT}")
