"""Measurement-only synthetic data generator (optimization rounds).

The driver's scale-factor dirs under /root/testdata are read-only and the
driver-generated sf1.0 used for BENCH_r05 does not survive sandbox resets.
This script regenerates an sf-shaped dataset with the same schemas, row
counts (linear 10x per sf step), cardinalities and duplicate densities as
the driver's generator (statistically matched — NOT byte-identical), so
heavy queries can be A/B-measured at the driver's measurement scale.

Never writes into /root/testdata (TESTDATA.md: read-only). Output goes to
/root/tdgen/sf<sf>/ by default. Usage:

    python scripts/gen_sf.py 1.0 [outdir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
SEGMENTS = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_ADJ = ["large", "hot", "blue", "small", "red", "green", "cold", "dim"]
P_NOUN = ["ring", "bolt", "gear", "cap", "rod", "pin", "cog", "nut"]
P_TYPE = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO"]
EVENT_TYPES = ["signup", "purchase", "view", "click", "error"]


def _write(df: pd.DataFrame, outdir: str, name: str) -> None:
    path = os.path.join(outdir, f"{name}.parquet")
    for c in df.columns:  # Spark rejects TIMESTAMP(NANOS); match driver's us
        if str(df[c].dtype).startswith("datetime64[ns"):
            df[c] = df[c].astype("datetime64[us]")
    df.to_parquet(path, index=False)
    print(f"wrote {name}: {len(df)} rows")


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    outdir = sys.argv[2] if len(sys.argv) > 2 else f"/root/tdgen/sf{sys.argv[1] if len(sys.argv) > 1 else '1.0'}"
    assert not outdir.startswith("/root/testdata"), "testdata is read-only"
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(42)

    n_docs = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    n_events = int(1_000_000 * sf)
    n_li = int(6_000_000 * sf)
    n_orders = int(1_500_000 * sf)
    n_cust = int(150_000 * sf)
    n_part = int(200_000 * sf)
    n_supp = int(10_000 * sf)
    n_users = int(15_000 * sf)

    # --- documents: vocab-31 uniform words, U(10,100) words/doc, ~4.3% of
    # docs are near-dup variants of an earlier doc (+" dup"*k), src i%20,
    # lang multinomial — densities matched to /root/testdata/sf0.1.
    lens = rng.integers(10, 101, size=n_docs)
    words = np.array(VOCAB)
    texts: list[str] = []
    for i in range(n_docs):
        if i > 0 and rng.random() < 0.0435:
            base = texts[rng.integers(0, i)]
            k = int(rng.integers(1, 4))
            texts.append(base + " dup" * k)
        else:
            texts.append(" ".join(words[rng.integers(0, len(words), lens[i])]))
    docs = pd.DataFrame({
        "doc_id": np.arange(n_docs, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(LANGS, size=n_docs, p=LANG_P),
        "source": [f"src{i % 20}" for i in range(n_docs)],
    })
    docs["n_chars"] = docs.text.str.len().astype(np.int64)
    _write(docs, outdir, "documents")

    # --- embeddings: 64-dim unit vectors, label U(0,10)
    v = rng.standard_normal((n_emb, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    emb = pd.DataFrame({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": list(v),
        "label": rng.integers(0, 10, size=n_emb).astype(np.int32),
    })
    _write(emb, outdir, "embeddings")

    # --- events: ts-sorted uniform over 30 days
    ts = np.sort(rng.uniform(0, 30 * 86400, size=n_events))
    events = pd.DataFrame({
        "event_id": np.arange(n_events, dtype=np.int64),
        "ts": pd.Timestamp("2024-01-01") + pd.to_timedelta(ts, unit="s"),
        "user_id": rng.integers(0, n_users, size=n_events).astype(np.int64),
        "event_type": rng.choice(EVENT_TYPES, size=n_events),
        "value": np.round(rng.exponential(50, size=n_events), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, size=n_events)],
    })
    _write(events, outdir, "events")

    # --- TPC-H-ish star schema
    region = pd.DataFrame({
        "r_regionkey": np.arange(5, dtype=np.int32),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    })
    _write(region, outdir, "region")
    nation = pd.DataFrame({
        "n_nationkey": np.arange(25, dtype=np.int32),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": (np.arange(25) % 5).astype(np.int32),
    })
    _write(nation, outdir, "nation")
    cust = pd.DataFrame({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, size=n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, size=n_cust), 2),
        "c_mktsegment": rng.choice(SEGMENTS, size=n_cust),
    })
    _write(cust, outdir, "customer")
    supp = pd.DataFrame({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, size=n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, size=n_supp), 2),
    })
    _write(supp, outdir, "supplier")
    part = pd.DataFrame({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": [f"{P_ADJ[i % 8]} {P_NOUN[(i // 8) % 8]}" for i in range(n_part)],
        "p_brand": [f"Brand#{i % 25}" for i in rng.integers(0, 25, size=n_part)],
        "p_type": rng.choice(P_TYPE, size=n_part),
        "p_size": rng.integers(1, 51, size=n_part).astype(np.int32),
        "p_retailprice": np.round(900.0 + 0.1 * np.arange(n_part), 2),
    })
    _write(part, outdir, "part")
    odate = pd.Timestamp("1995-01-01") + pd.to_timedelta(
        rng.integers(0, 2404, size=n_orders), unit="D")
    orders = pd.DataFrame({
        "o_orderkey": np.arange(n_orders, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, size=n_orders).astype(np.int64),
        "o_orderstatus": rng.choice(["O", "F", "P"], size=n_orders),
        "o_totalprice": np.round(rng.uniform(1000, 500000, size=n_orders), 2),
        "o_orderdate": odate,
        "o_orderpriority": rng.choice(PRIORITIES, size=n_orders),
    })
    _write(orders, outdir, "orders")
    sdate = pd.Timestamp("1995-01-01") + pd.to_timedelta(
        rng.integers(0, 2500, size=n_li), unit="D")
    li = pd.DataFrame({
        "l_orderkey": rng.integers(0, n_orders, size=n_li).astype(np.int64),
        "l_partkey": rng.integers(0, n_part, size=n_li).astype(np.int64),
        "l_suppkey": rng.integers(0, n_supp, size=n_li).astype(np.int64),
        "l_linenumber": rng.integers(1, 8, size=n_li).astype(np.int32),
        "l_quantity": rng.integers(1, 51, size=n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, size=n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, size=n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, size=n_li) * 0.01, 2),
        "l_returnflag": rng.choice(["N", "R", "A"], size=n_li),
        "l_linestatus": rng.choice(["F", "O"], size=n_li),
        "l_shipdate": sdate,
    })
    _write(li, outdir, "lineitem")
    open(os.path.join(outdir, "_DONE"), "w").close()
    print(f"done: {outdir}")


if __name__ == "__main__":
    main()
