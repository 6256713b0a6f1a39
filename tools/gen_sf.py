#!/usr/bin/env python
"""Generate an sf-scaled statistical twin of the driver's synthetic corpus
(TESTDATA.md tables) for LOCAL scale-curve measurement (VERDICT r13 task 1).

NOT byte-identical to the driver's data (its generator is not shipped) —
a distributional twin: every table reproduces the measured shapes of
/root/testdata/sf* (verified 2026-08-16 by DuckDB profiling):

- documents: n = max(500, 50000*sf); 30-word uniform vocab, doc length
  uniform(10, 100) tokens, 5% near-dup docs = copy of an earlier doc
  + ' dup' token; lang ~ (en .41, zh/es/fr .15, de .14); source src0-19.
- embeddings: n = max(500, 20000*sf); 64-dim unit-normalized gaussians,
  label uniform 0..9 (weak cluster structure, matching cos-to-centroid
  ~0.07 measured on the driver's data).
- events: n = 1M*sf over 30 days of Jan 2024, 15k*sf users uniform,
  5 uniform event types, value ~ Exponential(mean 50) rounded to 2dp
  (measured: mean 49.9, median 34.7 = 50*ln2), props = {"k": 0..99}.
- orders/lineitem: 1.5M*sf / 6M*sf; l_orderkey uniform over orders
  (distinct coverage 1-exp(-4) ~ 98.2%, matching 147236/150000),
  l_linenumber uniform 1..7, quantity uniform int 1..50, price uniform
  (900, 105000), discount/tax uniform 2dp, shipdate uniform and
  INDEPENDENT of orderdate (measured deltas span +-2400 days).
- customer/part/supplier/nation/region: TPC-H-ish dims at 150k/200k/10k
  per sf; part names adjective x noun (8x8), acctbal uniform(-1000,1e4).

Usage: python tools/gen_sf.py <sf> <outdir>
"""
import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
ADJ = ["large", "hot", "blue", "red", "small", "cold", "green", "dark"]
NOUN = ["ring", "bolt", "screw", "nut", "cap", "rod", "plate", "gear"]
PTYPE = ["ECONOMY", "MEDIUM", "SMALL", "PROMO", "LARGE", "STANDARD"]


def write(outdir, name, cols):
    pq.write_table(pa.table(cols), os.path.join(outdir, f"{name}.parquet"))


def gen(sf: float, outdir: str, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(outdir, exist_ok=True)

    # --- documents -------------------------------------------------------
    n_docs = max(500, int(50000 * sf))
    texts = []
    for i in range(n_docs):
        if i > 0 and rng.random() < 0.05:
            texts.append(texts[rng.integers(0, i)].split(" dup")[0] + " dup")
        else:
            k = rng.integers(10, 101)
            texts.append(" ".join(rng.choice(VOCAB, size=k)))
    lang = rng.choice(LANGS, size=n_docs, p=LANG_P)
    write(outdir, "documents", {
        "doc_id": np.arange(n_docs, dtype=np.int64),
        "text": texts,
        "lang": lang,
        "source": [f"src{i}" for i in rng.integers(0, 20, n_docs)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    })

    # --- embeddings ------------------------------------------------------
    n_vec = max(500, int(20000 * sf))
    E = rng.standard_normal((n_vec, 64)).astype(np.float32)
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    write(outdir, "embeddings", {
        "vec_id": np.arange(n_vec, dtype=np.int64),
        "embedding": pa.array(list(E), type=pa.list_(pa.float32())),
        "label": rng.integers(0, 10, n_vec).astype(np.int32),
    })

    # --- events ----------------------------------------------------------
    n_ev = max(1000, int(1_000_000 * sf))
    n_users = max(150, int(15000 * sf))
    base = np.datetime64("2024-01-01T00:00:00", "us")
    span = np.timedelta64(30 * 86400 * 1_000_000, "us")
    ts = np.sort(base + (rng.random(n_ev) * span.astype(np.int64)).astype(
        np.int64).astype("timedelta64[us]"))
    write(outdir, "events", {
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": ts,
        "user_id": rng.integers(0, n_users, n_ev).astype(np.int64),
        "event_type": rng.choice(
            ["signup", "purchase", "view", "click", "error"], n_ev),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
    })

    # --- dims ------------------------------------------------------------
    n_cust = max(150, int(150000 * sf))
    write(outdir, "customer", {
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": rng.choice(
            ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"],
            n_cust),
    })
    n_part = max(200, int(200000 * sf))
    write(outdir, "part", {
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": [f"{ADJ[rng.integers(0, 8)]} {NOUN[rng.integers(0, 8)]}"
                   for _ in range(n_part)],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": rng.choice(PTYPE, n_part),
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(
            900 + (np.arange(n_part) % 19001) * 0.1, 2),
    })
    n_supp = max(10, int(10000 * sf))
    write(outdir, "supplier", {
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    })
    write(outdir, "nation", {
        "n_nationkey": np.arange(25, dtype=np.int32),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": (np.arange(25) % 5).astype(np.int32),
    })
    write(outdir, "region", {
        "r_regionkey": np.arange(5, dtype=np.int32),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    })

    # --- orders / lineitem ----------------------------------------------
    n_ord = max(1500, int(1_500_000 * sf))
    day = np.timedelta64(86400 * 1_000_000, "us")
    obase = np.datetime64("1995-01-01T00:00:00", "us")
    write(outdir, "orders", {
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord).astype(np.int64),
        "o_orderstatus": rng.choice(["O", "P", "F"], n_ord),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": obase + rng.integers(0, 2405, n_ord) * day,
        "o_orderpriority": rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
            n_ord),
    })
    n_li = max(6000, int(6_000_000 * sf))
    write(outdir, "lineitem", {
        "l_orderkey": rng.integers(0, n_ord, n_li).astype(np.int64),
        "l_partkey": rng.integers(0, n_part, n_li).astype(np.int64),
        "l_suppkey": rng.integers(0, n_supp, n_li).astype(np.int64),
        "l_linenumber": rng.integers(1, 8, n_li).astype(np.int32),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
        "l_returnflag": rng.choice(["A", "N", "R"], n_li),
        "l_linestatus": rng.choice(["O", "F"], n_li),
        "l_shipdate": obase + rng.integers(1, 2500, n_li) * day,
    })


if __name__ == "__main__":
    sf = float(sys.argv[1])
    outdir = sys.argv[2]
    gen(sf, outdir)
    print(f"generated sf{sf} at {outdir}")
