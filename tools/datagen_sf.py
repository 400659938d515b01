#!/usr/bin/env python3
"""Generate an sf1-scale (10x sf0.1) synthetic dataset with the SAME
schemas and value distributions as the driver's /root/testdata tables
(TESTDATA.md), for local above-gate-scale parity sweeps (r5 verdict
next-round #1). The gate is self-consistent — Verify dumps Spark
results over these parquet files and check.py runs the oracle SQL in
DuckDB over the SAME files — so the data need not be byte-identical to
the driver's generator, only schema- and distribution-faithful.

Usage: python3 tools/datagen_sf.py [scale] [outdir]
  scale   multiplier vs sf0.1 (default 10 -> "sf1")
  outdir  default target/testdata/sf1

Never writes outside the repo. Deterministic (seed 42).
"""
import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SCALE = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else "target/testdata/sf1"
os.makedirs(OUT, exist_ok=True)
rng = np.random.default_rng(42)


def write(name, table):
    pq.write_table(table, f"{OUT}/{name}.parquet")
    print(f"[datagen] {name}: {table.num_rows} rows")


# --- region / nation (fixed small dims, same content as the driver) ---
write("region", pa.table({
    "r_regionkey": pa.array(range(5), pa.int32()),
    "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
}))
write("nation", pa.table({
    "n_nationkey": pa.array(range(25), pa.int32()),
    "n_name": [f"NATION_{i}" for i in range(25)],
    "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
}))

# --- customer ---
NC = 15000 * SCALE
write("customer", pa.table({
    "c_custkey": pa.array(range(NC), pa.int64()),
    "c_name": [f"Customer#{i:09d}" for i in range(NC)],
    "c_nationkey": pa.array(rng.integers(0, 25, NC), pa.int32()),
    "c_acctbal": np.round(rng.uniform(-1000, 10000, NC), 2),
    "c_mktsegment": np.array(
        ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    )[rng.integers(0, 5, NC)],
}))

# --- supplier ---
NS = 1000 * SCALE
write("supplier", pa.table({
    "s_suppkey": pa.array(range(NS), pa.int64()),
    "s_name": [f"Supplier#{i:09d}" for i in range(NS)],
    "s_nationkey": pa.array(rng.integers(0, 25, NS), pa.int32()),
    "s_acctbal": np.round(rng.uniform(-1000, 10000, NS), 2),
}))

# --- part ---
NP = 20000 * SCALE
ADJ = ["large", "hot", "blue", "old", "cold", "small", "red", "green",
       "new", "dark"]
NOUN = ["ring", "bolt", "plate", "screw", "gear", "wheel", "pipe", "rod"]
write("part", pa.table({
    "p_partkey": pa.array(range(NP), pa.int64()),
    "p_name": [f"{ADJ[i % 10]} {NOUN[(i // 10) % 8]}" for i in range(NP)],
    "p_brand": [f"Brand#{int(b)}" for b in rng.integers(1, 26, NP)],
    "p_type": np.array(["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM",
                        "PROMO"])[rng.integers(0, 6, NP)],
    "p_size": pa.array(rng.integers(1, 51, NP), pa.int32()),
    "p_retailprice": np.round(900.0 + 0.1 * (np.arange(NP) % 10000), 2),
}))

# --- orders (dates are midnight-truncated ms timestamps, 1995..2001-08) ---
NO = 150000 * SCALE
DAY_MS = 86400000
d0 = np.datetime64("1995-01-01").astype("datetime64[ms]").astype(np.int64)
d1 = np.datetime64("2001-08-02").astype("datetime64[ms]").astype(np.int64)
odate = (d0 + rng.integers(0, (d1 - d0) // DAY_MS, NO) * DAY_MS)
write("orders", pa.table({
    "o_orderkey": pa.array(range(NO), pa.int64()),
    "o_custkey": pa.array(rng.integers(0, NC, NO), pa.int64()),
    "o_orderstatus": np.array(["O", "P", "F"])[rng.integers(0, 3, NO)],
    "o_totalprice": np.round(rng.uniform(1000, 500000, NO), 2),
    "o_orderdate": pa.array(odate, pa.timestamp("ms")),
    "o_orderpriority": np.array(
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    )[rng.integers(0, 5, NO)],
}))

# --- lineitem (orderkeys drawn with replacement; linenumber = running
#     count within order, matching the driver's 1..~7 range) ---
NL = 600000 * SCALE
lok = np.sort(rng.integers(0, NO, NL))
# cumcount within equal runs of the sorted orderkeys
starts = np.r_[0, np.flatnonzero(np.diff(lok)) + 1]
linenum = (np.arange(NL) - np.repeat(starts, np.diff(np.r_[starts, NL])) + 1)
sdate = (d0 + rng.integers(0, (d1 - d0) // DAY_MS, NL) * DAY_MS)
write("lineitem", pa.table({
    "l_orderkey": pa.array(lok, pa.int64()),
    "l_partkey": pa.array(rng.integers(0, NP, NL), pa.int64()),
    "l_suppkey": pa.array(rng.integers(0, NS, NL), pa.int64()),
    "l_linenumber": pa.array(linenum, pa.int32()),
    "l_quantity": rng.integers(1, 51, NL).astype(np.float64),
    "l_extendedprice": np.round(rng.uniform(900, 105000, NL), 2),
    "l_discount": np.round(rng.integers(0, 11, NL) * 0.01, 2),
    "l_tax": np.round(rng.integers(0, 9, NL) * 0.01, 2),
    "l_returnflag": np.array(["R", "N", "A"])[rng.integers(0, 3, NL)],
    "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, NL)],
    "l_shipdate": pa.array(sdate, pa.timestamp("ms")),
}))

# --- events (TIMESTAMP(NANOS) on purpose — the driver's table carries
#     nanos and graft.core.Tables handles the legacy read path) ---
NE = 100000 * SCALE
t0 = np.datetime64("2024-01-01").astype("datetime64[ns]").astype(np.int64)
gaps = rng.integers(1, 2 * 30 * 86400 * 10**9 // NE, NE)  # ~30-day span
ts = t0 + np.cumsum(gaps)
write("events", pa.table({
    "event_id": pa.array(range(NE), pa.int64()),
    "ts": pa.array(ts, pa.timestamp("ns")),
    "user_id": pa.array(rng.integers(0, 1500 * SCALE, NE), pa.int64()),
    "event_type": np.array(["click", "view", "purchase", "signup", "error"]
                           )[rng.integers(0, 5, NE)],
    "value": np.round(rng.gamma(1.2, 60, NE), 2),
    "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, NE)],
}))

# --- documents (30-word vocab like the driver's; en 2x the other langs;
#     planted exact dups and near-dups carrying the "dup" marker token) ---
ND = 5000 * SCALE
VOCAB = ["spark", "window", "merge", "table", "column", "vector", "stream",
         "value", "data", "small", "join", "filter", "big", "group", "hash",
         "customer", "sort", "order", "slow", "line", "part", "fast", "the",
         "row", "agg", "key", "query", "a", "scan", "batch"]
LANGS = np.array(["en", "en", "de", "es", "fr", "zh"])
texts = []
for i in range(ND):
    n_words = int(rng.integers(8, 70))
    texts.append(" ".join(np.array(VOCAB)[rng.integers(0, 30, n_words)]))
# ~0.2% exact dup pairs + ~0.5% near-dups (one word appended)
for _ in range(ND // 500):
    a, b = rng.integers(0, ND, 2)
    texts[b] = texts[a]
for _ in range(ND // 200):
    a, b = rng.integers(0, ND, 2)
    texts[b] = texts[a] + " dup"
write("documents", pa.table({
    "doc_id": pa.array(range(ND), pa.int64()),
    "text": texts,
    "lang": LANGS[rng.integers(0, 6, ND)],
    "source": [f"src{int(s)}" for s in rng.integers(0, 20, ND)],
    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
}))

# --- embeddings (64-dim float32 in 10 label clusters, values ~±0.33) ---
NV = 2000 * SCALE
labels = rng.integers(0, 10, NV)
centers = rng.uniform(-0.25, 0.25, (10, 64))
emb = (centers[labels] + rng.uniform(-0.09, 0.09, (NV, 64))).astype(np.float32)
write("embeddings", pa.table({
    "vec_id": pa.array(range(NV), pa.int64()),
    "embedding": pa.array(list(emb), pa.list_(pa.float32())),
    "label": pa.array(labels, pa.int32()),
}))

print(f"[datagen] done -> {OUT}")
