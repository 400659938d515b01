#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
Reads each <outDir>/<name>/ parquet (Spark output), runs the matching SQL
from <outDir>/oracle_sql.json in DuckDB with the sf tables registered, and
compares values exactly (columns sorted by name, like the driver).
"""
import json, os, sys
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
n_pass = n_fail = n_skip = 0
# a crashed query has NO result dir (Verify deletes stale output on
# failure) — walk the declared manifest, not just what exists, so a
# missing result is a FAIL instead of silently absent from the report
declared = []
manifest = f"{out_dir}/queries.json"
if os.path.exists(manifest):
    declared = json.load(open(manifest))
present = sorted(n for n in os.listdir(out_dir)
                 if os.path.isdir(os.path.join(out_dir, n)))
for name in sorted(set(declared) - set(present)):
    print(f"FAIL {name}: no result written (query crashed in Verify?)")
    n_fail += 1
# the reverse direction too: a result dir for a query no longer declared
# is stale output from a prior run (renamed/deleted query) — counting it
# as PASS/SKIP would inflate the report with dead queries
if declared:
    for name in sorted(set(present) - set(declared)):
        print(f"FAIL {name}: result dir exists but query is not declared (stale outDir?)")
        n_fail += 1
    present = [n for n in present if n in set(declared)]
for name in present:
    d = os.path.join(out_dir, name)
    spark_df = pd.read_parquet(d)
    spark_df = spark_df.reindex(sorted(spark_df.columns), axis=1)
    if name not in oracles:
        print(f"SKIP {name}: no oracle, rows={len(spark_df)}")
        n_skip += 1
        continue
    try:
        duck_df = con.execute(oracles[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}")
        n_fail += 1
        continue
    duck_df = duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(spark_df.columns) != list(duck_df.columns):
        print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
        n_fail += 1
        continue
    if len(spark_df) != len(duck_df):
        print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
        n_fail += 1
        continue
    ok = True
    for c in spark_df.columns:
        a, b = spark_df[c], duck_df[c]
        try:
            same = (a.astype(str).values == b.astype(str).values).all()
        except Exception:
            same = False
        if not same:
            ok = False
            mism = (a.astype(str).values != b.astype(str).values)
            idx = mism.argmax()
            print(f"FAIL {name}: col {c} row {idx}: spark={a.iloc[idx]!r} duck={b.iloc[idx]!r} "
                  f"(dtypes {a.dtype}/{b.dtype}, {mism.sum()} mismatches)")
            break
    if ok:
        print(f"PASS {name} ({len(spark_df)} rows)")
        n_pass += 1
    else:
        n_fail += 1
print(f"== {n_pass} pass, {n_fail} fail, {n_skip} skip (rows-only)")
sys.exit(1 if n_fail else 0)
