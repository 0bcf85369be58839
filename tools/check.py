#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]
Runs DuckDB on each oracle_sql.json entry (tables = parquet in sfDir,
registered under bare names) and compares row-count, sorted-column schema
and value-hash against the Spark parquet dumps in outDir.
"""
import sys, os, json, glob
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.sql(f"create view {name} as select * from '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = []
for q in sorted(oracle):
    spark_dir = f"{out}/{q}"
    if not os.path.isdir(spark_dir):
        print(f"{q:28s} MISSING spark output"); fails.append(q); continue
    try:
        od = con.sql(oracle[q]).df()
    except Exception as e:
        print(f"{q:28s} ORACLE ERROR: {e}"); fails.append(q); continue
    sd = con.sql(f"select * from '{spark_dir}/*.parquet'").df()
    od = od.reindex(sorted(od.columns), axis=1)
    sd = sd.reindex(sorted(sd.columns), axis=1)
    if list(od.columns) != list(sd.columns):
        print(f"{q:28s} SCHEMA MISMATCH oracle={list(od.columns)} spark={list(sd.columns)}")
        fails.append(q); continue
    if len(od) != len(sd):
        print(f"{q:28s} ROWS {len(od)} vs {len(sd)}"); fails.append(q); continue
    # order-insensitive exact compare
    oh = od.sort_values(list(od.columns)).reset_index(drop=True)
    sh = sd.sort_values(list(sd.columns)).reset_index(drop=True)
    same = oh.equals(sh)
    if not same:
        # find first diff
        diff = (oh != sh) & ~(oh.isna() & sh.isna())
        ndiff = int(diff.any(axis=1).sum())
        print(f"{q:28s} VALUE MISMATCH rows_differing={ndiff}")
        bad = diff.any(axis=1)
        print("  oracle:", oh[bad].head(3).to_dict("records"))
        print("  spark :", sh[bad].head(3).to_dict("records"))
        fails.append(q); continue
    print(f"{q:28s} OK rows={len(od)}")

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
