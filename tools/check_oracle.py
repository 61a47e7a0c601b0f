#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: reads Verify.scala output
parquet + oracle_sql.json, runs each oracle in DuckDB over the same sf dir,
and compares (columns sorted by name, rows sorted, values stringified).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    t = os.path.basename(p).removesuffix(".parquet")
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: None if v is None or (isinstance(v, float) and pd.isna(v)) else repr(v))
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)

fails = 0
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        continue
    spark_df = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{d}/*.parquet")],
                         ignore_index=True)
    if name not in oracle:
        print(f"[rows-only] {name}: {len(spark_df)} rows")
        continue
    try:
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"[FAIL-sql ] {name}: {e}")
        fails += 1
        continue
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        print(f"[FAIL-cols] {name}: spark={list(a.columns)} duck={list(b.columns)}")
        fails += 1
    elif len(a) != len(b):
        print(f"[FAIL-rows] {name}: spark={len(a)} duck={len(b)}")
        fails += 1
    elif not a.equals(b):
        neq = (a != b) & ~(a.isna() & b.isna())
        bad = neq.any(axis=1)
        print(f"[FAIL-vals] {name}: {bad.sum()}/{len(a)} rows differ; first:")
        idx = bad.idxmax()
        print("  spark:", a.loc[idx].to_dict())
        print("  duck :", b.loc[idx].to_dict())
        fails += 1
    else:
        print(f"[OK       ] {name}: {len(a)} rows")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
