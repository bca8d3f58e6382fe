#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB correctness gate.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: read Spark's parquet result, run the
oracle SQL from oracle_sql.json in DuckDB against the sfDir parquet tables,
sort columns by name + rows by all values, and compare. NOT part of the
engine — developer tooling only (driver-side python is available per the
environment notes).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    failures = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(qdir):
            continue
        name = os.path.basename(qdir)
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            print(f"[FAIL] {name}: no spark output parquet")
            failures += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        if name not in oracles:
            ok = len(spark_df) > 0
            print(f"[{'ROWS' if ok else 'FAIL'}] {name}: no oracle, rows={len(spark_df)}")
            failures += 0 if ok else 1
            continue
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            failures += 1
            continue
        s, d = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"[FAIL] {name}: columns differ spark={list(s.columns)} duck={list(d.columns)}")
            failures += 1
            continue
        if len(s) != len(d):
            print(f"[FAIL] {name}: rowcount spark={len(s)} duck={len(d)}")
            failures += 1
            continue
        if [str(t) for t in s.dtypes] != [str(t) for t in d.dtypes]:
            print(f"[WARN] {name}: dtypes differ spark={list(s.dtypes)} duck={list(d.dtypes)}")
        try:
            eq = s.astype(object).where(pd.notnull(s), None).equals(
                d.astype(object).where(pd.notnull(d), None))
        except Exception:
            eq = False
        if eq:
            print(f"[OK]   {name}: {len(s)} rows match")
        else:
            diff = (s.astype(object).where(pd.notnull(s), None)
                    != d.astype(object).where(pd.notnull(d), None))
            bad = diff.any(axis=1)
            print(f"[FAIL] {name}: {bad.sum()}/{len(s)} rows differ; first:")
            idx = bad[bad].index[:3]
            for i in idx:
                print(f"  spark: {s.loc[i].to_dict()}")
                print(f"  duck : {d.loc[i].to_dict()}")
            failures += 1
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
