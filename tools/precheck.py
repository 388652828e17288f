#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/precheck.py <sfDir> <verifyOutDir>

For each query dir in verifyOutDir: load the Spark parquet result and
run the oracle SQL (oracle_sql.json) in DuckDB over the sfDir tables;
sort columns by name, sort rows, compare values exactly (floats with
== — the point is to catch engine divergence before the driver does).
This is builder-side tooling only; the shipped library has no Python.
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    # unify dtypes for compare: timestamps → ns, ints → int64
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif str(df[c].dtype) in ("int32", "Int32", "int16", "Int64"):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    failures = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "q*"))):
        qname = os.path.basename(qdir)
        parts = glob.glob(os.path.join(qdir, "*.parquet"))
        if not parts:
            print(f"{qname}: NO SPARK OUTPUT")
            failures += 1
            continue
        spark_df = pd.concat([pd.read_parquet(pp) for pp in parts], ignore_index=True)
        if qname not in oracles:
            print(f"{qname}: rows-only ({len(spark_df)} rows)")
            if len(spark_df) == 0:
                print(f"  WARNING: zero rows")
            continue
        try:
            duck_df = con.execute(oracles[qname]).df()
        except Exception as e:
            print(f"{qname}: ORACLE SQL ERROR: {e}")
            failures += 1
            continue
        s, d = normalize(spark_df), normalize(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"{qname}: COLUMN MISMATCH spark={list(s.columns)} duck={list(d.columns)}")
            failures += 1
            continue
        if len(s) != len(d):
            print(f"{qname}: ROWCOUNT MISMATCH spark={len(s)} duck={len(d)}")
            failures += 1
            continue
        diff_cols = []
        for c in s.columns:
            a, b = s[c], d[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                eq = (a.fillna(-9e99) == b.fillna(-9e99))
            else:
                eq = (a.astype(str) == b.astype(str))
            if not eq.all():
                bad = (~eq).idxmax()
                diff_cols.append((c, a.iloc[bad], b.iloc[bad]))
        if diff_cols:
            print(f"{qname}: VALUE MISMATCH {diff_cols[:3]}")
            failures += 1
        else:
            print(f"{qname}: OK ({len(s)} rows)")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
