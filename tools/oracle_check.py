#!/usr/bin/env python3
"""Dev-only replica of the driver's t2 DuckDB-oracle gate.

Usage: python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_out

Reads each <outDir>/<name> parquet written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same testdata
parquet, and diffs: row count, column names, and exact values (after
sorting columns by name and rows by all columns). Reports per-column max
abs diff for floats so near-miss rounding problems are visible.

NOT part of the library — the Scala engine never depends on this.
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="first").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata is a single file; Spark-written replicas
        # (target/scale10) are directories of part files
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        if not glob.glob(p):
            continue
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            print(f"FAIL {name}: no spark output dir"); n_fail += 1; continue
        try:
            spark_df = pq.read_table(qdir).to_pandas()
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        s, d = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1; continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            n_fail += 1; continue
        bad = []
        for c in s.columns:
            a, b = s[c], d[c]
            # dtype drift (e.g. DuckDB HUGEINT -> pandas float64 vs Spark
            # int64) hashes differently in the driver even when every value
            # is equal — fail it here so it never reaches the driver
            if a.dtype.kind != b.dtype.kind:
                bad.append(f"{c}(dtype drift: spark={a.dtype} duck={b.dtype})")
                continue
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                a = a.astype(float); b = b.astype(float)
                eq = (a.isna() & b.isna()) | (a == b)
                if not eq.all():
                    md = float(np.nanmax(np.abs(a - b)))
                    bad.append(f"{c}(float, n_bad={int((~eq).sum())}, maxdiff={md:.3e})")
            else:
                av = a.astype(object).where(~a.isna(), None)
                bv = b.astype(object).where(~b.isna(), None)
                neq = [i for i, (x, y) in enumerate(zip(av, bv)) if x != y]
                if neq:
                    i = neq[0]
                    bad.append(f"{c}(n_bad={len(neq)}, first@{i}: {av[i]!r} vs {bv[i]!r})")
        if bad:
            print(f"FAIL {name}: {'; '.join(bad)}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
