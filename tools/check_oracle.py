#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate: compare each
SparkEntry query's parquet output (written by graft.Verify) against its
DuckDB oracle SQL, column-name-sorted and row-sorted, exact values.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
(run `SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify <sfDir> <out>"` first)
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load_spark(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)

def normalize(df):
    df = df[sorted(df.columns)]
    # canonicalize dtypes for compare
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, t + ".parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    ok = fail = 0
    for name, sql in sorted(oracles.items()):
        got = load_spark(outdir, name)
        if got is None:
            print(f"MISSING OUTPUT {name}")
            fail += 1
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"ORACLE ERROR {name}: {e}")
            fail += 1
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"COLUMNS DIFFER {name}: spark={list(g.columns)} duck={list(w.columns)}")
            fail += 1
            continue
        if len(g) != len(w):
            print(f"ROWCOUNT DIFFERS {name}: spark={len(g)} duck={len(w)}")
            fail += 1
            continue
        mismatch_cols = []
        for c in g.columns:
            a, b = g[c].values, w[c].values
            if np.issubdtype(g[c].dtype, np.floating) or np.issubdtype(w[c].dtype, np.floating):
                eq = np.array_equal(a.astype(float), b.astype(float), equal_nan=True)
            else:
                eq = (g[c].astype(str).values == w[c].astype(str).values).all()
            if not eq:
                mismatch_cols.append(c)
        if mismatch_cols:
            print(f"VALUES DIFFER {name}: cols={mismatch_cols}")
            for c in mismatch_cols[:2]:
                diff = g[c].astype(str).values != w[c].astype(str).values
                idx = np.nonzero(diff)[0][:3] if diff.any() else []
                for i in idx:
                    print(f"   row{i} {c}: spark={g[c].values[i]!r} duck={w[c].values[i]!r}")
            fail += 1
        else:
            print(f"OK {name} ({len(g)} rows)")
            ok += 1
    # rows-only queries (no oracle)
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracle_names = set(json.load(f).keys())
    for d in sorted(os.listdir(outdir)):
        full = os.path.join(outdir, d)
        if os.path.isdir(full) and d not in oracle_names:
            df = load_spark(outdir, d)
            n = 0 if df is None else len(df)
            print(f"ROWS-ONLY {d}: {n} rows" + (" (EMPTY!)" if n == 0 else ""))
    print(f"\n{ok} ok, {fail} failed")
    sys.exit(1 if fail else 0)

if __name__ == "__main__":
    main()
