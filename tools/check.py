#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate.

Usage: python3 tools/check.py [sfdir] [outdir]
  1. expects graft.Verify to have been run:  sbt "runMain graft.Verify <sfdir> <outdir>"
  2. for each query: run oracle_sql.json[name] in DuckDB over the same
     parquet tables, load the Spark result parquet, sort columns by name,
     sort rows, and value-compare.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
# optional 3rd arg: comma-separated substrings to check (matches Verify's
# SPARK_GRAFT_VERIFY_FILTER contract)
if len(sys.argv) > 3:
    subs = [s for s in sys.argv[3].split(",") if s]
    oracle = {k: v for k, v in oracle.items() if any(s in k for s in subs)}

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails = []
for name, sql in sorted(oracle.items()):
    err_marker = f"{outdir}/{name}/_ERROR"
    if os.path.exists(err_marker):
        with open(err_marker) as f:
            msg = f.read().strip()[:200]
        # marker mtime shown so a STALE marker (filtered re-run that
        # skipped this query, leaving a previous full run's crash) is
        # visible at a glance
        import datetime
        mt = datetime.datetime.fromtimestamp(
            os.path.getmtime(err_marker)).strftime("%H:%M:%S")
        fails.append((name, f"query crashed: {msg}"))
        print(f"CRASH {name} (marker {mt}): {msg}")
        continue
    spark_files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not spark_files:
        fails.append((name, "no spark output")); print(f"MISS  {name}"); continue
    try:
        sp = norm(pd.concat([pd.read_parquet(f) for f in spark_files]))
        du = norm(con.sql(sql).df())
    except Exception as e:
        fails.append((name, f"error: {e}")); print(f"ERR   {name}: {e}"); continue
    ok_shape = list(sp.columns) == list(du.columns) and len(sp) == len(du)
    if not ok_shape:
        fails.append((name, f"shape spark={sp.shape}/{list(sp.columns)} duck={du.shape}/{list(du.columns)}"))
        print(f"SHAPE {name}: spark={sp.shape} duck={du.shape}")
        continue
    # dtype-KIND check: the driver hashes string reprs, so an integer
    # column on one side vs float on the other ("6277" vs "6277.0")
    # hash-mismatches even when values are equal — exactly how the
    # r3 q76/q77 HUGEINT bug slipped past the old float-tolerant compare.
    def kind(s):
        if pd.api.types.is_float_dtype(s): return "float"
        if pd.api.types.is_integer_dtype(s): return "int"
        if pd.api.types.is_bool_dtype(s): return "bool"
        return "obj"
    kind_diff = [(c, kind(sp[c]), kind(du[c]))
                 for c in sp.columns if kind(sp[c]) != kind(du[c])]
    if kind_diff:
        fails.append((name, f"dtype kind diff {kind_diff}"))
        print(f"KIND  {name}: {kind_diff} (driver hash would mismatch)")
        continue
    # exact value compare after normalizing dtypes to strings
    diff_cols = []
    for c in sp.columns:
        a, b = sp[c], du[c]
        try:
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                eq = (a.astype(float).fillna(1e308) == b.astype(float).fillna(1e308)).all()
            else:
                eq = (a.astype(str) == b.astype(str)).all()
        except Exception:
            eq = (a.astype(str) == b.astype(str)).all()
        if not eq:
            diff_cols.append(c)
    if diff_cols:
        fails.append((name, f"value diff in {diff_cols}"))
        print(f"DIFF  {name}: {diff_cols}")
        for c in diff_cols[:2]:
            m = sp[c].astype(str) != du[c].astype(str)
            print("  spark:", sp[m][c].head(3).tolist())
            print("  duck :", du[m][c].head(3).tolist())
    else:
        print(f"OK    {name} ({len(sp)} rows)")

print(f"\n{len(oracle)-len(fails)}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
