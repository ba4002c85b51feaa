#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run Verify output
against DuckDB oracles at a given SF dir. Usage:
  python3 tools/check.py <verifyOutDir> <sfDir> [only_query ...]
"""
import sys, os, json, glob
import duckdb
import pandas as pd

out_dir, sf_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fails = []
for qdir in sorted(glob.glob(f"{out_dir}/*/")):
    name = os.path.basename(qdir.rstrip("/"))
    if only and name not in only:
        continue
    spark_df = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{qdir}/*.parquet")]) \
        if glob.glob(f"{qdir}/*.parquet") else pd.DataFrame()
    if name not in oracle:
        print(f"{name}: rows-only ({len(spark_df)} rows)")
        continue
    try:
        ora_df = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE ERROR {e}")
        fails.append(name)
        continue
    a, b = canon(spark_df.copy()), canon(ora_df.copy())
    if list(a.columns) != list(b.columns):
        print(f"{name}: SCHEMA MISMATCH spark={list(a.columns)} oracle={list(b.columns)}")
        fails.append(name); continue
    if len(a) != len(b):
        print(f"{name}: ROWS MISMATCH spark={len(a)} oracle={len(b)}")
        fails.append(name); continue
    # numeric tolerance compare
    ok = True
    # driver-hash emulation: an integer column on one side vs float on the
    # other (e.g. DuckDB sum(BIGINT) -> HUGEINT -> float64) stringifies
    # differently ("123" vs "123.0") and fails the driver's value hash even
    # when numerically equal — flag it here so it can't pass locally.
    for c in a.columns:
        ai = pd.api.types.is_integer_dtype(a[c])
        bi = pd.api.types.is_integer_dtype(b[c])
        af = pd.api.types.is_float_dtype(a[c])
        bf = pd.api.types.is_float_dtype(b[c])
        if (ai and bf) or (af and bi):
            print(f"{name}: DTYPE MISMATCH col={c} spark={a[c].dtype} oracle={b[c].dtype}")
            ok = False
    if not ok:
        fails.append(name)
        continue
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
            import numpy as np
            if not np.allclose(a[c].astype(float).fillna(-9e99),
                               b[c].astype(float).fillna(-9e99), rtol=1e-9, atol=1e-9):
                ok = False
            # Driver-hash emulation: the driver compares EXACT stringified
            # values, so allclose-equal floats that stringify differently
            # (-0.0 vs 0.0, ULP flips at a round() boundary) still fail
            # the round gate. Flag them here so a local sweep can't pass
            # what the driver would redline (bit us in r8/r9 on dsir).
            elif not a[c].astype(str).equals(b[c].astype(str)):
                bad = a[c].astype(str) != b[c].astype(str)
                print(f"{name}: HASH MISMATCH col={c} "
                      f"({int(bad.sum())} rows stringify differently, e.g. "
                      f"{a[c][bad].astype(str).iloc[0]!r} vs "
                      f"{b[c][bad].astype(str).iloc[0]!r})")
                ok = False
        else:
            if not a[c].astype(str).equals(b[c].astype(str)):
                ok = False
        if not ok:
            break
    if ok:
        print(f"{name}: PASS ({len(a)} rows)")
    else:
        print(f"{name}: VALUE MISMATCH col={c}")
        print("  spark:", a.head(3).to_dict("records"))
        print("  oracle:", b.head(3).to_dict("records"))
        fails.append(name)

print(f"\n{'FAILED: ' + ', '.join(fails) if fails else 'ALL PASS'}")
sys.exit(1 if fails else 0)
