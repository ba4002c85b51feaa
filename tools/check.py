#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare Verify.scala's
parquet dumps against the DuckDB oracle SQL, strictly (sorted cols+rows)."""
import duckdb, json, sys, glob, os

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
names = sorted([os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p)])
passed, failed, rows_only = [], [], []
for name in names:
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        failed.append((name, "no parquet written")); continue
    mine = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
    if name not in oracle:
        rows_only.append((name, len(mine))); continue
    try:
        ref = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        failed.append((name, f"oracle SQL error: {e}")); continue
    mine = mine.reindex(sorted(mine.columns), axis=1)
    ref = ref.reindex(sorted(ref.columns), axis=1)
    if list(mine.columns) != list(ref.columns):
        failed.append((name, f"cols differ: mine={list(mine.columns)} ref={list(ref.columns)}")); continue
    if len(mine) != len(ref):
        failed.append((name, f"rowcount differ: mine={len(mine)} ref={len(ref)}")); continue
    ms = mine.sort_values(by=list(mine.columns)).reset_index(drop=True)
    rs = ref.sort_values(by=list(ref.columns)).reset_index(drop=True)
    # dtype check (schema-ish)
    dt_diff = [(c, str(ms[c].dtype), str(rs[c].dtype)) for c in ms.columns
               if str(ms[c].dtype) != str(rs[c].dtype)]
    try:
        import pandas as pd
        eq = ms.equals(rs)
        if not eq:
            # find first differing cell
            diffs = []
            for c in ms.columns:
                neq = ~(ms[c].eq(rs[c]) | (ms[c].isna() & rs[c].isna()))
                if neq.any():
                    i = neq.idxmax()
                    diffs.append(f"{c}[row{i}]: mine={ms[c][i]!r} ref={rs[c][i]!r} (n={int(neq.sum())})")
            failed.append((name, f"values differ: {'; '.join(diffs[:3])}" +
                           (f" dtypes:{dt_diff}" if dt_diff else "")))
        elif dt_diff:
            failed.append((name, f"values OK but dtypes differ: {dt_diff}"))
        else:
            passed.append(name)
    except Exception as e:
        failed.append((name, f"compare error: {e}"))

print(f"PASS {len(passed)}: {' '.join(passed)}")
print(f"ROWS-ONLY {len(rows_only)}: {' '.join(f'{n}({r})' for n, r in rows_only)}")
print(f"FAIL {len(failed)}:")
for n, why in failed:
    print(f"  {n}: {why}")
sys.exit(1 if failed else 0)
