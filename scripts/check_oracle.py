#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query result
parquet written by graft.Verify, run the corresponding oracle SQL in DuckDB
over the same sf tables and compare row count, schema (column names), and a
hash of rounded values. Usage: check_oracle.py <sfDir> <verifyOut>"""
import sys, json, glob, os, hashlib
import duckdb, pandas as pd, numpy as np

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    # normalize: round floats, stringify
    rows = []
    for _, r in df.iterrows():
        vals = []
        for v in r:
            if isinstance(v, (float, np.floating)):
                vals.append(f"{round(float(v), 4):.4f}")
            elif isinstance(v, (np.integer,)):
                vals.append(str(int(v)))
            elif isinstance(v, (list, np.ndarray)):
                vals.append(str(list(v)))
            else:
                vals.append(str(v))
        rows.append("|".join(vals))
    rows.sort()
    return len(df), list(df.columns), hashlib.md5("\n".join(rows).encode()).hexdigest()

fails = 0
# iterate over the UNION of declared oracle keys and result dirs, so a query
# that crashed inside graft.Verify (no parquet dir) counts as a failure
# instead of being silently skipped
result_dirs = {n for n in os.listdir(out) if os.path.isdir(f"{out}/{n}")}
for name in sorted(result_dirs | set(oracle.keys())):
    d = f"{out}/{name}"
    if name not in result_dirs:
        print(f"{name}: MISSING RESULT (query failed in graft.Verify)")
        fails += 1
        continue
    got = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{d}/*.parquet")]) if glob.glob(f"{d}/*.parquet") else pd.DataFrame()
    if name not in oracle:
        print(f"{name}: rows={len(got)} (rows-only check: {'OK' if len(got)>0 else 'EMPTY!'})")
        if len(got) == 0: fails += 1
        continue
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}")
        fails += 1
        continue
    ng, cg, hg = canon(got)
    ne, ce, he = canon(exp)
    ok = (ng, cg, hg) == (ne, ce, he)
    if not ok: fails += 1
    print(f"{name}: {'MATCH' if ok else 'MISMATCH'} rows {ng}/{ne} cols {cg}/{ce} hash {'==' if hg==he else f'{hg[:8]}!={he[:8]}'}")
print(f"\n{'ALL OK' if fails==0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
