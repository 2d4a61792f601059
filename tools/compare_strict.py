#!/usr/bin/env python3
"""STRICT dev oracle compare — replicates the DRIVER's harness semantics
exactly, unlike compare.py which tuple-izes array cells before sorting
(and therefore passes queries the driver would record as `err`).

The driver sorts columns by name, then `sort_values` over all columns
with no preprocessing: an array/ndarray cell raises TypeError there, so
this script treats any such cell as a hard FAIL for the query.

Usage: python3 tools/compare_strict.py <sfDir> <outDir> [names...]
"""
import sys, json, glob
import duckdb, pandas as pd, numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
names = sys.argv[3:]
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
con = duckdb.connect()
for tbl in ["region","nation","customer","supplier","part","orders",
            "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{sfdir}/{tbl}.parquet'")

def canon(df):
    # EXACT driver shape: column-name sort then raw sort_values
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails = 0
for name in (names or sorted(oracle.keys())):
    if name not in oracle:
        print(f"{name}: NO ORACLE"); continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"{name}: NO SPARK OUTPUT"); fails += 1; continue
    try:
        sp = canon(pd.concat([pd.read_parquet(f) for f in files]))
    except Exception as e:
        print(f"{name}: SPARK SORT/READ ERROR {type(e).__name__}: {e}")
        fails += 1; continue
    try:
        du = canon(con.execute(oracle[name]).df())
    except Exception as e:
        print(f"{name}: ORACLE ERROR {type(e).__name__}: {e}")
        fails += 1; continue
    ok_schema = list(sp.columns) == list(du.columns)
    ok_rows = len(sp) == len(du)
    ok_vals = False
    if ok_schema and ok_rows:
        sp2 = sp.astype(object).where(pd.notnull(sp), None)
        du2 = du.astype(object).where(pd.notnull(du), None)
        ok_vals = True
        for c in sp.columns:
            for x, y in zip(sp2[c].tolist(), du2[c].tolist()):
                if isinstance(x, np.ndarray) or isinstance(y, np.ndarray):
                    ok_vals = False
                    print(f"  ARRAY CELL col={c} — driver would die here")
                    break
                if x != y:
                    ok_vals = False
                    print(f"  first diff col={c}: spark={x!r} duck={y!r}")
                    break
            if not ok_vals: break
    status = "PASS" if (ok_schema and ok_rows and ok_vals) else \
        f"FAIL schema={ok_schema} rows={len(sp)}/{len(du)} vals={ok_vals}"
    if not (ok_schema and ok_rows and ok_vals):
        fails += 1
        if not ok_schema:
            print(f"  spark cols={list(sp.columns)} duck cols={list(du.columns)}")
    print(f"{name}: {status}")
print(f"\n{'ALL PASS' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
