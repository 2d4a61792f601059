#!/usr/bin/env python3
"""Dev oracle compare: python3 /tmp/compare.py <sfDir> <outDir> [names...]
Mimics the driver: sorts columns by name, rows by values, exact compare."""
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
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].map(lambda x: isinstance(x, (np.ndarray, list))).any():
            df[c] = df[c].map(
                lambda x: tuple(x) if isinstance(x, (np.ndarray, list)) else x)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails = 0
for name in (names or sorted(oracle.keys())):
    if name not in oracle:
        print(f"{name}: NO ORACLE"); continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"{name}: NO SPARK OUTPUT"); fails += 1; continue
    sp = canon(pd.concat([pd.read_parquet(f) for f in files]))
    try:
        du = canon(con.execute(oracle[name]).df())
    except Exception as e:
        print(f"{name}: ORACLE ERROR {e}"); fails += 1; continue
    ok_schema = list(sp.columns) == list(du.columns)
    ok_rows = len(sp) == len(du)
    ok_vals = False
    if ok_schema and ok_rows:
        try:
            sp2 = sp.astype(object).where(pd.notnull(sp), None)
            du2 = du.astype(object).where(pd.notnull(du), None)
            ok_vals = True
            for c in sp.columns:
                a, b = sp2[c].tolist(), du2[c].tolist()
                for x, y in zip(a, b):
                    if isinstance(x, np.ndarray): x = x.tolist()
                    if isinstance(y, np.ndarray): y = y.tolist()
                    if x != y:
                        ok_vals = False
                        print(f"  first diff col={c}: spark={x!r} duck={y!r}")
                        break
                if not ok_vals: break
        except Exception as e:
            print(f"  compare error: {e}")
    status = "PASS" if (ok_schema and ok_rows and ok_vals) else \
        f"FAIL schema={ok_schema} rows={len(sp)}/{len(du)} vals={ok_vals}"
    if not (ok_schema and ok_rows and ok_vals):
        fails += 1
        if not ok_schema:
            print(f"  spark cols={list(sp.columns)} duck cols={list(du.columns)}")
    print(f"{name}: {status}")
sys.exit(1 if fails else 0)
