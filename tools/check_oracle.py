#!/usr/bin/env python3
"""Dev-only replica of the driver's correctness gate: run Verify output
against DuckDB oracles. Usage: check_oracle.py <sfdir> <verify_outdir>."""
import sys, json, glob, duckdb, pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize float-ish columns so -0.0 == 0.0 and dtypes don't matter
    for c in df.columns:
        if df[c].dtype.kind in "fc":
            df[c] = df[c].astype(float).round(6) + 0.0
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fails = 0
# a query that threw in Verify leaves no dump dir — that's an err row in
# the driver's gate, not a skip
dumped = {d.rstrip("/").split("/")[-1] for d in glob.glob(f"{outdir}/*/")}
for name in sorted(set(oracles) - dumped):
    print(f"[FAIL] {name}: no Verify dump (query threw?)"); fails += 1
for d in sorted(glob.glob(f"{outdir}/*/")):
    name = d.rstrip("/").split("/")[-1]
    try:
        got = canon(con.execute(
            f"SELECT * FROM read_parquet('{d}*.parquet')").df())
    except Exception as e:
        print(f"[FAIL] {name}: cannot read spark result: {e}"); fails += 1; continue
    if name not in oracles:
        print(f"[rows-only] {name}: {len(got)} rows" + (" EMPTY!" if len(got) == 0 else ""))
        if len(got) == 0: fails += 1
        continue
    try:
        exp = canon(con.execute(oracles[name]).df())
    except Exception as e:
        print(f"[FAIL] {name}: oracle sql error: {e}"); fails += 1; continue
    if list(got.columns) != list(exp.columns):
        print(f"[FAIL] {name}: schema {list(got.columns)} vs oracle {list(exp.columns)}"); fails += 1
    elif len(got) != len(exp):
        print(f"[FAIL] {name}: rows {len(got)} vs oracle {len(exp)}"); fails += 1
    elif not got.equals(exp):
        neq = (got != exp).any(axis=1)
        print(f"[FAIL] {name}: {neq.sum()} mismatched rows of {len(got)}")
        print(pd.concat([got[neq].head(3), exp[neq].head(3)], keys=["got", "exp"]))
        fails += 1
    else:
        print(f"[OK]   {name}: {len(got)} rows hash-match")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
