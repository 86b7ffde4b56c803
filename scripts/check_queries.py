#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness compare for a
subset of queries: run Verify first (or pass --dump to run it), then
compare each <out>/<name> parquet against the oracle SQL at sfDir.

Usage: python3 scripts/check_queries.py <sfDir> <outDir> [name ...]
"""
import json, sys, glob
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> tuple:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    # hash on rounded repr to mirror float tolerance-free compare
    return (tuple(df.columns), pd.util.hash_pandas_object(
        df.astype(str), index=False).sum())

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if not names:
        names = sorted(oracle)
    tables = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]
    fails = 0
    for name in names:
        if name not in oracle:
            print(f"{name}: NO ORACLE (rows-only)")
            continue
        con = duckdb.connect()
        for t in tables:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        want = con.execute(oracle[name]).df()
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files])
        sw, sg = canon(want), canon(got)
        rows = len(want) == len(got)
        schema = sw[0] == sg[0]
        h = sw[1] == sg[1]
        status = "OK" if (rows and schema and h) else "FAIL"
        if status == "FAIL":
            fails += 1
        print(f"{name}: {status} rows={len(got)}/{len(want)} "
              f"schema={schema} hash={h}")
        if not schema:
            print(f"  spark cols: {sg[0]}\n  oracle cols: {sw[0]}")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
