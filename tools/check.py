#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <out>/<name> parquet written by graft.Verify, runs the
corresponding oracle SQL (from <out>/oracle_sql.json) in DuckDB with the
sfDir parquet tables registered under their bare names, then compares:
column names (sorted), row count, and a hash of the value matrix with
columns sorted by name and rows sorted.
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import math
from decimal import Decimal

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, Decimal):
        return str(v.normalize())
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == 'ndarray':
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def canon(df: pd.DataFrame):
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    rows.sort()
    return cols, rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noracle = 0
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        spark_df = pq.read_table(files[0]).to_pandas()
        if name not in oracles:
            print(f"NOORACLE {name}: rows={len(spark_df)}"); n_noracle += 1; continue
        try:
            oracle_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        sc, sr = canon(spark_df)
        oc, orows = canon(oracle_df)
        if sc != oc:
            print(f"FAIL {name}: columns spark={sc} oracle={oc}"); n_fail += 1; continue
        if len(sr) != len(orows):
            print(f"FAIL {name}: rows spark={len(sr)} oracle={len(orows)}"); n_fail += 1; continue
        if sr != orows:
            bad = [(a, b) for a, b in zip(sr, orows) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}"); n_fail += 1; continue
        print(f"PASS {name}: rows={len(sr)}"); n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_noracle} no-oracle ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
