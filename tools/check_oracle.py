#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sf_dir> <verify_out_dir>

For each query result parquet under <verify_out_dir>, runs the matching
oracle SQL from oracle_sql.json in DuckDB over views of the sf tables,
sorts columns by name, sorts rows, and compares values exactly.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"  {name}: NO OUTPUT"); n_fail += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in files])
        if name not in oracle:
            status = "rows-only " + ("PASS" if len(got) > 0 else "FAIL(empty)")
            print(f"  {name}: {status} ({len(got)} rows)")
            n_pass += len(got) > 0; n_fail += len(got) == 0
            continue
        want = con.sql(oracle[name]).df()
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"  {name}: SCHEMA MISMATCH got={list(g.columns)} want={list(w.columns)}")
            n_fail += 1; continue
        if len(g) != len(w):
            print(f"  {name}: ROWCOUNT MISMATCH got={len(g)} want={len(w)}")
            n_fail += 1; continue
        try:
            gv, wv = g.astype(str).values, w.astype(str).values
            bad = (gv != wv)
            if bad.any():
                i, j = next(zip(*bad.nonzero()))
                print(f"  {name}: VALUE MISMATCH at row {i} col {g.columns[j]}: "
                      f"got={gv[i, j]} want={wv[i, j]}")
                n_fail += 1; continue
        except Exception as e:
            print(f"  {name}: COMPARE ERROR {e}"); n_fail += 1; continue
        print(f"  {name}: PASS ({len(g)} rows)")
        n_pass += 1
    print(f"{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
