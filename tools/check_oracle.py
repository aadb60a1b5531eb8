#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query with an oracleSql entry: run the SQL in DuckDB (tables
registered as views over <sfDir>/*.parquet), read the Spark result parquet,
sort columns by name, sort rows, and compare values exactly.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = norm(con.execute(sql).fetchdf())
            got = norm(con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            n_bad += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            n_bad += 1
            continue
        diff_cols = []
        for c in exp.columns:
            ev, gv = exp[c], got[c]
            # No pandas .equals short-circuit: numpy treats -0.0 == 0.0,
            # but the driver hashes string reprs, where they differ. Always
            # compare astype(str) so the local gate matches the driver's
            # (stricter) semantics for repr-level divergence.
            neq = (ev.astype(str) != gv.astype(str))
            if neq.any():
                i = neq.idxmax()
                diff_cols.append((c, int(neq.sum()), ev[i], gv[i]))
        if diff_cols:
            print(f"FAIL {name}: value diffs {diff_cols[:3]}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(exp)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} fail, "
          f"{len(oracle)} oracled / {len(TABLES)} tables")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
