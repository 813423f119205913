#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify first
(writes <outDir>/<query>.parquet + oracle_sql.json), then this script runs
each oracle SQL in DuckDB against the same sf tables and diffs the results
(column-name-sorted, row-sorted, exact values).

Usage: python3 tools/check_oracles.py <sfDir> <verifyOutDir>
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def values_equal(a, b):
    if a is b:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        return a == b
    except Exception:
        return str(a) == str(b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        spark_path = f"{out_dir}/{name}"
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output at {spark_path}")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM parquet_scan('{spark_path}/*.parquet')").df()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        got_n, want_n = norm(got), norm(want)
        if list(got_n.columns) != list(want_n.columns):
            print(f"FAIL {name}: columns {list(got_n.columns)} != {list(want_n.columns)}")
            n_fail += 1
            continue
        if len(got_n) != len(want_n):
            print(f"FAIL {name}: rows {len(got_n)} != {len(want_n)}")
            n_fail += 1
            continue
        bad = []
        for col in got_n.columns:
            ga, wa = got_n[col].tolist(), want_n[col].tolist()
            for i, (a, b) in enumerate(zip(ga, wa)):
                if not values_equal(a, b):
                    bad.append((col, i, a, b))
                    if len(bad) >= 5:
                        break
            if len(bad) >= 5:
                break
        if bad:
            print(f"FAIL {name}: value mismatches {bad}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_n)} rows)")
            n_pass += 1

    # rows-only queries (no oracle): just report row counts
    for d in sorted(os.listdir(out_dir)):
        if d in oracles or not os.path.isdir(f"{out_dir}/{d}"):
            continue
        try:
            n = con.execute(
                f"SELECT count(*) FROM parquet_scan('{out_dir}/{d}/*.parquet')").fetchone()[0]
            print(f"INFO {d}: rows-only, {n} rows")
        except Exception as e:
            print(f"WARN {d}: unreadable: {e}")

    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
