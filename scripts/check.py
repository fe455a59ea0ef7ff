#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB against the same parquet tables, load the Spark result parquet
written by graft.Verify, sort columns by name, and compare values.

Usage: python3 scripts/check.py <sfDir> <outDir>
"""
import glob
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return str(v)


def frame_rows(cur):
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = cur.fetchall()
    return [cols[i] for i in order], [tuple(norm(r[i]) for i in order) for r in rows]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result written")
            n_fail += 1
            continue
        try:
            got_cols, got = frame_rows(
                con.execute(f"SELECT * FROM read_parquet('{files[0]}')"))
            want_cols, want = frame_rows(con.execute(sql))
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if got_cols != want_cols:
            print(f"FAIL {name}: cols spark={got_cols} duckdb={want_cols}")
            n_fail += 1
        elif got != want:
            n_fail += 1
            diffs = [i for i, (g, w) in enumerate(zip(got, want)) if g != w]
            print(f"FAIL {name}: rows spark={len(got)} duckdb={len(want)} "
                  f"first_diffs={diffs[:3]}")
            for i in diffs[:3]:
                print(f"  [{i}] spark={got[i]}")
                print(f"  [{i}] duck ={want[i]}")
            if len(got) != len(want):
                print(f"  spark head={got[:2]} duck head={want[:2]}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
    # rows-only queries: just check the parquet exists and has rows
    for res_dir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(res_dir)
        if not os.path.isdir(res_dir) or name in oracle:
            continue
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{files[0]}')").fetchone()[0] if files else 0
        status = "PASS" if n > 0 else "FAIL"
        if status == "FAIL":
            n_fail += 1
        else:
            n_pass += 1
        print(f"{status} {name} (rows-only: {n} rows)")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
