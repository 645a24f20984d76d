#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/check_correctness.py <sf_dir> <verify_out_dir>

For each query dumped by graft.Verify, re-runs the oracle SQL in DuckDB over
the same parquet tables and compares row count, column names (sorted), and
the full sorted value matrix (exact equality).
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=repr)
    return [cols[i] for i in order], out


def norm(v):
    import datetime
    import decimal
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import os
    produced = sorted(d for d in os.listdir(out_dir)
                      if os.path.isdir(f"{out_dir}/{d}"))
    for name in produced:
        if name not in oracles:
            print(f"  SKIP {name}: no oracle (rows-only check)")
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            g_rows, g_cols = got.fetchall(), [d[0] for d in got.description]
            want = con.execute(oracles[name])
            w_rows, w_cols = want.fetchall(), [d[0] for d in want.description]
        except Exception as e:
            print(f"  FAIL {name}: {e}")
            n_fail += 1
            continue
        gc, gr = canon(g_rows, g_cols)
        wc, wr = canon(w_rows, w_cols)
        if gc != wc:
            print(f"  FAIL {name}: columns {gc} != {wc}")
            n_fail += 1
        elif len(gr) != len(wr):
            print(f"  FAIL {name}: rows {len(gr)} != {len(wr)}")
            n_fail += 1
        elif gr != wr:
            diff = [i for i, (a, b) in enumerate(zip(gr, wr)) if a != b][:3]
            print(f"  FAIL {name}: values differ, e.g. rows {diff}:")
            for i in diff:
                print(f"    got  {gr[i]}\n    want {wr[i]}")
            n_fail += 1
        else:
            print(f"  PASS {name} ({len(gr)} rows)")
            n_pass += 1
    missing = sorted(set(oracles) - set(produced))
    for name in missing:
        print(f"  MISS {name}: oracle declared but no spark output")
        n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
