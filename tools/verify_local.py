#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: for each query output
parquet written by `graft.Verify`, run the paired DuckDB oracle SQL over
the same source parquet tables, canonicalize (sort columns by name, sort
rows), and compare cell-by-cell. Exit nonzero on any mismatch.

Usage: verify_local.py [sfDir] [outDir]
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def norm(v):
    if isinstance(v, float):
        # BIT-STRICT on purpose, signed zero included (r18 advice): the
        # sign-of-zero class is fixed at the query/oracle SOURCE
        # (QueryDef.roundZ / `round(..) + 0.0` on every rounded column
        # whose domain straddles zero), so a -0.0 reaching this mirror
        # is a query bug the driver's gate might also flag — local green
        # must imply driver green, whatever comparator the driver runs.
        return ("f", repr(v))
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single-file tables; Spark-written scale
        # points (ScaleUp's target/sf1) are part-file directories
        path = f"{sf}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    with open(f"{out}/oracle_sql.json") as f:
        oracle = json.load(f)
    # mirror graft.Verify's subset env so partial dumps compare cleanly
    only = os.environ.get("SPARK_GRAFT_ONLY")
    if only:
        keep = {q.strip() for q in only.split(",") if q.strip()}
        oracle = {k: v for k, v in oracle.items() if k in keep}
    failures = []
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            got_rel = con.execute(
                f"SELECT * FROM parquet_scan('{out}/{name}/*.parquet')")
            got_cols = [d[0] for d in got_rel.description]
            got_rows = got_rel.fetchall()
            exp_rel = con.execute(sql)
            exp_cols = [d[0] for d in exp_rel.description]
            exp_rows = exp_rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: exception {e}")
            continue
        gc, gr = canon(got_rows, got_cols)
        ec, er = canon(exp_rows, exp_cols)
        if gc != ec:
            failures.append(name)
            print(f"FAIL {name}: columns {gc} != {ec}")
            continue
        if len(gr) != len(er):
            failures.append(name)
            print(f"FAIL {name}: rowcount {len(gr)} != {len(er)}")
            continue
        bad = None
        for i, (a, b) in enumerate(zip(gr, er)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            failures.append(name)
            print(f"FAIL {name}: row {bad[0]}\n  spark={bad[1]}\n  duck ={bad[2]}")
        else:
            print(f"OK   {name} ({len(gr)} rows)")
    if failures:
        print(f"\n{len(failures)}/{len(oracle)} FAILED: {failures}")
        sys.exit(1)
    print(f"\nall {len(oracle)} queries match")


if __name__ == "__main__":
    main()
