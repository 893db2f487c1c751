#!/usr/bin/env python3
"""Recall@k of the approximate ANN queries against the brute-force
ground truth (q39), computed from a `graft.Verify` dump directory —
the quality leg of a scale-point correctness artifact (the hash leg is
verify_local.py).

For every ANN result that carries (query_id, neighbor_id) columns, the
metric is mean over queries of |top-k(approx) ∩ top-k(exact)| / k,
with k=5 (the battery's top-k). q81 (near-dup pairs) is reported as
planted-twin pair recovery instead: its query plants a cosine-0.99
twin (vec_id + 1,000,000) for every corpus vector, so recovery =
fraction of planted pairs present in the output.

Usage: ann_recall.py <verifyOutDir>
"""
import json
import os
import sys

import duckdb

K = 5
TRUTH = "q39_ann_bruteforce_topk"
APPROX = ["q41_ann_lsh_bucketed", "q78_ann_ivf", "q104_ann_ivf_multiprobe",
          "q126_ann_pq_adc", "q130_ann_ivf_pq"]
PAIRS = "q81_embedding_neardup_pairs"


def topk_sets(con, out, name):
    cols = [d[0] for d in con.execute(
        f"SELECT * FROM parquet_scan('{out}/{name}/*.parquet') LIMIT 0").description]
    if "query_id" not in cols or "neighbor_id" not in cols:
        return None
    # rank by the result's own order column if present, else by cosine
    order = "rn" if "rn" in cols else ("cosine DESC" if "cosine" in cols else None)
    lim = f"QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY {order}) <= {K}" \
        if order else ""
    rows = con.execute(
        f"SELECT query_id, neighbor_id FROM parquet_scan('{out}/{name}/*.parquet') {lim}"
    ).fetchall()
    sets = {}
    for q, n in rows:
        sets.setdefault(q, set()).add(n)
    return sets


def main():
    out = sys.argv[1]
    con = duckdb.connect()
    truth = topk_sets(con, out, TRUTH)
    if truth is None:
        raise SystemExit(f"{TRUTH} dump missing query_id/neighbor_id")
    report = {}
    for name in APPROX:
        if not os.path.isdir(f"{out}/{name}"):
            continue
        approx = topk_sets(con, out, name)
        if approx is None:
            report[name] = {"recall_at_5": None, "note": "no (query_id, neighbor_id) columns"}
            continue
        recs = [len(approx.get(q, set()) & t) / len(t) for q, t in truth.items() if t]
        report[name] = {"recall_at_5": round(sum(recs) / len(recs), 4),
                        "queries": len(recs)}
    if os.path.isdir(f"{out}/{PAIRS}"):
        cols = [d[0] for d in con.execute(
            f"SELECT * FROM parquet_scan('{out}/{PAIRS}/*.parquet') LIMIT 0").description]
        a, b = cols[0], cols[1]
        got = con.execute(
            f"SELECT count(*) FROM parquet_scan('{out}/{PAIRS}/*.parquet') "
            f"WHERE {b} = {a} + 1000000 OR {a} = {b} + 1000000").fetchone()[0]
        planted = con.execute(
            f"SELECT count(DISTINCT least({a}, {b})) "
            f"FROM parquet_scan('{out}/{PAIRS}/*.parquet')").fetchone()[0]
        report[PAIRS] = {"planted_pairs_recovered": got,
                         "distinct_low_ids": planted}
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
