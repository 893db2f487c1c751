#!/usr/bin/env python3
"""Combine two same-session Bench sweeps (BENCH_DETAIL-format sidecars)
into a standing anchor file: per-query envelope (min of the two sweeps'
min_s), control subtotal, per-family partition, and the full per-pass
evidence from BOTH sweeps embedded per query.

Usage: combine_anchor.py <sweepA.json> <sweepB.json> <out.json> <round>
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d, {r["name"]: r for r in d["rows"]}


def main():
    pa, pb, out, rnd = sys.argv[1:5]
    da, ra = load(pa)
    db, rb = load(pb)
    if set(ra) != set(rb):
        sys.exit(f"sweeps cover different queries: {set(ra) ^ set(rb)}")
    queries, passes, families = {}, {}, {}
    control = 0.0
    for name in sorted(ra):
        a, b = ra[name], rb[name]
        env = round(min(a["min_s"], b["min_s"]), 3)
        queries[name] = env
        passes[name] = {"A": a["passes_s"], "B": b["passes_s"]}
        qn = int(name[1:].split("_")[0])
        if qn <= 30:
            control += env
    # family partition: recompute from each sweep's families keys via the
    # envelope rows (Bench's familyOf is the partition authority; both
    # sweeps carry identical family sets)
    fam_names = sorted(da["families"])
    # reconstruct per-family sums from the envelope using sweep A's
    # per-row family assignment (derive by matching Bench's subtotals is
    # impossible post-hoc, so recompute with the same rules Bench uses)
    anchor = {
        "round": int(rnd),
        "methodology": (
            "per-query envelope (min) over two same-code sweeps in one "
            "session, each min-of-3 warm passes (adaptive extras on "
            "spread) after sf0.001 JIT warm-up, sf0.1, local[32], "
            "gc_every=1; per-pass times from both sweeps embedded"),
        "n_queries": len(queries),
        "total_min_s": round(sum(queries.values()), 3),
        "control_q01_q30_s": round(control, 3),
        "sweep_totals_s": {"A": da["total_min_s"], "B": db["total_min_s"]},
        "sweep_controls_s": {"A": da["control_q01_30_s"],
                             "B": db["control_q01_30_s"]},
        "families_sweepA": da["families"],
        "families_sweepB": db["families"],
        "queries": queries,
        "passes": passes,
    }
    with open(out, "w") as f:
        json.dump(anchor, f, indent=1, sort_keys=False)
    print(f"anchor written: {out} n={len(queries)} "
          f"total={anchor['total_min_s']} control={anchor['control_q01_q30_s']}")


if __name__ == "__main__":
    main()
