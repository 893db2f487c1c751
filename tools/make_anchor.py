#!/usr/bin/env python3
"""Build BENCH_ANCHOR_r{N}.json from two same-session Bench sweeps.

Replicates the r14 anchor recipe (BASELINE.md "Round-14 anchor"):
the per-query minima ENVELOPE over two full sweeps (A, B), each
min-of-3 warm passes after the sf0.001 JIT warm-up, sf0.1, local[32],
gc_every=1. Inputs are the two sweeps' BENCH_DETAIL sidecars.

Usage: make_anchor.py <round> <detail_A.json> <detail_B.json> <out.json>
"""
import json
import sys


def main() -> None:
    rnd, a_path, b_path, out = sys.argv[1:5]
    a = json.load(open(a_path))
    b = json.load(open(b_path))
    rows_a = {r["name"]: r for r in a["rows"]}
    rows_b = {r["name"]: r for r in b["rows"]}
    if rows_a.keys() != rows_b.keys():
        raise SystemExit(
            f"sweep query sets differ: {sorted(set(rows_a) ^ set(rows_b))}")
    for name, r in list(rows_a.items()) + list(rows_b.items()):
        if r["failed_passes"]:
            raise SystemExit(f"{name} had failed passes — not anchorable")

    queries = {n: round(min(rows_a[n]["min_s"], rows_b[n]["min_s"]), 3)
               for n in sorted(rows_a)}
    total = round(sum(queries.values()), 3)
    control = round(sum(v for n, v in queries.items()
                        if int(n[1:n.index("_")]) <= 30), 3)

    # family membership is not in the detail rows, so recompute the
    # subtotals by re-running Bench.familyOf's partition in python.
    # This partition is a hand-copy of Bench.familyOf — cross-validated
    # below against each sweep sidecar's Bench-computed 'families' dict,
    # so a future reclassification in Bench.scala fails loudly here
    # instead of silently skewing the anchor's subtotals.
    text = {31, 32, 33, 34, 69, 70, 83, 88, 96, 111, 112, 115, 123, 125,
            129, 132, 138, 139, 140, 147, 148, 154, 160, 162, 167, 172,
            176, 179, 181, 182, 183, 184, 186, 187, 188, 189, 190, 193, 195}
    dedup = {35, 36, 37, 38, 77, 85, 102, 109, 110, 113, 118, 121, 122,
             128, 144, 146, 158, 169, 173, 174, 191}
    ann = {39, 40, 41, 78, 81, 94, 104, 116, 119, 126, 130, 164, 166, 185}
    events = {42, 43, 44, 45, 46, 47, 48, 67, 108, 142, 143, 150, 151,
              155, 157, 159, 161, 165, 170, 175, 178, 180, 194}
    multimodal = {53, 54, 55, 101, 127, 131, 133, 136, 137, 141}
    curation = {84, 86, 87, 89, 90, 91, 92, 93, 95, 97, 98, 99, 100, 103,
                105, 106, 114, 117, 120, 124, 134, 135, 145, 149, 152,
                153, 156, 163, 168, 171, 177, 192}

    def family(n: str) -> str:
        q = int(n[1:n.index("_")])
        if q <= 30:
            return "relational"
        for fam, s in (("text", text), ("dedup", dedup), ("ann", ann),
                       ("events", events), ("multimodal", multimodal),
                       ("curation", curation)):
            if q in s:
                return fam
        return "connector"

    # drift check: the Python partition applied to each sweep's own
    # min_s rows must reproduce that sweep's Bench-computed subtotals
    for label, sweep, rows in (("A", a, rows_a), ("B", b, rows_b)):
        mine = {}
        for n, r in rows.items():
            f = family(n)
            mine[f] = mine.get(f, 0.0) + r["min_s"]
        for f, v in sweep["families"].items():
            if abs(mine.get(f, 0.0) - v) > 0.01:
                raise SystemExit(
                    f"family partition drift vs Bench.familyOf (sweep {label},"
                    f" family {f}): python {mine.get(f, 0.0):.3f}"
                    f" != sidecar {v:.3f}")

    families = {}
    for n, v in queries.items():
        families[family(n)] = round(families.get(family(n), 0.0) + v, 3)

    anchor = {
        "round": int(rnd),
        "methodology": (
            "per-query envelope (min) over two same-code sweeps in one "
            "session, each min-of-3 warm passes after sf0.001 JIT warm-up, "
            "sf0.1, local[32], gc_every=1; per-pass times recorded per query"),
        "n_queries": len(queries),
        "total_min_s": total,
        "control_q01_q30_s": control,
        "sweep_totals_s": {"A": a["total_min_s"], "B": b["total_min_s"]},
        "sweep_controls_s": {"A": a["control_q01_30_s"],
                             "B": b["control_q01_30_s"]},
        "families": dict(sorted(families.items())),
        "queries": queries,
        "evidence_passes": {n: {"A": rows_a[n]["passes_s"],
                                "B": rows_b[n]["passes_s"]}
                            for n in sorted(rows_a)},
    }
    with open(out, "w") as f:
        json.dump(anchor, f, indent=None, separators=(",", ":"))
        f.write("\n")
    print(f"anchor: {len(queries)} queries, total {total} s, "
          f"control {control} s -> {out}")


if __name__ == "__main__":
    main()
