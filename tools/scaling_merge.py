#!/usr/bin/env python3
"""Merge the round-21 sf1 core-scaling runs (c8/c32, two orderings)
into SCALING_r21.json. Each input is a graft.Bench BENCHFULL artifact
(first line). The per-query ratio is computed from the per-core-count
MIN across orderings (the same min-of-N reasoning as the bench), and
each run's canary block is kept so the window drift that confounded
single-pair readings stays visible in-band.

Usage: scaling_merge.py out.json c8run1 c32run1 [c8run2 c32run2 ...]
"""
import json
import math
import sys


def read(path):
    j = json.loads(open(path).readline())
    return j["queries"], j["canary"], j["value"]


def main():
    out_path = sys.argv[1]
    runs = []
    for p in sys.argv[2:]:
        q, c, t = read(p)
        cpus = 8 if "_c8" in p else 32
        runs.append({"file": p, "cpus": cpus, "canary": c, "total": t, "queries": q})
    by_cpu = {8: {}, 32: {}}
    for r in runs:
        for q, v in r["queries"].items():
            cur = by_cpu[r["cpus"]].get(q)
            by_cpu[r["cpus"]][q] = v if cur is None else min(cur, v)
    # Union of both sides: a query that crashed at one core count must
    # surface as a partial row, not crash the formatter or vanish.
    names = sorted(set(by_cpu[8]) | set(by_cpu[32]),
                   key=lambda q: -by_cpu[8].get(q, by_cpu[32].get(q, 0.0)))
    per = {}
    for q in names:
        c8, c32 = by_cpu[8].get(q), by_cpu[32].get(q)
        per[q] = {"c8_min": c8, "c32_min": c32,
                  "speedup_c32_over_c8":
                      round(c8 / c32, 3) if c8 and c32 else None}
    cans = [r["canary"] for r in runs]
    drifts = []
    for i in range(1, len(cans)):
        keys = set(cans[0]) & set(cans[i])
        drifts.append(round(math.exp(
            sum(math.log(cans[i][k] / cans[0][k]) for k in keys) / len(keys)), 3))
    doc = {"sf": "/tmp/sf1 (MakeScale 10x of sf0.1)",
           "method": "per-core-count MIN across orderings (c8,c32 then c32,c8)",
           "runs": [{"file": r["file"], "cpus": r["cpus"], "total": r["total"],
                     "canary": r["canary"]} for r in runs],
           "canary_drift_vs_run1": drifts,
           "per_query": per}
    open(out_path, "w").write(json.dumps(doc, indent=1) + "\n")
    print(f"{out_path}: {len(per)} queries, canary drift vs run1: {drifts}")
    def fmt(v):
        return f"{v:7.3f}" if v is not None else "   ----"
    for q in names:
        p = per[q]
        print(f"{q:32s} c8={fmt(p['c8_min'])} c32={fmt(p['c32_min'])} "
              f"speedup={p['speedup_c32_over_c8']}")


if __name__ == "__main__":
    main()
