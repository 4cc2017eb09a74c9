#!/usr/bin/env python3
"""Partitioning-determinism audit (SCALE.md "Partitioning determinism"):
compare two graft.Verify dumps produced under DIFFERENT physical
parallelism (e.g. SPARK_GRAFT_CPUS=16 vs =5) cell-for-cell, using the
same canonicalization as the oracle gate (tools/check.py: columns
sorted by name, cells stringified — floats via exact repr — rows
sorted). Every query must be byte-identical across the two runs.

Usage: python3 tools/detcompare.py <dumpA> <dumpB> [outJson]
"""
import json, os, sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import canon  # the oracle gate's canonicalizer, unmodified
import pandas as pd


def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else None
    names = sorted(json.load(open(f"{a_dir}/oracle_sql.json")).keys())
    names_b = sorted(json.load(open(f"{b_dir}/oracle_sql.json")).keys())
    if names != names_b:
        print(f"FAIL: query sets differ: {set(names) ^ set(names_b)}")
        sys.exit(1)
    n_ok, bad = 0, []
    for name in names:
        try:
            a = canon(pd.read_parquet(f"{a_dir}/{name}"))
            b = canon(pd.read_parquet(f"{b_dir}/{name}"))
        except Exception as e:
            bad.append(name); print(f"FAIL {name}: unreadable ({e})"); continue
        if list(a.columns) != list(b.columns) or len(a) != len(b) or not a.equals(b):
            bad.append(name); print(f"FAIL {name}: dumps differ"); continue
        n_ok += 1
    print(f"== {n_ok}/{len(names)} byte-identical, {len(bad)} differ")
    if out:
        with open(out, "w") as f:
            json.dump({"compared": len(names), "identical": n_ok,
                       "differing": bad, "dump_a": a_dir, "dump_b": b_dir}, f,
                      indent=1)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
