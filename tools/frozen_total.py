#!/usr/bin/env python3
"""Pinned-comparable bench metric (BASELINE.md): total + s/query over the
FROZEN r4 query set (tools/frozen_set_r4.txt — the 115 queries benched in
round 4), computed from a bench_full.json. Queries added in later rounds
are excluded here so the driver's 2x gate compares like with like.

Usage: python3 tools/frozen_total.py [bench_full.json]
"""
import json, sys
bench = json.load(open(sys.argv[1] if len(sys.argv) > 1 else "bench_full.json"))
frozen = [l.strip() for l in open("tools/frozen_set_r4.txt") if l.strip()]
missing = [n for n in frozen if n not in bench["queries"]]
total = sum(bench["queries"][n] for n in frozen if n in bench["queries"])
n = len(frozen) - len(missing)
print(json.dumps({"frozen_total_sec": round(total, 3), "n": n,
                  "s_per_query": round(total / max(n, 1), 4),
                  "missing": missing, "sf": bench.get("sf")}))
