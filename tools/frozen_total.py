#!/usr/bin/env python3
"""Pinned-comparable bench metrics (BASELINE.md): total + s/query over
FROZEN query sets, computed from a bench_full.json. Two sets are pinned:

- tools/frozen_set_r4.txt  — the 115 queries benched in round 4 (the
  driver's original 2x-gate basis; r4 cpus=32 idle basis 88.4 s).
- tools/frozen_set_r10.txt — the full 286-query r10 suite (covers the
  drains/ANN/curation families the r4 set predates; r10g cpus=32 idle
  basis 265.2 s raw / the settled-idle 82.68 s on the r4 subset).

Queries added after a set was frozen are excluded from that set's total
so cross-round comparisons stay like-for-like.

Usage: python3 tools/frozen_total.py [bench_full.json] [set.txt ...]
(default: both pinned sets)
"""
import json, sys

bench = json.load(open(sys.argv[1] if len(sys.argv) > 1 else "bench_full.json"))
sets = sys.argv[2:] or ["tools/frozen_set_r4.txt", "tools/frozen_set_r10.txt"]
for path in sets:
    frozen = [l.strip() for l in open(path) if l.strip()]
    missing = [n for n in frozen if n not in bench["queries"]]
    total = sum(bench["queries"][n] for n in frozen if n in bench["queries"])
    n = len(frozen) - len(missing)
    print(json.dumps({"set": path.split("/")[-1],
                      "frozen_total_sec": round(total, 3), "n": n,
                      "s_per_query": round(total / max(n, 1), 4),
                      "missing": missing, "sf": bench.get("sf")}))
