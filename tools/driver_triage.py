#!/usr/bin/env python3
"""Automated driver-leg bench triage (VERDICT r14 item 5, r8 protocol).

Usage:
    python3 tools/driver_triage.py BENCH_rN.json BUILDER.json [IDLE.json]

BENCH_rN.json  the driver's per-round artifact (either the raw driver
               wrapper with a "parsed" block, or a bare Bench JSON)
BUILDER.json   the same-code builder archive to diff against, usually
               tools/bench_full_cpus32_r{N}close.json
IDLE.json      optional second builder leg (e.g. the early-idle
               bench_full_cpus32_r{N}a.json) used to classify each
               mover: a spike that does NOT reproduce on an idle leg
               is tenancy, not code.

Prints the median driver/builder ratio over the common query set and
the top-10 non-uniform movers (per-query ratio divided by the median,
so a uniformly-loaded driver box doesn't flag everything), each with
an idle-reproduction verdict:
    TENANCY  idle ratio <= 1.3  (spike absent when idle -> machine)
    CODE?    idle ratio >  1.3  (spike reproduces idle -> look at it)
    n/a      no idle leg supplied / query missing from it
Exit code 0 always — this is a report, not a gate.
"""
import json
import statistics
import sys


def load_queries(path):
    d = json.load(open(path))
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    qs = d.get("queries")
    if not isinstance(qs, dict) or not qs:
        sys.exit(f"{path}: no queries block found")
    return {k: float(v) for k, v in qs.items() if v is not None}


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    driver = load_queries(sys.argv[1])
    builder = load_queries(sys.argv[2])
    idle = load_queries(sys.argv[3]) if len(sys.argv) > 3 else {}

    common = sorted(set(driver) & set(builder))
    only_d = sorted(set(driver) - set(builder))
    only_b = sorted(set(builder) - set(driver))
    if not common:
        sys.exit("no common queries between the two legs")

    ratios = {q: driver[q] / builder[q] for q in common if builder[q] > 0}
    med = statistics.median(ratios.values())
    print(f"common queries: {len(common)}   "
          f"median driver/builder ratio: {med:.3f}")
    if only_d:
        print(f"only in driver leg ({len(only_d)}): {', '.join(only_d[:8])}"
              + (" ..." if len(only_d) > 8 else ""))
    if only_b:
        print(f"only in builder leg ({len(only_b)}): {', '.join(only_b[:8])}"
              + (" ..." if len(only_b) > 8 else ""))

    # non-uniform movers: per-query ratio normalized by the median leg
    # ratio; sub-second queries are noise-dominated, require the spike
    # to also cost wall-clock (>=0.5 s absolute delta)
    movers = []
    for q, r in ratios.items():
        rel = r / med
        delta = driver[q] - builder[q] * med
        if rel > 1.5 and delta >= 0.5:
            movers.append((rel, q, r, delta))
    movers.sort(reverse=True)

    if not movers:
        print("no non-uniform movers (all per-query ratios within "
              "1.5x of the median) -- uniform tenancy band, nothing "
              "to triage")
    else:
        print(f"\ntop movers (rel = per-query ratio / median; "
              f"{len(movers)} total):")
        print(f"{'query':<32}{'driver':>8}{'builder':>9}{'rel':>6}"
              f"{'idle_r':>8}  verdict")
        for rel, q, r, delta in movers[:10]:
            if q in idle and builder.get(q, 0) > 0:
                ir = idle[q] / builder[q]
                verdict = "TENANCY" if ir <= 1.3 else "CODE?"
                ir_s = f"{ir:.2f}"
            else:
                verdict, ir_s = "n/a", "-"
            print(f"{q:<32}{driver[q]:>8.2f}{builder[q]:>9.2f}"
                  f"{rel:>6.2f}{ir_s:>8}  {verdict}")
        print("\nverdict key: TENANCY = spike absent on the idle leg "
              "(machine load); CODE? = reproduces idle, read the plan")


if __name__ == "__main__":
    main()
