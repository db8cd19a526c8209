#!/bin/bash
# Round-close gate protocol, in order. Usage: tools/close_round.sh [N]
# (N = round number, used only for the bench archive names.)
# Runs: compile -> smoke -> full sf0.01 sweep under STRICT -> full
# scalatest -> cpus=32 + cpus=8 bench legs (archived) -> frozen metric.
# Each stage must pass before the next runs: set -e AND pipefail, so a
# stage piped through tail still aborts on the stage's own exit code
# (without pipefail, `sbt | tail` takes tail's status and a red compile
# or STRICT FAIL would not stop the close). The smoke stage captures to
# a file instead of piping to head, which would SIGPIPE the producer.
# The sf0.1 sweep is NOT here: its DuckDB oracle pass alone takes
# 20-40 min — run it once per round when the suite materially changed,
# not per close.
set -e -o pipefail
cd "$(dirname "$0")/.."
N="${1:-X}"
# freshness stamp: the correctness mirror must be written AFTER this
# moment or the close fails (VERDICT r13 item 1 — the mirror is the
# round's primary hard correctness signal; a stale copy from an earlier
# run must not satisfy the gate)
STAMP=$(mktemp)

echo "=== 1/6 compile"
sbt -batch compile | tail -2

echo "=== 2/6 smoke"
tools/run.sh graft.Smoke >/tmp/close_smoke.out 2>/dev/null
head -2 /tmp/close_smoke.out

echo "=== 3/6 full sf0.01 sweep + STRICT gate"
# PAR=8 is the builder's opt-in dev-loop speedup; the DEFAULT is the
# sequential envelope-safe path the driver sees (VERDICT r12 item 1).
SPARK_GRAFT_VERIFY_PAR=8 SPARK_GRAFT_CPUS=32 tools/run.sh graft.Verify \
  /root/testdata/sf0.01 /tmp/close_verify 2>/tmp/close_verify.log
# CHECK_JSON archives the per-query result in the DRIVER'S
# CORRECTNESS_r{N}.json schema — the reconstruction-proof parity
# artifact prescribed by VERDICT r10 after the driver's own artifact
# arrived empty: an empty CORRECTNESS_r{N}.json can now be diffed
# mechanically against the same-code local file.
CHECK_JSON="tools/correctness_local_r${N}.json" STRICT=1 \
  python3 tools/check.py /root/testdata/sf0.01 /tmp/close_verify \
  | tail -3
# HARD GATE: the mirror must exist, be newer than the run's start, and
# be all-green. Parse ok/total out of it for the close commit message.
MIRROR="tools/correctness_local_r${N}.json"
[ "$MIRROR" -nt "$STAMP" ] || {
  echo "CLOSE-GATE FAIL: $MIRROR missing or stale"; exit 1; }
GATE=$(python3 - "$MIRROR" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
# triple-green = oracle-compared and all three gates match; the two
# terminally-declared rows-only queries (err == "no_oracle", nonzero
# spark rows) are counted separately, never as failures.
# ADVICE r14: the rows-only set is a PINNED allowlist — a new query
# whose oracle was accidentally omitted must FAIL the gate, not slip
# through as an undeclared no_oracle "pass".
ROWS_ONLY = {"q_lda_topics", "q_stem_topk"}
ok = sum(1 for v in d.values()
         if v.get("err") is None and v.get("rows_match")
         and v.get("schema_match") and v.get("hash_match"))
declared = sum(1 for k, v in d.items()
               if k in ROWS_ONLY and v.get("err") == "no_oracle"
               and (v.get("spark_rows") or 0) > 0)
undeclared = [k for k, v in d.items()
              if v.get("err") == "no_oracle" and k not in ROWS_ONLY]
if undeclared:
    print(f"UNDECLARED no_oracle queries (missing oracleSql?): {sorted(undeclared)}")
    sys.exit(1)
print(f"{ok}/{len(d) - declared} oracle PASS, {declared} declared rows-only, {len(d)} total")
sys.exit(0 if ok + declared == len(d) and ok > 0 else 1)
EOF
) || { echo "CLOSE-GATE FAIL: mirror not all-green ($GATE)"; exit 1; }
VOK=$(grep -o 'SUMMARY ok=[0-9]* fail=[0-9]* total=[0-9]*' \
  /tmp/close_verify.log | tail -1)
echo "CLOSE-GATE: STRICT $GATE PASS ($VOK)"
# Dtype-repr audit (VERDICT r9): no query output may carry a DECIMAL
# final column — DuckDB's pandas bridge renders DECIMAL as float64, so
# the driver's type+repr hash diverges on any trailing-zero value even
# when tools/check.py's value canonicalization passes (the q_rfm class).
python3 tools/dtype_audit.py /tmp/close_verify

# ADVICE freshness (VERDICT r14 item 7): the r14 verdict found
# ADVICE.md still presenting four CLOSED r13 items as open. Every
# item must carry an explicit disposition marker — `CLOSED(rN: ...)`
# or `DEFERRED(rN: ...)` — before the round closes, so the next
# round's inbox is accurate.
python3 - <<'EOF'
import re, sys
blocks = re.split(r'^(?=- \*\*)',
                  open("ADVICE.md").read(), flags=re.M)[1:]
bad = [b.splitlines()[0][:70] for b in blocks
       if "CLOSED(r" not in b and "DEFERRED(r" not in b]
if bad:
    sys.exit("CLOSE-GATE FAIL: ADVICE.md items without a "
             "CLOSED(rN)/DEFERRED(rN) marker:\n  " + "\n  ".join(bad))
print(f"ADVICE.md: {len(blocks)} items, all dispositioned")
EOF

echo "=== 4/6 scalatest"
sbt -batch test 2>&1 | tail -4 | tee /tmp/close_test.out
TESTLINE=$(grep -o 'succeeded [0-9]*' /tmp/close_test.out | tail -1)
TESTN="${TESTLINE#succeeded }"

echo "=== 5/6 bench cpus=32 leg"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  tools/run.sh graft.Bench 2>/dev/null | tail -1 >/dev/null
cp bench_full.json "tools/bench_full_cpus32_r${N}close.json"
python3 tools/frozen_total.py bench_full.json

echo "=== 6/6 bench cpus=8 leg"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=8 \
  tools/run.sh graft.Bench 2>/dev/null | tail -1 >/dev/null
cp bench_full.json "tools/bench_full_cpus8_r${N}close.json"
python3 tools/frozen_total.py bench_full.json

# Rewrite the README status line (the single line after the
# close-gate-status marker) so the round's hard numbers are greppable
# in the repo itself, then print the line the close commit message must
# carry (VERDICT r13 item 1: the close commit contains N_ok/N_total).
STATUS="**Status**: r${N} close — STRICT oracle ${GATE}; ${VOK}; scalatest ${TESTN}/${TESTN} green."
python3 - "$STATUS" <<'EOF'
import sys
lines = open("README.md").read().splitlines(keepends=True)
for i, l in enumerate(lines):
    if "close-gate-status" in l:
        lines[i + 1] = sys.argv[1] + "\n"
        break
else:
    sys.exit("close-gate-status marker missing from README.md")
open("README.md", "w").writelines(lines)
EOF
echo "CLOSE-GATE: r${N} STRICT ${GATE}; ${VOK}; scalatest ${TESTN} green"
echo "=== round close protocol complete (put the CLOSE-GATE line in the close commit message)"
