#!/usr/bin/env python3
"""Dtype-repr audit for the round-close protocol (VERDICT r9 item 2).

The q_rfm class of bug: a Spark query whose FINAL schema carries a
DECIMAL column hash-diverges from its DuckDB oracle under the driver's
type+repr comparison, because DuckDB's pandas bridge returns DECIMAL as
float64 — every value with a trailing zero cent reprs differently
(Decimal('3916451.10') vs 3916451.1). tools/check.py canonicalizes
values so the class is invisible locally but red on the driver.

House rule: no query output may carry a DECIMAL column. DECIMAL is for
exact INTERNAL arithmetic (sum(dec(c))); the final select casts to
double (sumMoney, Relational.scala:34) or BIGINT. This audit sweeps the
verify output dir (every <name>.parquet written by graft.Verify) and
fails on any decimal column in any query's final schema.

Usage: python3 tools/dtype_audit.py /tmp/close_verify
"""
import sys
import glob
import os

import pyarrow.parquet as pq
import pyarrow.types as pat

verify_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/close_verify"
hits = []
# graft.Verify writes each query as a DIRECTORY <name>/ of part files.
names = sorted(
    d for d in glob.glob(os.path.join(verify_dir, "q*"))
    if os.path.isdir(d) and glob.glob(os.path.join(d, "*.parquet"))
)
if not names:
    print(f"dtype_audit: no parquet outputs under {verify_dir}", file=sys.stderr)
    sys.exit(2)
for p in names:
    q = os.path.basename(p)
    schema = pq.ParquetDataset(p).schema
    for field in schema:
        if pat.is_decimal(field.type):
            hits.append(f"{q}.{field.name}: {field.type}")
print(f"dtype_audit: {len(names)} query outputs swept, {len(hits)} decimal columns")
for h in hits:
    print(f"  HIT {h}")
sys.exit(1 if hits else 0)
