#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [verifyOutDir]

Reads oracle_sql.json + per-query parquet dumps written by graft.Verify,
runs each oracle in DuckDB against the sf tables, and compares:
column names (sorted), row count, and values (rows sorted, exact match;
tiny float tolerance report for diagnosis).
"""
import duckdb, sys, glob, os, json
import pandas as pd
import numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
if len(sys.argv) > 3:  # dev-only: restrict to a comma-separated subset
    keep = set(sys.argv[3].split(","))
    oracle = {k: v for k, v in oracle.items() if k in keep}
fails = []

# CHECK_JSON=<path>: also write a per-query report in the DRIVER'S
# CORRECTNESS_r{N}.json schema (rows_match/schema_match/hash_match/
# spark_rows/oracle_rows/err), so an empty driver artifact (the r10
# failure mode) can be mechanically diffed against a same-code local
# run instead of judged on a manual re-run.
report = {}


def flush_report():
    """Write-temp + atomic rename after EVERY query (VERDICT r14
    item 1): a kill at any instant leaves CHECK_JSON a valid partial
    artifact holding all completed rows, never an empty {}."""
    path = os.environ.get("CHECK_JSON")
    if not path:
        return
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(report, f, indent=0, sort_keys=True)
    os.replace(tmp, path)


def record(name, **kw):
    e = {"rows_match": None, "schema_match": None, "hash_match": None,
         "spark_rows": None, "oracle_rows": None, "err": None}
    e.update(kw)
    report[name] = e
    flush_report()

def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (int,)):
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

for name in sorted(oracle):
    sql = oracle[name]
    try:
        o = con.sql(sql).df()
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: oracle SQL error: {e}")
        record(name, err=f"oracle SQL error: {e}")
        continue
    d = f"{out}/{name}"
    if not os.path.isdir(d):
        fails.append(name); print(f"FAIL {name}: no spark output dir")
        record(name, oracle_rows=len(o), err="no spark output dir")
        continue
    s = con.sql(f"SELECT * FROM read_parquet('{d}/*.parquet')").df()
    o, s = canon(o), canon(s)
    if list(o.columns) != list(s.columns):
        fails.append(name)
        print(f"FAIL {name}: columns oracle={list(o.columns)} spark={list(s.columns)}")
        record(name, schema_match=False, rows_match=len(o) == len(s),
               spark_rows=len(s), oracle_rows=len(o))
        continue
    if len(o) != len(s):
        fails.append(name)
        print(f"FAIL {name}: rows oracle={len(o)} spark={len(s)}")
        record(name, schema_match=True, rows_match=False,
               spark_rows=len(s), oracle_rows=len(o))
        continue
    ok = True
    for c in o.columns:
        # the driver's hash compare is dtype-sensitive (e.g. DuckDB HUGEINT
        # vs Spark BIGINT) — flag mismatches the value compare would coerce
        if o[c].dtype != s[c].dtype:
            print(f"FAIL {name}: col {c} dtype mismatch oracle={o[c].dtype} spark={s[c].dtype}")
            ok = False
            continue
        oc, sc = o[c].values, s[c].values
        if np.issubdtype(o[c].dtype, np.floating):
            same = np.array_equal(oc, sc, equal_nan=True)
            if not same:
                md = np.nanmax(np.abs(oc - sc)) if len(oc) else 0
                print(f"FAIL {name}: col {c} float mismatch, max_abs_diff={md}")
                ok = False
        else:
            eq = pd.Series(oc).fillna("\x00").eq(pd.Series(sc).fillna("\x00"))
            if not eq.all():
                i = int(np.argmin(eq.values))
                print(f"FAIL {name}: col {c} differs at row {i}: oracle={oc[i]!r} spark={sc[i]!r}")
                ok = False
    # STRICT mode (STRICT=1): mimic the driver's byte-level hash gate —
    # after the value compare, hash the canonicalized frames including
    # each cell's Python type, so a Decimal-vs-float or np.int64-vs-int
    # divergence the tolerant compare coerces still fails here the way
    # the driver's dtype-sensitive hash would.
    if ok and os.environ.get("STRICT") == "1":
        import hashlib
        def bhash(df):
            h = hashlib.sha256()
            for c in df.columns:
                h.update(c.encode()); h.update(str(df[c].dtype).encode())
                for v in df[c].values:
                    h.update(type(v).__name__.encode())
                    h.update(repr(v).encode()); h.update(b"\x1f")
            return h.hexdigest()
        if bhash(o) != bhash(s):
            print(f"FAIL {name}: STRICT byte-hash mismatch (type/repr level)")
            ok = False
    record(name, schema_match=True, rows_match=True, hash_match=ok,
           spark_rows=len(s), oracle_rows=len(o))
    if ok:
        print(f"PASS {name} ({len(o)} rows)")
    else:
        fails.append(name)

n = len(oracle)
print(f"\n{n - len(fails)}/{n} PASS")

if os.environ.get("CHECK_JSON"):
    # rows-only queries (dumped by Verify but absent from oracle_sql
    # .json) get the driver's weaker no_oracle row: spark_rows only.
    for d in sorted(glob.glob(f"{out}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in report:
            continue
        try:
            nr = len(con.sql(f"SELECT * FROM read_parquet('{d}*.parquet')").df())
        except Exception:
            nr = None
        record(name, spark_rows=nr, err="no_oracle")
    flush_report()
    print(f"report -> {os.environ['CHECK_JSON']}")

sys.exit(1 if fails else 0)
