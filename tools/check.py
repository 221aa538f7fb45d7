#!/usr/bin/env python3
"""Local stand-in for the driver's t2 compare (dev tool only, not part of
the library). Reads Verify.scala's output dir, runs each oracle SQL in
DuckDB over views named like TESTDATA.md tables, and compares value-for-
value with columns sorted by name (the driver sorts columns by name
before hashing). Usage: check.py [sfDir] [outDir] [only_prefix]"""
import sys, glob, json, math

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
ONLY = sys.argv[3] if len(sys.argv) > 3 else ""

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    return str(v)


def rows_of(cur):
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = cur.fetchall()
    return [cols[i] for i in order], [tuple(norm(r[i]) for i in order)
                                      for r in data]


oracle = json.load(open(f"{OUT}/oracle_sql.json"))
n_pass = n_fail = 0
for name in sorted(oracle):
    if ONLY and not name.startswith(ONLY):
        continue
    sql = oracle[name]
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: missing spark output")
        n_fail += 1
        continue
    got_cur = con.execute(
        f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')")
    gcols, grows = rows_of(got_cur)
    try:
        # Rule-7 lint: the driver canonicalizes HUGEINT/DECIMAL as
        # float64 and TIMESTAMP with engine-specific formatting, so an
        # oracle emitting them hash-mismatches even when values agree
        # (the q_text_pack r9 trap). Fail loudly here instead.
        banned = [(r[0], r[1]) for r in con.execute(
            f"DESCRIBE {sql}").fetchall()
            if r[1].startswith(("HUGEINT", "DECIMAL", "TIMESTAMP"))]
        if banned:
            print(f"FAIL {name}: rule-7 banned oracle output types: "
                  f"{banned} — CAST them (BIGINT/DOUBLE/epoch) in the SQL")
            n_fail += 1
            continue
        ecols, erows = rows_of(con.execute(sql))
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        n_fail += 1
        continue
    if gcols != ecols:
        print(f"FAIL {name}: columns {gcols} != {ecols}")
        n_fail += 1
        continue
    if len(grows) != len(erows):
        print(f"FAIL {name}: rows {len(grows)} != {len(erows)}")
        n_fail += 1
        continue
    bad = [(i, g, e) for i, (g, e) in enumerate(zip(grows, erows)) if g != e]
    if bad:
        i, g, e = bad[0]
        print(f"FAIL {name}: {len(bad)}/{len(grows)} rows differ; "
              f"first at {i}:\n  spark={g}\n  duck ={e}")
        n_fail += 1
    else:
        print(f"ok   {name} ({len(grows)} rows)")
        n_pass += 1
print(f"\n{n_pass} passed, {n_fail} failed")
sys.exit(1 if n_fail else 0)
