#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB oracle gate.

Replays oracle_sql.json in DuckDB over the sf parquet tables and compares
each result against the Spark parquet dump in verify_out/<name>/, using the
driver's semantics: sort columns by name, compare row count, schema
(column names), and values (floats at 1e-9 relative tolerance).
"""
import json, math, sys
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "target/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return a == b

failures = []
for name, sql in sorted(oracle.items()):
    try:
        o = con.execute(sql)
        ocols = [d[0] for d in o.description]
        orows = o.fetchall()
        s = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        scols = [d[0] for d in s.description]
        srows = s.fetchall()
    except Exception as e:
        failures.append((name, f"EXEC ERROR: {e}"))
        print(f"FAIL {name}: exec error: {e}")
        continue
    if sorted(ocols) != sorted(scols):
        failures.append((name, f"schema: oracle={sorted(ocols)} spark={sorted(scols)}"))
        print(f"FAIL {name}: schema oracle={sorted(ocols)} spark={sorted(scols)}")
        continue
    if len(orows) != len(srows):
        failures.append((name, f"rows: oracle={len(orows)} spark={len(srows)}"))
        print(f"FAIL {name}: rows oracle={len(orows)} spark={len(srows)}")
        continue
    # reorder columns by sorted name and compare rows IN RETURNED ORDER —
    # stricter than a sorted compare: it catches queries whose ORDER BY is
    # not a total order (engines may order ties differently, which breaks
    # any order-sensitive hash the driver might use)
    operm = [ocols.index(c) for c in sorted(ocols)]
    sperm = [scols.index(c) for c in sorted(scols)]
    okey = [tuple(norm(r[i]) for i in operm) for r in orows]
    skey = [tuple(norm(r[i]) for i in sperm) for r in srows]
    bad = None
    for i, (ra, rb) in enumerate(zip(okey, skey)):
        for a, b in zip(ra, rb):
            if not eq(a, b):
                bad = (i, ra, rb)
                break
        if bad:
            break
    if bad:
        failures.append((name, f"value mismatch at row {bad[0]} (returned order)"))
        print(f"FAIL {name}: value mismatch\n  oracle: {bad[1]}\n  spark : {bad[2]}")
    else:
        print(f"OK   {name} ({len(orows)} rows)")

print(f"\n{len(oracle) - len(failures)}/{len(oracle)} oracle checks pass")
sys.exit(1 if failures else 0)
