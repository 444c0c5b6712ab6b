#!/usr/bin/env python3
"""Deterministic 10x scale extension for SCALING.md's one-more-decade probe.

The driver ships sf0.001/0.01/0.1 only (TESTDATA.md: read-only, do not
regenerate). To measure one more decade for the steepest-scaling queries,
this emits a synthetic "sf0.1 x 10" pair of tables into target/ (never
into /root/testdata):

- documents: copy 0 is sf0.1 verbatim; copies 1..9 perturb each token t
  at position i with salt k iff crc32(f"{t}|{i}|{k}") % 100 < 30. The
  perturbation depends only on (token, position, copy), so two near-
  duplicate originals receive near-identical perturbations and their
  within-copy similarity is PRESERVED, while a 13-gram survives across
  copies only if all 13 tokens are untouched in both (~0.7^26 ~ 1e-4) —
  near-dup cluster density per row stays ~constant and no degenerate
  10-way exact-twin clusters are introduced.
- lineitem: 10 copies with l_orderkey shifted by k * (max+1); value
  columns untouched, so group-size and value distributions per key are
  preserved and row count grows exactly 10x.

Usage: python3 tools/scale_extend.py [out_dir] [doc_copies] [li_copies]
(defaults target/sfx10 10 10). Round-13's fourth-decade probe uses
doc_copies=100 li_copies=1 (lineitem is only the bench warmup there).
"""
import sys, zlib, duckdb

out = sys.argv[1] if len(sys.argv) > 1 else "target/sfx10"
doc_copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
li_copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
sf = "/root/testdata/sf0.1"
con = duckdb.connect()
con.execute(f"CREATE TABLE docs AS SELECT * FROM '{sf}/documents.parquet'")
rows = con.execute("SELECT doc_id, text, lang, source, n_chars FROM docs ORDER BY doc_id").fetchall()
max_id = max(r[0] for r in rows) + 1

ext = list(rows)
for k in range(1, doc_copies):
    for (doc_id, text, lang, source, n_chars) in rows:
        toks = text.split(" ")
        toks = [t if zlib.crc32(f"{t}|{i}|{k}".encode()) % 100 >= 30 else f"{t}x{k}"
                for i, t in enumerate(toks)]
        t2 = " ".join(toks)
        ext.append((doc_id + k * max_id, t2, lang, source, len(t2)))

import os
os.makedirs(out, exist_ok=True)
con.execute("CREATE TABLE ext (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)")
con.executemany("INSERT INTO ext VALUES (?,?,?,?,?)", ext)
con.execute(f"COPY (SELECT * FROM ext ORDER BY doc_id) TO '{out}/documents.parquet' (FORMAT PARQUET)")

con.execute(f"""
COPY (
  SELECT l_orderkey + k.k * (SELECT max(l_orderkey) + 1 FROM '{sf}/lineitem.parquet') AS l_orderkey,
         l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
         l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM '{sf}/lineitem.parquet' CROSS JOIN (SELECT unnest(range(0, {li_copies})) AS k) k
) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
""")
n_d = con.execute(f"SELECT count(*) FROM '{out}/documents.parquet'").fetchone()[0]
n_l = con.execute(f"SELECT count(*) FROM '{out}/lineitem.parquet'").fetchone()[0]
print(f"wrote {out}: documents={n_d} lineitem={n_l}")
