#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Reads each Spark result parquet under OUTDIR/<query>/, runs the matching
oracle SQL from OUTDIR/oracle_sql.json against views named after the
tables in SFDIR, sorts columns by name and rows by all values, and
reports row-count / value equality per query.
"""
import sys, json, math
import duckdb

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUTDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SFDIR}/{t}.parquet'")

oracle = json.load(open(f"{OUTDIR}/oracle_sql.json"))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
                if v == -0.0: v = 0.0
            vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return out

ok = fail = 0
for name, sql in sorted(oracle.items()):
    try:
        spark_rel = con.sql(f"SELECT * FROM '{OUTDIR}/{name}/*.parquet'")
        scols = [c.lower() for c in spark_rel.columns]
        srows = spark_rel.fetchall()
        orel = con.sql(sql)
        ocols = [c.lower() for c in orel.columns]
        orows = orel.fetchall()
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
            fail += 1; continue
        a, b = canon(srows, scols), canon(orows, ocols)
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} oracle={len(b)}")
            fail += 1; continue
        diffs = [(x, y) for x, y in zip(a, b) if x != y]
        if diffs:
            print(f"FAIL {name}: {len(diffs)} differing rows; first: spark={diffs[0][0][:160]} oracle={diffs[0][1][:160]}")
            fail += 1; continue
        print(f"OK   {name}: {len(a)} rows")
        ok += 1
    except Exception as e:
        print(f"ERR  {name}: {str(e)[:200]}")
        fail += 1

print(f"\n{ok} ok, {fail} fail, {len(oracle)} total with oracle")
sys.exit(1 if fail else 0)
