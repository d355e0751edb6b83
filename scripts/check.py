#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs DuckDB oracle SQL from <outDir>/oracle_sql.json against the testdata
parquet tables and compares with the Spark results dumped by graft.Verify.
Columns sorted by name, rows sorted, exact value equality.

Usage: python3 scripts/check.py <sfDir> <outDir>
"""
import json
import math
import sys

import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    def key(row):
        return tuple((v is None, str(type(v)), str(v)) for v in row)
    return sorted(out, key=key), [cols[i] for i in order]

def eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b

fails, passes = [], []
for name, sql in sorted(oracle.items()):
    try:
        spark_rel = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        s_cols = [d[0] for d in spark_rel.description]
        s_rows = spark_rel.fetchall()
        o_rel = con.sql(sql)
        o_cols = [d[0] for d in o_rel.description]
        o_rows = o_rel.fetchall()
    except Exception as e:
        fails.append((name, f"ERROR {e}"))
        continue
    s_canon, s_names = canon(s_rows, s_cols)
    o_canon, o_names = canon(o_rows, o_cols)
    if s_names != o_names:
        fails.append((name, f"SCHEMA spark={s_names} oracle={o_names}"))
        continue
    if len(s_canon) != len(o_canon):
        fails.append((name, f"ROWCOUNT spark={len(s_canon)} oracle={len(o_canon)}"))
        continue
    bad = None
    for i, (sr, orow) in enumerate(zip(s_canon, o_canon)):
        if not all(eq(a, b) for a, b in zip(sr, orow)):
            bad = (i, sr, orow)
            break
    if bad:
        fails.append((name, f"VALUE row{bad[0]} spark={bad[1]} oracle={bad[2]}"))
    else:
        passes.append(name)

for name in passes:
    print(f"PASS {name}")
for name, why in fails:
    print(f"FAIL {name}: {why[:400]}")
print(f"\n{len(passes)} passed, {len(fails)} failed")
sys.exit(1 if fails else 0)
