#!/usr/bin/env python3
"""Generate a literal VALUES-table DuckDB oracle from a Verify parquet dump
(the q80 golden-oracle pattern, VERDICT r3 Missing #4). Usage:
  python3 tools/make_golden.py /tmp/verify_out q40_hash_spark_native
Prints the oracle SQL to stdout; paste into the QueryDef.
"""
import sys, duckdb

outdir, name = sys.argv[1], sys.argv[2]
con = duckdb.connect()
r = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
cols = [d[0] for d in r.description]
types = [d[1] for d in r.description]
rows = r.fetchall()


def lit(v, t):
    if v is None:
        return "NULL"
    if t in ("VARCHAR", "STRING"):
        return "'" + str(v).replace("'", "''") + "'"
    if t in ("DOUBLE", "FLOAT"):
        return repr(float(v))
    return str(v)


print(f"-- {name}: {len(rows)} rows, cols={cols} types={types}")
vals = ",\n          ".join(
    "(" + ", ".join(lit(v, t) for v, t in zip(r, types)) + ")" for r in rows)
collist = ", ".join(cols)
print(f"""SELECT {collist} FROM (VALUES
          {vals}) AS t({collist})
        ORDER BY {cols[0]}""")
