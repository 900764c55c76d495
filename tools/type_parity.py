#!/usr/bin/env python3
"""Type-parity gate, callable from sbt (TypeParitySuite) — the same rule
check_oracle.py enforces inline: DuckDB widens sum(BIGINT) to HUGEINT
(int128) and sum(DECIMAL(p,s)) to DECIMAL(38,s) while Spark stays at
BIGINT / DECIMAL(p+10,s); the driver's hash normalization diverges on the
128-bit representation even when every value compares equal, so such a
query ships driver-red at birth (q176/q184-q189/q191, rounds 10-11).

Input (argv[1]): JSON {"sfdir": ..., "queries": {name: {"sql": oracle SQL,
"cols": {col: spark-result DuckDB-equivalent type}}}}. DESCRIBE binds each
oracle without executing it; a column is an offender when the two sides
diverge across int128 or decimal width (int64-safe diffs like
INTEGER-vs-BIGINT are fine — the driver hash is insensitive to those).
Exit 1 if any offender.
"""
import sys, json, glob, os
import duckdb

spec = json.load(open(sys.argv[1]))
con = duckdb.connect()
for p in glob.glob(f"{spec['sfdir']}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{p}'")

bad = []
for name, q in sorted(spec["queries"].items()):
    try:
        desc = con.execute(f"DESCRIBE ({q['sql']})").fetchall()
    except Exception as e:
        bad.append(f"{name}: oracle DESCRIBE error: {e}")
        continue
    ot = {r[0]: r[1] for r in desc}
    for col, st in sorted(q["cols"].items()):
        o = ot.get(col)
        if o is None or o == st:
            continue
        if ("HUGEINT" in o) != ("HUGEINT" in st):
            bad.append(f"{name}.{col}: spark={st} oracle={o} "
                       f"(int128 divergence — CAST the oracle)")
        elif st.startswith("DECIMAL") and o.startswith("DECIMAL"):
            bad.append(f"{name}.{col}: spark={st} oracle={o} "
                       f"(decimal-width divergence — CAST the oracle)")

for b in bad:
    print("TYPEFAIL " + b)
print(f"{len(bad)} offenders / {len(spec['queries'])} queries")
sys.exit(1 if bad else 0)
