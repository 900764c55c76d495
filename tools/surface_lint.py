#!/usr/bin/env python3
"""Driver-red surface lint: predict hash_match:false rows WITHOUT running
Spark, from the oracle side alone.

Characterization (established in r14, validated 7/7 exact against
CORRECTNESS_r13 with zero false positives over all 216 queries): the
driver reads the Spark result parquet through pyarrow/pandas, where
DECIMAL columns surface as scale-preserving decimal.Decimal objects, but
materializes the DuckDB oracle result through a pandas conversion that
renders every DECIMAL as float64 (duckdb .df() does this on 1.0.0 —
verified locally: CAST('16532.00' AS DECIMAL(28,2)) -> float 16532.0).
The subsequent stringify/hash therefore diverges exactly when

    str(Decimal(v)) != repr(float(v))

i.e. when a decimal value carries trailing fractional zeros ('16532.00'
vs '16532.0', '501303707.661800' vs '501303707.6618') or needs more
digits than float64 round-trips. Values whose digits coincide with the
float shortest-repr ('845.8815') compare equal, which is why most
decimal-surfaced queries are green and the red set looked type-random.

Usage:
  python3 tools/surface_lint.py /root/testdata/sf0.01 oracle_sql.json

Both arguments are required (dump the json first via graft.Verify).
Exit 1 if any NON-CANARY query is predicted red (ship gate: run this on
every new query before the driver does); exit 2 on misinvocation.
"""
import sys, json, glob, os
from decimal import Decimal
import duckdb

# Named canaries: queries that deliberately keep a trailing-zero decimal
# surface to pin the driver-normalization boundary. Expected red.
CANARIES = {
    "q222_canary212_rollup_dec",
    "q223_canary_dec_trailzero",
}

def usage(msg):
    print(f"error: {msg}\n", file=sys.stderr)
    print(__doc__, file=sys.stderr)
    sys.exit(2)

if len(sys.argv) < 3:
    usage("need BOTH arguments: <sf-dir> <oracle_sql.json> "
          "(dump the json first via graft.Verify)")
sfdir, oracle_json = sys.argv[1], sys.argv[2]
if not os.path.isdir(sfdir):
    usage(f"sf-dir not a directory: {sfdir}")
if not os.path.isfile(oracle_json):
    usage(f"oracle json not found: {oracle_json}")

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    con.execute(f"CREATE OR REPLACE VIEW {os.path.basename(p)[:-8]} "
                f"AS SELECT * FROM '{p}'")

oracle = json.load(open(oracle_json))

def offending(rows):
    for r in rows:
        for v in r:
            if isinstance(v, Decimal) and str(v) != repr(float(v)):
                return f"{v} (float repr {float(v)!r})"
    return None

bad, canary_hits, errs = [], [], []
for name in sorted(oracle):
    try:
        rows = con.execute(oracle[name]).fetchall()
    except Exception as e:
        errs.append((name, str(e)[:120]))
        continue
    off = offending(rows)
    if off is None:
        continue
    (canary_hits if name in CANARIES else bad).append((name, off))

for name, off in canary_hits:
    print(f"CANARY {name}: {off} (expected red, documented)")
for name, off in bad:
    print(f"RED-PREDICTED {name}: {off}")
for name, e in errs:
    print(f"ERROR {name}: {e}")
print(f"\n{len(oracle)} queries, {len(bad)} predicted red (non-canary), "
      f"{len(canary_hits)} canaries, {len(errs)} errors")
sys.exit(1 if (bad or errs) else 0)
