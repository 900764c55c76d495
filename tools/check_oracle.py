#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf dir's parquet tables, compare with the Spark parquet
dump (columns sorted by name, rows sorted, values normalized). Usage:
  python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, glob, math, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bytes): return v.hex()
    if isinstance(v, list): return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, dict): return "{" + ",".join(f"{k}:{norm(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out

def type_parity(con, spark_glob, sql):
    """The r10/r11 driver-red root cause: DuckDB widens sum(BIGINT) to
    HUGEINT (int128) and sum(DECIMAL(p,s)) to DECIMAL(38,s), while Spark
    stays at BIGINT / DECIMAL(p+10,s). The python fetch above collapses
    both to int/Decimal, so VALUES compare equal here while the driver's
    hash normalization diverges on the 128-bit representation. Fail any
    column whose DuckDB type differs across int128 or decimal width —
    int64-safe diffs (INTEGER vs BIGINT) stay green, matching the driver.
    Returns a list of (col, spark_type, oracle_type) offenders."""
    def types_of(q):
        d = con.execute(f"DESCRIBE {q}").fetchall()
        return {r[0]: r[1] for r in d}
    st = types_of(f"SELECT * FROM '{spark_glob}'")
    ot = types_of(f"({sql})")
    bad = []
    for col in sorted(set(st) & set(ot)):
        a, b = st[col], ot[col]
        if a == b:
            continue
        huge = ("HUGEINT" in a) != ("HUGEINT" in b)
        decw = a.startswith("DECIMAL") and b.startswith("DECIMAL")
        if huge or decw:
            bad.append((col, a, b))
    return bad

fails = []
for name in sorted(oracle):
    sql = oracle[name]
    spark_dir = f"{outdir}/{name}"
    if not os.path.isdir(spark_dir):
        fails.append((name, "no spark output")); continue
    try:
        sr = con.execute(f"SELECT * FROM '{spark_dir}/*.parquet'")
        scols = [d[0] for d in sr.description]; srows = sr.fetchall()
        orr = con.execute(sql)
        ocols = [d[0] for d in orr.description]; orows = orr.fetchall()
    except Exception as e:
        fails.append((name, f"exec error: {e}")); continue
    sc, sv = canon(scols, srows)
    oc, ov = canon(ocols, orows)
    if sc != oc:
        fails.append((name, f"schema mismatch spark={sc} oracle={oc}")); continue
    if len(sv) != len(ov):
        fails.append((name, f"rowcount spark={len(sv)} oracle={len(ov)}")); continue
    if sv != ov:
        diff = next((i, a, b) for i, (a, b) in enumerate(zip(sv, ov)) if a != b)
        fails.append((name, f"value mismatch at row {diff[0]}: spark={diff[1]} oracle={diff[2]}")); continue
    try:
        offenders = type_parity(con, f"{spark_dir}/*.parquet", sql)
    except Exception as e:
        fails.append((name, f"type-parity describe error: {e}")); continue
    if offenders:
        detail = "; ".join(f"{c}: spark={a} oracle={b}" for c, a, b in offenders)
        fails.append((name, f"RESULT-TYPE divergence (driver-hash red even though "
                            f"values match — CAST the oracle): {detail}")); continue
    print(f"OK   {name} ({len(sv)} rows)")

for name, why in fails:
    print(f"FAIL {name}: {why[:300]}")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} green")
sys.exit(1 if fails else 0)
