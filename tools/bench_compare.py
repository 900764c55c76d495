#!/usr/bin/env python3
"""Per-query bench regression guard.

Compares a fresh BENCH_detail.json against a committed baseline and
reports queries whose time moved beyond tolerance — the per-query
auditability the driver's truncated stdout capture can't provide.

Usage:
    python3 tools/bench_compare.py [new.json] [baseline.json] [--tol 1.5]

Defaults: new = BENCH_detail.json, baseline = tools/bench_baseline.json.
Exit code 1 if any query regressed beyond tolerance (new > tol * old and
the absolute move exceeds 0.3 s — small queries swing multiplicatively on
a shared box). Single-run local[32] numbers carry ~20-30% noise; the
default tolerance of 1.5x is deliberately loose. Regenerate the baseline
after intentional changes:
    cp BENCH_detail.json tools/bench_baseline.json

Tolerance notes (investigated outliers — keep before widening tol):
  - r7 driver sweep showed q97_tpch_q6 0.14->1.20s and
    q96_columnar_partial_agg 0.21->1.47s (7-8x). Did NOT reproduce in r8:
    isolated 6-run mins 0.27/0.43s, full-sweep 0.17/0.24s — at baseline.
    Both queries share the global columnar partial agg, so the pattern
    looked systematic, but it was the driver sweep's run-order/JIT noise:
    a single cold sweep can hand one stage a compilation+GC hiccup and
    every sub-second query is ~100% scheduling overhead at sf0.1. Verdict:
    sub-second queries are only meaningful here via min-of-N or when the
    whole-sweep total moves too.
  - r8 driver sweep flagged q92_dedup_jaccard_capped 0.85->5.39s (6.3x),
    q91 2.4x, q95 1.5x, with 0 improvements and the whole sweep ~15%
    slow. Did NOT reproduce in r9: three isolated min-of-3 runs put q92
    at 1.04-1.07s (machine load 1.5-4.2 during the confirm runs — the
    box has background activity). The AQE-decided sizes joins did not
    flip plans; busy-box signature again. Bench now records
    loadavg_start in its JSON and this guard prints the noise signature
    when the pattern (scattered slowdowns, zero improvements, slowed
    total, loaded box) appears.
  - r9 driver sweep flagged q153_quality_classifier 0.70->1.10s (1.57x)
    with the same signature (load 1.9, whole sweep 1.14x slow, 0
    improvements). r10 confirm: in-sweep q153 0.74s (1.06x, guard 0
    regressed / 0 improved). An ISOLATED SPARK_GRAFT_BENCH_ONLY
    min-of-3 run showed 1.09s — NOT a regression but isolated-run
    bias: a single-query session pays ~0.3-0.4s of shared warmup
    (first shuffle / broadcast machinery init) that the committed
    in-sweep baseline amortizes across 180+ queries. Compare isolated
    numbers only with isolated numbers; in-sweep against the baseline.
  - Baseline refreshed r10 (2026-08-14, load 0.52): 79.2s full / 12.1s
    TPC-H over 185 queries. The prior 69.4s baseline (df456e3) was a
    load-0.16 outlier run: every sweep since (r9 driver 78.9s, three r10
    runs 78.9/79.2/79.4s at loads 0.5-1.7) lands at ~79s with scattered
    single-query flags that never reproduce (r10: q124 1.63x -> 0.81s on
    the next sweep). The box carries a steady ~14% background tax vs
    that outlier; treat ~79s as the comparable total.
  - r11 driver sweep flagged q146_tpch_q1_dec64 0.576->0.809s (1.41x) —
    the only flag sharing a code path with r11's computed-arg absorption.
    r12 quiet-box confirm (load ~2.2/32): two isolated min-of-5 runs gave
    0.682/0.659s = 1.15x of the in-sweep baseline, i.e. inside the
    isolated-run bias band documented above (q96's isolated min-of-5 read
    0.303 vs its 0.184 in-sweep baseline in the same session — 1.65x of a
    query whose code path did NOT change). The absorption A/B itself
    re-measured 0.58x (grouped-agg-argabsorb, min-of-5, columnar vs row).
    Verdict: no regression; judge by the r12 in-sweep number.
  - Baseline refreshed r12 (2026-08-15): per-query MIN of the r10 quiet
    baseline and the r12 end-of-round sweep (94.4s at load 1.9-3.2) —
    the min composition keeps the r10 values where the r12 sweep hit
    its mid-run load spike (the alphabetical q48-q57 block read 2-4x
    for one pass and cleared on min-of-5 isolated confirms) and adopts
    the r12 values where the round's decimal128/conditional agg work
    genuinely moved them (q87 0.83->0.58, q89 0.92->0.69, q146
    0.576->0.539 — the r11 watch item closed BELOW its old baseline).
    87.9s total / 11.7s TPC-H over 194 queries.
"""
import json
import sys


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tol = 1.5
    for a in sys.argv[1:]:
        if a.startswith("--tol"):
            tol = float(a.split("=", 1)[1]) if "=" in a else float(a[5:] or 1.5)
    new_path = args[0] if len(args) > 0 else "BENCH_detail.json"
    base_path = args[1] if len(args) > 1 else "tools/bench_baseline.json"
    new = json.load(open(new_path))
    base = json.load(open(base_path))
    nq, bq = new["queries"], base["queries"]

    regressed = []
    improved = []
    for name in sorted(set(nq) & set(bq)):
        n, b = nq[name], bq[name]
        if n > tol * b and n - b > 0.3:
            regressed.append((name, b, n))
        elif b > tol * n and b - n > 0.3:
            improved.append((name, b, n))
    for name in sorted(set(bq) - set(nq)):
        print(f"MISSING  {name} (in baseline, not in new run)")
    for name, b, n in improved:
        print(f"FASTER   {name}: {b:.2f}s -> {n:.2f}s")
    for name, b, n in regressed:
        print(f"SLOWER   {name}: {b:.2f}s -> {n:.2f}s ({n / b:.2f}x)")
    print(f"\n{len(regressed)} regressed / {len(improved)} improved / "
          f"{len(set(nq) & set(bq))} compared "
          f"(tol {tol}x; totals: baseline {base['value']:.1f}s -> new {new['value']:.1f}s; "
          f"tpch {base.get('tpch_total', 0):.1f}s -> {new.get('tpch_total', 0):.1f}s)")
    if regressed:
        markers = []
        total_ratio = new["value"] / base["value"] if base.get("value") else 1.0
        if not improved and total_ratio > 1.1:
            markers.append(f"whole sweep {total_ratio:.2f}x slower with 0 improvements")
        load = new.get("loadavg_start", -1.0)
        if load > 1.5:
            markers.append(f"box already loaded at bench start (1-min load {load:.1f})")
        if new.get("runs", 1) < 2:
            markers.append("single-run timings (no min-of-N)")
        if markers:
            print("NOISE-SIGNATURE: " + "; ".join(markers)
                  + " — confirm each flagged query with isolated min-of-N runs "
                  "on a quiet box before treating it as a plan regression "
                  "(r7 q96/q97 7-8x and r8 q92 6.3x both cleared this way)")
    return 1 if regressed or (set(bq) - set(nq)) else 0


if __name__ == "__main__":
    sys.exit(main())
