#!/usr/bin/env python
"""Generate the OPTIMIZATION_r12.md mechanical tables: per-key
baseline-vs-close bench diff grouped by module, biggest movers, and the
plan-shape delta table from plans/r12/*_{before,after}.txt.

Usage: python scripts/r12_report_tables.py FINAL_BENCH.json [FINAL_SWEEP.json]
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streaming_data_ingestion_spark.registry import all_queries


def flat(bench: dict) -> dict:
    out = {}
    for g in ("queries", "tpch", "extended"):
        out.update(bench.get(g, {}))
    return out


def main() -> int:
    base = flat(json.load(open("docs/BENCH_R12_BASELINE.json")))
    fin = flat(json.load(open(sys.argv[1])))
    sweep = {}
    if len(sys.argv) > 2:
        sweep = json.load(open(sys.argv[2])).get("queries", {})

    mods = {}
    for k, v in all_queries().items():
        m = getattr(v.fn, "__wrapped__", v.fn).__module__.rsplit(".", 1)[-1]
        mods.setdefault(m, []).append(k)

    # --- movers table (abs delta >= 0.3s) ---
    movers = sorted(
        ((k, base[k], fin[k]) for k in base if k in fin and abs(base[k] - fin[k]) >= 0.3),
        key=lambda t: t[2] - t[1],
    )
    print("### MOVERS")
    print("| key | baseline s | close s | ratio |")
    print("|---|---|---|---|")
    for k, b, f in movers:
        print(f"| {k} | {b:.2f} | {f:.2f} | {f / b:.2f}x |")

    # --- per-module totals ---
    print("\n### MODULE TOTALS (bench-grouped keys only)")
    print("| module | keys timed | baseline s | close s |")
    print("|---|---|---|---|")
    for m in sorted(mods):
        ks = [k for k in mods[m] if k in base and k in fin]
        if not ks:
            continue
        tb, tf = sum(base[k] for k in ks), sum(fin[k] for k in ks)
        print(f"| {m} | {len(ks)} | {tb:.1f} | {tf:.1f} |")

    # --- sweep (non-bench keys) ---
    if sweep:
        slow = {k: v for k, v in sweep.items() if v >= 2.0}
        print(f"\n### SWEEP n={len(sweep)} total={sum(sweep.values()):.1f}s  over-2s={json.dumps(slow)}")

    # --- plan diffs ---
    print("\n### PLANDIFF")
    print("| key | Exchange before→after | Python nodes |")
    print("|---|---|---|")
    for b in sorted(glob.glob("plans/r12/*_before.txt")):
        key = os.path.basename(b)[: -len("_before.txt")]
        a = f"plans/r12/{key}_after.txt"
        if not os.path.exists(a):
            continue

        def cnt(p):
            t = open(p).read()
            return (
                len(re.findall(r"\bExchange\b", t)),
                len(re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow", t)),
            )

        (eb, pb), (ea, pa) = cnt(b), cnt(a)
        if (eb, pb) != (ea, pa):
            print(f"| {key} | {eb} → {ea} | {pb} → {pa} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
