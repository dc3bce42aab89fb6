#!/usr/bin/env python
"""Measure heavy-tail keys across a decade of scale (verdict r9 #2).

Times each selected key at sf0.1 (driver fixtures) and sf1 (the 10×
set from make_scale_fixtures.py) in ONE Spark session — warm-up pass
then median of N timed passes per (key, sf), same discipline as
bench.py — and reports the growth ratio. A key scaling linearly should
ride ~10× on 10× data; the written artifact flags anything past
--ratio-limit (default 12×, giving headroom for fixed per-query
overheads to wash out).

Usage: python scripts/scale_stress.py [--keys k1,k2|auto] [--top 15]
                                      [--passes 3] [--ratio-limit 12]
Writes docs/BENCH_SWEEP_sf1.json. Run EXCLUSIVELY (no concurrent Spark).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def slowest_keys(top: int) -> list[str]:
    """Top-N slowest keys across the latest bench detail + sweep
    artifacts — the heavy tail the verdict asks to stress."""
    import glob
    import re

    times: dict[str, float] = {}
    benches = sorted(
        glob.glob(os.path.join(HERE, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
    )
    if benches:
        data = json.load(open(benches[-1]))
        for grp in ("queries", "tpch", "extended"):
            times.update(data.get(grp) or {})
    sweeps = sorted(glob.glob(os.path.join(HERE, "docs", "BENCH_SWEEP_r*.json")))
    if sweeps:
        times.update(json.load(open(sweeps[-1])).get("queries") or {})
    ranked = sorted(times.items(), key=lambda kv: -kv[1])
    return [k for k, _ in ranked[:top]]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", default="auto")
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--ratio-limit", type=float, default=12.0)
    ap.add_argument("--factor", type=float, default=10.0)
    ap.add_argument(
        "--slow-cutoff", type=float, default=60.0,
        help="if the warm-up pass exceeds this many seconds, record that "
        "single measured pass instead of running the timed medians — the "
        "measurement (a blowup) is already made; repeating it 3 more "
        "times adds wall-clock, not information",
    )
    ap.add_argument(
        "--decade", default="sf0.1:sf1",
        help="LO:HI pair to compare. Names resolve to /root/testdata "
        "(lo) / .scale (hi); 'sf1:sf10' measures the SECOND decade "
        "(both sides under .scale, hi derived from lo on demand). The "
        "artifact becomes docs/BENCH_SWEEP_<hi>.json",
    )
    args = ap.parse_args()

    import make_scale_fixtures

    from streaming_data_ingestion_spark.registry import all_queries
    from streaming_data_ingestion_spark.session import get_spark
    from streaming_data_ingestion_spark.tables import TABLES, load

    lo_name, hi_name = args.decade.split(":")
    if lo_name == "sf0.1":
        sf01_dir = "/root/testdata/sf0.1"
        sf1_dir = make_scale_fixtures.build()
    else:
        sf01_dir = make_scale_fixtures.build(dest_name=lo_name)
        sf1_dir = make_scale_fixtures.build(
            f".scale/{lo_name}", dest_name=hi_name
        )
    lo_label, hi_label = lo_name, hi_name

    specs = all_queries()
    if args.keys == "auto":
        from streaming_data_ingestion_spark.scale_contract import (
            decade_sweep_skips,
        )

        skips = set(decade_sweep_skips())
        ranked = [k for k in slowest_keys(args.top) if k in specs]
        keys = [k for k in ranked if k not in skips]
        dropped = [k for k in ranked if k in skips]
        if dropped:
            # no silent caps: the label-cell diagnostics are excused
            # (quadratic-by-contract), and the record says so
            print(
                f"contract-skipped (scale_contract.decade_sweep_skips): "
                f"{dropped}",
                flush=True,
            )
    else:
        keys = args.keys.split(",")

    # 10× data + ~50 back-to-back heavy passes in one session needs more
    # than Spark's 1g default local heap (the first full run OOMed the
    # shared driver/executor JVM on key #12)
    spark = get_spark(
        app_name="sdi-scale-stress",
        extra_conf={"spark.driver.memory": "6g"},
    )
    for sf_dir in (sf01_dir, sf1_dir):
        for t in TABLES:
            load(spark, sf_dir, t).limit(1).count()

    def run_once(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        specs[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    results: dict[str, dict] = {}
    for name in keys:
        row: dict[str, float] = {}
        for label, sf_dir in ((lo_label, sf01_dir), (hi_label, sf1_dir)):
            try:
                warm = run_once(name, sf_dir)  # warm-up (compile, builds)
                if warm > args.slow_cutoff:
                    row[label] = round(warm, 3)
                    row[f"{label}_note"] = "single pass (over slow-cutoff)"
                    continue
                samples = [
                    run_once(name, sf_dir) for _ in range(args.passes)
                ]
                row[label] = round(statistics.median(samples), 3)
            except Exception as e:  # noqa: BLE001
                row[label] = -1.0
                row[f"{label}_error"] = f"{type(e).__name__}: {e}"[:200]
        if row.get(lo_label, 0) > 0 and row.get(hi_label, 0) > 0:
            row["ratio"] = round(row[hi_label] / row[lo_label], 2)
        results[name] = row
        print(f"{name}: {row}", flush=True)

    dest = os.path.join(HERE, "docs", f"BENCH_SWEEP_{hi_label}.json")
    # merge into an existing artifact so a targeted --keys rerun (e.g.
    # after a session crash) fills gaps instead of erasing the record
    merged = dict(results)
    if os.path.exists(dest):
        try:
            prior = json.load(open(dest)).get("queries") or {}
            merged = {**prior, **results}
        except (OSError, json.JSONDecodeError):
            pass
    over = {
        k: v["ratio"]
        for k, v in merged.items()
        if v.get("ratio", 0) > args.ratio_limit
    }
    payload = {
        "metric": "scale_stress",
        "factor": args.factor,
        "ratio_limit": args.ratio_limit,
        "passes": args.passes,
        "over_limit": over,
        "queries": merged,
    }
    with open(dest, "w") as fh:
        json.dump(payload, fh, indent=1)
        fh.write("\n")
    print(json.dumps({k: v for k, v in payload.items() if k != "queries"}))
    print(f"wrote {dest}", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
