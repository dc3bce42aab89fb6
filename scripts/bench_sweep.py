#!/usr/bin/env python
"""Once-per-round SINGLE-PASS sweep over every registered query that is
in NO bench group (headline / TPC-H / extended) — a hot-spot smoke, not
a benchmark: bench.py's median-of-3 discipline stays reserved for the
longitudinal groups, while this catches the q_assoc_rules-style cache
miss (a key that quietly costs multiples of its family) in keys nobody
times otherwise.

Usage:  python scripts/bench_sweep.py  [--threshold 2.0]

Prints one JSON line: {"metric": "bench_sweep", "n": ..., "sf": ...,
"total": ..., "slow": {name: sec over threshold}, "queries": {...}}.
Pin any `slow` entry in docs/BENCH_NOTES.md (or fix it).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import bench  # noqa: E402  (HEADLINE/TPCH/EXTENDED group membership)
from streaming_data_ingestion_spark.registry import all_queries  # noqa: E402
from streaming_data_ingestion_spark.session import get_spark  # noqa: E402
from streaming_data_ingestion_spark.tables import TABLES, load  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=2.0)
    ap.add_argument(
        "--no-write", action="store_true",
        help="print only; skip the docs/BENCH_SWEEP_r{N}.json artifact",
    )
    ap.add_argument(
        "--round", type=int, default=None,
        help="override the artifact round number (default: the build "
        "round from PROGRESS.jsonl)",
    )
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    grouped = set(bench.HEADLINE) | set(bench.TPCH) | set(bench.EXTENDED)
    specs = all_queries()
    rest = sorted(n for n in specs if n not in grouped)

    spark = get_spark(app_name="sdi-bench-sweep")
    for t in TABLES:
        load(spark, sf_dir, t).limit(1).count()

    timings: dict[str, float] = {}
    for name in rest:
        t0 = time.perf_counter()
        specs[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        timings[name] = round(time.perf_counter() - t0, 3)

    slow = {
        n: s
        for n, s in sorted(timings.items(), key=lambda kv: -kv[1])
        if s > args.threshold
    }
    payload = {
        "metric": "bench_sweep",
        "n": len(timings),
        "sf": sf,
        "total": round(sum(timings.values()), 3),
        "threshold": args.threshold,
        "slow": slow,
        "queries": dict(sorted(timings.items(), key=lambda kv: -kv[1])),
    }
    print(json.dumps(payload))

    # persist the per-round artifact so sweep diffs are mechanical
    # (tests/test_bench.py pins this format); round = the build round
    # from PROGRESS.jsonl via keydigest.current_round() — NOT
    # max(CORRECTNESS)+1, which mislabels the artifact when the sweep
    # runs after the round's CORRECTNESS file has landed (ADVICE r9).
    # --round overrides for out-of-band runs.
    if not args.no_write:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from keydigest import current_round

        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        rno = args.round if args.round is not None else current_round()
        dest = os.path.join(here, "docs", f"BENCH_SWEEP_r{rno}.json")
        with open(dest, "w") as fh:
            json.dump(payload, fh)
            fh.write("\n")
        print(f"wrote {dest}", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
