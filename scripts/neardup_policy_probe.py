#!/usr/bin/env python
"""Measure the banded-LSH near-dup key across the sf0.1 → sf1 decade,
fixed-width vs production policy (round 10).

q_emb_neardup's sf1 decomposition (docs/BENCH_NOTES.md) showed WHY a
bounded-candidate scheme is needed: its label cells grow with the
corpus, so pairs grow quadratically. q_emb_neardup_lsh exposes the
lever — band width (sign bits per band). This probe measures BOTH
settings at both scales:

* fixed width (the registered binding's 10 bits): bucket population
  grows with n, candidates grow ~(10x)^2/2^10-ish — the shape any LSH
  with static params has;
* production policy (width ~ log2(n) + c: 10 bits at 2k vectors →
  13-14 bits at 20k): bucket population held ~constant, candidates and
  wall-clock ride ~linearly.

Writes a markdown-ready table to stdout; results are pinned in
docs/BENCH_NOTES.md. Run EXCLUSIVELY (no concurrent Spark).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    import make_scale_fixtures

    from streaming_data_ingestion_spark.queries.llm_similarity import (
        emb_neardup_lsh,
    )
    from streaming_data_ingestion_spark.session import get_spark

    sf1_dir = make_scale_fixtures.build()
    sf01_dir = "/root/testdata/sf0.1"

    spark = get_spark(app_name="neardup-policy-probe")

    runs = [
        # (label, sf_dir, rows_per_band)
        ("sf0.1 fixed r=10 (registered binding)", sf01_dir, 10),
        ("sf1   fixed r=10 (static params at 10x)", sf1_dir, 10),
        ("sf1   policy r=13 (log2-scaled width)", sf1_dir, 13),
        ("sf1   policy r=14 (log2-scaled width)", sf1_dir, 14),
    ]
    out = []
    for label, sf_dir, r in runs:
        # CANDIDATE population (threshold -2 keeps every scored pair) is
        # what the width policy bounds; surviving pairs additionally
        # reflect recall at the 0.35 cut — report both so a recall drop
        # cannot masquerade as boundedness
        n_cand = emb_neardup_lsh(
            spark, sf_dir, rows_per_band=r, threshold=-2.0
        ).count()
        df = emb_neardup_lsh(spark, sf_dir, rows_per_band=r)
        df.count()  # warm-up (scan caches, codegen)
        times = []
        for _ in range(3):
            t0 = time.monotonic()
            n_pairs = df.count()
            times.append(time.monotonic() - t0)
        med = statistics.median(times)
        out.append((label, r, n_cand, n_pairs, med))
        print(
            f"{label}: candidates={n_cand} surviving_pairs={n_pairs} "
            f"median={med:.2f}s",
            flush=True,
        )

    print("\n| run | bits/band | candidates | surviving pairs | median s |")
    print("|---|---|---|---|---|")
    for label, r, n_cand, n_pairs, med in out:
        print(f"| {label} | {r} | {n_cand} | {n_pairs} | {med:.2f} |")
    base_t, base_c = out[0][4], out[0][2]
    print(
        f"\nfixed-width decade ratios (data 10x): candidates "
        f"{out[1][2] / base_c:.1f}x, wall {out[1][4] / base_t:.1f}x; "
        f"policy r=13: candidates {out[2][2] / base_c:.1f}x, wall "
        f"{out[2][4] / base_t:.1f}x; policy r=14: candidates "
        f"{out[3][2] / base_c:.1f}x, wall {out[3][4] / base_t:.1f}x"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
