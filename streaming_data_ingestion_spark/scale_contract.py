"""THE scale-certification skip contract — single source of truth.

Three artifacts used to carry their own copies of "which keys are
excused from 10x+ gates and why" (the CLAUDE.md sf1 drive command, the
scale_stress key selection, prose in docs/SCALE.md + BENCH_NOTES).
Round 11 consolidates them here: scripts read these tuples, docs point
at this module, and a key can only be excused for one of the two
reasons below — each a property of the ORACLE or the DATA MODEL, never
of the engine.

**Label-cell diagnostics** (`LABEL_CELL_DIAGNOSTIC_KEYS`): calibration
keys whose candidate scope is the fixture's 10 fixed label cells, so
pair volume grows with Σ n_cell² — quadratic in corpus size BY DESIGN,
on both engines. They exist to calibrate thresholds (pair histograms,
k-NN graphs, keep/drop decisions) on bounded corpora; the production
path for the same question is the banded-LSH family
(`q_emb_neardup_lsh*`), whose width policy holds candidates ~linear
(docs/SCALE.md round-11 section). Measured: q_emb_neardup rode 124.8x
wall on the sf0.1→sf1 decade (docs/BENCH_SWEEP_sf1.json) — the expected
behavior of its contract, not a defect. These keys stay REGISTERED and
hash-certified at sf ≤ 0.1 (the driver's own gate); they are skipped in
sf1+ hash gates and decade-step timing sweeps.

**Oracle-capacity skips** (`ORACLE_CAPACITY_KEYS`): keys whose SPARK
side scales fine but whose DuckDB oracle must materialize an
intermediate the comparison box cannot hold. q_cross_dedup measured
5.1x (within limits) on the Spark side at sf1, while its oracle's pair
materialization exceeded an 80 GB spill cap. Skipped in sf1+ HASH
gates only — timing sweeps still run them (the Spark side is the thing
being timed).
"""

from __future__ import annotations

LABEL_CELL_DIAGNOSTIC_KEYS: tuple[str, ...] = (
    "q_emb_neardup",
    "q_semdedup",
    "q_sim_knn_graph",
    "q_sim_pair_hist",
)

ORACLE_CAPACITY_KEYS: tuple[str, ...] = ("q_cross_dedup",)

# Oracle-capacity keys that appear ONLY under skewed data at sf1+:
# multi-touch attribution's path set is (purchases × clicks-in-lookback)
# PER USER — linear in n under uniform users (hash-green at plain sf1,
# r10 gate) but quadratic in the hot user's activity when one user owns
# ~30% of events. The SPARK side still completes (3-row aggregate;
# shuffle spills are executor-bounded); DuckDB's join materialization
# blew a 40 GB spill cap at sf1-skew (round-11 BENCH_NOTES). The 100 TB
# production mitigation is a per-conversion touch cap (credit only the
# last N touches — one ROW_NUMBER predicate before crediting); the
# registered key keeps exact uncapped semantics, so the skew cell is an
# oracle-capacity skip, not an engine one.
SKEW_QUADRATIC_ORACLE_KEYS: tuple[str, ...] = ("q_attribution_ushape",)


def scale_hash_gate_skips(skewed: bool = False) -> tuple[str, ...]:
    """Keys excused from sf1+ HASH-exact oracle gates
    (drive_contract --skip-scale-contract). ``skewed=True`` adds the
    keys whose oracle is quadratic only under hot-key data."""
    base = LABEL_CELL_DIAGNOSTIC_KEYS + ORACLE_CAPACITY_KEYS
    return base + SKEW_QUADRATIC_ORACLE_KEYS if skewed else base


def decade_sweep_skips() -> tuple[str, ...]:
    """Keys excused from decade-step TIMING sweeps (scale_stress):
    only the label-cell family — quadratic wall is their documented
    contract, so re-measuring it is wasted hours; oracle-capacity keys
    still time fine (no oracle runs in a sweep)."""
    return LABEL_CELL_DIAGNOSTIC_KEYS
