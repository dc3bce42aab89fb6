"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``streaming_data_ingestion_spark`` package;
this module only adapts its query registry to the driver's shape.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

from streaming_data_ingestion_spark.registry import all_queries  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    specs = all_queries()
    return specs["q_agg_group"].fn(spark, SMOKE_SF_DIR)


# ---------------------------------------------------------------------------
# Driver-window rotation — COMPUTED from the CORRECTNESS artifacts.
#
# The driver verifies the FIRST 50 keys of queries() each round. Rounds 3
# and 4 both shipped hand-maintained window tuples, and both times the
# judge had to flag staleness risk (a window full of already-green keys
# while unverified keys waited outside). This rotation is now derived
# from the recorded CORRECTNESS_r*.json files themselves, so it can never
# go stale again:
#
#   priority 1 — keys whose LATEST driver row failed (error or mismatch):
#                they have no standing green result and must re-run first;
#   priority 2 — keys with NO driver row in any round (new operators),
#                LONGEST-WAITING first: keys that were already registered
#                when the last recorded round ran (they have waited a full
#                round for a slot) go ahead of keys added since;
#   priority 3 — everything else, oldest-verified round first (name as
#                tie-break), so window slack continuously re-confirms the
#                stalest green results.
#
# A row counts as satisfied when rows/schema/hash all matched, or when it
# is the by-contract rows-only case (err == "no_oracle" with rows
# recorded). The ordering depends only on the artifact files present at
# import — deterministic within a round, and automatically correct in
# every future round.
# ---------------------------------------------------------------------------


def _satisfied(row: dict) -> bool:
    if not isinstance(row, dict):
        return False
    if row.get("err") == "no_oracle":
        return row.get("spark_rows") is not None
    return (
        row.get("rows_match") is True
        and row.get("schema_match") is True
        and row.get("hash_match") is True
    )


# Registration ledger: key -> round the key first appeared in the
# registry (scripts/update_ledger.py stamps new keys; the rotation test
# fails if the ledger falls behind). Inside the never-driver-checked
# bucket, LONGEST-WAITING (smallest round) keys win window slots over
# operators registered later — the dynamic replacement for round 5's
# frozen _WAITING_SINCE_R4 literal, which went inert the moment its 36
# keys turned green and would have let each round's alphabetically-early
# new keys displace the previous round's still-waiting ones forever.
def _waiting_rounds() -> dict[str, int]:
    try:
        return json.load(open(os.path.join(_HERE, "registry_ledger.json")))
    except (OSError, json.JSONDecodeError):
        return {}


# Re-verify queue: key -> round in which the key's ORACLE or semantics
# changed after it already held a driver green (e.g. round 7 rewrote
# q_js_divergence's formulation and q_assoc_rules' oracle gained the
# width cap). A standing green from an earlier round certifies the OLD
# definition, so the rotation ranks these right after never-checked keys
# until a green lands in a round >= the stamped one — self-clearing, no
# manual cleanup (the stamp only bites while last-green < stamp).
def _reverify_rounds() -> dict[str, int]:
    try:
        return json.load(open(os.path.join(_HERE, "reverify_queue.json")))
    except (OSError, json.JSONDecodeError):
        return {}


def _rotation(names: list[str]) -> list[str]:
    last_ok: dict[str, int] = {}  # key -> latest round with a green row
    last_seen: dict[str, int] = {}  # key -> latest round with ANY row
    for path in sorted(glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if not m:
            continue
        rno = int(m.group(1))
        try:
            data = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        for k, row in data.items():
            if k not in names:
                continue
            last_seen[k] = max(last_seen.get(k, 0), rno)
            if _satisfied(row):
                last_ok[k] = max(last_ok.get(k, 0), rno)

    waiting = _waiting_rounds()
    reverify = _reverify_rounds()

    def bucket(k: str) -> tuple:
        seen, ok = last_seen.get(k), last_ok.get(k)
        if seen is not None and (ok is None or ok < seen):
            return (0, 0, k)  # latest row failed — re-verify first
        if seen is None:
            # never driver-checked: longest-waiting (earliest-registered
            # per the ledger) first; unstamped keys are newest-possible
            return (1, waiting.get(k, 10**9), k)
        if ok is not None and ok < reverify.get(k, 0):
            # green, but the definition changed after that green landed:
            # re-certify before re-confirming untouched stale greens
            return (2, reverify[k], k)
        return (3, ok, k)  # green — stalest round first

    return sorted(names, key=bucket)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2B, ordered so
    the driver's 50-key window always covers failed/new keys first."""
    specs = all_queries()
    ordered = _rotation(list(specs))
    assert len(ordered) == len(specs), "rotation must be a permutation"
    return {n: specs[n].fn for n in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query; rows-only queries omitted."""
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
