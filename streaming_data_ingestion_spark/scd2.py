"""SCD type-2 snapshot merge — the MAINTENANCE half of the dimension-
history story (``q_scd2_intervals`` builds intervals from a change log;
this merges a fresh SNAPSHOT into a stored history table).

Given the current history (key, attrs…, valid_from, valid_to — NULL
valid_to = open/current row) and a new full snapshot stamped ``as_of``:

- key present, attrs unchanged   → history passes through untouched
- key present, attrs changed     → open row closes at ``as_of``, a new
                                   open row starts at ``as_of``
- key new                        → new open row at ``as_of``
- key missing from the snapshot  → untouched by default; with
                                   ``close_missing=True`` the open row
                                   closes at ``as_of`` (logical delete)

Scale shape: closed history rows never shuffle (they pass through on a
union); the only wide work is ONE full-outer equi join of the OPEN rows
(≈ one row per live key) against the snapshot on the key. Deterministic:
pure column logic, no RNG, no time lookups — ``as_of`` is a parameter,
so replaying the merge is bit-identical (and merging the same snapshot
twice is a no-op, tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_scd2(
    history: DataFrame,
    snapshot: DataFrame,
    key: str,
    attrs: list[str],
    as_of,
    close_missing: bool = False,
) -> DataFrame:
    """Return the merged history (same schema as ``history``)."""
    closed = history.filter(F.col("valid_to").isNotNull())
    open_rows = history.filter(F.col("valid_to").isNull())

    snap = snapshot.select(
        F.col(key).alias("_sk"),
        *[F.col(a).alias(f"_sa_{a}") for a in attrs],
    )
    j = open_rows.join(snap, open_rows[key] == F.col("_sk"), "full_outer")

    same = F.lit(True)
    for a in attrs:
        same = same & (F.col(a).eqNullSafe(F.col(f"_sa_{a}")))

    in_hist = F.col(key).isNotNull()
    in_snap = F.col("_sk").isNotNull()
    as_of_lit = F.lit(as_of).cast("timestamp")

    # surviving open/closed versions of previously-open rows
    prior = j.filter(in_hist).select(
        key,
        *attrs,
        "valid_from",
        F.when(in_snap & ~same, as_of_lit)
        .when(~in_snap & F.lit(close_missing), as_of_lit)
        .otherwise(F.lit(None).cast("timestamp"))
        .alias("valid_to"),
    )
    # new open rows: changed keys + brand-new keys
    fresh = j.filter(in_snap & (~in_hist | ~same)).select(
        F.col("_sk").alias(key),
        *[F.col(f"_sa_{a}").alias(a) for a in attrs],
        as_of_lit.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    return closed.select(
        key, *attrs, "valid_from", "valid_to"
    ).unionByName(prior).unionByName(fresh)
