"""Partition-wise idempotent backfill over a partitioned table.

The batch counterpart of streaming/mv.py's incremental maintenance:
when upstream logic changes (a fixed quality rule, a new dedup pass) or
a partition is found corrupt, a 100 TB table is never rebuilt whole —
the affected partitions are recomputed and swapped atomically while
every other partition's files stay untouched.

Mechanics: Spark's DYNAMIC partition-overwrite mode replaces exactly
the partitions present in the written frame. The runner therefore (a)
filters the rebuild frame to the requested partition values — so a
buggy build_fn cannot clobber partitions outside the requested set —
and (b) restores the session's previous overwrite mode afterward
(hostile-session discipline). Each overwritten partition is all-or-
nothing at the directory level; re-running the same backfill is a
no-op by construction (same inputs → same bytes).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def backfill_partitions(
    spark: SparkSession,
    build: Callable[[SparkSession], DataFrame],
    table_path: str,
    part_col: str,
    values: list,
) -> dict:
    """Recompute ``values``' partitions of ``table_path`` from
    ``build``'s output. Returns {"partitions", "rows_written"}."""
    if not values:
        return {"partitions": 0, "rows_written": 0}
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        out = build(spark).filter(F.col(part_col).isin(*values))
        out = out.persist()
        n = out.count()
        (
            out.write.mode("overwrite")
            .partitionBy(part_col)
            .parquet(table_path)
        )
        out.unpersist()
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return {"partitions": len(values), "rows_written": n}


def upsert_partitioned(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    key: str,
    part_col: str,
) -> dict:
    """Row-level MERGE-shaped upsert into a partitioned parquet table
    without a transactional format: rows in ``updates`` replace
    same-``key`` rows and append otherwise, touching ONLY the
    partitions the updates land in.

    Mechanics: the touched partition values come from ``updates`` (one
    tiny distinct), the current contents of just those partitions are
    read back (partition-pruned scan), updates win by anti-joining the
    old rows on ``key``, and the merged result dynamic-overwrites the
    touched partitions. Untouched partitions' files are never opened.
    A key that MOVES partitions must be handled upstream (delete+insert)
    — same as Hive-style MERGE; documented, not hidden.

    Returns {"partitions", "rows_written"}.
    """
    parts = [r[0] for r in updates.select(part_col).distinct().collect()]
    if not parts:
        return {"partitions": 0, "rows_written": 0}
    current = spark.read.parquet(table_path).filter(
        F.col(part_col).isin(*parts)
    )
    survivors = current.join(
        updates.select(F.col(key).alias("__uk")).distinct(),
        current[key] == F.col("__uk"),
        "left_anti",
    )
    # localCheckpoint (eager): the write below overwrites the very files
    # `merged` reads, so its lineage must be SEVERED, not merely cached —
    # a cache eviction mid-write would otherwise recompute from
    # partially-overwritten inputs
    merged = survivors.unionByName(
        updates.select(*current.columns)
    ).localCheckpoint(eager=True)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        n = merged.count()
        (
            merged.write.mode("overwrite")
            .partitionBy(part_col)
            .parquet(table_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return {"partitions": len(parts), "rows_written": n}


def delete_keys_partitioned(
    spark: SparkSession,
    table_path: str,
    keys: DataFrame,
    key: str,
    part_col: str,
) -> dict:
    """Row-level delete by key, touching only the partitions named in
    ``keys`` (which must carry both ``key`` and ``part_col``): the
    partition-pruned read-back drops matching rows via anti-join and
    dynamic-overwrites just those partitions. Same eager-localCheckpoint
    lineage severing as upsert_partitioned; naturally idempotent."""
    parts = [r[0] for r in keys.select(part_col).distinct().collect()]
    if not parts:
        return {"partitions": 0, "rows_written": 0}
    current = spark.read.parquet(table_path).filter(
        F.col(part_col).isin(*parts)
    )
    survivors = current.join(
        keys.select(F.col(key).alias("__dk")).distinct(),
        current[key] == F.col("__dk"),
        "left_anti",
    ).localCheckpoint(eager=True)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        n = survivors.count()
        (
            survivors.write.mode("overwrite")
            .partitionBy(part_col)
            .parquet(table_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return {"partitions": len(parts), "rows_written": n}
