"""Incremental materialized-view maintenance via foreachBatch merge.

The pattern: a streaming source feeds an AGGREGATE table (here: daily
event counts per type) that downstream dashboards/joins read as plain
parquet. Instead of recomputing the aggregate from all history every
time (a full 100 TB scan per refresh), each micro-batch:

1. partially aggregates ITS OWN rows (micro-batch-sized work),
2. reads back only the affected partition keys from the table,
3. merges (sum) and dynamically overwrites exactly those partitions.

Cost per refresh is O(batch + touched-partition), independent of table
history — the property that makes a continuously-maintained 100 TB
rollup feasible. Exactly-once under replay: a read-merge-overwrite is
NOT naturally idempotent (re-running an epoch whose write already landed
would re-add the delta), so every stored row carries a ``last_epoch``
marker; a replayed epoch skips any day partition already stamped with
its own epoch id and merges only the rest — per-partition idempotence
even when a crash landed some partitions but not others. The checkpoint
prevents cross-restart re-processing.

The invariant the test pins: after any sequence of micro-batches, the
maintained table EQUALS the from-scratch batch aggregate over the same
input (modulo the ``last_epoch`` metadata column) — streaming prefix
consistency materialized.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from streaming_data_ingestion_spark.compat import DEC

_EPOCH_COL = "last_epoch"


def _day_member(days: list):
    """Null-safe day-membership predicate: ``isin`` never matches NULL,
    which would silently drop an existing null-day partition's counts
    from the merge while the delta still overwrote that partition."""
    non_null = [d for d in days if d is not None]
    cond = F.col("day").isin(non_null) if non_null else F.lit(False)
    if len(non_null) != len(days):
        cond = cond | F.col("day").isNull()
    return cond


def _read_existing(spark: SparkSession, table_path: str, member):
    """Read the touched slice of the table; None only if the table truly
    does not exist yet. Any OTHER read failure propagates — swallowing a
    transient listing error here would make the merge treat a populated
    table as empty and dynamically overwrite history with one batch's
    delta."""
    try:
        return spark.read.parquet(table_path).filter(member)
    except AnalysisException as e:
        msg = str(e)
        if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
            return None
        raise


def _merge_idempotent(
    delta: DataFrame,
    table_path: str,
    key_cols: list[str],
    sum_cols: list[str],
    part_cols: list[str],
    epoch_id: int,
) -> None:
    """Shared merge core: per-day epoch markers make micro-batch replay
    a no-op for partitions the same epoch already wrote."""
    spark = delta.sparkSession
    delta.persist()
    existing = None
    try:
        days = [r["day"] for r in delta.select("day").distinct().collect()]
        if not days:
            return
        existing = _read_existing(spark, table_path, _day_member(days))
        if existing is not None:
            existing.persist()
            applied = {
                r["day"]
                for r in existing.filter(F.col(_EPOCH_COL) == epoch_id)
                .select("day")
                .distinct()
                .collect()
            }
        else:
            applied = set()
        merge_days = [d for d in days if d not in applied]
        if not merge_days:
            return  # full replay: every touched partition already stamped
        member = _day_member(merge_days)
        delta_m = delta.filter(member)
        if existing is not None:
            merged = (
                delta_m.unionByName(existing.filter(member).drop(_EPOCH_COL))
                .groupBy(*key_cols)
                .agg(*[F.sum(c).alias(c) for c in sum_cols])
            )
        else:
            merged = delta_m
        (
            merged.withColumn(_EPOCH_COL, F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*part_cols)
            .parquet(table_path)
        )
    finally:
        if existing is not None:
            existing.unpersist()
        delta.unpersist()


def _daily_counts(df: DataFrame) -> DataFrame:
    return (
        df.select(F.col("ts").cast("date").alias("day"), "event_type")
        .groupBy("day", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def merge_daily_counts(table_path: str):
    """foreachBatch writer: merge this batch's partial daily counts into
    the parquet table, touching only the affected day partitions."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        _merge_idempotent(
            _daily_counts(batch_df),
            table_path,
            key_cols=["day", "event_type"],
            sum_cols=["n"],
            part_cols=["day"],
            epoch_id=epoch_id,
        )

    return write_batch


def maintain_daily_counts(
    events_stream: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously maintain the daily (day, event_type, n) rollup from
    an events stream. Read the result as plain parquet at ``table_path``."""
    writer = (
        events_stream.writeStream.foreachBatch(merge_daily_counts(table_path))
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# --------------------------------------------------------------------------
# Multi-grain rollup maintenance — the incremental twin of the batch
# q_time_rollup (queries/streaming_analogs.py): hour AND day grains
# maintained in one foreachBatch merge.
# --------------------------------------------------------------------------

def _rollup(df: DataFrame) -> DataFrame:
    """Both grains of the time rollup for ONE batch of events — the same
    GROUPING SETS single-pass shape as q_time_rollup, but the value sum
    stays DECIMAL(38,10): decimal addition is associative, so merging
    per-batch partials in any order lands bit-identical to the one-shot
    batch aggregate (a double sum would drift with merge order)."""
    ev = df.select(
        F.date_trunc("day", "ts").alias("d"),
        F.date_trunc("hour", "ts").alias("h"),
        "event_type",
        F.col("value").cast(DEC).alias("v"),
    )
    return (
        ev.groupingSets(
            [["d", "event_type"], ["d", "h", "event_type"]],
            "d",
            "h",
            "event_type",
        )
        .agg(
            F.grouping("h").cast("int").alias("_g_h"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v").alias("sum_value"),
        )
        .select(
            F.when(F.col("_g_h") == 1, "1d").otherwise("1h").alias("grain"),
            F.coalesce("h", "d").alias("bucket_start"),
            F.col("d").cast("date").alias("day"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def merge_rollup(table_path: str):
    """foreachBatch writer: merge this batch's partial two-grain rollup
    into the parquet table, dynamically overwriting only the touched
    (grain, day) partitions — O(batch + touched-partition) per refresh,
    independent of history, and idempotent under micro-batch replay."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        _merge_idempotent(
            _rollup(batch_df),
            table_path,
            key_cols=["grain", "bucket_start", "day", "event_type"],
            sum_cols=["n_events", "sum_value"],
            part_cols=["grain", "day"],
            epoch_id=epoch_id,
        )

    return write_batch


def maintain_time_rollup(
    events_stream: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously maintain the two-grain time rollup. Readers see the
    identical relation the batch q_time_rollup computes (modulo the
    decimal value type and the partition-key day column), partitioned by
    (grain, day) so a dashboard's "today, hourly" read prunes to one
    directory."""
    writer = (
        events_stream.writeStream.foreachBatch(merge_rollup(table_path))
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
