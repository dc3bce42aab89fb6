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
rollup feasible. Exactly-once: the dynamic partition overwrite keyed on
day is idempotent under Spark's micro-batch retry (a replayed batch
recomputes the same merged result and rewrites the same partitions),
and the checkpoint prevents cross-restart re-processing.

The invariant the test pins: after any sequence of micro-batches, the
maintained table EQUALS the from-scratch batch aggregate over the same
input — streaming prefix consistency materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


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
        spark = batch_df.sparkSession
        delta = _daily_counts(batch_df)
        delta.persist()
        try:
            days = [r["day"] for r in delta.select("day").distinct().collect()]
            if not days:
                return
            try:
                existing = spark.read.parquet(table_path).filter(
                    F.col("day").isin(days)
                )
                merged = (
                    delta.unionByName(existing)
                    .groupBy("day", "event_type")
                    .agg(F.sum("n").alias("n"))
                )
            except Exception:
                # first batch: table does not exist yet
                merged = delta
            (
                merged.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("day")
                .parquet(table_path)
            )
        finally:
            delta.unpersist()

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

_DEC = "decimal(38,10)"


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
        F.col("value").cast(_DEC).alias("v"),
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
        spark = batch_df.sparkSession
        delta = _rollup(batch_df)
        delta.persist()
        try:
            days = [r["day"] for r in delta.select("day").distinct().collect()]
            if not days:
                return
            try:
                existing = spark.read.parquet(table_path).filter(
                    F.col("day").isin(days)
                )
                merged = (
                    delta.unionByName(existing)
                    .groupBy("grain", "bucket_start", "day", "event_type")
                    .agg(
                        F.sum("n_events").alias("n_events"),
                        F.sum("sum_value").alias("sum_value"),
                    )
                )
            except Exception:
                merged = delta
            (
                merged.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("grain", "day")
                .parquet(table_path)
            )
        finally:
            delta.unpersist()

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
