"""Streaming windowed aggregations, watermarks, dedup, stream-static joins.

These are the streaming twins of the batch analogs in
queries/streaming_analogs.py — same window assignment, same aggregates
(decimal-exact sums), so the tests can assert batch-equivalence: running
the stream to completion over a finite fixture must produce exactly the
batch result (Structured Streaming's prefix-consistency guarantee).

Watermarks bound state at scale: without one, a session/tumbling aggregate
over an unbounded stream accumulates state forever. Every builder here
takes a watermark because at 100 TB/day "forget to bound state" is an OOM,
not a style issue.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from streaming_data_ingestion_spark.compat import DEC


def _sum_value() -> Column:
    return F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value")


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling window × event_type counts/sums (streaming q_stream_tumbling)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), _sum_value())
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding window counts/sums (streaming q_stream_sliding)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), _sum_value())
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "sum_value",
        )
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Per-user session windows (streaming q_stream_session).

    session_window state merges as events arrive and is emitted once the
    watermark passes the session end — per-key state stays bounded by
    (gap + watermark), the property that makes sessionization viable on
    an unbounded stream.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), _sum_value())
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def dedup_events(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming dedup on event_id within the watermark horizon.

    dropDuplicatesWithinWatermark keeps state only for the watermark
    window — the bounded-state version of dropDuplicates, which would
    remember every key forever on a stream.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def enrich_with_users(
    events: DataFrame, user_dim: DataFrame, hint_broadcast: bool = True
) -> DataFrame:
    """Stream-static join: each micro-batch hash-joins against the static
    dimension (re-read per batch). No state needed — the static side is
    not a stream.

    ``hint_broadcast=True`` (fixture-scale default) pins the dimension to
    a broadcast; pass False for a dimension too large to broadcast (the
    8 GB limit / driver memory) and let the planner pick a shuffled join
    per micro-batch instead.
    """
    dim = F.broadcast(user_dim) if hint_broadcast else user_dim
    return events.join(dim, "user_id", "left")


def correlate_clicks_purchases(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream interval join: each click pairs with the same user's
    purchases landing within ``horizon`` after it.

    Both sides carry a watermark and the join predicate bounds the time
    difference, so Spark can expire buffered rows once the other side's
    watermark passes — per-key state is bounded by (horizon + watermark)
    instead of growing with the stream. Without BOTH constraints a
    stream-stream inner join must buffer one side forever; that is the
    difference between a join that runs for a day and one that runs for a
    year.
    """
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )
