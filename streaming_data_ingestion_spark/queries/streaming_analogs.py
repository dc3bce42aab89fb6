"""Batch analogs of the streaming windowed aggregations (SURVEY.md §2B
"Streaming-only" rows).

Structured Streaming's windowed aggregates are prefix-consistent with the
same query run in batch, so the DuckDB-checkable batch analogs below pin the
*semantics* (window assignment, session merging), while
``streaming_data_ingestion_spark/streaming`` runs the same shapes through
``readStream`` and asserts batch-equivalence in tests.

Scale note: tumbling/sliding windows are plain hash aggregates on a derived
key — one shuffle. Session windows in streaming keep per-key state bounded
by the watermark; in batch they are a sort-within-user + running break sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_ingestion_spark.compat import dsum, sql_dsum
from streaming_data_ingestion_spark.registry import query
from streaming_data_ingestion_spark.tables import load

# --------------------------------------------------------------------------
# q_stream_tumbling — window(ts, '1 hour').
# --------------------------------------------------------------------------


@query(
    "q_stream_tumbling",
    oracle=f"""
SELECT
  time_bucket(INTERVAL '1 hour', ts) AS window_start,
  time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR AS window_end,
  event_type,
  COUNT(*) AS n_events,
  {sql_dsum("value", "sum_value")}
FROM events
GROUP BY 1, 2, 3
""",
    tags=("streaming-analog",),
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window × event_type counts/sums."""
    ev = load(spark, sf_dir, "events")
    w = F.window("ts", "1 hour")
    return (
        ev.groupBy(w.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# --------------------------------------------------------------------------
# q_stream_sliding — window(ts, '1 hour', '30 minutes').
# --------------------------------------------------------------------------


@query(
    "q_stream_sliding",
    oracle=f"""
WITH assigned AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, value
  FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTE
           AS window_start, value
  FROM events
)
SELECT
  window_start,
  window_start + INTERVAL 1 HOUR AS window_end,
  COUNT(*) AS n_events,
  {sql_dsum("value", "sum_value")}
FROM assigned
GROUP BY 1, 2
""",
    tags=("streaming-analog",),
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour window, 30-minute slide: each event lands in two
    windows (Spark expands this internally; the oracle expands it with a
    UNION ALL of the two bucket starts)."""
    ev = load(spark, sf_dir, "events")
    w = F.window("ts", "1 hour", "30 minutes")
    return (
        ev.groupBy(w.alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "sum_value",
        )
    )


# --------------------------------------------------------------------------
# q_stream_session — session_window(ts, '30 minutes') per user.
# --------------------------------------------------------------------------


@query(
    "q_stream_session",
    oracle=f"""
WITH marked AS (
  SELECT
    user_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
sessions AS (
  SELECT *,
    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ASC
                   ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT
  user_id,
  MIN(ts) AS session_start,
  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
  COUNT(*) AS n_events,
  {sql_dsum("value", "sum_value")}
FROM sessions
GROUP BY user_id, session_id
""",
    tags=("streaming-analog",),
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessions per user via session_window.

    Spark merges events whose windows [ts, ts+gap) overlap, so a gap of
    exactly 30 minutes starts a NEW session (end-exclusive) — the oracle's
    gaps-and-islands formulation breaks on ``>= INTERVAL 30 MINUTE`` to
    match. session_end = last event + gap, Spark's definition.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


# --------------------------------------------------------------------------
# q_time_rollup — multi-resolution time rollup (hypertable continuous
# aggregate shape): hour and day grains in ONE pass via GROUPING SETS.
# --------------------------------------------------------------------------


@query(
    "q_time_rollup",
    oracle=f"""
SELECT
  CASE WHEN GROUPING(h) = 1 THEN '1d' ELSE '1h' END AS grain,
  COALESCE(h, d) AS bucket_start,
  event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  {sql_dsum("value", "sum_value")}
FROM (
  SELECT
    date_trunc('day', ts) AS d,
    date_trunc('hour', ts) AS h,
    event_type,
    value
  FROM events
)
GROUP BY GROUPING SETS ((d, event_type), (d, h, event_type))
ORDER BY grain, bucket_start, event_type
""",
    tags=("streaming-analog", "agg"),
)
def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution time rollup — the hypertable / continuous-
    aggregate shape: hourly AND daily per-type aggregates computed in
    ONE pass over the fact table with GROUPING SETS, instead of two
    scans (or a second rollup job re-reading the hourly output).

    Plan: Expand replicates each row once per grain (2×), then a single
    partial+final hash aggregate covers both grains — at 100 TB this
    halves scan cost vs grain-per-query, and the per-grain outputs are
    exactly what a materialized rollup table would store (the streaming
    twin maintains the same rollup incrementally via
    streaming/mv.py). GROUPING() distinguishes the day rows
    from hour rows; the bucket column is the finest non-null grain.
    """
    ev = load(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("d"),
        F.date_trunc("hour", "ts").alias("h"),
        "event_type",
        "value",
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
            dsum("value", "sum_value"),
        )
        .select(
            F.when(F.col("_g_h") == 1, "1d").otherwise("1h").alias("grain"),
            F.coalesce("h", "d").alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("grain", "bucket_start", "event_type")
    )
