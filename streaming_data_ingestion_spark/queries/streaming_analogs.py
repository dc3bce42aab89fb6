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
