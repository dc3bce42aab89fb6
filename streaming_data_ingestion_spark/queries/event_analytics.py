"""Event-sequence analytics over the events stream table: funnels and
cohort retention — the product-analytics queries a streaming ingest
pipeline exists to feed.

Both are expressed as ordinary joins/aggregates over event time, so they
run identically in batch (oracle-checked here) and incrementally via the
streaming module's windowed state. Scale shape: everything keys on
``user_id`` — one shuffle each to per-user granularity, then tiny
aggregates; no self-cartesian anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_ingestion_spark.registry import query
from streaming_data_ingestion_spark.tables import load


# --------------------------------------------------------------------------
# q_funnel — strictly-ordered 3-stage funnel (signup → click → purchase).
# --------------------------------------------------------------------------


@query(
    "q_funnel",
    oracle="""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t_signup FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t_signup
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
  GROUP BY e.user_id
)
SELECT
  (SELECT COUNT(*) FROM s1) AS n_signup,
  (SELECT COUNT(*) FROM s2) AS n_click_after,
  (SELECT COUNT(*) FROM s3) AS n_purchase_after
""",
    tags=("events", "analytics"),
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many users progressed signup → later click → later purchase.

    Each stage is a filtered per-user MIN joined against the previous
    stage's timestamp — strict event ordering, not mere co-occurrence.
    Three user-keyed aggregates + two joins on user_id (broadcast-able
    as stages shrink), then three scalar counts. At scale every stage
    reuses the same user_id partitioning, so AQE collapses the chain
    into one effective shuffle of the events table.
    """
    ev = load(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        s1.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_click_after")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n_purchase_after")))
    )


# --------------------------------------------------------------------------
# q_retention — week-over-week cohort retention.
# --------------------------------------------------------------------------


@query(
    "q_retention",
    oracle="""
WITH uw AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
)
SELECT
  a.wk,
  COUNT(*) AS n_active,
  COUNT(b.user_id) AS n_retained,
  CAST(COUNT(b.user_id) AS DOUBLE) / COUNT(*) AS retention
FROM uw a
LEFT JOIN uw b
  ON a.user_id = b.user_id AND b.wk = a.wk + INTERVAL 7 DAY
GROUP BY a.wk
""",
    tags=("events", "analytics"),
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Of the users active in week W, how many are active again in W+1.

    Distinct (user, week) pairs, then a self left-join shifted one week.
    The distinct and the join share the user_id-dominant key, and the
    (user, week) set is orders smaller than raw events — the heavy table
    is touched once. Retention is one double division on exact counts.
    """
    uw = (
        load(spark, sf_dir, "events")
        .select("user_id", F.date_trunc("week", F.col("ts")).alias("wk"))
        .distinct()
    )
    a, b = uw.alias("a"), uw.alias("b")
    joined = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.wk") == F.col("a.wk") + F.expr("INTERVAL 7 DAY")),
        "left",
    )
    retained = F.count(F.col("b.user_id"))
    return joined.groupBy(F.col("a.wk").alias("wk")).agg(
        F.count(F.lit(1)).alias("n_active"),
        retained.alias("n_retained"),
        (retained.cast("double") / F.count(F.lit(1))).alias("retention"),
    )
