"""Window-function operators (SURVEY.md §2B "Window functions").

Every window carries a total-order tie-breaker (a unique key in the ORDER
BY) so ranks and frames are deterministic across engines — the oracle
hash-compares values, and an untied ORDER BY is nondeterministic in both
Spark and DuckDB.

Scale note: a window partitioned by a reasonable-cardinality key (custkey,
user_id) is one shuffle + per-partition sort — fine at 100 TB. What we never
do is an un-partitioned window over the whole table (single-task sort).
Frame sums go through DECIMAL like all other sums (see compat.py): Spark
and DuckDB walk frames in different orders/structures, so a raw double
running sum would drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streaming_data_ingestion_spark.compat import DEC, sql_dec_to_double
from streaming_data_ingestion_spark.registry import query
from streaming_data_ingestion_spark.tables import load

# --------------------------------------------------------------------------
# q_win_rank — row_number / rank / dense_rank.
# --------------------------------------------------------------------------


@query(
    "q_win_rank",
    oracle="""
SELECT
  o_custkey,
  o_orderkey,
  o_totalprice,
  CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn,
  CAST(RANK() OVER w AS INTEGER) AS rnk,
  CAST(DENSE_RANK() OVER w AS INTEGER) AS drnk
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
""",
    tags=("window",),
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking trio per customer, ordered by price with key tie-breaker."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


# --------------------------------------------------------------------------
# q_win_analytic — lag / lead / first_value.
# --------------------------------------------------------------------------


@query(
    "q_win_analytic",
    oracle="""
SELECT
  event_id,
  user_id,
  value,
  LAG(value) OVER w AS prev_value,
  LEAD(value) OVER w AS next_value,
  FIRST_VALUE(value) OVER w AS first_value,
  LAG(value, 2, -1.0) OVER w AS prev2_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
""",
    tags=("window",),
)
def q_win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first_value along each user's event timeline."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(w).alias("first_value"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_value"),
    )


# --------------------------------------------------------------------------
# q_win_frame — running sum + moving average with explicit ROWS frames.
# --------------------------------------------------------------------------


@query(
    "q_win_frame",
    oracle=f"""
SELECT
  event_id,
  user_id,
  {sql_dec_to_double(
      "SUM(CAST(value AS DECIMAL(38,10))) OVER "
      "(PARTITION BY user_id ORDER BY ts ASC, event_id ASC "
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
  )} AS running_sum,
  {sql_dec_to_double(
      "SUM(CAST(value AS DECIMAL(38,10))) OVER "
      "(PARTITION BY user_id ORDER BY ts ASC, event_id ASC "
      "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)"
  )} / CASE WHEN ROW_NUMBER() OVER
      (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) >= 4
      THEN 4 ELSE ROW_NUMBER() OVER
      (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) END AS moving_avg
FROM events
""",
    tags=("window",),
)
def q_win_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum (unbounded-preceding) + 4-row moving average.

    Sums run in DECIMAL so the two engines' different frame-evaluation
    orders can't produce drifting doubles; the moving average divides by
    the actual frame size (min(row_number, 4)) as one double division.
    """
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    vdec = F.col("value").cast(DEC)
    running = (
        F.sum(vdec).over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
        .alias("running_sum")
    )
    frame_sum = F.sum(vdec).over(w.rowsBetween(-3, 0)).cast("double")
    rn = F.row_number().over(w)
    moving = (frame_sum / F.when(rn >= 4, F.lit(4)).otherwise(rn)).alias(
        "moving_avg"
    )
    return load(spark, sf_dir, "events").select(
        "event_id", "user_id", running, moving
    )


# --------------------------------------------------------------------------
# q_win_topk_per_group — the canonical top-k-per-group pattern.
# --------------------------------------------------------------------------


@query(
    "q_win_topk_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
  FROM orders
)
WHERE rn <= 3
""",
    tags=("window",),
)
def q_win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via rank-filter.

    Spark pushes a per-partition limit into the sort (WindowGroupLimit)
    before the shuffle, so each group's non-top rows die early — the
    pattern that keeps per-group top-k linear at scale.
    """
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# --------------------------------------------------------------------------
# q_win_distribution — ntile / percent_rank / cume_dist.
# --------------------------------------------------------------------------


@query(
    "q_win_distribution",
    oracle="""
SELECT
  c_custkey,
  c_acctbal,
  CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
  PERCENT_RANK() OVER w AS pct_rank,
  CUME_DIST() OVER w AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment
             ORDER BY c_acctbal DESC, c_custkey ASC)
""",
    tags=("window",),
)
def q_win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions per market segment.

    All three derive from the row's rank and the partition size — integer
    arithmetic plus one exact division, so cross-engine values are
    bit-identical (no floating accumulation order involved). Same
    single-shuffle plan as any other window family.
    """
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


# --------------------------------------------------------------------------
# q_win_range_frame — time-based RANGE frame (trailing one hour), vs the
# row-count frames of q_win_frame.
# --------------------------------------------------------------------------


@query(
    "q_win_range_frame",
    oracle=f"""
SELECT
  event_id,
  user_id,
  COUNT(*) OVER w AS n_trailing_1h,
  {sql_dec_to_double("SUM(CAST(value AS DECIMAL(38,10))) OVER w")}
    AS sum_trailing_1h
FROM events
WINDOW w AS (
  PARTITION BY user_id
  ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
)
""",
    tags=("window",),
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-one-hour event count and value sum per user — a RANGE
    frame keyed on event time, not row position.

    RANGE frames size themselves by the *value* of the order key (epoch
    seconds here), so sparse and bursty users both get exactly "the last
    hour" — the window shape behind rate limits and rolling KPIs. Peers
    with the same timestamp share a frame in both engines by definition
    of RANGE, which is what makes this hash-stable without a tie-break.
    """
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_trailing_1h"),
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias(
            "sum_trailing_1h"
        ),
    )


# --------------------------------------------------------------------------
# q_win_rolling_quantile — trailing-window p95 (the SLO/alerting window).
# --------------------------------------------------------------------------


@query(
    "q_win_rolling_quantile",
    oracle=f"""
WITH daily AS (
  SELECT
    event_type,
    date_trunc('day', ts) AS day,
    {sql_dec_to_double("SUM(CAST(value AS DECIMAL(38,10)))")} AS daily_value
  FROM events
  GROUP BY event_type, day
)
SELECT
  event_type,
  day,
  daily_value,
  quantile_cont(daily_value, 0.95) OVER (
    PARTITION BY event_type ORDER BY day ASC
    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
  ) AS p95_7d
FROM daily
ORDER BY event_type, day
""",
    tags=("window", "events"),
)
def q_win_rolling_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day p95 of daily volume per event type — the rolling
    tail-quantile every SLO/alerting pipeline computes (a static
    threshold can't track load growth; a trailing quantile can).

    Exactness: daily totals go through decimal sums (bit-exact), and
    Spark's ``percentile`` over a ROWS frame interpolates exactly like
    DuckDB's windowed ``quantile_cont`` over the same frame — so even
    the interpolated quantiles hash-match.

    Plan: the expensive pass is the daily aggregate (one shuffle,
    map-side partials); the window then runs over a |types|×|days|
    relation — at 100 TB the fact table never feeds a window directly,
    the pre-aggregate does (the same two-level shape as q_pct_change
    and q_gap_fill).
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.col("value").cast(DEC)).cast("double").alias("daily_value"))
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("day").asc())
        .rowsBetween(-6, 0)
    )
    return daily.select(
        "event_type",
        "day",
        "daily_value",
        F.expr("percentile(daily_value, 0.95D)").over(w).alias("p95_7d"),
    ).orderBy("event_type", "day")
