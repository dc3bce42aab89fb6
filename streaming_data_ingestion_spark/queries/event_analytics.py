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

from pyspark.sql import DataFrame, SparkSession, Window
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

    Each stage is the per-user MIN timestamp strictly after the previous
    stage's — strict event ordering, not mere co-occurrence. The three
    stage times chain as conditional-MIN WINDOWS over ONE user_id
    partitioning (each window condition references the previous window's
    result, so they stack in consecutive selects without re-shuffling),
    then one per-user rollup on the same key and three scalar counts.
    ONE scan of the events table and one shuffle end-to-end — the
    filtered-aggregate-per-stage formulation scanned events once per
    stage and re-joined, 6 scans at 3 stages.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    is_ = lambda t: F.col("event_type") == t  # noqa: E731
    ts = F.col("ts")
    staged = (
        ev.select("user_id", "event_type", "ts")
        .withColumn("t1", F.min(F.when(is_("signup"), ts)).over(w))
        .withColumn(
            "t2",
            F.min(F.when(is_("click") & (ts > F.col("t1")), ts)).over(w),
        )
        .withColumn(
            "t3",
            F.min(F.when(is_("purchase") & (ts > F.col("t2")), ts)).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.min("t1").alias("t1"), F.min("t2").alias("t2"),
        F.min("t3").alias("t3"),
    )
    return per_user.agg(
        F.count("t1").alias("n_signup"),
        F.count("t2").alias("n_click_after"),
        F.count("t3").alias("n_purchase_after"),
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


# --------------------------------------------------------------------------
# q_sessionize — explicit per-session rollup with stable session sequence.
# --------------------------------------------------------------------------


@query(
    "q_sessionize",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id,
    CASE WHEN lag(ts) OVER w IS NULL
           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
         THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
assigned AS (
  SELECT user_id, ts,
    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
)
SELECT
  user_id,
  CAST(session_seq AS BIGINT) AS session_seq,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  MIN(ts) AS session_start,
  MAX(ts) AS session_end,
  epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
FROM assigned
GROUP BY 1, 2
""",
    tags=("events",),
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization with explicit session sequence numbers:
    a new session starts when a user is idle over 30 minutes; each
    session rolls up to (user, seq, event count, start, end, duration).

    Complements q_stream_session (session_window aggregate): this is the
    lag -> flag -> running-sum assignment that gives every session a
    stable per-user ordinal, the shape needed when downstream joins
    reference "user 7's 3rd session". One shuffle total: both window
    passes share the (user_id) partitioning and (ts, event_id) sort, and
    the final groupBy(user_id, session_seq) reuses the same partitioning
    (a subset key), so Catalyst plans no second Exchange.

    Time math is integer microseconds (unix_micros / epoch_us) on both
    engines: second-granularity helpers diverge on sub-second timestamps
    (Spark unix_timestamp floors, DuckDB's epoch cast rounds), which
    flips gap decisions and durations by one second.
    """
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_s = F.when(
        prev_ts.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts) > 1_800_000_000),
        1,
    ).otherwise(0)
    seq = F.sum(new_s).over(
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.select("user_id", "ts", seq.cast("long").alias("session_seq"))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            (
                F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))
            ).alias("duration_us"),
        )
    )


# --------------------------------------------------------------------------
# q_gap_fill — zero-filled daily time series over a generated calendar.
# --------------------------------------------------------------------------


@query(
    "q_gap_fill",
    oracle="""
WITH e AS (
  SELECT CAST(ts AS DATE) AS day, event_type, value FROM events
),
daily AS (
  SELECT day, event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)
           AS sv
  FROM e GROUP BY 1, 2
),
bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM e),
days AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
),
types AS (SELECT DISTINCT event_type FROM e)
SELECT
  CAST(d.day AS TIMESTAMP) AS day,
  t.event_type,
  COALESCE(n, 0) AS n_events,
  COALESCE(sv, 0.0) AS sum_value
FROM days d
CROSS JOIN types t
LEFT JOIN daily ON daily.day = d.day AND daily.event_type = t.event_type
""",
    tags=("events",),
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily series per event type with explicit zeros for silent
    days — the gap-filling step every dashboard / anomaly detector needs
    before window math, since missing groups are invisible to groupBy.

    The calendar spine is generated from the data's own min/max day
    (``sequence`` + explode on a 1-row bound aggregate — no hand-written
    date table), cross-joined with the (tiny, broadcast) event-type
    dimension, then left-joined onto the real daily aggregate. Both
    small sides broadcast; the fact table is touched exactly once.
    """
    from streaming_data_ingestion_spark.compat import dsum

    e = load(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "event_type", "value"
    )
    daily = e.groupBy("day", "event_type").agg(
        F.count(F.lit(1)).alias("n"), dsum("value", "sv")
    )
    bounds = e.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    days = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day")
    )
    types = e.select("event_type").distinct()
    return (
        days.crossJoin(F.broadcast(types))
        .join(daily, ["day", "event_type"], "left")
        .select(
            # DATE materializes as python objects on the Spark side but
            # datetime64 from DuckDB; TIMESTAMP collects identically.
            F.col("day").cast("timestamp").alias("day"),
            "event_type",
            F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n_events"),
            F.coalesce(F.col("sv"), F.lit(0.0)).alias("sum_value"),
        )
    )


# --------------------------------------------------------------------------
# q_pct_change — day-over-day deltas on the gap-filled series.
# --------------------------------------------------------------------------


@query(
    "q_pct_change",
    oracle="""
WITH e AS (
  SELECT CAST(ts AS DATE) AS day, event_type, value FROM events
),
daily AS (
  SELECT CAST(day AS TIMESTAMP) AS day, event_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM e GROUP BY 1, 2
)
SELECT
  day,
  event_type,
  n,
  lag(n) OVER w AS prev_n,
  CAST(n - lag(n) OVER w AS DOUBLE) / lag(n) OVER w AS pct_change
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY day)
""",
    tags=("events",),
)
def q_pct_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day percent change of event counts per type — the delta
    layer dashboards put on top of a daily series (compose with
    q_gap_fill when silent days must read as -100% instead of being
    skipped).

    lag over (event_type | day) with integer counts; the change is one
    IEEE division per row, null on each type's first day exactly like
    both engines' lag semantics. Single shuffle on the (tiny) daily
    aggregate.
    """
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    daily = (
        e.select(F.to_date("ts").alias("d"), "event_type")
        .groupBy("d", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("d").cast("timestamp").alias("day"), "event_type", "n"
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    prev = F.lag("n").over(w)
    return daily.select(
        "day",
        "event_type",
        "n",
        prev.alias("prev_n"),
        ((F.col("n") - prev).cast("double") / prev).alias("pct_change"),
    )


@query(
    "q_skew_profile",
    oracle="""
WITH counts AS (
  SELECT user_id, COUNT(*) AS n_events
  FROM events
  GROUP BY user_id
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM events)
SELECT
  c.user_id,
  CAST(c.n_events AS BIGINT) AS n_events,
  CAST(c.n_events AS DOUBLE) / t.total AS share
FROM counts c, tot t
ORDER BY n_events DESC, c.user_id ASC
LIMIT 10
""",
    tags=("events", "agg", "diagnostics"),
)
def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew profile: the 10 heaviest user_id keys with their exact
    event counts and share of total traffic — the diagnostic that decides
    whether a downstream join on this key needs salting (layout.
    salted_join) or AQE skew splitting suffices.

    Plan: ONE partial+final hash aggregate over the fact table (the
    shuffle carries per-key partials); the 1-row total rides back as a
    broadcast nested-loop against the |keys|-sized count table, never the
    facts; top-10 via TakeOrderedAndProject. At 100 TB this is the
    cheapest possible full-key census — no distinct, no window over an
    unpartitioned frame.
    """
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    total = ev.agg(F.count(F.lit(1)).alias("total"))
    return (
        counts.join(F.broadcast(total))
        .select(
            "user_id",
            "n_events",
            (F.col("n_events").cast("double") / F.col("total")).alias("share"),
        )
        .orderBy(F.col("n_events").desc(), F.col("user_id").asc())
        .limit(10)
    )


@query(
    "q_scd2_intervals",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER w AS prev_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN prev_type IS NULL OR prev_type != event_type
              THEN 1 ELSE 0 END AS is_start
  FROM ordered
),
seg AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(is_start) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS seg_id
  FROM flagged
),
intervals AS (
  SELECT user_id, CAST(seg_id AS BIGINT) AS version, event_type,
         MIN(ts) AS valid_from, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM seg
  GROUP BY user_id, seg_id, event_type
)
SELECT user_id, version, event_type, valid_from,
       lead(valid_from) OVER (
         PARTITION BY user_id ORDER BY version
       ) AS valid_to,
       lead(valid_from) OVER (
         PARTITION BY user_id ORDER BY version
       ) IS NULL AS is_current,
       n_events
FROM intervals
""",
    tags=("events", "window", "scd"),
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 interval build: collapse each user's event stream into
    validity intervals — one row per run of equal event_type, with
    [valid_from, valid_to) bounds and a current-row flag. The warehouse
    pattern for turning a change log into a dimension history.

    Plan: the change flag (lag), the running version number (sum over
    the same ordering), the per-version rollup, AND the lead() that
    closes each interval all share one hash partitioning on user_id —
    Spark plans a single Exchange for the whole query (asserted in
    test_plans). Ties break on event_id so versions are deterministic
    under any partitioning.
    """
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    seg = flagged.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum("is_start")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("seg_id"),
    )
    intervals = seg.groupBy(
        "user_id", F.col("seg_id").cast("long").alias("version"), "event_type"
    ).agg(
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    valid_to = F.lead("valid_from").over(wv)
    return intervals.select(
        "user_id",
        "version",
        "event_type",
        "valid_from",
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
        "n_events",
    )


@query(
    "q_time_weighted_avg",
    oracle="""
WITH stepped AS (
  SELECT user_id,
         CAST(ROUND(value * 1000000, 0) AS DECIMAL(38,0)) AS v_micro,
         CAST(epoch_us(lead(ts) OVER w - ts) AS BIGINT) AS dur_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT
  user_id,
  CAST(CAST(SUM(v_micro * CAST(dur_us AS DECIMAL(38,0))) AS VARCHAR)
       AS DOUBLE)
    / CAST(SUM(dur_us) AS DOUBLE) / 1000000.0 AS twa_value,
  CAST(SUM(dur_us) AS BIGINT) AS span_us
FROM stepped
WHERE dur_us IS NOT NULL
GROUP BY user_id
HAVING SUM(dur_us) > 0
""",
    tags=("events", "window", "timeseries"),
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of `value` per user: each reading is held
    until the next one (step interpolation), so its weight is the
    microseconds until the user's next event — the hypertable/IoT
    aggregate a plain AVG gets wrong when readings are irregular.

    One window (lead over user_id/ts) and one aggregate share the same
    user_id partitioning — a single Exchange end-to-end. Determinism:
    the value is quantized to exact integer micro-units FIRST (round →
    int), weights are exact integer microseconds, so the weighted sum is
    pure integer-decimal arithmetic — no double→decimal quantization,
    which diverges 1 ULP between engines for ~1e11-magnitude products.
    The final double division sequence (sum / span / 1e6) is identical
    IEEE math on identical operands.
    """
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dur = (
        F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))
    ).alias("dur_us")
    v_micro = (
        F.round(F.col("value") * 1000000, 0).cast("decimal(38,0)")
    ).alias("v_micro")
    stepped = ev.select("user_id", v_micro, dur).filter(
        F.col("dur_us").isNotNull()
    )
    return (
        stepped.groupBy("user_id")
        .agg(
            F.sum(F.col("v_micro") * F.col("dur_us").cast("decimal(38,0)"))
            .cast("double")
            .alias("_wsum"),
            F.sum("dur_us").alias("span_us"),
        )
        .filter(F.col("span_us") > 0)
        .select(
            "user_id",
            (
                F.col("_wsum") / F.col("span_us").cast("double") / 1000000.0
            ).alias("twa_value"),
            "span_us",
        )
    )


# Per-user recency cap for q_ewma: the fold's per-user state is the
# user's own (capped) event list. At α = 1/2 an event k steps back
# contributes with weight 2^-k, so anything past a few hundred steps is
# far below double ULP — the cap changes nothing numerically meaningful
# while bounding task memory for a 100 TB power user with millions of
# events. Applied IDENTICALLY in the Spark plan and the DuckDB oracle so
# both engines fold the same suffix.
EWMA_MAX_EVENTS = 4096


@query(
    "q_ewma",
    oracle=f"""
WITH recent AS (
  SELECT user_id, ts, event_id, value,
         row_number() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id DESC
         ) AS rn
  FROM events
),
per AS (
  SELECT user_id,
         list(value ORDER BY ts, event_id) AS vs,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM recent WHERE rn <= {EWMA_MAX_EVENTS}
  GROUP BY user_id
)
SELECT user_id, n_events,
       list_reduce(vs, (acc, x) -> acc * 0.5 + x * 0.5) AS ewma_value
FROM per
""",
    tags=("events", "timeseries"),
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of `value` per user
    (s_0 = x_0; s_i = α·x_i + (1-α)·s_{i-1}) — the smoothing fold that
    has no closed window-function form because every output depends on
    the entire prefix.

    Cross-engine determinism by construction: α = 1/2 makes each step
    two exact power-of-two scalings plus one IEEE addition, and both
    engines run the SAME sequential fold over the SAME (ts, event_id)
    ordering — Spark as `aggregate` over the sorted collected array,
    DuckDB as `list_reduce` (which seeds from the first element exactly
    like s_0 = x_0).

    Scale bound: only the EWMA_MAX_EVENTS most recent events per user
    enter the fold (row_number window, sort-based and spillable), so the
    collected per-user array is capped regardless of history length. The
    row_number window and the groupBy hash to the same user_id key, so
    the plan still shuffles the fact table ONCE — the window's exchange
    satisfies the aggregate's distribution.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    recent = (
        ev.select("user_id", "ts", "event_id", "value")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= EWMA_MAX_EVENTS)
    )
    arr = F.array_sort(F.collect_list(F.struct("ts", "event_id", "value")))
    per = recent.groupBy("user_id").agg(
        arr.alias("rows"), F.count(F.lit(1)).alias("n_events")
    )
    vals = F.transform(F.col("rows"), lambda s: s["value"])
    ewma = F.aggregate(
        F.slice(vals, F.lit(2), F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: acc * F.lit(0.5) + x * F.lit(0.5),
    )
    return per.select("user_id", "n_events", ewma.alias("ewma_value"))


@query(
    "q_markov_transitions",
    oracle="""
WITH stepped AS (
  SELECT event_type AS dst,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS src
  FROM events
),
pairs AS (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
  FROM stepped WHERE src IS NOT NULL
  GROUP BY src, dst
)
SELECT src, dst, n,
       CAST(n AS DOUBLE)
         / SUM(n) OVER (PARTITION BY src) AS p
FROM pairs
""",
    tags=("events", "analytics", "markov"),
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over event types: for every
    (previous event → next event) pair within a user's timeline, the
    transition count and conditional probability P(dst | src) — the
    behavioral-model input for next-action prediction and anomaly
    scoring.

    Plan: one user_id window (lag) produces the transition pairs; the
    pair aggregate collapses to at most |types|² rows, so the row-share
    window normalizing each source row operates on a tiny relation —
    the fact table is shuffled once and everything after is
    constant-sized. Probabilities are exact-integer counts through one
    IEEE division, hash-identical cross-engine.
    """
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    stepped = ev.select(
        F.lag("event_type").over(w).alias("src"),
        F.col("event_type").alias("dst"),
    ).filter(F.col("src").isNotNull())
    pairs = stepped.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    share = Window.partitionBy("src")
    return pairs.select(
        "src",
        "dst",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(share)).alias("p"),
    )


# --------------------------------------------------------------------------
# q_anomaly_mad — robust outlier detection (median absolute deviation).
# --------------------------------------------------------------------------


@query(
    "q_anomaly_mad",
    oracle="""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
), mad AS (
  SELECT e.event_type, quantile_cont(abs(e.value - med.med), 0.5) AS mad
  FROM events e JOIN med ON e.event_type = med.event_type
  GROUP BY e.event_type
)
SELECT
  e.event_type,
  med.med,
  mad.mad,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CASE WHEN abs(e.value - med.med) > 3.0 * 1.4826 * mad.mad
           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM events e
JOIN med ON e.event_type = med.event_type
JOIN mad ON e.event_type = mad.event_type
GROUP BY e.event_type, med.med, mad.mad
ORDER BY e.event_type
""",
    tags=("events", "analytics", "quality"),
)
def q_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier census: median / MAD (median absolute
    deviation) per event type, and how many events sit outside the
    3σ-equivalent band (|x − med| > 3·1.4826·MAD — 1.4826 scales MAD to
    σ under normality). Median-based detection survives the exact heavy
    tails that break mean/stddev z-scores (q_zscore is the parametric
    twin).

    Exactness: Spark ``percentile`` and DuckDB ``quantile_cont`` both
    linearly interpolate over exactly-sorted doubles and agree
    bit-for-bit (the midpoint is one IEEE (a+b)/2), so med, MAD, and
    the outlier cut all value-check with no tolerance.

    Plan: three passes over a pushed-down 2-column scan — median per
    type, MAD per type (needs pass 1's result), then the census. Each
    aggregate is |event_types|-sized and the intermediate tables ride
    back as broadcasts; the fact table is never shuffled (exact
    percentile aggregates partial per partition — sorted-merge at the
    |types| reducers). At 100 TB swap the exact percentile for
    ``approx_percentile`` in pass 1/2 and keep pass 3 unchanged.
    """
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5D)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5D)").alias("mad")
    )
    out = F.when(
        F.col("adev") > 3.0 * 1.4826 * F.col("mad"), 1
    ).otherwise(0)
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(out).cast("long").alias("n_outliers"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q_attribution — last-touch attribution (purchase ← most recent click).
# --------------------------------------------------------------------------


@query(
    "q_attribution",
    oracle="""
WITH u AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind,
         CASE WHEN event_type = 'click' THEN ts END AS c_ts_raw,
         CASE WHEN event_type = 'click' THEN event_id END AS c_id_raw
  FROM events
  WHERE event_type IN ('click', 'purchase')
),
carried AS (
  SELECT user_id, ts, event_id, kind,
    last_value(c_ts_raw IGNORE NULLS) OVER w AS c_ts,
    last_value(c_id_raw IGNORE NULLS) OVER w AS c_id
  FROM u
  WINDOW w AS (PARTITION BY user_id
               ORDER BY ts ASC, kind ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT
  event_id AS purchase_id,
  user_id,
  ts AS p_ts,
  CASE WHEN c_ts >= ts - INTERVAL 7 DAY THEN c_id END AS click_id,
  CASE WHEN c_ts >= ts - INTERVAL 7 DAY THEN c_ts END AS click_ts
FROM carried
WHERE kind = 1
ORDER BY purchase_id
""",
    tags=("events", "analytics"),
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the user's
    most recent click at-or-before it, within a 7-day window — the
    marketing-analytics twin of the as-of join (q_join_asof), with an
    attribution-window cutoff and NULL for organic purchases.

    Determinism: the carry-forward orders by (ts, kind, event_id) with
    clicks before purchases on equal timestamps, so a same-instant
    click is attributable and ties pick the highest… lowest event_id
    deterministically in both engines (same total order).

    Plan: ONE exchange on user_id feeds a shared sort and both
    IGNORE-NULLS carry-forward windows (same frame ⇒ same physical
    Window operator); the 7-day cutoff is a post-window projection.
    The union trick means clicks and purchases are never self-joined —
    at 100 TB this is sort + single pass, not an interval join.
    """
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    kind = F.when(F.col("event_type") == "click", 0).otherwise(1)
    u = ev.select(
        "user_id",
        "ts",
        "event_id",
        kind.alias("kind"),
        F.when(F.col("event_type") == "click", F.col("ts")).alias("c_ts_raw"),
        F.when(F.col("event_type") == "click", F.col("event_id")).alias(
            "c_id_raw"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("kind").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "user_id",
        "ts",
        "event_id",
        "kind",
        F.last("c_ts_raw", ignorenulls=True).over(w).alias("c_ts"),
        F.last("c_id_raw", ignorenulls=True).over(w).alias("c_id"),
    )
    in_window = F.col("c_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAYS")
    return (
        carried.filter(F.col("kind") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
            F.when(in_window, F.col("c_id")).alias("click_id"),
            F.when(in_window, F.col("c_ts")).alias("click_ts"),
        )
        .orderBy("purchase_id")
    )


# --------------------------------------------------------------------------
# q_path_3gram — most common 3-step event paths (sequence mining).
# --------------------------------------------------------------------------


@query(
    "q_path_3gram",
    oracle="""
WITH seqs AS (
  SELECT user_id, list(event_type ORDER BY ts ASC, event_id ASC) AS types
  FROM events
  GROUP BY user_id
),
grams AS (
  SELECT unnest(list_transform(
    range(1, greatest(len(types) - 1, 1)),
    i -> concat_ws(' > ', types[i], types[i+1], types[i+2])
  )) AS path
  FROM seqs
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n
FROM grams
GROUP BY path
ORDER BY n DESC, path ASC
LIMIT 10
""",
    tags=("events", "analytics", "sequence"),
)
def q_path_3gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most common 3-step event paths across users — sequence
    mining over the behavioral stream (which journeys dominate, the
    input to funnel design and anomaly triage).

    Plan: a 3-gram needs only the 2 preceding events, so the user
    timeline streams through two lag() frames over ONE user_id window —
    O(1) running state per row through Spark's sort-based (spillable)
    window exec, with no per-user array held in task memory at any
    point; a power user with millions of events costs sort spill, never
    OOM. The path counts partial-aggregate map-side and top-10 is
    TakeOrderedAndProject with a path tie-break. Two shuffles total
    (user window, then path aggregate) — the same count as the
    collect_list formulation this replaced, minus its unbounded
    per-user arrays.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    stepped = ev.select(
        F.lag("event_type", 2).over(w).alias("t0"),
        F.lag("event_type", 1).over(w).alias("t1"),
        F.col("event_type").alias("t2"),
    ).filter(F.col("t0").isNotNull())
    return (
        stepped.select(F.concat_ws(" > ", "t0", "t1", "t2").alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("path").asc())
        .limit(10)
    )


# --------------------------------------------------------------------------
# q_seasonality — day-of-week seasonal profile per event type.
# --------------------------------------------------------------------------


@query(
    "q_seasonality",
    oracle="""
WITH d AS (
  SELECT
    event_type,
    (CAST(ts AS DATE) - DATE '1970-01-01') % 7 AS dow_idx,
    value
  FROM events
),
g AS (
  SELECT
    event_type, dow_idx,
    CAST(COUNT(*) AS BIGINT) AS n_events,
    CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)
      / COUNT(*) AS avg_value
  FROM d GROUP BY event_type, dow_idx
)
SELECT
  event_type,
  CAST(dow_idx AS INTEGER) AS dow_idx,
  n_events,
  avg_value,
  CAST(n_events * 7 AS DOUBLE)
    / SUM(n_events) OVER (PARTITION BY event_type) AS seasonal_index
FROM g
""",
    tags=("events", "timeseries"),
)
def q_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal profile per event type: volume, mean value,
    and a seasonal index (1.0 = uniform; >1 = over-represented day) — the
    load-shaping signal capacity planning and anomaly baselines read.

    The day bucket is epoch-days mod 7 rather than an engine DOW function
    (Spark and DuckDB disagree on week-start conventions; integer date
    arithmetic is identical everywhere). One fact-table aggregate to 7×
    |types| rows; the index's denominator is a window sum over that tiny
    aggregate, not a second scan.
    """
    ev = load(spark, sf_dir, "events")
    d = ev.select(
        "event_type",
        (F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")) % 7)
        .alias("dow_idx"),
        "value",
    )
    g = d.groupBy("event_type", "dow_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.sum(F.col("value").cast("decimal(38,10)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_value"),
    )
    return g.select(
        "event_type",
        F.col("dow_idx").cast("int").alias("dow_idx"),
        "n_events",
        "avg_value",
        (
            (F.col("n_events") * 7).cast("double")
            / F.sum("n_events").over(Window.partitionBy("event_type"))
        ).alias("seasonal_index"),
    )


# --------------------------------------------------------------------------
# q_changepoint — CUSUM changepoint candidate per event type.
# --------------------------------------------------------------------------


@query(
    "q_changepoint",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
dev AS (
  SELECT
    event_type, day, n,
    COUNT(*) OVER (PARTITION BY event_type) AS n_days,
    CAST(n - CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE)
           / COUNT(*) OVER (PARTITION BY event_type)
         AS DECIMAL(38,10)) AS d
  FROM daily
),
cs AS (
  SELECT
    event_type, day, n_days,
    SUM(d) OVER (PARTITION BY event_type ORDER BY day
                 ROWS UNBOUNDED PRECEDING) AS cusum
  FROM dev
),
r AS (
  SELECT
    event_type, day, n_days, cusum,
    ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY abs(cusum) DESC, day ASC) AS rn
  FROM cs
)
SELECT
  event_type,
  day AS changepoint_day,
  CAST(CAST(cusum AS VARCHAR) AS DOUBLE) AS cusum_at,
  CAST(n_days AS BIGINT) AS n_days
FROM r WHERE rn = 1
""",
    tags=("events", "timeseries"),
)
def q_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint candidate per event type: the day where the
    cumulative deviation of daily volume from the type's own mean peaks
    in magnitude — the classic level-shift locator over a counter series.

    Deviations are cast to DECIMAL before the running window sum, so the
    result is exact no matter how either engine associates the cumulative
    sum (float window sums are NOT sequential in every engine). One
    fact-table aggregate to |types|×|days| rows; every window after that
    operates on the tiny daily relation.
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").cast("timestamp").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    wt = Window.partitionBy("event_type")
    dev = daily.select(
        "event_type",
        "day",
        F.count(F.lit(1)).over(wt).alias("n_days"),
        (
            F.col("n")
            - F.sum("n").over(wt).cast("double") / F.count(F.lit(1)).over(wt)
        )
        .cast("decimal(38,10)")
        .alias("d"),
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cs = dev.withColumn("cusum", F.sum("d").over(wc))
    wr = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum")).desc(), F.asc("day")
    )
    return (
        cs.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").alias("changepoint_day"),
            F.col("cusum").cast("double").alias("cusum_at"),
            F.col("n_days").cast("bigint").alias("n_days"),
        )
    )


# --------------------------------------------------------------------------
# q_rfm — recency/frequency/monetary segmentation per user.
# --------------------------------------------------------------------------


@query(
    "q_rfm",
    oracle="""
WITH mx AS (SELECT MAX(ts) AS now FROM events),
per_user AS (
  SELECT
    user_id,
    CAST(date_diff('day', MAX(ts), (SELECT now FROM mx)) AS BIGINT)
      AS recency_days,
    CAST(COUNT(*) AS BIGINT) AS frequency,
    CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)
      AS monetary
  FROM events GROUP BY user_id
)
SELECT
  user_id, recency_days, frequency, monetary,
  CAST(NTILE(4) OVER (ORDER BY recency_days ASC, user_id ASC) AS INTEGER)
    AS r_score,
  CAST(NTILE(4) OVER (ORDER BY frequency DESC, user_id ASC) AS INTEGER)
    AS f_score,
  CAST(NTILE(4) OVER (ORDER BY monetary DESC, user_id ASC) AS INTEGER)
    AS m_score
FROM per_user
""",
    tags=("events", "window"),
)
def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-user recency (days since last event, relative
    to the corpus's own max timestamp — reproducible, no wall clock),
    frequency, monetary total, and NTILE(4) scores on each axis with
    user_id tie-breaks so quartile boundaries are deterministic.

    One fact aggregate to |users| rows; the three global NTILE scores
    then come from ranking.with_global_rank (parallel range exchange +
    partition offsets + closed-form NTILE — never an unpartitioned
    window, which would drag the whole user relation through one task;
    at 10⁹ users that is the difference between a working plan and a
    dead one). Descending axes rank on the NEGATED measure so every pass
    uses one ascending range sort; count ties are broken by user_id, so
    scores are bit-identical to the oracle's window NTILEs.
    """
    from streaming_data_ingestion_spark.ranking import (
        ntile_of_rank,
        with_global_rank,
    )

    ev = load(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("now"))
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("value").cast("decimal(38,10)"))
            .cast("double")
            .alias("monetary"),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "user_id",
            F.datediff(F.to_date("now"), F.to_date("last_ts"))
            .cast("bigint")
            .alias("recency_days"),
            "frequency",
            "monetary",
            (-F.col("frequency")).alias("_neg_f"),
        )
        .withColumn("_neg_m", -F.col("monetary"))
    )
    out = per_user
    for axis, (score, order) in enumerate(
        {
            "r_score": ["recency_days", "user_id"],
            "f_score": ["_neg_f", "user_id"],
            "m_score": ["_neg_m", "user_id"],
        }.items()
    ):
        ranked, n = with_global_rank(
            out,
            order,
            rank_col="_rk",
            cache=(f"q_rfm.rank{axis}", sf_dir),
        )
        out = ranked.withColumn(
            score, ntile_of_rank(F.col("_rk"), n, 4)
        ).drop("_rk")
    return out.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
    )


# --------------------------------------------------------------------------
# q_cohort_matrix — first-seen cohort × week-age retention matrix.
# --------------------------------------------------------------------------


@query(
    "q_cohort_matrix",
    oracle="""
WITH uw AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
),
first_wk AS (
  SELECT user_id, MIN(wk) AS cohort FROM uw GROUP BY user_id
),
m AS (
  SELECT
    f.cohort,
    CAST(date_diff('day', f.cohort, uw.wk) / 7 AS INTEGER) AS age_weeks,
    CAST(COUNT(*) AS BIGINT) AS n_active
  FROM uw JOIN first_wk f ON uw.user_id = f.user_id
  GROUP BY 1, 2
)
SELECT
  cohort,
  age_weeks,
  n_active,
  CAST(SUM(CASE WHEN age_weeks = 0 THEN n_active ELSE 0 END)
    OVER (PARTITION BY cohort) AS BIGINT) AS cohort_size,
  CAST(n_active AS DOUBLE)
    / SUM(CASE WHEN age_weeks = 0 THEN n_active ELSE 0 END)
      OVER (PARTITION BY cohort) AS retention
FROM m
""",
    tags=("events", "analytics"),
)
def q_cohort_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cohort-retention matrix: users grouped by first-seen week,
    tracked across week ages — the triangular table every growth
    dashboard renders (q_retention is its one-step diagonal).

    Distinct (user, week) pairs reduce the fact table once; the first-seen
    aggregate and the matrix rollup both key on user/cohort, and the
    cohort-size denominator is a window sum over the tiny matrix itself
    (age-0 row = cohort size by construction), not another scan.
    """
    ev = load(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    first_wk = uw.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    m = (
        uw.join(first_wk, "user_id")
        .select(
            "cohort",
            (F.datediff(F.col("wk"), F.col("cohort")) / 7)
            .cast("int")
            .alias("age_weeks"),
        )
        .groupBy("cohort", "age_weeks")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    wc = Window.partitionBy("cohort")
    size = F.sum(
        F.when(F.col("age_weeks") == 0, F.col("n_active")).otherwise(F.lit(0))
    ).over(wc)
    return m.select(
        "cohort",
        "age_weeks",
        "n_active",
        size.alias("cohort_size"),
        (F.col("n_active").cast("double") / size).alias("retention"),
    )


# --------------------------------------------------------------------------
# q_rolling_active — trailing-7-day active users (WAU) per day.
# --------------------------------------------------------------------------


@query(
    "q_rolling_active",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
days AS (SELECT DISTINCT day FROM ud),
contrib AS (
  SELECT ud.user_id, unnest(generate_series(ud.day, ud.day + 6, INTERVAL 1 DAY)) AS wday
  FROM ud
),
wau AS (
  SELECT CAST(contrib.wday AS DATE) AS day,
         CAST(COUNT(DISTINCT contrib.user_id) AS BIGINT) AS wau
  FROM contrib JOIN days ON CAST(contrib.wday AS DATE) = days.day
  GROUP BY 1
),
dau AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day
)
SELECT
  CAST(wau.day AS TIMESTAMP) AS day,
  dau.dau,
  wau.wau,
  CAST(dau.dau AS DOUBLE) / wau.wau AS stickiness
FROM wau JOIN dau ON wau.day = dau.day
""",
    tags=("events", "analytics"),
)
def q_rolling_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU, trailing-7-day WAU, and DAU/WAU stickiness per day — the
    engagement time series every growth dashboard opens with.

    A windowed COUNT(DISTINCT) doesn't partial-aggregate; the scale
    formulation explodes each (user, day) membership onto the ≤7 window
    end-days it supports (bounded fan-out, like q_join_interval's grid)
    and counts distinct per end-day — the shuffle carries 7× the
    user-day relation, which is already orders smaller than the fact
    table. Ghost days (windows ending after the data) are dropped by the
    semi-join against observed days.
    """
    ev = load(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    days = ud.select("day").distinct()
    contrib = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("wday"),
    )
    wau = (
        contrib.join(F.broadcast(days), contrib.wday == days.day)
        .groupBy("wday")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    return (
        wau.join(dau, wau.wday == dau.day)
        .select(
            F.col("day").cast("timestamp").alias("day"),
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
        )
    )


# --------------------------------------------------------------------------
# q_funnel_time — time-to-convert distribution between funnel stages.
# --------------------------------------------------------------------------


@query(
    "q_funnel_time",
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
d AS (
  SELECT
    s1.user_id,
    epoch_us(s2.t_click) - epoch_us(s1.t_signup) AS us_to_click
  FROM s1 JOIN s2 ON s1.user_id = s2.user_id
)
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_converted,
  CAST(MIN(us_to_click) AS BIGINT) AS min_us,
  quantile_cont(us_to_click, 0.5) AS p50_us,
  quantile_cont(us_to_click, 0.9) AS p90_us,
  CAST(MAX(us_to_click) AS BIGINT) AS max_us
FROM d
""",
    tags=("events", "analytics"),
)
def q_funnel_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert between the first two funnel stages (signup →
    first later click): count, min/median/p90/max latency — the question
    product teams ask right after q_funnel's "how many".

    Same strict-ordering stage CTEs as q_funnel (per-user MINs joined
    against the prior stage), then one exact-percentile aggregate over
    the per-user latency — integer microseconds end to end, and Spark
    ``percentile`` interpolates identically to DuckDB ``quantile_cont``
    (the q_agg_percentile precedent), so the summary hashes bit-exact.
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
    d = s1.join(s2, "user_id").select(
        (F.unix_micros("t_click") - F.unix_micros("t_signup")).alias(
            "us_to_click"
        )
    )
    return d.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.min("us_to_click").alias("min_us"),
        F.expr("percentile(us_to_click, 0.5)").alias("p50_us"),
        F.expr("percentile(us_to_click, 0.9)").alias("p90_us"),
        F.max("us_to_click").alias("max_us"),
    )


# --------------------------------------------------------------------------
# q_burstiness — inter-event gap regularity per user.
# --------------------------------------------------------------------------


@query(
    "q_burstiness",
    oracle="""
WITH g AS (
  SELECT
    user_id,
    epoch_us(ts) - epoch_us(lag(ts) OVER (
      PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
  FROM events
),
m AS (
  SELECT
    user_id,
    CAST(COUNT(gap_us) AS DOUBLE) AS n,
    CAST(CAST(SUM(CAST(gap_us AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS s,
    CAST(CAST(SUM(CAST(gap_us AS HUGEINT) * CAST(gap_us AS HUGEINT))
        AS VARCHAR) AS DOUBLE) AS s2
  FROM g WHERE gap_us IS NOT NULL
  GROUP BY user_id HAVING COUNT(gap_us) >= 2
)
SELECT
  user_id,
  CAST(n AS BIGINT) AS n_gaps,
  s / n AS mean_gap_us,
  sqrt((s2 - (s * s) / n) / (n - 1)) / (s / n) AS cv,
  (sqrt((s2 - (s * s) / n) / (n - 1)) - (s / n))
    / (sqrt((s2 - (s * s) / n) / (n - 1)) + (s / n)) AS burstiness
FROM m
""",
    tags=("events", "timeseries", "stats"),
)
def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap regularity per user: coefficient of variation and
    the Goh–Barabási burstiness index B = (σ−μ)/(σ+μ) ∈ (−1, 1) —
    B≈−1 periodic (bots), B≈0 Poisson, B→1 bursty humans. The behavioral
    fingerprint abuse and engagement models both start from.

    One window pass (lag over the user/time sort) produces the gaps;
    exact decimal moments make σ and μ partition-order-proof; users need
    ≥2 gaps for a variance. The squared-gap moment stays in INTEGER
    decimal arithmetic (DECIMAL(18,0)² — µs gaps are 13 digits, the
    product fits 37) because gap² overflows 2⁵³ and engines' inexact
    huge-double→decimal casts would diverge at the ULP.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias(
            "gap_us"
        ),
    ).where(F.col("gap_us").isNotNull())
    gi = F.col("gap_us").cast("decimal(18,0)")
    m = (
        g.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(F.col("gap_us").cast("decimal(38,10)"))
            .cast("double")
            .alias("s"),
            F.sum(gi * gi).cast("double").alias("s2"),
        )
        .where(F.col("n") >= 2)
    )
    n, s, s2 = F.col("n"), F.col("s"), F.col("s2")
    mean = s / n
    sd = F.sqrt((s2 - s * s / n) / (n - 1))
    return m.select(
        "user_id",
        n.cast("bigint").alias("n_gaps"),
        mean.alias("mean_gap_us"),
        (sd / mean).alias("cv"),
        ((sd - mean) / (sd + mean)).alias("burstiness"),
    )


# --------------------------------------------------------------------------
# q_transition_entropy — predictability of each event type's successor.
# --------------------------------------------------------------------------


@query(
    "q_transition_entropy",
    oracle="""
WITH stepped AS (
  SELECT event_type AS dst,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS src
  FROM events
),
pairs AS (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
  FROM stepped WHERE src IS NOT NULL
  GROUP BY src, dst
),
p AS (
  SELECT src, dst, n,
         CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY src) AS p
  FROM pairs
)
SELECT
  src,
  CAST(SUM(n) AS BIGINT) AS n_transitions,
  CAST(COUNT(*) AS BIGINT) AS n_successors,
  ROUND(CAST(CAST(SUM(CAST(-p * ln(p) AS DECIMAL(38,10))) AS VARCHAR)
    AS DOUBLE), 6) AS entropy_nats
FROM p
GROUP BY src
""",
    tags=("events", "analytics", "markov", "stats"),
)
def q_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each event type's successor distribution — how
    predictable is what users do NEXT after each action (0 = always the
    same follow-up; ln|types| = uniform). The one-scalar-per-state
    summary of q_markov_transitions that journey optimization reads.

    Same lag-window transition pairs; probabilities are exact-count
    ratios; each −p·ln p term decimal-sums with round(6) absorbing the
    libm ln ULP. Everything after the window runs on the |types|² pair
    relation.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    stepped = ev.select(
        F.col("event_type").alias("dst"),
        F.lag("event_type").over(w).alias("src"),
    ).where(F.col("src").isNotNull())
    pairs = stepped.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    p = F.col("n").cast("double") / F.sum("n").over(Window.partitionBy("src"))
    scored = pairs.withColumn("p", p)
    return scored.groupBy("src").agg(
        F.sum("n").alias("n_transitions"),
        F.count(F.lit(1)).alias("n_successors"),
        F.round(
            F.sum((-F.col("p") * F.log("p")).cast("decimal(38,10)")).cast(
                "double"
            ),
            6,
        ).alias("entropy_nats"),
    )


# --------------------------------------------------------------------------
# q_seasonal_decompose — additive trend/seasonal/residual decomposition.
# --------------------------------------------------------------------------


@query(
    "q_seasonal_decompose",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
         (CAST(ts AS DATE) - DATE '1970-01-01') % 7 AS dow,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2, 3
),
tr AS (
  SELECT *,
    CAST(CAST(SUM(CAST(n AS DECIMAL(38,10))) OVER w AS VARCHAR) AS DOUBLE)
      / COUNT(*) OVER w AS trend
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
se AS (
  SELECT *,
    CAST(CAST(SUM(CAST(n - trend AS DECIMAL(38,10)))
      OVER (PARTITION BY event_type, dow) AS VARCHAR) AS DOUBLE)
      / COUNT(*) OVER (PARTITION BY event_type, dow) AS seasonal
  FROM tr
)
SELECT
  event_type,
  day,
  n,
  trend,
  seasonal,
  (n - trend) - seasonal AS residual
FROM se
""",
    tags=("events", "timeseries", "stats"),
)
def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of each type's daily volume:
    observed = trend (7-day centered moving average) + seasonal (mean
    detrended value per day-of-week) + residual — the anomaly baseline
    that separates "weekend dip" from "real drop".

    One fact aggregate reduces to the daily relation; the centered-MA
    and per-dow windows both run on that tiny series and share the
    event_type partitioning. All averages are decimal-sum → one IEEE
    division (the compat.py discipline), so both engines decompose
    bit-identically; the identity observed ≡ trend+seasonal+residual
    holds exactly by construction.
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.to_date("ts").cast("timestamp").alias("day"),
        (F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")) % 7)
        .alias("dow"),
    ).agg(F.count(F.lit(1)).alias("n"))
    wt = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    tr = daily.withColumn(
        "trend",
        F.sum(F.col("n").cast("decimal(38,10)")).over(wt).cast("double")
        / F.count(F.lit(1)).over(wt),
    )
    ws = Window.partitionBy("event_type", "dow")
    se = tr.withColumn(
        "seasonal",
        F.sum((F.col("n") - F.col("trend")).cast("decimal(38,10)"))
        .over(ws)
        .cast("double")
        / F.count(F.lit(1)).over(ws),
    )
    return se.select(
        "event_type",
        "day",
        "n",
        "trend",
        "seasonal",
        ((F.col("n") - F.col("trend")) - F.col("seasonal")).alias("residual"),
    )


# --------------------------------------------------------------------------
# q_forecast_holt — Holt linear-trend forecast of daily event volume per
# type (the capacity-planning readout on top of the daily rollup).
# --------------------------------------------------------------------------


@query(
    "q_forecast_holt",
    oracle="""
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS v
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
         COUNT(*) OVER (PARTITION BY event_type) AS n_days
  FROM daily
),
rec AS (
  SELECT event_type, i, n_days, v AS l, CAST(0.0 AS DOUBLE) AS b
  FROM idx WHERE i = 1
  UNION ALL
  SELECT d.event_type, d.i, d.n_days,
         0.5 * d.v + 0.5 * (r.l + r.b),
         0.5 * ((0.5 * d.v + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b
  FROM rec r JOIN idx d ON d.event_type = r.event_type AND d.i = r.i + 1
)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
       l AS level, b AS trend, l + 7.0 * b AS forecast_7d
FROM rec WHERE i = n_days
""",
    tags=("events", "timeseries", "forecast"),
)
def q_forecast_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend smoothing (level + trend double-exponential) of
    each event type's daily volume, with the 7-day-ahead forecast — the
    capacity-planning companion to q_ewma's single-exponential fold.

    Recursion (α = β = 1/2):  l_i = ½x_i + ½(l+b);  b_i = ½(l_i−l) + ½b
    — every step is exact power-of-two scalings plus IEEE additions, and
    both engines run the SAME fold over the SAME day ordering: Spark as
    a struct-accumulator `aggregate` over the sorted per-type day array,
    DuckDB as a recursive CTE stepping i→i+1 (the b-step re-states the
    l-step expression inline so the two engines evaluate the identical
    operation sequence).

    Scale shape: ONE (event_type, day) shuffle with map-side-combined
    DECIMAL partials collapses the fact table to the daily rollup — the
    only data-sized stage; the per-type fold then runs over an array
    bounded by the CALENDAR (days, not events), the same bounded-state
    argument as q_ewma's recency cap. No window over the fact table, no
    Python, no driver loop.
    """
    from streaming_data_ingestion_spark.compat import DEC

    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum(F.col("value").cast(DEC)).cast("double").alias("v"))
    )
    per = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "v"))).alias("rows"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    vs = F.transform(F.col("rows"), lambda s: s["v"])
    half = F.lit(0.5)

    def _step(acc, x):
        new_l = half * x + half * (acc["l"] + acc["b"])
        new_b = half * ((half * x + half * (acc["l"] + acc["b"])) - acc["l"]) + (
            half * acc["b"]
        )
        return F.struct(new_l.alias("l"), new_b.alias("b"))

    fold = F.aggregate(
        F.slice(vs, F.lit(2), F.greatest(F.size(vs) - 1, F.lit(0))),
        F.struct(
            F.element_at(vs, 1).alias("l"), F.lit(0.0).cast("double").alias("b")
        ),
        _step,
    )
    return per.select(
        "event_type",
        "n_days",
        fold["l"].alias("level"),
        fold["b"].alias("trend"),
        (fold["l"] + F.lit(7.0) * fold["b"]).alias("forecast_7d"),
    )


# --------------------------------------------------------------------------
# q_forecast_hw — additive Holt-Winters (level + trend + weekly season)
# forecast of daily event volume per type; the seasonal completion of
# q_forecast_holt (q_acf's lag-7 spike is the structure this models).
# --------------------------------------------------------------------------


@query(
    "q_forecast_hw",
    oracle="""
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS v
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
         COUNT(*) OVER (PARTITION BY event_type) AS n_days
  FROM daily
),
init AS (
  SELECT event_type, n_days,
         (MAX(CASE WHEN i=1 THEN v END) + MAX(CASE WHEN i=2 THEN v END)
          + MAX(CASE WHEN i=3 THEN v END) + MAX(CASE WHEN i=4 THEN v END)
          + MAX(CASE WHEN i=5 THEN v END) + MAX(CASE WHEN i=6 THEN v END)
          + MAX(CASE WHEN i=7 THEN v END)) / 7.0 AS l0,
         [MAX(CASE WHEN i=1 THEN v END), MAX(CASE WHEN i=2 THEN v END),
          MAX(CASE WHEN i=3 THEN v END), MAX(CASE WHEN i=4 THEN v END),
          MAX(CASE WHEN i=5 THEN v END), MAX(CASE WHEN i=6 THEN v END),
          MAX(CASE WHEN i=7 THEN v END)] AS x7
  FROM idx WHERE i <= 7 AND n_days >= 8
  GROUP BY event_type, n_days
),
rec AS (
  SELECT event_type, CAST(7 AS BIGINT) AS i, n_days,
         l0 AS l, CAST(0.0 AS DOUBLE) AS b,
         [x7[1]-l0, x7[2]-l0, x7[3]-l0, x7[4]-l0,
          x7[5]-l0, x7[6]-l0, x7[7]-l0] AS s
  FROM init
  UNION ALL
  SELECT d.event_type, d.i, r.n_days,
         0.5 * (d.v - r.s[1]) + 0.5 * (r.l + r.b),
         0.5 * ((0.5 * (d.v - r.s[1]) + 0.5 * (r.l + r.b)) - r.l)
           + 0.5 * r.b,
         list_append(
           r.s[2:7],
           0.5 * (d.v - (0.5 * (d.v - r.s[1]) + 0.5 * (r.l + r.b)))
             + 0.5 * r.s[1])
  FROM rec r JOIN idx d ON d.event_type = r.event_type AND d.i = r.i + 1
)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
       l AS level, b AS trend,
       l + 1.0 * b + s[1] AS forecast_1d,
       l + 7.0 * b + s[7] AS forecast_7d
FROM rec WHERE i = n_days
""",
    tags=("events", "timeseries", "forecast"),
)
def q_forecast_hw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters smoothing (level + trend + period-7 season,
    α = β = γ = ½) of each event type's daily volume, with 1-day- and
    7-day-ahead forecasts — the seasonal completion of q_forecast_holt
    for series where q_acf shows a weekly spike.

    Recursion per day i (season m = 7, s queue head = season of day i):
        l_i = ½(x_i − s_head) + ½(l + b)
        b_i = ½(l_i − l) + ½ b
        s_i = ½(x_i − l_i) + ½ s_head        (appended, head dropped)
    seeded classically: l₀ = mean of the first week, b₀ = 0,
    s₀ⱼ = xⱼ − l₀. Every coefficient is an exact power-of-two scaling,
    so each step is a fixed IEEE operation sequence both engines run
    identically: Spark as a struct{l, b, s:array} accumulator fold over
    the sorted per-type day array, DuckDB as a recursive CTE carrying a
    7-element list and stepping i→i+1 (the l-step expression re-stated
    inline wherever the b/s steps consume it, so the arithmetic is
    token-identical). Types with under 8 days have no post-seed step
    and are excluded in both engines.

    Scale shape: identical to q_forecast_holt — ONE (event_type, day)
    DECIMAL-partial shuffle collapses the fact table; the fold then runs
    over a CALENDAR-bounded array with constant (7-slot) seasonal state.
    No window over the fact table, no Python, no driver loop.
    """
    from streaming_data_ingestion_spark.compat import DEC

    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum(F.col("value").cast(DEC)).cast("double").alias("v"))
    )
    per = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "v"))).alias("rows"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    ).where(F.col("n_days") >= 8)
    vs = F.transform(F.col("rows"), lambda s: s["v"])
    half = F.lit(0.5)

    def el(j: int):
        return F.element_at(vs, j)

    l0 = (el(1) + el(2) + el(3) + el(4) + el(5) + el(6) + el(7)) / F.lit(7.0)
    s0 = F.array(*[el(j) - l0 for j in range(1, 8)])

    def _step(acc, x):
        s_head = F.element_at(acc["s"], 1)
        l_new = half * (x - s_head) + half * (acc["l"] + acc["b"])
        b_new = half * (
            (half * (x - s_head) + half * (acc["l"] + acc["b"])) - acc["l"]
        ) + half * acc["b"]
        s_elem = (
            half * (x - (half * (x - s_head) + half * (acc["l"] + acc["b"])))
            + half * s_head
        )
        s_new = F.concat(F.slice(acc["s"], 2, 6), F.array(s_elem))
        return F.struct(l_new.alias("l"), b_new.alias("b"), s_new.alias("s"))

    fold = F.aggregate(
        F.slice(vs, F.lit(8), F.greatest(F.size(vs) - 7, F.lit(0))),
        F.struct(l0.alias("l"), F.lit(0.0).cast("double").alias("b"), s0.alias("s")),
        _step,
    )
    return per.select(
        "event_type",
        "n_days",
        fold["l"].alias("level"),
        fold["b"].alias("trend"),
        (fold["l"] + F.lit(1.0) * fold["b"] + F.element_at(fold["s"], 1)).alias(
            "forecast_1d"
        ),
        (fold["l"] + F.lit(7.0) * fold["b"] + F.element_at(fold["s"], 7)).alias(
            "forecast_7d"
        ),
    )


# --------------------------------------------------------------------------
# q_session_length_hist — distribution of session sizes (the readout of
# the q_sessionize construction).
# --------------------------------------------------------------------------


@query(
    "q_session_length_hist",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id,
    CASE WHEN lag(ts) OVER w IS NULL
           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
         THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
assigned AS (
  SELECT user_id, ts,
    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
),
sessions AS (
  SELECT user_id, session_seq, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM assigned GROUP BY user_id, session_seq
)
SELECT
  n_events,
  CAST(COUNT(*) AS BIGINT) AS n_sessions,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM sessions
GROUP BY n_events
ORDER BY n_events
""",
    tags=("events", "sessions"),
)
def q_session_length_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-size distribution: how many sessions contain exactly k
    events (and how many users produce them) — the engagement-depth
    histogram product analytics reads off the q_sessionize construction
    (a long tail of 1-event sessions = bounce-heavy traffic; mass at
    high k = sticky flows).

    Scale shape: identical to q_sessionize — ONE user_id exchange
    shared by both window passes and the per-session rollup — plus a
    session-size-keyed final aggregate whose key domain is bounded by
    the longest session, not the corpus. Gap math is exact integer
    microseconds; every count is a BIGINT.
    """
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    new_s = F.when(
        F.lag("ts").over(w).isNull()
        | (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
            > 1_800_000_000
        ),
        1,
    ).otherwise(0)
    assigned = e.select(
        "user_id", "ts", F.sum(new_s).over(run).alias("session_seq")
    )
    sessions = assigned.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    return (
        sessions.groupBy("n_events")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy("n_events")
    )


# --------------------------------------------------------------------------
# q_scd2_pit_join — point-in-time fact join THROUGH the SCD2 dimension
# history (the consumer of the q_scd2_intervals build).
# --------------------------------------------------------------------------

_PIT_LO, _PIT_HI = 50.0, 150.0  # click-value segment band edges


@query(
    "q_scd2_pit_join",
    oracle=f"""
WITH clicks AS (
  SELECT user_id, ts, event_id,
         CASE WHEN value < {_PIT_LO} THEN 'low'
              WHEN value < {_PIT_HI} THEN 'mid'
              ELSE 'high' END AS seg
  FROM events WHERE event_type = 'click'
),
ordered AS (
  SELECT user_id, ts, event_id, seg,
         lag(seg) OVER w AS prev_seg
  FROM clicks
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
seg AS (
  SELECT user_id, ts, seg,
         SUM(CASE WHEN prev_seg IS NULL OR prev_seg != seg
                  THEN 1 ELSE 0 END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
  FROM ordered
),
dim AS (
  SELECT user_id, version, seg, MIN(ts) AS valid_from
  FROM seg GROUP BY user_id, version, seg
),
dim2 AS (
  SELECT user_id, seg, valid_from,
         lead(valid_from) OVER (
           PARTITION BY user_id ORDER BY version) AS valid_to
  FROM dim
),
p AS (
  SELECT user_id, ts, CAST(value AS DECIMAL(38,10)) AS v
  FROM events WHERE event_type = 'purchase'
),
joined AS (
  SELECT COALESCE(d.seg, 'none') AS segment, p.v
  FROM p LEFT JOIN dim2 d
    ON d.user_id = p.user_id
   AND p.ts >= d.valid_from
   AND (d.valid_to IS NULL OR p.ts < d.valid_to)
)
SELECT
  segment,
  CAST(COUNT(*) AS BIGINT) AS n_purchases,
  CAST(CAST(SUM(v) AS VARCHAR) AS DOUBLE) AS revenue
FROM joined
GROUP BY segment
ORDER BY segment
""",
    tags=("events", "scd", "join"),
)
def q_scd2_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time fact join THROUGH a slowly-changing dimension:
    each purchase joins the click-value segment ('low'/'mid'/'high')
    its user was in AT PURCHASE TIME — the [valid_from, valid_to)
    interval of the SCD2 history built from the user's click stream
    (the q_scd2_intervals run-collapse applied to a value band).
    Purchases before the user's first click report segment 'none'. This
    is the warehouse temporal-join pattern: facts never join the
    CURRENT dimension row, they join the version valid at event time —
    the difference between correct and subtly-wrong revenue attribution
    whenever the dimension changes mid-history.

    Scale shape: the dimension history is change-count-sized (runs, not
    clicks); the PIT join is a user_id EQUI hash join with the interval
    containment as a residual on the same join node — never a
    time-range nested loop; both window passes in the build share one
    user_id exchange. Exactness: band edges compare raw input doubles
    against literals; interval bounds are untouched timestamps; revenue
    is an exact decimal sum converted once.
    """
    from pyspark.sql import Window

    from streaming_data_ingestion_spark.compat import DEC

    ev = load(spark, sf_dir, "events")
    seg_band = (
        F.when(F.col("value") < _PIT_LO, "low")
        .when(F.col("value") < _PIT_HI, "mid")
        .otherwise("high")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", seg_band.alias("seg")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = clicks.select(
        "user_id",
        "ts",
        "seg",
        F.sum(
            F.when(
                F.lag("seg").over(w).isNull()
                | (F.lag("seg").over(w) != F.col("seg")),
                1,
            ).otherwise(0)
        )
        .over(run)
        .alias("version"),
    )
    dim = flagged.groupBy("user_id", "version", "seg").agg(
        F.min("ts").alias("valid_from")
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    dim2 = dim.select(
        "user_id",
        "seg",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").cast(DEC).alias("v")
    )
    joined = p.join(
        dim2,
        (p["user_id"] == dim2["user_id"])
        & (p["ts"] >= dim2["valid_from"])
        & (dim2["valid_to"].isNull() | (p["ts"] < dim2["valid_to"])),
        "left",
    ).select(F.coalesce(dim2["seg"], F.lit("none")).alias("segment"), "v")
    return (
        joined.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum("v").cast("double").alias("revenue"),
        )
        .orderBy("segment")
    )


# --------------------------------------------------------------------------
# q_attribution_ushape — position-based (U-shaped) multi-touch
# attribution over the 7-day lookback path.
# --------------------------------------------------------------------------

_USHAPE_LOOKBACK_US = 7 * 86_400 * 1_000_000


@query(
    "q_attribution_ushape",
    oracle=f"""
WITH p AS (
  SELECT event_id AS p_id, user_id, ts AS p_ts,
         CAST(value AS DECIMAL(38,10)) AS rev
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT event_id AS c_id, user_id, ts AS c_ts,
         CASE WHEN value < 50.0 THEN 'low'
              WHEN value < 150.0 THEN 'mid'
              ELSE 'high' END AS band
  FROM events WHERE event_type = 'click'
),
path AS (
  SELECT p.p_id, p.rev, c.band,
         ROW_NUMBER() OVER (PARTITION BY p.p_id
                            ORDER BY c.c_ts, c.c_id) AS pos,
         COUNT(*) OVER (PARTITION BY p.p_id) AS k
  FROM p JOIN c ON c.user_id = p.user_id
   AND c.c_ts < p.p_ts
   AND date_diff('microsecond', c.c_ts, p.p_ts) <= {_USHAPE_LOOKBACK_US}
),
credited AS (
  SELECT band, rev,
         CASE WHEN k = 1 THEN 1.0
              WHEN k = 2 THEN 0.5
              WHEN pos = 1 THEN 0.4
              WHEN pos = k THEN 0.4
              ELSE 0.2 / CAST(k - 2 AS DOUBLE) END AS credit
  FROM path
)
SELECT
  band,
  CAST(COUNT(*) AS BIGINT) AS n_touches,
  ROUND(CAST(CAST(SUM(CAST(credit AS DECIMAL(38,10))) AS VARCHAR)
        AS DOUBLE), 6) AS total_credit,
  ROUND(CAST(CAST(SUM(CAST(credit * CAST(CAST(rev AS VARCHAR) AS DOUBLE)
        AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE), 6)
    AS attributed_revenue
FROM credited
GROUP BY band
ORDER BY band
""",
    tags=("events", "attribution"),
)
def q_attribution_ushape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: every click in
    the 7 days before a purchase shares that purchase's revenue — 40%
    to the first touch, 40% to the last, 20% split across the middle
    (1.0 / 0.5-0.5 for one- and two-click paths) — rolled up by the
    click's value band. The multi-touch complement of q_attribution's
    last-touch rule: last-touch over-credits the final click; the
    U-shape is the standard production compromise that still credits
    discovery.

    Scale shape: path assembly is a user_id EQUI hash join with the
    lookback as an integer-microsecond residual (never a time nested
    loop); position/size windows partition by PURCHASE id — purchase-
    count-many small partitions, never global. Credits are exact CASE
    constants or one IEEE division; credit and credit·revenue sums go
    through DECIMAL for order independence; round(6) absorbs nothing
    transcendental, only the fixed display precision.
    """
    from pyspark.sql import Window

    from streaming_data_ingestion_spark.compat import DEC

    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").cast(DEC).alias("rev"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.when(F.col("value") < 50.0, "low")
        .when(F.col("value") < 150.0, "mid")
        .otherwise("high")
        .alias("band"),
    )
    path = p.join(
        c,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("c_ts") < F.col("p_ts"))
        & (
            F.unix_micros("p_ts") - F.unix_micros("c_ts")
            <= F.lit(_USHAPE_LOOKBACK_US)
        ),
    )
    w = Window.partitionBy("p_id").orderBy("c_ts", "c_id")
    wk = Window.partitionBy("p_id")
    path = path.select(
        "band",
        "rev",
        F.row_number().over(w).alias("pos"),
        F.count(F.lit(1)).over(wk).alias("k"),
    )
    credit = (
        F.when(F.col("k") == 1, F.lit(1.0))
        .when(F.col("k") == 2, F.lit(0.5))
        .when(F.col("pos") == 1, F.lit(0.4))
        .when(F.col("pos") == F.col("k"), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("k") - 2).cast("double"))
    )
    return (
        path.select(
            "band",
            credit.alias("credit"),
            (credit * F.col("rev").cast("double")).alias("crev"),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.round(F.sum(F.col("credit").cast(DEC)).cast("double"), 6).alias(
                "total_credit"
            ),
            F.round(F.sum(F.col("crev").cast(DEC)).cast("double"), 6).alias(
                "attributed_revenue"
            ),
        )
        .orderBy("band")
    )


# --------------------------------------------------------------------------
# q_new_vs_returning — daily active users split by first-ever-seen vs
# returning (the acquisition/retention composition of every DAU point).
# --------------------------------------------------------------------------


@query(
    "q_new_vs_returning",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
fs AS (SELECT user_id, MIN(day) AS first_day FROM ud GROUP BY user_id)
SELECT
  ud.day,
  CAST(COUNT(*) AS BIGINT) AS n_active,
  CAST(SUM(CASE WHEN ud.day = fs.first_day THEN 1 ELSE 0 END) AS BIGINT)
    AS n_new,
  CAST(SUM(CASE WHEN ud.day = fs.first_day THEN 0 ELSE 1 END) AS BIGINT)
    AS n_returning,
  CAST(SUM(CASE WHEN ud.day = fs.first_day THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS new_share
FROM ud JOIN fs USING (user_id)
GROUP BY ud.day
ORDER BY ud.day
""",
    tags=("events", "lifecycle"),
)
def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users decomposed into first-ever-seen vs returning —
    the composition behind every DAU chart (a flat DAU line can hide
    collapsing retention masked by acquisition; `new_share` makes the
    trade visible per day). Complements q_cum_uniques (running total of
    firsts), q_rolling_active (DAU/WAU windows) and q_churn_cohorts
    (vintage decay) with the per-day split product analytics actually
    plots.

    Exactness: first-seen is an integer-date MIN per user; all counts
    BIGINT; new_share one IEEE division.

    Scale shape: the fact table collapses to the (user, day) distinct
    once (map-side combinable); the first-seen aggregate groups by a
    SUBSET key (user) of that relation's partitioning, so Catalyst plans
    no second exchange; the join back is user-keyed equi and the final
    rollup is calendar-bounded.
    """
    ud = (
        load(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    fs = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    is_new = F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)
    return (
        ud.join(fs, "user_id")
        .groupBy(F.col("day").cast("timestamp").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_active"),
            F.sum(is_new).cast("long").alias("n_new"),
            F.sum(1 - is_new).cast("long").alias("n_returning"),
            (
                F.sum(is_new).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("new_share"),
        )
        .orderBy("day")
    )
