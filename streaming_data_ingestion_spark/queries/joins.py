"""Join operators (SURVEY.md §2B "Joins").

The reference never joins (its pipeline is a stateless map); this family is
north-star mandate. Physical strategy is left to Catalyst + AQE except where
a hint is the correct scale decision:

- dimension tables (region/nation/supplier) are broadcast — at 100 TB the
  fact table never shuffles for a 25-row dimension;
- the range join is an equi-join on a key (user_id) with a range predicate
  *as a post-join filter*, so it stays a hash join instead of degenerating
  into BroadcastNestedLoop;
- multi-join chains rely on AQE join reordering + skew handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streaming_data_ingestion_spark.compat import dsum, sql_dsum
from streaming_data_ingestion_spark.layout import salted_join
from streaming_data_ingestion_spark.registry import query
from streaming_data_ingestion_spark.tables import load

# --------------------------------------------------------------------------
# q_join_inner — equi inner join fact ⋈ dim.
# --------------------------------------------------------------------------


@query(
    "q_join_inner",
    oracle="""
SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_totalprice > 200000.0
""",
    tags=("join",),
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer on custkey; Catalyst broadcasts the small side."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000.0)
    c = load(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


# --------------------------------------------------------------------------
# q_join_multi — 5-table chain (TPC-H Q5 shape): revenue per nation.
# --------------------------------------------------------------------------


@query(
    "q_join_multi",
    oracle=f"""
SELECT
  n.n_name,
  r.r_name,
  {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")},
  COUNT(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name, r.r_name
""",
    tags=("join", "agg"),
)
def q_join_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem⋈orders⋈customer⋈nation⋈region → revenue per nation.

    The two big tables meet in one shuffled join on l_orderkey; customer,
    nation, region ride along as broadcasts. AQE reorders/coalesces at
    runtime.
    """
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(dsum(revenue, "revenue"), F.count(F.lit(1)).alias("n_items"))
    )


# --------------------------------------------------------------------------
# q_join_outer — left outer with join-time predicate.
# --------------------------------------------------------------------------


@query(
    "q_join_outer",
    oracle="""
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
FROM customer c
LEFT JOIN orders o
  ON c.c_custkey = o.o_custkey AND o.o_totalprice > 450000.0
""",
    tags=("join",),
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer LEFT JOIN high-value orders — unmatched customers keep
    NULL order columns (the predicate lives in the ON clause, not WHERE)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_totalprice > 450000.0)
    return c.join(o, cond, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


# --------------------------------------------------------------------------
# q_join_semi_anti — EXISTS / NOT EXISTS as left-semi / left-anti.
# --------------------------------------------------------------------------


@query(
    "q_join_semi_anti",
    oracle="""
SELECT 'semi' AS tag, c_custkey FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
              AND o.o_orderstatus = 'F')
UNION ALL
SELECT 'anti' AS tag, c_custkey FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
    tags=("join",),
)
def q_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi (EXISTS) + left_anti (NOT EXISTS), tagged + unioned.

    Semi/anti joins never materialize the probe side's payload — at scale
    they shuffle only the keys of the build side.
    """
    c = load(spark, sf_dir, "customer")
    o_f = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    o = load(spark, sf_dir, "orders")
    semi = (
        c.join(o_f, c.c_custkey == o_f.o_custkey, "left_semi")
        .select(F.lit("semi").alias("tag"), "c_custkey")
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select(F.lit("anti").alias("tag"), "c_custkey")
    )
    return semi.unionByName(anti)


# --------------------------------------------------------------------------
# q_join_broadcast — explicit broadcast hint on the dimension chain.
# --------------------------------------------------------------------------


@query(
    "q_join_broadcast",
    oracle="""
SELECT r.r_name, n.n_name, COUNT(*) AS n_customers
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
""",
    tags=("join",),
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast(nation), broadcast(region): the customer scan
    never shuffles for the join — only the final aggregate shuffles."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# --------------------------------------------------------------------------
# q_join_range — banded self-join on event time.
# --------------------------------------------------------------------------


@query(
    "q_join_range",
    oracle="""
SELECT e1.user_id, COUNT(*) AS n_followups
FROM events e1
JOIN events e2
  ON e1.user_id = e2.user_id
 AND e2.ts > e1.ts
 AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
WHERE e1.event_type = 'click'
GROUP BY e1.user_id
""",
    tags=("join", "range"),
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: events followed by another event of the same user
    within 5 minutes.

    The equi key (user_id) carries the join — Catalyst plans a hash join
    on user_id and evaluates the time band as a residual filter. Without
    the equi key this would be a BroadcastNestedLoopJoin (quadratic);
    with it the cost is per-user-group, which survives scale-out.
    """
    ev = load(spark, sf_dir, "events")
    e1 = ev.filter(F.col("event_type") == "click").alias("e1")
    e2 = ev.alias("e2")
    cond = (
        (F.col("e1.user_id") == F.col("e2.user_id"))
        & (F.col("e2.ts") > F.col("e1.ts"))
        & (F.col("e2.ts") <= F.col("e1.ts") + F.expr("INTERVAL 5 MINUTES"))
    )
    return (
        e1.join(e2, cond, "inner")
        .groupBy(F.col("e1.user_id").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_followups"))
    )


# --------------------------------------------------------------------------
# q_join_asof — as-of (point-in-time) join: each click matched to the same
# user's most recent purchase at-or-before it.
# --------------------------------------------------------------------------


@query(
    "q_join_asof",
    oracle="""
WITH p AS (
  SELECT user_id, ts AS purchase_ts, MAX(event_id) AS purchase_event_id
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, ts
),
c AS (
  SELECT event_id, ts, user_id FROM events WHERE event_type = 'click'
)
SELECT c.event_id, c.ts, c.user_id, p.purchase_event_id, p.purchase_ts
FROM c ASOF LEFT JOIN p
  ON c.user_id = p.user_id AND c.ts >= p.purchase_ts
""",
    tags=("join", "asof"),
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — the canonical time-series operator Spark lacks as a
    built-in (DuckDB spells it ASOF JOIN, which is the oracle here).

    Spark-first implementation: union both sides tagged by role, then one
    window pass per user ordered by (ts, role, event_id) where purchases
    sort before clicks at equal ts; ``last_value(..., ignorenulls)`` over
    the unbounded-preceding frame carries the latest purchase forward
    onto every click row. One shuffle on user_id, linear scan per user —
    never the O(clicks × purchases) range join a naive formulation
    produces, and no per-key driver loop. Right side is pre-deduplicated
    to one purchase per (user, ts) (max event_id) so tie-breaks are
    deterministic in both engines.
    """
    ev = load(spark, sf_dir, "events")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_event_id"))
        .select(
            F.lit(None).cast("long").alias("event_id"),
            "ts",
            "user_id",
            "purchase_event_id",
            F.col("ts").alias("p_ts"),
            F.lit(1).alias("is_purchase"),
        )
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id",
        "ts",
        "user_id",
        F.lit(None).cast("long").alias("purchase_event_id"),
        F.lit(None).cast("timestamp").alias("p_ts"),
        F.lit(0).alias("is_purchase"),
    )
    # at equal ts the purchase row must precede the click so `>=` matches
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts").asc(),
            F.col("is_purchase").desc(),
            F.col("purchase_event_id").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = purchases.unionByName(clicks).select(
        "event_id",
        "ts",
        "user_id",
        "is_purchase",
        F.last("purchase_event_id", ignorenulls=True)
        .over(w)
        .alias("purchase_event_id"),
        F.last("p_ts", ignorenulls=True).over(w).alias("purchase_ts"),
    )
    return merged.filter(F.col("is_purchase") == 0).select(
        "event_id", "ts", "user_id", "purchase_event_id", "purchase_ts"
    )


# --------------------------------------------------------------------------
# q_join_asof_fwd — FORWARD as-of join: each click matched to the NEXT
# purchase at-or-after it (DuckDB: ASOF with `<=`; the other direction of
# q_join_asof's backward match).
# --------------------------------------------------------------------------


@query(
    "q_join_asof_fwd",
    oracle="""
WITH p AS (
  SELECT user_id, ts AS purchase_ts, MAX(event_id) AS purchase_event_id
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, ts
),
c AS (
  SELECT event_id, ts, user_id FROM events WHERE event_type = 'click'
)
SELECT c.event_id, c.ts, c.user_id, p.purchase_event_id, p.purchase_ts
FROM c ASOF LEFT JOIN p
  ON c.user_id = p.user_id AND c.ts <= p.purchase_ts
""",
    tags=("join", "asof"),
)
def q_join_asof_fwd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join — each click matched to its user's NEXT
    purchase at or after the click (time-to-conversion attribution looks
    forward; q_join_asof's last-touch looks backward). DuckDB spells it
    ``ASOF LEFT JOIN … ON c.ts <= p.purchase_ts``.

    Same scale shape as the backward variant: union both sides tagged by
    role, ONE window pass per user — here ordered by ts DESCENDING
    (purchases before clicks at equal ts, so ``<=`` admits the same-
    instant purchase) with ``last(..., ignorenulls)`` carrying the
    nearest FOLLOWING purchase backward onto each click. One shuffle on
    user_id, linear per user, never an O(clicks × purchases) range join.
    """
    ev = load(spark, sf_dir, "events")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_event_id"))
        .select(
            F.lit(None).cast("long").alias("event_id"),
            "ts",
            "user_id",
            "purchase_event_id",
            F.col("ts").alias("p_ts"),
            F.lit(1).alias("is_purchase"),
        )
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id",
        "ts",
        "user_id",
        F.lit(None).cast("long").alias("purchase_event_id"),
        F.lit(None).cast("timestamp").alias("p_ts"),
        F.lit(0).alias("is_purchase"),
    )
    # descending scan: at equal ts the purchase row must still come
    # FIRST so the click's `<=` match includes the same-instant purchase
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts").desc(),
            F.col("is_purchase").desc(),
            F.col("purchase_event_id").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = purchases.unionByName(clicks).select(
        "event_id",
        "ts",
        "user_id",
        "is_purchase",
        F.last("purchase_event_id", ignorenulls=True)
        .over(w)
        .alias("purchase_event_id"),
        F.last("p_ts", ignorenulls=True).over(w).alias("purchase_ts"),
    )
    return merged.filter(F.col("is_purchase") == 0).select(
        "event_id", "ts", "user_id", "purchase_event_id", "purchase_ts"
    )


# --------------------------------------------------------------------------
# q_join_salted — skew-resistant join via key salting (layout.salted_join).
# --------------------------------------------------------------------------


@query(
    "q_join_salted",
    oracle=f"""
SELECT
  s.s_name,
  COUNT(*) AS n_items,
  {sql_dsum("l.l_extendedprice", "sum_price")}
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_name
""",
    tags=("join", "layout"),
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitem⋈supplier through the salting path, aggregated per
    supplier — the oracle is the PLAIN join, proving salting changes the
    shuffle layout and nothing else.

    Salting spreads each hot join key over n_salts reducers (big side
    gets a random salt, small side is exploded across all salts), the
    manual fallback when one key dwarfs the rest and the small side is
    still too big to broadcast. Result-identity to the plain join is the
    whole contract, and this query pins it under the oracle hash.
    """
    li = load(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    sup = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    joined = salted_join(li, sup, "l_suppkey", n_salts=8)
    return joined.groupBy("s_name").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum("l_extendedprice", "sum_price"),
    )


# --------------------------------------------------------------------------
# q_join_interval — interval-overlap join via grid binning.
# --------------------------------------------------------------------------

_HR_US = 3_600_000_000  # one hour of microseconds = the grid cell width


@query(
    "q_join_interval",
    oracle="""
WITH a AS (
  SELECT user_id, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
         epoch_us(MIN(ts)) AS a_start, epoch_us(MAX(ts)) AS a_end
  FROM events GROUP BY 1, 2
),
b AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_start,
         epoch_us(date_trunc('hour', ts)) AS b_start,
         epoch_us(date_trunc('hour', ts)) + 3600000000 AS b_end,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2 HAVING COUNT(*) >= 3
)
SELECT a.user_id, a.day, b.event_type, b.hour_start, b.n_events,
       CAST(least(a.a_end, b.b_end) - greatest(a.a_start, b.b_start) AS BIGINT)
         AS overlap_us
FROM a JOIN b ON least(a.a_end, b.b_end) > greatest(a.a_start, b.b_start)
""",
    tags=("join", "interval"),
)
def q_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: each user's daily activity span [min ts,
    max ts] against every busy hour (≥3 events of one type), with the
    exact overlap duration.

    Both sides are genuine intervals, so no equi key exists and a naive
    formulation is a BroadcastNestedLoopJoin over *every* pair. The scale
    path is grid binning (what engines that special-case range joins do
    internally): explode each span onto the hour cells it covers (bounded
    fan-out: ≤24/day), bin each busy hour onto its single cell, equi-join
    on the cell id, and evaluate the overlap as a residual filter. Because
    the busy-hour side occupies exactly one cell, every overlapping pair
    meets in exactly one cell — no post-join dedup. The oracle is the
    direct non-equi join, proving the binned plan is result-identical.
    """
    ev = load(spark, sf_dir, "events")
    # DATE collects as python objects but TIMESTAMP compares identically
    # across engines — same convention as event_analytics.q_gap_fill
    a = ev.groupBy(
        "user_id", F.to_date("ts").cast("timestamp").alias("day")
    ).agg(
        F.unix_micros(F.min("ts")).alias("a_start"),
        F.unix_micros(F.max("ts")).alias("a_end"),
    )
    b = (
        ev.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("hour_start"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .where(F.col("n_events") >= 3)
        .withColumn("b_start", F.unix_micros(F.col("hour_start")))
        .withColumn("b_end", F.col("b_start") + F.lit(_HR_US))
    )
    a_cells = a.withColumn(
        "cell",
        F.explode(
            F.sequence(
                F.expr(f"a_start DIV {_HR_US}"), F.expr(f"a_end DIV {_HR_US}")
            )
        ),
    )
    b_cells = b.withColumn("cell", F.expr(f"b_start DIV {_HR_US}"))
    overlap = F.least("a_end", "b_end") - F.greatest("a_start", "b_start")
    return (
        a_cells.join(F.broadcast(b_cells), "cell")
        .where(overlap > 0)
        .select(
            "user_id", "day", "event_type", "hour_start", "n_events",
            overlap.alias("overlap_us"),
        )
    )


# --------------------------------------------------------------------------
# q_join_asof_nearest — NEAREST as-of join: each click matched to the
# temporally closest purchase in either direction (tie → backward).
# --------------------------------------------------------------------------


@query(
    "q_join_asof_nearest",
    oracle="""
WITH p AS (
  SELECT user_id, ts AS purchase_ts, MAX(event_id) AS purchase_event_id
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, ts
),
c AS (
  SELECT event_id, ts, user_id FROM events WHERE event_type = 'click'
),
b AS (
  SELECT c.event_id, c.ts, c.user_id,
         p.purchase_event_id AS b_id, p.purchase_ts AS b_ts
  FROM c ASOF LEFT JOIN p
    ON c.user_id = p.user_id AND c.ts >= p.purchase_ts
),
f AS (
  SELECT c.event_id, p.purchase_event_id AS f_id, p.purchase_ts AS f_ts
  FROM c ASOF LEFT JOIN p
    ON c.user_id = p.user_id AND c.ts <= p.purchase_ts
)
SELECT b.event_id, b.ts, b.user_id,
  CASE
    WHEN b_ts IS NULL AND f_ts IS NULL THEN NULL
    WHEN f_ts IS NULL THEN b_id
    WHEN b_ts IS NULL THEN f_id
    WHEN date_diff('microsecond', b_ts, b.ts)
         <= date_diff('microsecond', b.ts, f_ts) THEN b_id
    ELSE f_id
  END AS purchase_event_id,
  CASE
    WHEN b_ts IS NULL AND f_ts IS NULL THEN NULL
    WHEN f_ts IS NULL THEN b_ts
    WHEN b_ts IS NULL THEN f_ts
    WHEN date_diff('microsecond', b_ts, b.ts)
         <= date_diff('microsecond', b.ts, f_ts) THEN b_ts
    ELSE f_ts
  END AS purchase_ts,
  CASE
    WHEN b_ts IS NULL AND f_ts IS NULL THEN NULL
    WHEN f_ts IS NULL THEN 'back'
    WHEN b_ts IS NULL THEN 'fwd'
    WHEN date_diff('microsecond', b_ts, b.ts)
         <= date_diff('microsecond', b.ts, f_ts) THEN 'back'
    ELSE 'fwd'
  END AS direction
FROM b JOIN f USING (event_id)
""",
    tags=("join", "asof"),
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join — each click matched to the same user's
    temporally CLOSEST purchase in either direction, ties broken toward
    the earlier (backward) purchase. Completes the asof family
    (q_join_asof backward, q_join_asof_fwd forward); DuckDB has no
    nearest mode, so the oracle composes both ASOF directions and picks.

    Spark-first: ONE union + ONE shuffle on user_id + ONE ascending sort
    feeds both window passes — the backward carry is `last(ignorenulls)`
    over the preceding frame and the forward carry is
    `first(ignorenulls)` over the following frame of the SAME sorted
    layout, so the second window adds no exchange and no re-sort. A
    same-instant purchase sorts before the click, landing in the
    backward frame with distance 0, which wins every tie — matching the
    oracle's `<=` tie-break exactly. Linear per user, never an
    O(clicks × purchases) range join.
    """
    ev = load(spark, sf_dir, "events")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_event_id"))
        .select(
            F.lit(None).cast("long").alias("event_id"),
            "ts",
            "user_id",
            "purchase_event_id",
            F.col("ts").alias("p_ts"),
            F.lit(1).alias("is_purchase"),
        )
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id",
        "ts",
        "user_id",
        F.lit(None).cast("long").alias("purchase_event_id"),
        F.lit(None).cast("timestamp").alias("p_ts"),
        F.lit(0).alias("is_purchase"),
    )
    order = [
        F.col("ts").asc(),
        F.col("is_purchase").desc(),
        F.col("purchase_event_id").asc_nulls_first(),
    ]
    w_back = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    merged = purchases.unionByName(clicks).select(
        "event_id",
        "ts",
        "user_id",
        "is_purchase",
        F.last("purchase_event_id", ignorenulls=True)
        .over(w_back)
        .alias("b_id"),
        F.last("p_ts", ignorenulls=True).over(w_back).alias("b_ts"),
        F.first("purchase_event_id", ignorenulls=True)
        .over(w_fwd)
        .alias("f_id"),
        F.first("p_ts", ignorenulls=True).over(w_fwd).alias("f_ts"),
    )
    ts, b_ts, f_ts = F.col("ts"), F.col("b_ts"), F.col("f_ts")
    back_wins = (
        f_ts.isNull()
        | (
            b_ts.isNotNull()
            & (
                ts.cast("double") - b_ts.cast("double")
                <= f_ts.cast("double") - ts.cast("double")
            )
        )
    )
    return merged.filter(F.col("is_purchase") == 0).select(
        "event_id",
        "ts",
        "user_id",
        F.when(b_ts.isNull() & f_ts.isNull(), F.lit(None).cast("long"))
        .when(back_wins, F.col("b_id"))
        .otherwise(F.col("f_id"))
        .alias("purchase_event_id"),
        F.when(b_ts.isNull() & f_ts.isNull(), F.lit(None).cast("timestamp"))
        .when(back_wins, b_ts)
        .otherwise(f_ts)
        .alias("purchase_ts"),
        F.when(b_ts.isNull() & f_ts.isNull(), F.lit(None).cast("string"))
        .when(back_wins, F.lit("back"))
        .otherwise(F.lit("fwd"))
        .alias("direction"),
    )


# --------------------------------------------------------------------------
# q_join_asof_tol — as-of join with a staleness TOLERANCE: the backward
# match only counts if the purchase is within 7 days of the click.
# --------------------------------------------------------------------------

_ASOF_TOL_DAYS = 7
_ASOF_TOL_US = _ASOF_TOL_DAYS * 86_400 * 1_000_000


@query(
    "q_join_asof_tol",
    oracle=f"""
WITH p AS (
  SELECT user_id, ts AS purchase_ts, MAX(event_id) AS purchase_event_id
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, ts
),
c AS (
  SELECT event_id, ts, user_id FROM events WHERE event_type = 'click'
),
m AS (
  SELECT c.event_id, c.ts, c.user_id,
         p.purchase_event_id AS m_id, p.purchase_ts AS m_ts
  FROM c ASOF LEFT JOIN p
    ON c.user_id = p.user_id AND c.ts >= p.purchase_ts
)
SELECT event_id, ts, user_id,
  CASE WHEN m_ts IS NOT NULL
        AND date_diff('microsecond', m_ts, ts) <= {_ASOF_TOL_US}
       THEN m_id END AS purchase_event_id,
  CASE WHEN m_ts IS NOT NULL
        AND date_diff('microsecond', m_ts, ts) <= {_ASOF_TOL_US}
       THEN m_ts END AS purchase_ts
FROM m
""",
    tags=("join", "asof"),
)
def q_join_asof_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded as-of join — each click matched to the same
    user's most recent purchase at-or-before it, but ONLY if that
    purchase is within {_ASOF_TOL_DAYS} days; staler matches are NULLed
    (pandas ``merge_asof(tolerance=...)`` semantics; completes the
    backward / forward / nearest family). For BACKWARD as-of, the
    tolerance is exactly a post-filter on the unbounded match: the most
    recent purchase is the only candidate inside any window ending at
    the click, so if IT is out of tolerance, every earlier one is too.

    Same scale shape as q_join_asof: union tagged roles, ONE window pass
    per user carrying the latest purchase forward — one shuffle on
    user_id, never an O(clicks × purchases) range join. The staleness
    test compares exact integer microseconds in both engines
    (unix_micros / date_diff('microsecond')), so the boundary is
    bit-deterministic, no IEEE rounding anywhere.
    """
    ev = load(spark, sf_dir, "events")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_event_id"))
        .select(
            F.lit(None).cast("long").alias("event_id"),
            "ts",
            "user_id",
            "purchase_event_id",
            F.col("ts").alias("p_ts"),
            F.lit(1).alias("is_purchase"),
        )
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id",
        "ts",
        "user_id",
        F.lit(None).cast("long").alias("purchase_event_id"),
        F.lit(None).cast("timestamp").alias("p_ts"),
        F.lit(0).alias("is_purchase"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts").asc(),
            F.col("is_purchase").desc(),
            F.col("purchase_event_id").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = purchases.unionByName(clicks).select(
        "event_id",
        "ts",
        "user_id",
        "is_purchase",
        F.last("purchase_event_id", ignorenulls=True).over(w).alias("m_id"),
        F.last("p_ts", ignorenulls=True).over(w).alias("m_ts"),
    )
    in_tol = F.col("m_ts").isNotNull() & (
        F.unix_micros("ts") - F.unix_micros("m_ts") <= F.lit(_ASOF_TOL_US)
    )
    return merged.filter(F.col("is_purchase") == 0).select(
        "event_id",
        "ts",
        "user_id",
        F.when(in_tol, F.col("m_id")).alias("purchase_event_id"),
        F.when(in_tol, F.col("m_ts")).alias("purchase_ts"),
    )


# --------------------------------------------------------------------------
# q_conversion_pairs — click→purchase pairs within the attribution
# window, rolled up per day (batch twin of streaming/join_stream.py).
# --------------------------------------------------------------------------


@query(
    "q_conversion_pairs",
    oracle="""
WITH c AS (
  SELECT event_id AS click_id, user_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
  FROM events WHERE event_type = 'purchase'
),
pairs AS (
  SELECT c.click_id, c.user_id, CAST(c.click_ts AS DATE) AS day
  FROM c JOIN p ON p.user_id = c.user_id
   AND p.purchase_ts >= c.click_ts
   AND p.purchase_ts <= c.click_ts + INTERVAL 3600 SECONDS
)
SELECT
  CAST(day AS TIMESTAMP) AS day,
  CAST(COUNT(*) AS BIGINT) AS n_pairs,
  CAST(COUNT(DISTINCT click_id) AS BIGINT) AS n_clicks,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM pairs
GROUP BY day
ORDER BY day
""",
    tags=("join", "events", "streaming-twin"),
)
def q_conversion_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily click→purchase conversion-pair counts within the 1-hour
    attribution window — the BATCH twin of the stream-stream interval
    join (streaming/join_stream.py): the very same
    ``conversion_pairs`` expression tree runs here on bounded frames
    and there on two watermarked streams, so the driver's hash check on
    this key certifies the join logic both sinks share.

    Scale shape: equi hash join on user_id with the time range as a
    residual (never a time-range nested loop); one day-keyed rollup
    after. Counts exact; the day bucket is a date truncation.
    """
    from streaming_data_ingestion_spark.streaming.join_stream import (
        conversion_pairs,
    )

    ev = load(spark, sf_dir, "events")
    pairs = conversion_pairs(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    return (
        pairs.groupBy(
            F.to_date("click_ts").cast("timestamp").alias("day")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.countDistinct("click_id").cast("long").alias("n_clicks"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy("day")
    )
