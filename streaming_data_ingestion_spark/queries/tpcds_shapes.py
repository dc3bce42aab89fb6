"""TPC-DS-shaped query pair (SURVEY.md §2B breadth): Expand + Window
interplay over the fixture star schema.

TPC-H's 22 shapes (tpch.py / tpch_full.py) have at most one of
{grouping-sets, window} per query; TPC-DS's signature stress is their
COMBINATION — a ROLLUP hierarchy ranked per level (q67's shape) and a
per-group moving statistic compared against a same-window average (q47's
shape). The reference repo has no analytical queries at all (its one
dataflow is JSON decode → project → sink,
/root/reference/spark-streaming.py:159-171); this family is north-star
mandate breadth, adapted to the fixture schema (store_sales → lineitem ⋈
orders; date_dim → year/month of o_orderdate; store → nation via
customer).

Scale posture:
- the fact join output aggregates BEFORE any window touches it: Expand
  multiplies rows 4× into a partial-aggregating hash aggregate, and the
  windows then run over the group-sized relation (≤ nations × years ×
  months rows), never the fact table;
- nation broadcasts; lineitem ⋈ orders is the one big-big shuffle;
- revenue sums ride DECIMAL(38,10) (compat.dsum) end-to-end — including
  the WINDOW sum feeding the yearly average, which must be
  order-independent for the cross-engine hash to match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streaming_data_ingestion_spark.compat import DEC, sql_dec_to_double
from streaming_data_ingestion_spark.registry import query
from streaming_data_ingestion_spark.tables import load

_REV_SQL = "l_extendedprice * (1 - l_discount)"


def _monthly_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(nation, yr, mon) grain with exact decimal revenue — the shared
    fact rollup both shapes start from."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("yr"),
            F.month("o_orderdate").cast("int").alias("mon"),
            rev.cast(DEC).alias("rev_dec"),
        )
    )


_SQL_SALES = f"""
  SELECT
    n.n_name AS nation,
    CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS yr,
    CAST(EXTRACT(MONTH FROM o.o_orderdate) AS INTEGER) AS mon,
    CAST({_REV_SQL} AS DECIMAL(38,10)) AS rev_dec
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
"""


# --------------------------------------------------------------------------
# q_tpcds_rollup_rank — TPC-DS q67's shape: ROLLUP hierarchy, then rank
# the groups WITHIN each grouping level and keep each level's top 5.
# --------------------------------------------------------------------------

@query(
    "q_tpcds_rollup_rank",
    oracle=f"""
WITH sales AS ({_SQL_SALES}),
g AS (
  SELECT
    CAST(GROUPING(nation, yr, mon) AS INTEGER) AS lvl,
    nation, yr, mon,
    CAST(COUNT(*) AS BIGINT) AS n_items,
    {sql_dec_to_double('SUM(rev_dec)')} AS sum_rev
  FROM sales
  GROUP BY ROLLUP (nation, yr, mon)
)
SELECT lvl, nation, yr, mon, n_items, sum_rev, rk
FROM (
  SELECT g.*,
         CAST(RANK() OVER (
           PARTITION BY lvl
           ORDER BY sum_rev DESC,
                    nation ASC NULLS FIRST,
                    yr ASC NULLS FIRST,
                    mon ASC NULLS FIRST
         ) AS INTEGER) AS rk
  FROM g
)
WHERE rk <= 5
""",
    tags=("tpcds", "agg", "window"),
)
def q_tpcds_rollup_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q67 shape: revenue ROLLUP over (nation, yr, mon), then the
    top-5 groups per GROUPING LEVEL — Expand feeding an aggregate feeding
    a partitioned rank, the interplay TPC-H never exercises.

    The fact join output aggregates to the finest (nation, yr, mon)
    grain FIRST, so the Expand 4×'s only that groups-sized relation
    (≤ nations × years × months rows) instead of replicating every
    joined fact row — COUNT re-aggregates as SUM(count) and the exact
    DECIMAL revenue sums are associative, so every ROLLUP subtotal is
    bit-identical to expanding the fact rows. The rank window then sees
    only the group-sized relation, partitioned by grouping level
    (4 partitions). Level ids use the GROUPING bitmask
    ((nation,yr,mon)=0 … grand total=7) identically in both engines;
    rank order is (exact decimal revenue desc) with full key
    tie-breaks, NULLS FIRST pinned explicitly because Spark and DuckDB
    default opposite null orderings.
    """
    monthly = (
        _monthly_sales(spark, sf_dir)
        .groupBy("nation", "yr", "mon")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("rev_dec").alias("_rev"),
        )
    )
    g = (
        monthly.rollup("nation", "yr", "mon")
        .agg(
            F.grouping_id().cast("int").alias("lvl"),
            F.sum("_n").alias("n_items"),
            F.sum("_rev").cast("double").alias("sum_rev"),
        )
    )
    w = Window.partitionBy("lvl").orderBy(
        F.desc("sum_rev"),
        F.asc_nulls_first("nation"),
        F.asc_nulls_first("yr"),
        F.asc_nulls_first("mon"),
    )
    return (
        g.withColumn("rk", F.rank().over(w).cast("int"))
        .filter(F.col("rk") <= 5)
        .select("lvl", "nation", "yr", "mon", "n_items", "sum_rev", "rk")
    )


# --------------------------------------------------------------------------
# q_tpcds_moving_dev — TPC-DS q47's shape: monthly series vs same-year
# average, with adjacent-month context, keeping the deviating months.
# --------------------------------------------------------------------------

@query(
    "q_tpcds_moving_dev",
    oracle=f"""
WITH sales AS ({_SQL_SALES}),
monthly AS (
  SELECT nation, yr, mon,
         SUM(rev_dec) AS rev_m,
         CAST(COUNT(*) AS BIGINT) AS n_items
  FROM sales
  GROUP BY nation, yr, mon
),
win AS (
  SELECT
    nation, yr, mon, n_items,
    {sql_dec_to_double('rev_m')} AS sum_rev,
    {sql_dec_to_double('SUM(rev_m) OVER (PARTITION BY nation, yr)')}
      / CAST(COUNT(*) OVER (PARTITION BY nation, yr) AS DOUBLE) AS avg_year,
    {sql_dec_to_double("lag(rev_m) OVER (PARTITION BY nation ORDER BY yr, mon)")}
      AS prev_rev,
    {sql_dec_to_double("lead(rev_m) OVER (PARTITION BY nation ORDER BY yr, mon)")}
      AS next_rev
  FROM monthly
)
SELECT nation, yr, mon, n_items, sum_rev, avg_year, prev_rev, next_rev,
       sum_rev / avg_year AS ratio
FROM win
WHERE sum_rev / avg_year < 0.9 OR sum_rev / avg_year > 1.1
""",
    tags=("tpcds", "window", "timeseries"),
)
def q_tpcds_moving_dev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q47 shape: each nation's monthly revenue against its own
    year average, with previous/next month context, keeping months that
    deviate >10% — the seasonal-outlier report.

    Three windows over the (nation, yr, mon) rollup (≤ nations × months
    rows, never the fact table): a same-year frame for the average, and
    lag/lead over the month sequence. The yearly average must be
    order-independent to hash-match, so the WINDOW sum runs over the
    DECIMAL month revenue and converts once at the end (the same
    compat.dsum discipline, applied inside a frame). The deviation filter
    compares two bit-identical doubles, so the kept row set is identical
    cross-engine.
    """
    monthly = (
        _monthly_sales(spark, sf_dir)
        .groupBy("nation", "yr", "mon")
        .agg(
            F.sum("rev_dec").alias("rev_m"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    wy = Window.partitionBy("nation", "yr")
    wm = Window.partitionBy("nation").orderBy("yr", "mon")
    win = monthly.select(
        "nation",
        "yr",
        "mon",
        "n_items",
        F.col("rev_m").cast("double").alias("sum_rev"),
        (
            F.sum("rev_m").over(wy).cast("double")
            / F.count(F.lit(1)).over(wy).cast("double")
        ).alias("avg_year"),
        F.lag("rev_m").over(wm).cast("double").alias("prev_rev"),
        F.lead("rev_m").over(wm).cast("double").alias("next_rev"),
    )
    ratio = F.col("sum_rev") / F.col("avg_year")
    return win.filter((ratio < 0.9) | (ratio > 1.1)).select(
        "*", ratio.alias("ratio")
    )


# --------------------------------------------------------------------------
# q_tpcds_cumulative_lead — TPC-DS q51's shape: two cumulative series
# FULL OUTER joined on their common grain, flagged where one leads.
# --------------------------------------------------------------------------

@query(
    "q_tpcds_cumulative_lead",
    oracle=f"""
WITH ship AS (
  SELECT o.o_orderpriority AS priority,
         CAST(date_trunc('week', l.l_shipdate) AS TIMESTAMP) AS wk,
         SUM(CAST({_REV_SQL} AS DECIMAL(38,10))) AS rev
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
booked AS (
  SELECT o_orderpriority AS priority,
         CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS wk,
         SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS rev
  FROM orders
  GROUP BY 1, 2
),
cs AS (
  SELECT priority, wk,
         SUM(rev) OVER (PARTITION BY priority ORDER BY wk) AS cum
  FROM ship
),
cb AS (
  SELECT priority, wk,
         SUM(rev) OVER (PARTITION BY priority ORDER BY wk) AS cum
  FROM booked
)
SELECT
  COALESCE(cs.priority, cb.priority) AS priority,
  COALESCE(cs.wk, cb.wk) AS wk,
  {sql_dec_to_double('cs.cum')} AS cum_shipped,
  {sql_dec_to_double('cb.cum')} AS cum_booked,
  (cs.cum IS NOT NULL AND cb.cum IS NOT NULL AND cs.cum > cb.cum)
    AS shipping_leads
FROM cs FULL OUTER JOIN cb
  ON cs.priority = cb.priority AND cs.wk = cb.wk
""",
    tags=("tpcds", "window", "join"),
)
def q_tpcds_cumulative_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q51 shape: the cumulative weekly SHIPPED revenue series vs
    the cumulative weekly BOOKED revenue series per order priority, FULL
    OUTER joined on (priority, week) — weeks present in only one series
    survive with a NULL other side — flagging weeks where shipping has
    overtaken bookings.

    Windows partition by priority (parallel — never a global cumulative
    sort), and the running sums stay DECIMAL until the final double
    conversion so every prefix is order-independent: a cumulative sum of
    doubles would accumulate different roundings in each engine. The
    comparison producing the flag is exact decimal > decimal. Both
    engines' default ORDER BY window frame (RANGE UNBOUNDED PRECEDING)
    agree, and wk is unique per partition so RANGE vs ROWS cannot
    diverge.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate", "o_totalprice"
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ship = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.date_trunc("week", "l_shipdate").alias("wk"),
            rev.cast(DEC).alias("rev"),
        )
        .groupBy("priority", "wk")
        .agg(F.sum("rev").alias("rev"))
    )
    booked = (
        orders.select(
            F.col("o_orderpriority").alias("priority"),
            F.date_trunc("week", "o_orderdate").alias("wk"),
            F.col("o_totalprice").cast(DEC).alias("rev"),
        )
        .groupBy("priority", "wk")
        .agg(F.sum("rev").alias("rev"))
    )
    w = Window.partitionBy("priority").orderBy("wk")
    cs = ship.select(
        "priority", "wk", F.sum("rev").over(w).alias("cum_s")
    ).alias("cs")
    cb = booked.select(
        "priority", "wk", F.sum("rev").over(w).alias("cum_b")
    ).alias("cb")
    joined = cs.join(
        cb,
        (F.col("cs.priority") == F.col("cb.priority"))
        & (F.col("cs.wk") == F.col("cb.wk")),
        "full_outer",
    )
    return joined.select(
        F.coalesce("cs.priority", "cb.priority").alias("priority"),
        F.coalesce("cs.wk", "cb.wk").alias("wk"),
        F.col("cum_s").cast("double").alias("cum_shipped"),
        F.col("cum_b").cast("double").alias("cum_booked"),
        (
            F.col("cum_s").isNotNull()
            & F.col("cum_b").isNotNull()
            & (F.col("cum_s") > F.col("cum_b"))
        ).alias("shipping_leads"),
    )


# --------------------------------------------------------------------------
# q_rank_shift — year-over-year supplier revenue-rank movement (the
# TPC-DS "top movers" report shape).
# --------------------------------------------------------------------------

_RS_PREV, _RS_CUR = 1996, 1997


@query(
    "q_rank_shift",
    oracle=f"""
WITH yrev AS (
  SELECT year(CAST(l_shipdate AS DATE)) AS y, l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS rev
  FROM lineitem
  WHERE year(CAST(l_shipdate AS DATE)) IN ({_RS_PREV}, {_RS_CUR})
  GROUP BY y, l_suppkey
),
ranked AS (
  SELECT y, l_suppkey,
         CAST(ROW_NUMBER() OVER (PARTITION BY y
              ORDER BY rev DESC, l_suppkey DESC) AS BIGINT) AS rnk
  FROM yrev
)
SELECT
  CAST(p.l_suppkey AS BIGINT) AS s_suppkey,
  p.rnk AS rank_prev,
  c.rnk AS rank_cur,
  p.rnk - c.rnk AS shift
FROM ranked p JOIN ranked c ON c.l_suppkey = p.l_suppkey
WHERE p.y = {_RS_PREV} AND c.y = {_RS_CUR}
ORDER BY ABS(p.rnk - c.rnk) DESC, s_suppkey ASC
LIMIT 20
""",
    tags=("lineitem", "tpcds", "rank"),
)
def q_rank_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 supplier revenue-rank movers between {_RS_PREV} and
    {_RS_CUR} (rank_prev − rank_cur > 0 = climbed) — the TPC-DS
    "biggest movers" report: per-period ranking, self-join across
    periods, order by movement.

    Scale shape — per-YEAR exact ranks without a per-year window (a
    2-partition window single-tasks each year at scale): ONE
    composite-key with_global_rank pass ordered (year, rev, suppkey)
    gives global row numbers; the within-year DESCENDING rank is then
    n_year − (global − base) computed from a 2-row per-year offset
    broadcast — the q_trimmed_mean construction. Revenue ties break on
    the larger suppkey (the direction the arithmetic reversal of the
    ascending total order produces — matched exactly in the oracle's
    ORDER BY rev DESC, suppkey DESC). Ranks/shifts are exact BIGINTs;
    revenue comparisons compare exact decimals.
    """
    from streaming_data_ingestion_spark.ranking import with_global_rank

    li = load(spark, sf_dir, "lineitem")
    yrev = (
        li.withColumn("y", F.year(F.col("l_shipdate").cast("date")))
        .where(F.col("y").isin(_RS_PREV, _RS_CUR))
        .groupBy("y", "l_suppkey")
        .agg(F.sum(F.col("l_extendedprice").cast(DEC)).alias("rev"))
    )
    ranked, _n, goffs = with_global_rank(
        yrev, ["y", "rev", "l_suppkey"], rank_col="gr", group_col="y"
    )
    offs = goffs.select(
        "y",
        F.col("__grp_base").alias("base"),
        F.col("__grp_n").alias("ny"),
    )
    # ascending within-year position reversed: rank 1 = highest revenue
    rnk = (F.col("ny") - (F.col("gr") - F.col("base"))).cast("long")
    r = ranked.join(F.broadcast(offs), "y").select(
        "y", "l_suppkey", rnk.alias("rnk")
    )
    p = r.where(F.col("y") == _RS_PREV).select(
        F.col("l_suppkey").alias("s_suppkey"),
        F.col("rnk").alias("rank_prev"),
    )
    c = r.where(F.col("y") == _RS_CUR).select(
        F.col("l_suppkey").alias("s_suppkey"),
        F.col("rnk").alias("rank_cur"),
    )
    return (
        p.join(c, "s_suppkey")
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "rank_prev",
            "rank_cur",
            (F.col("rank_prev") - F.col("rank_cur")).alias("shift"),
        )
        .orderBy(F.abs(F.col("shift")).desc(), F.asc("s_suppkey"))
        .limit(20)
    )
