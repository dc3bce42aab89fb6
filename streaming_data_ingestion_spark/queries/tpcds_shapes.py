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

    The Expand 4×'s the fact join output into one partial+final hash
    aggregate; the rank window then sees only the group-sized relation,
    partitioned by grouping level (4 partitions). Level ids use the
    GROUPING bitmask ((nation,yr,mon)=0 … grand total=7) identically in
    both engines; rank order is (exact decimal revenue desc) with full
    key tie-breaks, NULLS FIRST pinned explicitly because Spark and
    DuckDB default opposite null orderings.
    """
    g = (
        _monthly_sales(spark, sf_dir)
        .rollup("nation", "yr", "mon")
        .agg(
            F.grouping_id().cast("int").alias("lvl"),
            F.count(F.lit(1)).alias("n_items"),
            F.sum("rev_dec").cast("double").alias("sum_rev"),
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
