"""ANSI-SQL parity probe + data profiling + symbolic time series
(SURVEY.md §2B breadth).

q_sql_roundtrip is special: ONE SQL text is executed verbatim by BOTH
engines — Spark parses it with Catalyst (`spark.sql` over the
registered temp views, tables.register_views) and DuckDB runs the
identical string as the oracle. It pins the engine's ANSI dialect
surface (CTEs, multi-join, HAVING, window RANK, cast chains) the way
the rest of the registry pins operator semantics: a Spark SQL parser or
analyzer regression that changes the result fails the hash.

Reference parity note: the reference (/root/reference, 292-LoC ingest
pipeline) exposes no SQL surface; this is §2B/north-star breadth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from streaming_data_ingestion_spark.compat import DEC
from streaming_data_ingestion_spark.registry import query
from streaming_data_ingestion_spark.tables import load, register_views

# --------------------------------------------------------------------------
# q_sql_roundtrip — one SQL text, two engines.
# --------------------------------------------------------------------------

# Constraints on this text: every construct must parse AND mean the same
# in Spark SQL and DuckDB — so: explicit BIGINT/INTEGER casts (COUNT
# widths differ), no bare `/` on integers (DuckDB yields DOUBLE), no
# VARCHAR casts (Spark requires a length), decimal sums narrowed to
# (38,2) BEFORE the double cast (2-dp money sums are exact at scale 2,
# and an 11-sig-digit decimal→double conversion is correctly rounded in
# both engines — the wide-decimal direct cast is NOT, see compat.py).
_ROUNDTRIP_SQL = """
WITH co AS (
  SELECT n.n_name AS nation,
         CAST(o.o_totalprice AS DECIMAL(38,10)) AS price
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
),
agg AS (
  SELECT nation,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(CAST(SUM(price) AS DECIMAL(38,2)) AS DOUBLE) AS revenue
  FROM co
  GROUP BY nation
  HAVING COUNT(*) >= 10
)
SELECT nation, n_orders, revenue,
       CAST(RANK() OVER (ORDER BY revenue DESC, nation) AS INTEGER)
         AS rev_rank
FROM agg
ORDER BY rev_rank, nation
"""


@query(
    "q_sql_roundtrip",
    oracle=_ROUNDTRIP_SQL,
    tags=("sql", "parity"),
)
def q_sql_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National revenue league table, defined ONCE as ANSI SQL text and
    executed verbatim by both engines — the SQL-dialect parity probe.
    Catalyst gets the raw string (`spark.sql` over registered views:
    the engine's second, equal front door next to the DataFrame API),
    DuckDB gets the identical string as the oracle, and the driver's
    hash check certifies that parser, analyzer, and evaluation semantics
    agree construct-for-construct: CTE chain, 3-table join, HAVING,
    decimal cast-chain arithmetic, window RANK with a deterministic
    composite order.

    Scale shape: Catalyst plans this exactly like the equivalent
    DataFrame code (broadcast dims, partial aggs) — the text adds no
    physical cost; the HAVING prunes before the tiny window. The
    bounded |nations| window is the allowlisted bounded-relation case.
    """
    register_views(spark, sf_dir)
    return spark.sql(_ROUNDTRIP_SQL)


# --------------------------------------------------------------------------
# q_null_profile — one-pass column profile of the events table.
# --------------------------------------------------------------------------

_PROFILE_COLS = ("event_id", "ts", "user_id", "event_type", "value", "props")


@query(
    "q_null_profile",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{c}' AS col_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
FROM events"""
        for c in _PROFILE_COLS
    )
    + "\nORDER BY col_name",
    tags=("dq", "profile", "events"),
)
def q_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data profile of the events table: row count, null
    count, and exact distinct count per column — the DESCRIBE-style
    profiling pass every warehouse runs on ingest (feeding null-rate
    alerts and the stats catalog's NDV estimates; the exact twin of
    stats_catalog.py's sampled statistics).

    Scale shape: ONE scan computes all 6×2 counts as a single
    multi-aggregate row (count + per-column count), plus per-column
    exact distincts — Spark expands multi countDistinct via a single
    Expand + partial-agg tree, still one scan of the fact; the result
    unpivots via a 6-row stack. At 100 TB exact NDV on every column is
    the expensive-but-exact corner of the profile (the approx variant
    is q_agg_approx's HLL path).
    """
    ev = load(spark, sf_dir, "events")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).cast("long").alias(f"{c}__rows"),
            (F.count(F.lit(1)) - F.count(c)).cast("long").alias(f"{c}__null"),
            F.countDistinct(c).cast("long").alias(f"{c}__nd"),
        ]
    one = ev.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__rows, {c}__null, {c}__nd" for c in _PROFILE_COLS
    )
    return one.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack}) AS "
        "(col_name, n_rows, n_null, n_distinct)"
    ).orderBy("col_name")


# --------------------------------------------------------------------------
# q_sax_symbolize — SAX symbolic transitions of the daily revenue series.
# --------------------------------------------------------------------------

# Gaussian quartile breakpoints for a 4-symbol alphabet (a < b < c < d).
_SAX_BREAKS = (-0.6745, 0.0, 0.6745)


@query(
    "q_sax_symbolize",
    oracle=f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         SUM(CAST(value AS DECIMAL(38,10))) AS rev
  FROM events GROUP BY day
),
mu AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(CAST(SUM(rev) AS VARCHAR) AS DOUBLE) AS total
  FROM daily
),
cent AS (
  SELECT day, CAST(CAST(rev AS VARCHAR) AS DOUBLE) - (mu.total / mu.n) AS dx
  FROM daily, mu
),
sd AS (
  SELECT sqrt(CAST(CAST(SUM(CAST(dx * dx AS DECIMAL(38,10))) AS VARCHAR)
              AS DOUBLE) / (SELECT n FROM mu)) AS sigma
  FROM cent
),
sym AS (
  SELECT day,
         CASE WHEN dx < {_SAX_BREAKS[0]} * sd.sigma THEN 'a'
              WHEN dx < {_SAX_BREAKS[1]} * sd.sigma THEN 'b'
              WHEN dx < {_SAX_BREAKS[2]} * sd.sigma THEN 'c'
              ELSE 'd' END AS s
  FROM cent, sd
),
tr AS (
  SELECT s AS sym_from,
         LEAD(s) OVER (ORDER BY day) AS sym_to
  FROM sym
)
SELECT sym_from, sym_to, CAST(COUNT(*) AS BIGINT) AS n_transitions
FROM tr WHERE sym_to IS NOT NULL
GROUP BY sym_from, sym_to
ORDER BY sym_from, sym_to
""",
    tags=("events", "timeseries", "symbolic"),
)
def q_sax_symbolize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolic transition matrix of the daily revenue series:
    z-normalize, map each day to a 4-letter alphabet at the Gaussian
    quartile breakpoints (±0.6745, 0), and count symbol→symbol
    transitions — the symbolic-representation front end of classic
    time-series motif/novelty mining (a heavy diagonal = regime
    persistence; off-diagonal spikes = volatility).

    Exactness: daily revenue is an exact decimal sum converted once; μ,
    σ, and every z-threshold comparison are the SAME IEEE expressions
    token-for-token in both engines (comparisons of identically-computed
    doubles are deterministic — the q_psi_drift binning argument);
    transition counts are exact integers.

    Scale shape: one day-keyed aggregate collapses the fact table, then
    everything is calendar-bounded: 1-row μ/σ broadcasts, a LEAD window
    over the bounded daily relation, a ≤16-row transition aggregate.
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.col("value").cast(DEC)).alias("rev")
    )
    mu = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rev").cast("double").alias("total"),
    )
    cent = daily.crossJoin(F.broadcast(mu)).select(
        "day",
        (F.col("rev").cast("double") - F.col("total") / F.col("n")).alias(
            "dx"
        ),
        "n",
    )
    sd = cent.agg(
        F.sqrt(
            F.sum((F.col("dx") * F.col("dx")).cast(DEC)).cast("double")
            / F.min("n")
        ).alias("sigma")
    )
    sym = cent.crossJoin(F.broadcast(sd)).select(
        "day",
        F.when(F.col("dx") < _SAX_BREAKS[0] * F.col("sigma"), "a")
        .when(F.col("dx") < _SAX_BREAKS[1] * F.col("sigma"), "b")
        .when(F.col("dx") < _SAX_BREAKS[2] * F.col("sigma"), "c")
        .otherwise("d")
        .alias("s"),
    )
    w = Window.orderBy("day")
    tr = sym.select(
        F.col("s").alias("sym_from"), F.lead("s").over(w).alias("sym_to")
    ).where(F.col("sym_to").isNotNull())
    return (
        tr.groupBy("sym_from", "sym_to")
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
        .orderBy("sym_from", "sym_to")
    )
