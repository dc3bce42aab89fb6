"""Aggregation operators (SURVEY.md §2B "Aggregations").

The reference computes no aggregates at all (its only dataflow is
decode→project→sink, /root/reference/spark-streaming.py:169-171); this whole
family is mandated by the north star. Everything is
``groupBy().agg()`` — Catalyst plans a partial (map-side) HashAggregate,
a shuffle on the group keys, and a final HashAggregate, which is the right
physical shape at any scale. No ORDER BY: the driver's value-hash is
order-insensitive, and a global sort of an aggregate output is wasted work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_ingestion_spark.compat import DEC, davg, dsum, sql_davg, sql_dsum
from streaming_data_ingestion_spark.registry import query
from streaming_data_ingestion_spark.tables import load, spread_for_cpu

# --------------------------------------------------------------------------
# q_agg_group — the flagship: TPC-H Q1 pricing summary shape.
# --------------------------------------------------------------------------

_Q1_CUTOFF = "1998-09-02"

_Q_AGG_GROUP_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum("l_quantity", "sum_qty")},
  {sql_dsum("l_extendedprice", "sum_base_price")},
  {sql_dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
  {sql_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
  {sql_davg("l_quantity", "avg_qty")},
  {sql_davg("l_extendedprice", "avg_price")},
  {sql_davg("l_discount", "avg_disc")},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("q_agg_group", oracle=_Q_AGG_GROUP_ORACLE, tags=("agg", "flagship"))
def q_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary over lineitem.

    Scan → pushed filter on l_shipdate → partial+final hash aggregate on
    (l_returnflag, l_linestatus). Row-level arithmetic in double;
    sums via decimal for cross-engine determinism (see compat.py).
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        # decimal partial sums are CPU-dominant → spread a narrow scan to
        # full parallelism (no-op on a wide 100 TB scan); the pushed
        # filter stays at the scan, below the widening exchange
        spread_for_cpu(
            li.filter(
                F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp")
            ).select(
                "l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_tax",
            )
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# q_agg_global — ungrouped aggregates.
# --------------------------------------------------------------------------

_Q_AGG_GLOBAL_ORACLE = f"""
SELECT
  COUNT(*) AS n_rows,
  COUNT(o_custkey) AS n_cust_nonnull,
  {sql_dsum("o_totalprice", "sum_price")},
  {sql_davg("o_totalprice", "avg_price")},
  MIN(o_totalprice) AS min_price,
  MAX(o_totalprice) AS max_price,
  MIN(o_orderdate) AS first_order,
  MAX(o_orderdate) AS last_order
FROM orders
"""


@query("q_agg_global", oracle=_Q_AGG_GLOBAL_ORACLE, tags=("agg",))
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped count/sum/avg/min/max over orders (single-partition final)."""
    o = load(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_custkey").alias("n_cust_nonnull"),
        dsum("o_totalprice", "sum_price"),
        davg("o_totalprice", "avg_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
    )


# --------------------------------------------------------------------------
# q_agg_distinct — COUNT(DISTINCT), SUM(DISTINCT).
# --------------------------------------------------------------------------

_Q_AGG_DISTINCT_ORACLE = """
SELECT
  l_returnflag,
  COUNT(DISTINCT l_partkey) AS n_parts,
  COUNT(DISTINCT l_suppkey) AS n_supps,
  CAST(CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS sum_distinct_qty
FROM lineitem
GROUP BY l_returnflag
"""


@query("q_agg_distinct", oracle=_Q_AGG_DISTINCT_ORACLE, tags=("agg",))
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregates — Catalyst expands to a two-phase aggregate."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.sum_distinct(F.col("l_quantity").cast(DEC))
        .cast("double")
        .alias("sum_distinct_qty"),
    )


# --------------------------------------------------------------------------
# q_agg_having — post-aggregation filter.
# --------------------------------------------------------------------------

_Q_AGG_HAVING_ORACLE = f"""
SELECT
  o_custkey,
  COUNT(*) AS n_orders,
  {sql_dsum("o_totalprice", "total_spend")}
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 3
"""


@query("q_agg_having", oracle=_Q_AGG_HAVING_ORACLE, tags=("agg",))
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING — a filter above the aggregate in the same stage."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "total_spend"),
        )
        .filter(F.col("n_orders") >= 3)
    )


# --------------------------------------------------------------------------
# q_agg_rollup — ROLLUP hierarchy totals.
# --------------------------------------------------------------------------

_Q_AGG_ROLLUP_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  COUNT(*) AS n_items,
  {sql_dsum("l_quantity", "sum_qty")}
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@query("q_agg_rollup", oracle=_Q_AGG_ROLLUP_ORACLE, tags=("agg",))
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(l_returnflag, l_linestatus) — Expand + aggregate.

    The fact table aggregates to the finest grouping set FIRST, and the
    Expand runs over that groups-sized relation: rolling up Expand's
    replicated fact rows would push 3× the corpus through the partial
    hash aggregate, while COUNT re-aggregates as SUM(count) and the
    exact DECIMAL sums are associative, so subtotal values are
    bit-identical either way (the base grouping set of the rollup IS
    the pre-aggregated relation).
    """
    li = spread_for_cpu(
        load(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_linestatus", "l_quantity"
        )
    )
    pre = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("l_quantity").cast(DEC)).alias("_sq"),
    )
    return pre.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("_n").alias("n_items"),
        F.sum("_sq").cast("double").alias("sum_qty"),
    )


# --------------------------------------------------------------------------
# q_agg_cube — CUBE over two keys, with GROUPING() to disambiguate the
# synthetic NULLs of subtotal rows from genuine NULL key values.
# --------------------------------------------------------------------------

_Q_AGG_CUBE_ORACLE = f"""
SELECT
  o_orderstatus,
  o_orderpriority,
  CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
  CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
  COUNT(*) AS n_orders,
  {sql_dsum("o_totalprice", "sum_price")}
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@query("q_agg_cube", oracle=_Q_AGG_CUBE_ORACLE, tags=("agg",))
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(o_orderstatus, o_orderpriority): all four grouping sets in one
    pass over the PRE-AGGREGATED (status, priority) relation — Expand
    replicates rows once per set, so running it over the fact table
    would push 4× the corpus through the partial hash aggregate; the
    finest grouping set IS the pre-aggregate, COUNT re-aggregates as
    SUM(count), and the exact DECIMAL sums are associative, so every
    subtotal is bit-identical either way.
    """
    o = load(spark, sf_dir, "orders")
    pre = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("o_totalprice").cast(DEC)).alias("_sp"),
    )
    return pre.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.sum("_n").alias("n_orders"),
        F.sum("_sp").cast("double").alias("sum_price"),
    )


# --------------------------------------------------------------------------
# q_agg_approx — HLL++ approximate count-distinct (rows-only check: the
# sketch's estimate is engine-specific, so no DuckDB value oracle).
# --------------------------------------------------------------------------


@query("q_agg_approx", oracle=None, tags=("agg", "approx"))
def q_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per return flag.

    Sketches merge associatively, so this stays a single shuffle at any
    scale — the point of using HLL instead of exact distinct at 100 TB.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
    )


# --------------------------------------------------------------------------
# q_pivot — pivot (long → wide): per-user event-type counts as columns.
# --------------------------------------------------------------------------

_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


@query(
    "q_pivot",
    oracle=f"""
SELECT
  user_id,
  {", ".join(
      f"COUNT(*) FILTER (WHERE event_type = '{t}') AS n_{t}"
      for t in _EVENT_TYPES
  )}
FROM events
GROUP BY user_id
""",
    tags=("agg", "pivot"),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() with an explicit value list.

    Passing the pivot values avoids the extra distinct-collection job
    Spark otherwise runs to discover them — at 100 TB that discovery
    pass is a full extra scan. The pivot compiles to one hash aggregate
    with a conditional count per column (exactly the FILTER form the
    oracle spells out): single shuffle, map-side partials.
    """
    out = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .count()
    )
    # pivot leaves null where a (user, type) pair never occurred; the
    # FILTER form counts 0 — normalize, and prefix names to match.
    return out.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}")
            for t in _EVENT_TYPES
        ],
    )


# --------------------------------------------------------------------------
# q_agg_collect — order-insensitive array aggregation (sorted list).
# --------------------------------------------------------------------------


@query(
    "q_agg_collect",
    oracle="""
SELECT
  o_custkey,
  array_to_string(list_sort(list(o_orderkey)), ',') AS orderkeys,
  CAST(len(list(o_orderkey)) AS INTEGER) AS n_orders
FROM orders
GROUP BY o_custkey
""",
    tags=("agg", "array"),
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list + sort_array: deterministic array aggregation.

    collect_list order is partition-arrival order (non-deterministic
    under parallelism), so the contract is: always sort the collected
    array before it leaves the operator (serialized to a string here so
    the cross-engine value hash covers it cell-by-cell). State is
    bounded by group cardinality — at scale, guard with a size cap
    (slice) or switch to top-k via window when groups can be
    pathological.
    """
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list("o_orderkey")), ","
            ).alias("orderkeys"),
            F.count(F.lit(1)).cast("int").alias("n_orders"),
        )
    )


# --------------------------------------------------------------------------
# q_agg_percentile — exact percentiles (median / quartiles) per group.
# --------------------------------------------------------------------------


@query(
    "q_agg_percentile",
    oracle="""
SELECT
  o_orderpriority,
  quantile_cont(o_totalprice, 0.25) AS p25,
  quantile_cont(o_totalprice, 0.50) AS median,
  quantile_cont(o_totalprice, 0.75) AS p75,
  MAX(o_totalprice) AS p_max
FROM orders
GROUP BY o_orderpriority
""",
    tags=("agg", "percentile"),
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per priority class.

    Spark's `percentile` and DuckDB's `quantile_cont` share the same
    interpolation ((1-f)·lo + f·hi on the sorted values), so results are
    bit-identical. Exact percentiles buffer each group's values — fine
    for bounded group cardinality; at 100 TB over high-cardinality
    groups, switch to `percentile_approx` (KLL/GK sketch, mergeable,
    single shuffle) and accept rank error instead of memory.
    """
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.25D)").alias("p25"),
        F.expr("percentile(o_totalprice, 0.50D)").alias("median"),
        F.expr("percentile(o_totalprice, 0.75D)").alias("p75"),
        F.max("o_totalprice").alias("p_max"),
    )


# --------------------------------------------------------------------------
# q_agg_stats — stddev / variance / correlation, cross-engine exact.
# --------------------------------------------------------------------------

# Built-in STDDEV/CORR accumulate in double (order-dependent, engines
# disagree in the last ulp). Instead: exact decimal sums of x, x², y, y²,
# x·y, then the closed-form moments in double — every double op is a
# single IEEE operation on identical inputs, so results are bit-identical.


@query(
    "q_agg_stats",
    oracle=f"""
SELECT
  l_returnflag,
  n,
  (sxx - sx * sx / n) / (n - 1) AS var_price,
  sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_price,
  (n * sxy - sx * sy)
    / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_price_qty
FROM (
  SELECT
    l_returnflag,
    CAST(COUNT(*) AS DOUBLE) AS n,
    {sql_dsum("l_extendedprice", "sx")},
    {sql_dsum("l_extendedprice * l_extendedprice", "sxx")},
    {sql_dsum("l_quantity", "sy")},
    {sql_dsum("l_quantity * l_quantity", "syy")},
    {sql_dsum("l_extendedprice * l_quantity", "sxy")}
  FROM lineitem
  GROUP BY l_returnflag
)
""",
    tags=("agg", "stats"),
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance/stddev of price and price↔quantity correlation per
    return flag, via exact decimal moments.

    Single aggregation pass (5 decimal sums + count, all map-side
    partial), then closed-form double arithmetic structured identically
    in both engines. The row-level squares/products are IEEE-identical;
    the decimal sums are order-independent; the final expressions are
    single-rounded per op — bit-exact end to end.
    """
    li = load(spark, sf_dir, "lineitem")
    x, y = F.col("l_extendedprice"), F.col("l_quantity")
    base = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(x, "sx"),
        dsum(x * x, "sxx"),
        dsum(y, "sy"),
        dsum(y * y, "syy"),
        dsum(x * y, "sxy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    var = (sxx - sx * sx / n) / (n - 1)
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return base.select(
        "l_returnflag",
        "n",
        var.alias("var_price"),
        F.sqrt(var).alias("stddev_price"),
        corr.alias("corr_price_qty"),
    )


# --------------------------------------------------------------------------
# q_agg_grouping_sets — explicit GROUPING SETS (the general form rollup and
# cube are sugar for).
# --------------------------------------------------------------------------


@query(
    "q_agg_grouping_sets",
    oracle=f"""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
  CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
  COUNT(*) AS n_items,
  {sql_dsum("l_quantity", "sum_qty")}
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""",
    tags=("agg",),
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS: detail, per-flag subtotal, and grand total
    in one pass.

    Same Expand-then-aggregate physical shape as rollup/cube — each input
    row is replicated once per set it belongs to (3× here) and a single
    partial+final hash aggregate handles all sets; GROUPING() tells the
    subtotal NULLs apart from real NULL keys.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.count(F.lit(1)).alias("n_items"),
        dsum("l_quantity", "sum_qty"),
    )


# --------------------------------------------------------------------------
# q_agg_argminmax — argmin/argmax and boolean aggregates.
# --------------------------------------------------------------------------


@query(
    "q_agg_argminmax",
    oracle="""
SELECT
  o_custkey,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  arg_max(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 10000000
                      + o_orderkey) AS best_order,
  arg_min(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 10000000
                      + o_orderkey) AS worst_order,
  CAST(count_if(o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent,
  bool_and(o_totalprice > 1000) AS all_above_1k,
  bool_or(o_orderstatus = 'F') AS any_finished
FROM orders
GROUP BY o_custkey
""",
    tags=("aggregates",),
)
def q_agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per customer: which order was the most/least expensive (argmax /
    argmin), plus conditional and boolean aggregates (count_if,
    bool_and, bool_or).

    max_by/min_by ties are engine-arbitrary, so the ordering value is a
    synthesized unique BIGINT — price in cents scaled past the key range
    plus the orderkey as tiebreaker — making the winner well-defined in
    both engines. (round(price*100) never sits near a .5 tie because
    prices are 2-decimal quantities; the product is an integer ± one
    ulp.) All five aggregates partial-combine map-side like any
    sum/count, so the shuffle stays one row per (customer × partition).
    """
    o = load(spark, sf_dir, "orders")
    ordkey = (
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint") * 10000000
        + F.col("o_orderkey")
    )
    return o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.max_by(F.col("o_orderkey"), ordkey).alias("best_order"),
        F.min_by(F.col("o_orderkey"), ordkey).alias("worst_order"),
        F.count_if(F.col("o_orderpriority") == "1-URGENT").alias("n_urgent"),
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_above_1k"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
    )


# --------------------------------------------------------------------------
# q_histogram — fixed-width numeric histogram (profiling primitive).
# --------------------------------------------------------------------------

_BIN_W = 5000  # price-bin width


@query(
    "q_histogram",
    oracle=f"""
SELECT
  CAST(floor(l_extendedprice / {_BIN_W}) AS BIGINT) AS bin,
  CAST(floor(l_extendedprice / {_BIN_W}) AS BIGINT) * {_BIN_W}.0 AS bin_lo,
  (CAST(floor(l_extendedprice / {_BIN_W}) AS BIGINT) + 1) * {_BIN_W}.0
    AS bin_hi,
  CAST(COUNT(*) AS BIGINT) AS n_items,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS VARCHAR)
       AS DOUBLE) AS sum_price
FROM lineitem
GROUP BY 1
""",
    tags=("aggregates",),
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of lineitem prices: bin ordinal, bounds,
    count, and mass — the data-profiling primitive behind range
    partitioning choices and skew diagnosis.

    Binning is floor(x / width): one IEEE division and a floor on
    identical doubles, so bin edges are bit-stable cross-engine (no
    width_bucket, whose edge semantics differ between engines). A plain
    hash aggregate on a ~20-value key — partial map-side, trivially
    parallel at any scale.
    """
    li = load(spark, sf_dir, "lineitem")
    from streaming_data_ingestion_spark.compat import dsum

    bin_ = F.floor(F.col("l_extendedprice") / _BIN_W).cast("long")
    return (
        li.select(F.col("l_extendedprice"), bin_.alias("bin"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_extendedprice", "sum_price"),
        )
        .select(
            "bin",
            (F.col("bin") * float(_BIN_W)).alias("bin_lo"),
            ((F.col("bin") + 1) * float(_BIN_W)).alias("bin_hi"),
            "n_items",
            "sum_price",
        )
    )


# --------------------------------------------------------------------------
# q_approx_error — the value-checkable contract AROUND the HLL sketch:
# each engine computes its own estimate, but both must satisfy the same
# relative-error bound against the same exact count.
# --------------------------------------------------------------------------


@query(
    "q_approx_error",
    oracle="""
SELECT
  l_returnflag,
  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
  abs(approx_count_distinct(l_partkey) - COUNT(DISTINCT l_partkey))
    <= 0.15 * COUNT(DISTINCT l_partkey) AS within_bound
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg", "approx"),
)
def q_approx_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-distinct ERROR contract: exact distinct count per
    group plus a boolean asserting the engine's own HLL estimate lands
    within 15% of it.

    The estimates themselves are engine-specific (Spark HLL++ at
    rsd=0.02 vs DuckDB's HLL) and can never hash-match — but the error
    CONTRACT can: both engines emit the same exact counts and, for any
    functioning sketch, the same `true` flags. This turns the q_agg_approx
    rows-only escape hatch into a value-checked self-test of the sketch.
    The 15% bound is ~7 standard deviations at rsd=0.02 — a false alarm
    means the sketch is actually broken, not unlucky.
    """
    li = load(spark, sf_dir, "lineitem")
    exact = F.count_distinct(F.col("l_partkey"))
    approx = F.approx_count_distinct("l_partkey", rsd=0.02)
    return li.groupBy("l_returnflag").agg(
        exact.alias("exact_parts"),
        (F.abs(approx - exact) <= 0.15 * exact).alias("within_bound"),
    )


# --------------------------------------------------------------------------
# q_approx_quantile — the same value-checkable contract for quantile
# sketches: exact quantiles (bit-exact cross-engine) + a band assertion
# on each engine's own approximate-quantile estimate.
# --------------------------------------------------------------------------


@query(
    "q_approx_quantile",
    oracle="""
SELECT
  event_type,
  quantile_cont(value, 0.5) AS p50_exact,
  quantile_cont(value, 0.95) AS p95_exact,
  approx_quantile(value, 0.95)
    BETWEEN quantile_cont(value, 0.90) AND quantile_cont(value, 0.99)
    AS approx95_in_band
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    tags=("agg", "approx", "events"),
)
def q_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-quantile ERROR contract (the quantile twin of
    q_approx_error): exact p50/p95 per event type — Spark ``percentile``
    and DuckDB ``quantile_cont`` interpolate identically, so these
    hash-match bit-for-bit — plus a boolean asserting the engine's OWN
    quantile sketch lands inside the exact [p90, p99] band.

    The sketches differ per engine (Spark KLL/GK-style
    ``approx_percentile`` vs DuckDB t-digest) and can never hash-match;
    the band contract can, and a `false` here means a broken sketch, not
    an unlucky one. At 100 TB the approx path is the one that runs
    (single-pass, fixed memory, map-side mergeable) — this query is the
    standing proof it tracks the exact answer.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5D)").alias("p50_exact"),
            F.expr("percentile(value, 0.95D)").alias("p95_exact"),
            F.expr(
                "approx_percentile(value, 0.95D, 10000) "
                "BETWEEN percentile(value, 0.90D) AND percentile(value, 0.99D)"
            ).alias("approx95_in_band"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q_agg_mode — deterministic per-group statistical mode.
# --------------------------------------------------------------------------


@query(
    "q_agg_mode",
    oracle="""
SELECT
  l_returnflag,
  mode_qty,
  mode_count
FROM (
  SELECT
    l_returnflag,
    l_quantity AS mode_qty,
    CAST(COUNT(*) AS BIGINT) AS mode_count,
    ROW_NUMBER() OVER (
      PARTITION BY l_returnflag ORDER BY COUNT(*) DESC, l_quantity ASC
    ) AS rn
  FROM lineitem
  GROUP BY l_returnflag, l_quantity
)
WHERE rn = 1
""",
    tags=("agg",),
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode of l_quantity per return flag, with a pinned
    tie-break (highest count, then smallest value) — engines' built-in
    ``mode()`` picks an arbitrary winner on ties, which can never
    hash-match across engines; this formulation is deterministic by
    construction.

    Two-level aggregate: (group, value) counts partial-aggregate map-side,
    then a WindowGroupLimit keeps one row per group — both shuffles carry
    group-sized relations, never the fact table.
    """
    li = load(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("mode_count")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("mode_count"), F.asc("l_quantity")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("mode_qty"),
            "mode_count",
        )
    )


# --------------------------------------------------------------------------
# q_histogram_equidepth — quantile-binned (equi-depth) histogram.
# --------------------------------------------------------------------------


@query(
    "q_histogram_equidepth",
    oracle="""
WITH binned AS (
  SELECT
    l_extendedprice AS v,
    NTILE(10) OVER (ORDER BY l_extendedprice ASC, l_orderkey ASC,
                    l_linenumber ASC) AS bin
  FROM lineitem
)
SELECT
  CAST(bin AS INTEGER) AS bin,
  CAST(COUNT(*) AS BIGINT) AS n,
  MIN(v) AS lo,
  MAX(v) AS hi
FROM binned
GROUP BY bin
""",
    tags=("agg", "histogram"),
)
def q_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile-binned) histogram of l_extendedprice: 10
    bins of equal row count with their value bounds — the statistics
    structure query optimizers keep per column (equal-mass bins resolve
    skewed selectivity where q_histogram's fixed-width bins cannot).

    NTILE semantics over a deterministic total order (value + the fact
    table's unique key as tie-break) make bin membership reproducible
    across engines — but a WINDOW NTILE with no partition spec would
    drag the whole fact table through ONE task. Instead the rank comes
    from ranking.with_global_rank (parallel range exchange + partition
    offsets; no single-partition stage anywhere) and the NTILE bin is a
    closed-form expression of (rank, total) — bit-identical to the
    oracle's window NTILE on the same order, and the plan survives a
    100× fact table.
    """
    from streaming_data_ingestion_spark.ranking import (
        ntile_of_rank,
        with_global_rank,
    )

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("v"), "l_orderkey", "l_linenumber"
    )
    ranked, n_total = with_global_rank(
        li,
        ["v", "l_orderkey", "l_linenumber"],
        rank_col="r",
        cache=("q_histogram_equidepth.ranked", sf_dir),
    )
    binned = ranked.select("v", ntile_of_rank(F.col("r"), n_total, 10).alias("bin"))
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )
