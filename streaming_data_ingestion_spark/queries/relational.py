"""Scans, casts, JSON decode, filters, sorts, set ops (SURVEY.md §2B).

These map the reference's only real dataflow — Kafka scan → cast →
``from_json`` decode → flatten (/root/reference/spark-streaming.py:169-171) —
onto batch parquet, and add the filter/sort/set surface the north star
mandates. Everything is a declarative DataFrame plan: filters and
projections push down into the parquet scan (visible as PushedFilters /
ReadSchema in ``.explain``), which is what keeps a 100 TB scan from reading
columns or row groups it doesn't need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from streaming_data_ingestion_spark.registry import query
from streaming_data_ingestion_spark.tables import load

# --------------------------------------------------------------------------
# q_scan_project — parquet scan + column projection (pruned read).
# --------------------------------------------------------------------------


@query(
    "q_scan_project",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate
FROM lineitem
""",
    tags=("scan",),
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection-only scan: ReadSchema must contain exactly these 4 columns."""
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate"
    )


# --------------------------------------------------------------------------
# q_json_decode — the reference's core operator: parse a JSON string column
# with a declared schema and flatten (spark-streaming.py:159-171 shape).
# --------------------------------------------------------------------------


@query(
    "q_json_decode",
    oracle="""
SELECT event_id, CAST(props->>'$.k' AS INTEGER) AS k_value
FROM events
""",
    tags=("json", "reference-parity"),
)
def q_json_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with declared StructType + struct flatten.

    Reference parity: /root/reference/spark-streaming.py:159-171 does the
    identical from_json(col, schema).select('data.*') on the Kafka value.
    """
    ev = load(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.IntegerType())])
    return ev.select(
        "event_id", F.from_json(F.col("props"), schema).alias("data")
    ).select("event_id", F.col("data.k").alias("k_value"))


# --------------------------------------------------------------------------
# q_cast_types — string↔numeric↔timestamp casts (reference's selectExpr
# CAST shape, spark-streaming.py:169).
# --------------------------------------------------------------------------


@query(
    "q_cast_types",
    oracle="""
SELECT
  event_id,
  CAST(event_id AS VARCHAR) AS id_str,
  CAST(CAST(ts AS DATE) AS VARCHAR) AS day_str,
  CAST(FLOOR(value) AS BIGINT) AS value_floor,
  CAST(ROUND(value, 0) AS BIGINT) AS value_int,
  CAST('42' AS BIGINT) AS const_int,
  CAST('2024-06-01 12:00:00' AS TIMESTAMP) AS const_ts
FROM events
""",
    tags=("cast", "reference-parity"),
)
def q_cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast family. Note double→int: Spark truncates, DuckDB rounds —
    so the int conversion goes through an explicit floor/round that both
    engines implement identically."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("event_id").cast("string").alias("id_str"),
        F.col("ts").cast("date").cast("string").alias("day_str"),
        F.floor("value").cast("bigint").alias("value_floor"),
        F.round("value", 0).cast("bigint").alias("value_int"),
        F.lit("42").cast("bigint").alias("const_int"),
        F.lit("2024-06-01 12:00:00").cast("timestamp").alias("const_ts"),
    )


# --------------------------------------------------------------------------
# q_filter_simple / q_filter_compound — predicate pushdown surface.
# --------------------------------------------------------------------------


@query(
    "q_filter_simple",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE l_quantity > 45.0
""",
    tags=("filter",),
)
def q_filter_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single pushed predicate (shows up in PushedFilters)."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45.0)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@query(
    "q_filter_compound",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders
WHERE o_orderstatus IN ('F', 'O')
  AND o_totalprice BETWEEN 50000.0 AND 300000.0
  AND NOT (o_orderpriority LIKE '3%')
  AND o_custkey IS NOT NULL
  AND (o_orderpriority LIKE '%URGENT' OR o_orderpriority LIKE '%HIGH'
       OR o_orderpriority = '5-LOW')
""",
    tags=("filter",),
)
def q_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT + IN + BETWEEN + IS NULL + LIKE in one predicate tree."""
    o = load(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("F", "O")
        & F.col("o_totalprice").between(50000.0, 300000.0)
        & ~F.col("o_orderpriority").like("3%")
        & F.col("o_custkey").isNotNull()
        & (
            F.col("o_orderpriority").like("%URGENT")
            | F.col("o_orderpriority").like("%HIGH")
            | (F.col("o_orderpriority") == "5-LOW")
        )
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


# --------------------------------------------------------------------------
# q_sort_limit — global top-k (TakeOrderedAndProject, no full sort).
# --------------------------------------------------------------------------


@query(
    "q_sort_limit",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 25
""",
    tags=("sort",),
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-by + limit. Catalyst plans TakeOrderedAndProject: each
    partition keeps a 25-row heap, only 25×P rows reach the driver-side
    merge — the only sane top-k at 100 TB. o_orderkey tie-breaker makes
    the result set deterministic."""
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --------------------------------------------------------------------------
# q_set_union / q_set_intersect_except.
# --------------------------------------------------------------------------


@query(
    "q_set_union",
    oracle="""
SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
UNION
SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000.0
""",
    tags=("setop",),
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets — unionByName + distinct (one
    shuffle for the dedup)."""
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000.0)
        .select("c_custkey")
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000.0)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.unionByName(o).distinct()


@query(
    "q_set_intersect_except",
    oracle="""
SELECT 'intersect' AS tag, k FROM (
  SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0
  INTERSECT
  SELECT o_custkey AS k FROM orders
)
UNION ALL
SELECT 'except' AS tag, k FROM (
  SELECT c_custkey AS k FROM customer
  EXCEPT
  SELECT o_custkey AS k FROM orders
)
""",
    tags=("setop",),
)
def q_set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT + EXCEPT, tagged and unioned into one result."""
    cust_pos = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select(F.col("c_custkey").alias("k"))
    )
    cust_all = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    order_cust = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    inter = cust_pos.intersect(order_cust).select(
        F.lit("intersect").alias("tag"), "k"
    )
    exc = cust_all.exceptAll(order_cust).distinct().select(
        F.lit("except").alias("tag"), "k"
    )
    return inter.unionByName(exc)


# --------------------------------------------------------------------------
# q_unpivot — wide → long melt (the inverse of q_pivot).
# --------------------------------------------------------------------------


@query(
    "q_unpivot",
    oracle="""
SELECT l_orderkey, l_linenumber, measure, value
FROM (
  UNPIVOT (SELECT l_orderkey, l_linenumber,
                  l_quantity, l_extendedprice, l_discount
           FROM lineitem)
  ON l_quantity, l_extendedprice, l_discount
  INTO NAME measure VALUE value
)
""",
    tags=("relational",),
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt three lineitem measures into (measure, value) long form.

    ``unpivot`` is an Expand under the hood — each input row replicated
    once per measure, a narrow map with no shuffle; 3× rows out but
    1/3 the columns each. The inverse transformation of q_pivot's
    conditional aggregation.
    """
    return load(spark, sf_dir, "lineitem").unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "value",
    )


# --------------------------------------------------------------------------
# q_json_nested — nested wire-JSON roundtrip: build → path-extract →
# schema-decode → flatten (the reference's R2/R3 dataflow, batch form).
# --------------------------------------------------------------------------


@query(
    "q_json_nested",
    oracle="""
WITH wire AS (
  SELECT c_custkey,
         to_json(struct_pack(
           cust := struct_pack(name := c_name, nation := c_nationkey),
           mkt := c_mktsegment
         ))::VARCHAR AS wire_json
  FROM customer
)
SELECT
  c_custkey,
  wire_json,
  json_extract_string(wire_json, '$.cust.name') AS name_by_path,
  CAST(json_extract(wire_json, '$.cust.nation') AS BIGINT) AS nation,
  json_extract_string(wire_json, '$.mkt') AS mkt
FROM wire
""",
    tags=("relational", "json"),
)
def q_json_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested wire-JSON lifecycle in one query: serialize a two-level
    struct to a JSON string (the reference's producer shape,
    dags/kafka-streamer.py:25-33,45), then read it back two ways — ad
    hoc path extraction (get_json_object) and declared-schema decode +
    struct flatten (from_json → nested field access, the consumer shape
    at spark-streaming.py:159-171).

    Only strings and integers ride in the JSON: double formatting
    inside JSON text is engine-specific, exactly the kind of wire
    looseness the reference's postcode bug demonstrates. Pure narrow
    projection — serialization round-trips never shuffle.
    """
    c = load(spark, sf_dir, "customer")
    wire = F.to_json(
        F.struct(
            F.struct(
                F.col("c_name").alias("name"),
                F.col("c_nationkey").alias("nation"),
            ).alias("cust"),
            F.col("c_mktsegment").alias("mkt"),
        )
    )
    parsed = F.from_json(
        wire, "cust struct<name:string,nation:bigint>, mkt string"
    )
    return c.select(
        "c_custkey",
        wire.alias("wire_json"),
        F.get_json_object(wire, "$.cust.name").alias("name_by_path"),
        parsed["cust"]["nation"].alias("nation"),
        parsed["mkt"].alias("mkt"),
    )


# --------------------------------------------------------------------------
# q_json_malformed — PERMISSIVE-mode decode of a partially-corrupt JSON
# column: malformed records become NULL rows instead of failing the job,
# and the query accounts for them explicitly.
# --------------------------------------------------------------------------


@query(
    "q_json_malformed",
    oracle="""
WITH mangled AS (
  SELECT
    event_id,
    event_type,
    CASE WHEN event_id % 7 = 0
         THEN substring(props, 1, length(props) - 1)
         ELSE props END AS raw
  FROM events
),
parsed AS (
  SELECT
    event_type,
    CASE WHEN json_valid(raw)
         THEN CAST(raw->>'$.k' AS INTEGER) END AS k
  FROM mangled
)
SELECT
  event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(COUNT(*) FILTER (k IS NULL) AS BIGINT) AS n_bad,
  CAST(COUNT(*) FILTER (k IS NULL) AS DOUBLE) / COUNT(*) AS bad_frac,
  CAST(SUM(k) AS BIGINT) AS k_checksum
FROM parsed
GROUP BY event_type
""",
    tags=("json", "robustness"),
)
def q_json_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-record tolerance: a deterministic 1-in-7 slice of the JSON
    column is truncated (unclosed object), decoded in PERMISSIVE mode —
    Spark's from_json yields a NULL struct for unparseable input instead
    of aborting — and the per-type malformed rate + a checksum of the
    surviving values are reported.

    The real-world contract this pins: a 100 TB ingest with a bad
    producer must quantify its corrupt slice, not die on it (FAILFAST)
    or silently drop it. Same single partial+final aggregate shape as
    every count query; the mangling is a row-side narrow map. Oracle
    mirrors via DuckDB's json_valid guard (both engines agree the
    truncated form is invalid; trailing-garbage forms would NOT agree,
    which is why corruption here is truncation).
    """
    ev = load(spark, sf_dir, "events")
    raw = F.when(
        F.col("event_id") % 7 == 0,
        F.substring(F.col("props"), 1, F.length("props").cast("int") - 1),
    ).otherwise(F.col("props"))
    schema = T.StructType([T.StructField("k", T.IntegerType())])
    k = F.from_json(raw, schema)["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_if(F.col("k").isNull()).alias("n_bad"),
            (
                F.count_if(F.col("k").isNull()).cast("double")
                / F.count(F.lit(1))
            ).alias("bad_frac"),
            F.sum("k").alias("k_checksum"),
        )
    )


# --------------------------------------------------------------------------
# q_dq_audit — one-pass data-quality audit (nulls, orphans, dup keys,
# range violations) over the star schema.
# --------------------------------------------------------------------------


@query(
    "q_dq_audit",
    oracle="""
SELECT
  CAST((SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NULL) AS BIGINT)
    AS li_null_orderkey,
  CAST((SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
    AS li_orphan_orders,
  CAST((SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
    AS o_orphan_customers,
  CAST((SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders) AS BIGINT)
    AS o_dup_orderkeys,
  CAST((SELECT COUNT(*) FROM lineitem
        WHERE l_discount < 0 OR l_discount > 1) AS BIGINT)
    AS li_bad_discount,
  CAST((SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0) AS BIGINT)
    AS li_bad_quantity
""",
    tags=("relational", "quality"),
)
def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit across the star schema: null keys, referential
    orphans (fact rows whose parent is missing — the anti-join check),
    duplicate primary keys, and domain-range violations. One row of
    counters; all zeros on healthy data, and any non-zero is the exact
    defect census a pipeline gate alerts on.

    Plan: each check is either a pushed-filter count (nulls, ranges), a
    broadcast/shuffle ANTI join count (orphans — never a driver-side
    lookup loop), or a count-vs-count-distinct aggregate (dup keys).
    The six 1-row results cross-join into the report row — at 100 TB
    each check stays one scan, and the orphan anti joins reuse the same
    co-bucketed layout the production joins use.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")

    null_ok = li.filter(F.col("l_orderkey").isNull()).agg(
        F.count(F.lit(1)).alias("li_null_orderkey")
    )
    li_orphans = li.join(
        o.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_anti"
    ).agg(F.count(F.lit(1)).alias("li_orphan_orders"))
    o_orphans = o.join(
        F.broadcast(c.select("c_custkey")),
        o.o_custkey == F.col("c_custkey"),
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("o_orphan_customers"))
    dup_keys = o.agg(
        (F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey"))).alias(
            "o_dup_orderkeys"
        )
    )
    bad_disc = li.filter(
        (F.col("l_discount") < 0) | (F.col("l_discount") > 1)
    ).agg(F.count(F.lit(1)).alias("li_bad_discount"))
    bad_qty = li.filter(F.col("l_quantity") <= 0).agg(
        F.count(F.lit(1)).alias("li_bad_quantity")
    )
    return (
        null_ok.crossJoin(li_orphans)
        .crossJoin(o_orphans)
        .crossJoin(dup_keys)
        .crossJoin(bad_disc)
        .crossJoin(bad_qty)
    )


# --------------------------------------------------------------------------
# q_json_variant — schemaless JSON via the Spark 4 VARIANT type.
# --------------------------------------------------------------------------


@query(
    "q_json_variant",
    oracle="""
SELECT
  event_type,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
  CAST(MIN(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS min_k,
  CAST(MAX(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k,
  CAST(COUNT(*) FILTER (WHERE props->>'$.missing' IS NULL) AS BIGINT)
    AS n_missing
FROM events
GROUP BY event_type
""",
    tags=("relational", "json"),
)
def q_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schemaless JSON decoding through Spark 4's VARIANT type:
    ``parse_json`` once into the binary variant encoding, then typed
    ``variant_get``/``try_variant_get`` path extraction — the modern
    alternative to ``from_json`` when the payload schema is open
    (q_json_decode covers the declared-schema path; this covers the
    schemaless one the reference's randomuser payloads would actually
    need as the API evolves).

    Variant parse + path extraction are row-local (no shuffle until the
    per-type aggregate), and the binary encoding makes repeated path
    reads O(paths), not O(re-parse) — the reason engines grew the type.
    """
    ev = load(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json(F.col("props")).alias("v")
    ).select(
        "event_type",
        F.expr("variant_get(v, '$.k', 'long')").alias("k"),
        F.expr("try_variant_get(v, '$.missing', 'long')").alias("missing"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.count_if(F.col("missing").isNull()).alias("n_missing"),
    )
