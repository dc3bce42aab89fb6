"""Scalar function families (SURVEY.md §2B "Scalar function families").

The reference's entire expression surface is string concat + cast
(/root/reference/dags/kafka-streamer.py:25-33,
/root/reference/spark-streaming.py:169); the rest of these families are
north-star mandate. All expressions are built-in ``pyspark.sql.functions``
— JVM-side, inside whole-stage codegen — never Python UDFs.

Cross-engine notes baked into the oracles:
- DuckDB ``date_trunc('month', ts)`` returns DATE → cast back to TIMESTAMP.
- DuckDB ``dayofweek`` is 0-based Sunday; Spark's is 1-based → +1.
- DuckDB ``epoch()`` is DOUBLE → floor + cast for Spark's unix_timestamp.
- libm functions (ln) may differ in the last ULP between JVM and C++ —
  they are applied only to low-cardinality integer-valued inputs and
  rounded to 10 dp on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_ingestion_spark.registry import query
from streaming_data_ingestion_spark.tables import load

# --------------------------------------------------------------------------
# q_str_funcs — string family (reference parity: R4/R5 concat_ws).
# --------------------------------------------------------------------------


@query(
    "q_str_funcs",
    oracle="""
SELECT
  c_custkey,
  concat_ws(' | ', c_name, c_mktsegment) AS name_seg,
  upper(c_mktsegment) AS seg_upper,
  lower(c_name) AS name_lower,
  substring(c_name, 10, 5) AS name_sub,
  trim('  ' || c_mktsegment || ' ') AS seg_trim,
  CAST(length(c_name) AS INTEGER) AS name_len,
  str_split(c_name, '#')[2] AS cust_num,
  regexp_extract(c_name, '([0-9]+)', 1) AS digits,
  regexp_replace(c_name, '[0-9]', '*', 'g') AS name_masked,
  lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS key_padded
FROM customer
""",
    tags=("functions", "string", "reference-parity"),
)
def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat_ws/upper/lower/substring/trim/length/split/regexp/lpad.

    concat_ws mirrors the reference's full_name/address building
    (/root/reference/dags/kafka-streamer.py:26,28), done JVM-side instead
    of in a Python producer loop.
    """
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat_ws(" | ", "c_name", "c_mktsegment").alias("name_seg"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.substring("c_name", 10, 5).alias("name_sub"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias(
            "seg_trim"
        ),
        F.length("c_name").alias("name_len"),
        F.element_at(F.split("c_name", "#"), 2).alias("cust_num"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.regexp_replace("c_name", "[0-9]", "*").alias("name_masked"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("key_padded"),
    )


# --------------------------------------------------------------------------
# q_date_funcs — date/time family.
# --------------------------------------------------------------------------


@query(
    "q_date_funcs",
    oracle="""
SELECT
  event_id,
  CAST(year(ts) AS INTEGER) AS y,
  CAST(month(ts) AS INTEGER) AS mo,
  CAST(day(ts) AS INTEGER) AS d,
  CAST(hour(ts) AS INTEGER) AS h,
  CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
  CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
  CAST(CAST(date_trunc('month', ts) AS TIMESTAMP) AS TIMESTAMP) AS month_start,
  CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INTEGER) AS days_since,
  CAST(CAST(ts AS DATE) + 7 AS VARCHAR) AS week_later,
  CAST(floor(epoch(ts)) AS BIGINT) AS unix_sec
FROM events
""",
    tags=("functions", "date"),
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/hour/dayofweek/date_trunc/datediff/date_add/unix_ts."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.dayofweek("ts").alias("dow"),
        F.date_trunc("day", F.col("ts")).alias("day_start"),
        F.date_trunc("month", F.col("ts")).alias("month_start"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "days_since"
        ),
        F.date_add(F.col("ts").cast("date"), 7).cast("string").alias("week_later"),
        F.unix_timestamp("ts").alias("unix_sec"),
    )


# --------------------------------------------------------------------------
# q_math_funcs — math family + CASE WHEN.
# --------------------------------------------------------------------------


@query(
    "q_math_funcs",
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  abs(l_extendedprice - 50000.0) AS abs_dev,
  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
  pow(l_quantity, 2) AS qty_sq,
  sqrt(l_extendedprice) AS price_sqrt,
  round(ln(l_quantity), 10) AS qty_ln,
  CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
  CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
  CASE
    WHEN l_quantity >= 40 THEN 'bulk'
    WHEN l_quantity >= 10 THEN 'standard'
    ELSE 'small'
  END AS qty_band
FROM lineitem
""",
    tags=("functions", "math"),
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/ceil/floor/pow/sqrt/ln/sign/mod + CASE WHEN.

    sqrt is IEEE-correctly-rounded everywhere; ln is applied to the 50
    integer-valued quantities only and rounded to 10 dp (JVM vs libm can
    disagree in the final ULP). pmod is avoided in favor of ``%`` on
    positives so both engines agree on sign semantics.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 50000.0).alias("abs_dev"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.pow("l_quantity", 2).alias("qty_sq"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.round(F.log("l_quantity"), 10).alias("qty_ln"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.when(F.col("l_quantity") >= 40, "bulk")
        .when(F.col("l_quantity") >= 10, "standard")
        .otherwise("small")
        .alias("qty_band"),
    )


# --------------------------------------------------------------------------
# q_array_funcs — array/higher-order family on embeddings + documents.
# --------------------------------------------------------------------------


@query(
    "q_array_funcs",
    oracle="""
SELECT
  vec_id,
  CAST(len(embedding) AS INTEGER) AS dim,
  CAST(embedding[1] AS DOUBLE) AS first_dim,
  CAST(embedding[64] AS DOUBLE) AS last_dim,
  CAST(list_max(embedding) AS DOUBLE) AS max_dim,
  list_reduce(
    list_prepend(0.0::DOUBLE, list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))),
    (acc, x) -> acc + x
  ) AS head_sum,
  CAST(list_contains(embedding, embedding[7]) AS BOOLEAN) AS has_seventh
FROM embeddings
""",
    tags=("functions", "array"),
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/element_at/array_max/slice + aggregate-fold + array_contains.

    Higher-order functions (transform/aggregate) run inside codegen —
    this is the JVM-side idiom for embedding math, no Python involved.
    Both engines fold the 8-element head sequentially in double, so the
    result is bit-exact.
    """
    e = load(spark, sf_dir, "embeddings")
    head = F.slice(F.transform(F.col("embedding"), lambda x: x.cast("double")), 1, 8)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_dim"),
        F.element_at("embedding", 64).cast("double").alias("last_dim"),
        F.array_max("embedding").cast("double").alias("max_dim"),
        F.aggregate(head, F.lit(0.0), lambda acc, x: acc + x).alias("head_sum"),
        F.array_contains(
            F.col("embedding"), F.element_at(F.col("embedding"), 7)
        ).alias("has_seventh"),
    )


# --------------------------------------------------------------------------
# q_map_json_funcs — JSON path + map family on events.props.
# --------------------------------------------------------------------------


@query(
    "q_map_json_funcs",
    oracle="""
SELECT
  event_id,
  props->>'$.k' AS k_str,
  CAST(props->>'$.k' AS INTEGER) AS k_int,
  (MAP {'k': CAST(props->>'$.k' AS INTEGER)}['k'])[1] AS k_from_map,
  array_to_string(map_keys(MAP {'k': 1, 'type': 2}), ',') AS static_keys,
  to_json(struct_pack(event_id := event_id,
                      k := CAST(props->>'$.k' AS INTEGER))) AS as_json
FROM events
""",
    tags=("functions", "json", "reference-parity"),
)
def q_map_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object / create_map / map_keys / to_json.

    to_json(struct(...)) is the reference's wire-encode direction
    (/root/reference/dags/kafka-streamer.py:45) done engine-side.
    """
    ev = load(spark, sf_dir, "events")
    k_int = F.get_json_object("props", "$.k").cast("int")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        k_int.alias("k_int"),
        F.create_map(F.lit("k"), k_int)[F.lit("k")].alias("k_from_map"),
        F.array_join(
            F.map_keys(F.create_map(F.lit("k"), F.lit(1), F.lit("type"), F.lit(2))),
            ",",
        ).alias("static_keys"),
        F.to_json(F.struct(F.col("event_id"), k_int.alias("k"))).alias("as_json"),
    )


# --------------------------------------------------------------------------
# q_cond_null_funcs — null-handling family.
# --------------------------------------------------------------------------


@query(
    "q_cond_null_funcs",
    oracle="""
SELECT
  c.c_custkey,
  coalesce(o.o_orderkey, -1) AS order_or_default,
  ifnull(o.o_totalprice, 0.0) AS price_or_zero,
  nullif(c.c_mktsegment, 'FURNITURE') AS seg_nullable,
  least(c.c_acctbal, 5000.0) AS bal_capped,
  greatest(c.c_acctbal, 0.0) AS bal_floored,
  CAST(o.o_orderkey IS NULL AS BOOLEAN) AS no_big_order
FROM customer c
LEFT JOIN orders o
  ON c.c_custkey = o.o_custkey AND o.o_totalprice > 470000.0
""",
    tags=("functions", "null"),
)
def q_cond_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce/ifnull/nullif/least/greatest over an outer join's nulls."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_totalprice > 470000.0)
    return c.join(o, cond, "left").select(
        "c_custkey",
        F.coalesce("o_orderkey", F.lit(-1)).alias("order_or_default"),
        F.ifnull(F.col("o_totalprice"), F.lit(0.0)).alias("price_or_zero"),
        F.nullif(F.col("c_mktsegment"), F.lit("FURNITURE")).alias("seg_nullable"),
        F.least("c_acctbal", F.lit(5000.0)).alias("bal_capped"),
        F.greatest("c_acctbal", F.lit(0.0)).alias("bal_floored"),
        F.col("o_orderkey").isNull().alias("no_big_order"),
    )


# --------------------------------------------------------------------------
# q_bit_funcs — bitwise family on integer keys.
# --------------------------------------------------------------------------


@query(
    "q_bit_funcs",
    oracle="""
SELECT
  o_orderkey,
  o_orderkey & 255 AS low_byte,
  o_orderkey | 4096 AS with_flag,
  xor(o_orderkey, 1431655765) AS xored,
  CAST(o_orderkey << 2 AS BIGINT) AS shl2,
  o_orderkey >> 3 AS shr3,
  CAST(bit_count(o_orderkey) AS INTEGER) AS popcount
FROM orders
""",
    tags=("functions",),
)
def q_bit_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR, shifts, popcount on BIGINT keys.

    Two's-complement integer ops are definitionally identical in both
    engines — the family partition-key hashing, bloom filters, and bitmap
    sketches are built from. Pure narrow projection, whole-stage codegen.
    """
    o = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(1431655765)).alias("xored"),
        F.shiftleft(k, 2).alias("shl2"),
        F.shiftright(k, 3).alias("shr3"),
        F.bit_count(k).alias("popcount"),
    )


# --------------------------------------------------------------------------
# q_hash_funcs — cryptographic digest family (the primitives under exact
# dedup, content-addressed sampling, and fingerprinting).
# --------------------------------------------------------------------------


@query(
    "q_hash_funcs",
    oracle="""
SELECT
  doc_id,
  md5(text) AS md5_hex,
  sha256(text) AS sha256_hex,
  md5(CAST(doc_id AS VARCHAR) || ':' || source) AS keyed_md5
FROM documents
""",
    tags=("functions",),
)
def q_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 / sha256 hex digests over document text, plus a
    composite-key digest.

    Digests are byte-exact cross-engine by specification (both hash the
    UTF-8 bytes and print lowercase hex), which is exactly why the dedup
    and sampling operators are built on them rather than on any engine's
    internal hash().
    """
    d = load(spark, sf_dir, "documents")
    t = F.col("text").cast("binary")
    return d.select(
        "doc_id",
        F.md5(t).alias("md5_hex"),
        F.sha2(F.col("text"), 256).alias("sha256_hex"),
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("source"))
            .cast("binary")
        ).alias("keyed_md5"),
    )


# --------------------------------------------------------------------------
# q_encoding_funcs — binary↔text encoding family (base64, hex, radix,
# codepoints): the primitives under wire formats and content addressing.
# --------------------------------------------------------------------------


@query(
    "q_encoding_funcs",
    oracle="""
SELECT
  doc_id,
  to_base64(text::BLOB) AS b64,
  from_base64(to_base64(text::BLOB))::VARCHAR = text AS roundtrip_ok,
  to_hex(doc_id) AS hex_key,
  bin(doc_id) AS bin_key,
  unicode(text) AS first_cp,
  chr(97 + CAST(doc_id % 26 AS INTEGER)) AS bucket_chr
FROM documents
""",
    tags=("functions",),
)
def q_encoding_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding/decoding family: base64 round-trip, hex and binary radix
    rendering of integer keys, first codepoint, codepoint→char.

    These are the wire-format primitives (the reference serializes JSON
    to UTF-8 bytes for Kafka — SURVEY §2A R7) plus the radix tools used
    for content-addressed bucket names. All byte-defined, so
    cross-engine exact with no numeric care needed; pure narrow
    projection in whole-stage codegen.
    """
    d = load(spark, sf_dir, "documents")
    tb = F.col("text").cast("binary")
    return d.select(
        "doc_id",
        # Spark's base64 is Java's MIME encoder (CRLF every 76 chars);
        # DuckDB emits one unchunked string. Strip the soft breaks — the
        # encoding itself is identical.
        F.regexp_replace(F.base64(tb), "\r\n", "").alias("b64"),
        (F.unbase64(F.base64(tb)).cast("string") == F.col("text")).alias(
            "roundtrip_ok"
        ),
        F.hex(F.col("doc_id")).alias("hex_key"),
        F.conv(F.col("doc_id").cast("string"), 10, 2).alias("bin_key"),
        F.ascii(F.col("text")).alias("first_cp"),
        F.char(F.lit(97) + (F.col("doc_id") % 26).cast("int")).alias(
            "bucket_chr"
        ),
    )
