"""UDF surface (SURVEY.md §2B "UDF / UDAF / UDTF surface").

Demonstrates the three Python extension points with deterministic logic so
even UDF queries are oracle-checked:

- row-wise Python UDF — applied POST-aggregation (24 rows), because a
  per-row Python UDF on a fact table is the canonical 100 TB anti-pattern;
- pandas UDF (Arrow-vectorized) — elementwise numpy double math, which is
  IEEE-identical to the engines' own arithmetic, safe on the full table;
- applyInPandas (grouped map) — per-group ranking + exact mean
  (math.fsum is correctly rounded, matching the oracle's exact decimal
  sum → double), emitting integers/strings + one deterministic double.
"""

from __future__ import annotations

import decimal

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from streaming_data_ingestion_spark.compat import dsum, sql_dsum
from streaming_data_ingestion_spark.registry import query
from streaming_data_ingestion_spark.tables import load

# --------------------------------------------------------------------------
# q_udf_python — row-at-a-time UDF on a (small) aggregated result.
# --------------------------------------------------------------------------


@query(
    "q_udf_python",
    oracle=f"""
SELECT
  c_mktsegment,
  n_customers,
  CASE WHEN total_bal >= 300000 THEN 'platinum'
       WHEN total_bal >= 100000 THEN 'gold'
       ELSE 'standard' END AS tier
FROM (
  SELECT c_mktsegment, COUNT(*) AS n_customers,
         {sql_dsum("c_acctbal", "total_bal")}
  FROM customer GROUP BY c_mktsegment
)
""",
    tags=("udf",),
)
def q_udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-wise Python UDF labeling aggregated segments.

    The UDF runs on |segments| rows, not |customers| — aggregation first,
    Python last. (A per-row Python UDF over the fact table would serialize
    every row through the Python worker: the slow path this engine avoids.)
    """

    @F.udf(T.StringType())
    def tier(total_bal: float) -> str:
        if total_bal >= 300000:
            return "platinum"
        if total_bal >= 100000:
            return "gold"
        return "standard"

    c = load(spark, sf_dir, "customer")
    agg = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum("c_acctbal", "total_bal"),
    )
    return agg.select(
        "c_mktsegment", "n_customers", tier(F.col("total_bal")).alias("tier")
    )


# --------------------------------------------------------------------------
# q_udf_pandas — Arrow-vectorized scalar pandas UDF.
# --------------------------------------------------------------------------


@query(
    "q_udf_pandas",
    oracle="""
SELECT
  event_id,
  value * 1.1 + 5.0 AS boosted,
  CASE WHEN value * 1.1 + 5.0 > 150.0 THEN 'high' ELSE 'low' END AS bucket
FROM events
""",
    tags=("udf",),
)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDF: numpy float64 elementwise math over Arrow
    batches — same IEEE ops as the engines, so results are bit-exact.
    This is the acceptable Python path at scale (~10-100× the row UDF).
    """

    @F.pandas_udf(T.DoubleType())
    def boost(v: pd.Series) -> pd.Series:
        return v * 1.1 + 5.0

    ev = load(spark, sf_dir, "events")
    boosted = boost(F.col("value"))
    return ev.select(
        "event_id",
        boosted.alias("boosted"),
        F.when(boosted > 150.0, "high").otherwise("low").alias("bucket"),
    )


# --------------------------------------------------------------------------
# q_udf_grouped — applyInPandas (grouped map).
# --------------------------------------------------------------------------


@query(
    "q_udf_grouped",
    oracle="""
SELECT
  event_id,
  user_id,
  CAST(ROW_NUMBER() OVER (PARTITION BY user_id
        ORDER BY value DESC, event_id ASC) AS INTEGER) AS value_rank,
  CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) OVER (PARTITION BY user_id)
       AS VARCHAR) AS DOUBLE)
    / COUNT(*) OVER (PARTITION BY user_id) AS user_mean
FROM events
""",
    tags=("udf",),
)
def q_udf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas: per-user rank (by value desc) + exact group mean.

    The mean reproduces compat.py's decimal-sum semantics in Python
    (quantize each double to 10 dp, sum exactly, one double division) so
    it matches the oracle bit-for-bit. Grouped-map is the custom-operator
    escape hatch: one shuffle on the group key, pandas per group.
    """

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        q10 = decimal.Decimal("1e-10")
        total = sum(
            (decimal.Decimal(float(v)).quantize(q10) for v in pdf["value"]),
            decimal.Decimal(0),
        )
        pdf = pdf.sort_values(
            ["value", "event_id"], ascending=[False, True]
        ).reset_index(drop=True)
        pdf["value_rank"] = pdf.index + 1
        pdf["user_mean"] = float(total) / len(pdf)
        return pdf[["event_id", "user_id", "value_rank", "user_mean"]]

    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return ev.groupBy("user_id").applyInPandas(
        per_user,
        schema="event_id long, user_id long, value_rank int, user_mean double",
    )


# --------------------------------------------------------------------------
# q_udtf — Python user-defined TABLE function (one row in, many out),
# consumed through a SQL LATERAL join.
# --------------------------------------------------------------------------


@query(
    "q_udtf",
    oracle="""
WITH toks AS (
  SELECT doc_id, list_filter(str_split(trim(text), ' '), t -> t != '') AS ts
  FROM documents WHERE doc_id < 100
)
SELECT doc_id, CAST(pos AS INTEGER) AS pos, ts[pos] AS token
FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ts))) AS pos) u
""",
    tags=("udf", "udtf"),
)
def q_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PySpark UDTF: tokenize each document into (pos, token) rows via a
    LATERAL join — the table-function extension point.

    The UDTF runs once per input row and yields a variable number of
    rows; Spark parallelizes it per partition like any generator (the
    plan is a Generate over a Python eval, same shape as posexplode).
    Kept to a bounded slice (100 docs): like any row-wise Python
    boundary it exists for expressiveness, not the hot path — the
    equivalent built-in is posexplode(split(...)), which is what a
    production pipeline should use.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class Tokenize:
        def eval(self, text: str):  # noqa: D401
            if text is None:
                return
            pos = 0
            for t in text.strip().split(" "):
                if t:
                    pos += 1
                    yield pos, t

    spark.udtf.register("tokenize", Tokenize)
    load(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 100
    ).createOrReplaceTempView("docs_head")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM docs_head d, LATERAL tokenize(d.text) t
        """
    )


# --------------------------------------------------------------------------
# grouped_agg_mean — pandas GROUPED_AGG UDAF (the fourth extension point:
# a vectorized user-defined AGGREGATE). Not registry-keyed — its contract
# is API-surface completeness, tested against the built-in aggregate.
# --------------------------------------------------------------------------


def grouped_agg_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type mean(value) via a pandas GROUPED_AGG UDAF — the
    Arrow-vectorized user-defined aggregate (a series in, a scalar out,
    usable in groupBy().agg and as a window function). Spark plans it
    as AggregateInPandas: partial aggregation is NOT available for
    Python aggregates, so at 100 TB a UDAF shuffles the raw group rows
    where a built-in/decimal aggregate ships partials — the reason the
    repo's analytical operators never use one (enforced by
    tests/test_plans.py::test_no_python_in_any_hot_path) and this demo
    exists only to cover the API."""
    import numpy as np

    @F.pandas_udf("double")
    def np_mean(v: pd.Series) -> float:
        # fsum-grade accumulation so the result is deterministic
        import math

        return float(math.fsum(v.to_numpy()) / len(v)) if len(v) else 0.0

    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(np_mean("value").alias("mean_value"))
        .orderBy("event_type")
    )
