"""Subquery surface: scalar, IN, and correlated EXISTS subqueries.

These run through ``spark.sql`` over temp views — the engine's second entry
point alongside the DataFrame API. Catalyst rewrites each form into the
join the optimizer would pick anyway (scalar → broadcast of a 1-row
aggregate, IN → left-semi join, correlated EXISTS → left-semi join on the
correlation key), so the 100 TB story is the same as the explicit-join
queries: the subquery side aggregates/deduplicates *before* the join and
broadcasts when small.

The reference has no subqueries (its single dataflow is a stateless map —
SURVEY.md §2A); this family is part of the declared analytics surface
(§2B's "complete analytics surface" mandate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from streaming_data_ingestion_spark.registry import query
from streaming_data_ingestion_spark.tables import load


def _view(spark: SparkSession, sf_dir: str, table: str) -> str:
    """Register ``table`` as a temp view and return its name."""
    load(spark, sf_dir, table).createOrReplaceTempView(table)
    return table


# --------------------------------------------------------------------------
# q_subquery_scalar — uncorrelated scalar subquery as a filter threshold.
# --------------------------------------------------------------------------


@query(
    "q_subquery_scalar",
    oracle="""
SELECT p_partkey, p_name, p_size
FROM part
WHERE p_size > (SELECT AVG(p_size) FROM part)
""",
    tags=("subquery",),
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts larger than the corpus-average size.

    The scalar subquery is an integer average (exact in double at any
    realistic row count, so both engines derive the identical threshold).
    Catalyst plans the inner aggregate once and broadcasts the single
    row — the outer scan streams with a pushed-down-style comparison,
    no shuffle of ``part``.
    """
    _view(spark, sf_dir, "part")
    return spark.sql(
        """
        SELECT p_partkey, p_name, p_size
        FROM part
        WHERE p_size > (SELECT AVG(p_size) FROM part)
        """
    )


# --------------------------------------------------------------------------
# q_subquery_in — IN (uncorrelated subquery) ⇒ left-semi join.
# --------------------------------------------------------------------------


@query(
    "q_subquery_in",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey IN (
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
""",
    tags=("subquery",),
)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with at least one urgent order.

    Catalyst rewrites IN to a left-semi join on ``c_custkey`` — the
    orders side is filtered and deduplicated on the join key before
    shuffling, so the semi join moves distinct keys, not the orders
    table.
    """
    _view(spark, sf_dir, "customer")
    _view(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE c_custkey IN (
          SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        )
        """
    )


# --------------------------------------------------------------------------
# q_subquery_exists — correlated EXISTS ⇒ left-semi on the correlation key.
# --------------------------------------------------------------------------


@query(
    "q_subquery_exists",
    oracle="""
SELECT s_suppkey, s_name, s_acctbal
FROM supplier s
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49
)
""",
    tags=("subquery",),
)
def q_subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers that shipped at least one near-max-quantity line item.

    The correlation predicate becomes the semi-join key; the quantity
    filter pushes into the lineitem parquet scan first. EXISTS
    short-circuits per key — no aggregation, no duplicate outer rows.
    """
    _view(spark, sf_dir, "supplier")
    _view(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT s_suppkey, s_name, s_acctbal
        FROM supplier s
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49
        )
        """
    )
