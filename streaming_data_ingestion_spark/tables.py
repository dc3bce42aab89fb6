"""Fixture-table access.

The driver materializes a TPC-H-ish star schema plus ``events`` /
``documents`` / ``embeddings`` as one parquet file per table under
``/root/testdata/sf*/`` (schemas: /root/repo/FIXTURES.md). Everything here
is a plain ``spark.read.parquet`` — columnar scan with predicate pushdown
and column pruning supplied by Catalyst; no custom readers needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Parquet scan → pushdown/pruning for free."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL API."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
