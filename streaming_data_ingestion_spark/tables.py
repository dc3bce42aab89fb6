"""Fixture-table access.

The driver materializes a TPC-H-ish star schema plus ``events`` /
``documents`` / ``embeddings`` as one parquet file per table under
``/root/testdata/sf*/`` (schemas: /root/repo/FIXTURES.md). Everything here
is a plain ``spark.read.parquet`` — columnar scan with predicate pushdown
and column pruning supplied by Catalyst; no custom readers needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
    """Read one fixture table. Parquet scan → pushdown/pruning for free.

    ``events.ts`` is physically TIMESTAMP(NANOS), which Spark's vectorized
    parquet reader refuses ([PARQUET_TYPE_ILLEGAL]). We read it as raw
    nanos (``nanosAsLong``) and truncate to microseconds with integer
    division — the same truncation DuckDB applies when it reads the ns
    column as its microsecond TIMESTAMP, so both engines see identical
    values.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_field = next(f for f in df.schema.fields if f.name == "ts")
        if ts_field.dataType.typeName() == "long":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL API."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
