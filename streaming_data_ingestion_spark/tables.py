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

    ``events.ts`` has shipped in two physical forms across driver testdata
    generations: TIMESTAMP(NANOS) (which Spark's vectorized parquet reader
    refuses — [PARQUET_TYPE_ILLEGAL] — so we read raw nanos via
    ``nanosAsLong`` and truncate to microseconds) and naive TIMESTAMP(MICROS)
    (which Spark 4 infers as TIMESTAMP_NTZ). Both are normalized here to the
    session-zoned TIMESTAMP type under a UTC-pinned session, so every
    downstream query sees one stable type with wall values identical to what
    DuckDB reads (it treats the column as naive microseconds either way).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for f_ in df.schema.fields:
        tname = f_.dataType.typeName()
        if name == "events" and f_.name == "ts" and tname == "long":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif tname == "timestamp_ntz":
            # NTZ→LTZ cast interprets the wall time in the session zone;
            # pin UTC so the conversion is the identity on wall values
            # (the registry wrapper re-pins per query call as well).
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            df = df.withColumn(f_.name, F.col(f_.name).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL API."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
