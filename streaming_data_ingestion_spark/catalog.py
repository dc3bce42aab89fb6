"""Catalog DDL parity with the reference's Cassandra bootstrap.

The reference imperatively creates a keyspace and table before streaming
into them (create_keyspace, /root/reference/spark-streaming.py:50-66;
create_table, :70-101) and appends per micro-batch through the Cassandra
connector (writeToCassandra, :180-197). Spark-native equivalents: catalog
DDL through ``spark.sql`` and a parquet-backed managed table as the sink —
same IF NOT EXISTS idempotence, same append-per-batch shape.

Reference defects fixed here (SURVEY.md §2A):
- ``user_id`` is produced by the pipeline (uuid string), not a phantom
  column that exists only in the sink DDL;
- ``postcode`` is STRING — the wire value is a string and can be
  alphanumeric, so the reference's INT column would reject/null it.

At scale a managed parquet table takes the same write path as any parquet
sink (distributed, append = new files, no driver bottleneck); downstream
reads get catalog statistics and partition pruning for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

USERS_TABLE_COLUMNS = (
    "user_id",
    "full_name",
    "gender",
    "address",
    "postcode",
    "email",
    "phone",
)


def create_database(spark: SparkSession, name: str = "profiles") -> None:
    """CREATE DATABASE IF NOT EXISTS — the reference's create_keyspace
    (/root/reference/spark-streaming.py:50-66) without the replication
    clause, which is storage-layer config Spark's catalog doesn't need."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")


def create_users_table(
    spark: SparkSession, database: str = "profiles", table: str = "users"
) -> None:
    """CREATE TABLE IF NOT EXISTS with the reference's seven user columns
    (/root/reference/spark-streaming.py:70-101), typed correctly."""
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS {database}.{table} (
            user_id STRING,
            full_name STRING,
            gender STRING,
            address STRING,
            postcode STRING,
            email STRING,
            phone STRING
        ) USING parquet
        """
    )


def table_sink_writer(database: str = "profiles", table: str = "users"):
    """foreachBatch callable appending each micro-batch into the catalog
    table — the Spark-native twin of writeToCassandra
    (/root/reference/spark-streaming.py:180-197), same mode('append')."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.select(*USERS_TABLE_COLUMNS)
            .write.mode("append")
            .insertInto(f"{database}.{table}")
        )

    return write_batch


def create_or_replace_view(
    spark: SparkSession, name: str, query_sql: str
) -> None:
    """CREATE OR REPLACE VIEW over any engine SQL — the catalog's
    logical-layer surface (the reference has no view concept; Cassandra
    materialized views were its nearest analog)."""
    spark.sql(f"CREATE OR REPLACE VIEW {name} AS {query_sql}")


def create_table_as(
    spark: SparkSession, table: str, query_sql: str
) -> None:
    """CTAS into a parquet-backed managed table: the one-statement
    materialization path (schema inferred from the query, write
    parallelism from the plan)."""
    spark.sql(f"CREATE TABLE {table} USING parquet AS {query_sql}")
