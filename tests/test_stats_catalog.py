"""Optimizer-statistics lifecycle: ANALYZE writes catalog stats, the
optimizer plans with them, and CBO join decisions follow the numbers."""

from __future__ import annotations

import pytest

from streaming_data_ingestion_spark.stats_catalog import (
    analyze_table,
    column_stats,
    plan_row_estimate,
    table_stats,
)
from streaming_data_ingestion_spark.tables import load

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def stat_tables(spark):
    load(spark, SF_DIR, "nation").write.mode("overwrite").saveAsTable("st_nation")
    load(spark, SF_DIR, "customer").write.mode("overwrite").saveAsTable(
        "st_customer"
    )
    yield ("st_nation", "st_customer")
    spark.sql("DROP TABLE IF EXISTS st_nation")
    spark.sql("DROP TABLE IF EXISTS st_customer")


def test_analyze_records_exact_rowcount_and_size(spark, stat_tables):
    nation, customer = stat_tables
    analyze_table(spark, nation)
    analyze_table(spark, customer)
    ns, cs = table_stats(spark, nation), table_stats(spark, customer)
    assert ns["row_count"] == spark.table(nation).count()
    assert cs["row_count"] == spark.table(customer).count()
    assert ns["size_bytes"] and cs["size_bytes"] > ns["size_bytes"]


def test_column_stats_carry_ndv_and_bounds(spark, stat_tables):
    nation, _ = stat_tables
    analyze_table(spark, nation, columns=("n_nationkey", "n_name"))
    st = column_stats(spark, nation, "n_nationkey")
    n = spark.table(nation).count()
    # NDV via HLL++ is approximate by contract; the key is unique so the
    # estimate must land within its documented few-percent band.
    assert abs(int(st["distinct_count"]) - n) <= max(2, n // 20)
    assert int(st["min"]) == 0
    assert int(st["num_nulls"]) == 0


def test_optimizer_plans_with_collected_rowcount(spark, stat_tables):
    """The stat the catalog holds must be the stat the optimizer USES:
    with CBO on, the optimized plan's row estimate for a plain table
    read equals the ANALYZE-collected count, not a byte-size guess."""
    nation, _ = stat_tables
    analyze_table(spark, nation)
    before = spark.conf.get("spark.sql.cbo.enabled", "false")
    try:
        spark.conf.set("spark.sql.cbo.enabled", "true")
        est = plan_row_estimate(spark.table(nation))
        assert est == spark.table(nation).count()
    finally:
        spark.conf.set("spark.sql.cbo.enabled", before)


def test_stats_flip_join_to_broadcast_when_files_lie(spark, stat_tables):
    """Broadcast decisions follow catalog stats when present. With the
    threshold set between the two tables' stated sizes, the small side
    broadcasts and the big side never shuffles — the decision a 100 TB
    deployment relies on stats (not per-query file listing) to make."""
    nation, customer = stat_tables
    analyze_table(spark, nation)
    analyze_table(spark, customer)
    ns = table_stats(spark, nation)["size_bytes"]
    cs = table_stats(spark, customer)["size_bytes"]
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(ns + (cs - ns) // 2))
        j = spark.table(customer).join(
            spark.table(nation),
            spark.table(customer)["c_nationkey"] == spark.table(nation)["n_nationkey"],
        )
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
