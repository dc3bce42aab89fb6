"""Declarative DQ engine: exact violation censuses, one-scan plan."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from streaming_data_ingestion_spark import dq
from streaming_data_ingestion_spark.tables import load

from tests.conftest import SF_DIR

def _rules():
    # built lazily: Column expressions need an active SparkContext
    return [
        dq.not_null("o_orderkey"),
        dq.unique("o_orderkey"),
        dq.in_range("o_totalprice", 0, 1e9),
        dq.accepted_values("o_orderstatus", ["O", "F", "P"]),
        dq.custom(
            "date_future",
            F.col("o_orderdate") > F.lit("2030-01-01").cast("timestamp"),
        ),
    ]


def test_healthy_table_is_clean(spark):
    o = load(spark, SF_DIR, "orders")
    rep = dq.assert_valid(o, _rules())
    assert rep["n_rows"] == o.count()
    assert all(v == 0 for k, v in rep.items() if k != "n_rows")


def test_injected_violations_are_counted_exactly(spark):
    o = load(spark, SF_DIR, "orders")
    bad = spark.createDataFrame(
        [
            # null key + out-of-domain status
            (None, 1, "X", -5.0, None),
            # duplicate key (first real key) + future date
            (o.select("o_orderkey").first()[0], 1, "O", 10.0, "2031-06-01"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string",
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.col("o_totalprice").cast(dict(o.dtypes)["o_totalprice"]),
        F.col("o_orderdate").cast("timestamp"),
    )
    dirty = o.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate",
    ).unionByName(bad)

    rep = dq.report(dirty, _rules())
    assert rep["o_orderkey_null"] == 1
    assert rep["o_orderkey_dup"] == 1
    assert rep["o_totalprice_out_of_range"] == 1
    assert rep["o_orderstatus_domain"] == 1
    assert rep["date_future"] == 1
    with pytest.raises(AssertionError, match="o_orderkey_null"):
        dq.assert_valid(dirty, _rules())


def test_ref_integrity_counts_orphans(spark):
    li = load(spark, SF_DIR, "lineitem")
    o = load(spark, SF_DIR, "orders")
    clean = dq.ref_integrity(li, "l_orderkey", o, "o_orderkey").collect()[0]
    assert clean["l_orderkey_orphans"] == 0
    # drop half the parents: the orphan census must count exactly the
    # children of dropped parents
    keep = o.filter(F.col("o_orderkey") % 2 == 0)
    expect = li.filter(F.col("l_orderkey") % 2 == 1).count()
    got = dq.ref_integrity(li, "l_orderkey", keep, "o_orderkey").collect()[0]
    assert got["l_orderkey_orphans"] == expect


def test_row_local_rules_compile_to_one_scan(spark):
    """However many row-local rules, the census is one scan + one
    aggregate: no join, at most one exchange (uniqueness adds the
    count_distinct expand but no second scan)."""
    o = load(spark, SF_DIR, "orders")
    plan = (
        dq.check(o, _rules())
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    # formatted mode prints each node in the tree AND the detail list;
    # count the tree form only
    assert plan.count("- Scan parquet") == 1
    assert "Join" not in plan


def test_observed_rules_surface_per_batch_in_streaming(spark, tmp_path):
    """dq.observed rides the existing job as observe() metrics: a
    two-batch stream reports each batch's exact violation counters
    through the progress listener — continuous data-quality monitoring
    with zero additional scans."""
    import time

    from streaming_data_ingestion_spark.streaming.metrics import (
        QueryProgressCollector,
    )

    src = tmp_path / "dq_src"
    src.mkdir()
    (src / "b0.jsonl").write_text(
        '{"k": 1, "status": "O"}\n{"k": 2, "status": "F"}\n'
    )
    (src / "b1.jsonl").write_text(
        '{"k": null, "status": "O"}\n{"k": 4, "status": "X"}\n'
    )

    rules = [
        dq.not_null("k"),
        dq.accepted_values("status", ["O", "F", "P"]),
    ]
    stream = spark.readStream.schema("k long, status string").option(
        "maxFilesPerTrigger", 1
    ).json(str(src))

    collector = QueryProgressCollector.attach(spark)
    try:
        q = (
            dq.observed(stream, rules, name="gate")
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "dq_out"))
            .option("checkpointLocation", str(tmp_path / "dq_ckpt"))
            .outputMode("append")
            .queryName("dq_stream")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        deadline = time.time() + 30
        gates = []
        while time.time() < deadline:
            gates = [
                p["observed_metrics"]["gate"]
                for p in collector.progress
                if p["name"] == "dq_stream"
                and "gate" in (p.get("observed_metrics") or {})
            ]
            if len(gates) >= 2:
                break
            time.sleep(0.5)
        totals = {
            k: sum(g[k] for g in gates) for k in ("n_rows", "k_null", "status_domain")
        }
        assert totals == {"n_rows": 4, "k_null": 1, "status_domain": 1}
        # per-batch resolution: the clean batch reports zeros
        assert any(
            g["k_null"] == 0 and g["status_domain"] == 0 for g in gates
        )
    finally:
        collector.detach(spark)


def test_observed_rejects_uniqueness(spark):
    o = load(spark, SF_DIR, "orders")
    with pytest.raises(ValueError, match="uniqueness"):
        dq.observed(o, [dq.unique("o_orderkey")])
