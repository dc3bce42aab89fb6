"""Partition backfill: surgical repair, untouched-partition stability,
scope containment, idempotence."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from streaming_data_ingestion_spark.backfill import backfill_partitions
from streaming_data_ingestion_spark.tables import load

from tests.conftest import SF_DIR


def _table_build(spark):
    ev = load(spark, SF_DIR, "events")
    return ev.select(
        "event_id", "user_id", "value",
        (F.col("user_id") % 4).alias("shard"),
    )


def _file_state(path):
    return {
        f: os.stat(f).st_mtime_ns
        for f in glob.glob(f"{path}/shard=*/*.parquet")
    }


def test_backfill_repairs_only_requested_partitions(spark, tmp_path):
    path = str(tmp_path / "sharded")
    _table_build(spark).write.partitionBy("shard").parquet(path)
    want = _table_build(spark).collect()

    # corrupt shard 2: overwrite it with garbage rows
    spark.createDataFrame(
        [(999999, 0, 0.0, 2)], "event_id long, user_id long, value double, shard long"
    ).write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("shard").parquet(path)
    assert spark.read.parquet(path).count() != len(want)

    before = _file_state(path)
    stats = backfill_partitions(
        spark, _table_build, path, "shard", [2]
    )
    assert stats["partitions"] == 1
    after = _file_state(path)

    # repaired: table equals the full rebuild bit-exactly
    got = spark.read.parquet(path).select(
        "event_id", "user_id", "value", "shard"
    )
    assert got.count() == len(want)
    assert got.exceptAll(spark.createDataFrame(want)).count() == 0
    # surgical: only shard=2's files changed
    untouched_before = {f: m for f, m in before.items() if "shard=2" not in f}
    untouched_after = {f: m for f, m in after.items() if "shard=2" not in f}
    assert untouched_before == untouched_after


def test_backfill_cannot_escape_requested_scope(spark, tmp_path):
    """A build_fn that returns MORE partitions than requested must not
    clobber the extras: the runner filters to the requested values."""
    path = str(tmp_path / "scoped")
    _table_build(spark).write.partitionBy("shard").parquet(path)
    before = _file_state(path)

    def evil_build(spark):
        # returns every shard, not just the requested one
        return _table_build(spark)

    backfill_partitions(spark, evil_build, path, "shard", [1])
    after = _file_state(path)
    untouched_before = {f: m for f, m in before.items() if "shard=1" not in f}
    untouched_after = {f: m for f, m in after.items() if "shard=1" not in f}
    assert untouched_before == untouched_after


def test_backfill_restores_overwrite_mode_and_handles_empty(spark, tmp_path):
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    assert backfill_partitions(
        spark, _table_build, str(tmp_path / "x"), "shard", []
    ) == {"partitions": 0, "rows_written": 0}
    path = str(tmp_path / "mode")
    _table_build(spark).write.partitionBy("shard").parquet(path)
    backfill_partitions(spark, _table_build, path, "shard", [0])
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode") == prev


def test_upsert_updates_inserts_and_leaves_other_partitions_alone(spark, tmp_path):
    from streaming_data_ingestion_spark.backfill import upsert_partitioned

    path = str(tmp_path / "upsert")
    _table_build(spark).write.partitionBy("shard").parquet(path)
    before_files = _file_state(path)
    base = {r["event_id"]: r for r in spark.read.parquet(path).collect()}

    # update one existing row in shard 1, insert one new row in shard 1
    some_id = next(
        r["event_id"] for r in base.values() if r["shard"] == 1
    )
    updates = spark.createDataFrame(
        [
            (some_id, 42, 999.5, 1),      # update
            (77_000_001, 43, 1.5, 1),     # insert
        ],
        "event_id long, user_id long, value double, shard long",
    )
    stats = upsert_partitioned(spark, path, updates, "event_id", "shard")
    assert stats["partitions"] == 1

    after = {r["event_id"]: r for r in spark.read.parquet(path).collect()}
    assert len(after) == len(base) + 1
    assert after[some_id]["value"] == 999.5 and after[some_id]["user_id"] == 42
    assert after[77_000_001]["value"] == 1.5
    # every other row identical
    for eid, r in base.items():
        if eid != some_id:
            assert after[eid]["value"] == r["value"]
    # untouched partitions' files byte-identical
    after_files = _file_state(path)
    ub = {f: m for f, m in before_files.items() if "shard=1" not in f}
    ua = {f: m for f, m in after_files.items() if "shard=1" not in f}
    assert ub == ua


def test_upsert_is_idempotent(spark, tmp_path):
    from streaming_data_ingestion_spark.backfill import upsert_partitioned

    path = str(tmp_path / "upsert2")
    _table_build(spark).write.partitionBy("shard").parquet(path)
    updates = spark.createDataFrame(
        [(88_000_001, 5, 2.5, 3)],
        "event_id long, user_id long, value double, shard long",
    )
    upsert_partitioned(spark, path, updates, "event_id", "shard")
    once = sorted(
        map(tuple, spark.read.parquet(path).collect())
    )
    upsert_partitioned(spark, path, updates, "event_id", "shard")
    twice = sorted(
        map(tuple, spark.read.parquet(path).collect())
    )
    assert once == twice


def test_upsert_replay_from_torn_partition_swap_converges(spark, tmp_path):
    """upsert_partitioned is atomic PER PARTITION, not across them
    (docs/SCALE.md isolation taxonomy): a crash can leave shard=0
    swapped while shard=1 still holds pre-upsert rows. Replaying the
    SAME upsert over that torn table must converge to the full target —
    the property that makes the CDC apply loop's epoch replay safe."""
    from streaming_data_ingestion_spark.backfill import upsert_partitioned

    base = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0), (3, "c", 1), (4, "d", 1)],
        "k long, v string, shard long",
    )
    updates = spark.createDataFrame(
        [(1, "a2", 0), (5, "e", 0), (3, "c2", 1), (6, "f", 1)],
        "k long, v string, shard long",
    )

    # target = what one uncrashed full upsert produces (scratch copy)
    scratch = str(tmp_path / "scratch")
    base.write.partitionBy("shard").parquet(scratch)
    upsert_partitioned(spark, scratch, updates, "k", "shard")
    want = {
        (r.k, r.v, r.shard) for r in spark.read.parquet(scratch).collect()
    }

    # torn state: only shard=0's swap landed before the "crash"
    table = str(tmp_path / "t")
    base.write.partitionBy("shard").parquet(table)
    upsert_partitioned(
        spark, table, updates.filter("shard = 0"), "k", "shard"
    )
    mid = {
        (r.k, r.v, r.shard) for r in spark.read.parquet(table).collect()
    }
    assert mid != want
    assert (3, "c", 1) in mid and (1, "a2", 0) in mid  # genuinely torn

    # replay the WHOLE upsert over the torn table → converges
    upsert_partitioned(spark, table, updates, "k", "shard")
    got = {
        (r.k, r.v, r.shard) for r in spark.read.parquet(table).collect()
    }
    assert got == want

    # and the converged state is a fixed point
    upsert_partitioned(spark, table, updates, "k", "shard")
    assert {
        (r.k, r.v, r.shard) for r in spark.read.parquet(table).collect()
    } == want
