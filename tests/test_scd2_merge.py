"""SCD2 snapshot merge: change classes, idempotence, logical deletes."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from streaming_data_ingestion_spark.scd2 import merge_scd2

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 2, 1)
T2 = dt.datetime(2024, 3, 1)

SCHEMA = (
    "k long, city string, tier string, "
    "valid_from timestamp, valid_to timestamp"
)
SNAP_SCHEMA = "k long, city string, tier string"


def _rows(df):
    return sorted(
        (r["k"], r["city"], r["tier"], r["valid_from"], r["valid_to"])
        for r in df.collect()
    )


def test_merge_classifies_every_change_kind(spark):
    history = spark.createDataFrame(
        [
            (1, "rome", "gold", T0, None),     # will change tier at T1
            (2, "oslo", "silver", T0, None),   # unchanged
            (4, "lima", "gold", T0, T1),       # already-closed history
        ],
        SCHEMA,
    )
    snapshot = spark.createDataFrame(
        [
            (1, "rome", "platinum"),  # changed
            (2, "oslo", "silver"),    # unchanged
            (3, "kyiv", "bronze"),    # new key
        ],
        SNAP_SCHEMA,
    )
    merged = merge_scd2(
        history, snapshot, "k", ["city", "tier"], as_of=T1
    )
    assert _rows(merged) == sorted(
        [
            (1, "rome", "gold", T0, T1),        # closed at the change
            (1, "rome", "platinum", T1, None),  # new current version
            (2, "oslo", "silver", T0, None),    # untouched
            (3, "kyiv", "bronze", T1, None),    # inserted
            (4, "lima", "gold", T0, T1),        # closed history passes through
        ]
    )
    # exactly one open row per live key
    opens = merged.filter(F.col("valid_to").isNull()).groupBy("k").count()
    assert opens.filter(F.col("count") > 1).count() == 0


def test_merge_is_idempotent(spark):
    history = spark.createDataFrame(
        [(1, "rome", "gold", T0, None), (2, "oslo", "silver", T0, None)],
        SCHEMA,
    )
    snapshot = spark.createDataFrame(
        [(1, "rome", "platinum"), (2, "oslo", "silver")], SNAP_SCHEMA
    )
    once = merge_scd2(history, snapshot, "k", ["city", "tier"], as_of=T1)
    twice = merge_scd2(once, snapshot, "k", ["city", "tier"], as_of=T2)
    # re-merging the same snapshot changes nothing (no new versions)
    assert _rows(once) == _rows(twice)


def test_close_missing_is_a_logical_delete(spark):
    history = spark.createDataFrame(
        [(1, "rome", "gold", T0, None), (2, "oslo", "silver", T0, None)],
        SCHEMA,
    )
    snapshot = spark.createDataFrame([(1, "rome", "gold")], SNAP_SCHEMA)

    kept = merge_scd2(history, snapshot, "k", ["city", "tier"], as_of=T1)
    assert (2, "oslo", "silver", T0, None) in _rows(kept)  # default: keep

    closed = merge_scd2(
        history, snapshot, "k", ["city", "tier"], as_of=T1,
        close_missing=True,
    )
    assert (2, "oslo", "silver", T0, T1) in _rows(closed)
    assert closed.filter(
        (F.col("k") == 2) & F.col("valid_to").isNull()
    ).count() == 0
