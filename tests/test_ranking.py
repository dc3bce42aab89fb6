"""Distributed global ranking: exactness vs the window-function oracle
at fixture scale, NTILE closed form vs the window NTILE, determinism."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from streaming_data_ingestion_spark.ranking import ntile_of_rank, with_global_rank
from streaming_data_ingestion_spark.tables import load

from .conftest import SF_DIR


def test_global_rank_equals_window_row_number(spark):
    """with_global_rank must reproduce row_number() over the same total
    order exactly — partition boundaries and id gaps must be invisible."""
    ev = load(spark, SF_DIR, "events").select("event_id", "ts", "value")
    ranked, total = with_global_rank(ev, ["ts", "event_id"], rank_col="r")
    assert total == ev.count()

    w = Window.orderBy("ts", "event_id")
    want = ev.select("event_id", F.row_number().over(w).alias("r"))
    got = ranked.select("event_id", "r")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    # determinism: a second invocation lands identical ranks
    again, _ = with_global_rank(ev, ["ts", "event_id"], rank_col="r")
    assert again.select("event_id", "r").exceptAll(got).count() == 0


def test_global_rank_narrow_input_few_partitions(spark):
    """Fewer rows than partitions: ranks still dense 1..n."""
    df = spark.range(5).select(F.col("id").alias("k"))
    ranked, total = with_global_rank(df, ["k"], rank_col="r", num_partitions=16)
    rows = {r["k"]: r["r"] for r in ranked.collect()}
    assert total == 5
    assert rows == {i: i + 1 for i in range(5)}


def test_ntile_of_rank_matches_window_ntile(spark):
    """The closed-form NTILE must equal the window NTILE for totals that
    exercise every branch: divisible, remainder, and n < tiles."""
    for n, t in [(100, 10), (103, 10), (7, 10), (10, 3), (1, 4)]:
        df = spark.range(1, n + 1).select(F.col("id").alias("r"))
        got = df.select("r", ntile_of_rank(F.col("r"), n, t).alias("bin"))
        want = df.select(
            "r", F.ntile(t).over(Window.orderBy("r")).alias("bin")
        )
        mismatch = got.join(want, "r").filter(
            got["bin"] != want["bin"]
        )
        assert mismatch.count() == 0, (n, t)
