"""File-based JSON-lines streaming source.

Broker-free stand-in for the reference's Kafka topic
(/root/reference/spark-streaming.py:150-155): same wire payload (the
6-field users_queue JSON, FIXTURES.md §B), same decode path (from_json with
a declared schema), but the transport is a directory of JSON-lines files
consumed with the file source + ``availableNow`` trigger. Swapping in the
real Kafka source (sources/kafka.py) changes only the reader, not the
pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# The users_queue wire schema: all six fields are strings on the wire
# (/root/reference/dags/kafka-streamer.py:25-33 builds every value with
# str.format). postcode is declared StringType — the reference declares
# LongType (/root/reference/spark-streaming.py:163) and silently nulls
# alphanumeric postcodes; that is a defect we fix, not parity we keep.
USERS_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("full_name", T.StringType()),
        T.StructField("gender", T.StringType()),
        T.StructField("address", T.StringType()),
        T.StructField("postcode", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("phone", T.StringType()),
    ]
)


def read_json_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType = USERS_WIRE_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming DataFrame over a directory of JSON-lines files.

    Schema is declared, never inferred (inference would re-list the
    directory and breaks determinism). ``maxFilesPerTrigger`` bounds
    micro-batch size — the file-source equivalent of Kafka's
    ``maxOffsetsPerTrigger`` backpressure.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming DataFrame over the events fixture parquet.

    Applies the batch loader's event-time normalization
    (tables.normalize_event_time) so streaming and batch see the identical
    TIMESTAMP type and values — ``withWatermark`` rejects TIMESTAMP_NTZ,
    and the batch-equivalence tests require equal wall values.
    """
    from streaming_data_ingestion_spark.tables import (
        _parquet_has_nanos_ts,
        normalize_event_time,
    )

    path = f"{sf_dir}/events.parquet"
    if _parquet_has_nanos_ts(path):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(path).schema
    # the streaming file source lists a directory; select just the events
    # table out of the fixture dir with a glob filter
    df = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return normalize_event_time(df)
