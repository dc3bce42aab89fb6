"""Kafka source/sink builders (reference parity: R8, R14).

The reference subscribes to topic ``users_queue`` with
``startingOffsets=earliest`` (/root/reference/spark-streaming.py:150-155)
and publishes with a driver-side kafka-python producer
(/root/reference/dags/kafka-streamer.py:37,45). Both directions here are
the Spark-native connector — executor-parallel, offset-tracked, and (with
a checkpoint) exactly-once into idempotent sinks.

These builders only *configure* plans; executing them needs a broker and
the spark-sql-kafka package on the classpath (not present in the test
image — the test suite exercises the same pipeline through the file-based
JSON source instead, which shares every downstream operator).
tests/test_live_connectors.py carries the GATED live round-trip
(SDI_KAFKA_BOOTSTRAP + connector jar → publish, read back through this
exact option set, decode with the shared ingest flatten); it skips with
an instructive reason wherever the environment can't run it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TOPIC = "users_queue"  # /root/reference/dags/kafka-streamer.py:45


def read_kafka_topic(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = DEFAULT_TOPIC,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming scan of a Kafka topic, value decoded to string.

    Mirrors /root/reference/spark-streaming.py:150-155 + the binary→string
    cast at :169. ``maxOffsetsPerTrigger`` (absent in the reference) bounds
    micro-batch size so a backlogged topic can't produce an unbounded
    first batch — required for predictable executor memory at scale.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    raw = reader.load()
    return raw.selectExpr(
        "CAST(key AS STRING) AS key",
        "CAST(value AS STRING) AS value",
        "topic",
        "partition",
        "offset",
        "timestamp",
    )


def write_kafka_topic(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
):
    """Publish a streaming DataFrame to Kafka as JSON values.

    Engine-side replacement for the reference's driver-side producer loop
    (/root/reference/dags/kafka-streamer.py:38-49): the serialization
    (to_json(struct(*))) runs on executors, offsets are checkpointed, and
    throughput scales with partitions instead of one Python process.
    """
    payload = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
