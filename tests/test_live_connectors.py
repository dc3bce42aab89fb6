"""GATED live-connector integration tests (reference parity R14/R19).

The test image has no Kafka broker, no Cassandra node, and no connector
jars, so every test here SKIPS by default — but a deployment that
exports the env vars below (and launches Spark with the matching
connector packages) runs the exact plumbing the offline suite can only
mirror through the file-source twin:

    SDI_KAFKA_BOOTSTRAP=host:9092            (spark-sql-kafka on the classpath)
    SDI_CASSANDRA_HOST=host                  (spark-cassandra-connector, plus a
                                              ``sdi_test.users`` table)

This is deliberately the reference's own wiring: topic ``users_queue``
with startingOffsets=earliest (/root/reference/spark-streaming.py:150-155)
through sources/kafka.py's builders and streaming/ingest.py's shared
decode, and the Cassandra append the reference terminates in
(/root/reference/spark-streaming.py:193-197).
"""

from __future__ import annotations

import json
import os
import uuid

import pytest

from pyspark.sql import functions as F

KAFKA = os.environ.get("SDI_KAFKA_BOOTSTRAP")
CASSANDRA = os.environ.get("SDI_CASSANDRA_HOST")

pytestmark = pytest.mark.filterwarnings("ignore::ResourceWarning")


def _skip_unless_source_available(spark, fmt: str, exc: Exception):
    """Distinguish 'connector jar absent' (skip — the image cannot run
    this) from a real failure against a live service (fail loudly)."""
    msg = str(exc)
    if "Failed to find" in msg or "DATA_SOURCE_NOT_FOUND" in msg:
        pytest.skip(f"{fmt} connector not on the classpath: {msg[:120]}")
    raise exc


@pytest.mark.skipif(not KAFKA, reason="SDI_KAFKA_BOOTSTRAP not set")
def test_kafka_roundtrip_through_reference_wiring(spark, tmp_path):
    """Publish reference-shaped user JSON to a fresh topic with the
    engine-side producer path, read it back through read_kafka_topic's
    exact option set, and decode with the SHARED ingest flatten — the
    end-to-end the offline file-source twin mirrors."""
    from streaming_data_ingestion_spark.sources.kafka import (
        read_kafka_topic,
    )
    from streaming_data_ingestion_spark.streaming.ingest import decode_users

    topic = f"sdi_it_{uuid.uuid4().hex[:8]}"
    users = [
        {"full_name": f"user {i}", "gender": "F" if i % 2 else "M",
         "location": "somewhere", "city": "spark", "country": "null island",
         "postcode": f"AB{i}CD", "latitude": float(i), "longitude": -float(i),
         "email": f"u{i}@example.com"}
        for i in range(5)
    ]
    payload = spark.createDataFrame(
        [(json.dumps(u),) for u in users], "value string"
    )
    try:
        # batch twin of write_kafka_topic: same format/options, no stream
        (payload.selectExpr("CAST(value AS BINARY) AS value")
         .write.format("kafka")
         .option("kafka.bootstrap.servers", KAFKA)
         .option("topic", topic)
         .save())
    except Exception as e:  # noqa: BLE001 - gate on jar availability
        _skip_unless_source_available(spark, "kafka", e)

    raw = read_kafka_topic(spark, KAFKA, topic=topic)
    decoded = decode_users(raw)
    out = str(tmp_path / "out")
    (decoded.writeStream.format("parquet")
     .option("path", out)
     .option("checkpointLocation", str(tmp_path / "ckpt"))
     .trigger(availableNow=True)
     .start()
     .awaitTermination(120))
    got = spark.read.parquet(out)
    assert got.count() == 5
    # postcode survives as STRING (reference defect fixed: wire value is
    # alphanumeric, the reference declared LongType and nulled it)
    rows = {r["email"]: r for r in got.collect()}
    assert rows["u3@example.com"]["postcode"] == "AB3CD"
    # user_id synthesized and unique (reference never populated its PK)
    assert got.select("user_id").distinct().count() == 5


@pytest.mark.skipif(not CASSANDRA, reason="SDI_CASSANDRA_HOST not set")
def test_cassandra_append_analog(spark):
    """The reference's terminal write lands in Cassandra with
    mode('append') (/root/reference/spark-streaming.py:193-197); the repo
    substitutes checkpointed parquet append offline. With a live node
    this writes through the actual connector and reads the rows back."""
    df = spark.range(3).select(
        F.expr("uuid()").alias("user_id"),
        F.concat(F.lit("it-user-"), F.col("id")).alias("full_name"),
    )
    opts = {
        "spark.cassandra.connection.host": CASSANDRA,
        "keyspace": "sdi_test",
        "table": "users",
    }
    try:
        (df.write.format("org.apache.spark.sql.cassandra")
         .options(**opts).mode("append").save())
    except Exception as e:  # noqa: BLE001 - gate on jar availability
        _skip_unless_source_available(spark, "cassandra", e)
    back = (
        spark.read.format("org.apache.spark.sql.cassandra")
        .options(**opts).load()
        .filter(F.col("full_name").startswith("it-user-"))
    )
    assert back.count() >= 3
