"""Source connector tests (offline)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaming_data_ingestion_spark.sources import http_source
from streaming_data_ingestion_spark.tables import load

from tests.conftest import SF_DIR


def test_randomuser_datasource_offline(spark):
    assert http_source.register(spark), "PySpark 4 DataSource API expected"
    df = (
        spark.read.format("randomuser")
        .option("numRows", 20)
        .option("numPartitions", 3)
        .option("mode", "offline")
        .load()
    )
    rows = df.collect()
    assert len(rows) == 20
    assert df.schema == http_source.USER_API_SCHEMA
    # nested access works (reference's results[0]['name']['first'] shape)
    first = df.selectExpr("name.first").collect()
    assert all(r[0] for r in first)


def test_flatten_user_records(spark):
    http_source.register(spark)
    df = (
        spark.read.format("randomuser")
        .option("numRows", 14)
        .option("mode", "offline")
        .load()
    )
    flat = http_source.flatten_user_records(df)
    assert [f.name for f in flat.schema.fields] == [
        "full_name",
        "gender",
        "address",
        "postcode",
        "email",
        "phone",
    ]
    rows = flat.collect()
    assert all(" " in r.full_name for r in rows)
    assert all(r.address.count(", ") == 4 for r in rows)
    # alphanumeric postcodes intact (i % 7 == 0 → 2 of 14)
    assert sum(1 for r in rows if not r.postcode.isdigit()) == 2


def test_kafka_builders_importable():
    # no broker in the test image: just check the builders configure plans
    from streaming_data_ingestion_spark.sources.kafka import (
        read_kafka_topic,
        write_kafka_topic,
    )

    assert callable(read_kafka_topic) and callable(write_kafka_topic)


def test_randomuser_streaming_source(spark, tmp_path):
    """The streaming reader: two fixed-size micro-batches, offsets
    checkpointed, restart resumes from the recorded offset instead of
    re-ingesting (the defect the reference had)."""
    import uuid

    http_source.register(spark)
    name = f"ru_{uuid.uuid4().hex[:8]}"
    ckpt = str(tmp_path / "ru_ckpt")

    def run_batches(n_batches):
        stream = (
            spark.readStream.format("randomuser")
            .option("rowsPerBatch", 5)
            .option("mode", "offline")
            .load()
        )
        q = (
            http_source.flatten_user_records(stream)
            .writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(processingTime="0 seconds")
            .start()
        )
        import time

        deadline = time.time() + 60
        while time.time() < deadline:
            progress = q.recentProgress
            if len(progress) >= n_batches:
                break
            time.sleep(0.5)
        q.stop()
        q.awaitTermination(30)

    run_batches(2)
    n_after_first = spark.sql(f"SELECT count(*) FROM {name}").collect()[0][0]
    assert n_after_first >= 10  # ≥2 batches of 5
    assert n_after_first % 5 == 0

    out = spark.sql(f"SELECT full_name, email FROM {name}").collect()
    emails = [r.email for r in out]
    assert len(set(emails)) == len(emails)  # offsets advanced, no re-reads


class TestFormats:
    """CSV / JSON-lines / ORC round-trips must preserve schema and values
    exactly, and the columnar path (ORC) must keep predicate pushdown."""

    def test_csv_roundtrip_schema_and_values(self, spark, tmp_path):
        from streaming_data_ingestion_spark.sources.formats import (
            read_csv,
            write_csv,
        )

        orig = load(spark, SF_DIR, "orders")
        path = str(tmp_path / "orders_csv")
        write_csv(orig, path)
        back = read_csv(spark, path, orig.schema)
        assert back.schema == orig.schema
        assert back.count() == orig.count()
        assert back.exceptAll(orig).count() == 0

    def test_jsonl_roundtrip_schema_and_values(self, spark, tmp_path):
        from streaming_data_ingestion_spark.sources.formats import (
            read_jsonl,
            write_jsonl,
        )

        orig = load(spark, SF_DIR, "events")
        path = str(tmp_path / "events_jsonl")
        write_jsonl(orig, path)
        back = read_jsonl(spark, path, orig.schema)
        assert back.schema == orig.schema
        assert back.count() == orig.count()
        assert back.exceptAll(orig).count() == 0

    def test_xml_roundtrip_schema_and_values(self, spark, tmp_path):
        """Spark 4 ships XML built-in; the round-trip must preserve the
        declared schema and every value, microsecond timestamps
        included (the text-format truncation trap _TS_FMT guards)."""
        from streaming_data_ingestion_spark.sources.formats import (
            read_xml,
            write_xml,
        )

        orig = load(spark, SF_DIR, "events")
        path = str(tmp_path / "events_xml")
        write_xml(orig, path)
        back = read_xml(spark, path, orig.schema)
        assert back.schema == orig.schema
        assert back.count() == orig.count()
        assert back.exceptAll(orig).count() == 0

    def test_orc_roundtrip_with_pushdown(self, spark, tmp_path):
        from streaming_data_ingestion_spark.sources.formats import (
            read_orc,
            write_orc,
        )

        orig = load(spark, SF_DIR, "lineitem")
        path = str(tmp_path / "lineitem_orc")
        write_orc(orig, path)
        back = read_orc(spark, path)
        assert back.schema == orig.schema
        assert back.count() == orig.count()

        filtered = back.filter(F.col("l_quantity") > 45).select(
            "l_orderkey", "l_quantity"
        )
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = filtered._jdf.queryExecution().explainString(mode)
        assert "PushedFilters:" in plan
        assert "l_quantity" in plan.split("PushedFilters:")[1].split("\n")[0]
        read_cols = plan.split("ReadSchema:")[1].split("\n")[0]
        assert "l_comment" not in read_cols and "l_tax" not in read_cols
        want = orig.filter(F.col("l_quantity") > 45).count()
        assert filtered.count() == want

    def test_partitioned_csv_layout(self, spark, tmp_path):
        from streaming_data_ingestion_spark.sources.formats import (
            read_csv,
            write_csv,
        )

        orig = load(spark, SF_DIR, "documents")
        path = str(tmp_path / "docs_csv")
        write_csv(orig, path, partition_cols=["source"])
        back = read_csv(
            spark, path, orig.select([c for c in orig.columns]).schema
        )
        assert back.count() == orig.count()
        assert sorted(back.columns) == sorted(orig.columns)


def test_parquet_schema_evolution(spark, tmp_path):
    """Old files without the new column must read back with NULLs under
    the merged schema; the default single-footer read is allowed to miss
    the new column, which is exactly why the evolving reader exists."""
    from streaming_data_ingestion_spark.sources.formats import (
        read_parquet_evolving,
    )

    path = str(tmp_path / "evolving")
    old = load(spark, SF_DIR, "documents").select("doc_id", "text")
    old.write.parquet(path)
    new = (
        load(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .withColumn("quality", F.length("text").cast("double"))
        .limit(100)
    )
    new.write.mode("append").parquet(path)

    merged = read_parquet_evolving(spark, path)
    assert set(merged.columns) == {"doc_id", "text", "quality"}
    assert merged.count() == old.count() + 100
    assert merged.filter(F.col("quality").isNull()).count() == old.count()
    assert merged.filter(F.col("quality").isNotNull()).count() == 100


def test_binary_file_source_roundtrip(spark, tmp_path):
    """binaryFile ingestion: one row per file, exact bytes back, glob
    pruning at listing time, recursive lookup, and the content-addressed
    doc adapter (stable ids + digest) for the multimodal pipeline."""
    import hashlib

    from streaming_data_ingestion_spark.sources.formats import (
        binary_files_to_docs,
        read_binary_files,
    )

    media = tmp_path / "media"
    (media / "sub").mkdir(parents=True)
    payloads = {
        "a.jpg": bytes(range(256)),
        "b.png": b"\x89PNG-fake-payload",
        "notes.txt": b"not media",
        "sub/c.wav": b"RIFF-fake-audio",
    }
    for rel, data in payloads.items():
        (media / rel).write_bytes(data)

    # flat listing: only top-level files
    flat = read_binary_files(spark, str(media))
    assert flat.count() == 3
    # glob pruning: jpg only
    jpg = read_binary_files(spark, str(media), glob="*.jpg")
    rows = jpg.collect()
    assert len(rows) == 1
    assert bytes(rows[0]["content"]) == payloads["a.jpg"]
    assert rows[0]["length"] == 256
    # recursive: picks up sub/c.wav
    rec = read_binary_files(spark, str(media), recursive=True)
    assert rec.count() == 4

    docs = binary_files_to_docs(rec)
    assert set(docs.columns) == {"doc_id", "payload", "meta", "source_path"}
    got = {r["source_path"].rsplit("/", 1)[-1]: r for r in docs.collect()}
    # digest is the real sha256 of the bytes; doc_id is derived from it
    want = hashlib.sha256(payloads["a.jpg"]).hexdigest()
    assert got["a.jpg"]["meta"]["digest"] == want
    assert got["a.jpg"]["doc_id"] == int(want[:15], 16)
    # extension-based mime guess, octet-stream fallback
    assert got["b.png"]["meta"]["mime"] == "image/png"
    assert got["c.wav"]["meta"]["mime"] == "audio/wav"
    assert got["notes.txt"]["meta"]["mime"] == "application/octet-stream"
    # re-ingesting the same bytes from a different path → same doc_id
    copy = tmp_path / "copy"
    copy.mkdir()
    (copy / "renamed.jpg").write_bytes(payloads["a.jpg"])
    again = binary_files_to_docs(read_binary_files(spark, str(copy)))
    assert again.collect()[0]["doc_id"] == got["a.jpg"]["doc_id"]


def test_binary_file_docs_feed_multimodal_features(spark, tmp_path):
    """The binaryFile → docs adapter output must flow straight into the
    multimodal feature extractor (schema contract between the source and
    multimodal/binary_ops.py)."""
    from streaming_data_ingestion_spark.multimodal.binary_ops import (
        extract_features,
    )
    from streaming_data_ingestion_spark.sources.formats import (
        binary_files_to_docs,
        read_binary_files,
    )

    media = tmp_path / "m"
    media.mkdir()
    (media / "x.jpg").write_bytes(bytes([7] * 64))
    docs = binary_files_to_docs(read_binary_files(spark, str(media)))
    feats = extract_features(docs, fake=True)
    row = feats.collect()[0]
    assert len(row["feat"]) == 16
    assert abs(sum(row["feat"]) - 1.0) < 1e-12
