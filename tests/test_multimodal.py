"""Multimodal binary-column plumbing tests (decode is a deterministic
fake; the Spark-side schema/batch shapes are the real thing)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from streaming_data_ingestion_spark.multimodal.binary_ops import (
    _decode_real,
    attach_binary,
    dedup_by_digest,
    extract_features,
    resize_thumbnails,
)
from streaming_data_ingestion_spark.tables import load

from tests.conftest import SF_DIR


def test_attach_binary_schema(spark):
    b = attach_binary(load(spark, SF_DIR, "documents"))
    kinds = dict(b.dtypes)
    assert kinds["payload"] == "binary"
    assert kinds["meta"].startswith("struct<mime:string,n_bytes:bigint,digest:string")
    row = b.select("meta.n_bytes", F.octet_length("payload").alias("n")).first()
    assert row["n_bytes"] == row["n"]


def test_extract_features_batches(spark):
    b = attach_binary(load(spark, SF_DIR, "documents")).repartition(4)
    feats = extract_features(b, fake=True)
    rows = feats.collect()
    assert len(rows) == load(spark, SF_DIR, "documents").count()
    for r in rows[:10]:
        assert len(r.feat) == 16
        assert abs(sum(r.feat) - 1.0) < 1e-9  # normalized histogram
    # payload column dropped: only features shuffle downstream
    assert "payload" not in feats.columns


def test_resize_thumbnails(spark):
    b = attach_binary(load(spark, SF_DIR, "documents"))
    t = resize_thumbnails(b, max_bytes=32)
    assert t.filter(F.col("thumb_bytes") > 32).count() == 0
    assert dict(t.dtypes)["thumb"] == "binary"


def test_dedup_by_digest(spark):
    b = attach_binary(load(spark, SF_DIR, "documents"))
    d = dedup_by_digest(b)
    # fixture texts are unique → one group per doc, all n_copies == 1
    assert d.count() == load(spark, SF_DIR, "documents").count()
    assert d.filter(F.col("n_copies") != 1).count() == 0


def test_real_decode_boundary():
    """_decode_real now really decodes uncompressed containers (BMP/PPM/
    WAV via codecs.py); NotImplementedError is reserved for compressed
    formats and non-media payloads — the round-9 verdict's boundary."""
    import numpy as np

    from streaming_data_ingestion_spark.multimodal.codecs import (
        encode_bmp,
        encode_wav,
    )

    rgb = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    feat = _decode_real(encode_bmp(rgb))
    # [ndim, dim0, dim1, dim2, n_values, mean, min, max]
    assert list(feat[:5]) == [3.0, 2.0, 3.0, 3.0, 18.0]
    assert feat[6] == 0.0 and feat[7] == 17.0

    wav = encode_wav(np.array([5, -5, 7, -7], dtype=np.int16), channels=2)
    feat = _decode_real(wav)
    assert list(feat[:4]) == [2.0, 2.0, 2.0, 0.0]

    with pytest.raises(NotImplementedError):
        _decode_real(b"\x00\x01")  # not a media container
    with pytest.raises(NotImplementedError):
        _decode_real(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)  # compressed


def test_sample_frames(spark):
    from streaming_data_ingestion_spark.multimodal.binary_ops import (
        attach_binary,
        sample_frames,
    )
    from streaming_data_ingestion_spark.tables import load

    from .conftest import SF_DIR

    docs = load(spark, SF_DIR, "documents").limit(50)
    frames = sample_frames(attach_binary(docs), n_frames=4, frame_bytes=16)
    pdf = frames.toPandas()
    # every doc with a non-empty payload yields exactly 4 frames
    counts = pdf.groupby("doc_id").size()
    assert (counts == 4).all()
    assert (pdf["frame_bytes"] <= 16).all()
    assert set(pdf["frame_idx"]) == {0, 1, 2, 3}


def test_media_features_feed_ivfpq_ann(spark, tmp_path):
    """End-to-end media similarity: binary payloads → Arrow-batched
    feature extraction → stored cell-partitioned IVFPQ index → a
    partition-pruned ANN query whose top hit is the query document
    itself (exact distance 0). Proves the multimodal features are
    first-class citizens of the same ANN infrastructure the text
    embeddings use — a real deployment swaps _decode_fake for a codec
    and the model's embedding dim for the 4x-tiled histogram."""
    from pyspark.sql import functions as F

    from streaming_data_ingestion_spark.ml.ivfpq import (
        build_ivfpq_index,
        query_ivfpq,
    )
    from streaming_data_ingestion_spark.multimodal.binary_ops import (
        attach_binary,
        extract_features,
    )
    from streaming_data_ingestion_spark.tables import load

    from tests.conftest import SF_DIR

    docs = load(spark, SF_DIR, "documents").limit(120)
    feats = extract_features(attach_binary(docs), fake=True)
    emb = feats.select(
        F.col("doc_id").alias("vec_id"),
        # PQ is wired for 64 dims; tile the 16-bin histogram 4x (a real
        # encoder emits the model dimension directly)
        F.flatten(
            F.array(*([F.col("feat")] * 4))
        ).cast("array<float>").alias("embedding"),
    )
    path = str(tmp_path / "media_ivfpq")
    cents = build_ivfpq_index(emb, path, k_cells=4, n_iters=2)

    probe = emb.limit(1).collect()[0]
    hits = query_ivfpq(
        spark, path, cents, [float(x) for x in probe["embedding"]],
        nprobe=2, k=5,
    ).collect()
    assert len(hits) == 5
    # the query vector itself (or a byte-histogram-identical twin) wins
    assert hits[0]["exact_dist"] < 1e-12
    assert any(h["vec_id"] == probe["vec_id"] for h in hits) or (
        hits[0]["exact_dist"] < 1e-12
    )
