"""Multimodal columns: opaque binary payloads + typed metadata (north-star
mandate, SURVEY.md §2B "(non-oracle) multimodal columns").

Model: media travels as a ``binary`` column next to a metadata struct
(mime, width/height or duration, byte length, content digest). Decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators — per-partition, streaming batches, no
driver involvement.

Decode is REAL for uncompressed containers: ``codecs.py`` implements
numpy-only BMP / PPM / PGM / RIFF-WAVE-PCM parsers (header fields, row
padding, bottom-up BGR rows, chunk walking, 8/16-bit PCM), and
``_decode_real`` routes recognized magic bytes through them. Only
*compressed* formats (PNG/JPEG/MP3/...) raise ``NotImplementedError`` —
they genuinely need codec libraries this container lacks; on a cluster
with codecs installed only that branch changes. The deterministic fake
("decode" = byte histogram features) remains for payloads that are not
media containers at all (the text-as-bytes fixtures).

Scale notes: binary payloads make wide rows — keep
``spark.sql.files.maxPartitionBytes`` moderate so a partition of blobs
fits executor memory, and never collect blob columns. The metadata struct
exists precisely so filters (mime, size, digest-dedup) prune BEFORE any
decode runs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

METADATA_COLS = ("mime", "n_bytes", "digest")

FEATURE_SCHEMA = (
    "doc_id long, mime string, n_bytes long, digest string, "
    "feat array<double>"
)

THUMB_SCHEMA = "doc_id long, thumb binary, thumb_bytes long"


def attach_binary(df: DataFrame, payload_col: str = "text") -> DataFrame:
    """Wrap a column as an opaque binary payload + metadata struct.

    (The fixtures have no real media files, so document text stands in as
    the payload bytes; with real data this is ``spark.read.format
    ("binaryFile")`` or a binary parquet column — the downstream plumbing
    is identical.)
    """
    payload = F.encode(F.col(payload_col), "UTF-8")
    return df.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.sha2(payload, 256).alias("digest"),
        ).alias("meta"),
    )


def _decode_real(payload: bytes) -> np.ndarray:
    """Real decode via the numpy-only container parsers (codecs.py),
    summarized to a fixed-length feature vector so heterogeneous media
    (image vs audio, any dimensions) share one stable ``array<double>``
    schema: [ndim, dim0, dim1, dim2, n_values, mean, min, max].

    Raises NotImplementedError only for compressed formats (PNG/JPEG/
    MP3/...) or non-media payloads — the boundary that genuinely needs
    external codec libraries (see codecs.decode_any).
    """
    from streaming_data_ingestion_spark.multimodal.codecs import decode_any

    arr = decode_any(payload)
    flat = arr.astype(np.float64).ravel()
    dims = list(arr.shape) + [0.0] * (3 - arr.ndim)
    return np.array(
        [
            float(arr.ndim),
            *dims[:3],
            float(flat.size),
            float(flat.mean()),
            float(flat.min()),
            float(flat.max()),
        ]
    )


def _decode_fake(payload: bytes) -> np.ndarray:
    """Deterministic stand-in 'decode': 16-bin byte histogram, normalized.
    Exercises the identical batch shapes as a real pixel decode."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=16).astype(np.float64)
    total = hist.sum()
    return hist / total if total else hist


def extract_features(binary_df: DataFrame, fake: bool = True) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    One pass per partition, payload bytes never leave the executor; the
    output drops the payload so only the (small) feature vector shuffles
    afterwards.
    """
    decode = _decode_fake if fake else _decode_real

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode(p).tolist() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "digest": [m["digest"] for m in pdf["meta"]],
                    "feat": feats,
                }
            )

    return binary_df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_thumbnails(binary_df: DataFrame, max_bytes: int = 64) -> DataFrame:
    """'Resize' stub: truncate payload to max_bytes (a real impl re-encodes
    pixels; the batch shape — binary in, smaller binary out — is the same)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            thumbs = [bytes(p[:max_bytes]) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "thumb": thumbs,
                    "thumb_bytes": [len(t) for t in thumbs],
                }
            )

    return binary_df.mapInPandas(batches, schema=THUMB_SCHEMA)


def dedup_by_digest(binary_df: DataFrame) -> DataFrame:
    """Exact media dedup on the metadata digest — prunes before any decode
    (the metadata-first principle: never touch bytes you can skip)."""
    return binary_df.groupBy(F.col("meta.digest").alias("digest")).agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


# ---------------------------------------------------------------------------
# Deterministic media synthesis + REAL decode — the oracle-checkable path.
#
# The fixtures carry no media bytes, so these operators synthesize
# GENUINE containers (spec-conformant WAV / BMP / PPM via codecs.py)
# whose sample/pixel values are a closed-form integer function of
# doc_id, then run the real decoder over the bytes and report integer
# stats computed FROM THE DECODED arrays. Because the value formula is
# pure integer arithmetic, a DuckDB oracle can recompute the expected
# stats independently — so a decoder bug (wrong padding, missed
# bottom-up flip, BGR mixup, bad chunk walk) produces a hash mismatch,
# not a silently-agreeing round-trip. The weighted checksum (value ×
# flat position) is what makes ORDER bugs visible; plain sums would
# forgive any permutation.
#
# Scale shape: synthesis+encode+decode are all executor-side inside one
# Arrow-batched mapInPandas pass; only the tiny per-doc stat rows leave
# the pass, so the shuffle after it is O(rows), never O(bytes).
# ---------------------------------------------------------------------------

WAV_STATS_SCHEMA = (
    "doc_id long, n_frames long, n_channels long, rate long, "
    "n_units long, sum_v long, min_v long, max_v long, wsum long"
)

IMAGE_STATS_SCHEMA = (
    "doc_id long, height long, width long, "
    "n_units long, sum_v long, min_v long, max_v long, wsum long"
)


def wav_decode_stats(doc_df: DataFrame) -> DataFrame:
    """Synthesize a genuine PCM WAV per doc (8-bit when doc_id%3==0 else
    16-bit; mono/stereo by doc_id%2; rate 8000+4000*(doc_id%3)), then
    REAL-decode it and emit integer stats over the decoded samples.
    Frame/channel/rate columns come from the decoded header, not the
    synthesis parameters — the header parse is under test too."""
    from streaming_data_ingestion_spark.multimodal.codecs import (
        decode_wav,
        encode_wav,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                k.split()[0]: [] for k in WAV_STATS_SCHEMA.split(", ")
            }
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                channels = doc_id % 2 + 1
                m = (doc_id % 37 + 8) * channels
                k = np.arange(m, dtype=np.int64)
                mixed = doc_id * 2654435761 + k * 40503
                if doc_id % 3 == 0:
                    vals = (mixed % 256).astype(np.uint8)
                else:
                    vals = (mixed % 65536 - 32768).astype(np.int16)
                payload = encode_wav(
                    vals,
                    sample_rate=8000 + (doc_id % 3) * 4000,
                    channels=channels,
                )
                arr, rate = decode_wav(payload)  # REAL container parse
                flat = arr.astype(np.int64).ravel()  # interleaved order
                pos = np.arange(flat.size, dtype=np.int64)
                out["doc_id"].append(doc_id)
                out["n_frames"].append(arr.shape[0])
                out["n_channels"].append(arr.shape[1])
                out["rate"].append(rate)
                out["n_units"].append(flat.size)
                out["sum_v"].append(int(flat.sum()))
                out["min_v"].append(int(flat.min()))
                out["max_v"].append(int(flat.max()))
                out["wsum"].append(int((pos * flat).sum()))
            yield pd.DataFrame(out)

    return doc_df.select("doc_id").mapInPandas(batches, schema=WAV_STATS_SCHEMA)


def image_decode_stats(doc_df: DataFrame) -> DataFrame:
    """Synthesize a genuine image container per doc — BMP for even
    doc_id (exercising row padding + bottom-up BGR rows), binary PPM for
    odd — with pixel (y,x,c) = (doc_id*31 + y*17 + x*7 + c*3) % 256,
    then REAL-decode and emit integer pixel stats. Height/width come
    from the decoded array, and the position-weighted checksum pins the
    raster order (a missed vertical flip or BGR swap changes wsum)."""
    from streaming_data_ingestion_spark.multimodal.codecs import (
        decode_bmp,
        decode_ppm,
        encode_bmp,
        encode_ppm,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                k.split()[0]: [] for k in IMAGE_STATS_SCHEMA.split(", ")
            }
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                h, w = doc_id % 3 + 2, doc_id % 5 + 2
                y, x, c = np.meshgrid(
                    np.arange(h, dtype=np.int64),
                    np.arange(w, dtype=np.int64),
                    np.arange(3, dtype=np.int64),
                    indexing="ij",
                )
                rgb = ((doc_id * 31 + y * 17 + x * 7 + c * 3) % 256).astype(
                    np.uint8
                )
                if doc_id % 2 == 0:
                    arr = decode_bmp(encode_bmp(rgb))  # REAL parse
                else:
                    arr = decode_ppm(encode_ppm(rgb))  # REAL parse
                flat = arr.astype(np.int64).ravel()  # row-major y,x,c
                pos = np.arange(flat.size, dtype=np.int64)
                out["doc_id"].append(doc_id)
                out["height"].append(arr.shape[0])
                out["width"].append(arr.shape[1])
                out["n_units"].append(flat.size)
                out["sum_v"].append(int(flat.sum()))
                out["min_v"].append(int(flat.min()))
                out["max_v"].append(int(flat.max()))
                out["wsum"].append(int((pos * flat).sum()))
            yield pd.DataFrame(out)

    return doc_df.select("doc_id").mapInPandas(
        batches, schema=IMAGE_STATS_SCHEMA
    )


FRAME_SCHEMA = "doc_id long, frame_idx int, frame binary, frame_bytes long"


def sample_frames(
    binary_df: DataFrame, n_frames: int = 4, frame_bytes: int = 32
) -> DataFrame:
    """Frame-sampling stub for video-ish payloads: emit ``n_frames``
    evenly-spaced fixed-size slices per payload (a real impl seeks
    keyframes with a video codec; the dataflow — one binary row in,
    k binary rows out, 1:k fan-out inside mapInPandas — is identical).

    The fan-out happens executor-side within the Arrow batch, so a
    payload's frames never pass through the driver and the output
    partitioning follows the input (no shuffle until a consumer asks
    for one).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                if n == 0:
                    continue
                step = max(n // n_frames, 1)
                for k in range(min(n_frames, n)):
                    start = k * step
                    ids.append(doc_id)
                    idxs.append(k)
                    frames.append(bytes(payload[start : start + frame_bytes]))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame": frames,
                    "frame_bytes": [len(f) for f in frames],
                }
            )

    return binary_df.mapInPandas(batches, schema=FRAME_SCHEMA)
