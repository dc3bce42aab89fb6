"""Multimodal columns: opaque binary payloads + typed metadata (north-star
mandate, SURVEY.md §2B "(non-oracle) multimodal columns").

Model: media travels as a ``binary`` column next to a metadata struct
(mime, width/height or duration, byte length, content digest). Decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators — per-partition, streaming batches, no
driver involvement.

The image/audio codec libraries are not in this container, so the actual
pixel/sample decode is STUBBED (clearly marked below): real-codec calls
raise NotImplementedError; tests exercise a deterministic fake
("decode" = byte histogram features) so the Spark-side plumbing — schema,
batch iteration, partitioning, output shape — is real and tested. On a
cluster with codecs installed, only the marked inner functions change.

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


def _decode_real(payload: bytes) -> np.ndarray:  # pragma: no cover
    """STUB — real decoder. On a cluster with codecs installed, replace
    with e.g. PIL.Image.open(io.BytesIO(payload)) / soundfile.read(...)."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use fake=True for the deterministic test decoder"
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
