"""Multi-format batch source/sink helpers: CSV, JSON-lines, ORC.

The reference ingests exactly one wire format (Kafka JSON,
/root/reference/spark-streaming.py:150-171); a complete engine must also
round-trip the interchange formats an analytics user brings. Shared
discipline across all three:

- **Schema is declared, never inferred** on read. Inference costs an extra
  full pass at 100 TB and is non-deterministic under sampling; every reader
  here takes an explicit StructType (or reuses a written table's known
  schema).
- **Columnar formats keep pushdown.** ORC scans support predicate pushdown
  and column pruning exactly like parquet (asserted in
  tests/test_sources.py); CSV/JSON are row formats — fine for interchange,
  wrong for the 100 TB hot path, which is why the writers default to an
  explicit compression codec and the docstrings steer bulk data to
  parquet/ORC.
- **Writers are partition-aware**: every writer accepts ``partition_cols``
  so a converted dataset lands with the same pruning layout
  (layout.write_partitioned) the parquet path uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Spark's default text-format timestamp pattern carries milliseconds only;
# fixture event times are microsecond-precision, so every text write/read
# pins a microsecond pattern or the round-trip silently truncates.
_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def write_csv(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
    compression: str = "gzip",
) -> None:
    """CSV with header; quotes/escapes left at Spark defaults (RFC-ish).

    CSV cannot carry types — the matching reader must re-declare the
    schema. Timestamps are written as ISO-8601 so the declared-schema
    read restores them losslessly.
    """
    w = (
        df.write.mode(mode)
        .option("header", True)
        .option("compression", compression)
        .option("timestampFormat", _TS_FMT)
    )
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.csv(path)


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Declared-schema CSV read (no inference pass, deterministic types)."""
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("timestampFormat", _TS_FMT)
        .csv(path)
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
    compression: str = "gzip",
) -> None:
    """JSON-lines (one object per line) — the LLM-corpus interchange
    format. Nested structs/arrays survive; timestamps are ISO-8601."""
    w = (
        df.write.mode(mode)
        .option("compression", compression)
        .option("timestampFormat", _TS_FMT)
    )
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Declared-schema JSON-lines read; malformed lines become NULL rows
    (PERMISSIVE) instead of failing the job — audit them with the
    q_json_malformed pattern, don't crash a 100 TB read."""
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("timestampFormat", _TS_FMT)
        .json(path)
    )


def write_orc(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
    compression: str = "zstd",
) -> None:
    """ORC: the columnar alternative when the consumer is Hive/Trino-side.
    Keeps min/max stride statistics → predicate pushdown on read."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC read — schema travels in the file footer (self-describing, no
    declaration needed), pushdown/pruning supplied by the ORC reader."""
    return spark.read.orc(path)


def read_parquet_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read across schema generations (``mergeSchema``).

    A long-lived 100 TB table accretes columns: files written before a
    column existed simply lack it, and the unified read must surface it
    as NULL for those rows instead of failing or silently dropping the
    column (the default read takes one file's footer as THE schema).
    ``mergeSchema`` unions all footers — pay its listing cost only on
    tables that actually evolve; stable tables keep the cheap
    single-footer default.
    """
    return spark.read.option("mergeSchema", True).parquet(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Media-file ingestion via Spark's built-in ``binaryFile`` source:
    one row per file with (path, modificationTime, length, content).

    This is the real on-ramp for the multimodal pipeline
    (multimodal/binary_ops.py): raw image/audio/video files on object
    storage become binary rows WITHOUT a driver-side listing loop — the
    file index distributes, and ``pathGlobFilter`` prunes by extension
    at listing time (no content read for skipped files).

    Scale notes: each file is one row, read whole — the source is for
    media objects (KB–MB), not for concatenated archives; cap partition
    weight with ``spark.sql.files.maxPartitionBytes`` so a partition of
    blobs fits executor memory. Files larger than
    ``spark.sql.sources.binaryFile.maxLength`` (default 2 GiB) fail
    loudly rather than truncate.
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path)


def binary_files_to_docs(files: DataFrame) -> DataFrame:
    """Adapt a ``binaryFile`` DataFrame to the multimodal document shape
    (doc_id, payload, meta{mime, n_bytes, digest}) consumed by
    multimodal/binary_ops.py.

    doc_id is content-addressed (first 15 hex digits of the payload
    sha256 — 15, not 16: 16 hex digits can exceed a signed long and
    conv().cast('long') would wrap negative
    sha256) so re-ingesting the same object store prefix — or the same
    file moved between prefixes — yields stable ids and digest-dedup
    (multimodal digest grouping) works across ingest runs. The mime
    guess is extension-based at this layer (cheap, prune-friendly);
    real type sniffing belongs in the decode operator where the bytes
    are already in hand.
    """
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    mime = (
        F.when(ext.isin("jpg", "jpeg"), "image/jpeg")
        .when(ext == "png", "image/png")
        .when(ext == "wav", "audio/wav")
        .when(ext == "mp3", "audio/mpeg")
        .when(ext == "mp4", "video/mp4")
        .otherwise("application/octet-stream")
    )
    digest = F.sha2(F.col("content"), 256)
    return files.select(
        F.conv(F.substring(digest, 1, 15), 16, 10).cast("long").alias("doc_id"),
        F.col("content").alias("payload"),
        F.struct(
            mime.alias("mime"),
            F.col("length").cast("long").alias("n_bytes"),
            digest.alias("digest"),
        ).alias("meta"),
        F.col("path").alias("source_path"),
    )


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    """XML interchange writer (Spark 4 built-in ``xml`` format — no
    external package). XML is a wire/interchange format like CSV: fine
    at the edges, wrong for the 100 TB hot path (row format, no
    pushdown, verbose) — the docstring contract is convert-on-ingest.
    Timestamps pin the microsecond pattern (_TS_FMT) like every text
    format here."""
    (
        df.write.mode(mode)
        .format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .option("timestampFormat", _TS_FMT)
        .save(path)
    )


def read_xml(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    row_tag: str = "row",
) -> DataFrame:
    """Declared-schema XML read (no inference pass, per module rule)."""
    return (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .option("timestampFormat", _TS_FMT)
        .schema(schema)
        .load(path)
    )
