"""Fixture-table access.

The driver materializes a TPC-H-ish star schema plus ``events`` /
``documents`` / ``embeddings`` as one parquet file per table under
``/root/testdata/sf*/`` (schemas: /root/repo/FIXTURES.md). Everything here
is a plain ``spark.read.parquet`` — columnar scan with predicate pushdown
and column pruning supplied by Catalyst; no custom readers needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

# Paths already scheduled for atexit removal (one registration each).
_ARTIFACT_CLEANUP: set[str] = set()


def artifact_path(name: str) -> str:
    """Absolute, per-process path for a process-BUILT stored artifact
    (merged histogram / CMS grid / Z-ordered or OPTIMIZE-rewritten copy /
    IVFPQ index) under the repo's ``spark-warehouse/``.

    Two properties matter, both flagged by review of the serving paths:

    * ABSOLUTE, derived from the package location — a cwd-relative
      ``spark-warehouse/`` silently lands the artifact wherever the
      calling process happens to run from;
    * PER-PROCESS (pid suffix) — bench.py and the round driver run
      concurrently on the same box and both build these artifacts; with
      a shared path one process can ``rmtree`` or read the table while
      the other is mid-way through its multi-epoch merge build, which is
      either a flaky failure or (worse) a partially-merged grid passing
      through the hash check. A pid-unique path makes the build
      single-writer by construction; ``atexit`` removes it so builds
      don't accumulate across runs.
    """
    import atexit
    import os
    import shutil

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wh = os.path.join(root, "spark-warehouse")
    if not _ARTIFACT_CLEANUP:
        # first call this process: sweep orphans left by processes that
        # died without running atexit (SIGKILL'd pytest, timed-out
        # drivers). A _p<pid> suffix whose pid is no longer alive is
        # definitionally garbage — no live process can be mid-build in it.
        try:
            for entry in os.listdir(wh):
                stem, _, pid_s = entry.rpartition("_p")
                if not (stem and pid_s.isdigit()):
                    continue
                pid = int(pid_s)
                if pid == os.getpid():
                    continue
                try:
                    os.kill(pid, 0)  # alive? leave it alone
                except ProcessLookupError:
                    shutil.rmtree(os.path.join(wh, entry), ignore_errors=True)
                except PermissionError:
                    pass  # alive under another uid — leave it
        except OSError:
            pass
    path = os.path.join(wh, f"{name}_p{os.getpid()}")
    if path not in _ARTIFACT_CLEANUP:
        _ARTIFACT_CLEANUP.add(path)
        atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


def _parquet_has_nanos_ts(path: str) -> bool:
    """Probe the parquet footer: does any column carry TIMESTAMP(NANOS)?

    Spark's vectorized reader refuses nanosecond timestamps
    ([PARQUET_TYPE_ILLEGAL]) unless ``spark.sql.legacy.parquet.nanosAsLong``
    is on; that conf is session-global and would also corrupt later reads
    of *other* nanos files into raw longs, so it must only be enabled when
    this file actually needs it. Footer read is a metadata-only operation.
    """
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
        return any(getattr(t, "unit", None) == "ns" for t in schema.types)
    except Exception:
        # directory datasets / unreadable footer: fall back to enabling the
        # legacy conf (matches the only generation that needs it).
        return True


def normalize_event_time(df: DataFrame) -> DataFrame:
    """Normalize every event-time column to the session-zoned TIMESTAMP type.

    ``events.ts`` has shipped in two physical forms across driver testdata
    generations: TIMESTAMP(NANOS) (read as raw nanos longs under
    ``nanosAsLong`` and truncated to microseconds here) and naive
    TIMESTAMP(MICROS) (which Spark 4 infers as TIMESTAMP_NTZ; the NTZ→LTZ
    cast is the identity on wall values under the UTC session pinned in
    session.py). Shared by the batch loader AND the streaming reader
    (sources/json_stream.read_events_stream) so batch and stream always see
    the identical event-time type — ``withWatermark`` requires TIMESTAMP,
    and the batch-equivalence tests require equal values.
    """
    for f_ in df.schema.fields:
        tname = f_.dataType.typeName()
        if f_.name == "ts" and tname == "long":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif tname == "timestamp_ntz":
            df = df.withColumn(f_.name, F.col(f_.name).cast("timestamp"))
    return df


# Lazy-plan memo: (appId, abs path, mtime_ns) -> DataFrame. Building a
# reader is pure driver-side overhead paid per builder call (JVM
# DataFrameReader + file listing + footer schema read + the
# normalize_event_time analysis round-trips) — ~0.1 s per call that the
# bench's timed span repays for every key on every pass. The memo reuses
# the immutable lazy plan; every EXECUTION of it still scans the parquet
# freshly (nothing here caches data or results). Keys carry the file
# mtime so an in-process fixture rebuild (make_scale_fixtures) is picked
# up, and the application id so a stopped/restarted session can never
# serve plans bound to a dead JVM context.
_LOAD_MEMO: dict[tuple[str, str, int], tuple[bool, DataFrame]] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Parquet scan → pushdown/pruning for free.

    Event-time columns are normalized to one stable TIMESTAMP type (see
    normalize_event_time) with wall values identical to what DuckDB reads
    (it treats the column as naive microseconds either way).
    """
    import os

    path = f"{sf_dir}/{name}.parquet"
    try:
        key = (
            spark.sparkContext.applicationId,
            os.path.abspath(path),
            os.stat(path).st_mtime_ns,
        )
    except Exception:
        key = None
    if key is not None and key in _LOAD_MEMO:
        needs_nanos, df = _LOAD_MEMO[key]
        if needs_nanos:
            # conf is session-global and another load may have flipped it
            # back; re-assert so the cached plan's scan stays readable
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return df
    needs_nanos = name == "events" and _parquet_has_nanos_ts(path)
    if needs_nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = normalize_event_time(spark.read.parquet(path))
    if key is not None:
        if len(_LOAD_MEMO) > 256:  # many sf_dirs in one long session
            _LOAD_MEMO.clear()
        _LOAD_MEMO[key] = (needs_nanos, df)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL API."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


# Logical-plan node names whose presence means the DataFrame's
# partitioning is no longer scan-determined (an explicit repartition, or
# an operator that will shuffle to spark.sql.shuffle.partitions anyway)
# — widening on top of these would add a useless shuffle.
_NOT_SCAN_GOVERNED = ("Repartition", "Join", "Aggregate", "Window", "Sort")


def _size_in_bytes(conf_value: str) -> int:
    """Parse a Spark byte-size conf string ('134217728b', '128MB', ...)."""
    s = conf_value.strip().lower()
    for suffix, mult in (
        ("tb", 1024**4), ("gb", 1024**3), ("mb", 1024**2), ("kb", 1024),
        ("t", 1024**4), ("g", 1024**3), ("m", 1024**2), ("k", 1024),
        ("b", 1),
    ):
        if s.endswith(suffix):
            return int(float(s[: -len(suffix)])) * mult
    return int(float(s))


def spread_for_cpu(df: DataFrame) -> DataFrame:
    """Widen a DataFrame to the cluster's parallelism IF its scan arrives
    narrower — for CPU-dominant narrow passes (shingling, per-element
    vector folds) whose cost dwarfs one round-robin shuffle of the input.

    A 100 TB scan already arrives in thousands of row-group splits, so
    this is a no-op there (the conditional matters: an unconditional
    repartition would be a pointless full shuffle at scale). Small
    fixtures, however, are single-row-group files — the scan cannot be
    split below one row group no matter how maxPartitionBytes is tuned,
    and a 64-hash-per-row pass would serialize onto one core.

    The probe is metadata-only and AQE-safe: scan parallelism is
    ESTIMATED as Σ input-file bytes / maxPartitionBytes (``inputFiles``
    walks the analyzed plan's file indices without launching a job or
    forcing physical planning — ``df.rdd.getNumPartitions()`` would
    plan outside AQE per call). Plans whose partitioning is not
    scan-governed (explicit repartition, or a shuffle-introducing
    operator already present) and non-local storage schemes (whose scans
    arrive block-split at cluster scale) are left untouched.
    """
    import math
    import os
    from urllib.parse import unquote, urlparse

    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    plan = df._jdf.queryExecution().analyzed().toString()
    if any(tok in plan for tok in _NOT_SCAN_GOVERNED):
        return df
    files = df.inputFiles()
    if not files:
        return df
    total = 0
    for f in files:
        u = urlparse(f)
        if u.scheme not in ("", "file"):
            return df
        total += os.stat(unquote(u.path)).st_size
    max_split = _size_in_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
    )
    if max(1, math.ceil(total / max_split)) < target:
        # Deterministic HASH repartition instead of keyless round-robin:
        # a keyless repartition(n) first SORTS each input partition
        # (spark.sql.execution.sortBeforeRepartition, on by default since
        # SPARK-23207, so retried tasks reproduce their row→partition
        # assignment) — and here the input is by construction ONE narrow
        # partition, so that sort is a single-task full-table sort before
        # any parallelism exists. Hashing the row content (xxhash64 over
        # every column) is deterministic under retry without the sort;
        # fixture rows are key-unique, so the spread is uniform
        # (documented caveat: a frame that is mostly duplicate rows would
        # co-locate its duplicates — no such caller exists).
        return df.repartition(target, F.xxhash64(*df.columns))
    return df
