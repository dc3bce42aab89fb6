"""Physical-layout utilities for the 100 TB scale path.

At fixture scale every table is one parquet file; at 100 TB the layout IS
the optimization. Three levers, each exposed as a small helper so jobs can
apply them declaratively:

- **Hive partitioning** (``write_partitioned``): coarse, low-cardinality
  keys (date, source, IVF cell) become directories; a filtered read plans
  ``PartitionFilters`` and never opens non-matching files.
- **Bucketing** (``write_bucketed``): high-cardinality join/agg keys are
  hash-bucketed at write time; a join or groupBy on the bucket key then
  runs shuffle-free, because the layout already satisfies the required
  hash distribution.
- **Salted joins** (``salted_join``): when one key dominates (a hot user,
  an empty-string document), AQE's skew splitting handles the *sort-merge*
  case, but a deliberately salted key spreads the hot partition across N
  reducers for any join shape — the classic explode-small-side/salt-big-
  side rewrite, expressed as a reusable function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Write hive-partitioned parquet: one directory level per key.

    Partition columns should be low-cardinality (≤ ~10k distinct values);
    high-cardinality keys belong in ``write_bucketed`` instead — a
    directory per value would melt the file listing, not speed it up.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Write a hash-bucketed (optionally sorted) table — managed by
    default, external at ``path`` when given (bucketing metadata needs a
    catalog entry either way; ``path`` keeps the FILES under the repo's
    pid-scoped artifact discipline instead of spark-warehouse).

    Joins and aggregations on ``bucket_cols`` between tables bucketed the
    same way plan with zero Exchange operators — the write-time shuffle is
    paid once, every subsequent join is free.
    """
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table, format="parquet")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``n_salts``
    shuffle partitions.

    The big side gets a random salt in [0, n_salts); the small side is
    exploded n_salts× so every (key, salt) pair exists. The join key
    becomes (key, salt): a key that previously landed on one reducer now
    lands on n_salts of them. Use when a specific key's row count is
    orders of magnitude above the median and the join is not broadcast-
    able; otherwise prefer plain joins + AQE skew splitting.

    Join types that preserve unmatched SMALL-side rows (right/full outer)
    are rejected: the small side is exploded n_salts×, so an unmatched
    small row would surface n_salts null-padded times instead of once.
    Big-side-preserving types (inner/left/semi/anti) are unaffected —
    each big row carries exactly one salt.
    """
    _SMALL_PRESERVING = {"right", "rightouter", "right_outer", "full",
                         "fullouter", "full_outer", "outer"}
    if how.lower().replace(" ", "") in _SMALL_PRESERVING:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched small-side "
            "rows n_salts times; use a plain join (+ AQE skew handling) for "
            "right/full outer shapes"
        )
    for side, name in ((big, "big"), (small, "small")):
        if "__salt" in side.columns:
            raise ValueError(
                f"salted_join: {name} side already has a '__salt' column "
                "(drop or rename it first — it would be clobbered)"
            )
    salt = (F.rand(seed=42) * n_salts).cast("int")
    big_salted = big.withColumn("__salt", salt)
    small_salted = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = big_salted.join(small_salted, [key, "__salt"], how)
    return out.drop("__salt")


def write_compacted(
    df: DataFrame,
    path: str,
    target_rows_per_file: int,
    mode: str = "overwrite",
) -> None:
    """Rewrite a dataset into right-sized files — the small-file
    compaction every long-running 100 TB ingest needs.

    Streaming micro-batches and over-parallel writes leave thousands of
    KB-scale files; each costs a footer read + task at every scan, so a
    million-file table spends more time listing than scanning. Compaction
    = one repartition to ⌈rows / target⌉ output tasks, plus
    ``maxRecordsPerFile`` as the hard per-file ceiling so a skewed
    partition still cannot emit a giant file. Run it on cold partitions
    (yesterday's date dir), not the one the stream is appending to.
    """
    df.persist()  # the count and the write must not scan the input twice
    try:
        n_rows = df.count()
        n_files = max(1, -(-n_rows // target_rows_per_file))
        (
            df.repartition(n_files)
            .write.mode(mode)
            .option("maxRecordsPerFile", target_rows_per_file)
            .parquet(path)
        )
    finally:
        df.unpersist()


def zorder_value(cols: list, mins: list, maxs: list, bits: int = 16):
    """Z-order (Morton) key: interleave the bits of each column's
    min-max-normalized rank so rows close in EVERY dimension land close
    in the one-dimensional sort order.

    ``mins``/``maxs`` are the per-column bounds (driver scalars from one
    tiny aggregate). Normalization is linear — adequate for clustering;
    heavy skew can swap in rank-based scaling via
    ranking.with_global_rank without changing the interleave. The
    interleave itself is ~bits×dims shift/or terms, all
    whole-stage-codegen'd.

    ``bits`` is clamped so bits·dims ≤ 63: the interleaved key lives in
    a signed 64-bit long, and letting the top bit reach bit 63 (e.g. 4
    columns at the old default 16) would flip the sign for rows high in
    the last dimension — they'd sort BEFORE everything else and the
    min/max file-skipping contract would silently break (5+ columns
    would additionally wrap Java's mod-64 shifts). Fewer bits per
    dimension only coarsens the clustering granularity, never its
    correctness.
    """
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_value needs at least one column")
    bits = min(bits, 63 // n)
    if bits < 1:
        raise ValueError(f"too many z-order columns ({n}): 63 bits max")
    scale = (1 << bits) - 1
    ints = []
    for c, lo, hi in zip(cols, mins, maxs):
        col = F.col(c) if isinstance(c, str) else c
        span = float(hi) - float(lo)
        if span <= 0:
            ints.append(F.lit(0).cast("long"))
        else:
            ints.append(
                F.least(
                    F.lit(scale),
                    F.floor(
                        (col.cast("double") - float(lo)) / span * scale
                    ).cast("long"),
                )
            )
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(ints):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(
                F.shiftleft(bit.cast("long"), b * n + i)
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered by the Z-order of ``cluster_cols``.

    Hive partitioning prunes on ONE coarse key and bucketing serves ONE
    join key; Z-ordering is the layout for MULTI-dimensional range
    filters: each output file covers a small hyper-rectangle of the key
    space, so parquet footer min/max statistics let a scan skip files
    for a predicate on ANY clustered column (or several at once). One
    bounds aggregate + one range exchange on the z-key; the z column
    itself is dropped before writing.
    """
    bounds = df.agg(
        *[F.min(c).alias(f"_lo_{i}") for i, c in enumerate(cluster_cols)],
        *[F.max(c).alias(f"_hi_{i}") for i, c in enumerate(cluster_cols)],
    ).collect()[0]
    mins = [bounds[f"_lo_{i}"] for i in range(len(cluster_cols))]
    maxs = [bounds[f"_hi_{i}"] for i in range(len(cluster_cols))]
    z = zorder_value(cluster_cols, mins, maxs, bits=bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def optimize_zordered(
    spark,
    path: str,
    cluster_cols: list[str],
    target_rows_per_file: int,
    bits: int = 16,
) -> dict:
    """Table maintenance = compaction + re-clustering in ONE rewrite
    (the OPTIMIZE ... ZORDER BY shape): read the small-file debris a
    streaming sink leaves behind, choose the output file count from the
    actual row count, and land it Z-ordered so the rewritten files are
    simultaneously right-sized AND multi-dimensionally skippable.

    The rewrite lands in a sibling temp dir and swaps in only after it
    is fully written — a crash mid-rewrite leaves the original intact.
    The local-FS swap (rmtree + rename) stands in for what a
    transactional table format (Delta/Iceberg) does with a metadata
    commit; on object stores, swap a view/manifest instead of moving
    files. Run on COLD partitions only, like write_compacted.

    Returns {"n_rows", "files_before", "files_after"} for the
    maintenance log.
    """
    import glob as _glob
    import os as _os
    import shutil as _shutil

    files_before = len(_glob.glob(f"{path}/*.parquet"))
    if files_before == 0 and _glob.glob(f"{path}/*=*"):
        raise ValueError(
            "optimize_zordered operates on an unpartitioned table "
            "directory; for a Hive-partitioned table run it per "
            "partition directory (the cold-partition maintenance unit)"
        )
    df = spark.read.parquet(path).persist()
    try:
        n_rows = df.count()
        n_files = max(1, -(-n_rows // target_rows_per_file))
        tmp = path.rstrip("/") + ".__optimize_tmp__"
        write_zordered(df, tmp, cluster_cols, n_files, bits=bits)
    finally:
        df.unpersist()
    _shutil.rmtree(path)
    _os.rename(tmp, path)
    return {
        "n_rows": n_rows,
        "files_before": files_before,
        "files_after": len(_glob.glob(f"{path}/*.parquet")),
    }
