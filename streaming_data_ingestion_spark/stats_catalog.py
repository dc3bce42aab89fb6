"""Optimizer-statistics lifecycle: ANALYZE TABLE → catalog stats → CBO.

At 100 TB the difference between a good and a catastrophic plan is
frequently one number the optimizer did or didn't have: a post-filter
row-count estimate decides broadcast vs shuffle, and join ORDER decides
whether an intermediate is dimension-sized or fact-sized. Spark's
cost-based optimizer only sees those numbers if something collects them —
parquet footers give raw byte sizes, but row counts, per-column NDV,
min/max, and null counts come from ``ANALYZE TABLE`` writing to the
catalog. This module is the collection half of that contract, the piece a
deployment runs after every large load/compaction (the same cadence as
OPTIMIZE in table-format land):

- :func:`analyze_table` — table-level (size, rowCount) and optional
  column-level (NDV/min/max/nulls) statistics in one call;
- :func:`table_stats` / :func:`column_stats` — read back what the
  catalog holds, as plain dicts (monitoring/assertion surface);
- :func:`plan_row_estimate` — the optimizer's row estimate for an
  arbitrary DataFrame, i.e. what CBO will actually plan with.

Scale notes: ``ANALYZE`` is itself a distributed aggregate (one scan;
column NDVs use HLL++ partials), so collecting stats on a 100 TB table
costs one pass — schedule it after bulk loads, not per query. Stats make
broadcast decisions robust where file size lies (high compression,
selective filters): a 9 GB compressed dimension that filters to 2 MB
broadcasts only if the optimizer can estimate the filter's selectivity,
which needs column histograms/NDV.

No reference parity: the reference has no optimizer (292-LoC ingest
glue); this is engine-grade breadth per SURVEY.md §2B north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def analyze_table(
    spark: SparkSession, table: str, columns: tuple[str, ...] = ()
) -> None:
    """Collect table-level (and optionally column-level) statistics into
    the catalog. One distributed scan per call; column NDVs ride the
    same pass as HLL++ partial aggregates."""
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {cols}")


def table_stats(spark: SparkSession, table: str) -> dict:
    """Catalog statistics for a table: {'size_bytes': int|None,
    'row_count': int|None} parsed from DESCRIBE EXTENDED."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    out: dict = {"size_bytes": None, "row_count": None}
    for r in rows:
        if r["col_name"] == "Statistics":
            # e.g. "123456 bytes, 6001 rows"
            for part in r["data_type"].split(","):
                part = part.strip()
                if part.endswith("bytes"):
                    out["size_bytes"] = int(part.split()[0])
                elif part.endswith("rows"):
                    out["row_count"] = int(part.split()[0])
    return out


def column_stats(spark: SparkSession, table: str, column: str) -> dict:
    """Column-level catalog statistics (NDV, nulls, min/max, widths) as a
    {field: value} dict from DESCRIBE EXTENDED table column."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table} {column}").collect()
    return {r["info_name"]: r["info_value"] for r in rows}


def plan_row_estimate(df: DataFrame) -> int | None:
    """The optimizer's row-count estimate for this plan — the number CBO
    joins/broadcasts are decided with. None when the optimizer has no
    estimate (stats never collected)."""
    stats = df._jdf.queryExecution().optimizedPlan().stats()
    opt = stats.rowCount()
    # py4j unwraps scala.math.BigInt to a Python int on some call paths;
    # normalize through str() so both shapes work
    return int(str(opt.get())) if not opt.isEmpty() else None
