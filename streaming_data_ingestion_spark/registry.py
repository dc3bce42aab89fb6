"""Query registry.

Every operator from SURVEY.md §2B registers here as a ``QuerySpec``: a
Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible)
the equivalent ANSI SQL string a DuckDB oracle can run on the same parquet.
``__spark_entry__.py`` exposes the registry to the driver's correctness
harness; ``tests/test_oracle.py`` runs the identical comparison locally.

Keeping the Spark code and its oracle side by side in one decorator call is
the discipline that makes the hash-match contract maintainable: rename a
column in one place and the test fails immediately.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Register a query. ``oracle=None`` marks a rows-only (non-SQL) check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The DuckDB oracle reads parquet timestamps as naive-UTC; pin the
            # session so Spark's literals/extractions agree regardless of the
            # caller's session configuration.
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        # lets inspect.unwrap reach the real implementation — the
        # content-digest guard (scripts/keydigest.py) hashes its source
        wrapped.__wrapped__ = fn
        REGISTRY[name] = QuerySpec(
            name=name, fn=wrapped, oracle=oracle, doc=fn.__doc__ or "", tags=tuple(tags)
        )
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    """Import every query module (side effect: populate REGISTRY)."""
    from streaming_data_ingestion_spark import queries  # noqa: F401

    return REGISTRY
