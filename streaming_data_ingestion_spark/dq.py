"""Declarative data-quality checks compiled into ONE aggregate pass
(the Deequ shape: rules in, violation censuses out).

``q_dq_audit`` (queries/relational.py) is the fixed star-schema audit;
this module is the reusable engine behind such gates: a caller declares
rules against any frame and every row-local rule compiles to a
conditional-count expression inside a SINGLE ``agg`` — one scan, one
partial+final aggregate, no matter how many rules. Uniqueness rides the
same aggregate as ``count - count_distinct``. Referential integrity is
the one rule that genuinely needs a second relation; it runs as an
ANTI-join count (broadcast when the dimension fits), never a
driver-side lookup.

At 100 TB the difference between this and a rule-per-query harness is
N full scans vs one: a 40-rule contract over a day's partition costs
the same as a count(*).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """A named violation census. ``violations`` is a boolean row-local
    expression — True means the row VIOLATES the rule."""

    name: str
    violations: Column
    unique_col: str | None = None  # set for uniqueness rules


def not_null(col: str) -> Rule:
    return Rule(f"{col}_null", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Rule:
    return Rule(
        f"{col}_out_of_range",
        F.col(col).isNotNull() & ~F.col(col).between(lo, hi),
    )


def matches(col: str, pattern: str) -> Rule:
    return Rule(
        f"{col}_pattern",
        F.col(col).isNotNull() & ~F.col(col).rlike(pattern),
    )


def accepted_values(col: str, values: list) -> Rule:
    return Rule(
        f"{col}_domain",
        F.col(col).isNotNull() & ~F.col(col).isin(*values),
    )


def unique(col: str) -> Rule:
    # counted as (rows − distinct values) inside the same aggregate;
    # the violations expression is unused for this rule kind
    return Rule(f"{col}_dup", F.lit(False), unique_col=col)


def custom(name: str, violation_expr: Column) -> Rule:
    return Rule(name, violation_expr)


def check(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """ONE aggregate over one scan: n_rows plus a violation counter per
    rule (column name = rule name)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for r in rules:
        if r.unique_col is not None:
            aggs.append(
                (F.count(r.unique_col) - F.count_distinct(r.unique_col))
                .cast("bigint")
                .alias(r.name)
            )
        else:
            aggs.append(
                F.sum(F.when(r.violations, 1).otherwise(0))
                .cast("bigint")
                .alias(r.name)
            )
    return df.agg(*aggs)


def ref_integrity(
    fact: DataFrame, fact_col: str, dim: DataFrame, dim_col: str
) -> DataFrame:
    """Orphan census: fact rows whose key has no parent in ``dim`` —
    an ANTI join count (AQE broadcasts the dim side when it fits)."""
    orphans = fact.join(
        dim.select(F.col(dim_col).alias("__dq_key")).distinct(),
        fact[fact_col] == F.col("__dq_key"),
        "left_anti",
    )
    return orphans.agg(
        F.count(F.lit(1)).cast("bigint").alias(f"{fact_col}_orphans")
    )


def report(df: DataFrame, rules: list[Rule]) -> dict:
    """Collect the one-row census as a dict (driver-side: one row)."""
    return check(df, rules).collect()[0].asDict()


def assert_valid(df: DataFrame, rules: list[Rule]) -> dict:
    """Raise with the exact failing counters if any rule has
    violations; return the (clean) report otherwise — the pipeline-gate
    call site."""
    rep = report(df, rules)
    bad = {
        k: v for k, v in rep.items() if k != "n_rows" and v and v > 0
    }
    if bad:
        raise AssertionError(f"data-quality violations: {bad}")
    return rep


def observed(df: DataFrame, rules: list[Rule], name: str = "dq") -> DataFrame:
    """Attach the rule counters as OBSERVED METRICS — the zero-cost
    streaming form: ``df.observe`` computes the same conditional
    counters as ``check`` during whatever job already runs (no extra
    scan, batch or streaming) and emits them through the query-progress
    listener per micro-batch (captured by
    streaming/metrics.QueryProgressCollector as ``observed_metrics``).

    Uniqueness rules are rejected: observed metrics must be
    deterministic non-distinct aggregates (Spark's restriction), and a
    per-batch distinct count is not the contract anyway — run ``check``
    on the materialized table for that.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for r in rules:
        if r.unique_col is not None:
            raise ValueError(
                f"rule {r.name}: uniqueness cannot be an observed metric "
                "(distinct aggregates are not allowed in observe(); run "
                "dq.check on the stored table instead)"
            )
        aggs.append(
            F.sum(F.when(r.violations, 1).otherwise(0))
            .cast("bigint")
            .alias(r.name)
        )
    return df.observe(name, *aggs)
