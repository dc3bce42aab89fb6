"""Cross-engine determinism helpers.

The driver hash-compares Spark results against DuckDB values, so floating
aggregates must be *bit-identical* across engines — "close" fails the hash.
Double summation is order-dependent, and Spark's partial/final aggregation
order differs from DuckDB's, so we never hash a raw ``SUM(double)``.

The pattern (used by every aggregate query):

1. **Row-level math stays in DOUBLE.** IEEE-754 ops on identical inputs are
   bit-identical in any engine: ``l_extendedprice * (1 - l_discount)`` is
   safe per row.
2. **Aggregation goes through DECIMAL(38,10).** Casting each double to a
   fixed-point decimal and summing is exact and order-independent, so both
   engines produce the same decimal regardless of partitioning. At 100 TB
   this costs nothing extra — decimal sums are still a single-pass partial
   aggregate with map-side combine.
3. **The result is cast back to DOUBLE** (one exact-decimal→nearest-double
   conversion — identical in both engines), so the output schema stays
   simple and matches DuckDB's.

Averages are ``decimal-sum → double → / count`` — a single deterministic
IEEE division, not the engine's own AVG (DuckDB's AVG accumulates in double
and would drift).

One more trap (hit by q_burstiness): step 2's double→DECIMAL cast is only
engine-identical while the double fits 2⁵³. Above that (e.g., squared
microsecond gaps ~1e24) DuckDB's cast introduces sub-ULP error that
Spark's exact BigDecimal path does not, so the decimal sums diverge. For
products of large integers, stay in INTEGER arithmetic instead: Spark
``DECIMAL(18,0) × DECIMAL(18,0)`` (widens to (37,0)) ≙ DuckDB
``HUGEINT × HUGEINT`` — exact on both sides, then one correctly-rounded
integer→double conversion at the end.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,10)"


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent SUM of a double column, emitted as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum, one double division."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(F.lit(1))).alias(alias)


def sql_dec_to_double(expr: str) -> str:
    """DuckDB decimal→double that is *correctly rounded*.

    DuckDB's direct ``CAST(DECIMAL AS DOUBLE)`` double-rounds (int128 value
    and 10^scale are converted separately, then divided), which can be off
    by one ULP vs Spark's single-rounded BigDecimal→double. Routing through
    VARCHAR uses DuckDB's correctly-rounded string→double parser, matching
    Spark bit-for-bit. (Verified empirically: 374446791.61 direct-casts to
    ...60999995 but parses exactly.)
    """
    return f"CAST(CAST({expr} AS VARCHAR) AS DOUBLE)"


def sql_dsum(expr: str, alias: str) -> str:
    """DuckDB-side twin of :func:`dsum`."""
    return f"{sql_dec_to_double(f'SUM(CAST({expr} AS DECIMAL(38,10)))')} AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return (
        f"{sql_dec_to_double(f'SUM(CAST({expr} AS DECIMAL(38,10)))')}"
        f" / COUNT(*) AS {alias}"
    )
