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


def _dtok(v: float) -> str:
    """One SQL double literal token, exact: repr() is the shortest
    round-tripping decimal form and Spark's literal parser is correctly
    rounded, so the parsed double is bit-identical to F.lit(v)."""
    f = float(v)
    if f != f or f in (float("inf"), float("-inf")):
        raise ValueError(f"non-finite literal {v!r} needs F.lit")
    return f"{f!r}D"


def dlit_array(vals) -> Column:
    """Literal ARRAY<DOUBLE> via ONE SQL parse.

    ``F.lit(list)`` / ``F.array(*[F.lit(v) ...])`` walk py4j per element
    (~0.5–1 ms each — a 640-element plane table costs ~1.5 s on every
    plan build); parsing one ``array(...)`` expression measured ~300×
    faster with bit-identical values (see _dtok). Use for all
    driver-side numeric model literals (planes, centroids, ADC tables)."""
    return F.expr("array(" + ",".join(_dtok(v) for v in vals) + ")")


def dlit_matrix(rows) -> Column:
    """Literal ARRAY<ARRAY<DOUBLE>> via ONE SQL parse (see dlit_array)."""
    inner = ",".join(
        "array(" + ",".join(_dtok(v) for v in row) + ")" for row in rows
    )
    return F.expr(f"array({inner})")


def llit_array(vals) -> Column:
    """Literal integer array via ONE SQL parse (see dlit_array):
    ARRAY<INT> when every value fits in 32 bits (matching what
    ``F.array(*[F.lit(int(v)) ...])`` produced — element_at array
    indices require INT), ARRAY<BIGINT> otherwise."""
    ints = [int(v) for v in vals]
    wide = any(not (-(1 << 31) <= v < (1 << 31)) for v in ints)
    sfx = "L" if wide else ""
    return F.expr("array(" + ",".join(f"{v}{sfx}" for v in ints) + ")")
