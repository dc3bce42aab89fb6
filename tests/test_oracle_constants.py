"""Guard against the q_pagerank round-10 defect class: DECIMAL-literal
arithmetic inside oracle SQL.

In DuckDB a numeric literal like ``0.85`` is DECIMAL, so ``1.0 - 0.85``
is decimal-exact 0.15 — while the Spark side computes the same constant
in IEEE double (0.15000000000000002). When the two results round to
different doubles, the oracle and the query disagree by an ulp that
final rounding usually absorbs — until some scale/magnitude crosses a
rounding boundary (q_pagerank diverged on 6 of 4761 nodes ONLY at sf1).

This test statically extracts every literal-op-literal arithmetic pair
from every registered oracle, evaluates it both ways (decimal-exact →
double vs double IEEE), and fails on any divergence. The fix for a hit
is the one _pr_sql uses: emit ``CAST('<repr of the Python double>' AS
DOUBLE)`` so both engines start from the identical double.

Single literals multiplying a DOUBLE column are fine: DECIMAL→DOUBLE
promotion of a short literal is the nearest double, same as parsing the
literal as a double directly (the documented DuckDB mis-rounding is for
high-scale decimals like DECIMAL(38,18), which the house VARCHAR-hop
idiom already covers).
"""

from __future__ import annotations

import re
from decimal import Decimal, getcontext

from streaming_data_ingestion_spark.registry import all_queries

# two decimal literals joined by an arithmetic operator; (?<![\w.'"]) and
# (?![\w.'"]) exclude identifiers, string contents like '0.5.1', and
# already-quoted repr constants
_PAIR = re.compile(
    r"(?<![\w.'\"])(\d+\.\d+)\s*([-+*/])\s*(\d+\.\d+)(?![\w.'\"])"
)


def _binds(op: str, tail: str) -> bool:
    """Does the matched pair actually combine under SQL precedence?
    ``a - b * c`` matches the regex on (a, -, b) but never computes
    a-b: when the op is +/- and the SECOND literal is immediately
    followed by * or /, the pair does not bind."""
    if op in "+-":
        nxt = tail.lstrip()
        if nxt[:1] in ("*", "/"):
            return False
    return True


def test_no_decimal_literal_arithmetic_divergence():
    getcontext().prec = 60
    bad = {}
    for name, spec in sorted(all_queries().items()):
        if not spec.oracle:
            continue
        for m in _PAIR.finditer(spec.oracle):
            a, op, b = m.groups()
            if not _binds(op, spec.oracle[m.end():]):
                continue
            da, db = Decimal(a), Decimal(b)
            fa, fb = float(a), float(b)
            dec = {
                "+": da + db,
                "-": da - db,
                "*": da * db,
                "/": da / db if db else None,
            }[op]
            dbl = {
                "+": fa + fb,
                "-": fa - fb,
                "*": fa * fb,
                "/": fa / fb if fb else None,
            }[op]
            if dec is None:
                continue
            if float(dec) != dbl:
                bad.setdefault(name, []).append(m.group(0))
    assert not bad, (
        "oracle SQL computes these constants in DECIMAL while Spark "
        "computes them in IEEE double, and the results are different "
        f"doubles — emit CAST('<repr>' AS DOUBLE) instead: {bad}"
    )
