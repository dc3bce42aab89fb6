"""Guard against the q_pagerank round-10 defect class: DECIMAL-literal
arithmetic inside oracle SQL.

In DuckDB a numeric literal like ``0.85`` is DECIMAL, so ``1.0 - 0.85``
(and ``1 - 0.85`` — integer-decimal pairs promote to DECIMAL too) is
decimal-exact 0.15 — while the Spark side computes the same constant in
IEEE double (0.15000000000000002). When the two results round to
different doubles, the oracle and the query disagree by an ulp that
final rounding usually absorbs — until some scale/magnitude crosses a
rounding boundary (q_pagerank diverged on 6 of 4761 nodes ONLY at sf1).

This test statically extracts every literal-op-literal arithmetic pair
that SQL PRECEDENCE actually combines from every registered oracle,
evaluates it both ways (decimal-exact → double vs double IEEE), and
fails on any divergence. The fix for a hit is the one _pr_sql uses:
emit ``CAST('<repr of the Python double>' AS DOUBLE)`` so both engines
start from the identical double.

The scanner is deliberately conservative in ONE direction only: a pair
whose first literal is preceded by an arithmetic operator is skipped
(left-associativity steals it: ``col * 1.1 + 2.2`` never computes
1.1+2.2), which can also skip a unary-minus pair like ``(-0.5 + 1.5)``
— a missed check there, never a false failure. Pairs hidden behind a
rejected overlap (``0.5 - 1.1 * 2.2`` really computes 1.1*2.2) ARE
found: scanning is zero-width, so matches may overlap.

Single literals multiplying a DOUBLE column are fine: DECIMAL→DOUBLE
promotion of a short literal is the nearest double, same as parsing the
literal as a double directly (the documented DuckDB mis-rounding is for
high-scale decimals like DECIMAL(38,18), which the house VARCHAR-hop
idiom already covers).
"""

from __future__ import annotations

import re
from decimal import Decimal, localcontext

from streaming_data_ingestion_spark.registry import all_queries

# zero-width scan so overlapping pairs are all seen; operands may be
# integer or decimal literals; (?<![\w.'"]) / (?![\w.'"]) exclude
# identifiers, string contents, and already-quoted repr constants
_PAIR = re.compile(
    r"(?=(?<![\w.'\"])(\d+(?:\.\d+)?)\s*([-+*/%])\s*(\d+(?:\.\d+)?)(?![\w.'\"]))"
)
_ARITH = set("+-*/%")


def _literal_pairs(sql: str):
    """Yield (a, op, b) literal pairs that SQL left-associative
    precedence actually combines."""
    for m in _PAIR.finditer(sql):
        a, op, b = m.group(1), m.group(2), m.group(3)
        if "." not in a and "." not in b:
            continue  # int-op-int never involves DECIMAL rounding
        start = m.start(1) if m.start(1) != -1 else m.start()
        before = sql[:start].rstrip()
        prev = before[-1] if before else ""
        # which preceding operator steals the FIRST literal?
        # - a +/- pair loses it to ANY arithmetic op on the left
        #   (col*1.1+2.2 => (col*1.1)+2.2; col+1.1+2.2 => (col+1.1)+2.2)
        # - a */% pair loses it only to same-precedence ops
        #   (col/1.1*2.2 => (col/1.1)*2.2 — but a - 1.1*2.2 computes
        #   1.1*2.2 first, so +/- on the left does NOT steal)
        if op in "+-" and prev in _ARITH:
            continue
        if op in "*/%" and prev in ("*", "/", "%"):
            continue
        tail = sql[start:]
        m2 = re.match(
            r"(\d+(?:\.\d+)?)\s*([-+*/%])\s*(\d+(?:\.\d+)?)(.*)",
            tail,
            re.DOTALL,
        )
        rest = m2.group(4).lstrip() if m2 else ""
        # +/- loses its second literal to a following higher-precedence
        # op: 1.0 - 0.85 * x computes 0.85*x first
        if op in "+-" and rest[:1] in ("*", "/", "%"):
            continue
        yield a, op, b


def _diverges(a: str, op: str, b: str) -> bool:
    """True when decimal-exact evaluation rounds to a different double
    than IEEE-double evaluation."""
    with localcontext() as ctx:
        ctx.prec = 60
        da, db = Decimal(a), Decimal(b)
        fa, fb = float(a), float(b)
        if op == "/" and fb == 0:
            return False
        if op == "%":
            return False  # SQL mod on literals is integer-exact here
        dec = {"+": da + db, "-": da - db, "*": da * db, "/": da / db}[op]
        dbl = {"+": fa + fb, "-": fa - fb, "*": fa * fb, "/": fa / fb}[op]
        return float(dec) != dbl


def test_scanner_catches_the_known_shapes():
    """Self-test: the scanner must flag the defect shapes the round-10
    review enumerated, and not false-fail the innocent ones."""
    # the original q_pagerank defect
    assert list(_literal_pairs("(1.0 - 0.85) / n")) == [("1.0", "-", "0.85")]
    # integer-decimal promotes to DECIMAL in DuckDB too
    assert list(_literal_pairs("(1 - 0.85) * x")) == [("1", "-", "0.85")]
    # the pair hidden behind a rejected overlap IS found
    assert ("1.1", "*", "2.2") in list(_literal_pairs("0.5 - 1.1 * 2.2"))
    assert ("0.5", "-", "1.1") not in list(_literal_pairs("0.5 - 1.1 * 2.2"))
    # left-assoc steals the first literal: no pair computed
    assert list(_literal_pairs("col * 1.1 + 2.2")) == []
    assert list(_literal_pairs("col + 1.1 + 2.2")) == []
    # flesch-style precedence: a - b*(x) does not combine a and b
    assert list(_literal_pairs("206.835 - 1.015 * (w / s)")) == []
    # quoted repr constants are exempt (the sanctioned fix)
    assert list(_literal_pairs("CAST('0.15000000000000002' AS DOUBLE)")) == []
    # divergence math
    assert _diverges("1.0", "-", "0.85")
    assert _diverges("1.1", "*", "2.2")
    assert not _diverges("1.0", "-", "0.5")  # dyadic: exact both ways


def test_no_decimal_literal_arithmetic_divergence():
    bad = {}
    for name, spec in sorted(all_queries().items()):
        if not spec.oracle:
            continue
        for a, op, b in _literal_pairs(spec.oracle):
            if _diverges(a, op, b):
                bad.setdefault(name, []).append(f"{a} {op} {b}")
    assert not bad, (
        "oracle SQL computes these constants in DECIMAL while Spark "
        "computes them in IEEE double, and the results are different "
        f"doubles — emit CAST('<repr>' AS DOUBLE) instead: {bad}"
    )
