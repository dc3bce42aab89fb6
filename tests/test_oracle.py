"""Local replica of the driver's DuckDB correctness gate.

For every registered query: run the Spark callable and the DuckDB oracle on
the same parquet fixtures, then compare row count, column names, and values
(order-insensitive, columns sorted by name) — the same contract the driver's
CORRECTNESS_r{N}.json records. Values must match EXACTLY (bit-level for
floats): queries are built for cross-engine determinism (see compat.py), and
this test is what proves it.
"""

from __future__ import annotations

import decimal
import math

import numpy as np
import pandas as pd
import pytest

from streaming_data_ingestion_spark.registry import all_queries

from tests.conftest import SF_DIR

SPECS = all_queries()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Make both engines' pandas outputs comparable cell-by-cell."""
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        s = df[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[col] = s.astype("datetime64[us]")
        elif s.dtype == object:
            df[col] = s.map(
                lambda v: float(v) if isinstance(v, decimal.Decimal) else v
            )
        elif pd.api.types.is_float_dtype(s) and s.dtype != np.float64:
            df[col] = s.astype(np.float64)
        elif pd.api.types.is_integer_dtype(s) and s.dtype != np.int64:
            df[col] = s.astype("Int64")
    return df


def _sort_rows(df: pd.DataFrame) -> pd.DataFrame:
    if len(df.columns) == 0 or len(df) == 0:
        return df.reset_index(drop=True)
    key = df.apply(
        lambda row: tuple(repr(v) for v in row), axis=1
    )
    return df.iloc[key.argsort(kind="mergesort").to_numpy()].reset_index(drop=True)


def _cells_equal(a, b) -> bool:
    if isinstance(a, (list, tuple, np.ndarray)) or isinstance(
        b, (list, tuple, np.ndarray)
    ):
        # array-valued cell: compare element-wise (numpy `==` would yield
        # an ambiguous-truth array), still bit-exact per element
        a_l = list(a) if isinstance(a, (list, tuple, np.ndarray)) else [a]
        b_l = list(b) if isinstance(b, (list, tuple, np.ndarray)) else [b]
        return len(a_l) == len(b_l) and all(
            _cells_equal(x, y) for x, y in zip(a_l, b_l)
        )
    if a is None or (isinstance(a, float) and math.isnan(a)):
        return b is None or (isinstance(b, float) and math.isnan(b))
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    if pd.isna(a) is True and pd.isna(b) is True:
        return True
    return a == b


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, ddb):
    spec = SPECS[name]
    sdf = spec.fn(spark, SF_DIR)

    if spec.oracle is not None:
        # Driver-canonicalizer contract: the harness sorts the result frame
        # with pandas sort_values over all columns, so a list/dict-typed
        # cell raises "unhashable type" and the key records an ERROR, not
        # a mismatch (this killed q_pq_encode/q_emb_quantize in round 4).
        # Every oracled query must therefore emit scalar columns only —
        # serialize arrays with array_join/to_json (see q_agg_collect).
        from pyspark.sql.types import ArrayType, BinaryType, MapType, StructType

        for f in sdf.schema.fields:
            assert not isinstance(
                f.dataType, (ArrayType, MapType, StructType, BinaryType)
            ), (
                f"{name}.{f.name} is {f.dataType.simpleString()}: oracled "
                "queries must return scalar columns (serialize with "
                "array_join/to_json so the driver canonicalizer can hash it)"
            )

    spark_pdf = sdf.toPandas()

    if spec.oracle is None:
        # Rows-only contract: the query must at least execute and produce
        # a stable schema.
        assert spark_pdf is not None
        assert len(sdf.columns) > 0
        return

    duck_pdf = ddb.execute(spec.oracle).df()

    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"duck={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )

    # Strict-ish schema check: numeric kind AND width must agree (the
    # driver may hash raw buffers; int32-vs-int64 or int-vs-float on the
    # same column is a latent hash mismatch). datetime resolution differs
    # by engine (ns vs us) and is normalized by both harnesses.
    for col in sorted(spark_pdf.columns):
        a, b = spark_pdf[col].dtype, duck_pdf[col].dtype
        ka, kb = a.kind, b.kind
        if "M" in (ka, kb):
            assert ka == kb, f"{name}.{col}: datetime vs {b}"
            continue
        assert (ka, getattr(a, "itemsize", 0)) == (kb, getattr(b, "itemsize", 0)), (
            f"{name}.{col}: dtype mismatch spark={a} duck={b}"
        )

    s = _sort_rows(_normalize(spark_pdf))
    d = _sort_rows(_normalize(duck_pdf))
    for col in s.columns:
        sv, dv = s[col].tolist(), d[col].tolist()
        bad = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(sv, dv))
            if not _cells_equal(a, b)
        ]
        assert not bad, f"{name}.{col}: first mismatches {bad[:5]}"
