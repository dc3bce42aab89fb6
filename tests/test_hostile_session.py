"""Hostile-session robustness: registered queries must produce
oracle-identical results regardless of the caller's session configuration.

The registry wrapper pins the session timezone to UTC per call (DuckDB
reads parquet timestamps as naive-UTC); this test sets a pathological
timezone + tiny shuffle width and asserts timestamp-sensitive queries
still match the oracle cell-exactly.
"""

from __future__ import annotations

import pytest

from streaming_data_ingestion_spark.registry import all_queries

from .conftest import SF_DIR
from .test_oracle import _cells_equal, _normalize, _sort_rows

# timestamp-extraction and windowing queries are the timezone-sensitive set
HOSTILE_CHECKED = (
    "q_date_funcs",
    "q_stream_tumbling",
    "q_cast_types",
    "q_sessionize",  # emits raw timestamps + gap decisions on event time
    "q_tpch_q1",  # timestamp-literal cutoff + decimal aggregate hash
    "q_tpch_q5",  # timestamp range predicates riding a 6-table join
    "q_seq_pack",  # window ordering must not depend on shuffle width
    "q_join_interval",  # to_date + date_trunc + unix_micros grid cells
    "q_seasonality",  # epoch-day DOW bucket from event time
    "q_changepoint",  # daily bucketing + running window
    "q_rfm",  # recency day-diff against the corpus max ts
    "q_cohort_matrix",  # week truncation of event time
    "q_rolling_active",  # day truncation + date_add window ends
    "q_burstiness",  # unix_micros gaps under a hostile timezone
    "q_seasonal_decompose",  # day buckets + epoch-day dow under hostile tz
    "q_zorder_scan",  # timestamp→DATE cast in the layout + date literals
    "q_join_asof_fwd",  # emits raw timestamps matched across event roles
    "q_join_asof_nearest",  # dual-direction carries + tie-break on raw ts
    "q_late_events",  # prefix-max carry must not depend on shuffle width
    "q_join_asof_tol",  # raw ts output + integer-µs staleness gate
    "q_conversion_pairs",  # to_date day rollup + interval arithmetic
    "q_sax_symbolize",  # to_date daily buckets + LEAD over day order
    "q_session_length_hist",  # unix_micros gap decisions
    "q_forecast_eval",  # to_date + date_sub lag joins
    "q_psi_drift",  # ts→double epoch split must be tz-independent
    "q_new_vs_returning",  # to_date first-seen + timestamp-cast day output
    "q_kendall_tau",  # to_date daily buckets feeding exact comparisons
    "q_theil_sen",  # to_date buckets + datediff day gaps in slopes
    "q_group_linreg",  # datediff against a DATE literal origin
    "q_winsorized_mean",  # global-rank cuts must not depend on shuffle width
    "q_bucketed_join",  # 8-bucket stored layout vs a 3-partition session:
    #                     bucketed-scan parallelism must not change sums
    "q_ann_gen_probe",  # full-probe/full-rerank through a published
    #                     generation: exact top-k must be independent of
    #                     the trained quantizer AND the shuffle width
)


@pytest.mark.parametrize("name", HOSTILE_CHECKED)
def test_query_survives_hostile_session(name, spark, ddb):
    spec = all_queries()[name]
    before_tz = spark.conf.get("spark.sql.session.timeZone")
    before_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        spark_pdf = spec.fn(spark, SF_DIR).toPandas()
        duck_pdf = ddb.execute(spec.oracle).df()
        assert len(spark_pdf) == len(duck_pdf)
        s = _sort_rows(_normalize(spark_pdf))
        d = _sort_rows(_normalize(duck_pdf))
        for col in s.columns:
            for a, b in zip(s[col].tolist(), d[col].tolist()):
                assert _cells_equal(a, b), f"{name}.{col}: {a!r} != {b!r}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", before_tz)
        spark.conf.set("spark.sql.shuffle.partitions", before_sp)


# queries whose implementations touch physical-layout machinery (range
# exchanges, monotonically_increasing_id, salting, skew handling) — the
# set where an AQE re-plan could silently change behavior if the
# implementation depended on a specific partitioning
AQE_SENSITIVE = (
    "q_late_events",  # range exchange + spark_partition_id carry
    "q_rfm",  # distributed NTILE via partition-offset ranks
    "q_histogram_equidepth",  # same ranking machinery
    "q_join_salted",  # explicit salting beside AQE's own skew split
    "q_sample_stratified",  # exact-fraction sampler over partition stats
    "q_emb_covariance",  # self-join keyed on a generated id
)


@pytest.mark.parametrize("name", AQE_SENSITIVE)
def test_query_survives_aqe_off(name, spark, ddb):
    """Results must be identical with adaptive execution disabled: the
    operators may RELY on AQE for speed (skew splits, coalescing) but
    never for correctness."""
    spec = all_queries()[name]
    before = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        spark_pdf = spec.fn(spark, SF_DIR).toPandas()
        duck_pdf = ddb.execute(spec.oracle).df()
        assert len(spark_pdf) == len(duck_pdf)
        s = _sort_rows(_normalize(spark_pdf))
        d = _sort_rows(_normalize(duck_pdf))
        for col in s.columns:
            for a, b in zip(s[col].tolist(), d[col].tolist()):
                assert _cells_equal(a, b), f"{name}.{col}: {a!r} != {b!r}"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", before)
