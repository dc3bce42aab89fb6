"""Operator inventory (SURVEY.md §2B) — importing this package registers
every query into :mod:`streaming_data_ingestion_spark.registry`."""

from streaming_data_ingestion_spark.queries import (  # noqa: F401
    aggregates,
    event_analytics,
    basket,
    functions_scalar,
    joins,
    layout_q,
    lifecycle,
    llm_dedup,
    llm_pipeline,
    llm_quality,
    llm_similarity,
    llm_text,
    multimodal_q,
    relational,
    sketches,
    stats,
    stats_tests,
    streaming_analogs,
    subqueries,
    tpch,
    tpch_full,
    tpcds_shapes,
    udfs,
    windows,
)
