"""streaming_data_ingestion_spark — a PySpark-native analytics engine.

Rebuilds the capabilities of the reference pipeline
(nikhilgy/streaming-data-ingestion, surveyed in /root/repo/SURVEY.md) as an
idiomatic Spark DataFrame/SQL/Structured-Streaming engine, and extends it
with the full analytics + LLM-data-pipeline operator surface declared in
SURVEY.md §2B.

Layout:
- ``session``    — SparkSession factory (AQE, Arrow, UTC, sane shuffle width)
- ``tables``     — parquet fixture loaders / catalog registration
- ``registry``   — query registry binding Spark callables to DuckDB oracles
- ``queries/``   — one module per operator family (the §2B inventory)
- ``sources/``   — batch/streaming source connectors (file-JSON, rate, HTTP, Kafka)
- ``streaming/`` — Structured Streaming pipelines (ingest parity, windows, state)
- ``multimodal/``— binary-column (image/audio) plumbing with stubbed decoders
"""

__version__ = "0.1.0"
