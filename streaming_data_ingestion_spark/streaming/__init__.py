"""Structured Streaming pipelines.

- ``ingest``   — the reference pipeline rebuilt end-to-end (decode →
  flatten → key synthesis → checkpointed append sink)
- ``windows``  — watermarked tumbling/sliding/session aggregations and
  streaming dedup
- ``stateful`` — arbitrary per-key state with applyInPandasWithState
"""
