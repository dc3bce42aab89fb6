"""Streaming observability: capture per-micro-batch progress metrics.

The reference has no metrics at all (its only observability was looking
at Kafka Control Center, /root/reference/README.md:44). A production
ingest needs numbers — rows/second, batch duration, watermark lag — and
Structured Streaming already emits them per micro-batch; this module just
collects them queryably.

Driver-side listener, negligible overhead (one dict append per
micro-batch, never per row) — safe at any scale.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class QueryProgressCollector(StreamingQueryListener):
    """Collects one summary dict per micro-batch across all queries.

    Usage::

        collector = QueryProgressCollector.attach(spark)
        ... run streaming queries ...
        collector.progress          # list of per-batch dicts
        collector.totals("my_query")  # rows + seconds for one query
    """

    def __init__(self) -> None:
        self.progress: list[dict] = []

    @classmethod
    def attach(cls, spark: SparkSession) -> "QueryProgressCollector":
        inst = cls()
        spark.streams.addListener(inst)
        return inst

    def detach(self, spark: SparkSession) -> None:
        spark.streams.removeListener(self)

    # StreamingQueryListener interface -----------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.progress.append(
            {
                "name": p.name,
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "duration_ms": (p.durationMs or {}).get("triggerExecution"),
                "event_time": dict(p.eventTime or {}),
                # dq.observed counters (and any other observe() metrics)
                # ride the same progress event: name -> {col: value}
                "observed_metrics": {
                    k: row.asDict()
                    for k, row in dict(p.observedMetrics or {}).items()
                },
                # late-data accounting: how many input rows the watermark
                # dropped this batch (the runtime counterpart of the
                # q_late_events batch audit; sums over stateful operators)
                "rows_dropped_by_watermark": sum(
                    (op.numRowsDroppedByWatermark or 0)
                    for op in (p.stateOperators or [])
                ),
            }
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # convenience ---------------------------------------------------------
    def totals(self, name: str) -> dict:
        rows = [p for p in self.progress if p["name"] == name]
        return {
            "n_batches": len(rows),
            "total_rows": sum(p["num_input_rows"] or 0 for p in rows),
            "total_ms": sum(p["duration_ms"] or 0 for p in rows),
            "total_dropped_by_watermark": sum(
                p.get("rows_dropped_by_watermark") or 0 for p in rows
            ),
        }
