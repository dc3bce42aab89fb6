"""Streaming ANN-index maintenance: fold newly-arriving vectors into the
stored cell-partitioned IVFPQ index without rebuilding it.

The batch builders (ml/ivfpq.py, queries/llm_similarity.py's
deterministic-quantizer twin) write the index once. A growing corpus
needs the NEXT step of the index lifecycle: each micro-batch of vectors
is assigned to the EXISTING coarse centroids (the quantizer is frozen —
exactly how production IVF indexes ingest; re-training centroids is a
separate, rare OPTIMIZE-style rebuild), PQ-encoded with the same
deterministic codebooks, and appended into the cell partitions.

Exactly-once: rows are appended under a ``cell=X/__epoch=E`` partition
layout with per-write dynamic partition overwrite — a replayed epoch
re-delivers the identical assignment (frozen centroids + deterministic
codes make the batch a pure function of its input), and the dynamic
overwrite replaces exactly that epoch's slices instead of duplicating
them (the streaming/ingest.py epoch_overwrite_writer discipline; the
house rule applies — the option rides on the WRITE, never on the
cloned session's conf). Probes are unaffected: ``cell`` remains the
leading partition column, so PartitionFilters prune exactly as before
and readers that select (vec_id, cell, codes, embedding) never see the
epoch column.

The maintained invariant (pinned by tests/test_streaming.py): after any
sequence of micro-batches with replays injected anywhere, the stored
index holds EXACTLY the rows a one-shot build over the cumulative
vector set would hold (same cells, same codes, same vectors) — so any
probe result is identical to probing a freshly-built index.

Reader/writer race: a probe that lists the index directory while an
epoch write is in flight could observe a TORN epoch — some cell
partitions already renamed into place, others still pending (Spark's
per-partition commit is not atomic across partitions, and there is no
table-format transaction log under plain parquet). The fix is the
minimal version-log discipline: the writer drops a driver-side commit
marker ``_commits/epoch=E`` only AFTER the whole epoch's parquet write
returns, and consistent readers go through ``read_committed_index``,
which pins ``__epoch <= last_committed_epoch(path)`` — a partition
filter, so the in-flight epoch's files are pruned without being read.
A probe therefore sees either the pre-epoch or the post-epoch index,
never a mix; and because a replayed epoch is a pure function of its
input, re-running the interrupted epoch heals any torn slices via the
dynamic partition overwrite (pinned by
tests/test_streaming.py::test_ann_fold_in_probe_never_sees_torn_epoch).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

_COMMITS_DIR = "_commits"  # leading "_" => invisible to parquet readers


def assign_to_centroids(
    vectors: DataFrame, centroids: list[tuple[int, list[float]]]
) -> DataFrame:
    """(vec_id, cell, codes, embedding): assign each vector to its
    nearest frozen centroid by cosine (ties to the lower centroid id —
    the q_sim_ivf rule) and PQ-encode it. ``centroids`` is the frozen
    quantizer: a list of (centroid_id, embedding) collected at
    base-index build time (K rows — rides in the task closure as
    literals, no join needed)."""
    from streaming_data_ingestion_spark.queries.llm_similarity import (
        _cos,
        pq_encode_df,
    )

    best_id, best_sim = None, None
    emb = F.col("embedding")
    for cid, cvec in centroids:
        c = F.array(*[F.lit(float(x)) for x in cvec])
        sim = _cos(emb, c)
        if best_id is None:
            best_id, best_sim = F.lit(cid), sim
        else:
            take = (sim > best_sim) | (
                (sim == best_sim) & (F.lit(cid) < best_id)
            )
            best_id = F.when(take, F.lit(cid)).otherwise(best_id)
            best_sim = F.when(take, sim).otherwise(best_sim)
    assigned = vectors.select(
        "vec_id", best_id.cast("long").alias("cell"), "embedding"
    )
    coded = pq_encode_df(
        assigned.select(
            "vec_id", "cell", F.col("embedding").alias("emb_keep"), "embedding"
        )
    )
    return coded.select(
        "vec_id", "cell", "codes", F.col("emb_keep").alias("embedding")
    )


def fold_in_writer(
    index_path: str, centroids: list[tuple[int, list[float]]]
):
    """foreachBatch writer: assign + encode this batch against the
    frozen quantizer and land it under cell=…/__epoch=… with dynamic
    partition overwrite (replay-idempotent by construction)."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        rows = assign_to_centroids(batch_df, centroids).withColumn(
            "__epoch", F.lit(int(epoch_id))
        )
        (
            rows.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("cell", "__epoch")
            .parquet(index_path)
        )
        mark_epoch_committed(index_path, int(epoch_id))

    return write_batch


def mark_epoch_committed(index_path: str, epoch_id: int) -> None:
    """Drop the epoch's commit marker. Called only after the epoch's
    parquet write has fully returned, so the marker's existence implies
    every cell slice of the epoch is renamed into place."""
    commits = os.path.join(index_path, _COMMITS_DIR)
    os.makedirs(commits, exist_ok=True)
    open(os.path.join(commits, f"epoch={epoch_id}"), "w").close()


def last_committed_epoch(index_path: str) -> int:
    """Highest epoch with a commit marker; -1 when none committed yet."""
    commits = os.path.join(index_path, _COMMITS_DIR)
    try:
        names = os.listdir(commits)
    except OSError:
        return -1
    epochs = [
        int(n.split("=", 1)[1])
        for n in names
        if n.startswith("epoch=") and n.split("=", 1)[1].isdigit()
    ]
    return max(epochs, default=-1)


def read_committed_index(spark: SparkSession, index_path: str) -> DataFrame:
    """Consistent snapshot of the folded index: only rows of committed
    epochs. ``__epoch`` is a partition column, so the bound is a
    PartitionFilter — an in-flight (torn) epoch's directories are pruned
    before any of its files are opened. Columns match what the batch
    probes read: (vec_id, cell, codes, embedding)."""
    cap = last_committed_epoch(index_path)
    return (
        spark.read.parquet(index_path)
        .filter(F.col("__epoch") <= F.lit(cap))
        .select("vec_id", "cell", "codes", "embedding")
    )


def maintain_ann_index(
    vectors_stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    centroids: list[tuple[int, list[float]]],
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously fold a vector stream into the stored IVFPQ index.
    Probe the result with queries/llm_similarity.ivfpq_probe-style
    readers — ``cell`` stays the leading partition column."""
    writer = (
        vectors_stream.writeStream.foreachBatch(
            fold_in_writer(index_path, centroids)
        )
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
