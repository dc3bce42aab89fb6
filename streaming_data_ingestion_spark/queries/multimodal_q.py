"""Driver-visible multimodal query (rows-only contract).

The multimodal operators (multimodal/binary_ops.py) run Arrow-batched
``mapInPandas`` over binary payloads — per-row Python byte munging that no
ANSI SQL reproduces, so this registers under the contract's rows-only
escape hatch (``__spark_entry__.py``: omit from ``oracle_sql()``): the
driver still executes the full pipeline and records row count + schema
stability. The deterministic fake decoder stands in for real codecs (see
binary_ops.py for the stub boundary); everything Spark-side — schema,
Arrow batching, partition-following fan-out — is the real dataflow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_ingestion_spark.multimodal.binary_ops import (
    attach_binary,
    extract_features,
)
from streaming_data_ingestion_spark.registry import query
from streaming_data_ingestion_spark.tables import load


@query("q_multimodal_features", oracle=None, tags=("multimodal",))
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload pipeline end-to-end: wrap documents as opaque
    payload + metadata struct, then decode/feature-extract per Arrow
    batch and summarize the features per source.

    The summary aggregate keeps the driver-checked output small and
    stable while still forcing the full mapInPandas pass to execute.
    """
    d = load(spark, sf_dir, "documents")
    feats = extract_features(attach_binary(d))
    return (
        feats.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
            F.countDistinct("digest").alias("n_distinct_payloads"),
            F.sum(F.element_at("feat", 7)).alias("sum_bin6"),
        )
    )


@query(
    "q_multimodal_meta",
    oracle="""
SELECT
  source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
  CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes,
  CAST(COUNT(DISTINCT sha256(text)) AS BIGINT) AS n_distinct_payloads
FROM documents
GROUP BY source
""",
    tags=("multimodal",),
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-first multimodal accounting, oracle-checked: byte volume
    and content-addressed distinct-payload counts per source, computed
    entirely from the binary wrapper's metadata struct — the pass a media
    pipeline runs BEFORE any decode (prune by size/dup/digest first; only
    survivors pay codec CPU).

    Unlike q_multimodal_features (rows-only: Arrow decode is per-row
    Python), everything here is engine-side (octet_length / sha2 over the
    payload), so DuckDB can verify it cell-exactly — the metadata half of
    the multimodal surface gets the full correctness gate.
    """
    d = load(spark, sf_dir, "documents")
    b = attach_binary(d).join(d.select("doc_id", "source"), "doc_id")
    return b.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("meta.n_bytes")).cast("bigint").alias("total_bytes"),
        F.max(F.col("meta.n_bytes")).cast("bigint").alias("max_bytes"),
        F.countDistinct(F.col("meta.digest")).alias("n_distinct_payloads"),
    )
