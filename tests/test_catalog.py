"""Catalog DDL surface: CTAS + views compose with the registered tables."""

from __future__ import annotations

import uuid

from streaming_data_ingestion_spark.catalog import (
    create_database,
    create_or_replace_view,
    create_table_as,
)
from streaming_data_ingestion_spark.tables import register_views

from tests.conftest import SF_DIR


def test_ctas_and_view_roundtrip(spark):
    db = f"cat_{uuid.uuid4().hex[:8]}"
    register_views(spark, SF_DIR)
    try:
        create_database(spark, db)
        create_table_as(
            spark,
            f"{db}.daily_counts",
            """SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
               FROM events GROUP BY 1, 2""",
        )
        mat = spark.table(f"{db}.daily_counts")
        want = spark.sql(
            "SELECT COUNT(*) FROM (SELECT DISTINCT CAST(ts AS DATE), event_type FROM events)"
        ).collect()[0][0]
        assert mat.count() == want

        create_or_replace_view(
            spark,
            f"{db}.busy_days",
            f"SELECT day, SUM(n) AS total FROM {db}.daily_counts GROUP BY day HAVING SUM(n) > 0",
        )
        v = spark.table(f"{db}.busy_days")
        assert v.count() == mat.select("day").distinct().count()
        # view re-resolves: replacing it changes results without rewrite
        create_or_replace_view(
            spark, f"{db}.busy_days", f"SELECT day FROM {db}.daily_counts LIMIT 1"
        )
        assert spark.table(f"{db}.busy_days").count() == 1
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
