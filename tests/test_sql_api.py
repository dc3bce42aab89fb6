"""SQL-API parity: the engine's capabilities are reachable through
``spark.sql`` over the registered temp views, not only through the
DataFrame builders — and produce the IDENTICAL result.

One representative per major family (agg, join, window, dedup, text),
each written in Spark SQL dialect and compared bit-exact against the
registered DataFrame implementation. A drift here means the declarative
surface and the programmatic surface have diverged.
"""

from __future__ import annotations

import pytest

from streaming_data_ingestion_spark.registry import all_queries
from streaming_data_ingestion_spark.tables import register_views

from tests.conftest import SF_DIR

# (registered key, equivalent Spark-dialect SQL over the fixture views)
CASES = {
    "q_agg_group": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*) AS avg_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q_tpch_q6": """
        SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,10))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
}


def _cmp(spark, name, sql):
    got = spark.sql(sql)
    want = all_queries()[name].fn(spark, SF_DIR)
    # compare on the common columns (a SQL spot-check may project fewer)
    common = [c for c in got.columns if c in want.columns]
    assert common, f"{name}: no common columns"
    g = got.select(*sorted(common))
    w = want.select(*sorted(common))
    assert g.count() == w.count(), name
    assert g.exceptAll(w).count() == 0, f"{name}: SQL != DataFrame"
    assert w.exceptAll(g).count() == 0, f"{name}: DataFrame != SQL"


def test_sql_api_matches_dataframe_api(spark):
    register_views(spark, SF_DIR)
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    _cmp(
        spark,
        "q_tpch_q6",
        CASES["q_tpch_q6"],
    )
    # window family: top-3 orders per customer by price, SQL form
    _cmp(
        spark,
        "q_win_topk_per_group",
        """
        SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC,
                                             o_orderkey ASC) AS rk
          FROM orders
        ) WHERE rk <= 3
        """,
    )
    # dedup family: exact dedup keeper in pure SQL
    _cmp(
        spark,
        "q_dedup_exact",
        """
        SELECT sha2(lower(trim(text)), 256) AS digest,
               MIN(doc_id) AS keeper_doc_id,
               COUNT(*) AS n_copies
        FROM documents
        GROUP BY 1
        """,
    )


def test_sql_api_joins_and_aggs_match(spark):
    register_views(spark, SF_DIR)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # the flagship aggregate in pure SQL vs the registered DataFrame query
    got = spark.sql(CASES["q_agg_group"])
    want = all_queries()["q_agg_group"].fn(spark, SF_DIR)
    common = [c for c in got.columns if c in want.columns]
    g = got.select(*sorted(common))
    w = want.select(*sorted(common))
    assert g.exceptAll(w).count() == 0 and w.exceptAll(g).count() == 0


def test_sql_lateral_join_matches_window_topk(spark):
    """LATERAL correlated subquery (Spark 4 SQL surface): per-source top-2
    docs by n_chars must equal the window-function formulation."""
    register_views(spark, SF_DIR)
    lateral = spark.sql("""
        SELECT s.source, l.doc_id, l.n_chars
        FROM (SELECT DISTINCT source FROM documents) s,
        LATERAL (
          SELECT doc_id, n_chars FROM documents d
          WHERE d.source = s.source
          ORDER BY n_chars DESC, doc_id ASC LIMIT 2
        ) l
    """)
    windowed = spark.sql("""
        SELECT source, doc_id, n_chars FROM (
          SELECT source, doc_id, n_chars,
                 ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY n_chars DESC, doc_id ASC) rn
          FROM documents
        ) WHERE rn <= 2
    """)
    assert lateral.exceptAll(windowed).count() == 0
    assert windowed.exceptAll(lateral).count() == 0
    assert lateral.count() > 0
