from __future__ import annotations

import os

import duckdb
import pytest

from streaming_data_ingestion_spark.session import get_spark
from streaming_data_ingestion_spark.tables import TABLES

# Local gate runs at sf0.001 for speed; set SDI_TEST_SF_DIR=/root/testdata/sf0.01
# to reproduce the driver's exact scale.
SF_DIR = os.environ.get("SDI_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="sdi-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()
