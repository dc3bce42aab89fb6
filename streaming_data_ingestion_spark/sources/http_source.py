"""HTTP/REST batch DataSource (reference parity: R1).

The reference fetches one random user per call from a REST API on the
driver (/root/reference/dags/kafka-streamer.py:16-19) and reshapes the
nested JSON in Python (:25-31). Spark has no built-in HTTP source, so this
implements the PySpark 4 custom ``DataSource`` API: each partition fetches
its share of records executor-side, so ingest parallelism scales with
partitions instead of a single driver loop.

Tests run with ``mode=offline`` — a deterministic generator producing
randomuser-shaped nested records from a seed — because the test image has
no network. The reshape (nested → flat wire record) is the same Spark-side
``select`` either way; see :func:`flatten_user_records`.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # PySpark 4 Python DataSource API
    from pyspark.sql.datasource import DataSource, DataSourceReader

    HAS_DATASOURCE_API = True
except ImportError:  # pragma: no cover - older PySpark
    DataSource = object  # type: ignore[assignment,misc]
    DataSourceReader = object  # type: ignore[assignment,misc]
    HAS_DATASOURCE_API = False

# The nested API shape (subset we consume —
# /root/reference/dags/kafka-streamer.py:26-31).
USER_API_SCHEMA = T.StructType(
    [
        T.StructField(
            "name",
            T.StructType(
                [
                    T.StructField("first", T.StringType()),
                    T.StructField("last", T.StringType()),
                ]
            ),
        ),
        T.StructField("gender", T.StringType()),
        T.StructField(
            "location",
            T.StructType(
                [
                    T.StructField(
                        "street",
                        T.StructType(
                            [
                                T.StructField("number", T.IntegerType()),
                                T.StructField("name", T.StringType()),
                            ]
                        ),
                    ),
                    T.StructField("city", T.StringType()),
                    T.StructField("state", T.StringType()),
                    T.StructField("country", T.StringType()),
                    T.StructField("postcode", T.StringType()),
                ]
            ),
        ),
        T.StructField("email", T.StringType()),
        T.StructField("phone", T.StringType()),
    ]
)

_FIRST = ("ada", "grace", "alan", "edsger", "barbara", "donald", "tony", "leslie")
_LAST = ("lovelace", "hopper", "turing", "dijkstra", "liskov", "knuth", "hoare")
_CITY = ("london", "zurich", "austin", "amsterdam", "boston", "pittsburgh")


def _fake_user(i: int) -> dict:
    """Deterministic randomuser-shaped record (offline mode)."""
    first = _FIRST[i % len(_FIRST)]
    last = _LAST[(i // len(_FIRST)) % len(_LAST)]
    # every ~7th postcode is alphanumeric, like UK postcodes — the case the
    # reference's LongType declaration silently nulls out
    postcode = f"E{i % 99} {i % 9}AB" if i % 7 == 0 else str(10000 + i)
    return {
        "name": {"first": first, "last": last},
        "gender": ("female", "male")[i % 2],
        "location": {
            "street": {"number": 100 + i, "name": f"{_CITY[i % len(_CITY)]} road"},
            "city": _CITY[i % len(_CITY)],
            "state": f"state{i % 13}",
            "country": f"country{i % 5}",
            "postcode": postcode,
        },
        "email": f"{first}.{last}{i}@example.com",
        "phone": f"+1-555-{i:07d}",
    }


if HAS_DATASOURCE_API:

    class RandomUserDataSource(DataSource):
        """`spark.read.format("randomuser")` after registration.

        Options: ``numRows`` (total records), ``numPartitions`` (fetch
        parallelism), ``mode`` (``offline`` = deterministic generator;
        ``http`` = live REST calls executor-side, requires network).
        """

        @classmethod
        def name(cls) -> str:
            return "randomuser"

        def schema(self):
            return USER_API_SCHEMA

        def reader(self, schema):
            return _RandomUserReader(self.options)

        def simpleStreamReader(self, schema):
            return _RandomUserStreamReader(self.options)

    class _RandomUserReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("numRows", 10))
            self.parts = int(options.get("numPartitions", 2))
            if self.parts < 1:
                raise ValueError(
                    f"randomuser: numPartitions must be >= 1, got {self.parts}"
                )
            self.mode = options.get("mode", "offline")
            self.url = options.get("url", "https://randomuser.me/api/")

        def partitions(self):
            from pyspark.sql.datasource import InputPartition

            per = (self.n + self.parts - 1) // self.parts
            return [
                InputPartition((p * per, min((p + 1) * per, self.n)))
                for p in range(self.parts)
            ]

        def read(self, partition):
            lo, hi = partition.value
            if self.mode == "offline":
                for i in range(lo, hi):
                    yield _to_row(_fake_user(i))
            else:  # pragma: no cover - needs network
                import requests

                for _ in range(lo, hi):
                    rec = requests.get(self.url, timeout=10).json()["results"][0]
                    rec["location"]["postcode"] = str(rec["location"]["postcode"])
                    yield _to_row(rec)


if HAS_DATASOURCE_API:
    from pyspark.sql.datasource import SimpleDataSourceStreamReader

    class _RandomUserStreamReader(SimpleDataSourceStreamReader):
        """`spark.readStream.format("randomuser")` — the reference's
        30-second driver polling loop
        (/root/reference/dags/kafka-streamer.py:38-49) re-expressed as an
        offset-tracked streaming source: each micro-batch emits
        ``rowsPerBatch`` records and advances a monotonic record counter,
        so restarts resume from the checkpointed offset instead of
        re-ingesting (the reference re-reads the whole topic on every
        restart — SURVEY.md §4.1).
        """

        def __init__(self, options):
            self.per_batch = int(options.get("rowsPerBatch", 10))
            self.mode = options.get("mode", "offline")
            self.url = options.get("url", "https://randomuser.me/api/")

        def initialOffset(self):
            return {"i": 0}

        def read(self, start):
            lo = start["i"]
            hi = lo + self.per_batch
            return iter(self._rows(lo, hi)), {"i": hi}

        def readBetweenOffsets(self, start, end):
            # Deterministic replay for recovery in offline mode (the rows
            # are a pure function of the offset range). In http mode this
            # necessarily re-FETCHES — a live random API cannot replay the
            # original records, so recovery there is at-least-once with
            # divergent payloads; exactly-once over live HTTP requires an
            # archive-the-fetch layer between the API and the source
            # (which is what the offline generator stands in for).
            return iter(self._rows(start["i"], end["i"]))

        def _rows(self, lo: int, hi: int):
            if self.mode == "offline":
                return [_to_row(_fake_user(i)) for i in range(lo, hi)]
            import requests  # pragma: no cover - needs network

            out = []
            for _ in range(lo, hi):  # pragma: no cover
                rec = requests.get(self.url, timeout=10).json()["results"][0]
                rec["location"]["postcode"] = str(rec["location"]["postcode"])
                out.append(_to_row(rec))
            return out


def _to_row(u: dict) -> tuple:
    return (
        (u["name"]["first"], u["name"]["last"]),
        u["gender"],
        (
            (u["location"]["street"]["number"], u["location"]["street"]["name"]),
            u["location"]["city"],
            u["location"]["state"],
            u["location"]["country"],
            str(u["location"]["postcode"]),
        ),
        u["email"],
        u["phone"],
    )


def register(spark: SparkSession) -> bool:
    """Register the custom source; returns False if the API is missing."""
    if not HAS_DATASOURCE_API:
        return False
    spark.dataSource.register(RandomUserDataSource)
    return True


def flatten_user_records(df: DataFrame) -> DataFrame:
    """Nested API record → flat wire record (engine-side reshape).

    Spark-native equivalent of the reference's Python dict building
    (/root/reference/dags/kafka-streamer.py:25-31): concat_ws for
    full_name and address, struct projection for the leaves. The
    irregular separator in the reference's address format (`"{}, {},
    {},{}, {}"`) is an accident, normalized to ", " here (SURVEY.md R5).
    """
    return df.select(
        F.concat_ws(" ", F.col("name.first"), F.col("name.last")).alias("full_name"),
        F.col("gender"),
        F.concat_ws(
            ", ",
            F.col("location.street.number").cast("string"),
            F.col("location.street.name"),
            F.col("location.city"),
            F.col("location.state"),
            F.col("location.country"),
        ).alias("address"),
        F.col("location.postcode").cast("string").alias("postcode"),
        F.col("email"),
        F.col("phone"),
    )


def fake_users_json_lines(n: int) -> list[str]:
    """JSON-lines wire payloads for ingest tests (producer-side shape,
    /root/reference/dags/kafka-streamer.py:45)."""
    out = []
    for i in range(n):
        u = _fake_user(i)
        out.append(
            json.dumps(
                {
                    "full_name": f"{u['name']['first']} {u['name']['last']}",
                    "gender": u["gender"],
                    "address": (
                        f"{u['location']['street']['number']}, "
                        f"{u['location']['street']['name']}, "
                        f"{u['location']['city']}, {u['location']['state']}, "
                        f"{u['location']['country']}"
                    ),
                    "postcode": str(u["location"]["postcode"]),
                    "email": u["email"],
                    "phone": u["phone"],
                }
            )
        )
    return out
