"""Fixture catalog: the driver-generated star schema (TESTDATA.md).

Mirrors Arrow's dataset-discovery role (`cpp/src/arrow/dataset/discovery.h`)
for the test fixtures: one parquet per table, loaded lazily so Catalyst
sees a plain file scan it can push filters/projections into.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; known: {TABLES}")
    # The driver runs queries on ITS OWN SparkSession; pin the session tz
    # so timestamp semantics match the (tz-naive) DuckDB oracle regardless
    # of the host JVM default. Runtime conf — safe to set per-read.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _read_events(spark, path)
    return spark.read.parquet(path)


def _read_events(spark: SparkSession, path: str) -> DataFrame:
    """Read the events table, normalizing its TIMESTAMP(NANOS) column.

    Spark has no nanosecond timestamp (Arrow does: type.h TIMESTAMP unit
    ns); per SURVEY §1.2 we normalize physical variants at the I/O
    boundary: read nanos as raw int64, integer-divide to micros (float
    division would lose ulps at 1e18), rebuild TimestampType. The fixture
    data is µs-aligned so this is lossless.
    """
    # Left set for the session: the scan re-checks it lazily at execution.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    dt = df.schema["ts"].dataType
    if isinstance(dt, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(dt, T.TimestampNTZType):
        # NTZ wall-time == UTC instant here because the session tz is pinned
        # UTC (see table()); casting keeps the wall clock and restores the
        # TimestampType the temporal/window/watermark operators require.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table as a lazy DataFrame."""
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all fixture tables as temp views for spark.sql queries."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
