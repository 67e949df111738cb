"""Helpers for loading the star-schema test tables.

Tables (see TESTDATA.md / FIXTURES.md §B): region nation customer
supplier part orders lineitem events documents embeddings — one parquet
file per table under a scale-factor directory.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
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

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Plain ``spark.read.parquet`` so Catalyst gets a
    pushdown-capable FileScan (predicates + column pruning reach the
    parquet reader).

    ``events.ts`` arrives in whatever physical form the fixture
    generator used, and that has varied across driver regenerations;
    all three forms normalize to the same UTC TIMESTAMP column:

    * nanosecond parquet — unscannable as a timestamp
      (PARQUET_TYPE_ILLEGAL); read as raw int64 nanos
      (``spark.sql.legacy.parquet.nanosAsLong``) and convert JVM-side
      with ``timestamp_micros(ts div 1000)`` — the same ns→µs
      truncation DuckDB applies;
    * µs/ms parquet with ``isAdjustedToUTC=false`` — Spark 4 infers
      ``TIMESTAMP_NTZ`` (``spark.sql.parquet.inferTimestampNTZ``
      defaults on); cast to TIMESTAMP, which interprets the naive
      wall-clock in the session timezone — pinned UTC below, exactly
      DuckDB's reading of a naive TIMESTAMP;
    * UTC-adjusted parquet — already TIMESTAMP, no-op.

    The session timezone is pinned to UTC here (runtime-settable conf):
    ``year``/``date_trunc``/date casts are tz-dependent, and queries
    must produce identical results under ANY caller-built session.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` queries work."""
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
