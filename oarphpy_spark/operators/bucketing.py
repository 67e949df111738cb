"""Bucketed-table helpers: pre-shuffle once at write time, join and
aggregate shuffle-free forever after.

At 100 TB the dominant cost of a fact-to-fact equi-join is the
all-to-all exchange of both sides. Spark's bucketing trades that for
a one-time clustered write: ``df.write.bucketBy(n, key).sortBy(key)``
hash-partitions rows into a fixed number of files per partition, and
every later join or aggregation keyed on the bucket column reads the
co-located buckets directly — the planner drops the Exchange (and
with ``sortBy``, the Sort) from both sides. The write-side shuffle is
paid once; nightly pipelines that join the same fact tables repeatedly
amortize it to zero.

Rules that make it work (asserted by tests/test_bucketing.py):
* both sides bucketed on the join key with the SAME bucket count
  (or a multiple, with ``spark.sql.bucketing.coalesceBucketsInJoin``),
* bucket count sized so a single bucket fits an executor's memory at
  target scale (buckets = total_bytes / ~256 MB is a sane start),
* ``spark.sql.sources.bucketing.enabled`` left on (default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str,
    num_buckets: int,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-clustered)
    managed table keyed for shuffle-free joins/aggs on ``key``."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(name)


def bucketed_join(
    spark: SparkSession, left: str, right: str, key: str
) -> DataFrame:
    """Equi-join two co-bucketed tables on their bucket key; with both
    sides bucketed alike the physical plan carries no Exchange."""
    lt, rt = spark.table(left), spark.table(right)
    return lt.join(rt, key)
