"""Partitioning guards.

``spread`` fixes the small-input parallelism trap: a table that is one
parquet file scans as ONE partition, so any compute-heavy map chain
(shingling, hashing, Arrow UDFs) runs single-threaded no matter how
many cores exist. Repartitioning costs one cheap shuffle of the small
input and unlocks the full cluster. On real (many-split) inputs the
guard is a no-op, so operators can apply it unconditionally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition iff the plan currently has fewer partitions than the
    cluster's default parallelism (or ``min_partitions``)."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
