"""Distributed histograms + histogram-with-examples.

Capability parity with the reference's plotting operators, re-expressed
as single Catalyst pipelines:

* ``df_histogram`` (reference ``oarphpy/plotting.py:104-116``) — the
  reference dropped to ``RDD.histogram`` (two passes with per-row
  JVM→Python pickling). Here: pass 1 is a 2-scalar min/max agg; pass 2
  is a codegen'd ``floor((x-min)/width)`` bucket groupBy. Matches
  numpy/RDD.histogram semantics: equal-width bins, last bin closed
  (reference ``oarphpy/plotting.py:227-229``), empty bins present.

* ``assign_buckets`` (reference ``oarphpy/plotting.py:212-239``) — the
  chained CASE WHEN bucket id, which Catalyst whole-stage-codegens.

* ``histogram_with_examples`` (reference
  ``oarphpy/plotting.py:128-365``) — the reference collected per-bucket
  examples via ``rdd.groupBy`` (full Python-side shuffle, unbounded
  driver collect). Here: per-bucket counts + a bounded number of
  deterministic example rows chosen by content-hash rank, all JVM-side;
  nothing unbounded ever reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def df_histogram(df: DataFrame, col: str, num_bins: int) -> DataFrame:
    """Fixed-width histogram of a numeric column.

    Returns a DataFrame (bucket BIGINT, lo DOUBLE, hi DOUBLE, count
    BIGINT) with exactly ``num_bins`` rows, empty buckets included —
    numpy-compatible edges: lo_i = min + i*width, width=(max-min)/bins.
    """
    # NULL/NaN rows are excluded (numpy semantics); without this filter
    # F.least's null-skipping would dump them all into the last bucket.
    x0 = F.col(col).cast("double")
    df = df.filter(x0.isNotNull() & ~F.isnan(x0))
    mm = df.agg(
        F.min(F.col(col).cast("double")).alias("mn"),
        F.max(F.col(col).cast("double")).alias("mx"),
    )
    spark = df.sparkSession
    buckets = spark.range(num_bins).select(F.col("id").alias("bucket"))
    # Cross join with the 1-row min/max relation: broadcast, zero shuffle.
    x = F.col(col).cast("double")
    # Degenerate range (min == max) puts everything in bucket 0.
    bucket_expr = F.when(F.col("mn") == F.col("mx"), F.lit(0)).otherwise(
        F.least(
            F.floor((x - F.col("mn")) / ((F.col("mx") - F.col("mn")) / num_bins)),
            F.lit(num_bins - 1),
        )
    )
    counts = (
        df.crossJoin(F.broadcast(mm))
        .select(bucket_expr.cast("long").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("count"))
    )
    return (
        buckets.join(F.broadcast(mm))
        .join(counts, "bucket", "left")
        .select(
            "bucket",
            (F.col("mn") + F.col("bucket") * (F.col("mx") - F.col("mn")) / num_bins).alias("lo"),
            (F.col("mn") + (F.col("bucket") + 1) * (F.col("mx") - F.col("mn")) / num_bins).alias(
                "hi"
            ),
            F.coalesce(F.col("count"), F.lit(0)).alias("count"),
        )
    )


def histogram_to_numpy(hist_df: DataFrame) -> tuple[list[int], list[float]]:
    """Collect a ``df_histogram`` result into (counts, bucket_edges) —
    the reference's return shape (``oarphpy/plotting.py:104-116``)."""
    rows = sorted(hist_df.collect(), key=lambda r: r["bucket"])
    counts = [r["count"] for r in rows]
    edges = [r["lo"] for r in rows] + [rows[-1]["hi"]]
    return counts, edges


def assign_buckets(
    df: DataFrame, col: str, edges: list[float], bucket_col: str = "bucket"
) -> DataFrame:
    """Tag each row with its bucket id via a chained CASE WHEN over
    explicit edges — [lo, hi) per bucket, the LAST bucket closed; rows
    outside every bucket get -1. Catalyst codegens the chain."""
    if len(edges) < 2:
        raise ValueError("need at least 2 edges")
    x = F.col(col)
    chain = None
    for i in range(len(edges) - 1):
        last = i == len(edges) - 2
        cond = (x >= edges[i]) & ((x <= edges[i + 1]) if last else (x < edges[i + 1]))
        chain = F.when(cond, i) if chain is None else chain.when(cond, i)
    return df.withColumn(bucket_col, chain.otherwise(-1))


def histogram_with_examples(
    df: DataFrame,
    col: str,
    edges: list[float],
    example_cols: list[str],
    n_examples: int = 5,
    order_key: str | None = None,
) -> DataFrame:
    """Per-bucket count + up to ``n_examples`` example rows.

    Examples are chosen deterministically by md5-rank of ``order_key``
    (default: the first example column) — a stable pseudo-random draw
    that is partitioning-independent, unlike seeded ``sampleBy``
    (the reference's nondeterminism caveat:
    ``oarphpy_test/test_spark.py:282-285``). A window group-limit keeps
    the per-bucket state bounded; only n_examples rows per bucket
    survive to the collect_list."""
    key = order_key or example_cols[0]
    bucketed = assign_buckets(df, col, edges).filter(F.col("bucket") >= 0)
    counts = bucketed.groupBy("bucket").agg(F.count("*").alias("count"))
    w = Window.partitionBy("bucket").orderBy(F.md5(F.col(key).cast("string")), F.col(key))
    examples = (
        bucketed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_examples)
        .groupBy("bucket")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(*[F.col(c) for c in example_cols]))
            ).alias("examples")
        )
    )
    return counts.join(examples, "bucket", "left").orderBy("bucket")
