"""Cluster execution utilities.

Capability parity with the reference's executor primitives
(reference ``oarphpy/spark.py:82-146, 246-260``), using supported APIs:

* ``for_each_executor`` — run a thunk ~once per executor slot (env
  checks, cache warming). The reference probed executor count via the
  non-public ``sc._jsc.sc().getExecutorMemoryStatus()``; we size by
  ``defaultParallelism`` (public) and accept at-least-once semantics.
* ``cluster_cpu_count`` — total usable task slots.
* ``run_callables`` — distribute arbitrary callables and collect
  (callable, result) pairs; cloudpickle via Spark's own serializer.
* ``monte_carlo_pi`` — the reference's cluster-health smoke test,
  DataFrame-native: ``spark.range`` + ``rand()`` + filter + count, all
  codegen'd (no Python in the loop, unlike the reference's RDD filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def cluster_cpu_count(spark: SparkSession) -> int:
    """Total task slots (reference ``oarphpy/spark.py:116-123`` summed
    multiprocessing.cpu_count() per executor; defaultParallelism is the
    supported equivalent)."""
    return spark.sparkContext.defaultParallelism


def for_each_executor(spark: SparkSession, thunk) -> list:
    """Run ``thunk()`` on every task slot (>= once per executor).
    Returns the list of results."""
    n = cluster_cpu_count(spark)
    return (
        spark.sparkContext.parallelize(range(n), n).map(lambda _: thunk()).collect()
    )


def run_callables(spark: SparkSession, callables: list, parallel: int = -1) -> list:
    """Run a list of zero-arg callables distributed; returns results in
    input order (reference ``oarphpy/spark.py:126-146``)."""
    if parallel <= 0:
        parallel = max(1, min(len(callables), cluster_cpu_count(spark)))
    indexed = list(enumerate(callables))
    out = (
        spark.sparkContext.parallelize(indexed, parallel)
        .map(lambda pair: (pair[0], pair[1]()))
        .collect()
    )
    return [r for _, r in sorted(out)]


def monte_carlo_pi(spark: SparkSession, n_samples: int = 1_000_000, seed: int = 1337) -> DataFrame:
    """Estimate pi: fraction of uniform points inside the unit circle.
    One-row DataFrame (pi_est DOUBLE, n_samples BIGINT). Entirely
    JVM-side; the reference's version pickled every point into Python
    (``oarphpy/spark.py:246-260``)."""
    pts = spark.range(n_samples).select(
        (F.rand(seed) * 2 - 1).alias("x"), (F.rand(seed + 1) * 2 - 1).alias("y")
    )
    inside = pts.filter(F.col("x") ** 2 + F.col("y") ** 2 <= 1.0)
    return inside.agg(
        (F.count("*") * 4.0 / n_samples).alias("pi_est"),
        F.lit(n_samples).alias("n_samples"),
    )
