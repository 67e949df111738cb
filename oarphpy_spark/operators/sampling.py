"""Class-rebalancing (stratified) sampling.

Two variants:

* ``get_balanced_sample`` — capability parity with the reference
  (reference ``oarphpy/spark.py:195-213``): per-class fractions =
  min_class_count / class_count (optionally capped), then one
  stratified ``sampleBy`` pass. Statistical (seeded, partitioning-
  dependent) — correct in expectation, tested with tolerance.

* ``balanced_sample_deterministic`` — the oracle-checkable form: rank
  rows within each class by a content hash (md5 of the key) and keep
  the first ``min_class_count`` (or cap). Fully reproducible on any
  cluster layout AND expressible in ANSI SQL, at the cost of a window
  shuffle. At 100 TB prefer ``get_balanced_sample`` (no shuffle — a
  single scan with per-row Bernoulli draws); use the deterministic
  variant when runs must be byte-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def get_balanced_sample(
    df: DataFrame,
    category_col: str,
    n_per_category: int | None = None,
    seed: int = 1337,
) -> DataFrame:
    """Rebalance classes: sample each class down to ~the smallest class
    size (capped at ``n_per_category`` if given). Two jobs: a count
    aggregation, then a single stratified scan — no shuffle of data rows.
    """
    counts = {
        r["cat"]: r["n"]
        for r in df.groupBy(F.col(category_col).alias("cat"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    if not counts:
        return df
    target = min(counts.values())
    if n_per_category is not None:
        target = min(target, n_per_category)
    fractions = {cat: min(1.0, target / n) for cat, n in counts.items() if n}
    return df.sampleBy(category_col, fractions=fractions, seed=seed)


def balanced_sample_deterministic(
    df: DataFrame,
    category_col: str,
    key_col: str,
    n_per_category: int | None = None,
) -> DataFrame:
    """Deterministic stratified sample: within each class, order rows by
    ``md5(key)`` (a stable pseudo-random permutation) and keep the first
    min-class-count rows. Output is identical regardless of partitioning,
    cluster size, or engine."""
    counts = df.groupBy(category_col).agg(F.count("*").alias("__n"))
    target = counts.agg(F.min("__n").alias("m")).collect()[0]["m"]
    if target is None:
        return df
    if n_per_category is not None:
        target = min(target, n_per_category)
    w = Window.partitionBy(category_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= target)
        .drop("__rn")
    )
