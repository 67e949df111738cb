"""Mergeable-sketch rollups (Apache DataSketches HLL via Spark 3.5+
builtins, count-min via the SQL aggregate).

Why sketches and not exact aggregation at 100 TB: an exact
COUNT(DISTINCT) re-shuffles raw values every time the question is
asked; a sketch is computed ONCE per (partition of the) data, stored
bytes-small, and merged associatively across days/segments/tables —
the only distinct-counting shape that survives incremental pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_rollup(
    df: DataFrame, group_cols: list[str], value_col: str, lg_k: int = 12
) -> DataFrame:
    """Per-group HLL sketches (binary, mergeable) + their estimates.
    Keep the ``hll`` column in storage; re-estimation and further
    rollups never touch raw data again."""
    sk = F.hll_sketch_agg(F.col(value_col), F.lit(lg_k))
    return df.groupBy(*group_cols).agg(
        sk.alias("hll"),
        F.hll_sketch_estimate(sk).alias("approx_distinct"),
    )


def hll_merge(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge already-computed sketches to a coarser grouping — the
    incremental-pipeline path (e.g. daily -> monthly) that never
    rescans raw values."""
    merged = F.hll_union_agg(F.col("hll"))
    return sketches.groupBy(*group_cols).agg(
        merged.alias("hll"),
        F.hll_sketch_estimate(merged).alias("approx_distinct"),
    )
