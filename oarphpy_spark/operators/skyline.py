"""Distributed Pareto-frontier (skyline) operator.

Two-phase shape (the standard distributed-skyline decomposition):
local frontiers per bucket in parallel, then one global pass over the
survivors only — correct because a point dominated inside its bucket
is dominated globally, and frontiers shrink data, so the global
window sees a small set no matter the input size.

Domination here is 2-D maximize-``y`` / minimize-``x`` over DISTINCT
(x, y) points, which reduces to a single running max: order by
(x asc, y desc); a point is dominated iff some preceding point's
running-max y >= its y (the preceding point has x <= x and y >= y
with at least one strict, by distinctness and the sort order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_frontier(
    pts: DataFrame,
    x: str,
    y: str,
    bucket_width: int | None = None,
) -> DataFrame:
    """Rows of ``pts`` (distinct on (x, y) — caller pre-aggregates)
    not dominated by any other row: smaller-or-equal ``x`` AND
    greater-or-equal ``y`` with one strict. Extra columns ride along.

    ``bucket_width`` partitions phase 1 by ``floor(x / width)``;
    None runs the single global pass only (fine when the input is
    already small)."""

    def survivors(df: DataFrame, *partition) -> DataFrame:
        w = (
            Window.partitionBy(*partition)
            .orderBy(F.col(x).asc(), F.col(y).desc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        runmax = F.max(y).over(w)
        return (
            df.withColumn("__m", runmax)
            .filter(F.col("__m").isNull() | (F.col("__m") < F.col(y)))
            .drop("__m")
        )

    if bucket_width is not None:
        b = F.floor(F.col(x) / F.lit(bucket_width))
        pts = survivors(pts.withColumn("__b", b), "__b").drop("__b")
    return survivors(pts)
