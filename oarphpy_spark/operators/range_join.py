"""Point-in-interval (range) joins that scale.

Spark has no native range-join optimization: ``l.ts BETWEEN r.lo AND
r.hi`` with only inequality conditions plans as BroadcastNestedLoop /
cartesian — O(|L| x |R|) compares. The standard fix (what Databricks'
range-join hint and KDB/TimescaleDB interval indexes do under the
hood) is chunk bucketing:

1. pick a chunk width ``w``;
2. each interval explodes into the chunks it covers (usually 1-2 rows
   for intervals comparable to ``w``);
3. each point maps to exactly ONE chunk;
4. equi-join on (keys..., chunk) — a plain shuffled hash join — then
   apply the exact BETWEEN as a residual filter.

A (point, interval) pair can match only in the point's single chunk,
so no dedup pass is needed. Choose ``w`` near the typical interval
length: too small explodes interval rows, too large fattens buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    on: list[str] | None = None,
    chunk: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point <= hi`` (and equal ``on`` keys), via chunk bucketing.

    ``point_col``/``lo_col``/``hi_col`` must be numeric (e.g. epoch
    seconds/micros); ``chunk`` is in the same unit. ``how`` supports
    ``inner`` and ``left`` (points with no interval survive with NULL
    interval columns)."""
    if chunk <= 0:
        # non-ANSI division by zero would yield NULL chunks and a
        # silently empty join instead of an error
        raise ValueError(f"chunk must be positive, got {chunk}")
    on = on or []
    p_chunk = (F.col(point_col) / chunk).cast("long")
    i_chunks = F.sequence(
        (F.col(lo_col) / chunk).cast("long"),
        (F.col(hi_col) / chunk).cast("long"),
    )
    pts = points.withColumn("__chunk", p_chunk)
    ivs = intervals.withColumn("__chunk", F.explode(i_chunks))
    cond: Column = pts["__chunk"] == ivs["__chunk"]
    for k in on:
        cond = cond & (pts[k] == ivs[k])
    residual = (pts[point_col] >= ivs[lo_col]) & (pts[point_col] <= ivs[hi_col])
    if how == "inner":
        out = pts.join(ivs, cond & residual, "inner")
    elif how == "left":
        # left join must not drop points whose chunk matched but whose
        # residual failed -> residual inside the join condition
        out = pts.join(ivs, cond & residual, "left")
    else:
        raise ValueError(f"unsupported how={how!r}")
    drop = [pts["__chunk"], ivs["__chunk"]] + [ivs[k] for k in on]
    return out.drop(*drop)
