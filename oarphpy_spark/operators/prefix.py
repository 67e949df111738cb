"""Distributed global prefix sums and row numbers.

A global ``Window.orderBy(...)`` with no ``partitionBy`` collapses the
whole relation into ONE task — fine at 60k rows, a wall at 100 TB.
This module implements the classic two-level scan instead:

1. **Bucket** every row by an exact integer range-split of the leading
   (numeric, non-null) order key: ``bkt = (k - min) * NB div span``.
   The bucket is a pure function of the key and two scalars, so it is
   deterministic under recomputation (no ``spark_partition_id()``,
   which would tie correctness to physical partitioning) and ties on
   the leading key always share a bucket, so the remaining order
   columns resolve order entirely bucket-locally.
2. **Local pass**: one window per bucket (parallel across buckets)
   computes the within-bucket prefix sum / row number.
3. **Offsets**: per-bucket totals (``NB`` rows, a constant) get an
   exclusive cumulative sum — the only unpartitioned window left runs
   over at most ``NB`` rows — and are broadcast-joined back.

Global value = local value + bucket offset, exactly (integer math
end-to-end; no floating-point reassociation).

Cost model at 1000 executors: one extra scan of the leading key for
min/max (column-pruned), one shuffle on ``bkt`` (the same shuffle the
naive plan does, minus the single-task sink), one tiny agg + broadcast.
Skewed keys degrade gracefully: a hot key region makes a fat bucket,
not a single global task; raise ``n_buckets`` to re-split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["with_global_cumsum", "with_global_row_number"]

_BKT = "__pfx_bkt"
_LOC = "__pfx_local"
_OFF = "__pfx_offset"


def _bucketed(df: DataFrame, lead_key: str, n_buckets: int) -> DataFrame:
    """Attach an exact integer range-bucket of ``lead_key``.

    ``div`` keeps the arithmetic in 64-bit integers (no double
    rounding above 2^53). Degenerate span (all keys equal, or a
    single row) collapses to bucket 0 — the correct serial fallback.
    """
    k = F.col(lead_key).cast("long")
    stats = df.agg(
        F.min(k).alias("__pfx_kmin"), F.max(k).alias("__pfx_kmax")
    )
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn(
            _BKT,
            F.expr(
                f"((cast({lead_key} as bigint) - __pfx_kmin)"
                f" * {int(n_buckets)})"
                f" div (__pfx_kmax - __pfx_kmin + 1)"
            ),
        )
        .drop("__pfx_kmin", "__pfx_kmax")
    )


def _offsets(
    per_bucket: DataFrame, total_col: str | None
) -> DataFrame:
    """Exclusive cumsum of per-bucket totals (≤ n_buckets rows)."""
    w_ex = Window.orderBy(_BKT).rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = per_bucket.select(
        _BKT,
        F.coalesce(F.sum("__pfx_btot").over(w_ex), F.lit(0)).alias(_OFF),
    )
    if total_col is not None:
        w_all = Window.orderBy(_BKT).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        off = per_bucket.select(
            _BKT,
            F.coalesce(F.sum("__pfx_btot").over(w_ex), F.lit(0)).alias(_OFF),
            F.sum("__pfx_btot").over(w_all).alias(total_col),
        )
    return off


def _two_level(
    df: DataFrame,
    order_cols: list[str],
    local_value: Column,
    out: str,
    n_buckets: int,
    total_col: str | None,
) -> DataFrame:
    lead = order_cols[0]
    b = _bucketed(df, lead, n_buckets)
    w_loc = Window.partitionBy(_BKT).orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, 0
    )
    local = b.withColumn(_LOC, F.sum(local_value).over(w_loc))
    per_bucket = local.groupBy(_BKT).agg(
        F.sum(local_value).alias("__pfx_btot")
    )
    off = _offsets(per_bucket, total_col)
    return (
        local.join(F.broadcast(off), _BKT)
        .withColumn(out, F.col(_LOC) + F.col(_OFF))
        .drop(_BKT, _LOC, _OFF)
    )


def with_global_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value: Column,
    out: str = "cumsum",
    n_buckets: int = 1024,
    total_col: str | None = None,
) -> DataFrame:
    """``out`` = inclusive prefix sum of ``value`` in ``order_cols``
    order, computed with no single-task global window.

    Requirements: ``order_cols[0]`` is numeric, non-null, and castable
    to bigint without collision (it is the range-split key); ``value``
    is integer-typed if exact equality with a serial scan is required
    (integer sums are order-independent; double sums are not).
    ``total_col`` additionally attaches the grand total to every row.
    """
    return _two_level(df, order_cols, value, out, n_buckets, total_col)


def with_global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out: str = "rn",
    n_buckets: int = 1024,
    total_col: str | None = None,
) -> DataFrame:
    """``out`` = global 1-based ROW_NUMBER() over ``order_cols``
    (first column numeric non-null; remaining columns break ties
    bucket-locally), with no single-task global window. Set
    ``total_col`` to also attach COUNT(*) OVER () to every row."""
    return _two_level(
        df, order_cols, F.lit(1).cast("long"), out, n_buckets, total_col
    )
