"""Exact distributed quantiles WITHOUT a global sort.

``exact_ranks`` finds the exact k-th order statistic(s) of an integer
column with the two-phase bucket-prune plan every distributed exact
median implementation reduces to:

1. ONE aggregation pass buckets the column (value // bucket_width)
   and counts per bucket — a partial-aggregable groupBy whose output
   is |range|/width rows, thousands at most.
2. The cumulative bucket histogram (driver-side over those bounded
   rows — a histogram-edge probe, not a data collect) locates which
   bucket contains each requested rank and how many rows precede it.
3. A SECOND pass filters to just the located buckets — a pushed-down
   range predicate on the scan — and picks the exact in-bucket order
   statistics with a window over only those rows.

Work is two scans + one tiny sort instead of one total sort: the
shape that makes an EXACT global median tractable at 100 TB, where
``ORDER BY`` of the whole column is the textbook anti-pattern and
``percentile_approx`` (the t-digest route, q_approx_quantile_cert)
trades away exactness. Ties and duplicate values are handled by rank
arithmetic, never by value uniqueness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_ranks(
    vals: DataFrame,
    col: str,
    ranks: list[int],
    bucket_width: int = 10_000,
) -> dict[int, int]:
    """Exact values at 1-based ``ranks`` of integer column ``col``.

    Returns {rank: value}. Two jobs: the bucket histogram, then one
    filtered pick per contiguous bucket group. The driver touches
    only bucket counts (bounded by the value range / width), never
    data rows.
    """
    b = vals.select((F.col(col) / bucket_width).cast("bigint").alias("b"))
    hist = (
        b.groupBy("b")
        .agg(F.count("*").alias("n"))
        .orderBy("b")
        .collect()  # bounded: one row per occupied bucket
    )
    # locate (bucket, preceding-count) per requested rank
    want: dict[int, tuple[int, int]] = {}
    cum = 0
    ranks_left = sorted(ranks)
    for row in hist:
        nxt = cum + row["n"]
        while ranks_left and ranks_left[0] <= nxt:
            want[ranks_left.pop(0)] = (row["b"], cum)
            if not ranks_left:
                break
        cum = nxt
        if not ranks_left:
            break
    if ranks_left:
        raise ValueError(f"ranks {ranks_left} exceed row count {cum}")

    out: dict[int, int] = {}
    buckets = sorted({bk for bk, _ in want.values()})
    sub = vals.select(F.col(col).alias("v")).filter(
        (F.col("v") / bucket_width).cast("bigint").isin(buckets)
    )
    w = Window.orderBy("v")
    picked = sub.withColumn("rn", F.row_number().over(w))
    # A target's rank WITHIN sub = (global rank - rows before its
    # bucket globally) + (rows of OTHER selected buckets that sort
    # before its bucket inside sub). Selected buckets need not be
    # contiguous, so the second term is a per-bucket prefix over the
    # selected set only.
    bucket_n = {row["b"]: row["n"] for row in hist}
    sub_prefix = {}
    acc = 0
    for bk in buckets:
        sub_prefix[bk] = acc
        acc += bucket_n[bk]
    targets = {
        rank: rank - pre + sub_prefix[bk]
        for rank, (bk, pre) in want.items()
    }
    got = picked.filter(
        F.col("rn").isin(list(targets.values()))
    ).collect()  # bounded: one row per requested rank
    by_rn = {r["rn"]: r["v"] for r in got}
    for rank, rn in targets.items():
        out[rank] = by_rn[rn]
    return out
