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


def approx_heavy_hitters(
    df: DataFrame,
    value_col: str,
    k: int = 20,
    capacity: int = 4096,
) -> list[tuple]:
    """Approximate top-k frequent values via mergeable Misra-Gries
    summaries: each Arrow batch keeps at most ``capacity`` counters
    (decrement-on-overflow), partials merge driver-side by counter
    addition + re-trim. Guarantee: any value with true count >
    N/capacity survives; reported counts undercount by at most
    N/capacity. The bounded-memory alternative to the exact
    explode-groupBy top-k when the value domain (e.g. a web-scale
    vocabulary) is too wide to shuffle.

    Returns ``[(value, approx_count), ...]`` sorted by count desc then
    value — driver-side data, deliberately: heavy hitters are a
    bounded summary, not a distributed table.
    """
    from collections import Counter
    from collections.abc import Iterator

    import pandas as pd

    def partials(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        counters: Counter = Counter()
        for pdf in batches:
            for v in pdf["v"]:
                if v in counters or len(counters) < capacity:
                    counters[v] += 1
                else:
                    # decrement all; drop zeros (classic Misra-Gries)
                    for key in list(counters):
                        counters[key] -= 1
                        if counters[key] == 0:
                            del counters[key]
        if counters:
            items = counters.most_common()
            yield pd.DataFrame(
                {"v": [x for x, _ in items], "n": [n for _, n in items]}
            )

    # NULLs filter engine-side: a numeric batch containing nulls
    # arrives as float64-with-NaN in pandas, where a per-value None
    # check would miss. Literal NaNs in float columns are dropped too:
    # each np.float64 NaN is its own dict identity, so one NaN-heavy
    # column would otherwise flood the counters with count-1 entries.
    vals = df.select(F.col(value_col).alias("v")).filter(F.col("v").isNotNull())
    if df.schema[value_col].dataType.simpleString() in ("float", "double"):
        vals = vals.filter(~F.isnan(F.col("v")))
    got = (
        vals.mapInPandas(
            partials,
            schema=f"v {df.schema[value_col].dataType.simpleString()}, n long",
        )
        .collect()
    )
    merged: "Counter" = Counter()
    for r in sorted(got, key=lambda r: (str(r["v"]),)):
        merged[r["v"]] += r["n"]
    # re-trim the merged summary to capacity (summary merge rule)
    if len(merged) > capacity:
        kth = sorted(merged.values(), reverse=True)[capacity - 1]
        for key in list(merged):
            merged[key] -= kth
            if merged[key] <= 0:
                del merged[key]
    top = sorted(merged.items(), key=lambda kv: (-kv[1], str(kv[0])))[:k]
    return top


def count_min_counts(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-Min sketch as a (depth x width) counter table DataFrame.

    Each key maps to one bucket per hash row — row r's hash is the
    r-th 4-hex-char slice of md5(key), mod width (independent slices
    of one digest, the same trick the MinHash pipeline uses; portable
    so an oracle can replicate it). Building the table is one explode
    (x depth) + one bounded-key groupBy — the counter table has AT
    MOST depth*width rows no matter the corpus size, which is the
    whole point: it's the mergeable, fixed-size summary to store,
    while exact per-key counts need a corpus-sized shuffle.
    """
    rows = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                (
                    F.conv(
                        F.substring(
                            F.md5(F.col(key_col).cast("string").cast("binary")),
                            r * 4 + 1,
                            4,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % width
                ).alias("b"),
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(rows).alias("rb"))
        .groupBy(F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
        .agg(F.count("*").alias("cnt"))
    )


def count_min_estimate(
    sketch: DataFrame, probes: DataFrame, key_col: str, width: int = 256
) -> DataFrame:
    """Estimate each probe key's frequency from a count_min_counts
    table: min over depth rows of the key's bucket counter. The probe
    side re-derives the same md5-slice hashes; the join is
    probes x depth against the <= depth*width counter table
    (broadcast), so estimation never touches the original corpus.
    Output: (key, est) — est >= true count always (CMS one-sided
    error), within eps*N with the standard (depth, width) guarantees.
    """
    depth = [r.r for r in sketch.select("r").distinct().collect()]
    rows = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                (
                    F.conv(
                        F.substring(
                            F.md5(F.col(key_col).cast("string").cast("binary")),
                            r * 4 + 1,
                            4,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % width
                ).alias("b"),
            )
            for r in sorted(depth)
        ]
    )
    probe_rows = probes.select(
        F.col(key_col).alias("key"), F.explode(rows).alias("rb")
    ).select("key", F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
    return (
        probe_rows.join(F.broadcast(sketch), ["r", "b"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )
