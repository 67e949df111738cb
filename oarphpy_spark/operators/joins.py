"""Join operators Spark lacks as builtins.

``asof_join`` — for each left row, attach the nearest-earlier right row
per key (DuckDB/kdb ASOF JOIN semantics: right.ts <= left.ts, latest
wins). Implemented as a union + running-window carry:

    tag sides -> union -> window(partition key, order ts) ->
    last(right_ts, ignorenulls) -> keep left rows

ONE shuffle on the key, state bounded by the window frame — versus the
naive inequality join, which is O(left x right) per key and falls to
BroadcastNestedLoopJoin at scale. Ties (equal timestamps) resolve to
the right row (right sorts first), matching ``ON l.ts >= r.ts``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the latest ``right``
    row (by ``right_ts``) with ``right_ts <= left_ts`` and the same
    ``on`` key — NULLs when no earlier right row exists.

    ``right_value_cols`` limits which right columns are carried
    (default: just the timestamp). Carried columns get ``suffix``.
    """
    right_value_cols = right_value_cols or []
    carry = [right_ts] + [c for c in right_value_cols if c != right_ts]

    l_tagged = left.withColumn("__is_right", F.lit(0)).withColumn(
        "__ts", F.col(left_ts)
    )
    r_tagged = right.withColumn("__is_right", F.lit(1)).withColumn(
        "__ts", F.col(right_ts)
    )
    # Align schemas: each side gets NULLs for the other's columns.
    l_cols = set(left.columns)
    for c in carry:
        l_tagged = l_tagged.withColumn(
            f"__r_{c}", F.lit(None).cast(dict(right.dtypes)[c])
        )
    for c in carry:
        r_tagged = r_tagged.withColumn(f"__r_{c}", F.col(c))
    keep = [on, "__is_right", "__ts"] + [f"__r_{c}" for c in carry]
    unioned = l_tagged.select(
        *[F.col(c) for c in left.columns], *[F.col(c) for c in keep if c not in l_cols]
    ).unionByName(
        r_tagged.select(
            *[
                F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
                for c in left.columns
                if c not in (on,)
            ],
            *[F.col(c) for c in keep],
        ),
        allowMissingColumns=False,
    )
    # Right rows sort before left rows at equal ts => ts >= semantics.
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry the matched right row as ONE struct: per-column carries would
    # mix columns from different right rows whenever a right value is
    # legitimately NULL (the struct is non-null iff a right row exists,
    # so NULL fields inside it stay NULL — DuckDB ASOF semantics).
    right_struct = F.when(
        F.col("__is_right") == 1,
        F.struct(*[F.col(f"__r_{c}").alias(c) for c in carry]),
    )
    carried = unioned.withColumn(
        "__match", F.last(right_struct, ignorenulls=True).over(w)
    )
    out_cols = [F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in carry]
    return carried.filter(F.col("__is_right") == 0).select(
        *left.columns, *out_cols
    )
