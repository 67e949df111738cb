"""Stream-stream joins with watermark-bounded state.

The reference has no streaming at all (SURVEY.md §2.B(i)); this module
completes the streaming surface with the remaining core pattern:
joining two live streams. The canonical workload is attribution —
match each purchase to the clicks that preceded it within a bounded
lag, as both arrive.

Scale contract: an UNBOUNDED stream-stream join would buffer both
streams forever. Spark only admits the join because (a) both sides
carry watermarks and (b) the join condition includes a time interval
relating the two event times — together they let the state store evict
a click once the watermark passes ``click_ts + max_lag``, so state is
O(rate × (watermark + lag)) regardless of how long the streams run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    max_lag: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner-join each LEFT row (e.g. purchases) to the RIGHT rows
    (e.g. clicks) with the same key whose timestamp falls in
    ``[left.ts - max_lag, left.ts]``. Both inputs must have a ``ts``
    timestamp column; the right side's columns come back suffixed
    ``_r``. Works identically on batch DataFrames (same expressions —
    that equivalence is the test harness)."""
    lw = left.withWatermark("ts", watermark) if left.isStreaming else left
    r0 = right.select(
        F.col(key).alias(f"{key}_r"),
        F.col("ts").alias("ts_r"),
        *[
            F.col(c).alias(f"{c}_r")
            for c in right.columns
            if c not in (key, "ts")
        ],
    )
    rw = r0.withWatermark("ts_r", watermark) if right.isStreaming else r0
    cond = (
        (lw[key] == rw[f"{key}_r"])
        & (rw["ts_r"] <= lw["ts"])
        & (rw["ts_r"] >= lw["ts"] - F.expr(f"INTERVAL {max_lag}"))
    )
    return lw.join(rw, cond, "inner")


def purchase_click_attribution_stream(
    events: DataFrame, max_lag: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Attribution rollup over one events feed split into two logical
    streams: for every purchase, count the same-user clicks in the
    preceding ``max_lag``. Append-mode-safe output (one row per
    purchase, finalized when the watermark passes)."""
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    joined = interval_join_stream(
        purchases, clicks, key="user_id", max_lag=max_lag, watermark=watermark
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("purchase_ts_us"),
        F.unix_micros("ts_r").alias("click_ts_us"),
        F.col("event_id_r").alias("click_event_id"),
    )
