"""Custom stateful streaming operators via ``applyInPandasWithState``.

For semantics the built-in windowed aggregations can't express —
running per-key accumulators with timeout-driven emission. State lives
in the Spark state store (per-key, fault-tolerant); Python sees Arrow
batches per key per trigger.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

USER_TOTALS_SCHEMA = "user_id bigint, n_events bigint, total_value double"
_STATE_SCHEMA = "n bigint, total double"


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Running (count, sum) per user across triggers."""
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        [{"user_id": user_id, "n_events": n, "total_value": total}]
    )


def running_user_totals(events) -> "pd.DataFrame":
    """Streaming DataFrame -> per-user running totals, emitted every
    trigger. State is two scalars per user — O(distinct users), not
    O(events)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=USER_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
