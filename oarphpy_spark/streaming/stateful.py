"""Custom stateful streaming operators via ``applyInPandasWithState``.

For semantics the built-in windowed aggregations can't express —
running per-key accumulators with timeout-driven emission. State lives
in the Spark state store (per-key, fault-tolerant); Python sees Arrow
batches per key per trigger.
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import Decimal

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


ANOMALY_SCHEMA = "user_id bigint, n_events bigint, n_flags bigint"
# sumsq of centi-values grows as n * cv^2: a bigint column would wrap
# after ~1e9 events per user at cv~1e5.  decimal(38,0) holds ~1e38 —
# enough for 1e28 events per key — so the PERSISTED state is as exact
# as the Python-int math that produces it.
_ANOM_STATE_SCHEMA = "n bigint, s bigint, ss decimal(38,0)"
_ANOM_MIN_N = 8
_ANOM_K = 3  # flag when (x - mean)^2 > K^2 * var


def _update_running_anomaly(
    key: tuple, pdfs: "Iterator[pd.DataFrame]", state: GroupState
) -> "Iterator[pd.DataFrame]":
    """Per-user running 3-sigma anomaly detector: state is the exact
    integer sufficient statistics (n, sum, sumsq) over centi-values;
    each arriving row is judged against the PRIOR state only (no
    peeking at itself), then folded in. The z^2 threshold compare is
    cross-multiplied to pure integers in arbitrary-precision Python
    ints, so the flag set is bit-deterministic and restatable as a
    lagged-cumulative-window batch query — the oracle
    q_stream_running_anomaly hash-checks it."""
    (user_id,) = key
    n, s, ss = state.get if state.exists else (0, 0, 0)
    ss = int(ss)  # decimal(38,0) state deserializes as Decimal
    flags = 0
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts", "event_id"])
    for cv in rows["cv"].astype(object):  # object => Python ints, exact
        if n >= _ANOM_MIN_N:
            lhs = (n * cv - s) ** 2
            rhs = _ANOM_K * _ANOM_K * (n * ss - s * s)
            if lhs > rhs:
                flags += 1
        n += 1
        s += cv
        ss += cv * cv
    # n_events is the running total (caller maxes per user); n_flags
    # is this trigger's DELTA (caller sums per user) — state stays
    # three integers regardless of trigger count.
    yield pd.DataFrame(
        [{"user_id": user_id, "n_events": n, "n_flags": flags}]
    )
    state.update((n, s, Decimal(ss)))


def running_anomaly_flags(events) -> "pd.DataFrame":
    """Streaming (user-keyed) running anomaly detection via
    applyInPandasWithState. Input needs columns
    (user_id, ts, event_id, cv). Emits per-trigger cumulative
    (n_events, per-trigger n_flags) rows in update mode; the caller
    sums n_flags and maxes n_events per user after the drain."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running_anomaly,
        outputStructType=ANOMALY_SCHEMA,
        stateStructType=_ANOM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
