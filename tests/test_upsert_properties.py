"""Property test: the distributed CDC MERGE (operators/upsert.py)
agrees with a trivially-correct sequential replay for ANY change
stream — arbitrary key collisions, op orderings, re-inserts after
deletes, deletes of absent keys."""

from __future__ import annotations

import pytest

from hypothesis import given, settings
from hypothesis import strategies as st

from oarphpy_spark.operators.upsert import apply_cdc

_KEYS = st.integers(min_value=0, max_value=5)
_OPS = st.sampled_from(["I", "U", "D"])
_VALS = st.text(
    alphabet="abcdefgh", min_size=0, max_size=4
)

changes = st.lists(
    st.tuples(_KEYS, _VALS, _OPS), min_size=0, max_size=24
)


def _reference_merge(snapshot: dict, stream) -> dict:
    """Sequential replay: later seq wins outright; ops mean what the
    operator says they mean."""
    state = dict(snapshot)
    # latest change per key wins (seq = position in the stream)
    latest = {}
    for seq, (k, v, op) in enumerate(stream):
        latest[k] = (seq, v, op)
    for k, (_, v, op) in latest.items():
        if op == "D":
            state.pop(k, None)
        else:  # I/U both upsert
            state[k] = v
    return state


# Slow tier: randomized CDC replay property; q_stream_upsert's
# exact oracle stays in the default tier.
@pytest.mark.slow
@given(changes)
@settings(max_examples=15, deadline=None)
def test_apply_cdc_matches_sequential_replay(spark, stream):
    snap_rows = [(0, "s0"), (1, "s1"), (2, "s2")]
    snapshot = spark.createDataFrame(snap_rows, "k long, v string")
    if stream:
        cdf = spark.createDataFrame(
            [(k, v, seq, op) for seq, (k, v, op) in enumerate(stream)],
            "k long, v string, seq long, op string",
        )
    else:
        cdf = spark.createDataFrame([], "k long, v string, seq long, op string")
    got = {r.k: r.v for r in apply_cdc(snapshot, cdf, "k").collect()}
    want = _reference_merge(dict(snap_rows), stream)
    assert got == want
