"""Property-based round-trip tests for the codec layer (hypothesis):
for ANY generated object graph, from_row(to_row(x)) == x, and the
deduced schema accepts the encoded row. Runs driver-side (no Spark
job) so hundreds of examples stay fast; the Spark/parquet leg is
covered by tests/test_codec.py on representative cases.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import Row

from oarphpy_spark.codec import RowAdapter


class Box:
    def __init__(self, payload=None):
        self.payload = payload

    def __eq__(self, other):
        return isinstance(other, Box) and _eq(self.payload, other.payload)


def _eq(a, b) -> bool:
    if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
        return (
            isinstance(a, np.ndarray)
            and isinstance(b, np.ndarray)
            and a.dtype == b.dtype
            and a.shape == b.shape
            and np.array_equal(a, b)
        )
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(_eq(a[k], b[k]) for k in a)
    return a == b


scalars = st.one_of(
    st.booleans(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=20),
    st.binary(max_size=20).map(bytearray),
)

arrays = st.one_of(
    st.lists(st.integers(-1000, 1000), min_size=0, max_size=300).map(
        lambda xs: np.asarray(xs, dtype=np.int64)
    ),
    st.lists(
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        min_size=0,
        max_size=300,
    ).map(lambda xs: np.asarray(xs, dtype=np.float32)),
)

values = st.recursive(
    st.one_of(scalars, arrays),
    lambda children: st.one_of(
        st.lists(children, min_size=1, max_size=4),
        st.dictionaries(st.text(min_size=1, max_size=8), children, min_size=1, max_size=4),
        children.map(Box),
    ),
    max_leaves=8,
)


@given(values)
@settings(max_examples=200, deadline=None)
def test_roundtrip_identity(v):
    obj = Box(payload=v)
    back = RowAdapter.from_row(RowAdapter.to_row(obj))
    assert isinstance(back, Box)
    assert _eq(back.payload, obj.payload)


@given(values)
@settings(max_examples=50, deadline=None)
def test_schema_deducible_for_nonempty(v):
    # Schema deduction must either succeed or raise the documented
    # empty-container error — never crash otherwise.
    try:
        schema = RowAdapter.to_schema(Row(x=v))
    except ValueError as ex:
        assert "empty" in str(ex) or "None" in str(ex)
        return
    assert schema.fieldNames() == ["x"]
