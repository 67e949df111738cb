"""Round-trip-equals-identity tests for the codec layer (the
reference's core correctness idea, oarphpy_test/test_spark.py:519-1109).
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import Row

from oarphpy_spark.codec import CloudpickeledCallable, RowAdapter, Tensor


class DictObj:
    def __init__(self, foo=0, bar=""):
        self.foo = foo
        self.bar = bar

    def __eq__(self, other):
        return (self.foo, self.bar) == (other.foo, other.bar)


class SlotObj:
    __slots__ = ("meow",)

    def __init__(self, meow=0):
        self.meow = meow

    def __eq__(self, other):
        return self.meow == other.meow


def _mod_double(x):
    return x * 2


def _roundtrip_df(spark, objs, tmp_path, proto=None):
    df = RowAdapter.to_df(spark, objs, prototype=proto)
    out = str(tmp_path / "rt.parquet")
    df.write.mode("overwrite").parquet(out)
    return RowAdapter.collect_objects(spark.read.parquet(out))


def test_primitives_roundtrip(spark, tmp_path):
    objs = [DictObj(foo=i, bar=f"s{i}") for i in range(5)]
    back = _roundtrip_df(spark, objs, tmp_path)
    assert sorted(back, key=lambda o: o.foo) == objs


def test_slots_roundtrip(spark, tmp_path):
    objs = [SlotObj(meow=i) for i in range(3)]
    back = _roundtrip_df(spark, objs, tmp_path)
    assert sorted(back, key=lambda o: o.meow) == objs


def test_nested_containers_roundtrip(spark, tmp_path):
    objs = [
        DictObj(foo=1, bar={"k": [DictObj(foo=2, bar="inner")]}),
        DictObj(foo=2, bar={"k": [DictObj(foo=3, bar="x")]}),
    ]
    back = sorted(_roundtrip_df(spark, objs, tmp_path), key=lambda o: o.foo)
    assert back[0].bar["k"][0] == DictObj(foo=2, bar="inner")


@pytest.mark.parametrize(
    "arr",
    [
        np.arange(6, dtype=np.int64),
        np.arange(6, dtype=np.float32).reshape(2, 3),
        np.arange(1024, dtype=np.float64),  # packed (8 KB)
        np.zeros((0,), dtype=np.int32),  # empty
    ],
)
def test_tensor_roundtrip(spark, tmp_path, arr):
    objs = [DictObj(foo=1, bar=arr)]
    back = _roundtrip_df(spark, objs, tmp_path)
    assert np.array_equal(back[0].bar, arr)
    assert back[0].bar.dtype == arr.dtype
    assert back[0].bar.shape == arr.shape


def test_tensor_pack_threshold():
    small = Tensor.from_numpy(np.arange(4, dtype=np.int64))
    big = Tensor.from_numpy(np.arange(1000, dtype=np.int64))
    assert len(small["values"]) == 4 and len(small["values_packed"]) == 0
    assert len(big["values"]) == 0 and len(big["values_packed"]) == 8000


def test_callable_roundtrip(spark, tmp_path):
    objs = [DictObj(foo=1, bar=CloudpickeledCallable(_mod_double))]
    back = _roundtrip_df(spark, objs, tmp_path)
    assert back[0].bar(21) == 42


def test_empty_callable_raises():
    cc = CloudpickeledCallable.from_row(
        CloudpickeledCallable().to_row()
    )
    with pytest.raises(ValueError):
        cc(1)


def test_lambda_roundtrip_via_cloudpickle():
    cc = CloudpickeledCallable(lambda x: x + 1)
    back = CloudpickeledCallable.from_row(cc.to_row())
    assert back(41) == 42


def test_numpy_scalar_unboxed():
    assert RowAdapter.to_row(np.float32(1.5)) == 1.5
    assert isinstance(RowAdapter.to_row(np.int32(7)), int)


def test_schema_from_prototype_handles_packed_tensor():
    schema = RowAdapter.to_schema(Row(a=np.arange(10_000, dtype=np.float64)))
    t = schema["a"].dataType
    assert t["values"].dataType.simpleString() == "array<double>"


def test_schema_evolution_removed_field(spark, tmp_path):
    # Write rows having an extra field the class "no longer" has:
    # decode must ignore it (reference oarphpy/spark.py:1112-1118).
    rows = [
        Row(
            __pyclass__=f"{DictObj.__module__}.{DictObj.__qualname__}",
            foo=1,
            bar="x",
            gone=99,
        )
    ]
    df = spark.createDataFrame(rows)
    out = str(tmp_path / "evolve.parquet")
    df.write.mode("overwrite").parquet(out)
    back = RowAdapter.collect_objects(spark.read.parquet(out))
    assert back[0].foo == 1 and back[0].bar == "x"
    assert back[0].gone == 99  # lands as an extra attribute on __dict__ objs


class OuterHolder:
    class InnerPayload:
        def __init__(self, v=0):
            self.v = v

        def __eq__(self, other):
            return self.v == other.v


def test_nested_class_roundtrip(spark, tmp_path):
    objs = [OuterHolder.InnerPayload(v=7)]
    back = _roundtrip_df(spark, objs, tmp_path)
    assert back[0] == OuterHolder.InnerPayload(v=7)


import dataclasses


@dataclasses.dataclass(frozen=True)
class FrozenPoint:
    x: int = 0
    y: str = ""


@dataclasses.dataclass(frozen=True, slots=True)
class FrozenSlotPoint:
    x: int = 0
    y: str = ""


def test_frozen_dataclass_roundtrip(spark, tmp_path):
    """Frozen dataclasses raise FrozenInstanceError (an AttributeError
    subclass) from setattr; decode must not silently drop every field."""
    objs = [FrozenPoint(x=3, y="a"), FrozenPoint(x=4, y="b")]
    back = sorted(_roundtrip_df(spark, objs, tmp_path), key=lambda o: o.x)
    assert back == objs


def test_frozen_slots_dataclass_roundtrip(spark, tmp_path):
    objs = [FrozenSlotPoint(x=5, y="c")]
    back = _roundtrip_df(spark, objs, tmp_path)
    assert back == objs


class _SlotlessBase:
    pass


class HybridSlots(_SlotlessBase):
    # subclass __slots__ under a slot-less base: instances have BOTH a
    # __dict__ and slot descriptors; writes must route through the
    # descriptor or reads hit the (empty) slot, not __dict__
    __slots__ = ("x",)

    def __eq__(self, other):
        return self.x == other.x


def test_dict_plus_slots_hybrid_roundtrip(spark, tmp_path):
    o = HybridSlots()
    o.x = 11
    back = _roundtrip_df(spark, [o], tmp_path)
    assert back[0].x == 11
