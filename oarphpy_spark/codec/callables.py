"""Function <-> binary-column codec.

Capability parity with the reference's ``CloudpickeledCallable``
(reference ``oarphpy/spark.py:977-1088``): a callable persisted AS DATA
in a struct column:

    struct<__pyclass__:string, func_bytes:binary, func_pyclass:string>

Rationale carried over from the reference (``oarphpy/spark.py:979-984``):
Spark pickles *data* with plain pickle (which cannot serialize lambdas/
closures) but ships *tasks* with cloudpickle — so callables stored in
rows must be explicitly cloudpickled into bytes.
"""

from __future__ import annotations

import pickle
from typing import Any

from pyspark import cloudpickle

from pyspark.sql import Row

PYCLASS_KEY = "__pyclass__"
_CC_PYCLASS = "oarphpy_spark.codec.callables.CloudpickeledCallable"

#: Keep a fixed protocol so bytes written by one interpreter version
#: decode in another (the reference pins protocol 4 for the same
#: reason, ``oarphpy/spark.py:1016-1021``).
PICKLE_PROTOCOL = 4


class CloudpickeledCallable:
    """Wrap a callable so it can live in a DataFrame column.

    ``CloudpickeledCallable(f)`` wraps; ``ccc()`` invokes; ``to_row`` /
    ``from_row`` convert to/from the struct encoding. An empty wrapper
    (``func=None``) encodes as zero bytes and raises on call.
    """

    __slots__ = ("_func",)

    def __init__(self, func=None):
        self._func = func

    @property
    def func(self):
        return self._func

    def __call__(self, *args, **kwargs):
        if self._func is None:
            raise ValueError("empty CloudpickeledCallable")
        return self._func(*args, **kwargs)

    def __eq__(self, other) -> bool:
        return isinstance(other, CloudpickeledCallable) and self.to_row() == other.to_row()

    def __repr__(self) -> str:
        name = getattr(self._func, "__qualname__", repr(self._func))
        return f"CloudpickeledCallable({name})"

    def to_row(self) -> Row:
        if self._func is None:
            func_bytes = bytearray()
            func_pyclass = ""
        else:
            func_bytes = bytearray(
                cloudpickle.dumps(self._func, protocol=PICKLE_PROTOCOL)
            )
            mod = getattr(self._func, "__module__", "") or ""
            qual = getattr(self._func, "__qualname__", "") or repr(self._func)
            func_pyclass = f"{mod}.{qual}"
        return Row(
            **{
                PYCLASS_KEY: _CC_PYCLASS,
                "func_bytes": func_bytes,
                "func_pyclass": func_pyclass,
            }
        )

    @classmethod
    def from_row(cls, row: Any) -> "CloudpickeledCallable":
        func_bytes = row["func_bytes"]
        if func_bytes is None or len(func_bytes) == 0:
            return cls(None)
        return cls(pickle.loads(bytes(func_bytes)))

    @staticmethod
    def is_cc_row(obj: Any) -> bool:
        try:
            return obj[PYCLASS_KEY] == _CC_PYCLASS
        except (KeyError, TypeError, ValueError, IndexError):
            return False
