"""Driver/executor-side utilities (capability parity with the
reference's ``oarphpy/util/misc.py``; fresh implementations).
"""

from __future__ import annotations

import hashlib
import itertools
import pickle
import sys
from collections import OrderedDict
from typing import Any, Iterable, Iterator


def stable_hash(x: Any) -> int:
    """Deterministic 128-bit content hash of any picklable value.

    Python's builtin ``hash`` is salted per process (PYTHONHASHSEED), so
    it cannot key distributed work; pickle+md5 is stable across runs and
    machines (same approach as reference ``oarphpy/util/misc.py:89-122``).
    For DataFrame columns use ``F.md5`` / ``F.xxhash64`` instead — this
    is for arbitrary Python values.
    """
    data = pickle.dumps(x, protocol=4)
    return int.from_bytes(hashlib.md5(data).digest(), "big")


def get_size_of_deep(v: Any) -> int:
    """Recursive in-memory byte estimate of a nested value (ndarray
    fast-path via .nbytes; containers traversed; reference analog:
    ``oarphpy/util/misc.py:47-86``)."""
    seen: set[int] = set()

    def sz(x: Any) -> int:
        if id(x) in seen:
            return 0
        seen.add(id(x))
        nbytes = getattr(x, "nbytes", None)
        if nbytes is not None and isinstance(nbytes, int):
            return nbytes
        if isinstance(x, (str, bytes, bytearray)):
            return len(x)
        if isinstance(x, dict):
            return sum(sz(k) + sz(val) for k, val in x.items())
        if isinstance(x, (list, tuple, set, frozenset)):
            return sum(sz(e) for e in x)
        if hasattr(x, "__dict__"):
            return sz(x.__dict__)
        if hasattr(x, "__slots__"):
            return sum(sz(getattr(x, s)) for s in x.__slots__ if hasattr(x, s))
        return sys.getsizeof(x, 8)

    return sz(v)


def ichunked(seq: Iterable, n: int) -> Iterator[list]:
    """Yield lists of up to ``n`` items (reference
    ``oarphpy/util/misc.py:125-136``)."""
    it = iter(seq)
    while True:
        chunk = list(itertools.islice(it, n))
        if not chunk:
            return
        yield chunk


def roundrobin(*seqs: Iterable) -> Iterator:
    """Interleave sequences until all are exhausted (reference
    ``oarphpy/util/misc.py:139-154``)."""
    iters = [iter(s) for s in seqs]
    while iters:
        nxt = []
        for it in iters:
            try:
                yield next(it)
                nxt.append(it)
            except StopIteration:
                pass
        iters = nxt


def as_row_of_constants(obj: Any) -> "OrderedDict[str, Any]":
    """Flatten an object's UPPERCASE constants (recursively) into one
    row for experiment tracking (reference ``oarphpy/util/misc.py:
    158-191``)."""
    row: "OrderedDict[str, Any]" = OrderedDict()
    for name in sorted(dir(obj)):
        if not name.isupper():
            continue
        val = getattr(obj, name)
        if callable(val):
            continue
        if isinstance(val, (bool, int, float, str, bytes, type(None))):
            row[name] = val
        elif isinstance(val, (list, tuple, dict)):
            row[name] = repr(val)
        else:
            nested = as_row_of_constants(val)
            if nested:
                for k, v in nested.items():
                    row[f"{name}_{k}"] = v
            else:
                row[name] = repr(val)
    return row
