from __future__ import annotations

import numpy as np

from oarphpy_spark.util.misc import (
    as_row_of_constants,
    get_size_of_deep,
    ichunked,
    roundrobin,
    stable_hash,
)
from oarphpy_spark.util.thruput import ThruputObserver


def test_stable_hash_deterministic():
    # Golden-pinned (the reference pins exact ints the same way,
    # test_util/test_misc.py:115-126); any change to the hash scheme
    # must be deliberate.
    assert stable_hash("foo") == stable_hash("foo")
    assert stable_hash("foo") != stable_hash("bar")
    assert stable_hash((1, "a", 2.0)) == stable_hash((1, "a", 2.0))
    assert stable_hash("foo") == 213382587982286575857915470163185872516


def test_size_of_deep():
    assert get_size_of_deep(b"x" * 10) == 10
    assert get_size_of_deep("hello") == 5
    assert get_size_of_deep(np.zeros(100, dtype=np.int64)) == 800
    assert get_size_of_deep({"k": b"abcd"}) == 5  # 1-char key + 4 bytes
    shared = [1, 2, 3]
    assert get_size_of_deep([shared, shared]) == get_size_of_deep([shared])


def test_ichunked():
    assert list(ichunked(range(7), 3)) == [[0, 1, 2], [3, 4, 5], [6]]
    assert list(ichunked([], 3)) == []


def test_roundrobin():
    assert list(roundrobin("abc", "d", "ef")) == ["a", "d", "e", "b", "f", "c"]


def test_as_row_of_constants():
    class Inner:
        DEPTH = 2

    class Cfg:
        ALPHA = 1
        NAME = "x"
        NESTED = Inner()
        lower_ignored = True

    row = as_row_of_constants(Cfg())
    assert row["ALPHA"] == 1 and row["NAME"] == "x"
    assert row["NESTED_DEPTH"] == 2
    assert "lower_ignored" not in row


def test_thruput_observer():
    obs = ThruputObserver("t")
    for _ in range(4):
        with obs:
            pass
        obs.n += 10
        obs.num_bytes += 100
    assert obs.n == 40 and obs.num_bytes == 400
    assert len(obs.latencies_sec) == 4
    merged = ThruputObserver.union([obs, obs])
    assert merged.n == 80
    pct = obs.percentiles()
    assert set(pct) == {0.5, 0.95, 0.99}
    assert "n=40" in str(obs)


def test_thruput_wrap_generator():
    obs = ThruputObserver("g")
    out = list(obs.wrap_generator(iter([b"ab", b"cdef"]), size_of=len))
    assert out == [b"ab", b"cdef"]
    assert obs.n == 2 and obs.num_bytes == 6
