"""The local parity comparator must be representation-exact like the
driver's value hash: a bigint, a double, and a Decimal carrying the
same value are DIFFERENT (round-5 shipped two red driver rows because
the old comparator coerced everything through float())."""

from __future__ import annotations

from decimal import Decimal

import pandas as pd

from oarphpy_spark.testing.parity import _cells_match, compare


def test_int_vs_float_mismatch():
    assert not _cells_match(2977, 2977.0)
    assert _cells_match(2977, 2977)
    assert _cells_match(2977.0, 2977.0)


def test_decimal_vs_float_mismatch():
    assert not _cells_match(Decimal("11091.760000"), 11091.76)
    assert _cells_match(Decimal("11091.76"), Decimal("11091.760000"))


def test_bool_is_not_int():
    assert not _cells_match(True, 1)
    assert _cells_match(True, True)


def test_float_last_ulp_tolerance():
    a = 0.1 + 0.2
    assert _cells_match(a, 0.3)
    assert not _cells_match(1.0, 1.0 + 1e-6)


def test_compare_catches_tpch_q12_class_defect():
    spark = pd.DataFrame({"flag": ["A"], "n": pd.array([2977], dtype="int64")})
    oracle = pd.DataFrame({"flag": ["A"], "n": pd.array([2977.0])})
    assert compare(spark, oracle), "int64 vs float64 must be a mismatch"
    assert not compare(spark, spark.copy())
