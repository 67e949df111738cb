"""Every declared query matches its DuckDB oracle at sf0.001.

This mirrors the driver's CORRECTNESS gate (which runs at sf0.01); we
use sf0.001 here to keep the suite fast and run sf0.01 in the slower
pre-commit sweep (scripts/check_parity.py).
"""

from __future__ import annotations

import pytest

from oarphpy_spark import registry
from oarphpy_spark.testing.parity import run_parity

from .conftest import SF_SMALL


def _all_query_names() -> list[str]:
    return sorted(registry.queries().keys())


@pytest.mark.parametrize("name", _all_query_names())
def test_query_matches_oracle(spark, name):
    problems = run_parity(spark, name, SF_SMALL)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert all(k in registry.oracle_sql() or True for k in e.queries())
