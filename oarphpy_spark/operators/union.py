"""Schema-merging union.

Capability parity with the reference's ``union_dfs``
(reference ``oarphpy/spark.py:149-192``), which hand-built NULL-typed
missing columns per frame. Spark >=3.1 expresses the whole operation as
``unionByName(allowMissingColumns=True)`` — pure Catalyst, no
driver-side schema surgery — so that is the implementation; we keep the
reference's conflict check (same column name, different type) as an
explicit, early, readable error instead of Catalyst's cast failure.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


class SchemaConflict(ValueError):
    pass


def union_dfs(*dfs: DataFrame) -> DataFrame:
    """Union N DataFrames; columns missing from a frame become typed NULLs.

    Raises ``SchemaConflict`` when two frames declare the same column
    name with different types (the reference asserts the same —
    ``oarphpy/spark.py:170-176``).
    """
    if not dfs:
        raise ValueError("union_dfs needs at least one DataFrame")
    seen: dict[str, str] = {}
    for df in dfs:
        for name, dtype in df.dtypes:
            if name in seen and seen[name] != dtype:
                raise SchemaConflict(
                    f"column {name!r}: {seen[name]} vs {dtype} — cast explicitly first"
                )
            seen.setdefault(name, dtype)
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)
