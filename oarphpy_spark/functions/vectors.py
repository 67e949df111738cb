"""Vector math as JVM-side column expressions.

No UDFs: ``F.zip_with`` + ``F.aggregate`` keep dot products inside
whole-stage codegen — at 100 TB this is the difference between a scan-
bound job and a Python-worker-bound one. (``q_pandas_udf_norm`` shows
the Arrow-UDF alternative; these built-in forms are the hot path.)

All math in double; left-to-right accumulation matches DuckDB's list
function evaluation order, so results are bit-identical cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a, b) -> Column:
    products = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(products, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
