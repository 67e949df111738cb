"""Embedding-column preparation operators.

Storage/serving prep for vector corpora at scale: unit-normalize and
int8-quantize embedding columns. Both are single-pass column
expressions (scan-bound, no shuffle); quantization cuts vector bytes
4x for float32 inputs, which at 100 TB is the difference between a
corpus that fits the ANN serving tier and one that doesn't.

Kept as JVM expressions (not a Pandas UDF) because the quantized
VALUES are the output — the sequential-fold norm plus per-element
round matches the SQL oracle bit-for-bit, where BLAS summation order
might not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oarphpy_spark.functions.vectors import l2_norm


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Unit-normalize then quantize each component to int8 in [-127,
    127]: q_i = round(127 * v_i / ||v||). Output keeps the scalar
    inverse-scale needed to dequantize (||v||/127).

    Zero vectors quantize to all-zero with scale NULL."""
    v = F.col(vec_col)
    norm = l2_norm(v)
    q = F.transform(
        v,
        lambda x: F.when(
            norm > 0, F.round(x.cast("double") * 127.0 / norm, 0)
        ).otherwise(F.lit(0.0)).cast("int"),
    )
    return df.select(
        F.col(id_col),
        q.alias("q"),
        F.when(norm > 0, norm / 127.0).alias("inv_scale"),
    )
