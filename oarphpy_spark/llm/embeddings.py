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


def covariance_partials(
    df: DataFrame, vec_col: str = "embedding", scale: float = 1e4
) -> DataFrame:
    """Per-Arrow-batch INTEGER partial sufficient statistics for the
    embedding covariance matrix: each batch contributes one numpy
    int64 Gram matrix Q^T Q (upper triangle), the per-dimension column
    sums, and a row count — the classic 'covariance in one pass'
    decomposition, vectorized batch-side so the shuffle carries
    O(batches x d^2) tiny rows instead of O(rows x d^2) expanded
    pairs.

    Elements are quantized to integers (``round(x * scale)``) BEFORE
    any arithmetic, so partials combine exactly under addition — the
    property float partials lack (summation-order drift) and the
    reason the result can sit under a value-hash oracle. Row encoding:
    ``(i, j, s)`` with 0-based dims for Gram cells (i <= j),
    ``(i, -1, s)`` for column sums, ``(-1, -1, n)`` for counts;
    ``groupBy(i, j).sum`` finishes the reduction.
    """
    from pyspark.sql import functions as F  # noqa: F401

    def partials(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            q = np.rint(
                np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                * scale
            ).astype(np.int64)
            gram = q.T @ q
            d = gram.shape[0]
            iu, ju = np.triu_indices(d)
            out_i = np.concatenate([iu, np.arange(d), [-1]])
            out_j = np.concatenate([ju, np.full(d, -1), [-1]])
            out_s = np.concatenate(
                [gram[iu, ju], q.sum(axis=0), [len(pdf)]]
            )
            yield pd.DataFrame({"i": out_i, "j": out_j, "s": out_s})

    parts = df.select(vec_col).mapInPandas(
        partials, schema="i int, j int, s long"
    )
    return parts.groupBy("i", "j").agg(F.sum("s").alias("s"))
