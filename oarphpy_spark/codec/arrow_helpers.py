"""Arrow-side helpers for Tensor columns.

The codec stores tensors either as SQL-queryable ``values`` arrays or
packed bytes (codec.tensor). These helpers convert between the two
representations AT SCALE — executor-side, Arrow-batched — so ML feeds
and SQL analytics can each get the layout they want without a
driver-side decode loop.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


def tensor_values_as_arrays(
    df: DataFrame, tensor_col: str, out_col: str = "values", dtype: str = "float64"
) -> DataFrame:
    """Add ``out_col``: array<double> of the tensor's (flattened)
    values, decoding packed bytes executor-side via mapInPandas.

    Turns any tensor column — packed or not — into a plain SQL array
    usable by F.aggregate / similarity operators."""
    fields = ", ".join(f"{n} {t}" for n, t in df.dtypes if n != tensor_col)
    schema = f"{fields}, {out_col} array<double>" if fields else f"{out_col} array<double>"
    other_cols = [n for n, _ in df.dtypes if n != tensor_col]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = []
            for t in pdf[tensor_col]:
                packed = t["values_packed"]
                if packed is not None and len(packed) > 0:
                    arr = np.frombuffer(bytes(packed), dtype=np.dtype(t["dtype"]))
                else:
                    arr = np.asarray(list(t["values"]), dtype=np.dtype(t["dtype"]))
                vals.append(arr.astype(np.float64).ravel().tolist())
            out = pdf[other_cols].copy()
            out[out_col] = vals
            yield out

    return df.mapInPandas(decode, schema=schema)
