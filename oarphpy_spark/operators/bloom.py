"""Bloom-filter semi-join pruning.

The scale gap this fills: a dimension table too big to broadcast
forces a shuffle join of the full fact table — even when only a few
percent of fact rows survive. Its KEY SET, however, fits a Bloom
filter (bits, not rows), so the fact side can be pre-filtered inside
its scan and the expensive shuffle moves only surviving rows (plus a
bounded false-positive trickle). The exact join afterwards removes
false positives, so results are IDENTICAL to the plain join — which is
what makes the operator oracle-checkable.

(Spark's own runtime row-group filtering does this JVM-side when it
can; ``bloom_filter_agg`` is not exposed to the public API, so this is
the engine-native equivalent built from public pieces.)

Hashing happens ENGINE-side: two ``xxhash64`` columns (different
seeds) feed Kirsch-Mitzenmacher double hashing h_i = h1 + i*h2, so no
Python-level hash runs per row anywhere, and the hash sees the typed
JVM value — immune to Arrow's int->float coercion of nullable batches
(hashing ``str()`` of pandas cells produced FALSE NEGATIVES when a
batch contained a NULL: '1' became '1.0').

Build = one Arrow-batched ``mapInPandas`` pass over the (h1, h2)
columns emitting per-batch packed bit arrays, OR-merged on the driver
(a few hundred KB per partial, never rows). Probe = numpy bit tests
over the broadcast bits.

Key columns must share a data type on both sides — ``xxhash64(1L)``
and ``xxhash64(1.0)`` differ; ``bloom_prejoin`` enforces this.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEED1, _SEED2 = 42, 7919


def _hash_cols(key: Column) -> list[Column]:
    # second hash forced odd -> full cycle mod any power-of-two bits
    return [
        F.xxhash64(key, F.lit(_SEED1)).alias("__h1"),
        F.xxhash64(key, F.lit(_SEED2)).bitwiseOR(F.lit(1)).alias("__h2"),
    ]


def _set_bits(h1: np.ndarray, h2: np.ndarray, num_bits: int, k: int) -> np.ndarray:
    bits = np.zeros(num_bits // 64 + 1, dtype=np.uint64)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(num_bits)
        np.bitwise_or.at(
            bits,
            (idx >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (idx & np.uint64(63)),
        )
    return bits


def build_bloom(
    dim: DataFrame, key_col: str, num_bits: int = 1 << 20, num_hashes: int = 5
) -> np.ndarray:
    """Distributed Bloom build over ``dim[key_col]`` (NULL keys are
    excluded — they never equi-join anyway): per-batch packed uint64
    bit arrays, OR-merged driver-side. Partial size is ``num_bits/8``
    bytes regardless of row count."""
    n_words = num_bits // 64 + 1

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros(n_words, dtype=np.uint64)
        any_rows = False
        for pdf in batches:
            if not len(pdf):
                continue
            any_rows = True
            h1 = pdf["__h1"].to_numpy(dtype=np.int64).astype(np.uint64)
            h2 = pdf["__h2"].to_numpy(dtype=np.int64).astype(np.uint64)
            acc |= _set_bits(h1, h2, num_bits, num_hashes)
        if any_rows:
            yield pd.DataFrame({"bits": [acc.astype("int64").tobytes()]})

    got = (
        dim.filter(F.col(key_col).isNotNull())
        .select(*_hash_cols(F.col(key_col)))
        .mapInPandas(partials, schema="bits binary")
        .collect()
    )
    bits = np.zeros(n_words, dtype=np.uint64)
    for r in got:
        bits |= np.frombuffer(bytes(r["bits"]), dtype=np.int64).astype(np.uint64)
    return bits


def bloom_filter_column(
    bits: np.ndarray, num_bits: int, num_hashes: int, key: Column
) -> Column:
    """Might-contain probe: ``xxhash64`` pair computed engine-side, bit
    tests vectorized in numpy over the closure-broadcast bits. NULL
    keys probe False. False negatives impossible for non-NULL members.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def test_bits(
        h1s: pd.Series, h2s: pd.Series, is_null: pd.Series
    ) -> pd.Series:
        # The hash columns are NEVER null (xxhash64 of a NULL input
        # returns the seed hash), so the Arrow batch stays int64 —
        # wrapping them in when(isNotNull, ...) would make the batch
        # nullable float64 and corrupt hashes beyond 2^53 (observed as
        # false negatives). NULLness rides in its own boolean column.
        h1 = h1s.to_numpy(dtype=np.int64).astype(np.uint64)
        h2 = h2s.to_numpy(dtype=np.int64).astype(np.uint64)
        ok = np.ones(len(h1), dtype=bool)
        for i in range(num_hashes):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(num_bits)
            word = bits[(idx >> np.uint64(6)).astype(np.int64)]
            ok &= (word >> (idx & np.uint64(63))) & np.uint64(1) != 0
        ok[is_null.to_numpy(dtype=bool)] = False
        return pd.Series(ok)

    h1c, h2c = _hash_cols(key)
    return test_bits(h1c, h2c, key.isNull())


def bloom_prejoin(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
    bits: np.ndarray | None = None,
) -> DataFrame:
    """``fact JOIN dim USING (key)`` with the fact side Bloom-pruned
    inside its scan first. Result is EXACTLY the plain join (the join
    removes Bloom false positives and NULL keys never probe true); the
    win is shuffle volume — non-matching fact rows die before the
    exchange.

    NOTE: unless precomputed ``bits`` are passed, the filter build runs
    a real Spark job eagerly at construction time (callers that build
    many plans without executing them should pass ``bits`` from
    :func:`build_bloom`, cached however they cache their dims).
    """
    f_type = fact.schema[key].dataType
    d_type = dim.schema[key].dataType
    if f_type != d_type:
        raise TypeError(
            f"bloom_prejoin key types differ (fact {f_type} vs dim {d_type}); "
            "xxhash64 is type-sensitive — cast one side first"
        )
    if bits is None:
        bits = build_bloom(dim, key, num_bits, num_hashes)
    pruned = fact.filter(
        bloom_filter_column(bits, num_bits, num_hashes, F.col(key))
    )
    return pruned.join(dim, key)
