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

Build = one Arrow-batched ``mapInPandas`` pass over the dim keys
emitting per-batch packed bit arrays, OR-merged on the driver (a few
hundred KB per partial, never rows). Probe = a vectorized
``pandas_udf`` closed over the broadcast bits.

Hashing: double hashing h_i = h1 + i*h2 (Kirsch-Mitzenmacher) over
the two 64-bit halves of md5(key bytes) — deterministic and
engine-portable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hash_pair(vals: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    md5 = hashlib.md5
    h1 = np.empty(len(vals), dtype=np.uint64)
    h2 = np.empty(len(vals), dtype=np.uint64)
    for i, v in enumerate(vals):
        d = md5(str(v).encode()).digest()
        h1[i] = int.from_bytes(d[:8], "big")
        h2[i] = int.from_bytes(d[8:16], "big") | 1  # odd -> full cycle
    return h1, h2


def _set_bits(h1: np.ndarray, h2: np.ndarray, num_bits: int, k: int) -> np.ndarray:
    bits = np.zeros(num_bits // 64 + 1, dtype=np.uint64)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(num_bits)
        np.bitwise_or.at(bits, (idx >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (idx & np.uint64(63)))
    return bits


def build_bloom(
    dim: DataFrame, key_col: str, num_bits: int = 1 << 20, num_hashes: int = 5
) -> np.ndarray:
    """Distributed Bloom build over ``dim[key_col]``: per-batch packed
    uint64 bit arrays, OR-merged driver-side. Partial size is
    ``num_bits/8`` bytes regardless of row count."""
    n_words = num_bits // 64 + 1

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros(n_words, dtype=np.uint64)
        any_rows = False
        for pdf in batches:
            if not len(pdf):
                continue
            any_rows = True
            h1, h2 = _hash_pair(pdf["k"])
            acc |= _set_bits(h1, h2, num_bits, num_hashes)
        if any_rows:
            yield pd.DataFrame({"bits": [acc.astype("int64").tobytes()]})

    got = (
        dim.select(F.col(key_col).alias("k"))
        .mapInPandas(partials, schema="bits binary")
        .collect()
    )
    bits = np.zeros(n_words, dtype=np.uint64)
    for r in got:
        bits |= np.frombuffer(bytes(r["bits"]), dtype=np.int64).astype(np.uint64)
    return bits


def bloom_filter_column(
    bits: np.ndarray, num_bits: int, num_hashes: int, key
) -> "F.Column":
    """Vectorized might-contain probe over the (closure-broadcast)
    bits. False positives possible, false negatives impossible."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def might_contain(vals: pd.Series) -> pd.Series:
        h1, h2 = _hash_pair(vals)
        ok = np.ones(len(vals), dtype=bool)
        for i in range(num_hashes):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(num_bits)
            word = bits[(idx >> np.uint64(6)).astype(np.int64)]
            ok &= (word >> (idx & np.uint64(63))) & np.uint64(1) != 0
        return pd.Series(ok)

    return might_contain(key)


def bloom_prejoin(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """``fact JOIN dim USING (key)`` with the fact side Bloom-pruned
    inside its scan first. Result is EXACTLY the plain join (the join
    removes Bloom false positives); the win is shuffle volume —
    non-matching fact rows die before the exchange."""
    bits = build_bloom(dim, key, num_bits, num_hashes)
    pruned = fact.filter(
        bloom_filter_column(bits, num_bits, num_hashes, F.col(key))
    )
    return pruned.join(dim, key)
