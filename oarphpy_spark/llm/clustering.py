"""Lightweight distributed k-means for IVF centroid training.

The IVF index (:func:`oarphpy_spark.llm.similarity.ivf_topk`) takes
"centroids from an offline training step" as input; this is that step,
implemented the way an iterative algorithm should run on Spark:

* each iteration is ONE job over the corpus: an Arrow-batched
  ``mapInPandas`` emits per-batch partials ``(cell, n, sum_vec)`` —
  at most ``k`` rows per ~10k-row batch, so the driver collects
  O(num_batches x k) tiny rows, never data;
* the driver merges partials in sorted order (deterministic float
  addition) and recomputes means — the same map-side-combine shape as
  MLlib's treeAggregate;
* initialization is the first ``k`` DISTINCT vectors by id (duplicate
  vectors in the head of the corpus would otherwise seed coincident
  centroids whose ties always break the same way, leaving permanently
  empty cells) — deterministic, so training is reproducible.

No UDF in the final index: the trained centroids feed ``ivf_topk``
as plain literals.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    max_iters: int = 10,
    tol: float = 1e-6,
) -> list[tuple[int, list[float]]]:
    """Train ``k`` centroids; returns ``[(cell, centroid), ...]`` in
    the exact shape ``ivf_topk(centroids=...)`` accepts."""
    # First k DISTINCT vectors by id: scan a bounded head (k + slack),
    # dedupe driver-side preserving id order. The head is tiny (k is
    # the number of IVF cells, not data-sized).
    head = (
        df.orderBy(id_col).select(vec_col).limit(max(4 * k, k + 64)).collect()
    )
    seen: set[tuple] = set()
    init: list[list[float]] = []
    for r in head:
        key = tuple(float(x) for x in r[vec_col])
        if key not in seen:
            seen.add(key)
            init.append(list(key))
        if len(init) == k:
            break
    if len(init) < k:
        raise ValueError(
            f"need at least k={k} distinct vectors, found {len(init)}"
        )
    cents = np.array(init)
    dim = cents.shape[1]
    # One scan per iteration is the algorithm; without a persist it
    # would also be one SOURCE READ per iteration.
    vecs = df.select(F.col(vec_col).alias("v")).persist()

    partial_schema = "cell int, n long, s array<double>"

    try:
        for _ in range(max_iters):
            cm = cents  # closure snapshot for this iteration

            def partials(
                batches: Iterator[pd.DataFrame],
            ) -> Iterator[pd.DataFrame]:
                from oarphpy_spark.functions.vectors_np import pairwise_sq_dists

                for pdf in batches:
                    M = np.stack(pdf["v"].to_numpy()).astype(np.float64)
                    cell = np.argmin(pairwise_sq_dists(M, cm), axis=1)
                    rows = []
                    for c in np.unique(cell):
                        sub = M[cell == c]
                        rows.append(
                            {
                                "cell": int(c),
                                "n": int(sub.shape[0]),
                                "s": sub.sum(axis=0).tolist(),
                            }
                        )
                    yield pd.DataFrame(rows, columns=["cell", "n", "s"])

            got = vecs.mapInPandas(partials, schema=partial_schema).collect()
            counts = np.zeros(k)
            sums = np.zeros((k, dim))
            # sorted merge -> deterministic float accumulation order
            for r in sorted(got, key=lambda r: (r["cell"], r["n"], tuple(r["s"]))):
                counts[r["cell"]] += r["n"]
                sums[r["cell"]] += np.array(r["s"])
            new_cents = cents.copy()
            nonzero = counts > 0
            new_cents[nonzero] = sums[nonzero] / counts[nonzero, None]
            shift = float(np.abs(new_cents - cents).max())
            cents = new_cents
            if shift <= tol:
                break
    finally:
        vecs.unpersist()

    return [(i, cents[i].tolist()) for i in range(k)]


def inertia(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
) -> float:
    """Sum of squared distances to each vector's nearest centroid —
    the k-means objective, computed in one distributed pass."""
    cm = np.array([c for _, c in sorted(centroids)], dtype=np.float64)

    def batch_inertia(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from oarphpy_spark.functions.vectors_np import pairwise_sq_dists

        for pdf in batches:
            M = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            d = pairwise_sq_dists(M, cm)
            yield pd.DataFrame({"partial": [float(d.min(axis=1).sum())]})

    parts = (
        df.select(F.col(vec_col).alias("v"))
        .mapInPandas(batch_inertia, schema="partial double")
        .collect()
    )
    return float(sum(sorted(r["partial"] for r in parts)))
