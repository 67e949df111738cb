"""k-means trainer: verified against a pure-numpy reference
implementation of Lloyd's algorithm on the collected data (same
deterministic init), plus objective-decrease and IVF integration."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from oarphpy_spark.llm.clustering import inertia, kmeans_fit
from oarphpy_spark.tables import table

from .conftest import SF_SMALL


def _numpy_lloyd(X, k, iters):
    cents = X[:k].copy()
    for _ in range(iters):
        d = (
            np.einsum("ij,ij->i", X, X)[:, None]
            - 2.0 * (X @ cents.T)
            + np.einsum("ij,ij->i", cents, cents)[None, :]
        )
        cell = np.argmin(d, axis=1)
        for c in range(k):
            if (cell == c).any():
                cents[c] = X[cell == c].mean(axis=0)
    return cents


def test_kmeans_matches_numpy_reference(spark):
    emb = table(spark, SF_SMALL, "embeddings").orderBy("vec_id")
    X = np.array([[float(x) for x in r["embedding"]] for r in emb.collect()])
    got = kmeans_fit(emb, k=4, max_iters=3, tol=0.0)
    want = _numpy_lloyd(X, k=4, iters=3)
    got_m = np.array([c for _, c in sorted(got)])
    assert np.allclose(got_m, want, rtol=1e-9, atol=1e-9)


def test_kmeans_decreases_inertia(spark):
    emb = table(spark, SF_SMALL, "embeddings")
    init = kmeans_fit(emb, k=4, max_iters=0)
    trained = kmeans_fit(emb, k=4, max_iters=5)
    assert inertia(emb, trained) <= inertia(emb, init) + 1e-9


def test_kmeans_centroids_feed_ivf(spark):
    from oarphpy_spark.llm.similarity import ivf_topk

    emb = table(spark, SF_SMALL, "embeddings")
    cents = kmeans_fit(emb, k=4, max_iters=2)
    out = ivf_topk(
        emb, emb.filter(F.col("vec_id") < 2), k=3, centroids=cents
    ).collect()
    assert len(out) == 6  # 2 queries x k=3
    assert all(r["neighbor_id"] != r["query_id"] for r in out)


def test_kmeans_requires_enough_vectors(spark):
    tiny = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id bigint, embedding array<double>"
    )
    with pytest.raises(ValueError, match="need at least"):
        kmeans_fit(tiny, k=4)
