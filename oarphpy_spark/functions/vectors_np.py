"""numpy vector kernels shared by the Arrow-batched (pandas_udf /
mapInPandas) operators — the single definition of the expanded-L2
pairwise distance used by IVF assignment, k-means, and inertia, so a
numerical fix lands everywhere at once."""

from __future__ import annotations

import numpy as np


def pairwise_sq_dists(
    M: np.ndarray, C: np.ndarray, c_sq: np.ndarray | None = None
) -> np.ndarray:
    """(N, D) x (K, D) -> (N, K) squared L2 distances via the expanded
    form ||m||^2 - 2<m,c> + ||c||^2 (one BLAS matmul, no N*K*D temp).

    ``c_sq`` optionally supplies precomputed ||c||^2 terms — oracle-
    checked callers pass sequential-fold self-dots so the addition is
    bit-identical to their SQL counterpart."""
    if c_sq is None:
        c_sq = np.einsum("ij,ij->i", C, C)
    return (
        np.einsum("ij,ij->i", M, M)[:, None]
        - 2.0 * (M @ C.T)
        + c_sq[None, :]
    )


def round_half_up(x: np.ndarray, digits: int = 6) -> np.ndarray:
    """Decimal HALF_UP rounding (numpy's ``round`` is half-even; Spark
    and DuckDB ``round()`` are half-up), for tie semantics that must
    match SQL oracles."""
    m = 10.0 ** digits
    return np.copysign(np.floor(np.abs(x) * m + 0.5), x) / m
