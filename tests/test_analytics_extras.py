"""Property tests for round-7 analytics operators: covariance
partials vs numpy, interval-union sweep vs brute force."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


# Slow tier: randomized partials-vs-numpy property (~12 s);
# q_covariance_matrix's exact oracle stays default.
@pytest.mark.slow
def test_covariance_partials_match_numpy(spark):
    """Distributed integer Gram partials == single-machine numpy on
    the same quantized data, regardless of partitioning."""
    from oarphpy_spark.llm.embeddings import covariance_partials

    rng = np.random.default_rng(7)
    d, n = 5, 400
    x = rng.normal(size=(n, d)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    ).repartition(7)
    sums = {
        (r.i, r.j): r.s
        for r in covariance_partials(df, "embedding", scale=1e4).collect()
    }
    q = np.rint(x.astype(np.float64) * 1e4).astype(np.int64)
    gram = q.T @ q
    assert sums[(-1, -1)] == n
    for i in range(d):
        assert sums[(i, -1)] == q[:, i].sum()
        for j in range(i, d):
            assert sums[(i, j)] == gram[i, j], (i, j)


def test_covariance_query_matches_numpy_cov(spark, tmp_path):
    """End-to-end q_embedding_covariance == np.cov of the quantized
    vectors (ddof=1) within the declared rounding."""
    import oarphpy_spark.queries  # noqa: F401
    from oarphpy_spark import registry

    rng = np.random.default_rng(11)
    d, n = 4, 120
    x = rng.normal(size=(n, d)).astype(np.float32)
    (tmp_path / "embeddings.parquet").parent.mkdir(exist_ok=True)
    spark.createDataFrame(
        [(i, [float(v) for v in row], 0) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    got = {
        (r.i, r.j): r.cov
        for r in registry.queries()["q_embedding_covariance"](
            spark, str(tmp_path)
        ).collect()
    }
    q = np.rint(x.astype(np.float64) * 1e4).astype(np.int64) / 1e4
    want = np.cov(q.T, ddof=1)
    for i in range(d):
        for j in range(i, d):
            assert got[(i, j)] == pytest.approx(want[i, j], abs=1e-7)


def test_interval_coverage_matches_brute_force(spark, tmp_path):
    """Relational sweep == brute-force interval-union on random
    overlapping intervals."""
    import random

    import oarphpy_spark.queries  # noqa: F401
    from oarphpy_spark import registry

    rng = random.Random(5)
    rows = []
    eid = 0
    base = 1_700_000_000_000_000  # epoch micros
    for u in range(6):
        for _ in range(rng.randint(1, 40)):
            ts = base + rng.randint(0, 3 * 3600) * 1_000_000
            rows.append((eid, ts, u, "click", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts_us long, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType", None)
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    try:
        df.write.parquet(str(tmp_path / "events.parquet"))
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    got = {
        r.user_id: (r.covered_us, r.n_islands)
        for r in registry.queries()["q_interval_coverage"](
            spark, str(tmp_path)
        ).collect()
    }
    width = 30 * 60 * 1_000_000
    by_user = {}
    for _, ts, u, *_rest in rows:
        by_user.setdefault(u, []).append((ts, ts + width))
    for u, ivs in by_user.items():
        ivs.sort()
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        want = (sum(e - s for s, e in merged), len(merged))
        assert got[u] == want, u
