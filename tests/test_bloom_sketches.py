from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from oarphpy_spark.operators.bloom import (
    bloom_filter_column,
    bloom_prejoin,
    build_bloom,
)
from oarphpy_spark.operators.sketches import hll_merge, hll_rollup


def test_bloom_no_false_negatives_and_low_fp(spark):
    dim = spark.range(0, 2000, 2).select(F.col("id").alias("k"))  # evens
    bits = build_bloom(dim, "k", num_bits=1 << 16, num_hashes=5)

    probe = spark.range(2000).select(F.col("id").alias("k"))
    hits = probe.filter(
        bloom_filter_column(bits, 1 << 16, 5, F.col("k"))
    ).collect()
    hit_keys = {r["k"] for r in hits}
    # every member present (no false negatives)
    assert all(k in hit_keys for k in range(0, 2000, 2))
    # false-positive rate on the 1000 odd non-members stays small
    fps = sum(1 for k in hit_keys if k % 2 == 1)
    assert fps < 50  # < 5% at these parameters (theoretical ~0.1%)


def test_bloom_prejoin_equals_plain_join(spark):
    fact = spark.range(20_000).select(
        (F.col("id") % 997).alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(40).select(
        (F.col("id") * 17 % 997).alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    ).dropDuplicates(["k"])
    got = bloom_prejoin(fact, dim, "k").groupBy("name").count().collect()
    want = fact.join(dim, "k").groupBy("name").count().collect()
    assert {(r["name"], r["count"]) for r in got} == {
        (r["name"], r["count"]) for r in want
    }


def test_bloom_survives_null_keys(spark, tmp_path):
    """Regression: hashing str() of pandas cells turned a nullable
    int64 batch into floats ('1' vs '1.0') -> false negatives. Hashing
    engine-side (xxhash64) must be immune: a NULL in the dim batch
    cannot lose the other members, and NULL fact keys probe False."""
    import pandas as pd

    pd.DataFrame({"k": [float(i) for i in range(0, 200, 2)] + [None]}).astype(
        "Int64"
    ).to_parquet(tmp_path / "dim.parquet")
    dim = spark.read.parquet(str(tmp_path / "dim.parquet")).select(
        F.col("k").cast("long").alias("k")
    )
    bits = build_bloom(dim, "k", num_bits=1 << 16, num_hashes=5)
    probe = spark.createDataFrame(
        [(i,) for i in range(0, 200, 2)] + [(None,)], "k long"
    )
    hits = {
        r["k"]
        for r in probe.filter(
            bloom_filter_column(bits, 1 << 16, 5, F.col("k"))
        ).collect()
    }
    assert set(range(0, 200, 2)).issubset(hits)  # no false negatives
    assert None not in hits  # NULL never probes true


def test_bloom_prejoin_rejects_mismatched_key_types(spark):
    fact = spark.range(10).select(F.col("id").cast("double").alias("k"))
    dim = spark.range(10).select(F.col("id").alias("k"))
    with pytest.raises(TypeError, match="key types differ"):
        bloom_prejoin(fact, dim, "k")


def test_bloom_prejoin_with_null_fact_keys(spark):
    fact = spark.createDataFrame(
        [(1, "a"), (None, "b"), (2, "c")], "k long, v string"
    )
    dim = spark.createDataFrame([(1, "x"), (None, "y")], "k long, name string")
    got = bloom_prejoin(fact, dim, "k").collect()
    want = fact.join(dim, "k").collect()
    assert {(r["k"], r["v"], r["name"]) for r in got} == {
        (r["k"], r["v"], r["name"]) for r in want
    }


def test_range_join_rejects_nonpositive_chunk(spark):
    from oarphpy_spark.operators.range_join import range_join

    pts = spark.createDataFrame([(1, 5)], "k long, t long")
    with pytest.raises(ValueError, match="chunk must be positive"):
        range_join(pts, pts, "t", "t", "t", chunk=0)


def test_hll_rollup_and_merge(spark):
    df = spark.range(100_000).select(
        (F.col("id") % 4).alias("g"),
        (F.col("id") % 5000).alias("v"),
    )
    per_group = hll_rollup(df, ["g"], "v")
    rows = {r["g"]: r["approx_distinct"] for r in per_group.collect()}
    # each group holds 1250 distinct values; HLL lg_k=12 err ~1.6%
    for g, est in rows.items():
        assert est == pytest.approx(1250, rel=0.05), (g, est)

    # merge to global from the SKETCHES (raw data never rescanned)
    merged = hll_merge(per_group.withColumn("all", F.lit(1)), ["all"])
    est = merged.collect()[0]["approx_distinct"]
    assert est == pytest.approx(5000, rel=0.05)


def test_heavy_hitters_ignores_nulls(spark):
    from oarphpy_spark.operators.sketches import approx_heavy_hitters

    df = spark.createDataFrame(
        [(1,), (1,), (2,), (None,), (None,), (None,)], "v long"
    )
    got = dict(approx_heavy_hitters(df, "v", k=5, capacity=16))
    assert got == {1: 2, 2: 1}  # NULLs never become a heavy hitter


def test_misra_gries_heavy_hitters(spark):
    """capacity (64) is far below the distinct-value count (~1001), so
    the decrement sweeps and the merge re-trim genuinely run — the
    bound assertions are not vacuous exact-counting."""
    from oarphpy_spark.operators.sketches import approx_heavy_hitters

    # 3 dominant values + a 1000-value uniform tail
    df = spark.range(120_000).select(
        F.when(F.col("id") < 50_000, 0)
        .when(F.col("id") < 80_000, 1)
        .when(F.col("id") < 100_000, 2)
        .otherwise(3 + F.col("id") % 1000)
        .cast("long")
        .alias("v")
    )
    exact = {
        r["v"]: r["n"]
        for r in df.groupBy("v").agg(F.count("*").alias("n")).collect()
    }
    n_total, capacity = 120_000, 64
    threshold = n_total / capacity  # 1875

    got = dict(approx_heavy_hitters(df, "v", k=10, capacity=capacity))
    # the guarantee: every value with count > N/capacity must appear
    for v in (0, 1, 2):
        assert exact[v] > threshold
        assert v in got, (v, exact[v])
        # reported counts only undercount, and by at most N/capacity
        assert got[v] <= exact[v]
        assert got[v] >= exact[v] - threshold
    # nothing from the 120-count tail can outrank the dominants
    top3 = sorted(got, key=lambda v: -got[v])[:3]
    assert set(top3) == {0, 1, 2}


def test_count_min_never_undercounts_and_bounds_overcount(spark):
    """CMS guarantees on a skewed synthetic stream: est >= exact for
    every key, and narrow (256-wide) rows keep the overcount within
    eps*N. Uses a tiny width to FORCE collisions so the test exercises
    the min-over-rows recovery, not a collision-free accident."""
    import math

    from oarphpy_spark.operators.sketches import (
        count_min_counts,
        count_min_estimate,
    )

    rows = []
    for k in range(50):
        rows += [(k,)] * (1 + (k % 7) * 10)  # skewed frequencies
    df = spark.createDataFrame(rows, "key bigint")
    width = 32  # deliberately tiny -> collisions guaranteed
    sketch = count_min_counts(df, "key", depth=4, width=width)
    # counter table is bounded by depth*width regardless of stream size
    assert sketch.count() <= 4 * width
    probes = df.select("key").distinct()
    est = {r.key: r.est for r in count_min_estimate(sketch, probes, "key", width).collect()}
    exact = {}
    for (k,) in rows:
        exact[k] = exact.get(k, 0) + 1
    n = len(rows)
    eps = math.e / width
    for k, c in exact.items():
        assert est[k] >= c, (k, est[k], c)
        assert est[k] <= c + eps * n, (k, est[k], c, eps * n)
