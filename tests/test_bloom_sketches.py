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
    from oarphpy_spark.operators.sketches import approx_heavy_hitters

    # skewed domain: value v appears ~ 60000/(v+1) times (zipf-ish)
    df = spark.range(120_000).select(
        (F.floor(F.sqrt(F.col("id") % 60_000))).cast("long").alias("v")
    )
    exact = {
        r["v"]: r["n"]
        for r in df.groupBy("v").agg(F.count("*").alias("n")).collect()
    }
    true_top10 = sorted(exact, key=lambda v: (-exact[v], v))[:10]

    got = approx_heavy_hitters(df, "v", k=10, capacity=2048)
    got_vals = [v for v, _ in got]
    # the guarantee: every value with count > N/capacity must appear
    n_total = 120_000
    for v, n in exact.items():
        if n > n_total / 2048 and v in true_top10:
            assert v in got_vals, (v, n)
    # approximate counts never exceed the truth + are within bound
    for v, n in got:
        assert n <= exact[v]
        assert n >= exact[v] - n_total / 2048
