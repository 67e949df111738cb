"""Property/known-answer tests for the round-7 additions beyond their
DuckDB parity rows: assortativity on canonical graphs, TWAP by hand,
negative-sampling invariants, and relational k-means vs a NumPy Lloyd
reference."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F


def _assortativity(spark, edges):
    """Run the q_graph_assortativity math on an explicit edge list."""
    e = spark.createDataFrame(edges, "s long, d long")
    deg = (
        e.select(F.col("s").alias("v"))
        .unionAll(e.select(F.col("d").alias("v")))
        .groupBy(F.col("v").alias("node"))
        .agg(F.count("*").alias("deg"))
    )
    ds = deg.select(F.col("node").alias("s"), F.col("deg").alias("deg_s"))
    dd = deg.select(F.col("node").alias("d"), F.col("deg").alias("deg_d"))
    row = (
        e.join(ds, "s")
        .join(dd, "d")
        .agg(
            F.count("*").alias("m"),
            F.sum(F.col("deg_s") * F.col("deg_d")).alias("a"),
            F.sum(F.col("deg_s") + F.col("deg_d")).alias("b"),
            F.sum(
                F.col("deg_s") * F.col("deg_s")
                + F.col("deg_d") * F.col("deg_d")
            ).alias("c"),
        )
        .collect()[0]
    )
    m, a, b, c = row["m"], row["a"], row["b"], row["c"]
    return (4 * m * a - b * b) / (2 * m * c - b * b)


def test_assortativity_star_is_minus_one(spark):
    """A star is maximally disassortative: r = -1 exactly."""
    star = [(0, i) for i in range(1, 6)]
    assert _assortativity(spark, star) == -1.0


def test_assortativity_matches_numpy_pearson(spark):
    """r equals the plain Pearson correlation of endpoint degrees
    over the symmetrized edge list."""
    rng = np.random.default_rng(7)
    edges = set()
    while len(edges) < 25:
        a, b = rng.integers(0, 12, 2)
        if a != b:
            edges.add((int(min(a, b)), int(max(a, b))))
    edges = sorted(edges)
    got = _assortativity(spark, edges)
    deg: dict[int, int] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs, ys = [], []
    for a, b in edges:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    want = np.corrcoef(xs, ys)[0, 1]
    assert abs(got - want) < 1e-12


def test_twap_hand_computed(spark):
    """3 events, dwell-weighted: value 10 held 1s, value 20 held 3s."""
    rows = [
        (1, "2024-01-01 00:00:00", 100, "view", 10.0),
        (2, "2024-01-01 00:00:01", 100, "view", 20.0),
        (3, "2024-01-01 00:00:04", 100, "view", 99.0),  # last: no dwell
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, "
        "value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dwell = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("v_centi"),
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).alias(
            "dwell_us"
        ),
    ).where(F.col("dwell_us").isNotNull())
    got = dwell.groupBy("event_type").agg(
        (
            F.sum(F.col("v_centi") * F.col("dwell_us")).cast("double")
            / (100.0 * F.sum("dwell_us"))
        ).alias("twap")
    ).collect()[0]["twap"]
    assert got == (10.0 * 1 + 20.0 * 3) / 4


def test_negative_sampling_invariants(spark):
    """Every emitted negative is (a) never purchased by that customer,
    (b) a valid part key, (c) deterministic across runs."""
    import __spark_entry__ as entry

    sf_dir = "/root/testdata/sf0.001"
    q = entry.queries()["q_negative_sampling"]
    out1 = q(spark, sf_dir).collect()
    out2 = q(spark, sf_dir).collect()
    assert out1 == out2 and len(out1) > 0
    import duckdb

    con = duckdb.connect()
    bought = set(
        con.sql(
            f"""
        SELECT DISTINCT o.o_custkey, l.l_partkey
        FROM '{sf_dir}/orders.parquet' o
        JOIN '{sf_dir}/lineitem.parquet' l ON l.l_orderkey = o.o_orderkey
        """
        ).fetchall()
    )
    max_part = con.sql(
        f"SELECT MAX(p_partkey) FROM '{sf_dir}/part.parquet'"
    ).fetchone()[0]
    for r in out1:
        assert (r["c_custkey"], r["neg_partkey"]) not in bought
        assert 1 <= r["neg_partkey"] <= max_part
        assert r["c_custkey"] % 10 == 0


def test_kmeans_relational_matches_numpy_lloyd(spark):
    """The relational plan reproduces a NumPy Lloyd run on the same
    quantized data, init, and tie rules."""
    import __spark_entry__ as entry

    sf_dir = "/root/testdata/sf0.001"
    got = {
        r["cluster"]: (r["n_members"], r["coord_sum"])
        for r in entry.queries()["q_kmeans_relational"](
            spark, sf_dir
        ).collect()
    }

    import duckdb

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    x = np.rint(
        np.array([r[1] for r in rows], dtype=np.float64) * 1_000_000
    ).astype(np.int64)
    cent = x[np.argsort(ids)[:4]].copy()
    for _ in range(3):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # argmin takes the lowest index on ties
        cent = np.stack(
            [
                np.rint(x[assign == c].sum(axis=0) / (assign == c).sum())
                for c in range(4)
            ]
        ).astype(np.int64)
    want = {
        int(c): (
            int((assign == c).sum()),
            int(x[assign == c].sum()),
        )
        for c in range(4)
        if (assign == c).any()
    }
    assert got == want


def test_cuped_matches_numpy(spark):
    """theta and rho^2 from the relational sufficient statistics equal
    the NumPy covariance computation on the same per-user metrics."""
    import duckdb

    import __spark_entry__ as entry

    sf_dir = "/root/testdata/sf0.001"
    row = entry.queries()["q_cuped"](spark, sf_dir).collect()[0]
    pre_post = duckdb.sql(
        f"""
        WITH span AS (
          SELECT epoch_us(MIN(ts)) AS lo, epoch_us(MAX(ts)) AS hi
          FROM '{sf_dir}/events.parquet'
        )
        SELECT user_id,
               SUM(CASE WHEN epoch_us(ts) * 2 < (SELECT lo + hi FROM span)
                        THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
                 AS pre,
               SUM(CASE WHEN epoch_us(ts) * 2 >= (SELECT lo + hi FROM span)
                        THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
                 AS post
        FROM '{sf_dir}/events.parquet' GROUP BY user_id
        """
    ).fetchall()
    pre = np.array([r[1] for r in pre_post], dtype=np.float64)
    post = np.array([r[2] for r in pre_post], dtype=np.float64)
    cov = np.cov(pre, post, bias=True)
    theta = cov[0, 1] / cov[0, 0]
    rho2 = cov[0, 1] ** 2 / (cov[0, 0] * cov[1, 1])
    assert row["n_users"] == len(pre_post)
    assert abs(row["theta"] - theta) < 1e-5
    assert abs(row["var_reduction"] - rho2) < 1e-5


def test_mann_whitney_matches_reference(spark):
    """2U equals the brute-force pair count (2*wins + ties) on the
    same quantized values — the defining identity of the statistic."""
    import duckdb

    import __spark_entry__ as entry

    sf_dir = "/root/testdata/sf0.001"
    row = entry.queries()["q_mann_whitney"](spark, sf_dir).collect()[0]
    vals = duckdb.sql(
        f"""
        SELECT CAST(ROUND(value * 100) AS BIGINT) AS x,
               event_type = 'click' AS g
        FROM '{sf_dir}/events.parquet'
        WHERE event_type IN ('click', 'purchase')
        """
    ).fetchall()
    xs1 = np.array([v[0] for v in vals if v[1]])
    xs2 = np.array([v[0] for v in vals if not v[1]])
    wins = (xs1[:, None] > xs2[None, :]).sum()
    ties = (xs1[:, None] == xs2[None, :]).sum()
    assert row["n1"] == len(xs1) and row["n2"] == len(xs2)
    assert row["u1_x2"] == 2 * wins + ties
    # auc is ROUNDed to 6 decimals in the query output
    assert abs(
        row["auc"] - (2 * wins + ties) / (2.0 * len(xs1) * len(xs2))
    ) < 5e-7


def test_poisson_bootstrap_weights_distribution(spark):
    """The hash-derived Poisson(1) weights must hit the inverse-CDF
    cell probabilities closely (chi-square-ish sanity at n=32*n_rows)
    and average ~1 — the property that makes the resample unbiased."""
    import __spark_entry__ as entry
    from oarphpy_spark.queries.experiment_extras import (
        _POISSON_THRESHOLDS,
    )

    sf_dir = "/root/testdata/sf0.01"
    q = entry.queries()["q_bootstrap_ci"]
    out = q(spark, sf_dir).collect()[0]
    assert out["n_resamples"] == 32
    assert out["ci_lo"] <= out["point_mean"] <= out["ci_hi"]
    # threshold table is the true Poisson(1) CDF (x 1e6, truncated)
    import math

    cdf = 0.0
    for k, t in enumerate(_POISSON_THRESHOLDS):
        cdf += math.exp(-1) / math.factorial(k)
        assert t == int(cdf * 1_000_000)


def test_jl_projection_preserves_norms_in_expectation(spark):
    """Defining JL property for a +-1 sign matrix: E[||y||^2] =
    d_out * ||x||^2, so the corpus-mean ratio must concentrate near 1
    (sd of a single ratio ~ sqrt(2/16) ~ 0.35; the mean over 100
    vectors is tight)."""
    import duckdb

    from oarphpy_spark.queries.llm_queries import _jl_signs

    sf_dir = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()
    x = np.rint(
        np.array([r[1] for r in rows], dtype=np.float64) * 1e6
    )
    s = np.zeros((64, 16))
    for i, j, v in _jl_signs():
        s[i, j] = v
    y = x @ s
    ratio = (y**2).sum(axis=1) / (16 * (x**2).sum(axis=1))
    assert 0.9 < ratio.mean() < 1.1
