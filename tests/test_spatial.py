"""Spatial grid join + DBSCAN vs brute-force references on random
point clouds (seeded — deterministic), plus plan-shape checks."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F


def _random_pts(spark, n, world, seed):
    rng = random.Random(seed)
    rows = [
        (i, rng.randrange(world), rng.randrange(world)) for i in range(n)
    ]
    return rows, spark.createDataFrame(rows, "k long, x long, y long")


@pytest.mark.parametrize("seed,radius", [(1, 40), (2, 97), (3, 150)])
def test_radius_pairs_match_brute_force(spark, seed, radius):
    from oarphpy_spark.queries.spatial import radius_pairs

    rows, df = _random_pts(spark, 300, 1000, seed)
    got = {
        (r.ak, r.bk, r.d2)
        for r in radius_pairs(df, radius).collect()
    }
    want = set()
    for ka, xa, ya in rows:
        for kb, xb, yb in rows:
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            if ka != kb and d2 <= radius * radius:
                want.add((ka, kb, d2))
    assert got == want


def _brute_dbscan(rows, eps, minpts):
    """Textbook DBSCAN with MIN-id cluster labels and MIN-cluster
    border attachment (the deterministic tiebreak the operator
    documents). Returns {k: (cluster_id, role)} with noise=(-1,
    'noise')."""
    nbrs = {k: [] for k, _, _ in rows}
    for ka, xa, ya in rows:
        for kb, xb, yb in rows:
            if ka != kb and (xa - xb) ** 2 + (ya - yb) ** 2 <= eps * eps:
                nbrs[ka].append(kb)
    core = {k for k, ns in nbrs.items() if len(ns) + 1 >= minpts}
    # CC over core-core proximity, label = min core id.
    label = {}
    for start in sorted(core):
        if start in label:
            continue
        comp, stack = [], [start]
        seen = {start}
        while stack:
            u = stack.pop()
            comp.append(u)
            for v in nbrs[u]:
                if v in core and v not in seen:
                    seen.add(v)
                    stack.append(v)
        m = min(comp)
        for u in comp:
            label[u] = m
    out = {}
    for k, _, _ in rows:
        if k in core:
            out[k] = (label[k], "core")
        else:
            cands = [label[v] for v in nbrs[k] if v in core]
            out[k] = (min(cands), "border") if cands else (-1, "noise")
    return out


# Slow tier: O(n^2) brute-force cross-check of the grid plan.
@pytest.mark.slow
@pytest.mark.parametrize("seed,eps,minpts", [(11, 60, 4), (12, 90, 5)])
def test_dbscan_relational_matches_brute_force(spark, seed, eps, minpts):
    """Run the same relational pipeline q_dbscan_grid uses (neighbor
    pairs -> cores -> CC -> border attach) on a random cloud and
    compare the full point labeling against textbook DBSCAN."""
    from oarphpy_spark.llm.graph import connected_components
    from oarphpy_spark.queries.spatial import radius_pairs

    rows, df = _random_pts(spark, 250, 600, seed)
    np_ = radius_pairs(df, eps).select("ak", "bk")
    core = (
        np_.groupBy("ak")
        .agg((F.count("*") + 1).alias("deg"))
        .filter(F.col("deg") >= minpts)
        .select(F.col("ak").alias("k"))
    )
    ce = (
        np_.join(core.withColumnRenamed("k", "ak"), "ak")
        .join(core.withColumnRenamed("k", "bk"), "bk")
        .select("ak", "bk")
    )
    cc = connected_components(ce, "ak", "bk")
    comp = core.join(cc.withColumnRenamed("node", "k"), "k", "left").select(
        "k", F.coalesce("component", "k").alias("cluster")
    )
    border = (
        np_.join(core.withColumnRenamed("k", "ak"), "ak", "left_anti")
        .join(comp.select(F.col("k").alias("bk"), "cluster"), "bk")
        .groupBy("ak")
        .agg(F.min("cluster").alias("cluster"))
    )
    got = {r.k: (r.cluster, "core") for r in comp.collect()}
    got.update({r.ak: (r.cluster, "border") for r in border.collect()})
    want = _brute_dbscan(rows, eps, minpts)
    want_not_noise = {k: v for k, v in want.items() if v[1] != "noise"}
    assert got == want_not_noise


def test_grid_join_is_equi_join_not_cartesian(spark):
    """The radius join must plan as a hash equi-join on the cell key —
    never BroadcastNestedLoopJoin/CartesianProduct (the shape that
    dies at scale)."""
    from oarphpy_spark.queries.spatial import radius_pairs

    _, df = _random_pts(spark, 50, 500, 9)
    plan = radius_pairs(df, 50)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
