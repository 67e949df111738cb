"""Distributed prefix-sum / row-number operator (operators/prefix.py).

The operator replaces the single-task global window in q_seq_packing
and q_revenue_gini (graded perf-weak in round 11). Correctness here is
exact equality against the naive ``Window.orderBy`` serial scan —
integer sums are order-independent, so the two-level result must match
bit-for-bit — plus plan gates pinning that the only remaining
unpartitioned window runs over the constant-size per-bucket relation.
"""

from __future__ import annotations

from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from oarphpy_spark.operators.prefix import (
    with_global_cumsum,
    with_global_row_number,
)


def _naive_cumsum(df, order_cols, value):
    w = Window.orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn("cum_naive", F.sum(value).over(w))


def test_cumsum_matches_serial_scan(spark):
    rows = [
        Row(k=(i * 2654435761) % 10_000, v=(i * 37) % 100 + 1)
        for i in range(5_000)
    ]
    df = spark.createDataFrame(rows).repartition(32)
    got = with_global_cumsum(
        df, ["k"], F.col("v"), out="cum", n_buckets=64
    )
    want = _naive_cumsum(df, ["k"], F.col("v"))
    # Knuth-hash keys are distinct in [0, 10000) for this range, so
    # (k, cum) is a well-defined pairing in both plans.
    got_m = {r["k"]: r["cum"] for r in got.collect()}
    want_m = {r["k"]: r["cum_naive"] for r in want.collect()}
    assert got_m == want_m


def test_row_number_with_ties_and_total(spark):
    # Heavy ties on the leading key: every tie class must stay within
    # one bucket so the secondary order column resolves rank globally.
    rows = [Row(k=i % 7, sub=i) for i in range(1_000)]
    df = spark.createDataFrame(rows).repartition(16)
    got = with_global_row_number(
        df, ["k", "sub"], out="i", n_buckets=16, total_col="n"
    ).collect()
    assert all(r["n"] == 1_000 for r in got)
    by_rank = sorted(got, key=lambda r: r["i"])
    assert [r["i"] for r in by_rank] == list(range(1, 1_001))
    assert [(r["k"], r["sub"]) for r in by_rank] == sorted(
        (r["k"], r["sub"]) for r in got
    )


def test_degenerate_single_key_and_empty(spark):
    one_key = spark.createDataFrame([Row(k=42, v=i) for i in range(10)])
    got = with_global_cumsum(
        one_key, ["k", "v"], F.col("v"), out="cum", n_buckets=8
    )
    # All rows collapse into bucket 0 → the correct serial fallback.
    assert got.agg(F.max("cum")).first()[0] == sum(range(10))
    empty = one_key.filter("k < 0")
    assert (
        with_global_row_number(empty, ["k"], out="i", n_buckets=8).count()
        == 0
    )


def test_negative_keys(spark):
    rows = [Row(k=i - 50, v=1) for i in range(100)]
    df = spark.createDataFrame(rows).repartition(8)
    got = with_global_row_number(df, ["k"], out="i", n_buckets=16)
    m = {r["k"]: r["i"] for r in got.collect()}
    assert m[-50] == 1 and m[49] == 100


def _unpartitioned_window_inputs(plan: str) -> list[str]:
    """Rows-frame Window nodes with an empty partition spec: return
    the line itself so callers can bound what feeds them."""
    lines = plan.splitlines()
    return [lines[i] for i in _unpartitioned_window_indices(plan)]


def _unpartitioned_window_indices(plan: str) -> list[int]:
    """Line indices of rows-frame Window nodes with an empty partition
    spec. Index-based (not the line text) so callers can walk THAT
    node's input subtree even when two Window lines are textually
    identical."""
    return [
        i
        for i, ln in enumerate(plan.splitlines())
        if "Window [" in ln and "windowspecdefinition(" in ln
        # partitionless spec: windowspecdefinition(ORDER-only, frame)
        and ", specifiedwindowframe" in ln
        and not _has_partition_spec(ln)
    ]


def _node_depth(ln: str) -> int:
    """Character offset where the operator text begins in a Spark plan
    ``toString()`` line — the tree prefix is drawn with spaces, ':',
    '+' and '-' (e.g. ``:     +- Window [...]``)."""
    i = 0
    while i < len(ln) and ln[i] in " :+-":
        i += 1
    return i


def _input_subtree(lines: list[str], i: int) -> str:
    """The plan text of node ``i``'s INPUT subtree: the subsequent
    lines with strictly greater indentation, stopping at the first
    line back at or above node i's depth (a sibling branch of some
    ancestor — e.g. the other side of a join printed after this node,
    which is NOT an input of this node)."""
    d = _node_depth(lines[i])
    out: list[str] = []
    for ln in lines[i + 1:]:
        if ln.strip() and _node_depth(ln) <= d:
            break
        out.append(ln)
    return "\n".join(out)


def _has_partition_spec(ln: str) -> bool:
    # Partitioned spec renders as windowspecdefinition(col1, ..,
    # ORDER BY ..); partitionless as windowspecdefinition(ord ASC ..
    inner = ln.split("windowspecdefinition(", 1)[1]
    head = inner.split(",", 1)[0]
    return " ASC" not in head and " DESC" not in head


def test_plan_big_relation_window_is_partitioned(spark, request):
    """The perf contract: the window over the N-row input carries a
    partition spec (the bucket); any partitionless window in the plan
    hangs off the per-bucket aggregate, whose cardinality is bounded
    by n_buckets — i.e. HashAggregate sits between it and the scan."""
    df = spark.range(100_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    out = with_global_cumsum(df, ["k"], F.col("v"), out="cum")
    plan = out._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    for i in _unpartitioned_window_indices(plan):
        # the partitionless windows must consume the aggregate, not
        # the raw relation: their INPUT subtree contains a
        # HashAggregate (indent-walked — a sibling branch printed
        # after the window does not count)
        assert "HashAggregate" in _input_subtree(lines, i), (
            f"unpartitioned window over non-aggregated input:\n{plan}"
        )
    # and the big-side window is bucket-partitioned
    assert any(
        "Window [" in ln and _has_partition_spec(ln)
        for ln in plan.splitlines()
    ), plan


def test_weak_graded_queries_have_no_global_window_over_base(spark):
    """Round-11 regression gate: q_seq_packing / q_revenue_gini plans
    must not move the base relation into a single-partition window —
    'SinglePartition' may appear only above an aggregate."""
    from oarphpy_spark import registry

    qs = registry.queries()
    for slug in ("q_seq_packing", "q_revenue_gini"):
        df = qs[slug](spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        lines = plan.splitlines()
        for i, ln in enumerate(lines):
            if "Exchange SinglePartition" in ln:
                assert "HashAggregate" in _input_subtree(lines, i), (
                    f"{slug}: single-partition exchange over "
                    f"non-aggregated input:\n{plan}"
                )
