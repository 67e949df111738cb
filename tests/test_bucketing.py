"""Bucketed tables must join and aggregate with zero Exchange."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from pyspark.sql import functions as F

from oarphpy_spark.operators.bucketing import bucketed_join, write_bucketed

from .conftest import SF_SMALL


def _explain(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    write_bucketed(orders, "orders_b", "o_orderkey", 8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        "o_orderkey",
        8,
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # forbid broadcast so the join must be SMJ — the case bucketing
        # exists for (two fact tables too big for either to broadcast)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _explain(bucketed_join(spark, left, right, "o_orderkey"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    # sortBy clustering also drops both sort nodes... only when Spark
    # trusts file-level order; at minimum the shuffle is gone
    assert "SelectedBucketsCount: 8 out of 8" in plan


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables):
    _, right = bucketed_tables
    df = (
        spark.table(right)
        .groupBy("o_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    plan = _explain(df)
    assert "HashAggregate" in plan
    assert "Exchange" not in plan, plan


def test_unbucketed_join_does_exchange(spark, bucketed_tables):
    # control: the same join over raw parquet DOES shuffle both sides,
    # proving the bucketed plans above actually elided work
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _explain(orders.join(lineitem, "o_orderkey"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "Exchange" in plan
