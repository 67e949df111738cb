"""Manifest-based file skipping: correct (never loses rows) and
effective (opens fewer files on a z-ordered layout)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from oarphpy_spark.operators.zorder import write_zordered
from oarphpy_spark.sources.manifest import (
    build_manifest,
    pruned_files,
    pruned_read,
)

from .conftest import SF_SMALL


def _layout(spark, tmp_path):
    li = spark.read.parquet(os.path.join(SF_SMALL, "lineitem.parquet")).select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    out = str(tmp_path / "zli")
    write_zordered(li, out, ["l_partkey", "l_suppkey"], num_files=16, bits=10)
    return li, out


def test_manifest_totals_match_data(spark, tmp_path):
    li, out = _layout(spark, tmp_path)
    man = build_manifest(spark, out, ["l_partkey", "l_suppkey"])
    row = man.agg(
        F.sum("n_rows").alias("rows"), F.count("*").alias("files")
    ).collect()[0]
    assert row.rows == li.count()
    assert row.files == 16


def test_pruned_read_equals_full_filter(spark, tmp_path):
    li, out = _layout(spark, tmp_path)
    man = build_manifest(spark, out, ["l_partkey", "l_suppkey"])
    stats = li.agg(
        F.max("l_partkey").alias("p"), F.max("l_suppkey").alias("s")
    ).collect()[0]
    pred = {"l_partkey": (0, stats.p // 8), "l_suppkey": (0, stats.s // 8)}

    got = pruned_read(spark, man, pred)
    want = li.filter(
        F.col("l_partkey").between(*pred["l_partkey"])
        & F.col("l_suppkey").between(*pred["l_suppkey"])
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # and the skipping is real on a z-ordered layout
    assert len(pruned_files(man, pred)) <= 8


def test_pruned_read_empty_predicate_region(spark, tmp_path):
    _li, out = _layout(spark, tmp_path)
    man = build_manifest(spark, out, ["l_partkey", "l_suppkey"])
    got = pruned_read(spark, man, {"l_partkey": (-100, -1)})
    assert got.count() == 0
    assert "l_quantity" in got.columns  # schema survives the empty case
