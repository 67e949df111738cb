"""truncate_lineage: local vs reliable checkpoint selection, and the
iterative operators' `reliable` knob end-to-end."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from oarphpy_spark.util.checkpoints import (
    checkpoint_dir_configured,
    clear_checkpoint_dir,
    truncate_lineage,
)


@pytest.fixture(autouse=True)
def _no_checkpoint_dir_leak(spark):
    """Any checkpoint dir set inside a test is unset afterwards so
    AUTO mode stays local for the rest of the suite."""
    clear_checkpoint_dir(spark)
    yield
    clear_checkpoint_dir(spark)


def test_local_truncation_by_default(spark, tmp_path):
    df = spark.range(10).withColumn("x", F.col("id") * 2)
    assert not checkpoint_dir_configured(df)
    out = truncate_lineage(df, reliable=False)
    assert out.count() == 10
    # localCheckpoint plans scan an RDD, not the original range
    assert "Scan ExistingRDD" in out._jdf.queryExecution().toString()


def test_reliable_requires_checkpoint_dir(spark):
    df = spark.range(5)
    with pytest.raises(RuntimeError, match="setCheckpointDir"):
        truncate_lineage(df, reliable=True)


def test_reliable_checkpoint_writes_to_dir(spark, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    spark.sparkContext.setCheckpointDir(ckpt)
    df = spark.range(100).withColumn("y", F.col("id") % 7)
    out = truncate_lineage(df, reliable=True)
    assert out.count() == 100
    # blocks actually landed in the reliable dir
    found = []
    for root, _dirs, files in os.walk(ckpt):
        found.extend(files)
    assert found, "reliable checkpoint wrote nothing to the dir"
    # AUTO mode now also picks reliable (dir is configured)
    out2 = truncate_lineage(spark.range(3), reliable=None)
    assert out2.count() == 3


def test_graph_ops_accept_reliable_knob(spark, tmp_path):
    """connected_components under reliable truncation returns the same
    stars as the local default."""
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt2"))
    from oarphpy_spark.llm.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)], "s long, d long"
    )
    want = {(2, 1), (3, 1), (11, 10)}
    got_local = {
        (r.node, r.component)
        for r in connected_components(
            edges, "s", "d", reliable=False
        ).collect()
    }
    got_reliable = {
        (r.node, r.component)
        for r in connected_components(
            edges, "s", "d", reliable=True
        ).collect()
    }
    assert got_local == want
    assert got_reliable == want
