"""Z-order layout: multi-column skipping beats linear sort, and the
laid-out data is bit-identical to the input."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from oarphpy_spark.operators.zorder import (
    file_prune_stats,
    with_zorder_key,
    write_zordered,
)

from .conftest import SF_SMALL


def _lineitem(spark):
    return spark.read.parquet(os.path.join(SF_SMALL, "lineitem.parquet"))


def test_zorder_key_bounds(spark):
    """The Morton key is non-negative and fits bits*k bits."""
    df = with_zorder_key(_lineitem(spark), ["l_partkey", "l_suppkey"], bits=10)
    row = df.agg(
        F.min("__zkey").alias("lo"), F.max("__zkey").alias("hi")
    ).collect()[0]
    assert row.lo >= 0
    assert row.hi < (1 << 20)


def test_zorder_roundtrip_content(spark, tmp_path):
    """Layout changes file placement, never content."""
    li = _lineitem(spark).select("l_orderkey", "l_partkey", "l_suppkey")
    out = str(tmp_path / "zli")
    write_zordered(li, out, ["l_partkey", "l_suppkey"], num_files=8, bits=10)
    back = spark.read.parquet(out)
    assert back.count() == li.count()
    assert (
        back.exceptAll(li).count() == 0 and li.exceptAll(back).count() == 0
    )


def test_zorder_prunes_both_columns(spark, tmp_path):
    """A 2-D range predicate must skip most files under z-order; under
    a linear sort on col A, predicates on col B prune (almost) nothing.

    This is the property that matters at 100 TB: footer stats make the
    scan cost proportional to the selected z-region, not the table.
    """
    li = _lineitem(spark).select("l_orderkey", "l_partkey", "l_suppkey")
    nfiles = 16

    zpath = str(tmp_path / "zorder")
    write_zordered(li, zpath, ["l_partkey", "l_suppkey"], num_files=nfiles, bits=10)

    lpath = str(tmp_path / "linear")
    (
        li.repartitionByRange(nfiles, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    stats = li.agg(
        F.max("l_partkey").alias("pmax"), F.max("l_suppkey").alias("smax")
    ).collect()[0]
    # a ~12.5% x 12.5% corner of the key space
    pred = {
        "l_partkey": (0, stats.pmax // 8),
        "l_suppkey": (0, stats.smax // 8),
    }

    ztotal, zkept = file_prune_stats(zpath, pred)
    ltotal, lkept = file_prune_stats(lpath, pred)
    assert ztotal == nfiles and ltotal == nfiles
    # z-order: the corner lives in a contiguous z-range -> few files.
    assert zkept <= nfiles // 2, f"z-order kept {zkept}/{nfiles}"
    # and strictly better than the linear layout on the same predicate
    # (linear prunes on the leading column only: ~1/8 of files by
    # l_partkey, all of which survive the l_suppkey bound).
    assert zkept <= lkept


def test_zorder_bits_guard(spark):
    import pytest

    with pytest.raises(ValueError):
        with_zorder_key(_lineitem(spark), ["l_partkey"] * 8, bits=10)
