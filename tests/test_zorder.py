"""Z-order layout: multi-column skipping beats linear sort, and the
laid-out data is bit-identical to the input."""

from __future__ import annotations

import pytest

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
    # On a corner predicate the LINEAR layout also prunes (its leading
    # column is constrained), so comparing the two on it is
    # file-boundary luck — flaked once under full-suite session-state
    # drift. The property that actually motivates z-order is the
    # SECOND-column-only predicate: a layout sorted on l_partkey
    # cannot prune by l_suppkey at all, while z-order keeps only the
    # files whose interleaved y-bits intersect the slab (top-4 z-bits
    # = x1 y1 x2 y2, y1=y2=0 -> 4 of 16 files).
    pred_b = {"l_suppkey": (0, stats.smax // 8)}
    _, zkept_b = file_prune_stats(zpath, pred_b)
    _, lkept_b = file_prune_stats(lpath, pred_b)
    assert lkept_b == nfiles, "linear layout unexpectedly pruned on col B"
    assert zkept_b <= nfiles // 2, f"z-order kept {zkept_b}/{nfiles}"
    assert zkept_b < lkept_b


def test_zorder_bits_guard(spark):
    import pytest

    with pytest.raises(ValueError):
        with_zorder_key(_lineitem(spark), ["l_partkey"] * 8, bits=10)


# --- property: pruning is lossless for ANY data/box combination ---

from hypothesis import given, settings
from hypothesis import strategies as st

from oarphpy_spark.sources.manifest import build_manifest, pruned_read

rows_strategy = st.lists(
    st.tuples(st.integers(0, 1000), st.integers(0, 1000)),
    min_size=1,
    max_size=60,
)
box_strategy = st.tuples(
    st.integers(-50, 1050), st.integers(0, 500),  # a lo, a width
    st.integers(-50, 1050), st.integers(0, 500),  # b lo, b width
)


# Slow tier: randomized lossless-prune property (~25 s).
@pytest.mark.slow
@given(rows_strategy, box_strategy)
@settings(max_examples=8, deadline=None)
def test_manifest_prune_lossless_property(spark, tmp_path_factory, rows, box):
    """For random integer points and a random (possibly empty /
    out-of-domain) predicate box, the manifest-pruned read over a
    z-ordered layout returns EXACTLY the rows a plain filter does —
    stats pruning may keep extra files, never drop matching rows."""
    alo, aw, blo, bw = box
    pred = {"a": (alo, alo + aw), "b": (blo, blo + bw)}
    df = spark.createDataFrame(
        [(a, b, i) for i, (a, b) in enumerate(rows)], "a long, b long, rid long"
    )
    out = str(tmp_path_factory.mktemp("zprop"))
    write_zordered(df, out, ["a", "b"], num_files=4, bits=8)
    man = build_manifest(spark, out, ["a", "b"])
    got = {
        r.rid
        for r in pruned_read(spark, man, pred).select("rid").collect()
    }
    want = {
        i
        for i, (a, b) in enumerate(rows)
        if pred["a"][0] <= a <= pred["a"][1]
        and pred["b"][0] <= b <= pred["b"][1]
    }
    assert got == want
