"""Streaming MERGE sink: snapshot generations, exactly-once replay,
and a live Structured Streaming run."""

from __future__ import annotations

import os

from oarphpy_spark.streaming.upsert import (
    read_snapshot,
    run_upsert_stream,
    upsert_snapshot_sink,
)

_SCHEMA = "k long, v string, seq long, op string"


def _snap_dict(spark, root):
    df = read_snapshot(spark, root)
    return {r.k: r.v for r in df.collect()}


def test_upsert_sink_generations_and_replay(spark, tmp_path):
    root = str(tmp_path / "snap")
    sink = upsert_snapshot_sink(root, "k")

    sink(
        spark.createDataFrame(
            [(1, "a", 1, "I"), (2, "b", 1, "I"), (3, "c", 1, "I")], _SCHEMA
        ),
        0,
    )
    assert _snap_dict(spark, root) == {1: "a", 2: "b", 3: "c"}

    batch1 = [(2, "b2", 2, "U"), (3, None, 2, "D"), (4, "d", 2, "I")]
    sink(spark.createDataFrame(batch1, _SCHEMA), 1)
    want = {1: "a", 2: "b2", 4: "d"}
    assert _snap_dict(spark, root) == want

    # replay of a committed batch must be a no-op (exactly-once)
    sink(spark.createDataFrame(batch1, _SCHEMA), 1)
    assert _snap_dict(spark, root) == want
    # both generations exist; CURRENT points at the newest
    assert os.path.isdir(os.path.join(root, "gen=0"))
    assert os.path.isdir(os.path.join(root, "gen=1"))
    with open(os.path.join(root, "CURRENT")) as f:
        assert f.read().strip() == "gen=1"


def test_upsert_stream_live(spark, tmp_path):
    """End-to-end through a real readStream: a parquet change feed
    drained with availableNow lands in the snapshot."""
    feed = str(tmp_path / "feed")
    root = str(tmp_path / "snap")
    spark.createDataFrame(
        [(1, "x", 1, "I"), (2, "y", 1, "I"), (1, "x2", 2, "U")], _SCHEMA
    ).write.parquet(feed)
    stream = spark.readStream.schema(_SCHEMA).parquet(feed)
    q = run_upsert_stream(stream, root, "k", "t_upsert_live")
    q.awaitTermination(120)
    assert _snap_dict(spark, root) == {1: "x2", 2: "y"}


def test_upsert_replay_never_moves_pointer_backwards(spark, tmp_path):
    """A stale low batch id (e.g. a restart with a fresh checkpoint
    re-seeing batch 0) must not roll CURRENT back to an old
    generation."""
    root = str(tmp_path / "snap")
    sink = upsert_snapshot_sink(root, "k")
    sink(spark.createDataFrame([(1, "a", 1, "I")], _SCHEMA), 0)
    sink(spark.createDataFrame([(1, "a2", 2, "U")], _SCHEMA), 1)
    assert _snap_dict(spark, root) == {1: "a2"}
    # replayed batch 0: gen=0 exists, pointer is at gen=1 — must stay
    sink(spark.createDataFrame([(1, "a", 1, "I")], _SCHEMA), 0)
    with open(os.path.join(root, "CURRENT")) as f:
        assert f.read().strip() == "gen=1"
    assert _snap_dict(spark, root) == {1: "a2"}


def test_upsert_stale_replay_with_pruned_gen_is_noop(spark, tmp_path):
    """A stale batch id whose generation dir was ALREADY PRUNED must
    still no-op: without the committed-batch-id guard it would fall
    through to the merge path and re-apply old changes on top of the
    newer snapshot (stale payloads win because the snapshot keeps no
    seq)."""
    root = str(tmp_path / "snap")
    sink = upsert_snapshot_sink(root, "k", keep_generations=0)
    sink(spark.createDataFrame([(1, "a", 1, "I")], _SCHEMA), 0)
    sink(spark.createDataFrame([(1, "a2", 2, "U")], _SCHEMA), 1)
    sink(spark.createDataFrame([(1, "a3", 3, "U")], _SCHEMA), 2)
    # retention=0 pruned gen=0 and gen=1; only the committed gen lives
    gens = sorted(n for n in os.listdir(root) if n.startswith("gen="))
    assert gens == ["gen=2"]
    # stale replay of batch 0 (fresh-checkpoint restart): gen dir is
    # GONE, so only the committed-id guard prevents a rogue merge
    sink(spark.createDataFrame([(1, "a", 1, "I")], _SCHEMA), 0)
    assert _snap_dict(spark, root) == {1: "a3"}
    with open(os.path.join(root, "CURRENT")) as f:
        assert f.read().strip() == "gen=2"
    # and no resurrected generation dir either
    gens = sorted(n for n in os.listdir(root) if n.startswith("gen="))
    assert gens == ["gen=2"]


def test_upsert_generation_retention(spark, tmp_path):
    """Old generations beyond keep_generations are pruned after each
    commit; the committed generation always survives."""
    root = str(tmp_path / "snap")
    sink = upsert_snapshot_sink(root, "k", keep_generations=1)
    for i in range(4):
        sink(spark.createDataFrame([(1, f"v{i}", i + 1, "U")], _SCHEMA), i)
    gens = sorted(n for n in os.listdir(root) if n.startswith("gen="))
    assert gens == ["gen=2", "gen=3"]
    assert _snap_dict(spark, root) == {1: "v3"}


def test_upsert_stream_restart_is_exactly_once(spark, tmp_path):
    """Across a stop/extend/restart of the stream, the durable
    checkpoint keeps batch ids monotonic so new changes are applied,
    not mistaken for replays."""
    feed = str(tmp_path / "feed")
    root = str(tmp_path / "snap")
    spark.createDataFrame(
        [(1, "x", 1, "I"), (2, "y", 1, "I")], _SCHEMA
    ).write.parquet(feed)
    stream = spark.readStream.schema(_SCHEMA).parquet(feed)
    q = run_upsert_stream(stream, root, "k", "t_upsert_restart")
    q.awaitTermination(120)
    assert _snap_dict(spark, root) == {1: "x", 2: "y"}

    # append more changes, then RESTART the query (same checkpoint)
    spark.createDataFrame(
        [(1, "x2", 2, "U"), (3, "z", 2, "I")], _SCHEMA
    ).write.mode("append").parquet(feed)
    stream2 = spark.readStream.schema(_SCHEMA).parquet(feed)
    q2 = run_upsert_stream(stream2, root, "k", "t_upsert_restart")
    q2.awaitTermination(120)
    assert _snap_dict(spark, root) == {1: "x2", 2: "y", 3: "z"}
