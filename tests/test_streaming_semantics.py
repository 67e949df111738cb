"""Watermark/late-data semantics and the idempotent foreachBatch sink —
driven with real micro-batches (two parquet files arriving in order).
"""

from __future__ import annotations

import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from oarphpy_spark.streaming.sinks import foreach_batch_parquet
from oarphpy_spark.streaming.windows import stream_events, tumbling_counts_stream


def _write_events(path: str, rows: list[tuple[int, str, int]]) -> None:
    """rows: (event_id, ts iso-string, user_id)."""
    pdf = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[ns]"),
            "user_id": [r[2] for r in rows],
            "event_type": ["click"] * len(rows),
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)


def test_watermark_drops_late_rows(spark, tmp_path):
    src = tmp_path / "events_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out: list = []

    # Batch 1: event at 10:05 (watermark after batch: 08:05).
    # Batch 2: event at 13:30 -> watermark 11:30 passes the 10:00
    # window's END (11:00), so that window finalizes with n=1.
    # Batch 3 (second run): a LATE 09:30 event — behind the watermark,
    # silently dropped; its 09:00 window must never be emitted.
    _write_events(str(src / "b1.parquet"), [(1, "2024-01-01 10:05:00", 1)])
    time.sleep(1.1)
    _write_events(str(src / "b2.parquet"), [(2, "2024-01-01 13:30:00", 1)])

    sink = str(tmp_path / "wm_out")

    def run_increment():
        agg = tumbling_counts_stream(
            stream_events(spark, str(src), max_files_per_trigger=1),
            watermark="2 hours",
            window="1 hour",
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)  # resumes across runs
            .outputMode("append")  # append emits only finalized windows
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_increment()
    _write_events(str(src / "b3.parquet"), [(3, "2024-01-01 09:30:00", 1)])
    run_increment()

    rows = spark.read.parquet(sink).collect()
    finalized = {(r["window_start_us"], r["n"]) for r in rows}
    h10 = 1704103200000000  # 2024-01-01 10:00 UTC in epoch-us
    h9 = h10 - 3600_000_000
    # The 10:00 window finalized with exactly 1 event; the late 09:30
    # event's window was NEVER emitted (dropped behind the watermark).
    assert (h10, 1) in finalized
    assert all(w != h9 for w, _ in finalized)


def test_foreach_batch_idempotent_sink(spark, tmp_path):
    src = tmp_path / "sink_src"
    src.mkdir()
    _write_events(str(src / "b1.parquet"), [(1, "2024-01-01 10:05:00", 1), (2, "2024-01-01 10:20:00", 2)])
    out_dir = str(tmp_path / "sink_out")
    events = stream_events(spark, str(src))
    q = foreach_batch_parquet(
        events.select("event_id", "user_id"), out_dir, "t_febatch"
    )
    q.awaitTermination(120)
    time.sleep(0.5)
    epochs = [d for d in os.listdir(out_dir) if d.startswith("epoch=")]
    assert len(epochs) >= 1
    back = spark.read.parquet(os.path.join(out_dir, epochs[0]))
    assert {r["event_id"] for r in back.collect()} == {1, 2}


def test_rocksdb_state_store_matches_default(spark, tmp_path):
    """The RocksDB state-store provider (the production backend for
    large state — spillable, incremental-checkpointing) produces the
    same windowed aggregates as the default HDFS-backed in-memory
    provider. The provider is a per-query option via the checkpoint's
    conf, set session-wide here and restored after."""
    import os

    from pyspark.sql import functions as F

    feed = str(tmp_path / "feed")
    spark.createDataFrame(
        [(i, 1000 + 60 * i, i % 3) for i in range(300)],
        "event_id long, epoch_s long, k long",
    ).select(
        "event_id",
        F.timestamp_seconds("epoch_s").alias("ts"),
        "k",
    ).write.parquet(feed)

    def run(provider: str | None, sink: str):
        key = "spark.sql.streaming.stateStore.providerClass"
        prev = spark.conf.get(key, None)
        if provider:
            spark.conf.set(key, provider)
        try:
            stream = spark.readStream.schema(
                "event_id long, ts timestamp, k long"
            ).parquet(feed)
            agg = (
                stream.withWatermark("ts", "10 minutes")
                .groupBy(F.window("ts", "5 minutes").alias("w"), "k")
                .agg(F.count("*").alias("n"))
                .select(
                    F.unix_micros("w.start").alias("ws"), "k", "n"
                )
            )
            q = (
                agg.writeStream.format("memory")
                .queryName(sink)
                .outputMode("complete")
                .option(
                    "checkpointLocation",
                    os.path.join(str(tmp_path), f"ckpt_{sink}"),
                )
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(120)
            return {
                (r.ws, r.k): r.n for r in spark.table(sink).collect()
            }
        finally:
            if prev is not None:
                spark.conf.set(key, prev)
            else:
                spark.conf.unset(key)

    default = run(None, "t_state_default")
    rocks = run(
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
        "t_state_rocksdb",
    )
    assert default and rocks == default


def test_distinct_users_dedup_state_evicts(spark, tmp_path):
    """The distinct-users dedup keys on the F.window struct (which
    carries event-time watermark metadata), so StreamingDeduplicate
    EVICTS keys once the watermark passes their window end. A
    date_trunc-derived bucket column would lose that metadata and the
    state would grow forever — this test drives 3 micro-batches and
    asserts (a) rows were actually REMOVED from the dedup state store
    and (b) the per-window distinct counts are exact for a NON-hour
    window (the bucket derives from the `window` argument)."""
    from oarphpy_spark.streaming.windows import (
        distinct_users_stream,
        stream_events,
    )

    src = tmp_path / "du_src"
    src.mkdir()
    # b1: 3 distinct users in 10:00-10:30, one duplicated; user 2
    # also appears in 10:30-11:00 -> with a 30-min window it counts
    # again (an hour-hardcoded bucket would collapse it).
    _write_events(
        str(src / "b1.parquet"),
        [
            (1, "2024-01-01 10:05:00", 1),
            (2, "2024-01-01 10:10:00", 2),
            (3, "2024-01-01 10:12:00", 2),
            (4, "2024-01-01 10:20:00", 3),
            (5, "2024-01-01 10:40:00", 2),
        ],
    )
    time.sleep(1.1)
    # b2 advances max ts to 14:00 -> watermark 13:30 after commit.
    _write_events(str(src / "b2.parquet"), [(6, "2024-01-01 14:00:00", 9)])
    time.sleep(1.1)
    # b3 runs WITH watermark 13:30 in effect: every 10:xx dedup key
    # (window end <= 11:00 < 13:30) must be evicted this batch.
    _write_events(str(src / "b3.parquet"), [(7, "2024-01-01 14:10:00", 9)])

    agg = distinct_users_stream(
        stream_events(spark, str(src), max_files_per_trigger=1),
        watermark="30 minutes",
        window="30 minutes",
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_du_evict")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "du_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)

    counts = {
        r.window_start_us: r.n_users
        for r in spark.table("t_du_evict").collect()
    }
    us = lambda s: int(  # noqa: E731
        pd.Timestamp(s, tz="UTC").value // 1000
    )
    assert counts[us("2024-01-01 10:00:00")] == 3  # users 1,2,3 deduped
    assert counts[us("2024-01-01 10:30:00")] == 1  # user 2, new window
    assert counts[us("2024-01-01 14:00:00")] == 1

    # State eviction must be observable on the dedup operator.
    dedup_ops = [
        op
        for p in q.recentProgress
        for op in p["stateOperators"]
        if op["operatorName"] == "dedupe"
    ]
    assert dedup_ops, "no dedup state operator in progress"
    assert sum(op["numRowsRemoved"] for op in dedup_ops) >= 4, (
        "dedup state was never evicted — the dedup key lost its "
        "event-time watermark metadata"
    )
