"""The streaming Python data source's replay contract: offset slices
are pure functions of the row range, so readBetweenOffsets must
reproduce exactly what the live read() path emitted — the property
Spark relies on for exactly-once recovery."""

from __future__ import annotations

from oarphpy_spark.sources.replay_stream import (
    REPLAY_SLICES,
    ReplayStreamReader,
    parquet_row_count,
)

PATH = "/root/testdata/sf0.001/events.parquet"


def test_slices_cover_exactly_once():
    n = parquet_row_count(PATH)
    r = ReplayStreamReader(PATH, n)
    off = r.initialOffset()
    seen = []
    batches = 0
    while True:
        rows, nxt = r.read(off)
        rows = list(rows)
        if not rows:
            break
        seen += rows
        off = nxt
        batches += 1
    assert batches == REPLAY_SLICES
    assert len(seen) == n
    assert len({t[0] for t in seen}) == n  # every event_id exactly once


def test_read_between_offsets_reproduces_live_slices():
    n = parquet_row_count(PATH)
    r = ReplayStreamReader(PATH, n)
    o0 = r.initialOffset()
    rows1, o1 = r.read(o0)
    rows2, o2 = r.read(o1)
    live = list(rows1) + list(rows2)
    replay = list(r.readBetweenOffsets(o0, o2))
    assert replay == live
    # a second reader instance (fresh process stand-in) agrees too
    again = list(ReplayStreamReader(PATH, n).readBetweenOffsets(o0, o2))
    assert again == live


def test_restart_drain_is_exactly_once(spark, tmp_path):
    """Each availableNow start against the SAME checkpoint advances
    exactly one offset slice (simple stream readers snapshot one
    batch per start); after REPLAY_SLICES restarts every row has
    landed exactly once and a further start adds nothing — the
    offset-log + readBetweenOffsets recovery contract end-to-end."""
    from oarphpy_spark.sources.replay_stream import register

    register(spark)
    n = parquet_row_count(PATH)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    counts = []
    for _ in range(REPLAY_SLICES + 1):
        q = (
            spark.readStream.format("events_replay")
            .option("path", PATH)
            .option("n_rows", str(n))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(60)
        counts.append(spark.read.parquet(out).count())
    per = -(-n // REPLAY_SLICES)
    assert counts == [
        min((i + 1) * per, n) for i in range(REPLAY_SLICES)
    ] + [n]
    df = spark.read.parquet(out)
    assert df.select("event_id").distinct().count() == n
