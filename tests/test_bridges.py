from __future__ import annotations

import io

import pytest

from pyspark.sql import functions as F

from oarphpy_spark.bridges import (
    iter_arrow_batches,
    iter_row_batches,
    to_tf_dataset,
    to_torch_iterable,
)
from oarphpy_spark.sources.tfrecords import (
    crc32c,
    iter_tfrecords,
    tfrecords_df,
    write_tfrecords,
)


def test_iter_row_batches_streams_all_rows(spark):
    df = spark.range(2500).withColumn("v", F.col("id") * 2)
    total, n_batches = 0, 0
    for batch in iter_row_batches(df, batch_size=1000):
        assert set(batch) == {"id", "v"}
        assert len(batch["id"]) <= 1000
        assert all(v == 2 * i for i, v in zip(batch["id"], batch["v"]))
        total += len(batch["id"])
        n_batches += 1
    assert total == 2500
    assert n_batches == 3


def test_iter_arrow_batches_columnar_and_complete(spark):
    import pyarrow as pa

    df = spark.range(5000).withColumn("v", F.col("id").cast("double") * 0.5)
    batches = list(iter_arrow_batches(df))
    assert all(isinstance(b, pa.RecordBatch) for b in batches)
    t = pa.Table.from_batches(batches)
    assert t.num_rows == 5000
    assert t.column("v").to_pylist() == [i * 0.5 for i in t.column("id").to_pylist()]


def test_iter_row_batches_empty_df(spark):
    df = spark.range(10).filter("id < 0")
    assert list(iter_row_batches(df)) == []


def _row_at_a_time_batches(df, batch_size):
    """The implementation iter_row_batches replaced: pickled-Row local
    iteration + per-row column extraction. Kept here as the throughput
    baseline the Arrow path must beat."""
    batch: list = []
    cols = df.columns
    for row in df.toLocalIterator(prefetchPartitions=True):
        batch.append(row)
        if len(batch) >= batch_size:
            yield {c: [r[c] for r in batch] for c in cols}
            batch = []
    if batch:
        yield {c: [r[c] for r in batch] for c in cols}


# Slow tier: throughput A/B (~30 s), perf evidence not correctness.
@pytest.mark.slow
def test_arrow_bridge_beats_row_iterator(spark):
    """The redesign exists to kill per-row pickling (the reference's
    spark_df_to_tf_dataset paid ~9 s per 786 KB shard); assert the
    Arrow path out-throughputs row-at-a-time batch building on the
    same data and workload."""
    import time

    n = 1_200_000
    df = spark.range(n).select(
        "id",
        F.col("id").cast("double").alias("a"),
        (F.col("id") * 2).cast("double").alias("b"),
        F.sha1(F.col("id").cast("string")).alias("s"),
    )
    # Warm both paths (codegen + python-worker pool) before timing.
    list(iter_row_batches(df.limit(100), batch_size=64))
    sum(1 for _ in df.limit(100).toLocalIterator())

    def timed(fn):
        # best-of-2: a single pass is vulnerable to GC pauses /
        # noisy-neighbor stalls on shared machines
        best, count = float("inf"), 0
        for _ in range(2):
            t0 = time.monotonic()
            count = fn()
            best = min(best, time.monotonic() - t0)
        return best, count

    arrow_s, n_arrow = timed(
        lambda: sum(len(b["id"]) for b in iter_row_batches(df, batch_size=4096))
    )
    rows_s, n_rows = timed(
        lambda: sum(
            len(b["id"]) for b in _row_at_a_time_batches(df, batch_size=4096)
        )
    )

    assert n_arrow == n_rows == n
    # measured ~2-3x faster; 1.1 slack absorbs residual scheduler noise
    assert arrow_s < rows_s * 1.1, (arrow_s, rows_s)


def test_framework_bridges_are_gated(spark):
    df = spark.range(3)
    with pytest.raises(NotImplementedError):
        to_tf_dataset(df)
    with pytest.raises(NotImplementedError):
        to_torch_iterable(df)


def test_crc32c_golden_vectors():
    # Public CRC-32C test vectors (RFC 3720 appendix / common suites).
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_tfrecords_roundtrip():
    records = [b"foo", b"", b"x" * 10_000]
    buf = io.BytesIO()
    write_tfrecords(buf, records)
    buf.seek(0)
    assert list(iter_tfrecords(buf)) == records


def test_tfrecords_truncation_detected():
    buf = io.BytesIO()
    write_tfrecords(buf, [b"hello world"])
    raw = buf.getvalue()
    # Cut inside the payload and inside the trailing crc respectively.
    for cut in (len(raw) - 10, len(raw) - 2):
        with pytest.raises(IOError, match="truncated"):
            list(iter_tfrecords(io.BytesIO(raw[:cut])))


def test_tfrecords_corruption_detected():
    buf = io.BytesIO()
    write_tfrecords(buf, [b"hello world"])
    raw = bytearray(buf.getvalue())
    raw[14] ^= 0xFF  # flip a payload byte
    with pytest.raises(IOError):
        list(iter_tfrecords(io.BytesIO(bytes(raw))))


def test_tfrecords_df_source(spark, tmp_path):
    p1 = tmp_path / "a.tfrecord"
    with open(p1, "wb") as f:
        write_tfrecords(f, [b"r1", b"r2"])
    p2 = tmp_path / "b.tfrecord"
    with open(p2, "wb") as f:
        write_tfrecords(f, [b"r3"])
    df = tfrecords_df(spark, str(tmp_path / "*.tfrecord"))
    rows = df.collect()
    assert {bytes(r["record"]) for r in rows} == {b"r1", b"r2", b"r3"}
    assert all(r["record_idx"] in (0, 1) for r in rows)


def test_shard_iterator_element_equality(spark):
    """iter_shard_batches must yield exactly the rows of collect(),
    shard-interleaved (reference analog: element-equality check in
    oarphpy_test/test_spark.py:350-406)."""
    from oarphpy_spark.bridges import iter_shard_batches

    df = spark.range(1000).select(
        "id",
        (F.col("id") % 4).alias("shard"),
        (F.col("id") * 3).cast("double").alias("v"),
    )
    expected = {(r["id"], r["shard"], r["v"]) for r in df.collect()}
    got = set()
    shards_seen = []
    for batch in iter_shard_batches(
        df, "shard", num_reader_threads=2, batch_size=64,
        on_shard_start=shards_seen.append,
    ):
        got.update(zip(batch["id"], batch["shard"], batch["v"]))
    assert got == expected
    assert sorted(shards_seen) == [0, 1, 2, 3]


def test_shard_iterator_reads_concurrently(spark):
    """≥2 shards must be in flight at once: both reader threads rendezvous
    at a barrier in on_shard_start — a serial implementation would leave
    one party waiting forever (BrokenBarrierError after timeout)."""
    import threading

    from oarphpy_spark.bridges import iter_shard_batches

    barrier = threading.Barrier(2, timeout=60)
    overlap = []

    def on_start(sid):
        overlap.append(barrier.wait())  # both workers must arrive

    df = spark.range(400).select("id", (F.col("id") % 2).alias("shard"))
    total = sum(
        len(b["id"])
        for b in iter_shard_batches(
            df, "shard", num_reader_threads=2, batch_size=50,
            on_shard_start=on_start,
        )
    )
    assert total == 400
    assert len(overlap) == 2  # both threads passed the rendezvous


def test_shard_iterator_propagates_worker_errors(spark):
    from oarphpy_spark.bridges import iter_shard_batches

    df = spark.range(100).select("id", (F.col("id") % 2).alias("shard"))

    def boom(sid):
        raise RuntimeError("reader died")

    with pytest.raises(RuntimeError, match="reader died"):
        list(iter_shard_batches(df, "shard", on_shard_start=boom))


def test_shard_iterator_empty_df(spark):
    from oarphpy_spark.bridges import iter_shard_batches

    df = spark.range(10).filter("id < 0").withColumn("shard", F.col("id") % 2)
    assert list(iter_shard_batches(df, "shard")) == []


def test_shard_iterator_thruput_observer(spark):
    """Observer parity with the reference's instrumented TF bridge
    (oarphpy/spark.py:1325-1357): rows/bytes/chunk latencies metered
    on the consumer side."""
    from oarphpy_spark.bridges import iter_shard_batches
    from oarphpy_spark.util.thruput import ThruputObserver

    obs = ThruputObserver(name="feed")
    df = spark.range(500).select("id", (F.col("id") % 2).alias("shard"))
    total = sum(
        len(b["id"])
        for b in iter_shard_batches(df, "shard", batch_size=100, observer=obs)
    )
    assert total == 500
    assert obs.n == 500
    assert obs.num_bytes > 0
    assert len(obs.latencies_sec) >= 5  # one observation per batch


def test_shard_iterator_early_abandon_stops_readers(spark):
    """A consumer that stops early must not pay for the remaining
    shards: the stop flag keeps unclaimed shard jobs from launching
    and reader threads exit promptly."""
    import time

    from oarphpy_spark.bridges import iter_shard_batches

    started = []
    df = spark.range(4000).select("id", (F.col("id") % 8).alias("shard"))
    it = iter_shard_batches(
        df, "shard", num_reader_threads=2, batch_size=50,
        on_shard_start=started.append,
    )
    next(it)
    it.close()  # abandon after one batch
    time.sleep(1.0)  # let any wrongly-continuing readers claim shards
    # at most the shards already in flight when we closed (2 workers
    # + a possible race on one more claim each) — never all 8
    assert len(started) <= 4, started


def test_selftest_tensorflow_guard_or_probe(spark):
    """selftest_tensorflow (reference test_tensorflow, oarphpy/
    spark.py:317-351): with TF installed, every slot reports a version
    and an asserted-correct graph compute; without it, the guided
    optional-dependency error (same policy as to_tf_dataset)."""
    import pytest

    from oarphpy_spark import bridges

    try:
        import tensorflow  # noqa: F401

        have_tf = True
    except ImportError:
        have_tf = False

    if not have_tf:
        with pytest.raises(NotImplementedError, match="tensorflow"):
            bridges.selftest_tensorflow(spark)
        return
    infos = bridges.selftest_tensorflow(spark)
    assert infos and all(i["tf_version"] for i in infos)
