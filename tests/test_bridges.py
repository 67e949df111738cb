from __future__ import annotations

import io

import pytest

from pyspark.sql import functions as F

from oarphpy_spark.bridges import iter_row_batches, to_tf_dataset, to_torch_iterable
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
