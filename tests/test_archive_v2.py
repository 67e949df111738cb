from __future__ import annotations

import tarfile
import zipfile

import pytest

from oarphpy_spark.sources.archive_v2 import register


@pytest.fixture(scope="module")
def ar_session(spark):
    register(spark)
    return spark


def test_read_zip_members(ar_session, tmp_path):
    z = tmp_path / "fixture.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("a.txt", "alpha")
        zf.writestr("sub/b.bin", b"\x00\x01")

    df = ar_session.read.format("archive").load(str(z))
    rows = {r["name"]: bytes(r["data"]) for r in df.collect()}
    assert rows == {"a.txt": b"alpha", "sub/b.bin": b"\x00\x01"}


def test_read_glob_of_archives_partitions(ar_session, tmp_path):
    for i in range(2):
        with zipfile.ZipFile(tmp_path / f"part{i}.zip", "w") as zf:
            for j in range(4):
                zf.writestr(f"doc{i}_{j}.txt", f"text {i} {j}")
    t = tmp_path / "extra.tar.gz"
    with tarfile.open(t, "w:gz") as tf:
        p = tmp_path / "c.txt"
        p.write_text("gamma")
        tf.add(p, arcname="c.txt")

    df = ar_session.read.format("archive") \
        .option("membersperpartition", 2) \
        .load(str(tmp_path / "*.zip"))
    assert df.count() == 8
    # 2 archives x 4 members / 2-per-partition = 4 partitions
    assert df.rdd.getNumPartitions() == 4
    assert df.select("archive").distinct().count() == 2

    tdf = ar_session.read.format("archive").load(str(t))
    assert {bytes(r["data"]) for r in tdf.collect()} == {b"gamma"}
