"""Code-shipping parity: the reference built eggs of the caller's
library and verified executors could import them (reference
oarphpy/spark.py:269-314, test_egg). Engine-native equivalent:
``sc.addPyFile`` a zip; executor Python workers import from it."""

from __future__ import annotations

import os
import zipfile

MODULE_SRC = """
SHIPPED_CONSTANT = 9001

def shipped_fn(x):
    return x * SHIPPED_CONSTANT
"""


def test_zip_module_ships_to_executors(spark, tmp_path):
    zpath = str(tmp_path / "shipped_lib.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        z.writestr("oarphpy_spark_test_shipped_mod.py", MODULE_SRC)
    spark.sparkContext.addPyFile(zpath)

    def use_shipped(x):
        import oarphpy_spark_test_shipped_mod as m

        return m.shipped_fn(x)

    out = spark.sparkContext.parallelize(range(4), 4).map(use_shipped).collect()
    assert out == [0, 9001, 18002, 27003]


def test_executors_see_engine_package(spark):
    # The engine package itself must be importable in executor workers
    # (driver contract: the repo root is on PYTHONPATH / shipped).
    def probe(_):
        from oarphpy_spark.util.misc import stable_hash

        return stable_hash("executor") % 97

    vals = set(spark.sparkContext.parallelize(range(8), 8).map(probe).collect())
    assert len(vals) == 1  # same hash everywhere -> same code everywhere
