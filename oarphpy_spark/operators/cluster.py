"""Cluster execution utilities.

Capability parity with the reference's executor primitives
(reference ``oarphpy/spark.py:82-146, 246-260``), using supported APIs:

* ``for_each_executor`` — run a thunk ~once per executor slot (env
  checks, cache warming). The reference probed executor count via the
  non-public ``sc._jsc.sc().getExecutorMemoryStatus()``; we size by
  ``defaultParallelism`` (public) and accept at-least-once semantics.
* ``cluster_cpu_count`` — total usable task slots.
* ``run_callables`` — distribute arbitrary callables and collect
  (callable, result) pairs; cloudpickle via Spark's own serializer.
* ``monte_carlo_pi`` — the reference's cluster-health smoke test,
  DataFrame-native: ``spark.range`` + ``rand()`` + filter + count, all
  codegen'd (no Python in the loop, unlike the reference's RDD filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def cluster_cpu_count(spark: SparkSession) -> int:
    """Total task slots (reference ``oarphpy/spark.py:116-123`` summed
    multiprocessing.cpu_count() per executor; defaultParallelism is the
    supported equivalent)."""
    return spark.sparkContext.defaultParallelism


def for_each_executor(spark: SparkSession, thunk) -> list:
    """Run ``thunk()`` on every task slot (>= once per executor).
    Returns the list of results."""
    n = cluster_cpu_count(spark)
    return (
        spark.sparkContext.parallelize(range(n), n).map(lambda _: thunk()).collect()
    )


def run_callables(spark: SparkSession, callables: list, parallel: int = -1) -> list:
    """Run a list of zero-arg callables distributed; returns results in
    input order (reference ``oarphpy/spark.py:126-146``)."""
    if parallel <= 0:
        parallel = max(1, min(len(callables), cluster_cpu_count(spark)))
    indexed = list(enumerate(callables))
    out = (
        spark.sparkContext.parallelize(indexed, parallel)
        .map(lambda pair: (pair[0], pair[1]()))
        .collect()
    )
    return [r for _, r in sorted(out)]


def _typed_sys_info() -> dict:
    """TYPED per-host inventory for ``cluster_get_info``'s DataFrame —
    numeric columns you can aggregate/filter on, unlike the
    reference-parity blob dict (``oarphpy_spark.util.misc.get_sys_info``,
    reference ``oarphpy/util/misc.py:371-412``) which ships command
    output as strings. Dependency- and network-free: everything comes
    from /proc, ``shutil`` and the stdlib so it runs identically on any
    executor without forking subprocesses."""
    import multiprocessing
    import shutil
    import socket
    import sys

    mem_total_mb = mem_avail_mb = -1
    try:
        with open("/proc/meminfo") as f:
            for ln in f:
                if ln.startswith("MemTotal:"):
                    mem_total_mb = int(ln.split()[1]) // 1024
                elif ln.startswith("MemAvailable:"):
                    mem_avail_mb = int(ln.split()[1]) // 1024
    except OSError:
        pass
    du = shutil.disk_usage("/")
    try:
        from oarphpy_spark.util.gpus import GPUInfo

        n_gpus = len(GPUInfo.get_infos())
    except Exception:  # noqa: BLE001 — no GPUs / no nvidia-smi
        n_gpus = 0
    return {
        "hostname": socket.gethostname(),
        "n_cpus": multiprocessing.cpu_count(),
        "mem_total_mb": mem_total_mb,
        "mem_available_mb": mem_avail_mb,
        "disk_total_gb": int(du.total // 2**30),
        "disk_free_gb": int(du.free // 2**30),
        "n_gpus": n_gpus,
        "python_version": "%d.%d.%d" % sys.version_info[:3],
        "python_path": ":".join(sys.path),
    }


_SYS_INFO_SCHEMA = (
    "slot int, hostname string, n_cpus int, mem_total_mb long, "
    "mem_available_mb long, disk_total_gb long, disk_free_gb long, "
    "n_gpus int, python_version string, python_path string"
)


def cluster_get_info(spark: SparkSession) -> DataFrame:
    """Per-slot host/memory/disk/GPU inventory as a DataFrame — the
    engine-native form of the reference's ``cluster_get_info`` text
    report (``oarphpy/spark.py:218-243``): one row per task slot, so a
    heterogeneous or misconfigured worker shows up as a distinct row
    you can ``groupBy('hostname')`` instead of grepping a blob. Use
    ``cluster_get_info_report`` for the reference-shaped text."""
    infos = for_each_executor(spark, _typed_sys_info)
    rows = [dict(info, slot=i) for i, info in enumerate(infos)]
    return spark.createDataFrame(rows, _SYS_INFO_SCHEMA)


def cluster_get_info_report(spark: SparkSession) -> str:
    """Reference-parity text report (``oarphpy/spark.py:218-243``): one
    formatted block per distinct host, built from the blob-shaped
    ``get_sys_info`` probes the reference uses (slots on one host are
    identical by construction, so we collapse per host; the reference
    printed one block per probe)."""
    from oarphpy_spark.util.misc import get_sys_info

    seen: dict[str, dict] = {}
    for info in for_each_executor(spark, get_sys_info):
        seen.setdefault(info["hostname"], info)
    blocks = []
    for host, info in sorted(seen.items()):
        blocks.append(
            "\n".join(
                [
                    f"Host: {host} {info.get('host', '')}",
                    f"Num CPUs: {info['n_cpus']}",
                    f"Memory:\n{info['memory']}",
                    f"PYTHONPATH:\n{info['PYTHONPATH']}",
                    f"nvidia-smi:\n{info['nvidia_smi']}",
                    f"Disk:\n{info['disk_free']}",
                ]
            )
        )
    return "\n\n".join(blocks)


def monte_carlo_pi(spark: SparkSession, n_samples: int = 1_000_000, seed: int = 1337) -> DataFrame:
    """Estimate pi: fraction of uniform points inside the unit circle.
    One-row DataFrame (pi_est DOUBLE, n_samples BIGINT). Entirely
    JVM-side; the reference's version pickled every point into Python
    (``oarphpy/spark.py:246-260``)."""
    pts = spark.range(n_samples).select(
        (F.rand(seed) * 2 - 1).alias("x"), (F.rand(seed + 1) * 2 - 1).alias("y")
    )
    inside = pts.filter(F.col("x") ** 2 + F.col("y") ** 2 <= 1.0)
    return inside.agg(
        (F.count("*") * 4.0 / n_samples).alias("pi_est"),
        F.lit(n_samples).alias("n_samples"),
    )
