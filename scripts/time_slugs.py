#!/usr/bin/env python
"""Targeted slug timing with bench.py semantics (r15 measurement
loop): same BenchSession config, same shared-edge prewarm, same
warm-pass + best-of-N adaptive reps, same noop sink. Used for
before/after A/B of individual optimizations without paying the full
bench wall.

Usage: python scripts/time_slugs.py q_a,q_b [reps] [max_reps]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
Prints one JSON line: {"slugs": {...}, "detail": {...}, "calib": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _cpu_calib() -> float:
    """bench.py's host-speed yardstick, imported so numbers from this
    runner normalize against bench artifacts directly."""
    from bench import _cpu_calibration

    return _cpu_calibration()


def main() -> None:
    slugs = sys.argv[1].split(",")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    max_reps = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    from oarphpy_spark import registry
    from oarphpy_spark.llm.dedup import release_cached
    from oarphpy_spark.session import SessionFactory

    biggest = max(
        (
            os.path.getsize(os.path.join(sf_dir, f))
            for f in os.listdir(sf_dir)
        ),
        default=128 << 20,
    )
    split = min(max(biggest // (cpus * 3), 1 << 20), 128 << 20)

    class BenchSession(SessionFactory):
        APP_NAME = "oarphpy_spark_time_slugs"
        CONF_KV = dict(
            SessionFactory.CONF_KV,
            **{
                "spark.sql.files.maxPartitionBytes": str(split),
                "spark.sql.shuffle.partitions": str(cpus * 2),
            },
        )

    spark = BenchSession.getOrCreate()
    qs = registry.queries()

    from oarphpy_spark.queries.graph_queries import (
        _shared_edges,
        release_shared_edges,
    )

    t0 = time.perf_counter()
    _shared_edges(spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    prewarm = round(time.perf_counter() - t0, 4)

    def run(name: str):
        spark.sparkContext.setJobDescription(f"time_slugs: {name}")
        df = qs[name](spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        return df

    out: dict[str, float] = {}
    detail: dict[str, dict] = {}
    for name in slugs:
        t0 = time.perf_counter()
        dfs = [run(name)]
        warm_sec = round(time.perf_counter() - t0, 4)
        times: list[float] = []
        while len(times) < reps or (
            len(times) < max_reps
            and sorted(times)[1] / sorted(times)[0] - 1 > 0.10
        ):
            t0 = time.perf_counter()
            dfs.append(run(name))
            times.append(round(time.perf_counter() - t0, 4))
        s = sorted(times)
        out[name] = s[0]
        detail[name] = {
            "warm_sec": warm_sec,
            "times": times,
            "spread": round(s[1] / s[0] - 1, 4) if s[0] else 0.0,
        }
        for df in dfs:
            try:
                release_cached(df)
            except Exception:  # noqa: BLE001
                pass
    release_shared_edges(spark)
    print(
        json.dumps(
            {
                "slugs": out,
                "detail": detail,
                "shared_edge_prewarm_sec": prewarm,
                "cpu_calib_sec": _cpu_calib(),
                "sf_dir": sf_dir,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
