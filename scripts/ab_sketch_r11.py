#!/usr/bin/env python
"""One-off r11 A/B: link-prediction sketch top-T selection rewrite
(row_number window -> single groupBy partial aggregation) vs the
capped-exact path, at sf1.0 (10x-replicated sf0.1).  Appends one
`sketch_topT_ab` event to PROGRESS.jsonl (VERDICT r09 item 4 done
criterion)."""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.scale_smoke import build_scaled  # noqa: E402


def main() -> None:
    from oarphpy_spark import registry
    from oarphpy_spark.llm.dedup import release_cached
    from oarphpy_spark.session import SessionFactory

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    class ABSession(SessionFactory):
        APP_NAME = "oarphpy_spark_ab_sketch"
        CONF_KV = dict(
            SessionFactory.CONF_KV,
            **{
                "spark.sql.shuffle.partitions": str(cpus * 2),
                "spark.sql.files.maxPartitionBytes": str(16 << 20),
            },
        )

    work = tempfile.mkdtemp(prefix="oarphpy_spark_ab_")
    data_dir = os.path.join(work, "sf1.0")
    spark = ABSession.getOrCreate()
    qs = registry.queries()
    out: dict[str, object] = {"ts": time.time(), "event": "sketch_topT_ab"}
    try:
        t0 = time.perf_counter()
        build_scaled(spark, "/root/testdata/sf0.1", data_dir, 10)
        out["build_sec"] = round(time.perf_counter() - t0, 2)

        def best2(name: str) -> float:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                df = qs[name](spark, data_dir)
                try:
                    df.write.mode("overwrite").format("noop").save()
                    best = min(best, round(time.perf_counter() - t0, 2))
                finally:
                    try:
                        release_cached(df)
                    except Exception:  # noqa: BLE001
                        pass
            return best

        out["sketch_sf1_sec"] = best2("q_link_prediction_sketch")
        out["exact_sf1_sec"] = best2("q_link_prediction")
        out["r09_window_form"] = {"sketch": 38.7, "exact": 39.9}
    finally:
        spark.stop()
        import shutil

        shutil.rmtree(work, ignore_errors=True)
    line = json.dumps(out)
    print(line)
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "PROGRESS.jsonl"), "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
