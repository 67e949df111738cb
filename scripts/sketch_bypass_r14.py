#!/usr/bin/env python
"""r14 done-criteria evidence for the sketch dg<=T bypass (VERDICT r13
item 4): (1) interleaved sketch-vs-exact at sf0.1 in ONE session with
the shared edge cache warm — the bypass must make the sketch no slower
than the exact path at tested SFs; (2) hub-clique stress driving the
REAL plan builders on a synthetic 6000-part order (clique degree 5999
> _LP_DEGREE_CAP, uncapped exact wedge volume ~1.1e11) — the sketch
must finish because its wedge volume is pinned at n*T^2, which is the
whole reason the sketch path exists.

Writes SKETCH_BYPASS_r14.json + a PROGRESS.jsonl event.
Run: python scripts/sketch_bypass_r14.py [--reps 3]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

REPO = "/root/repo"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--clique", type=int, default=6000)
    ap.add_argument("--no-log", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    import oarphpy_spark.queries.graph_queries as gq
    from oarphpy_spark import registry
    from oarphpy_spark.session import SessionFactory
    from oarphpy_spark.tables import table

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    class ABSession(SessionFactory):
        APP_NAME = "oarphpy_spark_sketch_bypass"
        CONF_KV = dict(
            SessionFactory.CONF_KV,
            **{"spark.sql.shuffle.partitions": str(cpus * 2)},
        )

    spark = ABSession.getOrCreate()
    qs = registry.queries()
    out: dict = {"event": "sketch_bypass_r14", "ts": time.time()}

    # --- (1) interleaved sketch vs exact at sf0.1, shared cache warm
    gq.release_shared_edges(spark)
    gq._lp_shared_relations(spark, args.sf_dir)  # both relations warm
    pair = ("q_link_prediction_sketch", "q_link_prediction")
    walls: dict[str, list[float]] = {n: [] for n in pair}
    for n in pair:  # warm pass (codegen, pools)
        qs[n](spark, args.sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
    for _ in range(args.reps):
        for n in pair:  # interleaved: drift hits both arms equally
            t0 = time.perf_counter()
            qs[n](spark, args.sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            walls[n].append(round(time.perf_counter() - t0, 3))
    sk, ex = (min(walls[n]) for n in pair)
    out["sf01_interleaved"] = {
        "sketch_min_s": sk,
        "exact_min_s": ex,
        "sketch_over_exact": round(sk / ex, 3),
        "walls": walls,
        "reps": args.reps,
    }
    print(f"sf0.1 interleaved: sketch {sk:.2f}s exact {ex:.2f}s "
          f"ratio {sk / ex:.3f}")
    gq.release_shared_edges(spark)

    # --- (2) hub-clique stress on the REAL plan builders
    work = tempfile.mkdtemp(prefix="oarphpy_spark_hub_")
    try:
        li = table(spark, args.sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        )
        maxo = li.agg(F.max("l_orderkey")).first()[0]
        # Clique part ids far outside the real id space (but < 2^32):
        # pure-synthetic hub, degree = clique-1 > _LP_DEGREE_CAP.
        clique = spark.range(args.clique).select(
            F.lit(maxo + 1).alias("l_orderkey"),
            (F.col("id") + 1_000_000).alias("l_partkey"),
        )
        li.unionByName(clique).write.mode("overwrite").parquet(
            os.path.join(work, "lineitem.parquet")
        )
        n = args.clique
        out["hub_stress"] = {
            "clique": n,
            "uncapped_wedges": n * (n - 1) * (n - 2) // 2,
            "sketch_wedge_bound": n * gq._LP_SKETCH_T ** 2,
            "degree_cap": gq._LP_DEGREE_CAP,
        }
        for label, build, bargs in (
            ("sketch", gq._link_prediction_sketch_plan, (spark, work)),
            (
                "exact_capped",
                gq._link_prediction_exact_plan,
                (spark, work, gq._LP_DEGREE_CAP),
            ),
        ):
            t0 = time.perf_counter()
            df, caches = build(*bargs)
            rows = df.collect()
            out["hub_stress"][f"{label}_s"] = round(
                time.perf_counter() - t0, 2
            )
            out["hub_stress"][f"{label}_rows"] = len(rows)
            for c in caches:
                c.unpersist()
            gq.release_shared_edges(spark)
            print(f"hub {label}: {out['hub_stress'][f'{label}_s']}s "
                  f"({len(rows)} rows)")
    finally:
        shutil.rmtree(work, ignore_errors=True)

    with open(os.path.join(REPO, "SKETCH_BYPASS_r14.json"), "w") as f:
        json.dump(out, f, indent=1)
    if not args.no_log:
        with open(os.path.join(REPO, "PROGRESS.jsonl"), "a") as f:
            f.write(json.dumps({
                "ts": time.time(), "event": "sketch_bypass_r14",
                "sketch_over_exact_sf01":
                    out["sf01_interleaved"]["sketch_over_exact"],
                "hub_sketch_s": out["hub_stress"]["sketch_s"],
                "hub_exact_capped_s": out["hub_stress"]["exact_capped_s"],
            }) + "\n")


if __name__ == "__main__":
    main()
