#!/usr/bin/env python
"""A/B record: link-prediction candidate-table rewrite (round 11).

Variants measured at sf0.1 (interleaved, warm, identical top-20):
  v0 (r10 form)                         32.5-34.5 s
  v2 (degree-carry + SHUFFLE_HASH)      31.8 s
  v3 (v2 + (u,v) packed into one bigint) 22.6-23.1 s  <- ADOPTED
The adopted form lives in graph_queries._link_prediction_exact and
q_link_prediction_sketch (same three moves). This script keeps the
intermediate v2 for provenance. Run: python scripts/ab_linkpred_r11.py
[sf_dir]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from oarphpy_spark.session import SessionFactory  # noqa: E402
from oarphpy_spark.queries.graph_queries import (  # noqa: E402
    _copurchase_edges,
    _LP_DEGREE_CAP,
)


def v2(spark, sf_dir, degree_cap=_LP_DEGREE_CAP):
    pr = _copurchase_edges(spark, sf_dir).persist()
    und = pr.unionAll(
        pr.select(F.col("d").alias("s"), F.col("s").alias("d"))
    )
    deg = und.groupBy(F.col("s").alias("node")).agg(
        F.count("*").alias("dg")
    ).persist()
    capped = (
        und.join(
            deg.filter(F.col("dg") <= degree_cap).select(
                F.col("node").alias("s")
            ),
            "s",
            "left_semi",
        )
        # d-side degree rides along through the wedge join, so the
        # final per-pair degree joins disappear from the 101M-row path
        .join(
            deg.select(F.col("node").alias("d"), F.col("dg").alias("dd")),
            "d",
        )
        .persist()
    )
    a, b = capped.alias("a"), capped.alias("b")
    cn = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.d") < F.col("b.d")),
        )
        .groupBy(F.col("a.d").alias("u"), F.col("b.d").alias("v"))
        .agg(
            F.count("*").alias("common"),
            F.min(F.col("a.dd")).alias("du"),
            F.min(F.col("b.dd")).alias("dv"),
        )
    )
    nonedge = cn.join(
        pr.hint("SHUFFLE_HASH"),
        (F.col("u") == F.col("s")) & (F.col("v") == F.col("d")),
        "left_anti",
    )
    out = (
        nonedge.select(
            "u",
            "v",
            "common",
            F.round(
                F.col("common")
                / (F.col("du") + F.col("dv") - F.col("common")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "u", "v")
        .limit(20)
    )
    out = out.localCheckpoint(eager=True)
    pr.unpersist()
    capped.unpersist()
    deg.unpersist()
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = SessionFactory.getOrCreate()
    from oarphpy_spark import registry
    import oarphpy_spark.queries  # noqa: F401

    q0 = registry.queries()["q_link_prediction"]
    for name, fn in (("v2", v2), ("v0", q0), ("v2b", v2), ("v0b", q0)):
        t0 = time.time()
        df = fn(spark, sf_dir)
        rows = df.collect()
        print(name, round(time.time() - t0, 1), "s")
        if name == "v0":
            base = sorted(map(tuple, rows))
        elif name == "v2":
            cand = sorted(map(tuple, rows))
    print("IDENTICAL:", base == cand)
    if base != cand:
        for r in base[:5]:
            print("v0", r)
        for r in cand[:5]:
            print("v2", r)
    spark.stop()


if __name__ == "__main__":
    main()
