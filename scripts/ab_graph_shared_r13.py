#!/usr/bin/env python
"""A/B evidence for extending the shared co-purchase edge cache from
the link-prediction pair to the whole graph-query family (round 13):
q_triangle_count / q_triangle_count_sampled / q_kcore / q_ktruss /
q_graph_profile / q_degree_distribution / q_graph_assortativity now
consume graph_queries._shared_edges instead of each re-deriving the
DISTINCT lineitem self-join.

Arms (interleaved, same session, same data):
  A (independent) — clear the shared cache before EVERY query, so each
     derives the edge relation itself: the old per-query cost model.
  B (shared)      — one cache build, every query reuses it.

Measured: combined family wall per arm (min over --reps) + a value
fingerprint of every query's output per arm — the change must be pure
caching (fingerprints identical across arms) or it is rejected.

Usage: python scripts/ab_graph_shared_r13.py [--sf-dir /root/testdata/sf0.1]
       [--reps 2] [--out AB_GRAPH_SHARED_r13.json]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SLUGS = [
    "q_triangle_count",
    "q_triangle_count_sampled",
    "q_kcore",
    "q_ktruss",
    "q_graph_profile",
    "q_degree_distribution",
    "q_graph_assortativity",
]


def fingerprint(df) -> str:
    rows = sorted(tuple(str(v) for v in r) for r in df.collect())
    return hashlib.sha256(repr(rows).encode()).hexdigest()[:16]


def run_family(spark, sf_dir: str, shared: bool) -> tuple[float, dict]:
    import oarphpy_spark.queries.graph_queries as gq
    from oarphpy_spark import registry
    from oarphpy_spark.llm.dedup import release_cached

    qs = registry.queries()
    gq.release_shared_edges(spark)
    spark.catalog.clearCache()
    fps = {}
    t0 = time.perf_counter()
    for slug in SLUGS:
        if not shared:
            gq.release_shared_edges(spark)
        df = qs[slug](spark, sf_dir)
        fps[slug] = fingerprint(df)
        try:
            release_cached(df)
        except Exception:  # noqa: BLE001 — teardown must not kill the A/B
            pass
    wall = time.perf_counter() - t0
    gq.release_shared_edges(spark)
    return round(wall, 3), fps


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default="AB_GRAPH_SHARED_r13.json")
    args = ap.parse_args()

    from oarphpy_spark.session import SessionFactory

    spark = SessionFactory.getOrCreate()
    run_family(spark, args.sf_dir, shared=True)  # warm (codegen, pools)

    walls = {"independent": [], "shared": []}
    fps = {}
    for _rep in range(args.reps):
        w_a, fp_a = run_family(spark, args.sf_dir, shared=False)
        w_b, fp_b = run_family(spark, args.sf_dir, shared=True)
        walls["independent"].append(w_a)
        walls["shared"].append(w_b)
        fps = {"independent": fp_a, "shared": fp_b}

    a, b = min(walls["independent"]), min(walls["shared"])
    out = {
        "event": "ab_graph_shared_r13",
        "sf_dir": args.sf_dir,
        "slugs": SLUGS,
        "combined_wall_independent_sec": a,
        "combined_wall_shared_sec": b,
        "speedup": round(a / b, 3) if b else None,
        "walls": walls,
        "fingerprints_equal": fps.get("independent") == fps.get("shared"),
        "fingerprints": fps,
    }
    line = json.dumps(out)
    print(line)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), args.out), "w") as f:
        f.write(line + "\n")
    assert out["fingerprints_equal"], "outputs differ between arms!"


if __name__ == "__main__":
    main()
