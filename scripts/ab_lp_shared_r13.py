#!/usr/bin/env python
"""A/B evidence for the round-13 link-prediction shared-subtree rewrite
(VERDICT r12 item 3): q_link_prediction and q_link_prediction_sketch
previously EACH rebuilt the same DISTINCT lineitem self-join (edge set)
and 2|E|-row degree aggregation; round 13 moves both into a
session-shared localCheckpoint cache (graph_queries._lp_shared_relations).

Arms (interleaved, same session, same data):
  A (independent) — clear the shared cache between the two queries, so
     each derives pr/deg itself: the old per-query cost model.
  B (shared)      — run the pair with the cache warm across them: the
     new model; the second query skips the edge derivation.

Measured: combined two-query wall per arm (min over --reps), plus a
value fingerprint of both outputs per arm — the rewrite must be a pure
caching change (fingerprints identical across arms) or it is rejected.

Usage: python scripts/ab_lp_shared_r13.py [--sf-dir /root/testdata/sf0.1]
       [--reps 2] [--out AB_LP_SHARED_r13.json]
Writes ONE JSON line to stdout (and --out).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fingerprint(df) -> str:
    rows = sorted(
        tuple(str(v) for v in r) for r in df.collect()
    )
    return hashlib.sha256(repr(rows).encode()).hexdigest()[:16]


def run_pair(spark, sf_dir: str, shared: bool) -> tuple[float, dict]:
    import oarphpy_spark.queries.graph_queries as gq
    from oarphpy_spark import registry

    qs = registry.queries()
    gq.release_shared_edges(spark)
    spark.catalog.clearCache()
    fps = {}
    t0 = time.perf_counter()
    for slug in ("q_link_prediction", "q_link_prediction_sketch"):
        if not shared:
            gq.release_shared_edges(spark)
        fps[slug] = fingerprint(qs[slug](spark, sf_dir))
    wall = time.perf_counter() - t0
    gq.release_shared_edges(spark)
    return round(wall, 3), fps


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default="AB_LP_SHARED_r13.json")
    args = ap.parse_args()

    from oarphpy_spark.session import SessionFactory

    spark = SessionFactory.getOrCreate()
    # Warm pass (codegen, parquet footers, Python pools) outside timing.
    run_pair(spark, args.sf_dir, shared=True)

    walls = {"independent": [], "shared": []}
    fps = {}
    for _rep in range(args.reps):
        # Interleaved so host drift hits both arms equally.
        w_a, fp_a = run_pair(spark, args.sf_dir, shared=False)
        w_b, fp_b = run_pair(spark, args.sf_dir, shared=True)
        walls["independent"].append(w_a)
        walls["shared"].append(w_b)
        fps = {"independent": fp_a, "shared": fp_b}

    a, b = min(walls["independent"]), min(walls["shared"])
    out = {
        "event": "ab_lp_shared_r13",
        "sf_dir": args.sf_dir,
        "combined_wall_independent_sec": a,
        "combined_wall_shared_sec": b,
        "speedup": round(a / b, 3) if b else None,
        "walls": walls,
        "fingerprints": fps,
        "fingerprints_equal": fps.get("independent") == fps.get("shared"),
    }
    line = json.dumps(out)
    print(line)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), args.out), "w") as f:
        f.write(line + "\n")
    assert out["fingerprints_equal"], "outputs differ between arms!"


if __name__ == "__main__":
    main()
