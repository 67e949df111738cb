#!/usr/bin/env python
"""One A/B arm: run a slug list from a GIVEN repo checkout in a fresh
process/session, bench-v3 measurement semantics (warm pass builds the
ride-along caches; timed reps reuse them; caches released between
slugs), and print ONE JSON line with per-slug times, output
fingerprints, and a host-speed calibration taken in THIS process.

Used by scripts/ab_host_drift_r14.py, which alternates HEAD and
r11-close arms so host drift hits both equally. The runner itself is
checkout-agnostic: everything repo-specific is imported from --repo.

Run: python scripts/ab_arm_runner.py --repo /path/to/checkout \
       --sf-dir /root/testdata/sf0.1 --slugs a,b,c [--reps 3]
"""
from __future__ import annotations

import argparse
import hashlib
import json
import sys
import time


def cpu_calib_sec() -> float:
    """Same fixed workload as bench.py's _cpu_calibration (sha256 over
    256 MiB + interpreter loop, min-of-3) — duplicated here so the
    yardstick is identical in BOTH arms regardless of which checkout
    is on sys.path."""
    blk = b"\0" * (1 << 20)
    best_hash = best_loop = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        h = hashlib.sha256()
        for _i in range(256):
            h.update(blk)
        best_hash = min(best_hash, time.perf_counter() - t0)
        t0 = time.perf_counter()
        acc = 0
        for i in range(2_000_000):
            acc += i * i
        best_loop = min(best_loop, time.perf_counter() - t0)
    return round(best_hash + best_loop, 4)


def fingerprint(df) -> str:
    rows = sorted(tuple(str(v) for v in r) for r in df.collect())
    return hashlib.sha256(repr(rows).encode()).hexdigest()[:16]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--slugs", required=True)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    from oarphpy_spark import registry
    from oarphpy_spark.llm.dedup import release_cached
    from oarphpy_spark.session import SessionFactory

    spark = SessionFactory.getOrCreate()
    qs = registry.queries()
    calib_before = cpu_calib_sec()

    def run(name: str):
        df = qs[name](spark, args.sf_dir)
        df.write.mode("overwrite").format("noop").save()
        return df

    out: dict = {"repo": args.repo, "slugs": {}, "fps": {}}
    for name in args.slugs.split(","):
        dfs = [run(name)]  # warm pass
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            dfs.append(run(name))
            times.append(round(time.perf_counter() - t0, 4))
        out["slugs"][name] = times
        out["fps"][name] = fingerprint(qs[name](spark, args.sf_dir))
        for df in dfs:
            try:
                release_cached(df)
            except Exception:  # noqa: BLE001 — teardown
                pass
        # Graph-family slugs also warm the session-shared edge
        # localCheckpoint; without releasing it between slugs, the
        # FIRST graph slug in the list absorbs the build cost and
        # later ones ride warm — order-dependent per-slug walls, the
        # exact comparability gap bench v4 fixed (ADVICE r14). Guarded
        # getattr: old checkouts (pre-r13) lack the module/function.
        try:
            gq = __import__(
                "oarphpy_spark.queries.graph_queries",
                fromlist=["release_shared_edges"],
            )
            release_shared = getattr(gq, "release_shared_edges", None)
            if release_shared is not None:
                release_shared(spark)
        except Exception:  # noqa: BLE001 — teardown
            pass
        # Same for the dedup-LSH family's shared bucket checkpoint
        # (r16). Guarded getattr: pre-r16 checkouts lack the function.
        try:
            lq = __import__(
                "oarphpy_spark.queries.llm_queries",
                fromlist=["release_shared_buckets"],
            )
            release_b = getattr(lq, "release_shared_buckets", None)
            if release_b is not None:
                release_b(spark)
        except Exception:  # noqa: BLE001 — teardown
            pass
    out["cpu_calib_sec"] = round(min(calib_before, cpu_calib_sec()), 4)
    print("ABARM " + json.dumps(out))


if __name__ == "__main__":
    main()
