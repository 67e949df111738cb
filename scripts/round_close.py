#!/usr/bin/env python
"""Standing round-close gate (VERDICT r09 items 6-7).

One command runs every closing check and appends ONE machine-checkable
``round_close`` event to PROGRESS.jsonl, so the robustness sweeps and
scale smokes can't silently rot out of the checklist:

1. pytest (full suite)
2. parity_gate at sf0.01 (full registry vs DuckDB oracles)
3. parity_robustness: --config-sweep --double-run --arrow-sweep
   --no-persist-sweep --shuffled-sweep
4. staleness_audit (driver-window allocation check)
5. gen_coverage (COVERAGE.md regeneration)
6. scale smokes, round-suffixed (item 7: SCALE_SMOKE{,_2X,_MEM}_r{N}
   .json are kept per-round so heavy-operator regressions are
   diffable across rounds the way BENCH_r{N} is; the unsuffixed
   names stay the "latest" copies)

bench.py is NOT run here — it needs an idle machine and these gates
pin all cores; run it separately once load settles.

Usage: python scripts/round_close.py --round 11 [--skip pytest,smokes]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = "/root/repo"
PY = sys.executable


def sh(args: list[str], timeout: int = 5400, env_extra: dict | None = None) -> dict:
    t0 = time.time()
    env = dict(os.environ, **(env_extra or {}))
    p = subprocess.run(
        args, cwd=REPO, capture_output=True, text=True, timeout=timeout,
        env=env,
    )
    tail = (p.stdout.strip().splitlines() or [""])[-3:]
    return {
        "cmd": " ".join(os.path.basename(a) for a in args[:3]),
        "rc": p.returncode,
        "wall_s": round(time.time() - t0, 1),
        "tail": tail,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument(
        "--skip", default="",
        help="comma list: pytest,parity,robustness,audit,coverage,smokes",
    )
    args = ap.parse_args()
    skip = set(filter(None, args.skip.split(",")))
    n = args.round
    results: dict[str, dict] = {}

    if "pytest" not in skip:
        # The close gate runs the FULL suite including the opt-in slow
        # tier (soaks, registry-wide plan sweep, randomized property
        # suites); the default `pytest tests/` inner loop skips those
        # 18 tests to stay fast (VERDICT r14 item 8).
        r = sh(
            [PY, "-m", "pytest", "tests/", "-q", "--tb=line"],
            env_extra={"SPARK_GRAFT_SLOW_TESTS": "1"},
        )
        results["pytest"] = r
        print("pytest:", r["rc"], r["tail"][-1] if r["tail"] else "")
    if "parity" not in skip:
        r = sh([PY, "scripts/parity_gate.py", "/root/testdata/sf0.01"])
        results["parity_gate_sf001"] = r
        print("parity_gate:", r["rc"], r["tail"][-1] if r["tail"] else "")
    if "robustness" not in skip:
        for mode in ("--config-sweep", "--double-run", "--arrow-sweep",
                     "--no-persist-sweep", "--shuffled-sweep"):
            r = sh([PY, "scripts/parity_robustness.py", mode])
            results[f"robustness_{mode.strip('-').replace('-', '_')}"] = r
            print(mode, r["rc"], r["tail"][-1] if r["tail"] else "")
    if "audit" not in skip:
        r = sh([PY, "scripts/staleness_audit.py"])
        results["staleness_audit"] = r
        print("audit:", r["rc"])
    if "coverage" not in skip:
        # --out actually WRITES the checked-in file (the r11 verdict
        # flagged COVERAGE.md stale: the old call printed to a
        # discarded stdout)
        r = sh([PY, "scripts/gen_coverage.py", "--out",
                os.path.join(REPO, "COVERAGE.md")])
        results["gen_coverage"] = r
        print("coverage:", r["rc"])
    if "smokes" not in skip:
        for label, script, extra in (
            ("scale_smoke", "scripts/scale_smoke.py", []),
            ("scale_smoke_2x", "scripts/scale_smoke.py", ["--replicas", "20"]),
            ("scale_smoke_mem", "scripts/scale_smoke_mem.py", []),
        ):
            suffix = {"scale_smoke": f"SCALE_SMOKE_r{n:02d}.json",
                      "scale_smoke_2x": f"SCALE_SMOKE_2X_r{n:02d}.json",
                      "scale_smoke_mem": f"SCALE_SMOKE_MEM_r{n:02d}.json"}[label]
            out = os.path.join(REPO, suffix)
            r = sh([PY, script, *extra, "--out", out])
            results[label] = r
            # keep the unsuffixed file as the "latest" copy
            latest = suffix.replace(f"_r{n:02d}", "")
            if r["rc"] == 0 and os.path.exists(out):
                shutil.copyfile(out, os.path.join(REPO, latest))
            print(label, "->", suffix, "rc", r["rc"])

    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
        capture_output=True, text=True,
    ).stdout.strip()
    ok = all(r["rc"] == 0 for r in results.values())
    line = {
        "ts": time.time(),
        "event": f"round{n}_close",
        "head": head,
        "ok": ok,
        "gates": results,
    }
    with open(f"{REPO}/PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(line) + "\n")
    print(f"ROUND {n} CLOSE: {'ALL GREEN' if ok else 'FAILURES'} at {head}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
