#!/usr/bin/env python
"""Adjudicate the r13 'weak' perf grades: HEAD vs the r11-close
checkout, INTERLEAVED (VERDICT r13 item 1).

q_sim_topk and q_dedup_minhash measured 2.5x their r01 per-query
baselines in BENCH_r13 with NO plan change since r11 — on a box whose
speed drifts up to ~1.8x between sessions. Raw cross-round walls
cannot separate "the host got slower" from "the code got slower"; an
interleaved A/B can, because both arms sample the same host minutes.

Protocol: alternate fresh-process arm runs HEAD, r11, HEAD, r11, ...
(scripts/ab_arm_runner.py — each run is its own SparkSession with
bench-v3 warm/rep semantics and its own cpu_calib_sec). Per slug we
take the min across each arm's runs; the verdict ratio is
HEAD_min / r11_min, plus calib normalization. Output fingerprints are
compared across arms for the slugs whose semantics did not change.

Writes AB_HOST_DRIFT_r14.json + a PROGRESS.jsonl event.
Run: python scripts/ab_host_drift_r14.py [--rounds 3]
     (expects the r11 worktree at --r11 /tmp/ab_r11, created with
      `git worktree add --detach /tmp/ab_r11 8ef6de6`)
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = "/root/repo"
RUNNER = os.path.join(REPO, "scripts", "ab_arm_runner.py")

SLUGS = [
    "q_sim_topk",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_set_similarity_join",
    "q_stream_upsert",
]


def arm_run(repo: str, sf_dir: str, reps: int, slugs: list[str]) -> dict:
    p = subprocess.run(
        [sys.executable, RUNNER, "--repo", repo, "--sf-dir", sf_dir,
         "--slugs", ",".join(slugs), "--reps", str(reps)],
        capture_output=True, text=True, timeout=1800,
    )
    for ln in p.stdout.splitlines():
        if ln.startswith("ABARM "):
            return json.loads(ln[6:])
    raise RuntimeError(
        f"arm run failed rc={p.returncode}\n{p.stdout[-2000:]}\n"
        f"{p.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--r11", default="/tmp/ab_r11",
                    help="baseline-arm checkout (any commit's worktree)")
    ap.add_argument("--slugs", default=",".join(SLUGS),
                    help="comma list overriding the default slug set")
    ap.add_argument("--baseline-commit", default="8ef6de6",
                    help="recorded in the artifact for provenance")
    ap.add_argument("--event", default="ab_host_drift_r14")
    ap.add_argument("--out", default=os.path.join(REPO, "AB_HOST_DRIFT_r14.json"))
    ap.add_argument(
        "--no-log", action="store_true",
        help="skip the PROGRESS.jsonl append (smoke runs)",
    )
    args = ap.parse_args()
    slugs = args.slugs.split(",")

    runs: list[dict] = []
    for rnd in range(args.rounds):
        for label, repo in (("head", REPO), ("r11", args.r11)):
            rec = arm_run(repo, args.sf_dir, args.reps, slugs)
            rec["arm"], rec["round"] = label, rnd
            runs.append(rec)
            print(
                f"round {rnd} {label}: calib={rec['cpu_calib_sec']} "
                + " ".join(
                    f"{s}={min(t):.2f}" for s, t in rec["slugs"].items()
                )
            )

    per_arm: dict[str, dict] = {"head": {}, "r11": {}}
    calib: dict[str, float] = {}
    for arm in per_arm:
        sel = [r for r in runs if r["arm"] == arm]
        calib[arm] = min(r["cpu_calib_sec"] for r in sel)
        for s in slugs:
            per_arm[arm][s] = min(min(r["slugs"][s]) for r in sel)
    fp_match = {
        s: len({r["fps"][s] for r in runs}) == 1 for s in slugs
    }
    calib_ratio = calib["head"] / calib["r11"] if calib["r11"] else 1.0
    verdicts = {}
    for s in slugs:
        raw = per_arm["head"][s] / per_arm["r11"][s]
        # Arms are interleaved minutes apart, so calib_ratio ~ 1; it is
        # applied anyway so residual drift inside the session window
        # cannot masquerade as a code delta.
        norm = raw / calib_ratio if calib_ratio else raw
        verdicts[s] = {
            "head_min_s": per_arm["head"][s],
            "r11_min_s": per_arm["r11"][s],
            "raw_ratio": round(raw, 3),
            "calib_norm_ratio": round(norm, 3),
            "fingerprints_equal_across_arms": fp_match[s],
            "verdict": "ok" if norm <= 1.10 else "regressed",
        }
    out = {
        "event": args.event,
        "ts": time.time(),
        "protocol": (
            "interleaved fresh-process arms head/r11/head/r11/...; "
            "bench-v3 warm+rep semantics per arm; per-slug min across "
            "arm runs; per-process cpu_calib_sec (min across runs per "
            "arm) normalizes residual drift"
        ),
        "r11_commit": args.baseline_commit,
        "baseline_checkout": args.r11,
        "cpu_calib_sec": calib,
        "calib_ratio_head_over_r11": round(calib_ratio, 4),
        "verdicts": verdicts,
        "runs": runs,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    if not args.no_log:
        with open(os.path.join(REPO, "PROGRESS.jsonl"), "a") as f:
            f.write(json.dumps({
                "ts": time.time(), "event": args.event,
                "verdicts": {s: v["verdict"] for s, v in verdicts.items()},
                "ratios": {
                    s: v["calib_norm_ratio"] for s, v in verdicts.items()
                },
            }) + "\n")
    print(json.dumps({s: v["calib_norm_ratio"] for s, v in verdicts.items()}))


if __name__ == "__main__":
    main()
