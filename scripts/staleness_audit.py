#!/usr/bin/env python
"""Machine-check the driver-window rotation policy.

The correctness story rests on a discipline: any query whose
implementation changed since its last driver-green row must be rotated
into the next round's bounded verification window (the first
``--window`` entries of ``registry.queries()`` order, pinned by
``_ROUND_PRIORITY``).  This script turns that discipline into an audit:

1. For every slug, find the LAST round with a green driver row
   (``CORRECTNESS_r*.json``: exact rows green on hash_match, the
   rows-only trio green on having produced rows).
2. Map each slug to its implementing files: the query function's
   module plus the transitive closure of its intra-package imports
   (so ``q_pagerank`` in queries/llm_queries.py picks up llm/graph.py
   and util/checkpoints.py).
3. Compare each implementing file between that round's snapshot
   commit (the commit that ADDED the round's CORRECTNESS file — the
   driver's round-close commit) and HEAD at DEF granularity: a
   top-level function/class (decorators included, so oracle-SQL edits
   count) is "changed" if it existed at the snapshot and its source
   differs now (or it was deleted).  Pure ADDITIONS don't flag —
   registering a new query into a module must not mark every
   other query in that module stale.
4. A slug is STALE if, since its last green row, its own query
   function changed, OR a shared (non-query) def in its module
   changed, OR any pre-existing def in a support module of its
   closure changed.

Pass condition — the window must be SATURATED stale-first:

* every never-verified slug is inside the window prefix, and
* no stale slug waits outside the prefix while a slot inside the
  prefix is spent on a non-stale slug.

A literally-empty stale set is not reachable in one round: shared
helpers (``tables.py:table`` is in every closure) change most rounds,
which marks far more slugs than one 50-slot window holds.  The audit
therefore enforces that each window drains the stalest work first
(rank: own-function edits, then oldest last-green round) and records
the remaining ``backlog`` so its round-over-round drain is auditable.
The full-registry LOCAL parity gate (scripts/parity_gate.py,
representation-exact) still covers all queries every round; the
driver window is the independent subsample this script allocates.

Exit 0 = saturated; the result is appended to PROGRESS.jsonl.

Usage: python scripts/staleness_audit.py [--window 50] [--no-log]
"""

from __future__ import annotations

import ast
import glob
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PKG = "oarphpy_spark"


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout


def last_green_rounds() -> dict[str, int]:
    """slug -> latest round number with a green driver row."""
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            rows = json.load(f)
        for slug, rec in rows.items():
            if rec.get("err") == "no_oracle":
                green = rec.get("spark_rows") is not None
            else:
                green = (
                    rec.get("err") is None
                    and rec.get("rows_match")
                    and rec.get("schema_match")
                    and rec.get("hash_match")
                )
            if green:
                out[slug] = max(out.get(slug, 0), rnd)
    return out


def round_snapshot_commits() -> dict[int, str]:
    """round -> commit that added that round's CORRECTNESS file."""
    out: dict[int, str] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)\.json$", path).group(1))
        log = _git(
            "log", "--diff-filter=A", "--format=%H", "--", os.path.basename(path)
        ).split()
        if log:
            out[rnd] = log[-1]  # oldest add (driver's round-close commit)
    return out


def import_graph() -> dict[str, set[str]]:
    """module name -> set of intra-package module names it imports."""
    graph: dict[str, set[str]] = {}
    pkg_root = os.path.join(REPO, PKG)
    for dirpath, _dirs, files in os.walk(pkg_root):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            rel = os.path.relpath(path, REPO)[: -len(".py")]
            mod = rel.replace(os.sep, ".")
            if mod.endswith(".__init__"):
                mod = mod[: -len(".__init__")]
            deps: set[str] = set()
            try:
                tree = ast.parse(open(path).read())
            except SyntaxError:
                continue
            for node in ast.walk(tree):
                if isinstance(node, ast.Import):
                    deps.update(
                        a.name for a in node.names if a.name.startswith(PKG)
                    )
                elif isinstance(node, ast.ImportFrom) and node.module:
                    base = node.module
                    if node.level:  # relative import: resolve against mod
                        parts = mod.split(".")[: -node.level or None]
                        base = ".".join(parts + [node.module])
                    if base.startswith(PKG):
                        deps.add(base)
                        # `from pkg.mod import name` where name is a module
                        deps.update(f"{base}.{a.name}" for a in node.names)
            graph[mod] = deps
    # keep only modules that actually exist in the graph
    known = set(graph)
    return {m: {d for d in deps if d in known} for m, deps in graph.items()}


# Registration machinery, not implementation: the registry imports ALL
# query modules as a load-everything side effect, and the queries
# package init pins window ordering.  Traversing through them would
# make every slug depend on every module (and a priority-list edit
# would mark the whole registry stale).
HUBS = {PKG, f"{PKG}.registry", f"{PKG}.queries"}


def closure(graph: dict[str, set[str]], start: str) -> set[str]:
    seen: set[str] = set()
    stack = [start]
    while stack:
        mod = stack.pop()
        if mod in seen or mod not in graph or mod in HUBS:
            continue
        seen.add(mod)
        stack.extend(graph[mod] - seen)
    return seen


def mod_to_file(mod: str) -> str:
    path = mod.replace(".", os.sep)
    if os.path.isdir(os.path.join(REPO, path)):
        return os.path.join(path, "__init__.py")
    return path + ".py"


def defs_src(src: str) -> dict[str, str]:
    """Top-level def/class name -> exact source (decorators included).

    Module-level statements outside any def hash together under the
    pseudo-name ``__module__`` (constants, registration calls).
    """
    tree = ast.parse(src)
    lines = src.splitlines()
    out: dict[str, str] = {}
    other: list[str] = []
    for node in tree.body:
        if isinstance(
            node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
        ):
            start = min(
                [d.lineno for d in node.decorator_list] + [node.lineno]
            )
            out[node.name] = "\n".join(lines[start - 1 : node.end_lineno])
        else:
            other.append("\n".join(lines[node.lineno - 1 : node.end_lineno]))
    out["__module__"] = "\n".join(other)
    return out


def changed_defs(
    path: str, commit: str, cache: dict[tuple[str, str], set[str]]
) -> set[str]:
    """Defs present at ``commit`` whose source differs at HEAD (or gone)."""
    key = (path, commit)
    if key not in cache:
        try:
            old_src = _git("show", f"{commit}:{path}")
        except subprocess.CalledProcessError:
            cache[key] = set()  # new file: additions only, nothing stale
            return cache[key]
        full = os.path.join(REPO, path)
        new = defs_src(open(full).read()) if os.path.exists(full) else {}
        old = defs_src(old_src)
        cache[key] = {n for n, s in old.items() if new.get(n) != s}
    return cache[key]


def main() -> int:
    window = 50
    log = True
    argv = sys.argv[1:]
    if "--window" in argv:
        window = int(argv[argv.index("--window") + 1])
    if "--no-log" in argv:
        log = False

    from oarphpy_spark import registry

    qs = registry.queries()
    prefix = set(list(qs)[:window])
    greens = last_green_rounds()
    snaps = round_snapshot_commits()
    graph = import_graph()
    query_fn_names = {fn.__name__ for fn in qs.values()}
    cache: dict[tuple[str, str], set[str]] = {}

    never: list[str] = []
    stale: dict[str, dict] = {}
    # Record-age staleness (VERDICT r12 item 4): a driver row is also
    # stale when it is simply OLD — the record ages even if no code in
    # the slug's closure changed (the local pytest parity sweep still
    # re-verifies it every round, but the driver's independent record
    # should not trail by more than AGE_LIMIT rounds). A slug whose
    # last green round is <= max_round - AGE_LIMIT becomes seatable;
    # ranking still puts changed-code slugs first.
    AGE_LIMIT = 4
    max_round = max(greens.values(), default=0)
    for slug, fn in qs.items():
        last = greens.get(slug)
        if last is None:
            never.append(slug)
            continue
        commit = snaps.get(last)
        if commit is None:
            continue  # no snapshot commit recorded for that round
        reasons: list[str] = []
        for mod in sorted(closure(graph, fn.__module__)):
            f = mod_to_file(mod)
            ch = changed_defs(f, commit, cache)
            if mod.startswith(f"{PKG}.queries"):
                # other queries registered in the same module are not
                # this slug's implementation — but its OWN fn is, and
                # so is every shared (non-query) helper.
                ch = (ch - query_fn_names) | (ch & {fn.__name__})
            reasons += [f"{f}:{n}" for n in sorted(ch)]
        if last <= max_round - AGE_LIMIT:
            reasons.append(f"driver-record-age:r{last:02d}")
        if reasons:
            stale[slug] = {
                "last_green": last,
                "own_fn_changed": any(
                    r.endswith(f":{fn.__name__}") for r in reasons
                ),
                "changed": reasons[:8],
            }

    # Stalest-first rank: own-function edits beat helper churn; older
    # last-green beats newer; slug name breaks ties deterministically.
    ranked = sorted(
        stale,
        key=lambda s: (
            not stale[s]["own_fn_changed"],
            stale[s]["last_green"],
            s,
        ),
    )
    never_missed = [s for s in never if s not in prefix]
    backlog = [s for s in ranked if s not in prefix]
    wasted = [
        s for s in prefix if s not in stale and s not in never
    ] if backlog else []
    recommended = (never + ranked)[:window]

    record = {
        "ts": time.time(),
        "event": "staleness_audit",
        "window": window,
        "declared": len(qs),
        "with_green_row": len([s for s in qs if s in greens]),
        "never_verified": len(never),
        "stale_total": len(stale),
        "never_verified_outside_window": never_missed,
        "backlog": backlog,
        "window_slots_wasted": sorted(wasted),
        "saturated": not never_missed and not wasted,
        "recommended_window": recommended,
    }
    print(json.dumps(record, indent=1))
    if log:
        slim = dict(record)
        slim.pop("recommended_window")
        slim["backlog"] = len(backlog)
        with open(os.path.join(REPO, "PROGRESS.jsonl"), "a") as f:
            f.write(json.dumps(slim) + "\n")
    return 0 if record["saturated"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
