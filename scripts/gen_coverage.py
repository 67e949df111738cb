"""Generate COVERAGE.md: every declared query slug with its defining
module, oracle status, and docstring summary — the line-by-line map
from SURVEY.md §2 to the implementation.

Usage: python scripts/gen_coverage.py > COVERAGE.md
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from oarphpy_spark import registry  # noqa: E402


def main() -> None:
    qs = registry.queries()
    oracles = registry.oracle_sql()
    print("# COVERAGE — declared query inventory")
    print()
    print(f"{len(qs)} queries; {len(oracles)} DuckDB-oracle-checked, "
          f"{len(qs) - len(oracles)} rows-only (nondeterministic/host-dependent "
          "by design).")
    print()
    print("| slug | module | oracle | summary |")
    print("|---|---|---|---|")
    for name in sorted(qs):
        fn = qs[name]
        mod = fn.__module__.replace("oarphpy_spark.queries.", "")
        doc = (fn.__doc__ or "").strip().split("\n")[0].rstrip(".")
        kind = "exact-SQL" if name in oracles else "rows-only"
        print(f"| `{name}` | {mod} | {kind} | {doc} |")


if __name__ == "__main__":
    main()
