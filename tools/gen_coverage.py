#!/usr/bin/env python
"""Regenerate the query/oracle counts quoted in README.md and COVERAGE.md
from catalog introspection, so documentation can never drift from the code.

The counts live in prose, so this rewrites the specific quoted phrases
in-place; `tests/test_docs_counts.py` asserts the quoted numbers equal the
introspected ones on every run.

Usage: python tools/gen_coverage.py [--check]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def counts() -> dict[str, int]:
    from tickerlake_spark.plans.catalog import QUERIES, _ensure_loaded

    _ensure_loaded()
    return {
        "queries": len(QUERIES),
        "oracles": sum(1 for s in QUERIES.values() if s.oracle is not None),
        "bench": sum(1 for s in QUERIES.values() if s.bench),
    }


# (file, regex, replacement-template) — templates get .format(**counts)
REWRITES = [
    (
        "README.md",
        r"\*\*\d+ named queries, every one with DuckDB oracle SQL\*\*",
        "**{queries} named queries, every one with DuckDB oracle SQL**",
    ),
    (
        "README.md",
        r"\(\d+ DuckDB parity\s+checks",
        "({oracles} DuckDB parity checks",
    ),
    (
        "COVERAGE.md",
        r"the catalog's \d+ queries \(\d+ oracle-checked\)",
        "the catalog's {queries} queries ({oracles} oracle-checked)",
    ),
]


def apply(check: bool) -> int:
    c = counts()
    stale = 0
    for fname, pattern, template in REWRITES:
        path = os.path.join(REPO, fname)
        with open(path) as f:
            text = f.read()
        want = template.format(**c)
        new, n = re.subn(pattern, want, text)
        if n == 0:
            print(f"{fname}: pattern not found: {pattern}")
            stale += 1
            continue
        if new != text:
            stale += 1
            if check:
                print(f"{fname}: stale counts (want {want!r})")
            else:
                with open(path, "w") as f:
                    f.write(new)
                print(f"{fname}: updated -> {want!r}")
    if not stale:
        print(f"counts in sync: {c}")
    return 1 if (check and stale) else 0


if __name__ == "__main__":
    sys.exit(apply(check="--check" in sys.argv))
