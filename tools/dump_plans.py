"""Dump .explain('formatted') for catalog queries to plans/<tag>/<name>_<suffix>.txt.

Usage: python tools/dump_plans.py <tag> <suffix> [query ...]
  tag     e.g. r11
  suffix  e.g. before | after
  query   catalog names; default = the bench headline set

The judge reads these files to check plan claims (Exchange counts, join
strategies, PushedFilters) against the code; explain() is plan-only, so this
is safe to run alongside other work.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tickerlake_spark.plans.catalog import QUERIES, _ensure_loaded
from tickerlake_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r11"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    _ensure_loaded()
    if not names:
        names = [n for n, s in QUERIES.items() if s.bench]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        spec = QUERIES[name]
        df = spec.fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {sf_dir} ({suffix})\n")
            f.write(buf.getvalue())
        txt = buf.getvalue()
        print(
            f"{name:35s} exchanges={txt.count('Exchange '):2d} "
            f"python={txt.count('EvalPython') + txt.count('MapInArrow') + txt.count('MapInPandas')} "
            f"-> {path}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
