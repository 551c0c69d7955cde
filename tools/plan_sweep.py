"""Sweep every catalog query's physical plan for optimization anti-patterns.

Plan-only (no execution): builds each query's DataFrame at $SPARK_GRAFT_SF_DIR
and greps .explain('formatted') for the shapes the optimization guide warns
about — row-at-a-time Python (BatchEvalPython), cartesian products, sort-merge
joins that could broadcast, exchange counts, scans without pushed filters.

Usage: python tools/plan_sweep.py [out.json]
"""

from __future__ import annotations

import io
import json
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tickerlake_spark.plans.catalog import QUERIES, _ensure_loaded
from tickerlake_spark.session import get_spark

MARKERS = [
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInArrow",
    "FlatMapGroupsInPandas",
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastHashJoin",
    "Exchange",
    "Window",
    "Generate",
    "InMemoryTableScan",
]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/plan_sweep.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    _ensure_loaded()
    spark = get_spark("plan-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    report: dict[str, dict] = {}
    for name, spec in QUERIES.items():
        try:
            df = spec.fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001 - survey tool, record and move on
            report[name] = {"error": f"{type(e).__name__}: {e}"}
            continue
        counts = {m: len(re.findall(re.escape(m), plan)) for m in MARKERS}
        counts["Exchange"] -= counts.pop("BroadcastExchangeCount", 0)
        bcast = len(re.findall(r"BroadcastExchange", plan))
        counts["ShuffleExchange"] = counts["Exchange"] - bcast
        counts["BroadcastExchange"] = bcast
        del counts["Exchange"]
        scans = len(re.findall(r"Scan parquet", plan))
        pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
        report[name] = {
            "counts": {k: v for k, v in counts.items() if v},
            "scans": scans,
            "scans_with_pushdown": pushed,
            "plan_bytes": len(plan),
        }

    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)

    # stdout summary: the suspicious ones
    for name, r in sorted(report.items()):
        if "error" in r:
            print(f"{name}: ERROR {r['error']}")
            continue
        c = r["counts"]
        flags = []
        if c.get("BatchEvalPython"):
            flags.append(f"BatchEvalPython x{c['BatchEvalPython']}")
        if c.get("CartesianProduct"):
            flags.append("CartesianProduct")
        if c.get("BroadcastNestedLoopJoin"):
            flags.append(f"BNLJ x{c['BroadcastNestedLoopJoin']}")
        if c.get("SortMergeJoin"):
            flags.append(f"SMJ x{c['SortMergeJoin']}")
        if c.get("ShuffleExchange", 0) >= 6:
            flags.append(f"shuffles x{c['ShuffleExchange']}")
        if flags:
            print(f"{name}: {', '.join(flags)}")
    spark.stop()


if __name__ == "__main__":
    main()
