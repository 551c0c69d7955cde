#!/usr/bin/env python
"""Ad-hoc strict parity check for named queries (driver-hash emulation).

Usage: python tools/check_new_queries.py q115_kmeans_centroids [more...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import duckdb

from test_driver_hash import _dtype_mismatches, _value_hash  # noqa: E402

from tickerlake_spark.plans import QUERIES  # noqa: E402
from tickerlake_spark.plans.catalog import TABLES, _ensure_loaded  # noqa: E402
from tickerlake_spark.session import get_spark  # noqa: E402


def main() -> None:
    # honor the suite's env var too so the tool checks the same parquet as
    # pytest when either is exported; SPARK_GRAFT_SF_DIR wins (driver scale)
    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR",
        os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01"),
    )
    _ensure_loaded()
    names = sys.argv[1:] or sorted(QUERIES)
    spark = get_spark(app_name="check-new-queries")
    spark.sparkContext.setLogLevel("ERROR")
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    failures = 0
    for name in names:
        spec = QUERIES[name]
        spark_pdf = spec.fn(spark, sf_dir).toPandas()
        if spec.oracle is None:
            print(f"{name}: rows-only, {len(spark_pdf)} rows")
            continue
        duck_pdf = duck.execute(spec.oracle).fetchdf()
        problems = []
        if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
            problems.append(
                f"columns {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
            )
        elif len(spark_pdf) != len(duck_pdf):
            problems.append(f"rows {len(spark_pdf)} vs {len(duck_pdf)}")
        else:
            problems += _dtype_mismatches(spark_pdf, duck_pdf)
            if not problems and _value_hash(spark_pdf) != _value_hash(duck_pdf):
                problems.append("value hash diverged")
        if problems:
            failures += 1
            print(f"{name}: FAIL — {'; '.join(problems)}")
        else:
            print(f"{name}: OK ({len(spark_pdf)} rows)")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
