"""Profile every catalog query at sf0.01 the way the driver's correctness
gate does: run the Spark plan to completion (collect) and the DuckDB oracle,
print per-query wall time sorted slowest-first.

Usage: python tools/profile_queries.py [sf_dir] [only_prefix...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
only = sys.argv[2:]

from tickerlake_spark.plans.catalog import QUERIES, _ensure_loaded, load_table
from tickerlake_spark.session import get_spark

_ensure_loaded()
spark = get_spark("profile")

import duckdb

con = duckdb.connect()
for t in (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split():
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
    )

rows = []
for name, spec in QUERIES.items():
    if only and not any(name.startswith(p) for p in only):
        continue
    t0 = time.monotonic()
    err = None
    n = -1
    try:
        df = spec.fn(spark, sf_dir)
        n = len(df.collect())
    except Exception as e:  # noqa: BLE001
        err = f"{type(e).__name__}: {e}"[:200]
    t_spark = time.monotonic() - t0
    t0 = time.monotonic()
    n_oracle = -1
    if spec.oracle and err is None:
        try:
            n_oracle = len(con.execute(spec.oracle).fetchall())
        except Exception as e:  # noqa: BLE001
            err = f"oracle {type(e).__name__}: {e}"[:200]
    t_duck = time.monotonic() - t0
    rows.append((name, t_spark, t_duck, n, n_oracle, err))
    print(
        f"{name:35s} spark={t_spark:6.2f}s duck={t_duck:5.2f}s rows={n}"
        + (f" ORACLE_ROWS={n_oracle}" if n_oracle >= 0 else "")
        + (f" ERR={err}" if err else ""),
        flush=True,
    )

rows.sort(key=lambda r: -(r[1] + r[2]))
total = sum(r[1] + r[2] for r in rows)
print(f"\nTOTAL {total:.1f}s over {len(rows)} queries; slowest:")
for r in rows[:20]:
    print(f"  {r[0]:35s} {r[1] + r[2]:6.2f}s")
with open("/tmp/profile_queries.json", "w") as f:
    json.dump([{"name": r[0], "spark": r[1], "duck": r[2]} for r in rows], f)
