"""A/B the bench's timed action: foreachPartition(noop-lambda) vs noop sink.

Guide §1.4: foreachPartition converts to RDD and pickles every row out to
Python workers — cost the query itself does not have. The noop sink computes
every column of every row inside the JVM and discards it. This script measures
both per headline query (1 warmup + 3 timed each) so the methodology switch in
bench.py carries its own evidence.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tickerlake_spark.plans.catalog import QUERIES, _ensure_loaded
from tickerlake_spark.session import get_spark
from tools.bench_e2e import host_conditions


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _ensure_loaded()
    spark = get_spark("bench-action-ab", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    host = host_conditions("/tmp")

    bench = {n: s for n, s in QUERIES.items() if s.bench}
    out: dict[str, dict] = {}
    for name, spec in bench.items():
        spec.fn(spark, sf_dir).foreachPartition(lambda it: None)  # warmup (codegen)
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        fp, noop = [], []
        for _ in range(3):
            df = spec.fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.foreachPartition(lambda it: None)
            fp.append(time.perf_counter() - t0)
            df = spec.fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            noop.append(time.perf_counter() - t0)
        out[name] = {
            "foreachPartition_min": round(min(fp), 4),
            "noop_min": round(min(noop), 4),
        }
        print(name, out[name], flush=True)

    print(json.dumps({"host": host, "queries": out}))
    with open("/tmp/bench_action_ab.json", "w") as f:
        json.dump({"host": host, "queries": out}, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
