#!/usr/bin/env python
"""A/B: q45's query-vector acquisition — driver .first() collect + literal
(current) vs folding the query row into the plan as a 1-row broadcast join.

The current q45 builds its plan in two Spark jobs: a .first() that collects
the vec_id==0 embedding to the driver, then the scored scan with the vector
as a literal. The join variant is ONE job: scan x broadcast(1-row query
projection), cosine computed by the same zip_with/aggregate fold over the
joined column — identical fold order => bitwise-identical cosines.

Interleaved A/B (both variants alternate within one process) so host drift
hits both sides equally.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from pyspark.sql import functions as F

from tickerlake_spark.functions.vector import as_double_array, cosine_similarity
from tickerlake_spark.operators.similarity import brute_force_topk
from tickerlake_spark.plans.catalog import load_table, _ensure_loaded
from tickerlake_spark.session import get_spark


def q45_current(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    qvec = [
        float(x)
        for x in e.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    scored = brute_force_topk(e, qvec, k=10_000_000)
    return (
        scored.select("id", F.round(F.col("cosine") + F.lit(5e-9), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("id").asc())
        .limit(20)
    )


def q45_join(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    q = (
        e.filter(F.col("vec_id") == 0)
        .select(as_double_array("embedding").alias("__qv"))
    )
    scored = e.crossJoin(F.broadcast(q)).select(
        F.col("vec_id").alias("id"),
        cosine_similarity(as_double_array("embedding"), F.col("__qv")).alias("cosine"),
    )
    return (
        scored.select("id", F.round(F.col("cosine") + F.lit(5e-9), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("id").asc())
        .limit(20)
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _ensure_loaded()
    spark = get_spark(app_name="exp-q45-qvec")
    spark.sparkContext.setLogLevel("ERROR")

    cur = q45_current(spark, sf_dir).collect()
    new = q45_join(spark, sf_dir).collect()
    assert [tuple(r) for r in cur] == [tuple(r) for r in new], (cur, new)
    print("rows_identical=True")

    def run(build) -> float:
        t0 = time.perf_counter()
        build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run(q45_current)
    run(q45_join)
    times = {"current": [], "join": []}
    for _ in range(10):
        times["current"].append(run(q45_current))
        times["join"].append(run(q45_join))
    for name, ts in times.items():
        ts = sorted(ts)
        print(f"{name}: min={ts[0]:.3f} med={ts[len(ts) // 2]:.3f}")


if __name__ == "__main__":
    main()
