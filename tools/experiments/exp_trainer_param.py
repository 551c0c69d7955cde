"""Iterative-trainer A/Bs (VERDICT r11 item 3): parameterized-centroid
E-step vs literal unroll, and fixed-width vs size-adaptive repartition.

Finding 1 — REJECTED: centroids as a broadcast one-row parameter table
(the r11 q45 trick) are bit-identical but SLOWER than the literal unroll
at catalog scale: each iteration pays a broadcast-build job (plan, 1-row
exchange, driver collect) that exceeds the literal-tree analysis it
avoids, and — contrary to the r11 verdict's theory — there is no
per-iteration codegen to save because the argmin HOF (transform/
aggregate) is CodegenFallback, i.e. interpreted. Measured (3 Lloyd
rounds, sf0.01, interleaved): literal min 1.98s / med 2.29s vs param
min 2.18s / med 2.39s.

Finding 2 — ADOPTED: the trainers repartitioned their persisted sample to
a fixed ``defaultParallelism`` width, scheduling 32 tasks per stage per
iteration for a 500-row embedding sample; per-task scheduling overhead
dominated every round. Size-adaptive width (``_trainer_width``: ~1 MiB of
estimated input per task, capped at defaultParallelism, full width on
unknown estimates): measured 3 rounds at sf0.01 min 2.49s (width 32) vs
1.49s (width 4) vs 1.33s (width 1). Centroids are identical across
widths in this measurement; note the M-step mean is a partition-merged
double sum, so summation ORDER differs by width — the same variance the
cross-engine oracle tolerance (stable_round nudge) is designed around,
re-verified by strict oracle parity for q115/q116/q117/q127/q130/q142
after the change.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from pyspark.sql import functions as F
from pyspark import StorageLevel

from tickerlake_spark.operators.clustering import (
    _argmin_cell,
    _update_means,
    assign_cells,
)
from tickerlake_spark.session import get_spark


def assign_param(df, centroids, vec_col="v", cell_col="cell"):
    """The rejected parameterized E-step, kept for reproducibility."""
    cent = df.sparkSession.createDataFrame(
        [(centroids,)], "__cmat: array<array<double>>"
    )
    cmat = F.col("__cmat")
    scored = F.transform(
        cmat,
        lambda c, i: F.struct(
            F.aggregate(
                F.zip_with(F.col(vec_col), c, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("d2"),
            i.alias("cell"),
        ),
    )
    return (
        df.crossJoin(F.broadcast(cent))
        .withColumn(cell_col, F.array_min(scored)["cell"])
        .drop("__cmat")
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="exp-trainer-param")
    spark.sparkContext.setLogLevel("ERROR")
    from tickerlake_spark.plans.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")

    def loop(mode: str, width: int, iters: int = 3):
        base = emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        base = base.repartition(width).persist(StorageLevel.MEMORY_AND_DISK)
        init = [
            list(r["v"])
            for r in sorted(
                base.orderBy(F.col("vec_id").asc()).limit(8).collect(),
                key=lambda r: r["vec_id"],
            )
        ]
        cent = init
        t0 = time.perf_counter()
        for _ in range(iters):
            if mode == "param":
                assigned = assign_param(base, cent, vec_col="v")
            else:
                assigned = assign_cells(base, cent, vec_col="v")
            rows = _update_means(assigned, 6).collect()
            by: dict[int, dict[int, float]] = {}
            for r in rows:
                by.setdefault(r["cell"], {})[r["pos"]] = r["val"]
            cent = [
                [by[c][p] for p in sorted(by[c])] if c in by else prev
                for c, prev in enumerate(cent)
            ]
        dt = time.perf_counter() - t0
        base.unpersist()
        return dt, cent

    # equivalence: param vs literal at the same width is bit-identical
    _, ca = loop("literal", 32)
    _, cb = loop("param", 32)
    assert ca == cb, "param E-step centroids differ from literal"
    print("param == literal centroids:", ca == cb)

    variants = {
        "literal_w32": ("literal", 32),
        "param_w32": ("param", 32),
        "literal_w4": ("literal", 4),
        "literal_w1": ("literal", 1),
    }
    times: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(5):
        for name, (mode, w) in variants.items():
            times[name].append(loop(mode, w)[0])
    for name, ts in times.items():
        ts = sorted(ts)
        print(f"{name}: min={ts[0]:.3f} med={ts[len(ts) // 2]:.3f}")


if __name__ == "__main__":
    main()
