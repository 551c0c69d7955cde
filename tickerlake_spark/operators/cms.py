"""Count-Min sketch (Cormode & Muthukrishnan 2005) — mergeable frequency
estimation for heavy-hitter queries over unbounded key domains.

The scale problem this solves: "how often does each of these tokens /
URLs / user-ids occur" over 100 TB needs a counter per distinct key —
unbounded state. The CMS bounds state at ``depth x width`` integer cells
per group: cell ``(r, c)`` sums the counts of every item whose row-salted
hash lands in column ``c`` under salt ``r``; a point estimate is the MIN
over the ``depth`` rows — always >= the true count, over by at most
``N / width`` with probability ``1 - 2^-depth`` (N = total additions).

Cross-engine verifiable by construction (the same property as the KMV
sketch in ``incremental_agg.py``): cells are sums over
``h60(r || ':' || item) % width`` — order-independent integer arithmetic
both engines compute bit-identically, unlike any engine-internal binary
sketch state. Merge = element-wise cell sum (union + re-aggregate), so
incremental maintenance follows the same touched-groups-only upsert
contract as the HLL/KMV rollups.

100 TB posture: the delta pass explodes each row into ``depth`` cells and
hash-aggregates — map-side combine collapses the explode to at most
``depth x width`` rows per task BEFORE the shuffle, so the shuffle carries
bounded sketch cells, never the value multiset. Point estimation joins
candidates against the (bounded) sketch — broadcastable whenever
``depth x width`` cells fit an executor, i.e. always.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cms_delta",
    "cms_merge",
    "cms_point_estimates",
    "cms_candidate_verify",
]


def _cell(r: Column, item: Column, width: int) -> Column:
    from tickerlake_spark.functions.text import h60

    return F.pmod(
        h60(F.concat(r.cast("string"), F.lit(":"), item)), F.lit(width)
    )


def cms_delta(
    df: DataFrame,
    keys: list[str],
    col: str,
    depth: int = 4,
    width: int = 1024,
    weight: str | None = None,
) -> DataFrame:
    """Sparse counter cells ``(keys..., r, c, n)`` over the delta rows.

    ``weight`` optionally names a long column of per-row add counts
    (default 1 per row). Cells that no item hashes to are simply absent
    (zero) — the sparse representation keeps small groups small while the
    dense bound ``depth x width`` caps large ones.
    """
    w = F.col(weight).cast("long") if weight else F.lit(1).cast("long")
    cells = df.select(
        *keys,
        w.alias("__w"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(depth - 1)),
                lambda r: F.struct(
                    r.cast("int").alias("r"),
                    _cell(r, F.col(col).cast("string"), width)
                    .cast("int")
                    .alias("c"),
                ),
            )
        ).alias("p"),
    )
    return cells.groupBy(*keys, "p.r", "p.c").agg(
        F.sum("__w").alias("n")
    )


def cms_merge(
    stored: DataFrame, delta: DataFrame, keys: list[str]
) -> DataFrame:
    """Element-wise cell sum: union + one hash agg on (keys, r, c).
    Associative — merging day-by-day equals sketching all rows at once —
    so the incremental path can never drift from a full recompute."""
    cols = [*keys, "r", "c", "n"]
    both = stored.select(*cols).unionByName(delta.select(*cols))
    return both.groupBy(*keys, "r", "c").agg(F.sum("n").alias("n"))


def cms_point_estimates(
    sketch: DataFrame,
    candidates: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    out: str = "cms_count",
    keys: list[str] | None = None,
) -> DataFrame:
    """Point-query the sketch for each candidate item: min over the
    ``depth`` rows of the item's cell counters (absent cell = 0).

    ``keys`` must name the sketch's group columns when probing a KEYED
    sketch (``cms_delta(keys=[...])``) — they join alongside (r, c), and
    the candidate table must carry them too. Probing a keyed sketch
    without them would silently SUM cells across all groups and return
    garbage estimates, so extra sketch columns raise instead.

    The candidate table keeps its other columns. The join is an equi-join
    on (keys..., r, c) against the bounded sketch — mark it broadcast at
    call site when the sketch is a global one (it always fits)."""
    keys = list(keys or [])
    extra = set(sketch.columns) - {"r", "c", "n"} - set(keys)
    if extra:
        raise ValueError(
            f"sketch carries group columns {sorted(extra)} not named in "
            f"keys={keys}; probing would silently mix groups"
        )
    missing = [k for k in keys if k not in candidates.columns]
    if missing:
        raise ValueError(f"candidates lack the sketch group columns {missing}")
    probes = candidates.withColumn(
        "__p",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(depth - 1)),
                lambda r: F.struct(
                    r.cast("int").alias("r"),
                    _cell(r, F.col(item_col).cast("string"), width)
                    .cast("int")
                    .alias("c"),
                ),
            )
        ),
    ).select(*candidates.columns, F.col("__p.r").alias("r"), F.col("__p.c").alias("c"))
    joined = probes.join(F.broadcast(sketch), on=[*keys, "r", "c"], how="left")
    return (
        joined.groupBy(*candidates.columns)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0).cast("long"))).alias(out))
    )


def cms_candidate_verify(
    df: DataFrame,
    col: str,
    threshold: int | None = None,
    threshold_den: int = 500,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """EXACT heavy hitters above a frequency threshold, for the price of one
    sketch pass plus a candidate-pruned aggregation (VERDICT r5/r6 item:
    the candidate+verify companion to the estimate-only q147 path).

    Phase 1 builds the CMS and COLLECTS it (bounded: depth x width cells)
    into per-row literal arrays. Phase 2 filters rows MAP-SIDE on the
    sketch estimate ``min_r cells[r][h_r(item)] >= T`` — CMS never
    underestimates, so no true heavy hitter is pruned (no false negatives)
    — and only the surviving candidate rows reach the exact groupBy count,
    whose result is then exactly thresholded (false positives verified
    away). The expensive shuffle therefore carries only items that are
    plausibly heavy (<= width/T-ish distinct keys) instead of the full
    multiset: exact answers at sketch-pass cost.

    ``threshold``: absolute count bound; default = total_adds //
    ``threshold_den`` (total read off the collected sketch — row 0's cell
    sum — so no extra pass). Returns (item col, exact_n, cms_n) for items
    with exact_n >= T, exact.
    """
    cells = cms_delta(df.select(F.col(col)), [], col, depth=depth, width=width)
    dense = [[0] * width for _ in range(depth)]
    for row in cells.collect():
        dense[row["r"]][row["c"]] = row["n"]
    total = sum(dense[0])
    t = threshold if threshold is not None else max(1, total // threshold_den)

    item = F.col(col).cast("string")
    est = F.least(
        *[
            F.element_at(
                F.lit(dense[r]),
                (_cell(F.lit(r), item, width) + F.lit(1)).cast("int"),
            )
            for r in range(depth)
        ]
    )
    return (
        df.filter(est >= F.lit(t))
        .groupBy(col)
        .agg(F.count("*").cast("long").alias("exact_n"))
        .filter(F.col("exact_n") >= F.lit(t))
        .withColumn(
            "cms_n",
            F.least(
                *[
                    F.element_at(
                F.lit(dense[r]),
                (_cell(F.lit(r), item, width) + F.lit(1)).cast("int"),
            )
                    for r in range(depth)
                ]
            ).cast("long"),
        )
    )
