"""Incremental aggregate maintenance — merge a delta into a stored rollup.

The medallion pattern the reference approximates with full rewrites
(silver/main.py:133-233 re-reads everything): a gold aggregate keyed by
(group keys) is kept current by aggregating ONLY the new rows and merging
mergeable partial states — never rescanning history. Cost per refresh is
O(delta + touched groups), not O(table); with the rollup stored via
``storage/upsert.py`` only the touched groups rewrite.

Mergeable measures and their merge functions:
- sum   -> sum of partials
- count -> sum of partial counts
- min   -> min of partial mins
- max   -> max of partial maxes
Averages are DERIVED (sum / count) — never merged directly; ``with_ratio``
adds them after the merge. Non-decomposable aggregates (median, distinct)
need sketches: ``sketch_distinct_delta`` / ``merge_distinct_sketches``
maintain PERSISTED HyperLogLog sketches (Spark's Datasketches HLL binary
state) per group, so incremental distinct counts merge exactly like the
decomposable measures above — per-partition sketches union associatively,
history is never rescanned, and the merged estimate is BIT-IDENTICAL to a
one-shot sketch over the concatenated input (same algorithm, associative
union). q90 is the one-shot read path of the same sketches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "aggregate_delta",
    "merge_aggregates",
    "with_ratio",
    "sketch_distinct_delta",
    "merge_distinct_sketches",
    "sketch_estimates",
    "kmv_delta",
    "kmv_merge",
    "kmv_estimates",
    "kmv_jaccard_pairs",
]

_AGG = {
    "sum": F.sum,
    "count": lambda c: F.count(c),
    "min": F.min,
    "max": F.max,
}
_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # partial counts merge by summing
    "min": F.min,
    "max": F.max,
}


def aggregate_delta(
    delta: DataFrame, keys: list[str], measures: dict[str, tuple[str, str]]
) -> DataFrame:
    """Aggregate a batch of new rows into partial states.

    ``measures`` maps output column -> (fn, source column), fn in
    sum|count|min|max. Counts are stored as longs so they merge by sum.
    """
    aggs = []
    for out, (fn, src) in measures.items():
        if fn not in _AGG:
            raise ValueError(f"non-mergeable aggregate {fn!r}; use a sketch")
        col = _AGG[fn](src)
        aggs.append((col.cast("long") if fn == "count" else col).alias(out))
    return delta.groupBy(*keys).agg(*aggs)


def merge_aggregates(
    existing: DataFrame | None,
    delta_agg: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """Merge partial-state tables (same schema) by group key. The union
    re-aggregates with each measure's MERGE function — one shuffle of
    (existing groups + delta groups), independent of raw history size."""
    if existing is None:
        return delta_agg
    merged = existing.unionByName(delta_agg)
    aggs = [_MERGE[fn](out).alias(out) for out, (fn, _src) in measures.items()]
    return merged.groupBy(*keys).agg(*aggs)


def with_ratio(agg: DataFrame, out: str, num: str, den: str) -> DataFrame:
    """Derived average/ratio column (null-guarded) — computed after merge."""
    return agg.withColumn(
        out,
        F.when(F.col(den) != 0, F.col(num) / F.col(den)).otherwise(F.lit(None)),
    )


def sketch_distinct_delta(
    df: DataFrame,
    keys: list[str],
    col: str,
    lgk: int = 12,
    sketch_col: str = "distinct_sketch",
) -> DataFrame:
    """(keys..., sketch) per group over the DELTA rows only.

    The sketch is Spark's Datasketches HLL_4 binary state (~2^lgk bytes cap,
    lgk=12 -> rsd ~1.6%): O(1) per group regardless of cardinality, safe to
    persist in a parquet rollup. At 100 TB the delta aggregation is one
    map-side-combined hash agg; the shuffle carries one sketch per touched
    group, never the value multiset."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(col, F.lit(lgk)).alias(sketch_col)
    )


def merge_distinct_sketches(
    stored: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sketch_col: str = "distinct_sketch",
) -> DataFrame:
    """Merge a delta sketch table into the stored rollup: union + per-group
    HLL union. Associative and exact w.r.t. the sketch state: merging
    day-by-day equals sketching the whole history in one pass, so the
    incremental path can never drift from a full recompute. Upsert the
    result on ``keys`` (storage/upsert.py) to touch only changed groups."""
    both = stored.select(*keys, sketch_col).unionByName(
        delta.select(*keys, sketch_col)
    )
    return both.groupBy(*keys).agg(
        F.hll_union_agg(sketch_col).alias(sketch_col)
    )


def sketch_estimates(
    sketches: DataFrame,
    sketch_col: str = "distinct_sketch",
    out: str = "approx_distinct",
) -> DataFrame:
    """Serve the rollup: replace the binary sketch with its long estimate."""
    return sketches.withColumn(out, F.hll_sketch_estimate(sketch_col)).drop(
        sketch_col
    )


# --- KMV (k-minimum-values) distinct sketch ---------------------------------
#
# The CROSS-ENGINE-VERIFIABLE sibling of the HLL rollup above (Beyer et al.,
# SIGMOD 2007 "On synopses for distinct value estimation"): the sketch for a
# group is simply the k smallest DISTINCT 60-bit hashes of its values —
# expressible in portable SQL (hash -> distinct -> rank <= k), so a DuckDB
# oracle can reproduce the estimate bit-for-bit, which no engine-internal
# binary sketch state allows. Three properties make it hash-parity safe:
#   1. below k the estimate is EXACT (the sketch holds every distinct hash);
#   2. at or above k the estimator is (k-1) * 2^60 / h_(k) — one IEEE
#      division/multiplication of exactly-known integers, no ln/log whose
#      libm rounding could differ across engines;
#   3. the aggregations involved (distinct, min-rank, max) are order-
#      independent, so parallel execution cannot perturb the result.
# Merge = union of sketches -> distinct -> re-rank: associative, O(k) state
# per group, history never rescanned — same incremental contract as the HLL
# path. Relative error ~ 1/sqrt(k-2); k=2048 -> ~2.2%.

_KMV_SCALE = float(1 << 60)  # h60 hash space size
_KMV_SHARDS = 64


def _k_smallest(d: DataFrame, keys: list[str], k: int) -> DataFrame:
    """<= k smallest ``h`` per group, in two phases so no single sort
    partition ever holds a whole group's distinct hashes: (1) rank within
    (group, h mod 64) hash-shards and keep each shard's top-k — the global
    top-k is necessarily a subset of that union; (2) rank the <= 64k
    survivors per group. At 100 TB phase 1 bounds every window partition
    to ~1/64 of a group and phase 2 to 64k rows; result is identical to
    the single-window form."""
    from pyspark.sql import Window

    w1 = Window.partitionBy(*keys, F.pmod(F.col("h"), F.lit(_KMV_SHARDS))).orderBy(
        "h"
    )
    w2 = Window.partitionBy(*keys).orderBy("h")
    return (
        d.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= k)
        .withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_delta(
    df: DataFrame, keys: list[str], col: str, k: int = 2048
) -> DataFrame:
    """(keys..., h) — the <= k smallest distinct h60 hashes per group over
    the delta rows. One distinct shuffle + two bounded rank windows."""
    from tickerlake_spark.functions.text import h60

    d = df.select(
        *keys, h60(F.col(col).cast("string")).alias("h")
    ).distinct()
    return _k_smallest(d, keys, k)


def kmv_merge(
    stored: DataFrame, delta: DataFrame, keys: list[str], k: int = 2048
) -> DataFrame:
    """Union two sketch tables and re-take the k smallest per group.
    Associative: merging day-by-day equals sketching all rows at once."""
    both = (
        stored.select(*keys, "h").unionByName(delta.select(*keys, "h")).distinct()
    )
    return _k_smallest(both, keys, k)


def kmv_estimates(
    sketches: DataFrame,
    keys: list[str],
    k: int = 2048,
    out: str = "approx_distinct",
) -> DataFrame:
    """Serve the sketch: exact count below k, else (k-1) * 2^60 / h_(k)."""
    agg = sketches.groupBy(*keys).agg(
        F.count("*").alias("__cnt"), F.max("h").alias("__kth")
    )
    est = F.when(F.col("__cnt") < k, F.col("__cnt").cast("double")).otherwise(
        F.round(F.lit(float(k - 1)) / F.col("__kth") * F.lit(_KMV_SCALE))
    )
    return agg.select(*keys, est.cast("long").alias(out))


def kmv_jaccard_pairs(
    sketches: DataFrame,
    key: str,
    k: int = 2048,
    min_hash_col: str = "h",
) -> DataFrame:
    """Estimated set overlap for every unordered pair of groups from their
    KMV sketches alone — the audience-overlap question ("how many distinct
    users did types A and B share?") that exact computation would answer
    with a full distinct-pair shuffle over raw history.

    Beyer et al. 2007 §5: for a pair (A, B), take the k smallest hashes of
    the UNION of the two sketches; the fraction rho of those that appear
    in both sketches estimates the Jaccard similarity, and rho times the
    union's KMV distinct estimate gives the intersection cardinality.
    Below k the sketches hold every distinct hash, so both estimates
    degenerate to EXACT values. All arithmetic is integer select/rank plus
    the same single IEEE division as ``kmv_estimates`` — cross-engine
    hash-parity safe.

    Cost: pairs x sketch rows (sketches are <= k rows per group — the
    pair fanout runs on sketch-sized data, never raw history). The pair
    dim is built from a bounded driver collect of the distinct group
    values (the k-means-centroid contract; group count is by definition
    small enough to pair quadratically) — a ``g1 < g2`` theta self-join
    would plan a BroadcastNestedLoopJoin, and every join below stays an
    equi-join instead."""
    from pyspark.sql import Window

    spark = sketches.sparkSession
    gvals = sorted(
        r[0] for r in sketches.select(F.col(key).alias("g")).distinct().collect()
    )
    pairs = F.broadcast(
        spark.createDataFrame(
            [(a, b) for i, a in enumerate(gvals) for b in gvals[i + 1 :]],
            sketches.select(
                F.col(key).alias("ga"), F.col(key).alias("gb")
            ).schema,
        )
    )
    s = sketches.select(F.col(key).alias("g"), F.col(min_hash_col).alias("h"))
    tagged = (
        pairs.join(s, s["g"] == pairs["ga"])
        .select("ga", "gb", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionByName(
            pairs.join(s, s["g"] == pairs["gb"]).select(
                "ga", "gb", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
            )
        )
        .groupBy("ga", "gb", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("ga", "gb").orderBy("h")
    top = tagged.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    agg = top.groupBy("ga", "gb").agg(
        F.count("*").alias("kk"),
        F.sum((F.col("in_a") * F.col("in_b"))).alias("inter"),
        F.max("h").alias("kth"),
    )
    union_est = F.when(
        F.col("kk") < k, F.col("kk").cast("double")
    ).otherwise(F.lit(float(k - 1)) / F.col("kth") * F.lit(_KMV_SCALE))
    return agg.select(
        "ga",
        "gb",
        F.col("inter").cast("long").alias("shared_in_topk"),
        F.round(union_est).cast("long").alias("est_union"),
        F.round(F.col("inter") / F.col("kk") * union_est)
        .cast("long")
        .alias("est_intersection"),
    )
