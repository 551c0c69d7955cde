"""Range join: point-in-interval matching at scale.

Spark plans a bare inequality join (``lo <= p AND p < hi``) as a broadcast
nested-loop / cartesian product — O(|points| x |intervals|) comparisons,
unusable once both sides are large. The scalable formulation quantizes the
domain into fixed-width buckets: each interval is replicated to every bucket
it overlaps, each point lands in exactly one bucket, and the join becomes an
EQUI-join on bucket id with the exact range predicate as a residual filter.
Cost: O(postings + matches) through one hash shuffle, the same plan family
DuckDB's IEJoin and Databricks' range-join hints produce.

Beyond-reference operator (the reference has no non-equi joins); the
`as-of` sibling lives in operators/asof.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bucketed_range_join"]


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    extra_condition: Column | None = None,
) -> DataFrame:
    """Inner-join ``points`` to every interval with ``lo <= point < hi``.

    ``bucket_width`` trades replication for bucket selectivity: pick it near
    the typical interval length so most intervals replicate to ~2 buckets
    (replication factor = avg_interval_len / width + 1). Each point has ONE
    bucket, so no post-join dedup is needed. AQE's skew-join split handles
    hot buckets (e.g. a price band everyone trades in).

    Output columns: all of ``points`` then all of ``intervals`` (names must
    not collide — rename beforehand). ``extra_condition`` is ANDed into the
    residual (e.g. an additional equi-key to co-partition on).
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    w = F.lit(float(bucket_width))
    b_pt = F.floor(F.col(point_col) / w).cast("long")
    b_lo = F.floor(F.col(lo_col) / w).cast("long")
    b_hi = F.floor(F.col(hi_col) / w).cast("long")

    p = points.withColumn("__b", b_pt)
    iv = intervals.withColumn("__b", F.explode(F.sequence(b_lo, b_hi)))

    residual = (F.col(lo_col) <= F.col(point_col)) & (
        F.col(point_col) < F.col(hi_col)
    )
    if extra_condition is not None:
        residual = residual & extra_condition
    return p.join(iv, on=["__b"], how="inner").filter(residual).drop("__b")
