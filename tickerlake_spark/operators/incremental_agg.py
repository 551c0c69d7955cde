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
need sketches — see q90's HLL/KLL path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["aggregate_delta", "merge_aggregates", "with_ratio"]

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
