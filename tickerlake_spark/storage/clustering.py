"""Clustered (range-partitioned, sorted-within-file) Parquet writes.

At 100 TB, scan cost is dominated by how much data a filter can SKIP.
Hive partitioning (``partitionBy``) prunes at directory granularity but
explodes into tiny files for high-cardinality keys; bucketing
(``storage/bucketing.py``) co-locates join keys but hashes away range
locality. Clustering fills the third niche: ``repartitionByRange`` assigns
each output file a disjoint key range, and ``sortWithinPartitions`` orders
rows inside the file, so every Parquet row group carries tight min/max
statistics on the cluster keys. Readers (Spark, DuckDB, Trino, ...) then
skip whole files and row groups on range predicates — the poor man's
Z-order, exact for single-key and prefix-ordered multi-key predicates.

The range exchange samples the key distribution, so skew collapses into
more files for hot ranges instead of one straggler task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["write_clustered"]


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as Parquet clustered on ``cluster_by``.

    Each output file covers a disjoint range of the cluster keys (range
    repartition) and is internally sorted on them, giving row-group min/max
    stats that file- and row-group-skip under range predicates.

    ``num_files`` defaults to the session shuffle partition count.
    """
    if not cluster_by:
        raise ValueError("cluster_by must name at least one column")
    cols = [df[c] for c in cluster_by]
    ranged = (
        df.repartitionByRange(num_files, *cols)
        if num_files
        else df.repartitionByRange(*cols)
    )
    ranged.sortWithinPartitions(*cols).write.mode(mode).parquet(path)
