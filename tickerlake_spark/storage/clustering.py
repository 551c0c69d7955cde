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

__all__ = [
    "ZorderBoundsUnavailable",
    "write_clustered",
    "write_zordered",
    "zorder_key",
    "zorder_layout",
]


class ZorderBoundsUnavailable(ValueError):
    """Empty input or all-null z-order column: no bounds to scale by.
    Distinct from type misuse so layout-optional callers (snapshot
    commits) can fall back to an unclustered write on THIS case only."""


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


def zorder_key(df: DataFrame, cols: list[str], bits: int = 12):
    """Interleaved-bit (Morton) key over numeric, date, or timestamp
    ``cols`` (dates become days-since-epoch, timestamps epoch seconds —
    the monotone maps that preserve range-pruning semantics; strings are
    rejected: no hash is monotone, so no string map can both z-cluster
    and keep min/max pruning honest).

    Each column is min/max-scaled to a ``bits``-wide unsigned int (one
    bounds aggregation over ``df``), then the bit planes are interleaved
    so nearby (c1, c2, ...) points share key prefixes. Unlike lexicographic
    clustering, the resulting file ranges are tight on EVERY dimension, so
    a predicate on any single cluster column skips files — the property
    plain ``write_clustered`` only gives the leading key.

    The interleave is a flat shift/and/or expression tree (bits x n_cols
    terms) — whole-stage codegen, no per-row Python. Returns (key Column,
    bounds dict) so callers can persist the bounds for query-side pruning.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import DateType, NumericType, TimestampType

    types = {f.name: f.dataType for f in df.schema.fields}
    num_exprs = {}
    for c in cols:
        t = types.get(c)
        if isinstance(t, DateType):
            num_exprs[c] = F.datediff(F.col(c), F.lit("1970-01-01"))
        elif isinstance(t, TimestampType):
            num_exprs[c] = F.unix_timestamp(F.col(c))
        elif isinstance(t, NumericType) or t is None:
            num_exprs[c] = F.col(c)
        else:
            raise ValueError(
                f"zorder_key: column {c!r} has non-orderable-numeric type "
                f"{t.simpleString()}; z-order supports numeric, date, and "
                "timestamp columns"
            )
    aggs = []
    for c in cols:
        aggs += [
            F.min(num_exprs[c]).alias(f"__mn_{c}"),
            F.max(num_exprs[c]).alias(f"__mx_{c}"),
        ]
    b = df.agg(*aggs).first()
    null_cols = [c for c in cols if b[f"__mn_{c}"] is None or b[f"__mx_{c}"] is None]
    if null_cols:
        raise ZorderBoundsUnavailable(
            "zorder_key: cannot compute min/max bounds for "
            f"{null_cols} — input is empty or the column(s) are all null"
        )
    maxv = (1 << bits) - 1
    scaled = []
    bounds = {}
    for c in cols:
        mn, mx = float(b[f"__mn_{c}"]), float(b[f"__mx_{c}"])
        bounds[c] = (mn, mx)
        span = (mx - mn) or 1.0
        s = F.floor((num_exprs[c].cast("double") - F.lit(mn)) / F.lit(span) * maxv)
        scaled.append(F.least(F.lit(maxv).cast("long"), F.greatest(F.lit(0).cast("long"), s.cast("long"))))
    z = F.lit(0).cast("long")
    for bit in range(bits):
        for j, s in enumerate(scaled):
            plane = F.shiftright(s, bit).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(plane, bit * len(cols) + j))
    return z, bounds


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    num_files: int | None = None,
    bits: int = 12,
):
    """Shared Morton-layout pipeline: range-partition ``df`` by the
    interleaved key and sort within partitions, so every output partition
    (→ file) covers a small hyper-rectangle. The key column is transient —
    added, used for the exchange, dropped (projection preserves the
    partition-local order the parquet row groups inherit). Refuses a
    ``df`` that already carries the transient name: silently replacing a
    user's ``__z`` column would destroy its data on the way to disk.
    Returns ``(laid_out_df, bounds)``. The single implementation behind
    ``write_zordered``, ``snap_write``/``snap_compact`` z-order, and the
    directory compactor — one place for key/ordering semantics."""
    from pyspark.sql import functions as F

    if "__z" in df.columns:
        raise ValueError(
            "zorder_layout: input already has a '__z' column — rename it; "
            "the layout uses that name transiently and would drop it"
        )
    z, bounds = zorder_key(df, list(cols), bits=bits)
    keyed = df.withColumn("__z", z)
    ranged = (
        keyed.repartitionByRange(num_files, F.col("__z"))
        if num_files
        else keyed.repartitionByRange(F.col("__z"))
    )
    return ranged.sortWithinPartitions("__z").drop("__z"), bounds


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 12,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> dict:
    """Write ``df`` Z-ordered on numeric ``cols``: range-partitioned and
    sorted by the Morton key, so every file covers a small hyper-rectangle
    and range predicates on ANY of the cluster columns skip files.
    Returns the per-column bounds used for scaling."""
    if len(cols) < 2:
        raise ValueError("z-order needs >= 2 columns; use write_clustered for 1")
    out, bounds = zorder_layout(df, cols, num_files=num_files, bits=bits)
    out.write.mode(mode).parquet(path)
    return bounds
