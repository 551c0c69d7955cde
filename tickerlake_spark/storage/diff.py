"""Snapshot reconciliation: keyed diff of two table versions.

Replication checks, CDC backfills, and "what changed since yesterday"
audits all reduce to the same primitive: given two snapshots keyed the
same way, classify every key as added / removed / changed / unchanged.
The reference has no notion of this (overwrite-only writer); any engine
serving incremental consumers needs it.

Plan shape: ONE full-outer shuffle join on the keys with null-safe
column comparison — linear, no driver state. At 100 TB run it
per-partition (date slice) so the join covers only the reconciliation
window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["snapshot_diff", "partition_fingerprints"]


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """(keys..., change) — change in {'added','removed','changed'} (and
    'unchanged' when requested). ``compare`` defaults to every shared
    non-key column; comparison is null-safe."""
    if compare is None:
        shared = [c for c in old.columns if c in new.columns and c not in keys]
        compare = shared
    # presence flags ride as literal columns so a key whose compare columns
    # are all NULL is still correctly classified as present on that side
    o = old.select(
        *keys,
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"__o_{c}") for c in compare],
    )
    n = new.select(
        *keys,
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"__n_{c}") for c in compare],
    )
    j = o.join(n, keys, "full_outer")
    same = F.lit(True)
    for c in compare:
        same = same & F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    change = (
        F.when(F.col("__in_old").isNull(), "added")
        .when(F.col("__in_new").isNull(), "removed")
        .when(~same, "changed")
        .otherwise("unchanged")
    )
    out = j.select(*keys, change.alias("change"))
    if not include_unchanged:
        out = out.filter(F.col("change") != "unchanged")
    return out


def partition_fingerprints(
    df: DataFrame,
    partition_cols: list[str],
    cols: list[str] | None = None,
) -> DataFrame:
    """(partition_cols..., n_rows, fingerprint) — an ORDER-INDEPENDENT
    checksum per partition: sum of bounded row hashes (md5-prefix ``h60``
    of the '|'-joined canonical row string, reduced mod 2^40 so a 2^23-row
    partition cannot overflow a long). Two replicas/snapshots agree on a
    partition iff (n_rows, fingerprint) agree (up to hash collisions) —
    the anti-entropy primitive that scopes ``snapshot_diff`` to only the
    partitions that actually diverged, instead of a full-table outer join.

    Cross-engine portable: the same expression runs in DuckDB (see
    q143's oracle), so fingerprints can be compared across engines too.
    """
    from tickerlake_spark.functions.text import h60

    if cols is None:
        cols = [c for c in df.columns if c not in partition_cols]
    # concat_ws SKIPS nulls, which would make ('a', NULL, 'b') and
    # ('a', 'b', NULL) collide systematically (ADVICE r4); a non-printing
    # sentinel keeps every column position present in the canonical string
    row_str = F.concat_ws(
        "|", *[F.coalesce(F.col(c).cast("string"), F.lit("\x02")) for c in cols]
    )
    row_hash = F.pmod(h60(row_str), F.lit(1 << 40))
    return df.groupBy(*partition_cols).agg(
        F.count("*").alias("n_rows"),
        F.sum(row_hash).cast("long").alias("fingerprint"),
    )
