"""Bucketed tables: shuffle-free co-located joins.

At 100 TB, a repeated fact ⋈ fact equi-join (e.g. bars ⋈ bars-as-of, or
orders ⋈ lineitem on orderkey) pays a full shuffle of both sides every run.
Bucketing pre-shuffles ONCE at write time: both tables hash-clustered into
the same number of buckets on the join key, so every subsequent join (and
groupBy on the key) reads co-located buckets and plans with ZERO exchanges.

This is the Spark-native answer to SURVEY §4.2's "consider bucketing by
ticker for silver at scale". The reference has no equivalent (single-file
Parquet, Polars in-memory).

Bucketing metadata lives in the session catalog (``saveAsTable``); we write
external tables (explicit ``path``) so the data stays in the engine's
layer/table directory layout and survives session restarts — re-attach with
:func:`attach_bucketed` after creating a new session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "attach_bucketed"]


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    buckets: int,
    key: str | list[str],
    sort_by: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as an external bucketed table ``name`` at ``path``.

    ``key`` drives the bucket hash; ``sort_by`` (defaults to the key) sorts
    within each bucket so merge joins skip their sort too. Pick ``buckets``
    so one bucket of the LARGER table fits an executor core's memory at
    target scale (e.g. 100 TB / 4096 buckets ≈ 25 GB per bucket pre-filter).
    """
    keys = [key] if isinstance(key, str) else list(key)
    sorts = (
        keys
        if sort_by is None
        else ([sort_by] if isinstance(sort_by, str) else list(sort_by))
    )
    (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(buckets, *keys)
        .sortBy(*sorts)
        .format("parquet")
        .saveAsTable(name)
    )


def attach_bucketed(
    spark: SparkSession,
    name: str,
    path: str,
    buckets: int,
    key: str | list[str],
    schema_ddl: str,
    sort_by: str | list[str] | None = None,
) -> None:
    """Re-register an existing bucketed dataset in a fresh session's catalog.

    Bucket metadata is catalog state, not Parquet state; a new session must
    re-declare it to get shuffle-free plans.
    """
    keys = [key] if isinstance(key, str) else list(key)
    sorts = (
        keys
        if sort_by is None
        else ([sort_by] if isinstance(sort_by, str) else list(sort_by))
    )
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(
        f"CREATE TABLE {name} ({schema_ddl}) USING parquet "
        f"LOCATION '{path}' "
        f"CLUSTERED BY ({', '.join(keys)}) "
        f"SORTED BY ({', '.join(sorts)}) INTO {buckets} BUCKETS"
    )
