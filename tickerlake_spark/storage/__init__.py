from tickerlake_spark.storage.bucketing import attach_bucketed, write_bucketed
from tickerlake_spark.storage.catalog import Catalog, get_table_path
from tickerlake_spark.storage.checkpoints import Checkpoints
from tickerlake_spark.storage.fs import FS, LOCAL_FS, LocalFS, MemoryObjectStore
from tickerlake_spark.storage.io import (
    detect_partition_column,
    drop_table,
    get_max_date,
    init_table,
    parquet_stats_all_non_null,
    parquet_stats_max,
    read_table,
    table_exists,
    write_table,
)
from tickerlake_spark.storage.snapshots import (
    SnapshotConflict,
    snap_compact,
    snap_current_version,
    snap_history,
    snap_read,
    snap_upsert,
    snap_vacuum,
    snap_view,
    snap_write,
    snapshot_sink,
)
from tickerlake_spark.storage.upsert import replace_keys, upsert_table

__all__ = [
    "Catalog",
    "get_table_path",
    "Checkpoints",
    "FS",
    "LOCAL_FS",
    "LocalFS",
    "MemoryObjectStore",
    "read_table",
    "write_table",
    "drop_table",
    "init_table",
    "table_exists",
    "get_max_date",
    "parquet_stats_all_non_null",
    "parquet_stats_max",
    "detect_partition_column",
    "write_bucketed",
    "attach_bucketed",
    "upsert_table",
    "replace_keys",
    "SnapshotConflict",
    "snap_write",
    "snap_upsert",
    "snap_read",
    "snap_history",
    "snap_current_version",
    "snap_vacuum",
    "snap_compact",
    "snap_view",
    "snapshot_sink",
]
