"""Layer/table catalog.

Keeps the reference's ``data/{layer}/{table}`` naming
(reference: storage/paths.py:6-26) but every table is a Parquet *directory*
(Spark-native): unpartitioned tables are directories of part files,
partitioned tables are Hive-layout ``col=val/`` trees. At cluster scale the
root is an object-store URI (s3a://..., gs://...); locally a filesystem path.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from tickerlake_spark.config import Settings
from tickerlake_spark.storage.fs import FS, LOCAL_FS, make_lake_fs

__all__ = ["get_table_path", "Catalog"]

LAYERS = ("bronze", "silver", "gold")


def get_table_path(root: str, layer: str, table: str) -> str:
    """``{root}/{layer}/{table}`` — Parquet directory for the table."""
    if layer not in LAYERS:
        raise ValueError(f"unknown layer {layer!r}; expected one of {LAYERS}")
    return os.path.join(root, layer, table)


@dataclass
class Catalog:
    """Path catalog bound to a storage root (defaults to $TICKERLAKE_DATA
    or ./data) and the mutation-layer filesystem serving it.

    ``fs`` is what every journaled swap, checkpoint, footer probe, and
    manifest commit against this catalog's paths runs over — POSIX by
    default, the Hadoop adapter for s3a/gs/hdfs roots
    (``Catalog.from_settings`` wires it from config). Spark's bulk
    read/write speaks the root URI natively either way.
    """

    root: str = field(default_factory=lambda: Settings.from_env().data_dir)
    fs: FS = field(default_factory=lambda: LOCAL_FS)

    @classmethod
    def from_settings(cls, settings: Settings | None = None, spark=None) -> "Catalog":
        """Catalog wired from configuration: root from ``data_dir``, fs
        from ``lake_fs``/``fs_atomic_rename`` (``spark`` required when
        lake_fs='hadoop' — the adapter runs over the session JVM)."""
        s = settings if settings is not None else Settings.from_env()
        return cls(
            root=s.data_dir,
            fs=make_lake_fs(s.lake_fs, spark=spark, atomic_rename=s.fs_atomic_rename),
        )

    def path(self, layer: str, table: str) -> str:
        return get_table_path(self.root, layer, table)

    # Convenience accessors for the fixed reference tables.
    def bronze(self, table: str) -> str:
        return self.path("bronze", table)

    def silver(self, table: str) -> str:
        return self.path("silver", table)

    def gold(self, table: str) -> str:
        return self.path("gold", table)
