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
    or ./data)."""

    root: str = field(default_factory=lambda: Settings.from_env().data_dir)

    def path(self, layer: str, table: str) -> str:
        return get_table_path(self.root, layer, table)

    # Convenience accessors for the fixed reference tables.
    def bronze(self, table: str) -> str:
        return self.path("bronze", table)

    def silver(self, table: str) -> str:
        return self.path("silver", table)

    def gold(self, table: str) -> str:
        return self.path("gold", table)
