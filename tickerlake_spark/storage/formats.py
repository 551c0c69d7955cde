"""Interchange formats beyond Parquet: CSV, JSON-lines, ORC.

The reference's lake is Parquet-only (storage/operations.py); landing zones
in practice also receive CSV drops and JSON event feeds. These helpers keep
the engine's schema-on-write discipline for those formats:

- reads take an EXPLICIT StructType — schema inference is a full extra pass
  over the data (and type-unstable between batches), both unacceptable at
  scale. Pass ``infer=True`` only for exploration.
- CSV/JSON are row formats with no column pruning or predicate pushdown —
  treat them as INGEST formats: land, conform, rewrite as Parquet
  immediately (``to_parquet_table``). The helpers exist so the bronze edge
  is covered, not to encourage querying CSV at rest.
- ORC round-trips with the same column pruning/pushdown class as Parquet
  (kept for interop with Hive-era producers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from tickerlake_spark.storage.io import write_table

__all__ = [
    "read_csv_table",
    "write_csv_table",
    "read_json_table",
    "write_json_table",
    "read_orc_table",
    "write_orc_table",
    "to_parquet_table",
]


def read_csv_table(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    header: bool = True,
    infer: bool = False,
    **options,
) -> DataFrame:
    if schema is None and not infer:
        raise ValueError("pass a schema (or infer=True for exploration only)")
    reader = spark.read.option("header", header).options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def write_csv_table(
    df: DataFrame, path: str, mode: str = "overwrite", header: bool = True, **options
) -> None:
    df.write.mode(mode).option("header", header).options(**options).csv(path)


def read_json_table(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    infer: bool = False,
    **options,
) -> DataFrame:
    if schema is None and not infer:
        raise ValueError("pass a schema (or infer=True for exploration only)")
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_json_table(df: DataFrame, path: str, mode: str = "overwrite", **options) -> None:
    df.write.mode(mode).options(**options).json(path)


def read_orc_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_orc_table(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def to_parquet_table(
    df: DataFrame,
    path: str,
    schema: StructType | None = None,
    partition_by: str | list[str] | None = None,
) -> None:
    """Land a row-format ingest batch as a proper Parquet table, optionally
    conformed to ``schema`` first (permissive cast, missing columns null)."""
    if schema is not None:
        from tickerlake_spark.schemas import conform

        df = conform(df, schema)
    write_table(df, path, partition_by=partition_by)
