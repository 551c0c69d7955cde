"""tickerlake_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
``major/tickerlake`` (a Polars + Parquet medallion stock-market lake), expressed
Spark-first: declarative DataFrame/SQL plans optimized by Catalyst, Parquet
storage with Hive partitioning, window functions instead of sorted-invariant
rolling kernels, and true append writes.

Layers
------
- ``session``    SparkSession factory tuned for large-scale batch analytics.
- ``schemas``    StructType catalog + permissive ``conform`` casts.
- ``storage``    table catalog, Parquet IO, checkpoints (bronze/silver/gold).
- ``functions``  expression library (core, text, vector) — no Python UDFs in
                 hot paths; everything stays JVM-side / whole-stage-codegen.
- ``operators``  the reference's operator inventory re-expressed on DataFrames:
                 split adjustment, OHLCV resample, indicators, VWAP signals,
                 HVC + stair-step pattern mining, dedup, similarity search.
- ``streaming``  Structured-Streaming-shaped windows (tumbling/sliding/session)
                 with batch-parity semantics.
- ``sources``    ingestion-facing source interfaces (REST-shaped, calendar).
"""

__version__ = "0.1.0"
