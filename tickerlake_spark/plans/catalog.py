"""Query catalog: every operator capability as a named (Spark plan, oracle SQL) pair.

This is the engine's public query surface and the correctness gate: the driver
runs each Spark plan and its ANSI-SQL oracle (DuckDB) side-by-side on the same
parquet tables and hash-compares results.

Conventions (required for hash-equality):
- every computed column is aliased identically in the plan and the SQL;
- double-typed outputs are rounded to 6 decimals on BOTH sides (sum order
  differs between engines at the 1e-15 relative level);
- ordered operators (first/last/top-k) always carry a total order with
  explicit tie-breakers — Spark result row order is otherwise nondeterministic;
- DuckDB integer sums are cast to BIGINT (DuckDB widens SUM(int) to INT128,
  Spark to long).

Registration is decentralized: query modules call ``register`` at import time;
``tickerlake_spark.plans`` imports them all.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

__all__ = ["QuerySpec", "QUERIES", "register", "load_table", "query_map", "oracle_map"]

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""
    bench: bool = False  # include in bench.py headline set


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    bench: bool = False,
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, bench=bench)
        return fn

    return deco


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table. Lazy — Catalyst prunes columns/predicates
    down into the parquet reader.

    ``events.ts`` is written as Parquet TIMESTAMP(NANOS), which Spark's
    reader rejects outright; we read nanos as long
    (spark.sql.legacy.parquet.nanosAsLong) and truncate to microseconds —
    exactly what DuckDB's TIMESTAMP does with the same file, keeping the
    oracle aligned.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name != "events":
        return spark.read.parquet(path)

    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        )
    return df


def ensure_executors_can_import(spark: SparkSession) -> None:
    """Ship the tickerlake_spark package to executors (addPyFile zip).

    Python-UDF paths (mapInPandas kernels) pickle references to this
    package; executors spawned from an arbitrary cwd can't import it unless
    it is distributed. Idempotent per session. On a real cluster this is the
    same mechanism used for any job dependency (--py-files).
    """
    if getattr(spark, "_tickerlake_pyfiles_added", False):
        return
    import tempfile
    import zipfile

    import tickerlake_spark

    pkg_dir = os.path.dirname(os.path.abspath(tickerlake_spark.__file__))
    fd, zpath = tempfile.mkstemp(suffix="_tickerlake_spark.zip")
    os.close(fd)
    with zipfile.ZipFile(zpath, "w") as zf:
        for root, _, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.join(
                        "tickerlake_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zpath)
    spark._tickerlake_pyfiles_added = True


def _wrapped(fn: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_executors_can_import(spark)
        return fn(spark, sf_dir)

    run.__name__ = getattr(fn, "__name__", "query")
    run.__doc__ = fn.__doc__
    return run


def query_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: _wrapped(spec.fn) for name, spec in QUERIES.items()}


def oracle_map() -> dict[str, str]:
    _ensure_loaded()
    return {n: s.oracle for n, s in QUERIES.items() if s.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import all query modules (each registers its specs)."""
    global _LOADED
    if _LOADED:
        return
    from tickerlake_spark.plans import (  # noqa: F401
        q_classic,
        q_core,
        q_datapipe,
        q_extra,
        q_finance,
        q_llm,
        q_media,
        q_streaming,
    )

    _LOADED = True
