"""Run every cataloged query in Spark AND DuckDB and compare results.

This is the driver's correctness gate reproduced faithfully — ONE execution
per query, checked at the driver's strictness:

- column sets must match,
- pandas dtype KINDS must match (int vs float vs bool vs object; the class
  of oracle bug that broke q72/q83 in the driver — DuckDB HUGEINT lands in
  pandas as float64 while Spark emits int64, and the driver's repr hash
  sees ``147.0`` vs ``147``),
- the order-insensitive repr-based value hash must match exactly — no float
  tolerance, no dtype harmonization.

When the strict hash diverges, the tolerance-based frame diff runs as a
DIAGNOSTIC so the failure names the first offending column/row instead of
just "hash mismatch". (Running the tolerant compare on every green query as
a separate sweep would double the suite's Spark work for zero extra signal:
exact equality implies tolerant equality.)
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from test_driver_hash import _dtype_mismatches, _value_hash

from tickerlake_spark.plans import QUERIES
from tickerlake_spark.plans.catalog import _ensure_loaded

_ensure_loaded()

ORACLE_QUERIES = sorted(n for n, s in QUERIES.items() if s.oracle is not None)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # unify timestamp precision; stringify for a stable sort across dtypes
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    """Tolerant (1e-9) value comparison with a first-mismatch error message —
    the diagnostic layer under the strict hash."""
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
            av, bv = a[c].astype(float), b[c].astype(float)
            both_nan = av.isna() & bv.isna()
            close = (av - bv).abs() <= 1e-9 + 1e-9 * bv.abs()
            bad = ~(both_nan | close)
            if bad.any():
                i = bad.idxmax()
                raise AssertionError(
                    f"{name}.{c}: value mismatch at row {i}: "
                    f"spark={av[i]!r} duck={bv[i]!r} "
                    f"(maxdiff={ (av-bv).abs().max() })"
                )
        else:
            mism = ~((a[c] == b[c]) | (a[c].isna() & b[c].isna()))
            if mism.any():
                i = mism.idxmax()
                raise AssertionError(
                    f"{name}.{c}: mismatch at row {i}: "
                    f"spark={a[c][i]!r} duck={b[c][i]!r}"
                )


def _assert_flat_schema(df, name):
    """The driver's canonicalizer lexsorts result columns with pandas, which
    cannot hash list/dict cells — an array/map/struct-typed output column
    crashes the correctness gate (q90, round 3). Every catalog query must
    emit only atomic columns."""
    from pyspark.sql import types as T

    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, (
        f"{name}: non-atomic output columns {bad} — flatten them "
        f"(getItem/posexplode/to_json); the driver cannot hash these"
    )


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, sf_dir, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, sf_dir)
    _assert_flat_schema(sdf, name)
    spark_pdf = sdf.toPandas()
    duck_pdf = duck.execute(spec.oracle).fetchdf()

    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column sets diverge: "
        f"{sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    mismatches = _dtype_mismatches(spark_pdf, duck_pdf)
    assert not mismatches, (
        f"{name}: oracle/Spark dtype divergence (driver repr-hash would "
        f"fail): {mismatches} — likely an uncast SUM/list_aggregate in the "
        f"oracle SQL (DuckDB HUGEINT -> pandas float64)"
    )
    if _value_hash(spark_pdf) != _value_hash(duck_pdf):
        # strict hash diverged — run the tolerant diff for a named culprit
        assert_frames_match(spark_pdf, duck_pdf, name)
        raise AssertionError(
            f"{name}: exact value hash diverged but values are within 1e-9 "
            f"— a rounding-boundary or repr-precision issue; see "
            f"functions.core.stable_round"
        )
    # every query must return something at this sf, else it tests nothing
    assert len(spark_pdf) > 0, f"{name}: empty result — widen the predicate"


def test_all_rows_only_queries_run(spark, sf_dir):
    """Queries without an oracle must still execute and return a stable schema."""
    for name, spec in QUERIES.items():
        if spec.oracle is None:
            df = spec.fn(spark, sf_dir)
            assert df.columns, name
            _assert_flat_schema(df, name)
            df.limit(5).collect()


def test_every_query_has_an_oracle():
    """Since round 5 the catalog carries ZERO rows-only queries — q139's
    BPE merge chain was the last holdout and now unrolls to SQL. Keep it
    that way: a new query without an oracle gets the driver's weaker
    rows-only check and starts a never-green row (the r1-r4 q90/q133/q139
    story). If an op is genuinely non-SQL-expressible, document why in
    the spec doc and relax this pin explicitly."""
    missing = [n for n, s in QUERIES.items() if s.oracle is None]
    assert missing == [], missing
