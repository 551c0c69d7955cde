"""Run every cataloged query in Spark AND DuckDB and compare results.

This mirrors the driver's correctness gate (row count + columns + values,
order-insensitive) so oracle breakage is caught locally before a round ends.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

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


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, sf_dir, name):
    spec = QUERIES[name]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    duck_pdf = duck.execute(spec.oracle).fetchdf()
    assert_frames_match(spark_pdf, duck_pdf, name)
    # every query must return something at this sf, else it tests nothing
    assert len(spark_pdf) > 0, f"{name}: empty result — widen the predicate"


def test_all_rows_only_queries_run(spark, sf_dir):
    """Queries without an oracle must still execute and return a stable schema."""
    for name, spec in QUERIES.items():
        if spec.oracle is None:
            df = spec.fn(spark, sf_dir)
            assert df.columns, name
            df.limit(5).collect()
