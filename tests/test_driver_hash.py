"""Exact (tolerance-free) cross-engine hash checks.

The driver's correctness gate hashes canonicalized result values — unlike
tests/test_oracle_parity.py there is NO float tolerance there, so a value
that differs at the last ulp (or a float that formats differently between
engines) fails even when an approximate compare passes. These tests
reproduce that stricter contract for the queries that have historically sat
closest to a rounding boundary (q72 was the only driver hash-fail in r1).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from tickerlake_spark.plans import QUERIES
from tickerlake_spark.plans.catalog import _ensure_loaded

_ensure_loaded()

# Queries whose outputs must survive an exact value-hash across engines.
STRICT = [
    "q72_embedding_quantize",
    "q71_percentiles_exact",
    "q45_ann_bruteforce",
]


def _value_hash(pdf: pd.DataFrame) -> str:
    """Canonicalize order-insensitively and hash EXACT values: columns sorted
    by name, rows sorted by full tuple, every cell rendered with repr (full
    precision — no rounding, no tolerance)."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = sorted(tuple(repr(v) for v in row) for row in pdf.itertuples(index=False))
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


@pytest.mark.parametrize("name", STRICT)
def test_exact_value_hash_matches_oracle(spark, duck, sf_dir, name):
    spec = QUERIES[name]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    duck_pdf = duck.execute(spec.oracle).fetchdf()
    # dtype harmonization only (int64 vs Int64 etc.), never value rounding
    for c in spark_pdf.columns:
        if str(duck_pdf[c].dtype) != str(spark_pdf[c].dtype):
            duck_pdf[c] = duck_pdf[c].astype(spark_pdf[c].dtype)
    assert _value_hash(spark_pdf) == _value_hash(duck_pdf), (
        f"{name}: exact value hash diverged between Spark and DuckDB"
    )


def test_q72_outputs_are_integer_domain(spark, sf_dir):
    """No float column may cross the driver hash for q72 — every non-key
    output is BIGINT micro-units (boundary-proof by construction)."""
    df = QUERIES["q72_embedding_quantize"].fn(spark, sf_dir)
    types = dict(df.dtypes)
    assert types == {
        "vec_id": "bigint",
        "scale_e6": "bigint",
        "l2_err_e6": "bigint",
        "q_checksum": "bigint",
    }
