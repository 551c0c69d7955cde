"""The driver's exact (tolerance-free) repr-hash contract, as reusable code.

The driver's correctness gate hashes canonicalized result values with repr —
no float tolerance, no dtype coercion. Both historical driver failures
(q72 r1/r2, q83 r2) were dtype bugs in the *oracle SQL*: DuckDB widens
integer SUMs to HUGEINT, pandas renders HUGEINT as float64, and the driver's
repr hash sees ``147.0`` vs Spark's ``147``. An earlier sweep here
"harmonized" dtypes before hashing, which silently erased exactly that
divergence — so it passed while the driver failed.

The full-catalog sweep enforcing this contract lives in
``test_oracle_parity.py`` (ONE Spark+DuckDB execution per query, strict
hash + dtype-kind equality, tolerant diff only as the failure diagnostic —
a second independent sweep would double the suite's Spark work for zero
extra signal). This module keeps the canonicalization/hash helpers it and
``tools/check_new_queries.py`` share, plus the q72 integer-domain pin.
"""

from __future__ import annotations

import datetime
import hashlib

import numpy as np
import pandas as pd

from tickerlake_spark.plans import QUERIES
from tickerlake_spark.plans.catalog import _ensure_loaded

_ensure_loaded()


def _is_datelike(series: pd.Series) -> bool:
    if pd.api.types.is_datetime64_any_dtype(series):
        return True
    if series.dtype == object:
        sample = series.dropna().head(5)
        return len(sample) > 0 and all(
            isinstance(v, (datetime.date, datetime.datetime, pd.Timestamp))
            for v in sample
        )
    return False


def _canon(v):
    """Canonicalize one cell the way the driver's repr hash sees it: numpy
    scalars unwrap to Python scalars (int stays int, float stays float — the
    divergence we must NOT erase), dates/timestamps normalize to ISO text,
    arrays/lists recurse."""
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float) and v != v:  # NaN (incl. NULL-in-float columns)
        return "None"
    if v is None or v is pd.NaT:
        return "None"
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        # DuckDB hands DATE columns to pandas as midnight timestamps while
        # Spark yields datetime.date — the driver normalizes these together.
        if v.time() == datetime.time(0) and v.tzinfo is None:
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ", ".join(_canon(x) for x in v) + "]"
    if isinstance(v, (bool, np.bool_)):
        return repr(bool(v))
    return repr(v)


def _value_hash(pdf: pd.DataFrame) -> str:
    """Columns sorted by name, rows sorted by full canonical tuple, exact
    reprs — full precision, no rounding, no tolerance."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = sorted(tuple(_canon(v) for v in row) for row in pdf.itertuples(index=False))
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def _dtype_mismatches(
    spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame
) -> list[str]:
    """Columns whose pandas dtype KIND diverges between engines (int vs
    float vs bool vs object), excluding date-like columns (the driver
    normalizes dates before hashing). Width differences (int32 vs int64)
    repr identically after scalar unwrap and are driver-safe (q87 was
    driver-green with exactly that split); int64 vs float64 is precisely
    the class that broke q72/q83/q89 in the driver, so kinds are compared
    with NO harmonization."""
    bad = []
    for c in spark_pdf.columns:
        s, d = spark_pdf[c], duck_pdf[c]
        if s.dtype.kind == d.dtype.kind:
            continue
        if _is_datelike(s) and _is_datelike(d):
            continue
        bad.append(f"{c}: spark={s.dtype} duck={d.dtype}")
    return bad


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
