"""Skew-aware join: explicit key salting.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime, but it only splits *sort-merge* join partitions after a shuffle has
already materialized. When one key holds a double-digit percentage of a
100 TB fact table, the explicit fix is salting: spread the hot key across
``n`` sub-keys on the fact side and replicate the matching rows of the other
side ``n`` ways, so no single reducer owns the hot key.

The reference never needs this (its joins are against tiny dims), so this is
a beyond-reference scale operator. Semantics are exactly an inner/left
equi-join — the salt is invisible in the output — which is what makes it
oracle-checkable against the plain join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]

_SALT = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join ``fact`` ⋈ ``dim`` with the shuffle key salted ``salt`` ways.

    The fact side gets a deterministic salt derived from the hash of the full
    row (``xxhash64`` over all columns — uniform, reproducible across runs);
    the dim side is replicated once per salt value via an ``explode`` of a
    constant 0..salt-1 array (a narrow, map-side operation — dim rows grow
    ``salt``-fold, which is the price of eliminating the hot reducer; keep
    ``salt`` ≲ 64).

    ``how`` supports ``inner`` and ``left`` (the shapes the engine uses);
    the salt column never escapes.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    fact_salted = fact.withColumn(
        _SALT, F.pmod(F.xxhash64(*fact.columns), F.lit(salt)).cast("int")
    )
    dim_replicated = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return fact_salted.join(dim_replicated, on=keys + [_SALT], how=how).drop(_SALT)
