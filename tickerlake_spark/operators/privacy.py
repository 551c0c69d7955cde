"""Privacy auditing operators: k-anonymity / l-diversity over quasi-identifiers.

Training-data pipelines that carry user-derived records need release
auditing beyond span-level PII masking (``q70_pii_mask``): a row is
re-identifiable when its QUASI-IDENTIFIER combination (zip+age+segment
style) is shared by fewer than k records, even with direct identifiers
removed. These operators compute the standard metrics:

- ``k_anonymity_profile``: per equivalence class (distinct quasi-id
  combo), its size and — when a sensitive column is given — its distinct
  sensitive-value count (l-diversity).
- ``suppress_below_k``: the enforcement step — drop rows in classes
  smaller than k (suppression, the baseline generalization-free remedy).

Plan shape: one hash aggregation on the quasi-id columns + one semi/anti
join back — the same two-pass shape as exact dedup, linear at any scale;
nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["k_anonymity_profile", "suppress_below_k"]


def k_anonymity_profile(
    df: DataFrame,
    quasi_ids: list[str],
    sensitive: str | None = None,
) -> DataFrame:
    """(quasi_ids..., class_size[, l_diversity]) per equivalence class."""
    aggs = [F.count("*").alias("class_size")]
    if sensitive is not None:
        aggs.append(F.countDistinct(sensitive).alias("l_diversity"))
    return df.groupBy(*quasi_ids).agg(*aggs)


def suppress_below_k(
    df: DataFrame, quasi_ids: list[str], k: int
) -> DataFrame:
    """Rows whose equivalence class has >= k members (the k-anonymous
    subset). Classes below k are suppressed entirely."""
    ok = (
        df.groupBy(*quasi_ids)
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") >= k)
        .drop("__n")
    )
    # null-SAFE semi join: groupBy puts all NULL quasi-id rows in one
    # equivalence class, so suppression must use the same class definition —
    # a plain equi-join would drop every NULL-bearing row regardless of its
    # class size (ADVICE r4). AQE still picks broadcast vs shuffle.
    cond = None
    for q in quasi_ids:
        c = df[q].eqNullSafe(ok[q])
        cond = c if cond is None else cond & c
    return df.join(ok, cond, "left_semi")
