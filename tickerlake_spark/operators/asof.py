"""As-of (most-recent-prior) join.

Spark has no native ASOF JOIN; the scalable formulation is the union +
last-non-null window trick: tag right rows, union with left probes, sort
within key by (ts, side) and carry the last right payload forward. One
shuffle on the key, no range-explosion — at 100 TB this behaves like a
sort-merge join, not a theta join.

Used for point-in-time lookups (latest price before an order, last session
event before an error, slowly-changing-dimension reads).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_cols: list[str],
    inclusive: bool = True,
) -> DataFrame:
    """For each left row, attach the right row's ``value_cols`` with the
    greatest ``ts_col`` <= (or < if not inclusive) the left row's, per key.

    Right-side ties on (key, ts) must be pre-deduplicated by the caller for
    determinism. Output = all left columns + value_cols (null when no prior
    right row exists).
    """
    payload = F.struct(*[F.col(c) for c in value_cols])
    # side ordering makes equal-ts right rows visible (inclusive) or not
    right_side, left_side = (0, 1) if inclusive else (1, 0)
    r = right.select(
        *key_cols,
        F.col(ts_col).alias("__ts"),
        F.lit(right_side).alias("__side"),
        payload.alias("__payload"),
    )
    left_cols = left.columns
    l = left.select(
        *[F.col(c) for c in left_cols],
    ).select(
        *left_cols,
        F.col(ts_col).alias("__ts"),
        F.lit(left_side).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
    )
    combined = r.select(
        *key_cols,
        "__ts",
        "__side",
        "__payload",
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_cols if c not in key_cols and c != ts_col],
    ).unionByName(
        l.select(
            *key_cols,
            "__ts",
            "__side",
            "__payload",
            *[c for c in left_cols if c not in key_cols and c != ts_col],
        )
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = combined.withColumn(
        "__last", F.last("__payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__side") == left_side).select(
        *key_cols,
        F.col("__ts").alias(ts_col),
        *[c for c in left_cols if c not in key_cols and c != ts_col],
        *[F.col("__last")[c].alias(c) for c in value_cols],
    )
    return out
