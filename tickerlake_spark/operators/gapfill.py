"""Calendar densification + forward fill for (key, date) time series.

Market data has holes (halts, listing gaps); indicators and as-of lookups
want a dense calendar with the last known value carried forward. The
reference sidesteps this by only computing on observed rows; densification
is the standard lakehouse extension (and what `resample` needs to label
empty periods correctly).

Plan shape (scale posture):
- the calendar is the DISTINCT dates of the input (or a supplied trading
  calendar) — a tiny dimension, broadcast;
- the per-key span (min..max date) is one aggregation over the input;
- grid = span ⋈ calendar (broadcast range join, output ~keys × days — the
  densified size, irreducible);
- observed rows left-join onto the grid on (key, date) — co-partitioned
  with the later window by key, so Catalyst plans ONE shuffle of each side;
- forward fill = `last(value, ignorenulls=True)` over a running
  (key, date) window. State per task is one row per key — O(1) memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["forward_fill_calendar"]


def forward_fill_calendar(
    df: DataFrame,
    key_col: str = "ticker",
    date_col: str = "date",
    fill_cols: tuple[str, ...] = ("close",),
    zero_cols: tuple[str, ...] = (),
    calendar: DataFrame | None = None,
) -> DataFrame:
    """Densify ``df`` to every calendar date within each key's [min, max]
    date span, carrying ``fill_cols`` forward (last non-null) and filling
    ``zero_cols`` with 0. Adds ``is_filled`` (true on synthesized rows).

    ``calendar`` defaults to the distinct dates observed anywhere in ``df``
    (the union trading calendar); pass an explicit one-column DataFrame to
    fill against an external calendar (e.g. NYSE sessions).
    """
    if calendar is None:
        calendar = df.select(F.col(date_col).alias("__cal_date")).distinct()
    else:
        calendar = calendar.select(F.col(calendar.columns[0]).alias("__cal_date"))

    span = df.groupBy(key_col).agg(
        F.min(date_col).alias("__d0"), F.max(date_col).alias("__d1")
    )
    grid = span.join(
        F.broadcast(calendar),
        (F.col("__cal_date") >= F.col("__d0")) & (F.col("__cal_date") <= F.col("__d1")),
    ).select(key_col, F.col("__cal_date").alias(date_col))

    joined = grid.join(df, [key_col, date_col], "left_outer").withColumn(
        "is_filled", F.col(fill_cols[0]).isNull()
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = joined
    for c in fill_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    for c in zero_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0).cast(dict(df.dtypes)[c])))
    return out
