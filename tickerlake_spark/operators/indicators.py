"""Technical indicators: SMA 20/50/200, ATR-14, volume MA + ratio.

Re-expression of the reference's per-ticker rolling indicators
(reference: silver/indicators.py:10-145). The reference sorts globally and
batches tickers for memory (silver/main.py:133-233); here each indicator is a
window over ``partitionBy(ticker) orderBy(date)`` — Spark hash-partitions
tickers across executors and spills per-partition, so the manual batching
disappears and the plan scales with cluster width.

Pinned semantics (SURVEY §4.3):
- rolling means are null until the window holds exactly n rows (Polars
  min_samples == window_size);
- volume_ma_20 is truncated to long BEFORE the ratio (the reference's
  UInt64 cast at silver/indicators.py:88);
- ATR's true range falls back to high-low on each ticker's first row.

Plan shape: all five sliding frames and the lag share ONE ticker-hash
exchange and ONE sort. With ``assume_non_null=True`` the full-window mask
uses a single ``row_number`` ordinal shared across frames instead of a
per-frame ``count`` accumulator (count over the frame == min(ordinal, n)
when inputs are non-null), ~15% faster since each sliding pass maintains
half the aggregation state. The DEFAULT is the count mask: a null close or
volume (permissive ``schemas.conform`` can produce one from a malformed
source row) must yield null means Polars-style (min_samples counts
non-null values), and the ordinal mask would silently average the fewer
valid rows instead. Only enable the fast path where non-null inputs are
provable — e.g. bars derived from lineitem prices in the query catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tickerlake_spark.functions.core import (
    rolling_mean_strict,
    rolling_window,
    true_range,
)

__all__ = ["compute_indicators"]


def compute_indicators(
    daily: DataFrame,
    assume_non_null: bool = False,
    trailing_cumsum: bool = False,
) -> DataFrame:
    """ticker, date, sma_20, sma_50, sma_200, atr_14, volume_ma_20,
    volume_ratio — from daily bars (ticker, date, high, low, close, volume).

    ``assume_non_null=True`` switches the full-window mask from per-frame
    counts to one shared ordinal — faster, but ONLY correct when
    high/low/close/volume are non-null (see module docstring).

    ``trailing_cumsum=True`` (optimization r12, guide §5 window inner loop)
    computes the DOUBLE trailing sums (SMA 20/50/200, ATR-14) as
    cumulative-sum differences — three O(1)-per-row Window passes instead
    of the O(284)-adds-per-row sliding recompute (Spark's sliding frame has
    no retract path; it rebuilds the aggregation buffer from scratch for
    every output row). Float caveat, measured (tools/experiments/
    exp_sma_cumsum.py): the identity reassociates double addition, so raw
    values drift up to 2e-13 relative / 4.2e-9 absolute vs the sliding
    fold at sf0.1 — inside the 5e-9 boundary margin ``stable_round``'s
    nudge guarantees for grid-valued data, and ZERO rounded-output flips
    vs both the sliding form and the DuckDB oracle at sf0.001/0.01/0.1.
    Requires ``assume_non_null`` and an integral volume column. The e2e
    pipeline deliberately does NOT use it: values become dependent on the
    full partition PREFIX, which would break the incremental tail-append
    invariant (appended rows bitwise-equal to a full recompute) that the
    sliding form's window-local dependence provides.
    """
    part, order = ["ticker"], ["date"]
    w1 = Window.partitionBy(*part).orderBy(*order)

    volume_is_integral = dict(daily.dtypes).get("volume") in (
        "bigint", "int", "smallint", "tinyint"
    )
    if trailing_cumsum and not (assume_non_null and volume_is_integral):
        raise ValueError(
            "trailing_cumsum requires assume_non_null=True and an integral "
            "volume column (the exactness/masking preconditions)"
        )

    # Pass 1 (optimization r11, guide §2.4 "window functions sharing one
    # pass"): every O(1) running frame at once — the lag, the shared ordinal
    # mask, and (integral volume) the volume cumsum — ONE WindowExec instead
    # of re-deriving each where referenced. Referencing the window EXPRESSION
    # per consumer made ExtractWindowExpressions emit one row_number instance
    # per SMA mask and a second lag(close); materializing them as columns
    # evaluates each exactly once. Same expressions over the same spec =>
    # identical values (full-row value_diffs=0 at sf0.1,
    # tools/experiments/exp_window_dedup.py; measured -18% min / -26% median
    # on the indicators pass).
    pass1 = [F.lag("close", 1).over(w1).alias("__prev_close")]
    if trailing_cumsum:
        pass1.append(
            F.sum("close")
            .over(w1.rowsBetween(Window.unboundedPreceding, 0))
            .alias("__cc")
        )
    if assume_non_null:
        pass1.append(F.row_number().over(w1).alias("__rn"))
        if volume_is_integral:
            # Volume is integral, so the trailing-20 sum equals the
            # cumulative-sum difference EXACTLY (no float reassociation —
            # the identity that is UNSAFE for the double SMAs). The cumsum
            # frame is incremental O(1) per row where the sliding frame
            # recomputes its buffer from scratch (O(20) adds per output
            # row); floor(x/20) on the identical long is the identical
            # double division and floor.
            pass1.append(
                F.sum("volume")
                .over(w1.rowsBetween(Window.unboundedPreceding, 0))
                .alias("__cumvol")
            )
    df = daily.select("*", *pass1).withColumn(
        "__tr", true_range(F.col("high"), F.col("low"), F.col("__prev_close"))
    )

    rn = F.col("__rn")

    if trailing_cumsum:
        # Pass 2: the true-range cumsum plus every prefix lag that depends
        # only on pass-1 columns — ONE WindowExec (shared spec). Pass 3:
        # the single lag that needs a pass-2 column. All frames O(1)/row.
        run = w1.rowsBetween(Window.unboundedPreceding, 0)
        df = df.select(
            "*",
            F.sum("__tr").over(run).alias("__ct"),
            F.lag("__cc", 20).over(w1).alias("__cc20"),
            F.lag("__cc", 50).over(w1).alias("__cc50"),
            F.lag("__cc", 200).over(w1).alias("__cc200"),
            F.lag("__cumvol", 20).over(w1).alias("__cv20"),
        ).select("*", F.lag("__ct", 14).over(w1).alias("__ct14"))

        def sma_c(n: int, lagcol: str):
            return F.when(
                rn >= n,
                (F.col("__cc") - F.coalesce(F.col(lagcol), F.lit(0.0))) / n,
            )

        vol_sum_20 = F.col("__cumvol") - F.coalesce(
            F.col("__cv20"), F.lit(0).cast("long")
        )
        out = df.select(
            "ticker",
            "date",
            "volume",
            sma_c(20, "__cc20").alias("sma_20"),
            sma_c(50, "__cc50").alias("sma_50"),
            sma_c(200, "__cc200").alias("sma_200"),
            F.when(
                rn >= 14,
                (F.col("__ct") - F.coalesce(F.col("__ct14"), F.lit(0.0))) / 14,
            ).alias("atr_14"),
            F.when(rn >= 20, F.floor(vol_sum_20 / 20)).cast("long").alias(
                "volume_ma_20"
            ),
        )
        return out.select(
            "ticker",
            "date",
            "sma_20",
            "sma_50",
            "sma_200",
            "atr_14",
            "volume_ma_20",
            F.when(
                F.col("volume_ma_20").isNotNull(),
                F.col("volume") / F.col("volume_ma_20"),
            ).alias("volume_ratio"),
        )

    def mean_full(col: str, n: int):
        # sum/n, not avg: sliding frames recompute the buffer per output row,
        # and Sum's buffer is half of Average's (sum, count) — bitwise
        # identical under the full-window mask (see rolling_mean_strict).
        if assume_non_null:
            return F.when(
                rn >= n, F.sum(col).over(rolling_window(part, order, n)) / n
            )
        return rolling_mean_strict(col, n, part, order)

    if assume_non_null and volume_is_integral:
        vol_sum_20 = F.col("__cumvol") - F.coalesce(
            F.lag("__cumvol", 20).over(w1), F.lit(0).cast("long")
        )
        vol_ma = F.when(rn >= 20, F.floor(vol_sum_20 / 20)).cast("long")
    else:
        vol_ma = F.floor(mean_full("volume", 20)).cast("long")

    # Pass 2: the four sliding sums and the cumvol lag share one
    # (partition, order) spec => one WindowExec (2 passes total, was 3).
    df = df.select(
        "ticker",
        "date",
        "volume",
        mean_full("close", 20).alias("sma_20"),
        mean_full("close", 50).alias("sma_50"),
        mean_full("close", 200).alias("sma_200"),
        mean_full("__tr", 14).alias("atr_14"),
        vol_ma.alias("volume_ma_20"),
    )
    return df.select(
        "ticker",
        "date",
        "sma_20",
        "sma_50",
        "sma_200",
        "atr_14",
        "volume_ma_20",
        F.when(
            F.col("volume_ma_20").isNotNull(),
            F.col("volume") / F.col("volume_ma_20"),
        ).alias("volume_ratio"),
    )
