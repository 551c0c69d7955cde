"""Data-quality validation — the reference's 4th entry point, offline.

Two capabilities, both re-expressed as declarative Spark plans:

1. :func:`classify_date_counts` — per-date record-count anomaly
   classification (reference: utils/validation.py:16-139, driven from
   bronze/main.py:322-340). The reference loops in Python over a tiny stats
   list; here the mean is one aggregate broadcast back over the counts, so
   the same logic holds at any number of dates.

2. :func:`validate_split_adjustment` — the offline replacement for the
   reference's *online* oracle (silver/validation.py:333-365: sample 25
   recent splits, compare silver's adjusted closes around the execution date
   against Polygon's ``adjusted=True`` API within $0.01). With no network, we
   recompute the expected adjustment through an INDEPENDENT formulation —
   the reference's own row-multiplying join + product-aggregate
   (silver/splits.py:60-84) — and diff it against the engine's zero-shuffle
   fold (operators/splits.py). Two formulations, one truth: any drift in
   either shows up as a dollar-difference beyond tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "classify_date_counts",
    "validate_split_adjustment",
    "validate_incremental_indicators",
]


def classify_date_counts(
    stocks: DataFrame, min_records: int = 5000
) -> DataFrame:
    """Per-date record counts with anomaly classification.

    A date is anomalous when its count is < 50 % of the mean daily count,
    > 200 % of the mean, or below ``min_records`` absolute
    (reference: utils/validation.py:16-78 thresholds).

    Returns (date, n, mean_n, status) where status ∈
    {'ok', 'low', 'high', 'below_min'} — 'below_min' wins ties with 'low'.
    """
    counts = stocks.groupBy("date").agg(F.count("*").alias("n"))
    mean = counts.agg(F.avg("n").alias("mean_n"))
    return (
        counts.crossJoin(F.broadcast(mean))
        .withColumn(
            "status",
            F.when(F.col("n") < F.lit(min_records), F.lit("below_min"))
            .when(F.col("n") < 0.5 * F.col("mean_n"), F.lit("low"))
            .when(F.col("n") > 2.0 * F.col("mean_n"), F.lit("high"))
            .otherwise(F.lit("ok")),
        )
        .select("date", "n", "mean_n", "status")
    )


def _reference_formulation(stocks: DataFrame, splits: DataFrame) -> DataFrame:
    """Split adjustment via the reference's own plan shape: row-multiplying
    left join on ticker, CASE factor, re-group with a product aggregate
    (silver/splits.py:60-84). Deliberately DIFFERENT from
    operators/splits.apply_splits — this is the cross-check, not the engine.

    The product uses exp(sum(log)) (factors strictly positive); its 1-ulp
    noise vs ordered multiplication is far inside the $0.01 tolerance.
    """
    joined = stocks.join(
        F.broadcast(
            splits.select(
                "ticker",
                "execution_date",
                (F.col("split_from") / F.col("split_to")).cast("double").alias("__r"),
            )
        ),
        on="ticker",
        how="left",
    ).withColumn(
        "__f",
        F.when(F.col("date") < F.col("execution_date"), F.col("__r")).otherwise(
            F.lit(1.0)
        ),
    )
    other = [c for c in stocks.columns if c not in ("ticker", "date")]
    return (
        joined.groupBy("ticker", "date")
        .agg(
            F.exp(F.sum(F.log("__f"))).alias("__total"),
            *[F.first(c).alias(c) for c in other],
        )
        .select(
            "ticker",
            "date",
            (F.col("close") * F.col("__total")).alias("expected_close"),
        )
    )


def validate_split_adjustment(
    stocks: DataFrame,
    splits: DataFrame,
    adjusted: DataFrame,
    tolerance: float = 0.01,
    sample_splits: int = 25,
) -> DataFrame:
    """Spot-check ``adjusted`` (the engine's output) around sampled splits.

    For up to ``sample_splits`` splits (deterministic top-N by hash — the
    reference samples randomly, unseeded; we keep it reproducible), compare
    the adjusted close on the day before / of / after the execution date
    against the independent reference-formulation recomputation, within
    ``tolerance`` dollars (reference: silver/validation.py:34-58,360).

    Returns one row per checked (ticker, date): expected_close,
    actual_close, abs_diff, ok. ``ok`` must be universally true; callers
    assert ``filter(~ok).count() == 0``.
    """
    picked = F.broadcast(
        splits.select("ticker", "execution_date")
        .orderBy(F.xxhash64("ticker", "execution_date"))
        .limit(sample_splits)
    )
    # window of interest: bars within ±5 calendar days of a sampled split
    scoped = stocks.join(
        picked,
        on=(stocks["ticker"] == picked["ticker"])
        & (F.datediff(stocks["date"], picked["execution_date"]).between(-5, 5)),
        how="leftsemi",
    )
    expected = _reference_formulation(scoped, splits)
    return (
        expected.join(
            adjusted.select("ticker", "date", F.col("close").alias("actual_close")),
            on=["ticker", "date"],
            how="inner",
        )
        .withColumn("abs_diff", F.abs(F.col("expected_close") - F.col("actual_close")))
        .withColumn("ok", F.col("abs_diff") <= F.lit(tolerance))
        .select("ticker", "date", "expected_close", "actual_close", "abs_diff", "ok")
    )


def validate_incremental_indicators(
    daily: DataFrame,
    stored_indicators: DataFrame,
    sample_tickers: int = 25,
    tolerance: float = 1e-9,
) -> DataFrame:
    """Spot-check stored indicator rows against a from-scratch recompute.

    The silver append path maintains indicators incrementally (bounded
    window context, operators/incremental_silver.py); this is the
    production-time guard against any drift that maintenance could
    accumulate: sample ``sample_tickers`` tickers deterministically, rerun
    ``compute_indicators`` on their full daily history, and diff every
    indicator column against what is stored.

    Returns one row per sampled (ticker, date) with ``ok`` false where any
    column differs beyond ``tolerance`` (nulls must match exactly). The
    recompute touches only the sampled tickers' rows — a broadcast semi-join
    prunes the scan, so the check stays cheap at any table size.
    """
    from tickerlake_spark.operators.indicators import compute_indicators

    sampled = (
        daily.select("ticker")
        .distinct()
        .orderBy(F.xxhash64("ticker"))
        .limit(sample_tickers)
    )
    sub_daily = daily.join(F.broadcast(sampled), "ticker", "left_semi")
    expected = compute_indicators(sub_daily)
    stored = stored_indicators.join(F.broadcast(sampled), "ticker", "left_semi")

    cols = ["sma_20", "sma_50", "sma_200", "atr_14", "volume_ma_20", "volume_ratio"]
    e = expected.select(
        "ticker", "date", *[F.col(c).alias(f"__e_{c}") for c in cols]
    )
    joined = stored.join(e, ["ticker", "date"], "full_outer")
    checks = [
        (
            (F.col(c).isNull() & F.col(f"__e_{c}").isNull())
            | (F.abs(F.col(c) - F.col(f"__e_{c}")) <= tolerance)
        ).alias(f"__ok_{c}")
        for c in cols
    ]
    out = joined.select("ticker", "date", *checks)
    ok = F.lit(True)
    for c in cols:
        ok = ok & F.coalesce(F.col(f"__ok_{c}"), F.lit(False))
    return out.select("ticker", "date", ok.alias("ok"))
