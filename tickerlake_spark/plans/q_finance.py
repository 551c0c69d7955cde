"""Finance-operator queries (SURVEY §2.3-2.5, §2.9) — the reference's silver
and gold pipeline end-to-end on the derived stock universe (see finance.py).

Chain under test: bars -> split adjustment -> resample / indicators -> VWAP
signals -> HVC events -> stair-step pattern mining. Every stage has a DuckDB
oracle built from the same CTE derivations.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tickerlake_spark.functions.core import stable_round
from tickerlake_spark.operators.hvc import best_patterns, hvc_events, stairstep_patterns
from tickerlake_spark.operators.indicators import compute_indicators
from tickerlake_spark.operators.resample import resample_ohlcv
from tickerlake_spark.operators.splits import apply_splits
from tickerlake_spark.operators.vwap import vwap_signals
from tickerlake_spark.plans.catalog import register
from tickerlake_spark.plans.finance import (
    ADJUSTED_CTE,
    BARS_CTE,
    INDICATORS_CTE,
    META_CTE,
    resampled_indicators_cte,
    stock_bars,
    stock_splits,
)

# HVC threshold: the derived bars have near-uniform volume, so the reference's
# 3.0x threshold matches ~nothing; 1.5x keeps the operator exercised with a
# non-degenerate result at every sf.
HVC_THRESHOLD = 1.5
STAIRSTEP_MIN_STEPS = 2

_CALCULATED_AT = dt.datetime(2026, 1, 1, 0, 0, 0)

# Optimization r11 (guide §2.3, shuffle narrower types): the whole finance
# chain groups / joins / windows on ticker, and ticker := l_suppkey is an
# injective bigint→string cast — so the chain runs on the raw 8-byte long
# (primitive hash + compare, fixed-width shuffle rows) and each query casts
# back to string ONLY in its final projection, after every exchange and sort.
# Group membership, join matches and window frames are identical either way,
# so declared output is byte-identical (oracle-checked).
def _ticker_str() -> F.Column:
    return F.col("ticker").cast("string").alias("ticker")


def _adjusted(
    spark: SparkSession,
    sf_dir: str,
    *,
    long_ticker: bool = False,
    factor_once: bool = False,
) -> DataFrame:
    return apply_splits(
        stock_bars(spark, sf_dir, long_ticker=long_ticker),
        stock_splits(spark, sf_dir, long_ticker=long_ticker),
        factor_once=factor_once,
    )


@register(
    "q30_stock_bars",
    doc="Daily OHLCV bar construction: ordered first/last via min_by/max_by "
    "over a total-order struct (A3 building block; reference relies on a "
    "pre-sort instead, silver/aggregates.py:28).",
    oracle=f"""
WITH {BARS_CTE}
SELECT ticker, date, open, high, low, close, volume, transactions FROM bars
""",
)
def q30_stock_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = stock_bars(spark, sf_dir, long_ticker=True)
    return bars.select(
        _ticker_str(), "date", "open", "high", "low", "close", "volume", "transactions"
    )


@register(
    "q31_split_adjust",
    doc="Retroactive split adjustment (J1/J2/A2, silver/splits.py:17-105): "
    "broadcast left join, CASE factor, exact product aggregate, truncating "
    "volume division. Stacked splits exercised by suppkey%15 tickers.",
    bench=True,
    oracle=f"""
WITH {ADJUSTED_CTE}
SELECT ticker, date,
       ROUND(open + 5e-9, 6) AS open, ROUND(high + 5e-9, 6) AS high,
       ROUND(low + 5e-9, 6) AS low, ROUND(close + 5e-9, 6) AS close,
       volume, transactions
FROM adjusted
""",
)
def q31_split_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    adj = _adjusted(spark, sf_dir, long_ticker=True)
    return adj.select(
        _ticker_str(),
        "date",
        stable_round(F.col("open"), 6).alias("open"),
        stable_round(F.col("high"), 6).alias("high"),
        stable_round(F.col("low"), 6).alias("low"),
        stable_round(F.col("close"), 6).alias("close"),
        "volume",
        "transactions",
    )


@register(
    "q32_resample_weekly",
    doc="Weekly OHLCV resample, Monday-anchored, label = period start "
    "(A3, silver/aggregates.py:10-51; SURVEY §4.3.5).",
    oracle=f"""
WITH {ADJUSTED_CTE}
SELECT ticker, CAST(date_trunc('week', date) AS DATE) AS date,
       ROUND(arg_min(open, date) + 5e-9, 6) AS open,
       ROUND(MAX(high) + 5e-9, 6) AS high,
       ROUND(MIN(low) + 5e-9, 6) AS low,
       ROUND(arg_max(close, date) + 5e-9, 6) AS close,
       CAST(SUM(volume) AS BIGINT) AS volume,
       CAST(SUM(transactions) AS BIGINT) AS transactions
FROM adjusted
GROUP BY 1, 2
""",
)
def q32_resample_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    wk = resample_ohlcv(_adjusted(spark, sf_dir, long_ticker=True), "week")
    return wk.select(
        _ticker_str(),
        "date",
        stable_round(F.col("open"), 6).alias("open"),
        stable_round(F.col("high"), 6).alias("high"),
        stable_round(F.col("low"), 6).alias("low"),
        stable_round(F.col("close"), 6).alias("close"),
        "volume",
        "transactions",
    )


@register(
    "q33_resample_monthly",
    doc="Monthly OHLCV resample (A4, silver/aggregates.py:54-93).",
    oracle=f"""
WITH {ADJUSTED_CTE}
SELECT ticker, CAST(date_trunc('month', date) AS DATE) AS date,
       ROUND(arg_min(open, date) + 5e-9, 6) AS open,
       ROUND(MAX(high) + 5e-9, 6) AS high,
       ROUND(MIN(low) + 5e-9, 6) AS low,
       ROUND(arg_max(close, date) + 5e-9, 6) AS close,
       CAST(SUM(volume) AS BIGINT) AS volume,
       CAST(SUM(transactions) AS BIGINT) AS transactions
FROM adjusted
GROUP BY 1, 2
""",
)
def q33_resample_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    mo = resample_ohlcv(_adjusted(spark, sf_dir, long_ticker=True), "month")
    return mo.select(
        _ticker_str(),
        "date",
        stable_round(F.col("open"), 6).alias("open"),
        stable_round(F.col("high"), 6).alias("high"),
        stable_round(F.col("low"), 6).alias("low"),
        stable_round(F.col("close"), 6).alias("close"),
        "volume",
        "transactions",
    )


@register(
    "q34_indicators",
    doc="SMA 20/50/200 + ATR-14 + truncated volume MA + ratio, all null "
    "until the window is full (W1-W5, silver/indicators.py:10-145; "
    "SURVEY §4.3.1/§4.3.3).",
    bench=True,
    oracle=f"""
WITH {INDICATORS_CTE}
SELECT ticker, date,
       ROUND(sma_20 + 5e-9, 6) AS sma_20,
       ROUND(sma_50 + 5e-9, 6) AS sma_50,
       ROUND(sma_200 + 5e-9, 6) AS sma_200,
       ROUND(atr_14 + 5e-9, 6) AS atr_14,
       volume_ma_20,
       ROUND(CASE WHEN volume_ma_20 IS NOT NULL
                  THEN volume / volume_ma_20 END + 5e-9, 6) AS volume_ratio
FROM ind
""",
)
def q34_indicators(spark: SparkSession, sf_dir: str) -> DataFrame:
    # assume_non_null: bars here derive from lineitem price/qty (never null),
    # so the shared-ordinal window mask is provably equivalent and faster.
    # trailing_cumsum (r12): the double trailing sums as O(1) cumsum diffs —
    # measured 0 rounded-output flips vs the sliding form AND the DuckDB
    # oracle at all 3 test SFs (max abs drift 4.2e-9 vs stable_round's 5e-9
    # boundary margin; tools/experiments/exp_sma_cumsum.py). The catalog
    # query always computes from full history, so the prefix-dependence
    # caveat that keeps the e2e pipeline on the sliding form does not apply.
    ind = compute_indicators(
        _adjusted(spark, sf_dir, long_ticker=True),
        assume_non_null=True,
        trailing_cumsum=True,
    )
    return ind.select(
        _ticker_str(),
        "date",
        stable_round(F.col("sma_20"), 6).alias("sma_20"),
        stable_round(F.col("sma_50"), 6).alias("sma_50"),
        stable_round(F.col("sma_200"), 6).alias("sma_200"),
        stable_round(F.col("atr_14"), 6).alias("atr_14"),
        "volume_ma_20",
        stable_round(F.col("volume_ratio"), 6).alias("volume_ratio"),
    )


@register(
    "q35_vwap_signals",
    doc="Gold VWAP signals: YTD/QTD cumulative VWAP + above flags "
    "(W6-W8, gold/vwap_signals.py:25-177).",
    bench=True,
    oracle=f"""
WITH {ADJUSTED_CTE}
SELECT ticker, date, ROUND(close + 5e-9, 6) AS close,
       ROUND(SUM(close * volume) OVER wy / SUM(volume) OVER wy + 5e-5, 2) AS ytd_vwap,
       ROUND(SUM(close * volume) OVER wq / SUM(volume) OVER wq + 5e-5, 2) AS qtd_vwap,
       (close > SUM(close * volume) OVER wy / SUM(volume) OVER wy) AS above_ytd_vwap,
       (close > SUM(close * volume) OVER wq / SUM(volume) OVER wq) AS above_qtd_vwap,
       ((close > SUM(close * volume) OVER wy / SUM(volume) OVER wy) AND
        (close > SUM(close * volume) OVER wq / SUM(volume) OVER wq)) AS above_both,
       TIMESTAMP '2026-01-01 00:00:00' AS calculated_at
FROM adjusted
WHERE close IS NOT NULL AND volume IS NOT NULL AND volume > 0
WINDOW
  wy AS (PARTITION BY ticker, year(date) ORDER BY date ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
  wq AS (PARTITION BY ticker, year(date), quarter(date) ORDER BY date ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def q35_vwap_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    # VWAP is a ratio of cumulative window sums; DuckDB's windowed SUM
    # (segment tree) and Spark's running sum differ by ~1 ulp, so a
    # 6-decimal grain sits inside the cross-engine noise and hash-flips on
    # boundary values. Cents (2 decimals) swamp the noise by 8 orders of
    # magnitude — boundary-proof for the driver's exact repr hash.
    # factor_once: vwap's base filter references the adjusted close/volume,
    # and filter pushdown re-inlines the (interpreted, CodegenFallback) split
    # fold into each pushed conjunct — 4 evaluations per row, plan-verified
    # in plans/r11/q35_vwap_signals_after.txt. The barrier pins it to ONE
    # (optimization r12, guide §4.4); values are bit-identical.
    sig = vwap_signals(
        _adjusted(spark, sf_dir, long_ticker=True, factor_once=True),
        calculated_at=_CALCULATED_AT,
    )
    return sig.select(
        _ticker_str(),
        "date",
        stable_round(F.col("close"), 6).alias("close"),
        stable_round(F.col("ytd_vwap"), 2).alias("ytd_vwap"),
        stable_round(F.col("qtd_vwap"), 2).alias("qtd_vwap"),
        "above_ytd_vwap",
        "above_qtd_vwap",
        "above_both",
        "calculated_at",
    )


@register(
    "q36_hvc_events",
    doc="High-Volume-Close event detection: volume >= threshold x 20-day MA "
    "(D1, metadata.json:9-67).",
    oracle=f"""
WITH {INDICATORS_CTE}
SELECT date, ticker,
       ROUND(volume / volume_ma_20 + 5e-9, 6) AS volume_avg_ratio,
       volume,
       volume_ma_20 AS volume_avg
FROM ind
WHERE volume_ma_20 IS NOT NULL
  AND volume / volume_ma_20 >= {HVC_THRESHOLD}
""",
)
def q36_hvc_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    adj = _adjusted(spark, sf_dir, long_ticker=True)
    ind = compute_indicators(adj, assume_non_null=True)
    ev = hvc_events(ind, adj, threshold=HVC_THRESHOLD)
    return ev.select(
        "date",
        _ticker_str(),
        stable_round(F.col("volume_avg_ratio"), 6).alias("volume_avg_ratio"),
        "volume",
        "volume_avg",
    )


def _hvc_resampled(spark: SparkSession, sf_dir: str, unit: str, threshold: float) -> DataFrame:
    """HVC detection over a {unit}-resampled timeframe: the reference
    declares weekly/monthly HVC faces alongside daily
    (metadata.json:69-188); same operators, coarser bars."""
    adj = _adjusted(spark, sf_dir, long_ticker=True)
    res = resample_ohlcv(adj, unit)
    ind = compute_indicators(res, assume_non_null=True)
    ev = hvc_events(ind, res, threshold=threshold)
    return ev.select(
        "date",
        _ticker_str(),
        stable_round(F.col("volume_avg_ratio"), 6).alias("volume_avg_ratio"),
        "volume",
        "volume_avg",
    )


# Weekly/monthly volume is a 5x/21x coarser sum, so spikes flatten; a lower
# threshold keeps the faces non-degenerate at every sf (same reasoning as
# HVC_THRESHOLD above).
HVC_THRESHOLD_RESAMPLED = 1.2

_HVC_FACE_SELECT = f"""
SELECT date, ticker,
       ROUND(volume / volume_ma_20 + 5e-9, 6) AS volume_avg_ratio,
       volume,
       volume_ma_20 AS volume_avg
FROM ind
WHERE volume_ma_20 IS NOT NULL
  AND volume / volume_ma_20 >= {HVC_THRESHOLD_RESAMPLED}
"""


@register(
    "q36w_hvc_events_weekly",
    doc="High-Volume-Close events on the WEEKLY timeframe: resample -> "
    "indicators -> threshold filter (reference metadata.json:69-128 "
    "declares weekly HVC tables; D1 x A3). The resample groupBy and the "
    "indicator windows all cluster on ticker, so the whole face reuses the "
    "bars' single ticker-hash exchange.",
    oracle=f"""
WITH {resampled_indicators_cte('week')}
{_HVC_FACE_SELECT}
""",
)
def q36w_hvc_events_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _hvc_resampled(spark, sf_dir, "week", HVC_THRESHOLD_RESAMPLED)


@register(
    "q36m_hvc_events_monthly",
    doc="High-Volume-Close events on the MONTHLY timeframe "
    "(reference metadata.json:129-188; D1 x A4).",
    oracle=f"""
WITH {resampled_indicators_cte('month')}
{_HVC_FACE_SELECT}
""",
)
def q36m_hvc_events_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _hvc_resampled(spark, sf_dir, "month", HVC_THRESHOLD_RESAMPLED)


_STAIRSTEP_BODY = f"""
hvc AS (
  SELECT ticker, date FROM ind
  WHERE volume_ma_20 IS NOT NULL AND volume / volume_ma_20 >= {HVC_THRESHOLD}
),
seq AS (
  SELECT h.ticker, h.date, a.close,
         lag(a.close) OVER (PARTITION BY h.ticker ORDER BY h.date) AS prev_close
  FROM hvc h JOIN adjusted a ON h.ticker = a.ticker AND h.date = a.date
),
flagged AS (
  SELECT *, CASE WHEN prev_close IS NULL OR NOT (close {{cmp}} prev_close)
                 THEN 1 ELSE 0 END AS brk
  FROM seq
),
islands AS (
  SELECT *, SUM(brk) OVER (PARTITION BY ticker ORDER BY date
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
),
patterns AS (
  SELECT ticker,
         MIN(date) AS start_date,
         MAX(date) AS end_date,
         COUNT(*) AS hvc_count,
         arg_min(close, date) AS first_close,
         arg_max(close, date) AS last_close,
         string_agg(CAST(date AS VARCHAR), ',' ORDER BY date) AS dates_str
  FROM islands
  GROUP BY ticker, island
  HAVING COUNT(*) >= {STAIRSTEP_MIN_STEPS}
)
"""


@register(
    "q37_stairstep_up",
    doc="Stair-step pattern mining: gaps-and-islands over consecutive HVCs "
    "with strictly rising closes (D2, metadata.json:189-334).",
    oracle=f"""
WITH {INDICATORS_CTE},
{_STAIRSTEP_BODY.format(cmp='>')}
SELECT ticker, start_date, end_date, hvc_count,
       ROUND(first_close + 5e-9, 6) AS first_close,
       ROUND(last_close + 5e-9, 6) AS last_close,
       ROUND((last_close - first_close) / first_close * 100.0 + 5e-9, 6) AS gain_pct,
       dates_str
FROM patterns
""",
)
def q37_stairstep_up(spark: SparkSession, sf_dir: str) -> DataFrame:
    adj = _adjusted(spark, sf_dir, long_ticker=True)
    ind = compute_indicators(adj, assume_non_null=True)
    ev = hvc_events(ind, adj, threshold=HVC_THRESHOLD)
    pat = stairstep_patterns(
        ev, adj.select("ticker", "date", "close"),
        min_steps=STAIRSTEP_MIN_STEPS, direction="up",
    )
    return pat.select(
        _ticker_str(),
        "start_date",
        "end_date",
        "hvc_count",
        stable_round(F.col("first_close"), 6).alias("first_close"),
        stable_round(F.col("last_close"), 6).alias("last_close"),
        stable_round(F.col("gain_pct"), 6).alias("gain_pct"),
        "dates_str",
    )


@register(
    "q37b_stairstep_down",
    doc="Falling-down-stairs pattern mining: consecutive HVCs with strictly "
    "falling closes — the declining mirror of q37 (D3, "
    "metadata.json:457-576).",
    oracle=f"""
WITH {INDICATORS_CTE},
{_STAIRSTEP_BODY.format(cmp='<')}
SELECT ticker, start_date, end_date, hvc_count,
       ROUND(first_close + 5e-9, 6) AS first_close,
       ROUND(last_close + 5e-9, 6) AS last_close,
       ROUND((last_close - first_close) / first_close * 100.0 + 5e-9, 6) AS gain_pct,
       dates_str
FROM patterns
""",
)
def q37b_stairstep_down(spark: SparkSession, sf_dir: str) -> DataFrame:
    adj = _adjusted(spark, sf_dir, long_ticker=True)
    ind = compute_indicators(adj, assume_non_null=True)
    ev = hvc_events(ind, adj, threshold=HVC_THRESHOLD)
    pat = stairstep_patterns(
        ev, adj.select("ticker", "date", "close"),
        min_steps=STAIRSTEP_MIN_STEPS, direction="down",
    )
    return pat.select(
        _ticker_str(),
        "start_date",
        "end_date",
        "hvc_count",
        stable_round(F.col("first_close"), 6).alias("first_close"),
        stable_round(F.col("last_close"), 6).alias("last_close"),
        stable_round(F.col("gain_pct"), 6).alias("gain_pct"),
        "dates_str",
    )


@register(
    "q38_best_pattern",
    doc="Per-ticker best stair-step pattern: most steps, earliest start "
    "(D4, metadata.json:335-456) — ranked dedup over pattern mining.",
    oracle=f"""
WITH {INDICATORS_CTE},
{_STAIRSTEP_BODY.format(cmp='>')},
ranked_p AS (
  SELECT *, row_number() OVER (PARTITION BY ticker
             ORDER BY hvc_count DESC, start_date ASC) AS rn
  FROM patterns
)
SELECT ticker, start_date, end_date, hvc_count,
       ROUND((last_close - first_close) / first_close * 100.0 + 5e-9, 6) AS gain_pct
FROM ranked_p WHERE rn = 1
""",
)
def q38_best_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    adj = _adjusted(spark, sf_dir, long_ticker=True)
    ind = compute_indicators(adj, assume_non_null=True)
    ev = hvc_events(ind, adj, threshold=HVC_THRESHOLD)
    pat = stairstep_patterns(
        ev, adj.select("ticker", "date", "close"),
        min_steps=STAIRSTEP_MIN_STEPS, direction="up",
    )
    return best_patterns(pat).select(
        _ticker_str(),
        "start_date",
        "end_date",
        "hvc_count",
        stable_round(F.col("gain_pct"), 6).alias("gain_pct"),
    )


# ---------------------------------------------------------------------------
# CS/ETF-segmented faces of the published gold surface (VERDICT r8 item 5).
# The reference publishes every HVC analytic twice — `*_stocks` and `*_etfs`
# (metadata.json databases.hvcs, 12 tables); the split is a one-column
# dimension (ticker type) broadcast semi-joined against the type-agnostic
# result, exactly what sql.py::register_reference_gold_views serves and
# run_gold persists as view DDL. These catalog entries pin that mechanism
# against a DuckDB oracle on the derived universe (finance.py::META_CTE).
# ---------------------------------------------------------------------------

_HVC_SEGMENT_SELECT = f"""
SELECT date, ticker,
       ROUND(volume / volume_ma_20 + 5e-9, 6) AS volume_avg_ratio,
       volume,
       volume_ma_20 AS volume_avg
FROM ind
WHERE volume_ma_20 IS NOT NULL
  AND volume / volume_ma_20 >= {HVC_THRESHOLD}
  AND ticker IN (SELECT ticker FROM meta WHERE type = '{{t}}')
"""


def _hvc_events_segmented(
    spark: SparkSession, sf_dir: str, ticker_type: str
) -> DataFrame:
    from tickerlake_spark.plans.finance import ticker_universe

    adj = _adjusted(spark, sf_dir, long_ticker=True)
    ind = compute_indicators(adj, assume_non_null=True)
    ev = hvc_events(ind, adj, threshold=HVC_THRESHOLD)
    seg = ev.join(
        F.broadcast(ticker_universe(spark, sf_dir, ticker_type)),
        "ticker",
        "left_semi",
    )
    return seg.select(
        "date",
        _ticker_str(),
        stable_round(F.col("volume_avg_ratio"), 6).alias("volume_avg_ratio"),
        "volume",
        "volume_avg",
    )


@register(
    "q36s_hvc_events_stocks",
    doc="daily_high_volume_closes_STOCKS: the published CS-segmented HVC "
    "face (metadata.json:9-67) — type dimension broadcast semi-joined "
    "against the D1 analytic; zero extra fact shuffles.",
    oracle=f"""
WITH {INDICATORS_CTE},
{META_CTE}
{_HVC_SEGMENT_SELECT.format(t='CS')}
""",
)
def q36s_hvc_events_stocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _hvc_events_segmented(spark, sf_dir, "CS")


@register(
    "q36e_hvc_events_etfs",
    doc="daily_high_volume_closes_ETFS: the published ETF-segmented HVC "
    "face (metadata.json:69-128).",
    oracle=f"""
WITH {INDICATORS_CTE},
{META_CTE}
{_HVC_SEGMENT_SELECT.format(t='ETF')}
""",
)
def q36e_hvc_events_etfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _hvc_events_segmented(spark, sf_dir, "ETF")


@register(
    "q38s_best_pattern_stocks",
    doc="stairstepping_summary_STOCKS: the published CS-segmented best-"
    "pattern face (metadata.json:335-456) — segmentation of a per-ticker "
    "summary commutes with the rank-1 dedup, so the semi-join runs on the "
    "tiny summary, not the pattern mining.",
    oracle=f"""
WITH {INDICATORS_CTE},
{META_CTE},
{_STAIRSTEP_BODY.format(cmp='>')},
ranked_p AS (
  SELECT *, row_number() OVER (PARTITION BY ticker
             ORDER BY hvc_count DESC, start_date ASC) AS rn
  FROM patterns
)
SELECT ticker, start_date, end_date, hvc_count,
       ROUND((last_close - first_close) / first_close * 100.0 + 5e-9, 6) AS gain_pct
FROM ranked_p
WHERE rn = 1 AND ticker IN (SELECT ticker FROM meta WHERE type = 'CS')
""",
)
def q38s_best_pattern_stocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.plans.finance import ticker_universe

    adj = _adjusted(spark, sf_dir, long_ticker=True)
    ind = compute_indicators(adj, assume_non_null=True)
    ev = hvc_events(ind, adj, threshold=HVC_THRESHOLD)
    pat = stairstep_patterns(
        ev, adj.select("ticker", "date", "close"),
        min_steps=STAIRSTEP_MIN_STEPS, direction="up",
    )
    best = best_patterns(pat).join(
        F.broadcast(ticker_universe(spark, sf_dir, "CS")), "ticker", "left_semi"
    )
    return best.select(
        _ticker_str(),
        "start_date",
        "end_date",
        "hvc_count",
        stable_round(F.col("gain_pct"), 6).alias("gain_pct"),
    )


@register(
    "q39_epoch_ms_roundtrip",
    doc="Epoch-millis <-> date scalar transforms (F1, the bronze ingest "
    "transform at bronze/transformers.py:43-77).",
    oracle="""
SELECT event_id,
       epoch_ms(ts) AS ms,
       CAST(ts AS DATE) AS d,
       CAST(year(ts) AS BIGINT) AS yr
FROM events
""",
)
def q39_epoch_ms_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.plans.catalog import load_table

    e = load_table(spark, sf_dir, "events")
    ts_ltz = F.col("ts").cast("timestamp")
    return e.select(
        "event_id",
        F.unix_millis(ts_ltz).alias("ms"),
        F.col("ts").cast("date").alias("d"),
        F.year("ts").cast("long").alias("yr"),
    )


@register(
    "q109_calendar_gap_fill",
    doc="Calendar densification + forward fill (operators/gapfill.py): every "
    "ticker gets a row for every trading date in its [min, max] span, "
    "close carried forward (last non-null over a running window), volume "
    "zero-filled, synthesized rows flagged. The calendar and per-ticker "
    "spans are broadcast dims; bars shuffle once on ticker for both the "
    "grid join and the fill window.",
    oracle=f"""
WITH {BARS_CTE},
-- deterministic ~1/4 ticker subset: the operator path is identical, the
-- correctness-gate result stays hash-comparable at a fraction of the rows
bars_sub AS (SELECT * FROM bars WHERE substr(md5(ticker), 1, 1) IN ('0','1','2','3')),
cal AS (SELECT DISTINCT date FROM bars_sub),
span AS (SELECT ticker, MIN(date) AS d0, MAX(date) AS d1 FROM bars_sub GROUP BY ticker),
grid AS (
  SELECT s.ticker, c.date FROM span s JOIN cal c ON c.date BETWEEN s.d0 AND s.d1
),
j AS (
  SELECT g.ticker, g.date, b.close, b.volume
  FROM grid g LEFT JOIN bars_sub b ON b.ticker = g.ticker AND b.date = g.date
)
SELECT ticker, date,
       last_value(close IGNORE NULLS) OVER (
         PARTITION BY ticker ORDER BY date
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS close,
       COALESCE(volume, 0) AS volume,
       (close IS NULL) AS is_filled
FROM j
""",
)
def q109_calendar_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.gapfill import forward_fill_calendar

    bars = (
        stock_bars(spark, sf_dir)
        .filter(F.substring(F.md5("ticker"), 1, 1).isin("0", "1", "2", "3"))
        .select("ticker", "date", "close", "volume")
    )
    return forward_fill_calendar(
        bars, key_col="ticker", date_col="date",
        fill_cols=("close",), zero_cols=("volume",),
    ).select("ticker", "date", "close", "volume", "is_filled")
