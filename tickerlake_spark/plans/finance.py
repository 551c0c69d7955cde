"""Finance-shaped fixtures derived from the driver's TPC-H-ish tables.

The reference's domain is (ticker, date) OHLCV bars + splits; the driver's
correctness tables are TPC-H-ish. This module derives a deterministic stock
universe from them — identically in Spark and in the DuckDB oracle SQL — so
the finance operators (split adjustment, resample, indicators, VWAP, HVC)
are oracle-checkable end-to-end:

- ticker     := l_suppkey as string
- daily bar  := per (ticker, shipdate): open/close = first/last extendedprice
                under the total order (orderkey, linenumber, price, qty),
                high/low = max/min price, volume = sum quantity,
                transactions = row count
- splits     := suppkey % 3 == 0 -> 1:2 forward split on 1998-06-15,
                suppkey % 5 == 0 -> 5:1 reverse split on 1999-09-01
                (suppkey % 15 gets both -> exercises the stacked-split
                product path; ratios 0.5 / 5.0 are exactly representable so
                the truncating volume division is reproducible cross-engine)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tickerlake_spark.plans.catalog import load_table

__all__ = [
    "stock_bars",
    "stock_splits",
    "BARS_CTE",
    "ADJUSTED_CTE",
    "INDICATORS_CTE",
    "resampled_indicators_cte",
]


def stock_bars(
    spark: SparkSession, sf_dir: str, *, long_ticker: bool = False
) -> DataFrame:
    """Daily OHLCV bars derived from lineitem (see module docstring).

    The first/last tie-break order is (orderkey, linenumber, price, qty), but
    (orderkey, linenumber) is already lineitem's primary key, so the total
    order collapses to the single long ``orderkey * 10 + linenumber``
    (linenumber ∈ 1..7). That keeps the min_by/max_by aggregation buffer a
    fixed-width primitive, so the groupBy plans as HashAggregate — a
    struct-typed ordering key would force SortAggregate, adding a full
    per-partition sort on both sides of the shuffle, pure waste at 100 TB.

    ``long_ticker=True`` keeps the ticker as the raw bigint ``l_suppkey``
    instead of its string form. The cast is injective, so every downstream
    grouping / join / window partitioned on ticker produces identical groups
    — but the shuffle writes 8-byte longs instead of variable-length UTF8
    and every hash/sort comparison is a primitive compare (guide §2.3:
    shuffle narrower types). Callers cast back to string in their FINAL
    projection, after all shuffles and sorts, so declared query output is
    byte-identical.
    """
    li = load_table(spark, sf_dir, "lineitem")
    order_key = (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("long")
    ticker = F.col("l_suppkey") if long_ticker else F.col("l_suppkey").cast("string")
    return (
        li.select(
            ticker.alias("ticker"),
            F.col("l_shipdate").cast("date").alias("date"),
            F.col("l_extendedprice").alias("price"),
            F.col("l_quantity").alias("qty"),
            order_key.alias("__ord"),
        )
        # ONE shuffle for the whole downstream finance chain: hash on ticker
        # alone satisfies the (ticker, date) groupBy here AND every consumer
        # — resample groupBys, indicator/VWAP windows all cluster on ticker
        # (subset rule: hashpartitioning(ticker) ⊆ their clustering keys), so
        # none of them re-exchanges the bars. Trade-off, measured: both agg
        # phases plan ABOVE this explicit exchange (raw rows shuffle), but
        # (ticker, date) groups are near-singleton (533k bars from 600k rows
        # at sf0.1), so a map-side partial would compress ~nothing while a
        # (ticker, date)-keyed exchange would force every downstream window
        # to re-shuffle — the one-exchange shape wins at any scale where
        # bars/day ~ tickers.
        .repartition(F.col("ticker"))
        .groupBy("ticker", "date")
        .agg(
            F.min_by("price", "__ord").alias("open"),
            F.max("price").alias("high"),
            F.min("price").alias("low"),
            F.max_by("price", "__ord").alias("close"),
            F.sum("qty").cast("long").alias("volume"),
            F.count("*").alias("transactions"),
        )
    )


def stock_splits(
    spark: SparkSession, sf_dir: str, *, long_ticker: bool = False
) -> DataFrame:
    """Deterministic splits table derived from supplier keys.

    ``long_ticker`` must match the bars side so the broadcast join key has
    one type (see ``stock_bars``)."""
    s = load_table(spark, sf_dir, "supplier")

    def key() -> F.Column:
        return F.col("s_suppkey") if long_ticker else F.col("s_suppkey").cast("string")

    fwd = s.filter(F.col("s_suppkey") % 3 == 0).select(
        key().alias("ticker"),
        F.lit("1998-06-15").cast("date").alias("execution_date"),
        F.lit(1.0).cast("double").alias("split_from"),
        F.lit(2.0).cast("double").alias("split_to"),
    )
    rev = s.filter(F.col("s_suppkey") % 5 == 0).select(
        key().alias("ticker"),
        F.lit("1999-09-01").cast("date").alias("execution_date"),
        F.lit(5.0).cast("double").alias("split_from"),
        F.lit(1.0).cast("double").alias("split_to"),
    )
    return fwd.unionByName(rev)


# ---------------------------------------------------------------------------
# DuckDB oracle CTEs mirroring the derivations above. Composable: oracles do
# f"WITH {BARS_CTE} SELECT ..." / f"WITH {ADJUSTED_CTE} SELECT ...".
# ---------------------------------------------------------------------------

BARS_CTE = """
ranked AS (
  SELECT CAST(l_suppkey AS VARCHAR) AS ticker,
         CAST(l_shipdate AS DATE) AS date,
         l_extendedprice AS price,
         l_quantity AS qty,
         row_number() OVER (PARTITION BY l_suppkey, CAST(l_shipdate AS DATE)
             ORDER BY l_orderkey ASC, l_linenumber ASC,
                      l_extendedprice ASC, l_quantity ASC) AS rn_a,
         row_number() OVER (PARTITION BY l_suppkey, CAST(l_shipdate AS DATE)
             ORDER BY l_orderkey DESC, l_linenumber DESC,
                      l_extendedprice DESC, l_quantity DESC) AS rn_d
  FROM lineitem
),
bars AS (
  SELECT ticker, date,
         MAX(CASE WHEN rn_a = 1 THEN price END) AS open,
         MAX(price) AS high,
         MIN(price) AS low,
         MAX(CASE WHEN rn_d = 1 THEN price END) AS close,
         CAST(SUM(qty) AS BIGINT) AS volume,
         COUNT(*) AS transactions
  FROM ranked
  GROUP BY ticker, date
),
splits AS (
  SELECT CAST(s_suppkey AS VARCHAR) AS ticker,
         DATE '1998-06-15' AS execution_date,
         CAST(1.0 AS DOUBLE) AS split_from,
         CAST(2.0 AS DOUBLE) AS split_to
  FROM supplier WHERE s_suppkey % 3 = 0
  UNION ALL
  SELECT CAST(s_suppkey AS VARCHAR),
         DATE '1999-09-01',
         CAST(5.0 AS DOUBLE),
         CAST(1.0 AS DOUBLE)
  FROM supplier WHERE s_suppkey % 5 = 0
)"""

ADJUSTED_CTE = (
    BARS_CTE
    + """,
sj AS (
  SELECT b.*,
         CASE WHEN b.date < s.execution_date
              THEN s.split_from / s.split_to ELSE 1.0 END AS factor
  FROM bars b LEFT JOIN splits s ON b.ticker = s.ticker
),
adjusted AS (
  SELECT ticker, date,
         MIN(open)  * PRODUCT(factor) AS open,
         MIN(high)  * PRODUCT(factor) AS high,
         MIN(low)   * PRODUCT(factor) AS low,
         MIN(close) * PRODUCT(factor) AS close,
         CAST(FLOOR(MIN(volume) / PRODUCT(factor)) AS BIGINT) AS volume,
         CAST(FLOOR(MIN(transactions) / PRODUCT(factor)) AS BIGINT) AS transactions
  FROM sj
  GROUP BY ticker, date
)"""
)

# Indicator tail, parameterized on the OHLCV source CTE name so the same
# derivation runs over daily `adjusted` bars or a weekly/monthly resample
# (reference metadata.json:69-188 declares HVC faces per timeframe).
_IND_TAIL = """,
with_tr AS (
  SELECT ticker, date, close, volume,
         CASE WHEN lag(close) OVER wt IS NULL THEN high - low
              ELSE GREATEST(high - low,
                            ABS(high - lag(close) OVER wt),
                            ABS(low  - lag(close) OVER wt)) END AS tr
  FROM {src}
  WINDOW wt AS (PARTITION BY ticker ORDER BY date ASC)
),
ind AS (
  SELECT ticker, date, volume,
         CASE WHEN COUNT(close) OVER w20 = 20 THEN AVG(close) OVER w20 END AS sma_20,
         CASE WHEN COUNT(close) OVER w50 = 50 THEN AVG(close) OVER w50 END AS sma_50,
         CASE WHEN COUNT(close) OVER w200 = 200 THEN AVG(close) OVER w200 END AS sma_200,
         CASE WHEN COUNT(tr) OVER w14 = 14 THEN AVG(tr) OVER w14 END AS atr_14,
         CAST(FLOOR(CASE WHEN COUNT(volume) OVER w20 = 20
                         THEN AVG(volume) OVER w20 END) AS BIGINT) AS volume_ma_20
  FROM with_tr
  WINDOW
    w20  AS (PARTITION BY ticker ORDER BY date ASC ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
    w50  AS (PARTITION BY ticker ORDER BY date ASC ROWS BETWEEN 49 PRECEDING AND CURRENT ROW),
    w200 AS (PARTITION BY ticker ORDER BY date ASC ROWS BETWEEN 199 PRECEDING AND CURRENT ROW),
    w14  AS (PARTITION BY ticker ORDER BY date ASC ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)"""

INDICATORS_CTE = ADJUSTED_CTE + _IND_TAIL.format(src="adjusted")


def resampled_indicators_cte(unit: str) -> str:
    """ADJUSTED_CTE + a {unit}-truncated OHLCV resample + the indicator tail
    over the resampled bars — the oracle for weekly/monthly HVC faces."""
    resample = f""",
res AS (
  SELECT ticker, CAST(date_trunc('{unit}', date) AS DATE) AS date,
         arg_min(open, date) AS open,
         MAX(high) AS high,
         MIN(low) AS low,
         arg_max(close, date) AS close,
         CAST(SUM(volume) AS BIGINT) AS volume
  FROM adjusted
  GROUP BY 1, 2
)"""
    return ADJUSTED_CTE + resample + _IND_TAIL.format(src="res")


def ticker_universe(
    spark: SparkSession, sf_dir: str, ticker_type: str, *, long_ticker: bool = False
) -> DataFrame:
    """Derived ticker metadata universe: suppkey % 10 == 0 -> ETF, else CS
    (the same ~10% ETF share the e2e corpus uses). The segmented faces of
    the published gold surface (reference: metadata.json databases.hvcs —
    ``*_stocks`` / ``*_etfs``) are this one-column dimension broadcast
    semi-joined against the type-agnostic analytic."""
    s = load_table(spark, sf_dir, "supplier")
    key = F.col("s_suppkey") if long_ticker else F.col("s_suppkey").cast("string")
    return (
        s.select(
            key.alias("ticker"),
            F.when(F.col("s_suppkey") % 10 == 0, "ETF")
            .otherwise("CS")
            .alias("type"),
        )
        .filter(F.col("type") == ticker_type)
        .select("ticker")
    )


META_CTE = """meta AS (
  SELECT CAST(s_suppkey AS VARCHAR) AS ticker,
         CASE WHEN s_suppkey % 10 = 0 THEN 'ETF' ELSE 'CS' END AS type
  FROM supplier
)"""
