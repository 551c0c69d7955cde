"""Schema catalog + permissive conform casts.

Mirrors the reference's hand-declared Polars schemas
(reference: src/tickerlake/schemas.py:12-102) widened to Spark types:

- Polars ``Categorical`` -> StringType (Parquet dictionary encoding recovers
  the storage win; semantics are plain string).
- Polars ``UInt64``/``UInt32`` -> LongType (Spark has no unsigned ints; the
  reference's truncating unsigned casts are reproduced by
  ``functions.core.floor_div_long``).
- bronze keeps float32 OHLC; silver/gold upcast to float64
  (reference: schemas.py:15-18 vs 68-71).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DateType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = [
    "STOCKS_RAW",
    "STOCKS",
    "TICKERS",
    "SPLITS",
    "TICKER_METADATA",
    "AGGREGATES",
    "INDICATORS",
    "VWAP_SIGNALS",
    "HVC_EVENTS",
    "STAIRSTEP_PATTERNS",
    "conform",
]


def _schema(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


# bronze.stocks as fetched from the grouped-daily REST endpoint, before the
# epoch-ms -> date transform (reference: bronze/transformers.py:43-77).
STOCKS_RAW = _schema(
    ("ticker", StringType()),
    ("volume", LongType()),
    ("open", FloatType()),
    ("close", FloatType()),
    ("high", FloatType()),
    ("low", FloatType()),
    ("window_start", LongType()),  # epoch millis
    ("transactions", LongType()),
)

# bronze.stocks at rest (reference: schemas.py:23-32); Hive-partitioned by date.
STOCKS = _schema(
    ("ticker", StringType()),
    ("volume", LongType()),
    ("open", FloatType()),
    ("close", FloatType()),
    ("high", FloatType()),
    ("low", FloatType()),
    ("date", DateType()),
    ("transactions", LongType()),
)

# bronze.tickers (reference: schemas.py:42-59).
TICKERS = _schema(
    ("ticker", StringType()),
    ("name", StringType()),
    ("market", StringType()),
    ("locale", StringType()),
    ("primary_exchange", StringType()),
    ("type", StringType()),
    ("active", BooleanType()),
    ("currency_name", StringType()),
    ("currency_symbol", StringType()),
    ("cik", StringType()),
    ("composite_figi", StringType()),
    ("share_class_figi", StringType()),
    ("base_currency_name", StringType()),
    ("base_currency_symbol", StringType()),
    ("delisted_utc", StringType()),
    ("last_updated_utc", StringType()),
)

# bronze.splits (reference: schemas.py:34-40).
SPLITS = _schema(
    ("id", StringType()),
    ("execution_date", DateType()),
    ("split_from", FloatType()),
    ("split_to", FloatType()),
    ("ticker", StringType()),
)

# silver.ticker_metadata (reference: silver/incremental.py:229).
TICKER_METADATA = _schema(
    ("ticker", StringType()),
    ("name", StringType()),
    ("type", StringType()),
    ("primary_exchange", StringType()),
    ("active", BooleanType()),
    ("cik", StringType()),
)

# silver.{daily,weekly,monthly}_aggregates (reference: schemas.py:65-74).
AGGREGATES = _schema(
    ("ticker", StringType()),
    ("date", DateType()),
    ("open", DoubleType()),
    ("high", DoubleType()),
    ("low", DoubleType()),
    ("close", DoubleType()),
    ("volume", LongType()),
    ("transactions", LongType()),
)

# silver.{daily,weekly,monthly}_indicators (reference: schemas.py:76-85).
INDICATORS = _schema(
    ("ticker", StringType()),
    ("date", DateType()),
    ("sma_20", DoubleType()),
    ("sma_50", DoubleType()),
    ("sma_200", DoubleType()),
    ("atr_14", DoubleType()),
    ("volume_ma_20", LongType()),
    ("volume_ratio", DoubleType()),
)

# gold.vwap_signals (reference: schemas.py:92-102).
VWAP_SIGNALS = _schema(
    ("ticker", StringType()),
    ("date", DateType()),
    ("close", DoubleType()),
    ("ytd_vwap", DoubleType()),
    ("qtd_vwap", DoubleType()),
    ("above_ytd_vwap", BooleanType()),
    ("above_qtd_vwap", BooleanType()),
    ("above_both", BooleanType()),
    ("calculated_at", TimestampType()),
)

# gold HVC events (declared-only analytics, reference: metadata.json:9-67).
HVC_EVENTS = _schema(
    ("date", DateType()),
    ("ticker", StringType()),
    ("volume_avg_ratio", DoubleType()),
    ("volume", LongType()),
    ("volume_avg", LongType()),
)

# gold stair-step patterns (reference: metadata.json:189-334).
STAIRSTEP_PATTERNS = _schema(
    ("ticker", StringType()),
    ("start_date", DateType()),
    ("end_date", DateType()),
    ("hvc_count", LongType()),
    ("first_close", DoubleType()),
    ("last_close", DoubleType()),
    ("gain_pct", DoubleType()),
    ("dates_str", StringType()),
    ("closes_str", StringType()),
)


def conform(df: DataFrame, schema: StructType) -> DataFrame:
    """Permissive cast to ``schema``: select schema columns in order, casting
    each; missing columns become typed nulls.

    Mirrors the reference's ``df.cast(SCHEMA, strict=False)``
    (reference: schemas.py:108-129). Casts that fail produce null (Spark ANSI
    mode is off by default for ``Column.cast``, matching the permissive
    behavior).
    """
    cols = []
    existing = set(df.columns)
    for field in schema.fields:
        if field.name in existing:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)
