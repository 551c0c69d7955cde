from tickerlake_spark.sources.calendar import trading_days
from tickerlake_spark.sources.market import (
    ApiLimitReached,
    InMemoryMarketSource,
    MarketSource,
    classify_fetch_error,
)

__all__ = [
    "trading_days",
    "MarketSource",
    "InMemoryMarketSource",
    "ApiLimitReached",
    "classify_fetch_error",
]
