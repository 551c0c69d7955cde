from tickerlake_spark.sources.calendar import trading_days
from tickerlake_spark.sources.http import HttpMarketSource, urllib_transport
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
    "HttpMarketSource",
    "urllib_transport",
    "ApiLimitReached",
    "classify_fetch_error",
]
