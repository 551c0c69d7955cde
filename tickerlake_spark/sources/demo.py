"""Deterministic offline MarketSource — 8 tickers, hash-derived prices.

Importable by executors (needed by the Python DataSource, whose ``read``
runs remotely), and by the CLI's ``--demo`` mode. All values derive from
md5(ticker|date), so any process reconstructs identical data with no
shared state — exactly the property a distributed source factory needs.
"""

from __future__ import annotations

import datetime as dt
import hashlib

from tickerlake_spark.sources.calendar import trading_days
from tickerlake_spark.sources.market import InMemoryMarketSource

__all__ = ["demo_source", "DEMO_TICKERS"]

DEMO_TICKERS = ["AAPL", "MSFT", "NVDA", "AMZN", "GOOG", "META", "TSLA", "SPY"]


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def demo_bars_for_date(d: dt.date) -> list[dict]:
    """Raw API-shaped rows (epoch-ms window_start) for one date."""
    ms = int(
        dt.datetime(d.year, d.month, d.day, tzinfo=dt.timezone.utc).timestamp() * 1000
    )
    rows = []
    for t in DEMO_TICKERS:
        base = 50.0 + (_h(t) % 400)
        wiggle = (_h(f"{t}|{d}") % 1000) / 100.0
        close = base + wiggle
        rows.append(
            {
                "ticker": t,
                "window_start": ms,
                "open": close - 1.0,
                "high": close + 2.0,
                "low": close - 2.5,
                "close": close,
                "volume": 1_000_000 + _h(f"v|{t}|{d}") % 5_000_000,
                "transactions": 1000 + _h(f"t|{t}|{d}") % 9000,
            }
        )
    return rows


def demo_source(start: dt.date | str, end: dt.date | str) -> InMemoryMarketSource:
    """Offline MarketSource over [start, end] trading days (accepts ISO
    strings so it can be constructed from DataSource options)."""
    if isinstance(start, str):
        start = dt.date.fromisoformat(start)
    if isinstance(end, str):
        end = dt.date.fromisoformat(end)
    bars_by_date = {d: demo_bars_for_date(d) for d in trading_days(start, end)}
    ticker_rows = [
        {
            "ticker": t,
            "name": f"{t} Inc",
            "type": "CS" if t != "SPY" else "ETF",
            "primary_exchange": "XNAS",
            "active": True,
            "cik": str(1000 + i),
        }
        for i, t in enumerate(DEMO_TICKERS)
    ]
    mid = start + (end - start) / 2
    split_rows = [
        {
            "id": "demo-split-1",
            "ticker": "NVDA",
            "execution_date": mid,
            "split_from": 1.0,
            "split_to": 4.0,
        }
    ]
    return InMemoryMarketSource(bars_by_date, ticker_rows, split_rows)
