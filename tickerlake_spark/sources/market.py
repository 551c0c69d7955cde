"""Market-data source interface (the bronze ingestion boundary).

The reference fetches from the Polygon.io REST API with a thread pool and
an early-stop on 403 subscription-limit errors (reference:
bronze/main.py:153-205, bronze/transformers.py:80-103). That control flow is
driver-side I/O and stays driver-side here — the cluster only sees the
resulting frames. The source is a small protocol so tests (and offline runs)
inject frames without any network:

- ``MarketSource``: grouped_daily(date) / tickers() / splits(since)
- ``InMemoryMarketSource``: canned-data implementation for tests/offline
- ``fetch_dates_parallel``: thread-pool fan-out with FIRST_COMPLETED
  sliding window + stop-on-limit, mirroring the reference's scheduler
"""

from __future__ import annotations

import datetime as dt
from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait
from typing import Protocol

__all__ = [
    "MarketSource",
    "InMemoryMarketSource",
    "ApiLimitReached",
    "classify_fetch_error",
    "fetch_dates_parallel",
]


class ApiLimitReached(Exception):
    """Subscription history limit (HTTP 403 family) — stop scheduling."""


def classify_fetch_error(err: Exception) -> str:
    """'limit' for 403/Forbidden-family errors (stop fetching older dates),
    'transient' otherwise (skip the date, keep going).
    Reference: bronze/transformers.py:80-103."""
    msg = str(err)
    if isinstance(err, ApiLimitReached) or "403" in msg or "Forbidden" in msg:
        return "limit"
    return "transient"


class MarketSource(Protocol):
    """Provider of raw market data as lists of plain dicts (one per row)."""

    def grouped_daily(self, date: dt.date) -> list[dict]:
        """All tickers' OHLCV bars for one date (raw: epoch-ms window_start)."""
        ...

    def tickers(self) -> list[dict]:
        """Ticker reference metadata (paginated server-side)."""
        ...

    def splits(self, since: dt.date) -> list[dict]:
        """Split events with execution_date >= since."""
        ...


class InMemoryMarketSource:
    """Canned-data MarketSource for tests and offline pipeline runs."""

    def __init__(
        self,
        bars_by_date: dict[dt.date, list[dict]] | None = None,
        ticker_rows: list[dict] | None = None,
        split_rows: list[dict] | None = None,
        limit_before: dt.date | None = None,
    ) -> None:
        self._bars = bars_by_date or {}
        self._tickers = ticker_rows or []
        self._splits = split_rows or []
        self._limit_before = limit_before

    def grouped_daily(self, date: dt.date) -> list[dict]:
        if self._limit_before and date < self._limit_before:
            raise ApiLimitReached(f"403 Forbidden: history before {self._limit_before}")
        return self._bars.get(date, [])

    def tickers(self) -> list[dict]:
        return list(self._tickers)

    def splits(self, since: dt.date) -> list[dict]:
        return [r for r in self._splits if r["execution_date"] >= since]


def fetch_dates_parallel(
    source: MarketSource,
    dates: list[dt.date],
    max_workers: int = 4,
) -> tuple[dict[dt.date, list[dict]], bool]:
    """Fetch many dates newest-first with a sliding submission window.

    Returns (rows_by_date, limit_reached). On a 'limit' error, pending
    futures are cancelled and no older dates are scheduled — newest data
    wins when the subscription horizon is hit (reference:
    bronze/main.py:153-205).
    """
    ordered = sorted(dates, reverse=True)
    results: dict[dt.date, list[dict]] = {}
    limit_reached = False
    idx = 0
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        in_flight = {}
        while (idx < len(ordered) or in_flight) and not limit_reached:
            while idx < len(ordered) and len(in_flight) < max_workers:
                d = ordered[idx]
                in_flight[pool.submit(source.grouped_daily, d)] = d
                idx += 1
            done, _ = wait(in_flight, return_when=FIRST_COMPLETED)
            for fut in done:
                d = in_flight.pop(fut)
                try:
                    rows = fut.result()
                    if rows:
                        results[d] = rows
                except Exception as err:  # noqa: BLE001 - classified below
                    if classify_fetch_error(err) == "limit":
                        limit_reached = True
                    # transient errors: skip the date
        if limit_reached:
            for fut in in_flight:
                fut.cancel()
    return results, limit_reached
