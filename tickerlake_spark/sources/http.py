"""HTTP MarketSource: a concrete paginated REST provider.

The reference talks to the Polygon.io REST API through a vendor SDK
(reference: src/tickerlake/clients.py:8-10), fetching three feeds:

- grouped daily OHLCV bars, one date -> all tickers
  (reference: bronze/main.py:81-100, bronze/transformers.py:10-40)
- the ticker reference list, server-side paginated
  (reference: bronze/tickers.py:13-59)
- split events since a horizon date, server-side paginated
  (reference: bronze/splits.py:15-52)

This module is the same capability without the SDK: plain urllib against the
documented public REST shapes, with the transport INJECTED so every code
path (pagination, field mapping, the 403 subscription-horizon stop) is
testable offline — the sandbox has no network, and unit tests should never
have one anyway (modeled on reference tests/test_bronze_download.py:14-44).

All of this is driver-side I/O: the cluster only ever sees the resulting
row lists via ``spark.createDataFrame`` (or the PySpark 4 DataSource in
sources/datasource.py, which partitions one fetch per date across
executors and accepts any MarketSource, including this one).
"""

from __future__ import annotations

import datetime as dt
import json
import urllib.error
import urllib.parse
import urllib.request
from collections.abc import Callable

from tickerlake_spark.sources.market import ApiLimitReached

__all__ = ["HttpMarketSource", "urllib_transport"]

# A transport takes a fully-formed URL and returns the parsed JSON body.
Transport = Callable[[str], dict]


def urllib_transport(api_key: str, timeout: float = 30.0) -> Transport:
    """Default transport: urllib GET with bearer auth.

    HTTP 403 raises ApiLimitReached so the scheduler's stop-on-limit path
    (sources/market.py fetch_dates_parallel) engages exactly as it does for
    the reference's subscription-horizon errors.
    """

    def fetch(url: str) -> dict:
        req = urllib.request.Request(
            url, headers={"Authorization": f"Bearer {api_key}"}
        )
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return json.loads(resp.read().decode("utf-8"))
        except urllib.error.HTTPError as err:
            if err.code == 403:
                raise ApiLimitReached(f"403 Forbidden: {url}") from err
            raise

    return fetch


class HttpMarketSource:
    """MarketSource over the public REST endpoints, pagination included.

    Pagination follows the response's ``next_url`` cursor until absent —
    the same contract the reference's SDK iterators hide
    (reference: bronze/tickers.py:44-50 ``list_tickers(..., limit=1000)``).
    """

    def __init__(
        self,
        transport: Transport,
        base_url: str = "https://api.polygon.io",
        page_limit: int = 1000,
    ) -> None:
        self._fetch = transport
        self._base = base_url.rstrip("/")
        self._limit = page_limit

    # -- pagination -------------------------------------------------------

    def _pages(self, first_url: str):
        url = first_url
        while url:
            body = self._fetch(url)
            yield body
            url = body.get("next_url")
            # Cursor URLs from the server may omit the scheme/host or the
            # auth query param; re-anchor relative cursors on our base.
            if url and url.startswith("/"):
                url = self._base + url

    # -- feeds ------------------------------------------------------------

    def grouped_daily(self, date: dt.date) -> list[dict]:
        """One date -> all tickers' unadjusted OHLCV bars.

        Response rows use the short keys T/v/o/c/h/l/t/n; mapped to the
        canonical row dicts the pipeline ingests
        (reference: bronze/transformers.py:29-40).
        """
        url = (
            f"{self._base}/v2/aggs/grouped/locale/us/market/stocks/"
            f"{date.isoformat()}?adjusted=false&include_otc=false"
        )
        body = self._fetch(url)
        return [
            {
                "ticker": r["T"],
                "volume": int(r["v"]),
                "open": float(r["o"]),
                "close": float(r["c"]),
                "high": float(r["h"]),
                "low": float(r["l"]),
                "window_start": int(r["t"]),
                "transactions": int(r.get("n") or 0),
            }
            for r in body.get("results", [])
        ]

    def tickers(self) -> list[dict]:
        """Active stock tickers, all pages (reference: bronze/tickers.py:33-57)."""
        params = urllib.parse.urlencode(
            {
                "market": "stocks",
                "active": "true",
                "order": "asc",
                "sort": "ticker",
                "limit": self._limit,
            }
        )
        rows: list[dict] = []
        for body in self._pages(f"{self._base}/v3/reference/tickers?{params}"):
            for t in body.get("results", []):
                rows.append(
                    {
                        "ticker": t.get("ticker"),
                        "name": t.get("name"),
                        "type": t.get("type"),
                        "active": t.get("active", True),
                        "locale": t.get("locale"),
                        "market": t.get("market", "stocks"),
                        "primary_exchange": t.get("primary_exchange"),
                        "currency_name": t.get("currency_name"),
                        "currency_symbol": t.get("currency_symbol"),
                        "cik": t.get("cik"),
                        "composite_figi": t.get("composite_figi"),
                        "share_class_figi": t.get("share_class_figi"),
                        "base_currency_name": t.get("base_currency_name"),
                        "base_currency_symbol": t.get("base_currency_symbol"),
                        "delisted_utc": t.get("delisted_utc"),
                        "last_updated_utc": t.get("last_updated_utc"),
                    }
                )
        return rows

    def splits(self, since: dt.date) -> list[dict]:
        """Split events with execution_date >= since, all pages
        (reference: bronze/splits.py:25-36)."""
        params = urllib.parse.urlencode(
            {
                "execution_date.gte": since.isoformat(),
                "order": "asc",
                "sort": "execution_date",
                "limit": self._limit,
            }
        )
        rows: list[dict] = []
        for body in self._pages(f"{self._base}/v3/reference/splits?{params}"):
            for s in body.get("results", []):
                rows.append(
                    {
                        "id": s.get("id"),
                        "ticker": s["ticker"],
                        "execution_date": dt.date.fromisoformat(
                            s["execution_date"]
                        ),
                        "split_from": float(s["split_from"]),
                        "split_to": float(s["split_to"]),
                    }
                )
        return rows
