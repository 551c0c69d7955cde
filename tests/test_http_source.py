"""HTTP MarketSource: pagination, field mapping, 403 stop — all offline.

Modeled on the reference's download tests
(reference: tests/test_bronze_download.py:14-44), which fake the fetch layer
and assert the scheduler stops on the subscription-limit error. Here the
fake sits one level lower — the injected transport — so the real pagination
and mapping code runs.
"""

from __future__ import annotations

import datetime as dt
import io
import urllib.error

import pytest

from tickerlake_spark.sources.http import HttpMarketSource, urllib_transport
from tickerlake_spark.sources.market import ApiLimitReached, fetch_dates_parallel

BASE = "https://api.polygon.io"


def transport_from(pages: dict[str, dict]):
    """Transport serving canned JSON bodies keyed by exact URL."""
    seen: list[str] = []

    def fetch(url: str) -> dict:
        seen.append(url)
        if url not in pages:
            raise AssertionError(f"unexpected URL: {url}")
        body = pages[url]
        if isinstance(body, Exception):
            raise body
        return body

    fetch.seen = seen
    return fetch


def test_grouped_daily_maps_short_keys():
    url = f"{BASE}/v2/aggs/grouped/locale/us/market/stocks/2024-03-03?adjusted=false&include_otc=false"
    pages = {
        url: {
            "results": [
                {
                    "T": "AAPL",
                    "v": 1000,
                    "o": 10.0,
                    "c": 11.0,
                    "h": 12.0,
                    "l": 9.5,
                    "t": 1709424000000,
                    "n": 42,
                },
                # transactions key absent -> 0 (reference transformers.py:37)
                {"T": "MSFT", "v": 5, "o": 1, "c": 1, "h": 1, "l": 1, "t": 1709424000000},
            ]
        }
    }
    src = HttpMarketSource(transport_from(pages))
    rows = src.grouped_daily(dt.date(2024, 3, 3))
    assert rows[0] == {
        "ticker": "AAPL",
        "volume": 1000,
        "open": 10.0,
        "close": 11.0,
        "high": 12.0,
        "low": 9.5,
        "window_start": 1709424000000,
        "transactions": 42,
    }
    assert rows[1]["transactions"] == 0


def test_tickers_follows_next_url_pagination():
    first = (
        f"{BASE}/v3/reference/tickers?market=stocks&active=true&order=asc"
        f"&sort=ticker&limit=1000"
    )
    cursor = f"{BASE}/v3/reference/tickers?cursor=abc"
    pages = {
        first: {"results": [{"ticker": "AAPL", "name": "Apple"}], "next_url": cursor},
        cursor: {"results": [{"ticker": "MSFT", "name": "Microsoft"}]},
    }
    t = transport_from(pages)
    rows = HttpMarketSource(t).tickers()
    assert [r["ticker"] for r in rows] == ["AAPL", "MSFT"]
    assert rows[0]["market"] == "stocks"  # default applied
    assert t.seen == [first, cursor]


def test_splits_pagination_parses_dates_and_reanchors_relative_cursor():
    first = (
        f"{BASE}/v3/reference/splits?execution_date.gte=2020-01-01&order=asc"
        f"&sort=execution_date&limit=1000"
    )
    pages = {
        first: {
            "results": [
                {
                    "id": "s1",
                    "ticker": "AAPL",
                    "execution_date": "2020-08-31",
                    "split_from": 1,
                    "split_to": 4,
                }
            ],
            # relative cursor must be re-anchored on base_url
            "next_url": "/v3/reference/splits?cursor=xyz",
        },
        f"{BASE}/v3/reference/splits?cursor=xyz": {
            "results": [
                {
                    "id": "s2",
                    "ticker": "TSLA",
                    "execution_date": "2022-08-25",
                    "split_from": 1,
                    "split_to": 3,
                }
            ]
        },
    }
    rows = HttpMarketSource(transport_from(pages)).splits(dt.date(2020, 1, 1))
    assert [r["ticker"] for r in rows] == ["AAPL", "TSLA"]
    assert rows[0]["execution_date"] == dt.date(2020, 8, 31)
    assert rows[1]["split_to"] == 3.0


def test_scheduler_stops_on_limit_through_real_source():
    """fetch_dates_parallel + HttpMarketSource: a 403 on an older date stops
    scheduling, newest data survives (reference: test_bronze_download.py:14-44)."""

    def make_url(d: str) -> str:
        return (
            f"{BASE}/v2/aggs/grouped/locale/us/market/stocks/{d}"
            f"?adjusted=false&include_otc=false"
        )

    pages = {
        make_url("2024-03-03"): {
            "results": [
                {"T": "AAPL", "v": 1, "o": 1, "c": 1, "h": 1, "l": 1, "t": 0, "n": 1}
            ]
        },
        make_url("2024-03-02"): ApiLimitReached("403 Forbidden"),
        make_url("2024-03-01"): ApiLimitReached("403 Forbidden"),
    }
    src = HttpMarketSource(transport_from(pages))
    dates = [dt.date(2024, 3, 1), dt.date(2024, 3, 2), dt.date(2024, 3, 3)]
    # max_workers=1 => newest-first, strictly sequential: 03-03 lands, 03-02
    # hits the limit, 03-01 is never scheduled.
    results, limit_reached = fetch_dates_parallel(src, dates, max_workers=1)
    assert limit_reached is True
    assert list(results) == [dt.date(2024, 3, 3)]


def test_urllib_transport_maps_403_to_api_limit(monkeypatch):
    def fake_urlopen(req, timeout=None):
        raise urllib.error.HTTPError(
            req.full_url, 403, "Forbidden", hdrs=None, fp=io.BytesIO(b"")
        )

    monkeypatch.setattr("urllib.request.urlopen", fake_urlopen)
    fetch = urllib_transport("test-key")
    with pytest.raises(ApiLimitReached):
        fetch("https://api.polygon.io/v2/aggs/grouped/locale/us/market/stocks/2024-01-01")


def test_urllib_transport_passes_other_http_errors(monkeypatch):
    def fake_urlopen(req, timeout=None):
        raise urllib.error.HTTPError(
            req.full_url, 500, "Server Error", hdrs=None, fp=io.BytesIO(b"")
        )

    monkeypatch.setattr("urllib.request.urlopen", fake_urlopen)
    fetch = urllib_transport("test-key")
    with pytest.raises(urllib.error.HTTPError):
        fetch("https://api.polygon.io/v3/reference/tickers")
