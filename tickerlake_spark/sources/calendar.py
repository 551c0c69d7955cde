"""Trading-calendar utilities (driver-side).

The reference uses pandas_market_calendars for NYSE sessions
(reference: utils/calendar.py:13-116); that library is not available here,
so this is a self-contained approximation: weekdays minus the fixed-date and
nth-weekday NYSE holidays (computed, not hardcoded year lists). Good-faith
parity for scheduling; swap in an exchange-calendar library behind the same
function signature when packaging for production.
"""

from __future__ import annotations

import datetime as dt

__all__ = ["trading_days", "is_trading_day", "nyse_holidays"]


def _nth_weekday(year: int, month: int, weekday: int, n: int) -> dt.date:
    d = dt.date(year, month, 1)
    offset = (weekday - d.weekday()) % 7
    return d + dt.timedelta(days=offset + 7 * (n - 1))


def _last_weekday(year: int, month: int, weekday: int) -> dt.date:
    if month == 12:
        d = dt.date(year, 12, 31)
    else:
        d = dt.date(year, month + 1, 1) - dt.timedelta(days=1)
    return d - dt.timedelta(days=(d.weekday() - weekday) % 7)


def _easter(year: int) -> dt.date:
    # Anonymous Gregorian algorithm
    a, b, c = year % 19, year // 100, year % 100
    d, e = b // 4, b % 4
    f = (b + 8) // 25
    g = (b - f + 1) // 3
    h = (19 * a + b - d - g + 15) % 30
    i, k = c // 4, c % 4
    l = (32 + 2 * e + 2 * i - h - k) % 7
    m = (a + 11 * h + 22 * l) // 451
    month = (h + l - 7 * m + 114) // 31
    day = ((h + l - 7 * m + 114) % 31) + 1
    return dt.date(year, month, day)


def _observed(d: dt.date) -> dt.date | None:
    """Weekend-fixed-date holidays observe Fri/Mon; Saturday New Year
    pushes to prior year's Dec 31 (skip -> None, no trading impact here)."""
    if d.weekday() == 5:  # Sat -> Friday before
        return d - dt.timedelta(days=1)
    if d.weekday() == 6:  # Sun -> Monday after
        return d + dt.timedelta(days=1)
    return d


def nyse_holidays(year: int) -> set[dt.date]:
    hs: set[dt.date] = set()
    for fixed in (
        dt.date(year, 1, 1),   # New Year's Day
        dt.date(year, 6, 19),  # Juneteenth (since 2022)
        dt.date(year, 7, 4),   # Independence Day
        dt.date(year, 12, 25), # Christmas
    ):
        if fixed.month == 6 and year < 2022:
            continue
        obs = _observed(fixed)
        if obs is not None and obs.year == year:
            hs.add(obs)
    hs.add(_nth_weekday(year, 1, 0, 3))    # MLK: 3rd Monday Jan
    hs.add(_nth_weekday(year, 2, 0, 3))    # Presidents: 3rd Monday Feb
    hs.add(_easter(year) - dt.timedelta(days=2))  # Good Friday
    hs.add(_last_weekday(year, 5, 0))      # Memorial: last Monday May
    hs.add(_nth_weekday(year, 9, 0, 1))    # Labor: 1st Monday Sep
    hs.add(_nth_weekday(year, 11, 3, 4))   # Thanksgiving: 4th Thursday Nov
    return hs


def is_trading_day(d: dt.date) -> bool:
    return d.weekday() < 5 and d not in nyse_holidays(d.year)


def trading_days(start: dt.date, end: dt.date) -> list[dt.date]:
    """All NYSE trading days in [start, end] (reference:
    utils/calendar.py:13-33 -> mcal.valid_days)."""
    out = []
    d = start
    while d <= end:
        if is_trading_day(d):
            out.append(d)
        d += dt.timedelta(days=1)
    return out
