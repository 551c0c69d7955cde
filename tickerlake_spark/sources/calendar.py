"""Trading-calendar utilities (driver-side).

The reference gets NYSE sessions from pandas_market_calendars
(reference: utils/calendar.py:13-116); that library is not available here,
so this is a self-contained implementation: weekdays minus the fixed-date
and nth-weekday NYSE holidays (computed rules), minus the ad-hoc full
closures the exchange has declared (mourning days, 9/11, Sandy), plus
half-day (13:00 ET early close) session support — the pieces mcal's
schedule() provides that a rules-only calendar misses.

``is_market_open`` / ``is_data_available`` mirror the reference's
market-status checks (reference: utils/calendar.py:36-116) with an
injectable clock so they are testable without freezing time.
"""

from __future__ import annotations

import datetime as dt
from zoneinfo import ZoneInfo

__all__ = [
    "trading_days",
    "is_trading_day",
    "nyse_holidays",
    "AD_HOC_CLOSURES",
    "early_close_dates",
    "nyse_schedule",
    "is_market_open",
    "is_data_available",
]

ET = ZoneInfo("America/New_York")

# Full-day closures declared by the exchange outside the holiday rules:
# national days of mourning, the 9/11 attacks, Hurricane Sandy. A rules
# calendar cannot derive these; they are maintained as data.
AD_HOC_CLOSURES: frozenset[dt.date] = frozenset(
    {
        dt.date(2001, 9, 11),  # September 11 attacks
        dt.date(2001, 9, 12),
        dt.date(2001, 9, 13),
        dt.date(2001, 9, 14),
        dt.date(2004, 6, 11),  # mourning: President Reagan
        dt.date(2007, 1, 2),   # mourning: President Ford
        dt.date(2012, 10, 29), # Hurricane Sandy
        dt.date(2012, 10, 30),
        dt.date(2018, 12, 5),  # mourning: President G.H.W. Bush
        dt.date(2025, 1, 9),   # mourning: President Carter
    }
)

REGULAR_OPEN = dt.time(9, 30)
REGULAR_CLOSE = dt.time(16, 0)
EARLY_CLOSE = dt.time(13, 0)


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
    return (
        d.weekday() < 5
        and d not in nyse_holidays(d.year)
        and d not in AD_HOC_CLOSURES
    )


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


def early_close_dates(year: int) -> set[dt.date]:
    """Half-day (13:00 ET close) sessions:

    - July 3, when it is a weekday and July 4 falls Tue-Fri (when July 4 is
      a Saturday, July 3 IS the observed holiday, not a half day);
    - the day after Thanksgiving (always a Friday);
    - Christmas Eve, when it is a trading day.
    """
    out: set[dt.date] = set()
    jul3 = dt.date(year, 7, 3)
    if jul3.weekday() < 5 and dt.date(year, 7, 4).weekday() in (1, 2, 3, 4):
        out.add(jul3)
    out.add(_nth_weekday(year, 11, 3, 4) + dt.timedelta(days=1))  # post-Thanksgiving
    dec24 = dt.date(year, 12, 24)
    if dec24.weekday() < 5 and is_trading_day(dec24):
        out.add(dec24)
    return {d for d in out if is_trading_day(d)}


def nyse_schedule(
    start: dt.date, end: dt.date
) -> list[tuple[dt.date, dt.datetime, dt.datetime]]:
    """(session date, open, close) per trading day in [start, end], both
    timestamps tz-aware America/New_York — the mcal ``schedule()`` analog
    (reference: utils/calendar.py:58-71), including 13:00 early closes."""
    out = []
    for d in trading_days(start, end):
        close = EARLY_CLOSE if d in early_close_dates(d.year) else REGULAR_CLOSE
        out.append(
            (
                d,
                dt.datetime.combine(d, REGULAR_OPEN, tzinfo=ET),
                dt.datetime.combine(d, close, tzinfo=ET),
            )
        )
    return out


def _now_et(now: dt.datetime | None) -> dt.datetime:
    if now is None:
        now = dt.datetime.now(dt.timezone.utc)
    return now.astimezone(ET)


def is_market_open(now: dt.datetime | None = None) -> bool:
    """True iff the NYSE is actively trading at ``now`` (default: current
    time). Early-close aware (reference: utils/calendar.py:36-71)."""
    t = _now_et(now)
    sched = nyse_schedule(t.date(), t.date())
    if not sched:
        return False
    _, mopen, mclose = sched[0]
    return mopen <= t <= mclose


def is_data_available(
    now: dt.datetime | None = None, settle: dt.timedelta = dt.timedelta(minutes=30)
) -> bool:
    """True iff today's bars should be published: today is a session, the
    market has closed, and ``settle`` has elapsed since the close
    (reference: utils/calendar.py:74-116)."""
    t = _now_et(now)
    sched = nyse_schedule(t.date(), t.date())
    if not sched:
        return False
    _, _, mclose = sched[0]
    return t - mclose >= settle
