"""Driver-side time math (pure Python, no Spark).

Behavioral parity targets in the reference (/root/reference):
- ``DeltaTime``                      -> src/database_extractor/database_extractor.py:29-88
- ``shift_string_time``              -> src/database_extractor/database_extractor.py:172-184
- ``construct_query_time_endpoints`` -> src/database_extractor/database_extractor.py:208-237
- ``timezone_offset``                -> src/database_extractor/database_extractor.py:358-366
- ``generate_datetime_list``         -> main.py:75-97
- day iteration (``iter_days``)      -> main.py:115-149 and
  src/database_extractor/database_extractor.py:402-420 (whose hand-rolled
  2024-only calendar we replace with correct ``timedelta`` stepping; we
  implement the *intent*: calendar days in ``[start, end)``).

The golden behaviors are pinned by tests/test_time_handling.py, a port of
the reference's own unit suite (reference: test/test_time_handling.py).
"""

from __future__ import annotations

from collections.abc import Mapping
from datetime import datetime, timedelta
from typing import Iterator, Union
from zoneinfo import ZoneInfo

DEFAULT_TIME_FORMAT = "%Y-%m-%dT%H:%M:%SZ"

_COMPONENTS = ("days", "hours", "minutes", "seconds")


class DeltaTime(Mapping):
    """A 4-component (days, hours, minutes, seconds) signed time delta.

    Supports the reference's arithmetic protocol: adding/subtracting
    ``datetime``, ``timedelta``, another ``DeltaTime``, or a time *string*
    (parsed with ``time_format``), from either side.  Implements the
    ``Mapping`` protocol so a config dict or ``**``-splat works and
    ``dt.values()`` unpacks positionally as (days, hours, minutes, seconds).
    """

    time_format = DEFAULT_TIME_FORMAT

    def __init__(self, days: int = 0, hours: int = 0, minutes: int = 0, seconds: int = 0):
        self._parts = {"days": days, "hours": hours, "minutes": minutes, "seconds": seconds}

    # -- component access ---------------------------------------------------
    @property
    def days(self) -> int:
        return self._parts["days"]

    @property
    def hours(self) -> int:
        return self._parts["hours"]

    @property
    def minutes(self) -> int:
        return self._parts["minutes"]

    @property
    def seconds(self) -> int:
        return self._parts["seconds"]

    def to_timedelta(self) -> timedelta:
        return timedelta(**self._parts)

    # -- Mapping protocol ----------------------------------------------------
    def __getitem__(self, key: str):
        try:
            return self._parts[key]
        except KeyError:
            raise KeyError(f"{key} not found in DeltaTime") from None

    def __iter__(self) -> Iterator[str]:
        return iter(_COMPONENTS)

    def __len__(self) -> int:
        return len(_COMPONENTS)

    def __repr__(self) -> str:
        inner = ", ".join(f"{k}={v}" for k, v in self._parts.items())
        return f"DeltaTime({inner})"

    # -- arithmetic ----------------------------------------------------------
    def _coerce(self, other) -> Union[timedelta, datetime]:
        """Map the operand into timedelta/datetime space."""
        if isinstance(other, timedelta):
            return other
        if isinstance(other, DeltaTime):
            return other.to_timedelta()
        if isinstance(other, str):
            return datetime.strptime(other, self.time_format)
        if isinstance(other, datetime):
            return other
        raise TypeError(f"Unsupported operand for DeltaTime arithmetic: {type(other)!r}")

    def __add__(self, other):
        coerced = self._coerce(other)
        # timedelta + timedelta -> timedelta; datetime + timedelta -> datetime
        return coerced + self.to_timedelta()

    __radd__ = __add__

    def __sub__(self, other):
        coerced = self._coerce(other)
        if isinstance(coerced, datetime):
            # Matches the reference: a datetime operand is shifted *back*
            # regardless of side (datetime - delta).
            return coerced - self.to_timedelta()
        return self.to_timedelta() - coerced

    __rsub__ = __sub__


def shift_string_time(
    time_string: str,
    delta_time: Union[DeltaTime, int, None] = None,
    timeformat: str = DEFAULT_TIME_FORMAT,
) -> str:
    """Parse ``time_string``, add ``delta_time``, format back to a string.

    An integer delta means whole hours (the reference's tz-offset shorthand).
    ``None``/``0`` is a no-op and returns the input unchanged.
    """
    if not delta_time:
        return time_string
    if isinstance(delta_time, int):
        delta_time = DeltaTime(hours=delta_time)
    shifted = datetime.strptime(time_string, timeformat) + delta_time.to_timedelta()
    return shifted.strftime(timeformat)


def construct_query_time_endpoints(
    query_time: Union[datetime, str],
    delta_time_start: Union[DeltaTime, tuple, list],
    delta_time_end: Union[DeltaTime, tuple, list],
    tz_offset: int = 0,
    time_format: str = DEFAULT_TIME_FORMAT,
) -> tuple[str, str]:
    """Resolve a (local) query time + two signed deltas into UTC endpoint strings.

    ``query_time`` is interpreted as *local* time at integer-hour offset
    ``tz_offset``; the UTC window is ``[qt + d_start - tz, qt + d_end - tz)``
    (half-open downstream — see operators.core.time_range).
    """
    if isinstance(delta_time_start, (tuple, list)):
        delta_time_start = DeltaTime(*delta_time_start)
    if isinstance(delta_time_end, (tuple, list)):
        delta_time_end = DeltaTime(*delta_time_end)
    if isinstance(query_time, str):
        query_time = datetime.strptime(query_time, time_format)

    offset = timedelta(hours=tz_offset)
    start_utc = query_time + delta_time_start.to_timedelta() - offset
    end_utc = query_time + delta_time_end.to_timedelta() - offset
    return start_utc.strftime(time_format), end_utc.strftime(time_format)


def timezone_offset(current_date: datetime, zone: str = "America/Vancouver") -> int:
    """Integer-hour UTC offset of ``zone`` at the given (naive local) datetime.

    The reference hardcodes the 2024 US DST window (-7 inside, -8 outside;
    database_extractor.py:358-366). We use the IANA tz database instead, which
    reproduces the reference's 2024 answers *and* is correct for every other
    year. Note: like the reference, the boundary instants themselves follow
    the chosen convention — zoneinfo resolves ambiguous/nonexistent local
    times with fold=0 (first occurrence), matching the reference's strict
    inequality behavior for all but the two boundary hours of the year.
    """
    localized = current_date.replace(tzinfo=ZoneInfo(zone))
    offset = localized.utcoffset()
    return int(offset.total_seconds() // 3600)


def generate_datetime_list(
    start_time: Union[datetime, str],
    end_time: Union[datetime, str],
    delta_time: Union[DeltaTime, timedelta] = None,
    time_format: str = DEFAULT_TIME_FORMAT,
) -> list[datetime]:
    """Datetimes from start to end (both INclusive) at a fixed stride.

    Reference: main.py:75-97 — its loop is ``while current <= end``, so the
    end point itself is emitted when the stride lands on it exactly. (Day
    iteration over a half-open [start, end) range is ``iter_days`` below.)
    """
    if isinstance(start_time, str):
        start_time = datetime.strptime(start_time, time_format)
    if isinstance(end_time, str):
        end_time = datetime.strptime(end_time, time_format)
    if delta_time is None:
        delta_time = timedelta(days=1)
    elif isinstance(delta_time, DeltaTime):
        delta_time = delta_time.to_timedelta()
    if delta_time.total_seconds() <= 0:
        raise ValueError("delta_time stride must be positive")

    out: list[datetime] = []
    cursor = start_time
    while cursor <= end_time:
        out.append(cursor)
        cursor = cursor + delta_time
    return out


def iter_days(start_date: datetime, end_date: datetime) -> Iterator[datetime]:
    """Calendar days (midnights) in ``[start_date, end_date)``.

    Replaces the reference's hand-rolled month-length table
    (database_extractor.py:402-420), which was 2024-only and skipped the
    end check outside the month loop; plain timedelta stepping is correct
    for all years including leap years.
    """
    cursor = datetime(start_date.year, start_date.month, start_date.day)
    end = datetime(end_date.year, end_date.month, end_date.day)
    while cursor < end:
        yield cursor
        cursor += timedelta(days=1)
