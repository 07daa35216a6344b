"""Property-based tests (hypothesis) for the pure-Python time layer —
the reference's own suite pins 5 golden cases; these pin the algebra."""

from datetime import datetime, timedelta
from zoneinfo import ZoneInfo

from hypothesis import given, settings
from hypothesis import strategies as st

from database_extractor_spark.timeutil import (
    DEFAULT_TIME_FORMAT,
    DeltaTime,
    construct_query_time_endpoints,
    generate_datetime_list,
    iter_days,
    shift_string_time,
    timezone_offset,
)

dt_components = st.tuples(
    st.integers(-30, 30), st.integers(-48, 48), st.integers(-120, 120), st.integers(-120, 120)
)
base_times = st.datetimes(
    min_value=datetime(2000, 1, 1), max_value=datetime(2035, 12, 31)
).map(lambda d: d.replace(microsecond=0))


@given(dt_components)
def test_deltatime_equals_timedelta(parts):
    d = DeltaTime(*parts)
    assert d.to_timedelta() == timedelta(
        days=parts[0], hours=parts[1], minutes=parts[2], seconds=parts[3]
    )
    assert dict(d) == dict(zip(("days", "hours", "minutes", "seconds"), parts))


@given(base_times, dt_components)
def test_shift_string_time_roundtrip(t, parts):
    s = t.strftime(DEFAULT_TIME_FORMAT)
    fwd = shift_string_time(s, DeltaTime(*parts))
    back = shift_string_time(fwd, DeltaTime(*(-p for p in parts)))
    assert back == s


@given(base_times, dt_components, dt_components, st.integers(-12, 12))
def test_endpoints_window_width_is_delta_difference(t, d_start, d_end, tz):
    start, end = construct_query_time_endpoints(t, d_start, d_end, tz_offset=tz)
    start_dt = datetime.strptime(start, DEFAULT_TIME_FORMAT)
    end_dt = datetime.strptime(end, DEFAULT_TIME_FORMAT)
    # width is independent of tz; equals delta_end - delta_start
    assert end_dt - start_dt == (
        DeltaTime(*d_end).to_timedelta() - DeltaTime(*d_start).to_timedelta()
    )
    # tz shifts both endpoints by exactly -tz hours
    s0, _ = construct_query_time_endpoints(t, d_start, d_end, tz_offset=0)
    assert start_dt - datetime.strptime(s0, DEFAULT_TIME_FORMAT) == timedelta(hours=-tz)


@given(base_times)
@settings(max_examples=200)
def test_timezone_offset_agrees_with_zoneinfo(t):
    off = timezone_offset(t)
    want = t.replace(tzinfo=ZoneInfo("America/Vancouver")).utcoffset()
    assert off == int(want.total_seconds() // 3600)
    assert off in (-7, -8)


@given(base_times, st.integers(1, 400), st.integers(1, 72))
def test_generate_datetime_list_inclusive_count(start, n_steps, step_hours):
    stride = timedelta(hours=step_hours)
    end = start + n_steps * stride
    out = generate_datetime_list(start, end, DeltaTime(hours=step_hours))
    assert len(out) == n_steps + 1          # end-inclusive (reference main.py:92)
    assert out[0] == start and out[-1] == end


@given(st.datetimes(min_value=datetime(1999, 1, 1), max_value=datetime(2031, 1, 1)),
       st.integers(0, 800))
def test_iter_days_half_open_count(start, n_days):
    end = start + timedelta(days=n_days)
    days = list(iter_days(start, end))
    base = datetime(start.year, start.month, start.day)
    expected = (datetime(end.year, end.month, end.day) - base).days
    assert len(days) == expected
    assert all(d.hour == 0 and d.minute == 0 for d in days)
