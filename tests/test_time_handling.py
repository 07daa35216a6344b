"""Port of the reference's unit suite (reference: test/test_time_handling.py)
plus coverage the reference lacked: DST-aware tz offsets for years other
than 2024, calendar iteration across month/leap boundaries."""

from datetime import datetime, timedelta

from database_extractor_spark.timeutil import (
    DeltaTime,
    construct_query_time_endpoints,
    generate_datetime_list,
    iter_days,
    shift_string_time,
    timezone_offset,
)


def test_deltatime_unpacking():
    dt = DeltaTime(1, 2, 3, 4)
    days, hours, minutes, seconds = dt.values()
    assert (days, hours, minutes, seconds) == (1, 2, 3, 4)

    dt = DeltaTime(days=1, hours=2, minutes=3)
    days, hours, minutes, seconds = dt.values()
    assert (days, hours, minutes, seconds) == (1, 2, 3, 0)


def test_query_time_construct():
    time_format = "%Y-%m-%dT%H:%M:%SZ"
    delta_time_start = DeltaTime(0, -2, 0, 0)
    delta_time_end = DeltaTime(0, 1, 0, 0)
    query_time = "2024-05-16T10:00:00Z"

    start_time = (query_time + delta_time_start).strftime(time_format)
    end_time = (query_time + delta_time_end).strftime(time_format)

    assert start_time == "2024-05-16T08:00:00Z"
    assert end_time == "2024-05-16T11:00:00Z"


def test_construct_query_time_endpoints():
    time_start, time_end = construct_query_time_endpoints(
        "2024-05-16T10:00:00Z", (0, -2, 0, 0), (0, 1, 0, 0)
    )
    assert time_start == "2024-05-16T08:00:00Z"
    assert time_end == "2024-05-16T11:00:00Z"


def test_create_query_endpoints_timezone():
    time_start, time_end = construct_query_time_endpoints(
        "2024-05-16T10:00:00Z", (0, -2, 0, 0), (0, 1, 0, 0), tz_offset=-8
    )
    assert time_start == "2024-05-16T16:00:00Z"
    assert time_end == "2024-05-16T19:00:00Z"


def test_shift_string_time():
    assert shift_string_time("2024-05-16T10:00:00Z", DeltaTime(0, -2, 0, 0)) == "2024-05-16T08:00:00Z"
    assert shift_string_time("2024-05-16T10:00:00Z", DeltaTime(0, 1, 0, 0)) == "2024-05-16T11:00:00Z"
    # int delta means hours (the reference's tz shorthand); 0/None no-ops
    assert shift_string_time("2024-05-16T10:00:00Z", -8) == "2024-05-16T02:00:00Z"
    assert shift_string_time("2024-05-16T10:00:00Z", None) == "2024-05-16T10:00:00Z"
    assert shift_string_time("2024-05-16T10:00:00Z", 0) == "2024-05-16T10:00:00Z"


def test_deltatime_arithmetic_protocol():
    dt = DeltaTime(0, 2, 0, 0)
    assert dt + timedelta(hours=1) == timedelta(hours=3)
    assert dt + DeltaTime(hours=1) == timedelta(hours=3)
    assert datetime(2024, 5, 16, 10) + dt == datetime(2024, 5, 16, 12)
    assert datetime(2024, 5, 16, 10) - dt == datetime(2024, 5, 16, 8)
    assert dict(dt) == {"days": 0, "hours": 2, "minutes": 0, "seconds": 0}


def test_timezone_offset_matches_reference_2024():
    # reference: -7 inside the 2024 US DST window, -8 outside
    # (database_extractor.py:358-366, zone America/Vancouver)
    assert timezone_offset(datetime(2024, 1, 15)) == -8
    assert timezone_offset(datetime(2024, 6, 15)) == -7
    assert timezone_offset(datetime(2024, 12, 15)) == -8
    # and, unlike the reference, correct beyond 2024:
    assert timezone_offset(datetime(2025, 6, 15)) == -7
    assert timezone_offset(datetime(2023, 12, 15)) == -8


def test_generate_datetime_list():
    # end-INclusive, matching the reference's `while current <= end`
    # (reference main.py:92)
    days = generate_datetime_list("2024-02-27T00:00:00Z", "2024-03-02T00:00:00Z")
    assert days[0] == datetime(2024, 2, 27)
    assert datetime(2024, 2, 29) in days  # leap day
    assert days[-1] == datetime(2024, 3, 2)  # end inclusive
    assert len(days) == 5

    hours = generate_datetime_list(
        datetime(2024, 1, 1), datetime(2024, 1, 1, 3), DeltaTime(hours=1)
    )
    assert len(hours) == 4


def test_iter_days_correct_calendar():
    days = list(iter_days(datetime(2023, 2, 26), datetime(2023, 3, 2)))
    assert [d.day for d in days] == [26, 27, 28, 1]  # 2023: no Feb 29
