"""Semantic invariants for the round-5 fixes, beyond the registry-wide
oracle compare: properties the sf-fixture oracle can't exercise (the
fixture spans ~2 days of one year, so the cross-year carry path of
cumulative_distinct_users never fires there)."""

import datetime

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

import __spark_entry__ as E


def test_cumulative_distinct_users_carries_across_years(spark, tmp_path):
    """cum_users must NOT reset each Jan 1 (ADVICE r4): build a 3-year
    synthetic events table where each year introduces new users plus
    returning ones, and pin the running distinct count across the
    year boundaries."""
    rows = []
    eid = 0
    # year -> users first seen that year (u1,u2 recur every year; only the
    # FIRST sighting counts)
    plan = {
        2022: ["u1", "u2", "u3"],
        2023: ["u1", "u4"],
        2024: ["u2", "u3", "u5", "u6"],
    }
    for yr, users in plan.items():
        for i, u in enumerate(users):
            rows.append(
                (
                    eid,
                    u,
                    datetime.datetime(yr, 1 + (i % 3), 2 + i),
                    "click",
                    1.0,
                )
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, ts timestamp, event_type string, value double"
    )
    d = str(tmp_path / "events.parquet")
    df.write.mode("overwrite").parquet(d)
    # registry reads {sf_dir}/events.parquet
    out = (
        E.queries()["cumulative_distinct_users"](spark, str(tmp_path))
        .orderBy("day")
        .collect()
    )
    # new-user first days: u1,u2,u3 in 2022; u4 in 2023; u5,u6 in 2024
    by_year = {}
    for r in out:
        by_year.setdefault(r["day"].year, []).append(r)
    assert set(by_year) == {2022, 2023, 2024}
    # final cumulative value each year must carry everything before it
    assert by_year[2022][-1]["cum_users"] == 3
    assert by_year[2023][-1]["cum_users"] == 4  # not reset to 1
    assert by_year[2024][-1]["cum_users"] == 6  # not reset to 2
    # monotone non-decreasing overall
    cums = [r["cum_users"] for r in out]
    assert cums == sorted(cums)
    # total distinct users accounted exactly once
    assert sum(r["new_users"] for r in out) == 6


def test_cumulative_distinct_users_matches_naive(spark):
    """On the real fixture: cum_users(day) == count(distinct user) with
    first_day <= day, computed naively."""
    from database_extractor_spark.registry import _tbl

    out = E.queries()["cumulative_distinct_users"](spark, SF_DIR)
    got = {r["day"]: r["cum_users"] for r in out.collect()}
    ev = _tbl(spark, SF_DIR, "events")
    first = (
        ev.groupBy("user_id")
        .agg(F.min(F.date_trunc("day", "ts")).alias("day"))
        .toPandas()
    )
    for day, cum in got.items():
        assert cum == (first["day"] <= day).sum()


def test_interpolate_tiebreak_resolves_same_ts_duplicates(spark):
    """With duplicate (key, ts) rows, the binned take-last must pick the
    row with the greatest (ts, event_id) — not an arbitrary shuffle-order
    pick (ADVICE r4)."""
    import datetime

    from database_extractor_spark.operators.timeseries import (
        ffill_resample,
        interpolate_linear,
    )

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 30)
    t2 = datetime.datetime(2024, 1, 1, 0, 2, 30)
    rows = [
        # two rows at the SAME timestamp in the first minute bin:
        # event_id 7 must win over event_id 3
        (3, "a", t0, 100.0),
        (7, "a", t0, 200.0),
        (1, "a", t2, 400.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double"
    )
    out = (
        interpolate_linear(
            df, "ts", ["event_type"], "value", every="1 minute",
            tiebreak_cols=["event_id"],
        )
        .orderBy("ts")
        .collect()
    )
    assert [r["value"] for r in out] == [200.0, 300.0, 400.0]
    out2 = (
        ffill_resample(
            df, "ts", ["event_type"], "value", every="1 minute",
            tiebreak_cols=["event_id"],
        )
        .orderBy("ts")
        .collect()
    )
    assert [r["value"] for r in out2] == [200.0, 200.0, 400.0]
