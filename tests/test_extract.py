"""End-to-end tests of the core extraction pipeline against a DuckDB oracle
— the integration coverage the reference skips (SURVEY.md §5)."""

import datetime

import duckdb
import pytest
from pyspark.sql import functions as F

from database_extractor_spark.extract import query_database
from tests.conftest import SF_DIR

EVENTS = f"{SF_DIR}/events.parquet"
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    con.execute(f"create view events as select * from '{EVENTS}'")
    return con


def _flagship(spark, tz_offset=0, day="2024-01-05T00:00:00Z"):
    return query_database(
        spark,
        source=EVENTS,
        query_time=day,
        delta_time_start=(0, 0, 0, 0),
        delta_time_end=(0, 24, 0, 0),
        tz_offset=tz_offset,
        filter="event_type RLIKE '.*'",
        column_key="event_type",
        time_col="ts",
        value_col="value",
        pivot_values=EVENT_TYPES,
        sort_by=["ts"],
        aggregate_window="1 second",
    )


def test_flagship_matches_duckdb(spark, oracle):
    got = _flagship(spark).toPandas()

    cases = ", ".join(
        f"max(case when event_type = '{t}' then v end) as {t}" for t in EVENT_TYPES
    )
    want = oracle.sql(f"""
        with binned as (
            select date_trunc('second', ts) as ts, event_type,
                   arg_max(value, ts) as v
            from events
            where ts >= timestamp '2024-01-05' and ts < timestamp '2024-01-06'
            group by 1, 2
        )
        select ts, {cases} from binned group by ts order by ts
    """).df()

    assert got.shape == want.shape
    assert list(got.columns) == list(want.columns)
    got_sorted = got.sort_values("ts").reset_index(drop=True)
    want_sorted = want.sort_values("ts").reset_index(drop=True)
    for col in EVENT_TYPES:
        assert (got_sorted[col].fillna(-1) - want_sorted[col].fillna(-1)).abs().max() < 1e-9
    assert (got_sorted["ts"] == want_sorted["ts"]).all()


def test_flagship_tz_shift(spark, oracle):
    got = _flagship(spark, tz_offset=-8).toPandas()
    # local day [05T00, 06T00) at -8 == UTC window [05T08, 06T08); output
    # timestamps shifted back to local
    want_n = oracle.sql("""
        select count(distinct date_trunc('second', ts)) from events
        where ts >= timestamp '2024-01-05 08:00:00' and ts < timestamp '2024-01-06 08:00:00'
    """).fetchone()[0]
    assert len(got) == want_n
    assert got["ts"].min() >= datetime.datetime(2024, 1, 5)
    assert got["ts"].max() < datetime.datetime(2024, 1, 6)


def test_half_open_window(spark, oracle):
    """[start, stop) — a point exactly at stop is excluded, at start included."""
    lo, hi = oracle.sql(
        "select min(ts), max(ts) from events where ts >= timestamp '2024-01-05' and ts < timestamp '2024-01-06'"
    ).fetchone()
    from database_extractor_spark.operators.core import time_range
    from database_extractor_spark.sources import read_source

    df = read_source(spark, EVENTS)
    n_incl = time_range(df, "ts", lo, hi).count()
    n_all = oracle.sql(
        f"select count(*) from events where ts >= timestamp '{lo}' and ts <= timestamp '{hi}'"
    ).fetchone()[0]
    assert n_incl == n_all - 1  # max point excluded by half-open stop


def test_pivot_duplicate_collapse_deterministic(spark):
    """Duplicate (ts, key) pairs collapse to the value at the greatest
    (order) tuple — reproducible across shuffles/runs."""
    from database_extractor_spark.operators.core import pivot_wide

    rows = [
        (datetime.datetime(2024, 1, 1, 0, 0, 0), "a", 1.0, 1),
        (datetime.datetime(2024, 1, 1, 0, 0, 0), "a", 9.0, 2),  # later seq wins
        (datetime.datetime(2024, 1, 1, 0, 0, 0), "b", 5.0, 3),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, k string, v double, seq long")
    wide = pivot_wide(df, "ts", "k", "v", values=["a", "b"], order_cols=["ts", "seq"]).collect()
    assert wide[0]["a"] == 9.0 and wide[0]["b"] == 5.0


def test_downsample_last_is_last_nonnull_per_bin(spark):
    from database_extractor_spark.operators.core import downsample_last

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (base + datetime.timedelta(microseconds=100), "a", 1.0),
        (base + datetime.timedelta(microseconds=900), "a", 2.0),  # last in bin 0
        (base + datetime.timedelta(seconds=2), "a", 3.0),         # bin 2
    ]
    df = spark.createDataFrame(rows, "ts timestamp, k string, v double")
    out = {r["ts"]: r["v"] for r in downsample_last(df, "ts", ["k"], "v").collect()}
    assert out == {base: 2.0, base + datetime.timedelta(seconds=2): 3.0}  # no empty bin 1


def test_drop_columns_tolerant(spark):
    df = spark.range(3).withColumn("b", F.lit(1))
    from database_extractor_spark.operators.core import drop_columns

    out = drop_columns(df, ["b", "missing", "b"])  # dup + absent are harmless
    assert out.columns == ["id"]


def test_guards(spark):
    from database_extractor_spark.operators.core import has_min_rows

    df = spark.range(15)
    assert has_min_rows(df, 10)
    assert not has_min_rows(df, 20)
    assert has_min_rows(df, 0)


def test_downsample_last_skips_nulls(spark):
    """pandas resample().last() returns the last NON-null per bin — a
    trailing null must not shadow an earlier real value (ADVICE r1)."""
    from database_extractor_spark.operators.core import downsample_last

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (base + datetime.timedelta(microseconds=100), "a", 1.0),
        (base + datetime.timedelta(microseconds=900), "a", None),  # trailing null
        (base + datetime.timedelta(seconds=1), "b", None),         # all-null bin
    ]
    df = spark.createDataFrame(rows, "ts timestamp, k string, v double")
    out = {(r["ts"], r["k"]): r["v"] for r in downsample_last(df, "ts", ["k"], "v").collect()}
    assert out[(base, "a")] == 1.0
    assert out[(base + datetime.timedelta(seconds=1), "b")] is None


def test_range_extract_splits_at_dst_transition(spark):
    """2024-03-08..12 spans the spring-forward (offset -8 -> -7 on 03-11's
    midnight); per-day offsets must match the reference's day loop
    (reference database_extractor.py:372)."""
    from database_extractor_spark.extract import query_data_for_range
    from database_extractor_spark.timeutil import timezone_offset

    # offsets the reference's day loop would use
    offs = [timezone_offset(datetime.datetime(2024, 3, d)) for d in range(8, 12)]
    assert offs == [-8, -8, -8, -7]  # transition 02:00 local on 03-10; midnight 03-11 is PDT

    df = query_data_for_range(
        spark, datetime.datetime(2024, 1, 3), datetime.datetime(2024, 1, 6),
        source=EVENTS,
        column_key="event_type", time_col="ts", value_col="value",
        filter=None, columns_to_drop=None, sort_by=["ts"], pivot_values=EVENT_TYPES,
    )
    # January range: single segment (constant -8 offset); local day [03T00,06T00)
    # at -8 == UTC [03T08, 06T08), shifted back — same row count as fixed-offset run
    fixed = query_data_for_range(
        spark, datetime.datetime(2024, 1, 3), datetime.datetime(2024, 1, 6),
        source=EVENTS, tz_offset=-8,
        column_key="event_type", time_col="ts", value_col="value",
        filter=None, columns_to_drop=None, sort_by=["ts"], pivot_values=EVENT_TYPES,
    )
    assert df.count() == fixed.count()


def test_day_guard_counts_raw_rows_not_bins(spark, tmp_path):
    """Reference parity (ADVICE r1): the <min_rows guard applies to the RAW
    pivoted row count (distinct raw timestamps), not the 1s-downsampled
    count — a day with 12 raw points in 3 seconds clears min_rows=10."""
    from database_extractor_spark.extract import query_data_for_day

    base = datetime.datetime(2024, 1, 5)
    rows = [
        (base + datetime.timedelta(seconds=s, microseconds=1000 * i), "click", float(i))
        for s in range(3) for i in range(4)
    ]
    src = str(tmp_path / "sparse.parquet")
    spark.createDataFrame(rows, "ts timestamp, event_type string, value double") \
        .write.mode("overwrite").parquet(src)

    out = query_data_for_day(
        spark, base, source=src, tz_offset=0, min_rows=10,
        column_key="event_type", time_col="ts", value_col="value",
        filter=None, columns_to_drop=None, sort_by=["ts"], pivot_values=["click"],
    )
    assert out is not None        # 12 raw rows >= 10: kept (downsampled has 3)
    assert out.count() == 3

    none = query_data_for_day(
        spark, base, source=src, tz_offset=0, min_rows=13,
        column_key="event_type", time_col="ts", value_col="value",
        filter=None, columns_to_drop=None, sort_by=["ts"], pivot_values=["click"],
    )
    assert none is None           # 12 raw rows < 13: discarded


def test_query_data_for_day_and_range(spark, tmp_path):
    from database_extractor_spark.extract import query_data_for_day, query_data_for_range

    out = query_data_for_day(
        spark, datetime.datetime(2024, 1, 5), source=EVENTS,
        tz_offset=0, column_key="event_type", time_col="ts", value_col="value",
        filter=None, columns_to_drop=None, sort_by=["ts"], pivot_values=EVENT_TYPES,
    )
    assert out is not None and out.count() > 0

    path = str(tmp_path / "range_out")
    df = query_data_for_range(
        spark, datetime.datetime(2024, 1, 3), datetime.datetime(2024, 1, 6),
        source=EVENTS, out_path=path,
        tz_offset=0, column_key="event_type", time_col="ts", value_col="value",
        filter=None, columns_to_drop=None, sort_by=["ts"], pivot_values=EVENT_TYPES,
    )
    assert df.count() > 0
    written = spark.read.parquet(path)
    # day-partitioned layout -> one partition dir per day in [01-03, 01-06)
    days = {r["date"].isoformat() for r in written.select("date").distinct().collect()}
    assert days == {"2024-01-03", "2024-01-04", "2024-01-05"}


def test_pivot_values_one_pass_vs_inferred_distinct_scan(spark):
    """VERDICT r14 item 6, pinned MECHANICALLY via job groups: with
    pivot_values supplied, building the extraction plan triggers ZERO
    Spark jobs (one-pass, fully lazy); with values omitted, Spark runs
    an eager distinct-scan job at plan-build time (and the API warns);
    infer_pivot_values=False turns the omission into a hard error."""
    import logging

    sc = spark.sparkContext
    tracker = sc.statusTracker()

    kwargs = dict(
        source=EVENTS,
        query_time="2024-01-05T00:00:00Z",
        delta_time_end=(0, 24, 0, 0),
        column_key="event_type",
        time_col="ts",
        value_col="value",
        sort_by=["ts"],
        aggregate_window="1 second",
    )

    # a parquet source read may fire one schema/listing job either way;
    # the DISTINCT-SCAN job is the delta between the two builds
    sc.setJobGroup("pivot-supplied", "plan build with explicit values")
    df = query_database(spark, pivot_values=EVENT_TYPES, **kwargs)
    assert df.columns  # force analysis
    n_supplied = len(tracker.getJobIdsForGroup("pivot-supplied"))
    assert n_supplied <= 1, (
        "explicit pivot_values must not trigger jobs beyond the "
        f"source-listing one, saw {n_supplied}"
    )

    sc.setJobGroup("pivot-inferred", "plan build with inferred values")
    df2 = query_database(spark, **kwargs)
    assert sorted(c for c in df2.columns if c != "ts") == sorted(EVENT_TYPES)
    n_inferred = len(tracker.getJobIdsForGroup("pivot-inferred"))
    assert n_inferred > n_supplied, (
        "omitting pivot_values is expected to cost an extra eager "
        f"distinct scan (supplied={n_supplied}, inferred={n_inferred})"
    )

    with pytest.raises(ValueError, match="pivot_values is required"):
        query_database(spark, infer_pivot_values=False, **kwargs)
