"""Property tests for the time-series extensions: as-of join vs a naive
range join, gap-fill completeness, approx-distinct error bound."""

import datetime

from pyspark.sql import functions as F

from database_extractor_spark.operators.timeseries import (
    asof_join,
    ffill_resample,
    session_windows,
    sliding_counts,
)


def test_asof_join_matches_naive_range_join(spark):
    probes = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1, 0, 0, s)) for s in (2, 5, 9)]
        + [(2, datetime.datetime(2024, 1, 1, 0, 0, 4))],
        "k int, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [
            (1, datetime.datetime(2024, 1, 1, 0, 0, 1), 10.0),
            (1, datetime.datetime(2024, 1, 1, 0, 0, 5), 20.0),  # ts tie: inclusive
            (2, datetime.datetime(2024, 1, 1, 0, 0, 9), 99.0),  # after probe -> null
        ],
        "k int, qts timestamp, v double",
    )
    got = {
        (r["k"], r["ts"].second): r["last_v"]
        for r in asof_join(probes, quotes, ["k"], "ts", "qts", "v", "last_v").collect()
    }
    # naive oracle: max-ts quote with qts <= ts
    naive = (
        probes.join(quotes, on=["k"], how="left")
        .filter(F.col("qts") <= F.col("ts"))
        .groupBy("k", "ts")
        .agg(F.max_by("v", "qts").alias("last_v"))
    )
    want = {(r["k"], r["ts"].second): r["last_v"] for r in naive.collect()}
    for key, v in want.items():
        assert got[key] == v
    assert got[(2, 4)] is None  # no quote at-or-before -> null, row kept


def test_asof_join_no_cartesian_or_range_join(spark):
    probes = spark.createDataFrame([(1, datetime.datetime(2024, 1, 1))], "k int, ts timestamp")
    quotes = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), 1.0)], "k int, qts timestamp, v double"
    )
    out = asof_join(probes, quotes, ["k"], "ts", "qts", "v")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Join" not in plan  # union+window plan: no join operator at all


def test_ffill_fills_every_bin(spark):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (base, "a", 1.0),
        (base + datetime.timedelta(minutes=3), "a", None),  # all-null bin stays ffilled
        (base + datetime.timedelta(minutes=5), "a", 6.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, k string, v double")
    out = {r["ts"].minute: r["v"] for r in ffill_resample(df, "ts", ["k"], "v", "1 minute").collect()}
    assert sorted(out) == [0, 1, 2, 3, 4, 5]  # full grid, gaps materialized
    assert out[1] == 1.0 and out[4] == 1.0 and out[5] == 6.0


def test_sliding_each_event_in_two_windows(spark):
    df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1, 0, 0, 30), "a")], "ts timestamp, k string"
    )
    out = sliding_counts(df, "ts", ["k"], "2 minutes", "1 minute").collect()
    starts = sorted(r["window_start"].strftime("%H:%M") for r in out)
    assert starts == ["23:59", "00:00"] or starts == ["00:00", "23:59"]


def test_session_window_gap_boundary(spark):
    base = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (1, base),
            (1, base + datetime.timedelta(minutes=4)),   # within 5min gap: same session
            (1, base + datetime.timedelta(minutes=20)),  # new session
        ],
        "k int, ts timestamp",
    )
    out = session_windows(df, "ts", ["k"], "5 minutes").collect()
    assert sorted(r["n"] for r in out) == [1, 2]


def test_approx_distinct_error_bound(spark):
    df = spark.range(10000).select((F.col("id") % 1357).alias("u"))
    row = df.agg(
        F.approx_count_distinct("u").alias("a"), F.count_distinct("u").alias("e")
    ).first()
    assert abs(row["a"] - row["e"]) / row["e"] < 0.05  # HLL++ default rsd


def test_range_join_matches_naive_and_avoids_nested_loop(spark):
    from database_extractor_spark.operators.timeseries import range_join

    points = spark.createDataFrame(
        [(i, datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=7 * i)) for i in range(40)],
        "pid int, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (
                j,
                datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=5 * j),
                datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=5 * j + 13 * (j % 3)),
            )
            for j in range(30)
        ],
        "iid int, start timestamp, stop timestamp",
    )
    got = range_join(points, intervals, "ts", "start", "stop", bucket_seconds=6 * 3600)
    naive = points.crossJoin(intervals).filter(
        (F.col("ts") >= F.col("start")) & (F.col("ts") <= F.col("stop"))
    )
    got_pairs = {(r["pid"], r["iid"]) for r in got.select("pid", "iid").collect()}
    want_pairs = {(r["pid"], r["iid"]) for r in naive.select("pid", "iid").collect()}
    assert got_pairs == want_pairs and len(want_pairs) > 0
    # pairs meet in exactly one bucket — no duplicate output rows
    assert got.count() == len(got_pairs)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_approx_percentile_rank_error_bound(spark):
    """In the approximate regime (accuracy << n) the sketch's result must
    sit within the documented rank-error band around the true quantile."""
    import numpy as np

    rng = np.random.RandomState(7)
    vals = rng.lognormal(3.0, 1.2, size=20_000).tolist()
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    accuracy = 100  # rank error ~ n / accuracy = 200 rows = 1% of n
    got = df.agg(F.expr(f"approx_percentile(v, 0.9, {accuracy})").alias("p")).collect()[0]["p"]
    s = sorted(vals)
    lo, hi = s[int(0.85 * len(s))], s[int(0.95 * len(s))]
    assert lo <= got <= hi


def test_asof_join_null_keys_never_match(spark):
    """ASOF join equality never matches NULL keys: a NULL-keyed quote must
    not fill any probe — including a NULL-keyed probe, which the window
    partitioning would otherwise group with it (DuckDB ASOF semantics)."""
    probes = spark.createDataFrame(
        [
            (None, datetime.datetime(2024, 1, 1, 0, 0, 5)),
            (1, datetime.datetime(2024, 1, 1, 0, 0, 5)),
        ],
        "k int, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [
            (None, datetime.datetime(2024, 1, 1, 0, 0, 1), 10.0),
            (1, datetime.datetime(2024, 1, 1, 0, 0, 1), 20.0),
        ],
        "k int, qts timestamp, v double",
    )
    got = {
        r["k"]: r["v"]
        for r in asof_join(probes, quotes, ["k"], "ts", "qts", "v").collect()
    }
    assert got[1] == 20.0
    assert got[None] is None
