"""applyInPandas extension point + stateful streaming operator tests."""

import datetime

import pytest


def test_grouped_ema_matches_recurrence(spark):
    from database_extractor_spark.operators.pandas_ext import grouped_ema

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, base + datetime.timedelta(seconds=s), float(v))
        for s, v in [(0, 10.0), (1, 20.0), (2, 10.0)]
    ] + [(2, base, 100.0)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    got = {
        (r["k"], r["ts"].second): r["ema"]
        for r in grouped_ema(df, ["k"], "ts", "v", alpha=0.5).collect()
    }
    # explicit recurrence: ema_0 = x_0; ema_t = 0.5 x_t + 0.5 ema_{t-1}
    assert got[(1, 0)] == 10.0
    assert got[(1, 1)] == pytest.approx(15.0)
    assert got[(1, 2)] == pytest.approx(12.5)
    assert got[(2, 0)] == 100.0


def test_grouped_ema_deterministic_under_repartition(spark):
    from database_extractor_spark.operators.pandas_ext import grouped_ema

    base = datetime.datetime(2024, 1, 1)
    rows = [(1, base + datetime.timedelta(seconds=s), float(s)) for s in range(50)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    a = sorted(r["ema"] for r in grouped_ema(df, ["k"], "ts", "v").collect())
    b = sorted(r["ema"] for r in grouped_ema(df.repartition(7), ["k"], "ts", "v").collect())
    assert a == b


def test_streaming_sliding_counts_equal_batch(spark):
    """Sliding windows through the STREAMING path (availableNow) equal the
    batch sliding aggregation — same plan, incremental execution."""
    from database_extractor_spark.operators.timeseries import sliding_counts
    from database_extractor_spark.sources import read_source
    from database_extractor_spark.streaming import run_available_now, stream_source
    from tests.conftest import SF_DIR

    path = f"{SF_DIR}/events.parquet"
    stream = stream_source(spark, path).withWatermark("ts", "10 minutes")
    got = run_available_now(
        spark, sliding_counts(stream, "ts", ["event_type"], "2 minutes", "1 minute")
    ).toPandas()
    want = sliding_counts(
        read_source(spark, path), "ts", ["event_type"], "2 minutes", "1 minute"
    ).toPandas()
    key = ["window_start", "event_type"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert len(g) == len(w) and (g["n"].values == w["n"].values).all()


def test_streaming_first_seen_equals_batch(spark):
    from pyspark.sql import functions as F

    from database_extractor_spark.streaming import streaming_first_seen
    from tests.conftest import SF_DIR

    got = streaming_first_seen(spark, f"{SF_DIR}/events.parquet").toPandas()
    from database_extractor_spark.sources import read_source

    want = (
        read_source(spark, f"{SF_DIR}/events.parquet")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"), F.count("*").alias("n"))
        .toPandas()
    )
    g = got.sort_values("user_id").reset_index(drop=True)
    w = want.sort_values("user_id").reset_index(drop=True)
    assert len(g) == len(w)
    assert (g["n"].values == w["n"].values).all()
    assert (g["first_ts"].values == w["first_ts"].values).all()
