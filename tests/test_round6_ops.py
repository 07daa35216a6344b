"""Semantic invariants for the round-6 fixes (ADVICE r5) — behaviors the
sf-fixture oracle compare can't exercise because the fixture data never
hits the edge: dot-less email-ish tokens, NULL-valued quotes inside an
as-of tolerance window, a crash between the two snapshot-swap renames,
and TIMESTAMP_NTZ inputs to the epoch/watermark paths."""

import datetime
import os
import shutil

import pytest
from pyspark.sql import functions as F


def test_pii_scrub_email_count_requires_dot_tld(spark):
    """ADVICE r5: routing the email pattern through F.expr let SQL
    string-literal unescaping strip the backslash from '\\.', so
    'a@bcdef' (no dot) counted as an email. Pin the Python-API path:
    dot-less tokens must NOT count; real emails must."""
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    df = spark.createDataFrame(
        [("mail me at a@bcdef thanks",), ("mail me at a@b.cd thanks",)],
        ["text"],
    )
    out = df.select(
        F.size(F.regexp_extract_all(F.col("text"), F.lit(email), F.lit(0))).alias("n")
    ).collect()
    assert [r.n for r in out] == [0, 1]


def test_registry_pii_scrub_counts_match_python_regex(spark, tables):
    """The registry entry's n_emails must agree with Python's re module
    applied to the same augmented text — the cross-check the advisor used
    to expose the F.expr laxening."""
    import re

    import __spark_entry__ as E
    from tests.conftest import SF_DIR

    got = (
        E.queries()["text_pii_scrub"](spark, SF_DIR)
        .select("doc_id", "n_emails")
        .toPandas()
        .set_index("doc_id")["n_emails"]
    )
    docs = tables["documents"].select("doc_id", "text").toPandas()
    pat = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    for _, row in docs.head(50).iterrows():
        aug = (
            f"{row['text']} contact user{row['doc_id']}@example.com "
            f"or +1-555-0{row['doc_id'] % 1000} today"
        )
        assert got[row["doc_id"]] == len(pat.findall(aug))


def test_asof_tolerance_null_quote_does_not_refresh_clock(spark):
    """ADVICE r5: a NULL-valued quote is skipped by last(qv, ignorenulls)
    but must ALSO not refresh the staleness clock — otherwise a stale
    value survives the tolerance check through a recent null quote."""
    from database_extractor_spark.operators.timeseries import asof_join

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def ts(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    quotes = spark.createDataFrame(
        [("u", ts(0), 10.0), ("u", ts(50), None)],
        ["user_id", "qts", "qv"],
    )
    probes = spark.createDataFrame([("u", ts(55))], ["user_id", "ts"])
    out = asof_join(
        probes, quotes, on=["user_id"], left_ts="ts", right_ts="qts",
        value_col="qv", out_col="last_q", tolerance="30 minutes",
    ).collect()
    # The only non-null quote is 55 min stale: the null quote at +50 must
    # not reset the clock, so the fill is NULL.
    assert len(out) == 1 and out[0].last_q is None

    # Control: same shape, non-null recent quote -> value carried.
    quotes2 = spark.createDataFrame(
        [("u", ts(0), 10.0), ("u", ts(50), 7.0)],
        ["user_id", "qts", "qv"],
    )
    out2 = asof_join(
        probes, quotes2, on=["user_id"], left_ts="ts", right_ts="qts",
        value_col="qv", out_col="last_q", tolerance="30 minutes",
    ).collect()
    assert out2[0].last_q == 7.0


def test_merge_upsert_snapshot_recovers_from_parked_old(spark, tmp_path):
    """ADVICE r5: the snapshot swap must survive a crash between the two
    renames. Simulate the worst crash point — snapshot renamed aside,
    tmp never promoted — and assert the next run restores and converges
    to the same per-user latest state."""
    from database_extractor_spark.streaming import streaming_merge_upsert
    from tests.conftest import SF_DIR

    src = os.path.join(SF_DIR, "events.parquet")
    out_dir = str(tmp_path / "upsert")
    expected = (
        streaming_merge_upsert(spark, src, out_dir=out_dir)
        .orderBy("user_id")
        .collect()
    )
    snap = os.path.join(out_dir, "snapshot")
    # Crash simulation: park the live snapshot exactly as the swap does
    # before promoting tmp, then "die".
    os.rename(snap, f"{snap}_old")
    # Fresh run (new checkpoint — the availableNow query re-reads all
    # input) must first recover the parked snapshot, then re-merge.
    out_dir2 = str(tmp_path / "upsert2")
    shutil.copytree(out_dir, out_dir2)
    shutil.rmtree(os.path.join(out_dir2, "_chk"))
    got = (
        streaming_merge_upsert(spark, src, out_dir=out_dir2)
        .orderBy("user_id")
        .collect()
    )
    assert got == expected
    assert not os.path.exists(os.path.join(out_dir2, "snapshot_old"))


def test_epoch_us_and_watermark_accept_ntz(spark, tmp_path):
    """Pin the NTZ regression (VERDICT r5 item 6): parquet MICROS with
    isAdjustedToUTC=false reads back as TIMESTAMP_NTZ in Spark 4, which
    unix_micros and withWatermark reject outright — _epoch_us and the
    streaming source must cast first. This test fails if either
    .cast('timestamp') is removed."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from database_extractor_spark.operators.timeseries import _epoch_us

    path = str(tmp_path / "ntz.parquet")
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    tbl = pa.table(
        {
            "ts": pa.array([t0, t0 + datetime.timedelta(seconds=5)],
                           type=pa.timestamp("us")),
            "value": pa.array([1.0, 2.0]),
        }
    )
    pq.write_table(tbl, path)
    df = spark.read.parquet(path)
    assert "timestamp_ntz" in df.schema["ts"].dataType.simpleString()

    got = df.select(_epoch_us("ts").alias("us")).orderBy("us").collect()
    base = int(t0.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
    assert [r.us for r in got] == [base, base + 5_000_000]

    # Watermark path: stream_source must produce a watermarkable column.
    from database_extractor_spark.streaming import stream_source

    stream = stream_source(spark, path).withWatermark("ts", "1 minute")
    assert stream.isStreaming


def test_no_decimal_midpoint_flips_in_cast_inputs():
    """Round-6 audit, pinned: every per-addend double->decimal cast in the
    registry is only cross-engine-safe while no input value's shortest
    repr lands exactly on a scale+1 midpoint ('...5'), where Spark's
    string-based HALF_UP and DuckDB's binary-value rounding diverge
    (the r05 ts_integral red: terms like 7357.81125 whose binary value
    sits just below the midpoint). This scans the cast inputs actually
    used by the decimal-sum entries at the test SF; a regenerated
    fixture that introduces midpoint values must fail here and move the
    affected entries to floor-quantized terms (the ts_integral fix)."""
    import decimal

    import duckdb

    from tests.conftest import SF_DIR

    con = duckdb.connect()
    for t in ["events", "lineitem", "orders", "customer"]:
        con.execute(f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")

    cases = {
        "events.value @6": ("select value from events", 6),
        "events.value @4": ("select value from events", 4),
        "orders.o_totalprice @4": ("select o_totalprice from orders", 4),
        "orders.o_totalprice @2": ("select o_totalprice from orders", 2),
        "lineitem.l_extendedprice @4": ("select l_extendedprice from lineitem", 4),
        "lineitem.l_quantity @4": ("select l_quantity from lineitem", 4),
        "price*(1-disc) @4": (
            "select l_extendedprice*(1-l_discount) from lineitem", 4),
        "customer.c_acctbal @4": ("select c_acctbal from customer", 4),
        "increase-delta @6": (
            """select greatest(coalesce(value - lag(value) over (
                   partition by event_type order by ts, event_id), 0), 0)
               from events""", 6),
    }
    flips = {}
    for name, (sql, scale) in cases.items():
        quantum = decimal.Decimal(1).scaleb(-scale)
        n = 0
        for (v,) in con.sql(sql).fetchall():
            if v is None:
                continue
            spark_side = decimal.Decimal(repr(v)).quantize(
                quantum, rounding=decimal.ROUND_HALF_UP
            )
            duckdb_side = decimal.Decimal(v).quantize(
                quantum, rounding=decimal.ROUND_HALF_UP
            )
            if spark_side != duckdb_side:
                n += 1
        if n:
            flips[name] = n
    assert not flips, (
        f"decimal-cast inputs hit cross-engine rounding midpoints: {flips}; "
        "switch the affected entries to floor-quantized integer terms "
        "(see operators/timeseries.py integral)"
    )


def test_asof_join_forward_semantics(spark):
    """Forward as-of: earliest quote at-or-after the probe (inclusive),
    tolerance bounds the lookahead, NULL-valued quotes neither fill nor
    refresh the clock, and direction validation rejects typos."""
    from database_extractor_spark.operators.timeseries import asof_join

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def ts(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    quotes = spark.createDataFrame(
        [("u", ts(0), 1.0), ("u", ts(10), 2.0), ("u", ts(100), 9.0),
         ("u", ts(41), None)],
        ["user_id", "qts", "qv"],
    )
    probes = spark.createDataFrame(
        [("u", ts(10)), ("u", ts(5)), ("u", ts(40)), ("u", ts(200))],
        ["user_id", "ts"],
    )
    out = {
        r.ts: r.next_q
        for r in asof_join(
            probes, quotes, on=["user_id"], left_ts="ts", right_ts="qts",
            value_col="qv", out_col="next_q", tolerance="30 minutes",
            direction="forward",
        ).collect()
    }
    assert out[ts(10)] == 2.0      # inclusive: equal-ts quote matches
    assert out[ts(5)] == 2.0       # next quote within 30 min
    assert out[ts(40)] is None     # null quote at +1 min must not fill;
                                   # real quote at +60 min is out of bound
    assert out[ts(200)] is None    # nothing after the last probe

    with pytest.raises(ValueError):
        asof_join(
            probes, quotes, on=["user_id"], left_ts="ts", right_ts="qts",
            value_col="qv", direction="nearest",
        )
