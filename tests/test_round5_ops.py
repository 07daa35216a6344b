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


def test_merge_changes_semantics(spark):
    """MERGE INTO truth table: untouched keys survive, deletes vanish,
    updates replace the payload, inserts add new keys."""
    from database_extractor_spark.operators.cdc import merge_changes

    base = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double"
    )
    changes = spark.createDataFrame(
        [(2, "U", 99.0), (3, "D", 0.0), (4, "I", 40.0)],
        "k long, op string, v double",
    )
    out = {r["k"]: r["v"] for r in merge_changes(base, changes, ["k"]).collect()}
    assert out == {1: 10.0, 2: 99.0, 4: 40.0}


def test_merge_changes_plan_single_join(spark, tables):
    """The merge is ONE join — no window, no cartesian, no Python stage."""
    from database_extractor_spark.operators.cdc import merge_changes

    import __spark_entry__ as E

    df = E.queries()["cdc_merge_apply"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Join") >= 1
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan


def test_equal_freq_buckets_are_balanced(spark):
    """Decile binning must yield 10 buckets within ±2% of n/10 each (exact
    percentile thresholds => near-equal frequencies up to ties)."""
    import __spark_entry__ as E

    rows = E.queries()["equal_freq_binning"](spark, SF_DIR).collect()
    assert len(rows) == 10
    total = sum(r["n"] for r in rows)
    for r in rows:
        assert abs(r["n"] - total / 10) <= max(2, 0.02 * total)


def test_mode_agg_tiebreak_smallest(spark):
    """Equal-count modes resolve to the SMALLEST value on both engines."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", 5.0), ("a", 5.0), ("a", 3.0), ("a", 3.0), ("a", 9.0)],
        "g string, v double",
    )
    c = df.groupBy("g", "v").agg(F.count("*").alias("n"))
    key = F.struct(F.col("n"), (-F.col("v")).alias("neg"))
    out = c.groupBy("g").agg(F.max_by("v", key).alias("mode_v")).collect()
    assert out[0]["mode_v"] == 3.0


def test_psi_drift_zero_for_identical_days(spark):
    """PSI of a distribution against itself is exactly 0 (the add-one
    smoothing is symmetric)."""
    import datetime

    from pyspark.sql import functions as F

    rows = []
    for day in (5, 20):
        for i in range(200):
            rows.append(
                (i, datetime.datetime(2024, 1, day, 1, 0, i % 60),
                 i % 7, "click", float(i % 400), None)
            )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    import tempfile

    d = tempfile.mkdtemp(prefix="psi_")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    import __spark_entry__ as E

    out = E.queries()["psi_drift"](spark, d).collect()
    assert len(out) == 1
    assert out[0]["psi"] == 0.0


def test_asof_tolerance_nulls_stale_quotes(spark):
    """Quotes older than the tolerance must null out; fresh quotes fill."""
    import datetime

    from database_extractor_spark.operators.timeseries import asof_join

    t = lambda m: datetime.datetime(2024, 1, 1, 0, m)
    probes = spark.createDataFrame(
        [(1, t(10), 100), (1, t(45), 101), (2, t(5), 102)],
        "k long, ts timestamp, pid long",
    )
    quotes = spark.createDataFrame(
        [(1, t(8), 1.0), (2, t(50), 2.0)], "k long, qts timestamp, qv double"
    )
    out = asof_join(
        probes, quotes, on=["k"], left_ts="ts", right_ts="qts",
        value_col="qv", out_col="filled", tolerance="10 minutes",
    )
    got = {r["pid"]: r["filled"] for r in out.collect()}
    # pid 100: quote 2 min old -> fresh; pid 101: 37 min old -> stale;
    # pid 102: no prior quote -> null
    assert got == {100: 1.0, 101: None, 102: None}
    # exactly-at-tolerance is inclusive
    out2 = asof_join(
        probes, quotes, on=["k"], left_ts="ts", right_ts="qts",
        value_col="qv", out_col="filled", tolerance="37 minutes",
    )
    assert {r["pid"]: r["filled"] for r in out2.collect()}[101] == 1.0


def test_hard_negatives_are_cross_label_and_hardest(spark):
    """Every mined negative has a different label than its anchor, and is
    the max-cosine cross-label vector within the anchor's bucket."""
    from database_extractor_spark.operators import similarity as S
    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = S.hard_negatives_lsh(e, dim=64, n_planes=4, seed=42)
    labels = {r["vec_id"]: r["label"] for r in e.select("vec_id", "label").collect()}
    rows = out.collect()
    assert len(rows) > 0
    for r in rows:
        assert labels[r["anchor_id"]] != labels[r["hard_neg_id"]]
    # spot-check hardness for one anchor against a brute-force recompute
    b = S.with_lsh_bucket(e, 64, "embedding", 4, 42)
    anchor = rows[0]
    arow = b.filter(F.col("vec_id") == anchor["anchor_id"]).collect()[0]
    cands = b.filter(
        (F.col("bucket") == arow["bucket"]) & (F.col("label") != arow["label"])
    ).collect()
    import math

    def cos(u, v):
        d = sum(float(x) * float(y) for x, y in zip(u, v))
        nu = math.sqrt(sum(float(x) ** 2 for x in u))
        nv = math.sqrt(sum(float(y) ** 2 for y in v))
        return 0.0 if nu * nv == 0 else d / (nu * nv)

    best = max(round(cos(arow["embedding"], c["embedding"]), 6) for c in cands)
    assert abs(best - anchor["neg_cos"]) < 1e-9


def test_zorder_layout_clusters_both_dims(spark, tmp_path):
    """Writing events range-sorted by zkey must shrink the per-file spread
    of BOTH underlying dimensions vs the unsorted layout — the property
    that makes parquet min/max stats prune on either dimension's filter."""
    from pyspark.sql import functions as F

    from database_extractor_spark.registry import _tbl, _zorder_key_sql

    # dense buckets on BOTH dims at every SF (sf0.001 has only ~15 users,
    # which degenerates the entry's user dimension — the layout property
    # is what's pinned here, on event_id x value)
    zkey = _zorder_key_sql("event_id % 256", "cast(floor(value) as bigint) % 256")
    ev = (
        _tbl(spark, SF_DIR, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            (F.col("event_id") % 256).alias("ub"),
            (F.floor("value").cast("long") % 256).alias("vb"),
            F.expr(zkey).cast("long").alias("zkey"),
        )
    )
    out = str(tmp_path / "zsorted")
    ev.repartitionByRange(8, "zkey").sortWithinPartitions("zkey").write.parquet(out)
    back = spark.read.parquet(out).withColumn(
        "f", F.input_file_name()
    )
    spread = back.groupBy("f").agg(
        (F.max("ub") - F.min("ub")).alias("ub_spread"),
        (F.max("vb") - F.min("vb")).alias("vb_spread"),
    ).agg(F.avg("ub_spread").alias("aub"), F.avg("vb_spread").alias("avb")).collect()[0]
    g = ev.agg(
        (F.max("ub") - F.min("ub")).alias("gu"), (F.max("vb") - F.min("vb")).alias("gv")
    ).collect()[0]
    # each file must cover well under the full range of BOTH dimensions
    # (a 1-d sort would leave the other dimension at ~full spread)
    assert spread["aub"] < 0.6 * g["gu"]
    assert spread["avb"] < 0.6 * g["gv"]


def test_merge_upsert_is_batch_split_independent(spark, tmp_path):
    """Applying the upsert in two half-batches (either order) must produce
    the same snapshot as one batch — latest-wins by (ts, event_id) is
    associative/commutative, so trigger chunking can't change results."""
    import datetime

    from pyspark.sql import functions as F

    rows = [
        (1, datetime.datetime(2024, 1, 1, 0, 0), 10, 1.0),
        (1, datetime.datetime(2024, 1, 1, 0, 5), 11, 2.0),
        (2, datetime.datetime(2024, 1, 1, 0, 3), 12, 3.0),
        (1, datetime.datetime(2024, 1, 1, 0, 5), 9, 9.0),  # same ts, lower id
        (2, datetime.datetime(2024, 1, 1, 0, 1), 13, 4.0),
    ]
    schema = "user_id long, ts timestamp, event_id long, value double"

    key = F.struct("ts", "event_id")
    payload = F.struct("ts", "event_id", "value")

    def latest(df):
        return df.groupBy("user_id").agg(F.max_by(payload, key).alias("s")).select(
            "user_id", "s.ts", "s.event_id", "s.value"
        )

    full = {tuple(r) for r in latest(spark.createDataFrame(rows, schema)).collect()}
    for split in (2, 3):
        for order in ((0, 1), (1, 0)):
            parts = [rows[:split], rows[split:]]
            snap = None
            for i in order:
                b = spark.createDataFrame(parts[i], schema)
                snap = latest(b) if snap is None else latest(snap.unionByName(latest(b)))
            assert {tuple(r) for r in snap.collect()} == full
    # expected winners: user 1 -> event 11 (ts tie broken by higher id),
    # user 2 -> event 12 (later ts)
    winners = {r[0]: r[2] for r in full}
    assert winners == {1: 11, 2: 12}


def test_pagerank_ranks_conserve_mass(spark):
    """On a graph where every node has out-edges, total PageRank mass is
    conserved at 1.0 each iteration (5 * 0.03 + 0.85 * 1); also the
    distribution is a proper ranking (all positive, not uniform unless
    the transition matrix is doubly stochastic)."""
    import __spark_entry__ as E

    rows = E.queries()["pagerank_event_graph"](spark, SF_DIR).collect()
    assert len(rows) == 5
    total = sum(r["pagerank"] for r in rows)
    assert abs(total - 1.0) < 1e-4
    assert all(r["pagerank"] > 0 for r in rows)


def test_coverage_ledger_totals_match_registry():
    """SURVEY.md / README.md totals must equal len(QUERIES)/len(ORACLE) —
    the repo's stated invariant; it drifted in rounds 3 and 4, so pin it."""
    import re

    from database_extractor_spark.registry import ORACLE, QUERIES

    survey = open("/root/repo/SURVEY.md").read()
    m = re.search(
        r"Totals: (\d+) registry entries, (\d+) with independent DuckDB oracles",
        survey,
    )
    assert m, "SURVEY.md totals line missing"
    assert (int(m.group(1)), int(m.group(2))) == (len(QUERIES), len(ORACLE))
    readme = open("/root/repo/README.md").read()
    m2 = re.search(r"(\d+) named queries, (\d+) with independent", readme)
    assert m2, "README.md totals line missing"
    assert (int(m2.group(1)), int(m2.group(2))) == (len(QUERIES), len(ORACLE))


def test_trained_pq_cache_is_session_independent(spark):
    """Round 8 replaced the session-bound encoded-DataFrame PQ cache with
    plain trained-codebook floats (a pure deterministic function of the
    data), so entries are valid across SparkSessions by construction —
    the stale-session rebuild dance (ADVICE r3 / VERDICT r4 item 8) is
    structurally gone. Pin that shape: after a call the cache holds plain
    (seed_id, vector) float pairs, and a second call reuses the object
    (no retraining jobs)."""
    from database_extractor_spark import registry as R

    # keyed by fixture CONTENT fingerprint since r12 (0cb8a98)
    key = R._parquet_fingerprint(SF_DIR, "embeddings")
    R._TRAINED_PQ_CACHE.pop(key, None)
    try:
        out = R.QUERIES["sim_pq_topk"](spark, SF_DIR)
        assert out.count() == 10
        books = R._TRAINED_PQ_CACHE[key]
        assert all(
            isinstance(sid, int) and all(isinstance(x, float) for x in vec)
            for sid, vec in books
        ), "cache must hold plain floats, not session-bound objects"
        R.QUERIES["sim_pq_topk"](spark, SF_DIR)
        assert R._TRAINED_PQ_CACHE[key] is books  # reused, not retrained
    finally:
        R._TRAINED_PQ_CACHE.pop(key, None)


def test_weighted_sample_wor_plan_is_takeordered(spark):
    """Selection of the k smallest Efraimidis-Spirakis keys must plan as
    TakeOrderedAndProject (per-partition top-k + merge of k-row heaps) —
    never a materialized global Sort (VERDICT r4 item 6)."""
    df = E.queries()["weighted_sample_wor"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Sort [" not in plan  # no full-sort fallback


def test_rolling_median_window_is_partitioned(spark):
    """The exact-percentile frame must run inside a window PARTITIONED by
    event_type — a global window would funnel 100 TB through one task
    (the generic plan lint also covers this; pinned here explicitly per
    VERDICT r4 item 6)."""
    import re

    df = E.queries()["rolling_median"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window [" in plan
    assert not re.search(r"Window \[[^\n]*?\], \[\], \[", plan)
