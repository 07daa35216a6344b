"""Time-series extensions: as-of join, gap fill, sliding/session windows.

Split out of the flat registry.py in round 14; entry bodies are
unchanged — see registry/__init__.py for the aggregation contract.
"""
from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from database_extractor_spark.operators import core as C

from database_extractor_spark.registry._base import (
    register,
    _tbl,
)

# Time-series extensions (as-of join, gap fill, sliding/session windows)
# ==========================================================================

@register(
    "asof_join",
    """
    with probes as (
        select user_id, ts, event_id from events where event_type = 'click'
    ),
    quotes as (
        select user_id, date_trunc('second', ts) as qts, value as qv
        from events where event_type = 'purchase' and value is not null
        qualify row_number() over (
            partition by user_id, date_trunc('second', ts)
            order by ts desc, event_id desc) = 1
    )
    select p.event_id, p.user_id, q.qv as last_purchase
    from probes p asof left join quotes q
      on p.user_id = q.user_id and p.ts >= q.qts
    """,
)
def asof_join_q(spark, sf_dir):
    """Backward as-of join (union + ordered window; one shuffle, no
    range-join fan-out): last purchase value at-or-before each click,
    per user. Oracle: DuckDB's native ASOF LEFT JOIN."""
    from database_extractor_spark.operators.timeseries import asof_join

    ev = _tbl(spark, sf_dir, "events")
    probes = ev.filter("event_type = 'click'").select("user_id", "ts", "event_id")
    quotes = C.downsample_last(
        ev.filter("event_type = 'purchase'"), "ts", ["user_id"], "value",
        tiebreak_cols=["event_id"],
    ).withColumnRenamed("ts", "qts").withColumnRenamed("value", "qv")
    out = asof_join(
        probes, quotes, on=["user_id"], left_ts="ts", right_ts="qts",
        value_col="qv", out_col="last_purchase",
    )
    return out.select("event_id", "user_id", "last_purchase")


@register(
    "ffill_resample",
    """
    with raw as (
        select event_type, date_trunc('minute', ts) as bts, value
        from events
        where ts >= timestamp '2024-01-05' and ts < timestamp '2024-01-06'
          and value is not null
        qualify row_number() over (
            partition by event_type, date_trunc('minute', ts)
            order by ts desc, event_id desc) = 1
    ),
    binned as (select event_type, bts as ts, value from raw),
    bounds as (select event_type, min(ts) as mn, max(ts) as mx from binned group by 1),
    grid as (
        select event_type, unnest(generate_series(mn, mx, interval 1 minute)) as ts
        from bounds
    )
    select g.event_type, g.ts,
           last_value(b.value ignore nulls) over (
               partition by g.event_type order by g.ts
               rows between unbounded preceding and current row) as value
    from grid g left join binned b on g.event_type = b.event_type and g.ts = b.ts
    """,
)
def ffill_resample_q(spark, sf_dir):
    """Gap-filled 1-minute resample with forward fill — the pandas
    resample().last().ffill() analog (grid via sequence(), fill via one
    last(ignorenulls) window pass). Per-bin take-last tiebreaks on
    event_id so duplicate (key, ts) inputs resolve identically on any
    engine (oracle mirrors via row_number over ts desc, event_id desc;
    the `value is not null` guard matches max_by's null-skipping — the
    fixture has no null values, and an all-null bin would interpolate
    the same as a missing bin)."""
    from database_extractor_spark.operators.timeseries import ffill_resample

    ev = _tbl(spark, sf_dir, "events")
    day = C.time_range(ev, "ts", "2024-01-05 00:00:00", "2024-01-06 00:00:00")
    return ffill_resample(
        day, "ts", ["event_type"], "value", every="1 minute",
        tiebreak_cols=["event_id"],
    )


@register(
    "sliding_window_counts",
    """
    with expanded as (
        select date_trunc('minute', ts) as w0, event_type from events
        union all
        select date_trunc('minute', ts) - interval 1 minute, event_type from events
    )
    select w0 as window_start, event_type, count(*) as n
    from expanded group by 1, 2
    """,
)
def sliding_window_counts(spark, sf_dir):
    """Hopping windows (2 min window, 1 min slide): every event counted in
    exactly two windows. Oracle expands each event into its two window
    starts explicitly."""
    from database_extractor_spark.operators.timeseries import sliding_counts

    return sliding_counts(
        _tbl(spark, sf_dir, "events"), "ts", ["event_type"], "2 minutes", "1 minute"
    )


@register(
    "sliding_distinct_users",
    """
    with expanded as (
        select date_trunc('minute', ts) as w0, event_type, user_id from events
        union all
        select date_trunc('minute', ts) - interval 1 minute, event_type, user_id
        from events
    )
    select w0 as window_start, event_type,
           cast(count(distinct user_id) as bigint) as n_users
    from expanded group by 1, 2
    """,
)
def sliding_distinct_users(spark, sf_dir):
    """DISTINCT-count over hopping windows — the active-users primitive
    (DAU/WAU at product scale, here 2 min window / 1 min slide): unlike
    sliding_window_counts' plain count, a user active five times in a
    window counts once, so the aggregate needs dedup-within-window
    state. Plan: window() expands each event into its window/slide = 2
    hops, then count(distinct user_id) per (window_start, event_type) —
    Spark plans this as the standard two-phase distinct expansion
    (partial dedup map-side before the count shuffle). Scale: state is
    bounded by distinct users per window x live windows; at 100 TB swap
    exact distinct for the mergeable HLL sketch entry
    (hll_sketch_union_distinct) when 2% error is acceptable — this
    entry is the exact reference the sketch is calibrated against."""
    e = _tbl(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "2 minutes", "1 minute")
            .getField("start")
            .alias("window_start"),
            "event_type",
        )
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
    )


@register(
    "session_windows",
    """
    with d as (
        select user_id, ts,
               case when lag(ts) over w is null
                         or ts - lag(ts) over w >= interval 30 minute
                    then 1 else 0 end as brk
        from events
        window w as (partition by user_id order by ts)
    ),
    s as (
        select user_id, ts,
               sum(brk) over (partition by user_id order by ts
                              rows between unbounded preceding and current row) as sid
        from d
    )
    select user_id, min(ts) as session_start, count(*) as n
    from s group by user_id, sid
    """,
)
def session_windows_q(spark, sf_dir):
    """Session windows (30 min gap) per user. Oracle: classic
    gaps-and-islands with lag + running break count."""
    from database_extractor_spark.operators.timeseries import session_windows

    out = session_windows(_tbl(spark, sf_dir, "events"), "ts", ["user_id"], "30 minutes")
    return out.select("user_id", "session_start", "n")


@register(
    "user_activity_streaks",
    """
    with d as (select distinct user_id, cast(ts as date) as day from events),
    r as (
        select user_id,
               day - cast(row_number() over (
                   partition by user_id order by day) as int) as grp
        from d
    ),
    s as (
        select user_id, grp, cast(count(*) as bigint) as len
        from r group by user_id, grp
    )
    select user_id,
           cast(max(len) as bigint) as longest_streak,
           cast(count(*) as bigint) as n_streaks,
           cast(sum(len) as bigint) as n_active_days
    from s group by user_id
    order by user_id
    """,
)
def user_activity_streaks(spark, sf_dir):
    """CONSECUTIVE-DAY STREAKS per user — the canonical gaps-and-islands
    rewrite (engagement metrics, retention heuristics, "n-day streak"
    badges): collapse events to distinct (user, day), number the days
    per user, and group by ``day - row_number`` — consecutive days share
    the anchor date, so each island IS a streak; the per-user rollup
    reports the longest streak, island count, and total active days.
    Distinct from session_windows (sub-day gap grouping on raw
    timestamps) and interval_coalesce (merging explicit [start,end]
    ranges): this is calendar-day arithmetic on a deduplicated day
    grid. Scale: the distinct and both windows share ONE hash exchange
    on user_id; per-partition state is bounded by days-per-user (≤ the
    calendar range, never the event volume), and the 100 TB event scan
    reduces to (user, day) pairs map-side before any shuffle."""
    ev = _tbl(spark, sf_dir, "events")
    d = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = d.withColumn(
        "grp", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    s = islands.groupBy("user_id", "grp").agg(
        F.count("*").cast("bigint").alias("len")
    )
    return (
        s.groupBy("user_id")
        .agg(
            F.max("len").cast("bigint").alias("longest_streak"),
            F.count("*").cast("bigint").alias("n_streaks"),
            F.sum("len").cast("bigint").alias("n_active_days"),
        )
        .orderBy("user_id")
    )


@register(
    "ks_test_drift",
    """
    with t as (
        select value,
               case when ts < timestamp '2024-01-08' then 1 else 0 end as is_a
        from events
        where ts >= timestamp '2024-01-01' and ts < timestamp '2024-01-15'
          and value is not null
    ),
    g as (
        select value,
               cast(sum(is_a) as bigint) as c1,
               cast(sum(1 - is_a) as bigint) as c2
        from t group by value
    ),
    c as (
        select value,
               cast(sum(c1) over (order by value
                   rows between unbounded preceding and current row)
                   as bigint) as cum1,
               cast(sum(c2) over (order by value
                   rows between unbounded preceding and current row)
                   as bigint) as cum2
        from g
    ),
    n as (select cast(sum(c1) as bigint) as n1,
                 cast(sum(c2) as bigint) as n2 from g)
    select n.n1, n.n2,
           cast(max(abs(cum1 * n.n2 - cum2 * n.n1)) as bigint) as ks_num,
           cast(max(abs(cum1 * n.n2 - cum2 * n.n1)) as double)
               / cast(n.n1 * n.n2 as double) as ks_stat
    from c, n
    group by n.n1, n.n2
    """,
)
def ks_test_drift(spark, sf_dir):
    """TWO-SAMPLE KOLMOGOROV-SMIRNOV drift statistic (week 1 vs week 2 of
    events.value) — the distribution-shape companion of psi_drift's
    binned divergence: D = max_v |F1(v) - F2(v)| over the POOLED value
    grid, computed EXACTLY in integers as max |cum1*n2 - cum2*n1| /
    (n1*n2), so the max never compares rounded doubles. The empirical
    CDFs need a prefix sum over ordered distinct values — done as the
    registry's standard two-level distributed form (cumulative_distinct_
    users): an intra-band running sum over a window PARTITIONED by
    floor(value) (band population bounded by value locality, never a
    single global task) plus a cross-band carry computed on the per-band
    totals (cardinality = number of integer bands) via one sorted-array
    prefix fold, broadcast back. Totals n1/n2 attach as the idiomatic
    1-row broadcast. Scale: one hash exchange on value for the group-by,
    one on band for the window; a skewed value distribution swaps
    floor() for quantile bands (equal_freq_binning) — same shape."""
    ev = _tbl(spark, sf_dir, "events")
    ts = F.col("ts")
    t = ev.filter(
        (ts >= F.lit("2024-01-01").cast("timestamp"))
        & (ts < F.lit("2024-01-15").cast("timestamp"))
        & F.col("value").isNotNull()
    ).select(
        "value",
        F.when(ts < F.lit("2024-01-08").cast("timestamp"), 1)
        .otherwise(0)
        .cast("long")
        .alias("is_a"),
    )
    g = t.groupBy("value").agg(
        F.sum("is_a").cast("bigint").alias("c1"),
        F.sum(F.lit(1) - F.col("is_a")).cast("bigint").alias("c2"),
    ).withColumn("band", F.floor("value"))
    w = (
        Window.partitionBy("band")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    band_tot = g.groupBy("band").agg(
        F.sum("c1").alias("t1"), F.sum("c2").alias("t2")
    )
    carry = (
        band_tot.agg(
            F.sort_array(F.collect_list(F.struct("band", "t1", "t2"))).alias("a")
        )
        .select(
            F.explode(
                F.expr(
                    "transform(a, (s, i) -> struct(s.band as band, "
                    "aggregate(slice(a, 1, i), 0L, (acc, u) -> acc + u.t1) as k1, "
                    "aggregate(slice(a, 1, i), 0L, (acc, u) -> acc + u.t2) as k2))"
                )
            ).alias("s")
        )
        .select("s.band", "s.k1", "s.k2")
    )
    totals = g.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
    )
    c = (
        g.withColumn("i1", F.sum("c1").over(w))
        .withColumn("i2", F.sum("c2").over(w))
        .join(F.broadcast(carry), "band")
        .select(
            (F.col("i1") + F.col("k1")).cast("bigint").alias("cum1"),
            (F.col("i2") + F.col("k2")).cast("bigint").alias("cum2"),
        )
        .crossJoin(F.broadcast(totals))
    )
    return c.groupBy("n1", "n2").agg(
        F.max(F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1")))
        .cast("bigint")
        .alias("ks_num"),
        (
            F.max(
                F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))
            ).cast("double")
            / (F.col("n1") * F.col("n2")).cast("double")
        ).alias("ks_stat"),
    )


# ==========================================================================

@register(
    "ohlc_bars",
    """
    with b as (
        select event_type, date_trunc('minute', ts) as bar_ts,
               ts, event_id, value
        from events where value is not null
    ),
    o as (
        select event_type, bar_ts, value as open from b
        qualify row_number() over (partition by event_type, bar_ts
                                   order by ts, event_id) = 1
    ),
    c as (
        select event_type, bar_ts, value as close from b
        qualify row_number() over (partition by event_type, bar_ts
                                   order by ts desc, event_id desc) = 1
    ),
    hl as (
        select event_type, bar_ts, max(value) as high, min(value) as low,
               cast(count(*) as bigint) as n
        from b group by 1, 2
    )
    select hl.event_type, hl.bar_ts, o.open, hl.high, hl.low, c.close, hl.n
    from hl
    join o using (event_type, bar_ts)
    join c using (event_type, bar_ts)
    """,
)
def ohlc_bars(spark, sf_dir):
    """OHLC BARS (1-minute open/high/low/close/volume per event_type) —
    the candlestick downsample every metrics store offers, and the
    four-facet sibling of o08's take-last: open/close are the
    time-extreme values WITH the event_id tiebreak (duplicate
    timestamps resolve identically on any engine), high/low are plain
    extremes, n is the bar volume. Spark-first: ONE hash aggregate
    computes all five facets — open/close ride min/max over a
    (ts, event_id, value) struct (lexicographic struct ordering IS the
    tie-broken argmin/argmax, no second window pass), so the whole
    entry is a single exchange on (event_type, minute); the oracle
    spells the same semantics as two QUALIFY row_number passes + one
    group-by, joined. At 100 TB the struct-min form map-side-combines
    to one row per bar per mapper before the shuffle — strictly less
    traffic than any window formulation."""
    ev = _tbl(spark, sf_dir, "events")
    b = ev.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.date_trunc("minute", F.col("ts")).alias("bar_ts"),
        "ts",
        "event_id",
        "value",
    )
    s = F.struct("ts", "event_id", "value")
    return b.groupBy("event_type", "bar_ts").agg(
        F.min(s).getField("value").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(s).getField("value").alias("close"),
        F.count("*").cast("bigint").alias("n"),
    )


@register(
    "interarrival_burstiness",
    """
    with g as (
        select user_id,
               epoch_us(ts) - lag(epoch_us(ts)) over (
                   partition by user_id order by ts, event_id) as gap
        from events
    ),
    st as (
        select user_id,
               cast(count(gap) as bigint) as n_gaps,
               cast(sum(gap) as bigint) as sum_gap,
               cast(sum(cast(gap as decimal(28,0))
                        * cast(gap as decimal(28,0))) as double) as sumsq
        from g where gap is not null
        group by user_id
        having count(gap) >= 20
    )
    select user_id, n_gaps,
           round(cast(sum_gap as double) / cast(n_gaps as double)
                 / 1000000.0, 6) as mean_gap_s,
           round((sqrt(greatest(sumsq / cast(n_gaps as double)
                                - (cast(sum_gap as double)
                                   / cast(n_gaps as double))
                                  * (cast(sum_gap as double)
                                     / cast(n_gaps as double)), 0.0))
                  - cast(sum_gap as double) / cast(n_gaps as double))
                 / (sqrt(greatest(sumsq / cast(n_gaps as double)
                                  - (cast(sum_gap as double)
                                     / cast(n_gaps as double))
                                    * (cast(sum_gap as double)
                                       / cast(n_gaps as double)), 0.0))
                    + cast(sum_gap as double) / cast(n_gaps as double)),
                 6) as burstiness
    from st
    order by burstiness desc, user_id
    limit 20
    """,
)
def interarrival_burstiness(spark, sf_dir):
    """INTER-ARRIVAL BURSTINESS per user — the Goh-Barabasi statistic
    B = (sigma - mu) / (sigma + mu) over each user's event-gap
    distribution (B -> -1 periodic heartbeat, 0 Poisson, -> +1 bursty;
    the behavioral fingerprint that separates bots/monitors from humans
    and flags scraper traffic in a curation pipeline). Gaps are EXACT
    int64 microseconds from one lag() pass per user partition; the
    moments are a map-side-combinable aggregate (count / exact bigint
    sum / decimal-exact sum of squares — gap^2 exceeds int64 at
    month-long gaps, so squares multiply as decimal(38,0), the
    token_label_chi2 overflow lesson applied pre-emptively). sigma uses
    the population form sumsq/n - mean^2 clamped at 0 (FP cancellation
    guard) — sqrt is IEEE-correctly-rounded so both engines agree
    bit-for-bit given identical operand sequences; round 6 guards the
    display. Output is TakeOrdered(20) on (B desc, user_id). Scale: the
    user-partitioned window is the sessionization exchange every
    funnel entry pays; everything downstream is one row per user."""
    ev = _tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    g = ev.select(
        "user_id", (us - F.lag(us).over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    st = (
        g.groupBy("user_id")
        .agg(
            F.count("gap").cast("bigint").alias("n_gaps"),
            F.sum("gap").cast("bigint").alias("sum_gap"),
            F.sum(
                F.col("gap").cast("decimal(28,0)")
                * F.col("gap").cast("decimal(28,0)")
            )
            .cast("double")
            .alias("sumsq"),
        )
        .filter(F.col("n_gaps") >= 20)
    )
    mean = F.col("sum_gap").cast("double") / F.col("n_gaps").cast("double")
    var = F.greatest(
        F.col("sumsq") / F.col("n_gaps").cast("double") - mean * mean,
        F.lit(0.0),
    )
    sigma = F.sqrt(var)
    return (
        st.select(
            "user_id",
            "n_gaps",
            F.round(mean / F.lit(1000000.0), 6).alias("mean_gap_s"),
            F.round((sigma - mean) / (sigma + mean), 6).alias("burstiness"),
        )
        .orderBy(F.desc("burstiness"), "user_id")
        .limit(20)
    )


@register(
    "cusum_changepoint",
    """
    with daily as (
        select event_type, date_trunc('day', ts) as day,
               cast(count(*) as bigint) as n
        from events group by 1, 2
    ),
    c as (
        select event_type, day, n,
               cast(row_number() over w as bigint) as k,
               cast(sum(n) over (
                   partition by event_type order by day
                   rows between unbounded preceding and current row)
                   as bigint) as s_k,
               cast(count(*) over (partition by event_type) as bigint)
                   as n_days,
               cast(sum(n) over (partition by event_type) as bigint) as s_n
        from daily
        window w as (partition by event_type order by day)
    ),
    scored as (
        select event_type, day, n_days, s_n,
               abs(n_days * s_k - k * s_n) as stat_scaled
        from c
    )
    select event_type, day as changepoint_day, n_days,
           s_n as total_events, stat_scaled,
           round(cast(stat_scaled as double)
                 / (cast(n_days as double) * cast(s_n as double)), 6)
               as cusum_stat
    from scored
    qualify row_number() over (
        partition by event_type order by stat_scaled desc, day) = 1
    order by event_type
    """,
)
def cusum_changepoint(spark, sf_dir):
    """CUSUM CHANGE-POINT detection per event-type series — the day at
    which the daily-volume series most departs from a constant rate
    (argmax_k |S_k - (k/N)*S_N|, the classic at-most-one-change-point
    statistic; the monitoring primitive behind "when did this feed's
    behavior shift"). The statistic is held EXACT: scale by N*S_N so
    stat = |N*S_k - k*S_N| is pure int64 (bounded by N*S_N — days x
    total events, safe to ~3e9 event-days per type) and the argmax is
    FP-free with an earliest-day tiebreak; the normalized 0..1 score
    divides exact integers once for display. Plan: one map-side-
    combinable day-grain aggregate collapses the fact table, then every
    window is PARTITIONED by event_type over calendar-bounded day rows
    — the backfill_todo_ledger shape; nothing downstream of the first
    aggregate exceeds days x types rows."""
    ev = _tbl(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").cast("bigint").alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    wall = Window.partitionBy("event_type")
    c = daily.select(
        "event_type",
        "day",
        F.row_number().over(w).cast("bigint").alias("k"),
        F.sum("n")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("s_k"),
        F.count("*").over(wall).cast("bigint").alias("n_days"),
        F.sum("n").over(wall).cast("bigint").alias("s_n"),
    )
    scored = c.select(
        "event_type",
        "day",
        "n_days",
        "s_n",
        F.abs(
            F.col("n_days") * F.col("s_k") - F.col("k") * F.col("s_n")
        ).alias("stat_scaled"),
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.desc("stat_scaled"), "day"
    )
    return (
        scored.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").alias("changepoint_day"),
            "n_days",
            F.col("s_n").alias("total_events"),
            "stat_scaled",
            F.round(
                F.col("stat_scaled").cast("double")
                / (F.col("n_days").cast("double") * F.col("s_n").cast("double")),
                6,
            ).alias("cusum_stat"),
        )
        .orderBy("event_type")
    )


@register(
    "rolling_correlation",
    """
    with daily as (
        select event_type, date_trunc('day', ts) as day,
               cast(count(*) as bigint) as n
        from events group by 1, 2
    ),
    pairs as (
        select a.event_type as t1, b.event_type as t2, a.day,
               a.n as x, b.n as y
        from daily a join daily b
          on a.day = b.day and a.event_type < b.event_type
    ),
    win as (
        select t1, t2, day,
               cast(count(*) over w as bigint) as n,
               cast(sum(x) over w as bigint) as sx,
               cast(sum(y) over w as bigint) as sy,
               cast(sum(x * y) over w as bigint) as sxy,
               cast(sum(x * x) over w as bigint) as sxx,
               cast(sum(y * y) over w as bigint) as syy
        from pairs
        window w as (partition by t1, t2 order by day
                     rows between 6 preceding and current row)
    )
    select t1, t2, day,
           round((cast(n as double) * cast(sxy as double)
                  - cast(sx as double) * cast(sy as double))
                 / nullif(sqrt(cast(n as double) * cast(sxx as double)
                               - cast(sx as double) * cast(sx as double))
                          * sqrt(cast(n as double) * cast(syy as double)
                                 - cast(sy as double) * cast(sy as double)),
                          0.0), 6) as corr_7d
    from win
    where n >= 7
    order by t1, t2, day
    """,
)
def rolling_correlation(spark, sf_dir):
    """ROLLING 7-day PEARSON CORRELATION between every pair of daily
    event-type volume series — the co-movement monitor (did purchases
    decouple from clicks this week? are errors tracking traffic or
    spiking independently?). Day-grain aggregation first (the fact
    table collapses map-side to days x types rows), then an equi-join
    on day builds the C(types,2) pair panel — NEVER a cross join: the
    inequality is a post-join filter on a day-keyed hash join. Window
    moments (n, Sx, Sy, Sxy, Sxx, Syy) over the trailing 7 OBSERVED
    days per pair are all EXACT int64 (counts squared x 7 — safe to
    ~1e9 events/day); Pearson r is then ONE identical IEEE double
    expression, sqrt is correctly-rounded, a zero variance nulls via
    nullif on both engines, and round 6 guards display. Rows emit only
    at full 7-day windows. Scale: everything after the first aggregate
    is bounded by calendar days x type-pairs."""
    ev = _tbl(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").cast("bigint").alias("n"))
    a = daily.select(
        F.col("event_type").alias("t1"), "day", F.col("n").alias("x")
    )
    b = daily.select(
        F.col("event_type").alias("t2"),
        F.col("day").alias("day2"),
        F.col("n").alias("y"),
    )
    pairs = a.join(
        b, (F.col("day") == F.col("day2")) & (F.col("t1") < F.col("t2"))
    ).select("t1", "t2", "day", "x", "y")
    w = (
        Window.partitionBy("t1", "t2")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    win = pairs.select(
        "t1",
        "t2",
        "day",
        F.count("*").over(w).cast("bigint").alias("n"),
        F.sum("x").over(w).cast("bigint").alias("sx"),
        F.sum("y").over(w).cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).cast("bigint").alias("syy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    num = nd * F.col("sxy").cast("double") - sx * sy
    den = F.sqrt(nd * F.col("sxx").cast("double") - sx * sx) * F.sqrt(
        nd * F.col("syy").cast("double") - sy * sy
    )
    return (
        win.filter(F.col("n") >= 7)
        .select(
            "t1",
            "t2",
            "day",
            F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("corr_7d"),
        )
        .orderBy("t1", "t2", "day")
    )


def _ewma_oracle(depth: int = 16) -> str:
    num = " + ".join(
        f"coalesce(lag(n, {j}) over w, 0) * {1 << (depth - 1 - j)}"
        for j in range(depth)
    )
    den = " + ".join(
        f"case when lag(n, {j}) over w is not null"
        f" then {1 << (depth - 1 - j)} else 0 end"
        for j in range(depth)
    )
    return f"""
    with daily as (
        select event_type, date_trunc('day', ts) as day,
               cast(count(*) as bigint) as n
        from events group by 1, 2
    ),
    w16 as (
        select event_type, day, n,
               cast({num} as bigint) as num,
               cast({den} as bigint) as den
        from daily
        window w as (partition by event_type order by day)
    )
    select event_type, day, n,
           round(cast(num as double) / cast(den as double), 6) as ewma
    from w16
    order by event_type, day
    """


@register("ewma_event_rate", _ewma_oracle())
def ewma_event_rate(spark, sf_dir):
    """EXPONENTIALLY-WEIGHTED moving average of daily event volume,
    computed ENTIRELY JVM-side with exact integers — the scale twin of
    `pandas_ema` (which demonstrates the Arrow/pandas extension seam;
    THIS entry is what you deploy at 100 TB: no Python workers, no
    Arrow transfer, full whole-stage codegen). The half-life-one-day
    kernel alpha=1/2 makes every weight a DYADIC RATIONAL: the
    16-term truncated EWMA is sum_j lag_j * 2^(15-j) / sum_j 2^(15-j)
    — numerator and denominator are pure int64 (tail truncation error
    2^-16 is below the 6-dp display rounding), missing leading days
    shorten the kernel by dropping their weight from BOTH sums, and
    the single final division is the only FP op. No libm pow() on
    either engine — the committed-constant discipline. Plan: one
    day-grain map-side-combinable aggregate, then ONE partitioned
    window pass evaluates all 16 lags (they share the frame sort)."""
    ev = _tbl(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").cast("bigint").alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    depth = 16
    num = None
    den = None
    for j in range(depth):
        wt = 1 << (depth - 1 - j)
        lagged = F.lag("n", j).over(w)
        term_n = F.coalesce(lagged, F.lit(0)) * F.lit(wt)
        term_d = F.when(lagged.isNotNull(), F.lit(wt)).otherwise(F.lit(0))
        num = term_n if num is None else num + term_n
        den = term_d if den is None else den + term_d
    return daily.select(
        "event_type",
        "day",
        "n",
        F.round(
            num.cast("bigint").cast("double")
            / den.cast("bigint").cast("double"),
            6,
        ).alias("ewma"),
    ).orderBy("event_type", "day")


@register(
    "ab_test_proportions",
    """
    with u as (
        select user_id,
               max(case when event_type = 'purchase' and value > 150.0
                        then 1 else 0 end) as conv
        from events group by user_id
    ),
    armed as (
        select case when md5(cast(user_id as varchar)) < '8'
                    then 'A' else 'B' end as arm,
               conv
        from u
    ),
    agg as (
        select cast(sum(case when arm = 'A' then 1 else 0 end) as bigint)
                   as n_a,
               cast(sum(case when arm = 'A' then conv else 0 end) as bigint)
                   as x_a,
               cast(sum(case when arm = 'B' then 1 else 0 end) as bigint)
                   as n_b,
               cast(sum(case when arm = 'B' then conv else 0 end) as bigint)
                   as x_b
        from armed
    )
    select n_a, x_a, n_b, x_b,
           round(cast(x_a as double) / cast(n_a as double), 6) as rate_a,
           round(cast(x_b as double) / cast(n_b as double), 6) as rate_b,
           round((cast(x_a as double) / cast(n_a as double)
                  - cast(x_b as double) / cast(n_b as double))
                 / nullif(sqrt((cast(x_a + x_b as double)
                         / cast(n_a + n_b as double))
                        * (1.0 - cast(x_a + x_b as double)
                                 / cast(n_a + n_b as double))
                        * (1.0 / cast(n_a as double)
                           + 1.0 / cast(n_b as double))), 0.0), 6) as z_stat
    from agg
    """,
)
def ab_test_proportions(spark, sf_dir):
    """TWO-PROPORTION z-TEST over a deterministic 50/50 user split —
    the experiment-analysis primitive (did arm A convert better than
    arm B, and is the lift larger than chance?). Assignment is the
    md5-bucket discipline every sampling entry uses (first hex digit
    < '8' -> A: deterministic, uniform, reproducible on any engine —
    the split a real experimentation system derives from a salted
    user hash). Conversion (>= 1 high-value purchase,
    value > 150 — an exact double compare, identical on both engines)
    collapses events to one row per user map-side; a fully-converted
    or fully-unconverted population has zero pooled variance, so the
    z denominator nullif-guards to NULL rather than erroring under
    ANSI division; the 2x2 cell counts are EXACT int64 from
    ONE global aggregate (no window, no join), and the pooled-variance
    z = (p1-p2)/sqrt(p(1-p)(1/n1+1/n2)) evaluates as a single
    identical IEEE double expression on both engines (sqrt correctly
    rounded; round 6 display guard). Scale: user-grain partial
    aggregation then a 1-row reduce — the cheapest possible shape;
    the chi2/KS/PSI entries cover the distributional siblings, this
    covers the canonical conversion-rate test."""
    ev = _tbl(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > 150.0),
                1,
            ).otherwise(0)
        ).alias("conv")
    )
    armed = u.select(
        F.when(
            F.md5(F.col("user_id").cast("string")) < "8", "A"
        ).otherwise("B").alias("arm"),
        "conv",
    )
    agg = armed.agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == "A", F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("x_a"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("arm") == "B", F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("x_b"),
    )
    na, xa = F.col("n_a").cast("double"), F.col("x_a").cast("double")
    nb, xb = F.col("n_b").cast("double"), F.col("x_b").cast("double")
    pa, pb = xa / na, xb / nb
    pp = (F.col("x_a") + F.col("x_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    z = (pa - pb) / F.nullif(
        F.sqrt(
            pp * (F.lit(1.0) - pp) * (F.lit(1.0) / na + F.lit(1.0) / nb)
        ),
        F.lit(0.0),
    )
    return agg.select(
        "n_a",
        "x_a",
        "n_b",
        "x_b",
        F.round(pa, 6).alias("rate_a"),
        F.round(pb, 6).alias("rate_b"),
        F.round(z, 6).alias("z_stat"),
    )


@register(
    "user_retention_curve",
    """
    with life as (
        select user_id,
               date_diff('day', min(cast(ts as date)),
                         max(cast(ts as date))) as lifespan
        from events group by user_id
    ),
    tot as (select cast(count(*) as bigint) as n_users from life),
    fan as (
        select unnest(generate_series(0, least(lifespan, 30))) as d
        from life
    ),
    ret as (
        select d, cast(count(*) as bigint) as n_retained
        from fan group by d
    )
    select cast(d as int) as day_n, n_retained,
           round(cast(n_retained as double) / cast(t.n_users as double), 6)
               as retained_frac
    from ret cross join tot t
    order by day_n
    """,
)
def user_retention_curve(spark, sf_dir):
    """SURVIVAL/RETENTION CURVE — the fraction of users still active d
    days after their first event, for d = 0..30 (the product-health
    curve every growth dashboard opens with; cohort_retention slices
    by signup month x month, THIS is the marginal lifespan survival
    function S(d)). Lifespans are exact day diffs from one user-grain
    aggregate; the monotone "alive at day d" counts avoid both a
    global cumulative window (lint-barred) and a 31-way rescan with
    the sequence-explode trick: each user fans out to every day it
    survived (<= 31 map-side rows), one group-by counts them, and the
    1-row user total attaches for the fraction (exact ints before one
    division). Scale: events collapse to one row per user map-side;
    everything after is <= 31 rows per mapper partial."""
    ev = _tbl(spark, sf_dir, "events")
    life = ev.groupBy("user_id").agg(
        F.datediff(
            F.max(F.col("ts").cast("date")), F.min(F.col("ts").cast("date"))
        ).alias("lifespan")
    )
    tot = life.agg(F.count("*").cast("bigint").alias("n_users"))
    ret = (
        life.select(
            F.explode(
                F.sequence(F.lit(0), F.least(F.col("lifespan"), F.lit(30)))
            ).alias("d")
        )
        .groupBy("d")
        .agg(F.count("*").cast("bigint").alias("n_retained"))
    )
    return (
        ret.crossJoin(F.broadcast(tot))
        .select(
            F.col("d").cast("int").alias("day_n"),
            "n_retained",
            F.round(
                F.col("n_retained").cast("double")
                / F.col("n_users").cast("double"),
                6,
            ).alias("retained_frac"),
        )
        .orderBy("day_n")
    )


@register(
    "histogram_quantile_interp",
    """
    with stats as (
        select min(value) as mn, max(value) as mx,
               cast(count(*) as bigint) as total
        from events where value is not null
    ),
    binned as (
        select case when s.mx > s.mn
                    then least(15, greatest(0, cast(floor(
                        (e.value - s.mn) * 16.0 / (s.mx - s.mn)) as int)))
                    else 0 end as bin,
               s.mn, s.mx, s.total
        from events e cross join stats s
        where e.value is not null
    ),
    per_bin as (
        select bin, mn, mx, total,
               cast(count(*) as bigint) as n_b
        from binned group by bin, mn, mx, total
    ),
    cum as (
        select cb as bin, cast(sum(n_b) as bigint) as cum_n
        from (select unnest(generate_series(bin, 15)) as cb, n_b
              from per_bin)
        group by cb
    ),
    pb as (
        select p.bin, p.mn, p.mx, p.total, p.n_b, c.cum_n
        from per_bin p join cum c using (bin)
    ),
    choice as (
        select q_pct, min(bin) as bin
        from (select unnest([50, 90, 99]) as q_pct, bin, cum_n, total
              from pb)
        where cum_n * 100 >= q_pct * total
        group by q_pct
    )
    select cast(ch.q_pct as int) as q_pct, pb.bin, pb.n_b, pb.cum_n,
           round(pb.mn + ((pb.mx - pb.mn) / 16.0)
                 * (cast(pb.bin as double)
                    + (cast(ch.q_pct * pb.total as double) / 100.0
                       - cast(pb.cum_n - pb.n_b as double))
                      / cast(pb.n_b as double)), 6) as est_value
    from choice ch join pb on ch.bin = pb.bin
    order by q_pct
    """,
)
def histogram_quantile_interp(spark, sf_dir):
    """HISTOGRAM-QUANTILE with linear interpolation — the PromQL
    ``histogram_quantile()`` analog: estimate P50/P90/P99 from a
    16-bucket equal-width histogram by interpolating WITHIN the
    bucket that crosses the target rank. Completes the quantile
    triptych: percentile_agg is exact (needs the raw values),
    approx_percentile_sketch is mergeable-sketch (needs Spark's
    binary state), THIS is the only form computable from
    pre-aggregated histogram counters — the shape observability
    pipelines actually ship, and the estimator whose bucket-width
    error the exact entry calibrates. Determinism: bin assignment,
    threshold crossing (cum*100 >= q*total, exact ints) and the
    interpolation run the SAME IEEE sequence on both engines; the
    crossing bucket provably has n_b > 0 (cum strictly increases at
    the crossing), so the division is safe under ANSI. Scale: one
    global (min, max, count) attach, one 16-group aggregate, then a
    SINGLE linear flow over <= 16-row frames — cumulative counts via
    the sequence-explode fan-out and the crossing bucket picked by an
    argmin STRUCT (no join-back: re-using the post-attach frame would
    replay the scalar attach once per branch, the vocab_growth_curve
    lesson), no unpartitioned window, no rescan per quantile."""
    ev = _tbl(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    stats = ev.agg(
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
        F.count("*").cast("bigint").alias("total"),
    )
    binned = ev.crossJoin(F.broadcast(stats)).select(
        F.when(
            F.col("mx") > F.col("mn"),
            F.least(
                F.lit(15),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col("value") - F.col("mn"))
                        * 16.0
                        / (F.col("mx") - F.col("mn"))
                    ).cast("int"),
                ),
            ),
        )
        .otherwise(0)
        .alias("bin"),
        "mn",
        "mx",
        "total",
    )
    per_bin = binned.groupBy("bin", "mn", "mx", "total").agg(
        F.count("*").cast("bigint").alias("n_b")
    )
    # one fan-out computes, per target bucket cb, BOTH the cumulative
    # count and that bucket's own increment (conditional sum) plus the
    # constant stats — per_bin is consumed exactly once
    pb2 = (
        per_bin.select(
            F.explode(F.sequence(F.col("bin"), F.lit(15))).alias("cb"),
            "bin",
            "n_b",
            "mn",
            "mx",
            "total",
        )
        .groupBy("cb")
        .agg(
            F.sum("n_b").cast("bigint").alias("cum_n"),
            F.sum(
                F.when(F.col("bin") == F.col("cb"), F.col("n_b")).otherwise(0)
            )
            .cast("bigint")
            .alias("n_at"),
            F.max("mn").alias("mn"),
            F.max("mx").alias("mx"),
            F.max("total").alias("total"),
        )
    )
    chosen = (
        pb2.select(
            F.explode(F.array(F.lit(50), F.lit(90), F.lit(99))).alias(
                "q_pct"
            ),
            "cb",
            "cum_n",
            "n_at",
            "mn",
            "mx",
            "total",
        )
        .filter(F.col("cum_n") * 100 >= F.col("q_pct") * F.col("total"))
        .groupBy("q_pct")
        .agg(
            F.min(
                F.struct("cb", "n_at", "cum_n", "mn", "mx", "total")
            ).alias("s")
        )
        .select(
            "q_pct",
            F.col("s.cb").alias("bin"),
            F.col("s.n_at").alias("n_b"),
            F.col("s.cum_n").alias("cum_n"),
            F.col("s.mn").alias("mn"),
            F.col("s.mx").alias("mx"),
            F.col("s.total").alias("total"),
        )
    )
    est = F.col("mn") + ((F.col("mx") - F.col("mn")) / F.lit(16.0)) * (
        F.col("bin").cast("double")
        + (
            (F.col("q_pct") * F.col("total")).cast("double") / F.lit(100.0)
            - (F.col("cum_n") - F.col("n_b")).cast("double")
        )
        / F.col("n_b").cast("double")
    )
    return chosen.select(
        F.col("q_pct").cast("int").alias("q_pct"),
        "bin",
        "n_b",
        "cum_n",
        F.round(est, 6).alias("est_value"),
    ).orderBy("q_pct")


def _acf_oracle(max_lag: int = 7) -> str:
    arms = "\n        union all\n".join(
        f"        select event_type, {k} as lag_k, n as x, l{k} as y"
        f" from lagged where l{k} is not null"
        for k in range(1, max_lag + 1)
    )
    lag_cols = ",\n               ".join(
        f"lag(n, {k}) over w as l{k}" for k in range(1, max_lag + 1)
    )
    return f"""
    with daily as (
        select event_type, date_trunc('day', ts) as day,
               cast(count(*) as bigint) as n
        from events group by 1, 2
    ),
    lagged as (
        select event_type, n,
               {lag_cols}
        from daily
        window w as (partition by event_type order by day)
    ),
    pairs as (
{arms}
    ),
    m as (
        select event_type, lag_k,
               cast(count(*) as bigint) as np,
               cast(sum(x) as bigint) as sx,
               cast(sum(y) as bigint) as sy,
               cast(sum(x * y) as bigint) as sxy,
               cast(sum(x * x) as bigint) as sxx,
               cast(sum(y * y) as bigint) as syy
        from pairs group by event_type, lag_k
    )
    select event_type, cast(lag_k as int) as lag_k, np as n_pairs,
           round((cast(np as double) * cast(sxy as double)
                  - cast(sx as double) * cast(sy as double))
                 / nullif(sqrt(cast(np as double) * cast(sxx as double)
                               - cast(sx as double) * cast(sx as double))
                          * sqrt(cast(np as double) * cast(syy as double)
                                 - cast(sy as double) * cast(sy as double)),
                          0.0), 6) as acf
    from m
    order by event_type, lag_k
    """


@register("ts_autocorrelation", _acf_oracle())
def ts_autocorrelation(spark, sf_dir):
    """AUTOCORRELATION FUNCTION (lags 1-7) of each event-type's daily
    volume — the seasonality detector (a weekly cycle shows as an ACF
    spike at lag 7, a trending series decays slowly, white noise sits
    near 0; this is the diagnostic that tells you whether
    ts_seasonal_anomaly's day-of-week baseline is even justified).
    One partitioned window pass evaluates all 7 lags (they share the
    frame sort — the ewma_event_rate discipline); the (lag, x, y)
    pairs unpivot via a map-side struct explode, the per-(type, lag)
    moments are exact int64 (counts x counts x days — safe to ~1e8
    events/day), and Pearson r is ONE identical IEEE expression with
    a nullif zero-variance guard. Scale: the fact table collapses
    map-side to day grain; everything after is days x types x 7 rows."""
    ev = _tbl(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").cast("bigint").alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "n",
        *[F.lag("n", k).over(w).alias(f"l{k}") for k in range(1, 8)],
    )
    structs = [
        F.struct(F.lit(k).alias("lag_k"), F.col(f"l{k}").alias("y"))
        for k in range(1, 8)
    ]
    pairs = (
        lagged.select(
            "event_type", "n", F.explode(F.array(*structs)).alias("p")
        )
        .select(
            "event_type",
            F.col("p.lag_k").alias("lag_k"),
            F.col("n").alias("x"),
            F.col("p.y").alias("y"),
        )
        .filter(F.col("y").isNotNull())
    )
    m = pairs.groupBy("event_type", "lag_k").agg(
        F.count("*").cast("bigint").alias("np"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    npd = F.col("np").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    num = npd * F.col("sxy").cast("double") - sx * sy
    den = F.sqrt(npd * F.col("sxx").cast("double") - sx * sx) * F.sqrt(
        npd * F.col("syy").cast("double") - sy * sy
    )
    return m.select(
        "event_type",
        F.col("lag_k").cast("int").alias("lag_k"),
        F.col("np").alias("n_pairs"),
        F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("acf"),
    ).orderBy("event_type", "lag_k")


@register(
    "streaming_ohlc_bars",
    """
    with b as (
        select event_type, date_trunc('minute', ts) as bar_ts,
               ts, event_id, value
        from events where value is not null
    ),
    o as (
        select event_type, bar_ts, value as open
        from b
        qualify row_number() over (
            partition by event_type, bar_ts
            order by ts, event_id, value) = 1
    ),
    c as (
        select event_type, bar_ts, value as close
        from b
        qualify row_number() over (
            partition by event_type, bar_ts
            order by ts desc, event_id desc, value desc) = 1
    )
    select g.bar_ts, g.event_type, o.open, g.high, g.low, c.close, g.n
    from (
        select event_type, bar_ts, max(value) as high, min(value) as low,
               cast(count(*) as bigint) as n
        from b group by event_type, bar_ts
    ) g
    join o using (event_type, bar_ts)
    join c using (event_type, bar_ts)
    """,
)
def streaming_ohlc_bars_q(spark, sf_dir):
    """The STREAMING face of ohlc_bars — the same mergeable
    struct-min/max aggregate running under Structured Streaming
    (watermark + tumbling window + state store, availableNow drain):
    a single drain over the static source must equal the batch bars.
    The struct-ordered argmin/argmax matters MORE here than in batch —
    streaming state merges partial aggregates per micro-batch, and
    lexicographic struct min/max is associative/commutative where
    "first row in window order" is not even well-defined across
    batches. Oracle: two QUALIFY row_number passes + one group-by,
    joined (the batch entry's oracle shape, same tiebreaks)."""
    from database_extractor_spark.streaming import streaming_ohlc_bars

    return streaming_ohlc_bars(spark, os.path.join(sf_dir, "events.parquet"))


@register(
    "user_behavior_entropy",
    """
    with c as (
        select user_id, event_type, cast(count(*) as bigint) as c
        from events group by user_id, event_type
    ),
    u as (
        select user_id,
               cast(sum(c) as bigint) as n,
               cast(count(*) as bigint) as n_types,
               cast(sum(cast(c * ln(cast(c as double)) as decimal(28,12)))
                    as double) as clc
        from c group by user_id
    )
    select user_id, n as n_events, n_types,
           round(ln(cast(n as double)) - clc / cast(n as double), 6)
               as entropy
    from u
    order by user_id
    """,
)
def user_behavior_entropy(spark, sf_dir):
    """BEHAVIORAL-VARIETY ENTROPY per user — the Shannon entropy of
    each user's event-type mix (0 = does exactly one thing: a bot, a
    monitor, a scraper; ln(5) = uses every feature equally). The
    temporal fingerprint interarrival_burstiness and this VARIETY
    fingerprint are orthogonal axes of the same abuse/engagement
    screen — a periodic one-event-type account flags on both. Form:
    H = ln(n) - (1/n)*sum(c*ln c), so the per-(user, type) terms are
    c*ln(c) doubles summed through decimals (aggregation-order
    independent; ln is evaluated on identical exact-int-valued
    doubles on both engines — the corpus_slice_jsd discipline) and
    the final expression is one identical IEEE sequence, round 6.
    Plan: one (user, type)-grain map-side-combinable aggregate, one
    user-grain rollup — two small exchanges, no windows, no joins."""
    ev = _tbl(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count("*").cast("bigint").alias("c")
    )
    clc = F.sum(
        (F.col("c") * F.log(F.col("c").cast("double"))).cast(
            "decimal(28,12)"
        )
    ).cast("double")
    u = c.groupBy("user_id").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("n_types"),
        clc.alias("clc"),
    )
    return u.select(
        "user_id",
        F.col("n").alias("n_events"),
        "n_types",
        F.round(
            F.log(F.col("n").cast("double"))
            - F.col("clc") / F.col("n").cast("double"),
            6,
        ).alias("entropy"),
    ).orderBy("user_id")


@register(
    "dau_mau_stickiness",
    """
    with d as (
        select date_trunc('month', ts) as month,
               cast(ts as date) as day, user_id
        from events
    ),
    daily as (
        select month, day,
               cast(count(distinct user_id) as bigint) as dau
        from d group by month, day
    ),
    monthly as (
        select month, cast(count(distinct user_id) as bigint) as mau
        from d group by month
    ),
    avg_d as (
        select month,
               cast(count(*) as bigint) as n_days,
               cast(sum(dau) as bigint) as dau_sum
        from daily group by month
    )
    select a.month, a.n_days, a.dau_sum, m.mau,
           round(cast(a.dau_sum as double) / cast(a.n_days as double), 6)
               as avg_dau,
           round(cast(a.dau_sum as double)
                 / (cast(a.n_days as double) * cast(m.mau as double)), 6)
               as stickiness
    from avg_d a join monthly m using (month)
    order by a.month
    """,
)
def dau_mau_stickiness(spark, sf_dir):
    """DAU/MAU STICKINESS per calendar month — mean daily active users
    over monthly active users (the engagement-frequency ratio every
    product review opens with: 1.0 = every monthly user shows up every
    day, ~0.03 = monthly users touch the product once). Exactness:
    both distinct counts are exact (the HLL entries are the sketch
    path when 2% error is acceptable at 100 TB — this is their exact
    calibration reference at month grain), the month join is an
    equi-join on the handful of month rows, and the two ratios divide
    exact int64 sums once. Plan: one (month, day) distinct + one
    month distinct — two map-side partial-distinct exchanges over the
    same scan; everything after is months x 1 rows."""
    ev = _tbl(spark, sf_dir, "events")
    d = ev.select(
        F.date_trunc("month", F.col("ts")).alias("month"),
        F.col("ts").cast("date").alias("day"),
        "user_id",
    )
    daily = d.groupBy("month", "day").agg(
        F.countDistinct("user_id").cast("bigint").alias("dau")
    )
    monthly = d.groupBy("month").agg(
        F.countDistinct("user_id").cast("bigint").alias("mau")
    )
    avg_d = daily.groupBy("month").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum("dau").cast("bigint").alias("dau_sum"),
    )
    return (
        avg_d.join(F.broadcast(monthly), "month")
        .select(
            "month",
            "n_days",
            "dau_sum",
            "mau",
            F.round(
                F.col("dau_sum").cast("double") / F.col("n_days").cast("double"),
                6,
            ).alias("avg_dau"),
            F.round(
                F.col("dau_sum").cast("double")
                / (
                    F.col("n_days").cast("double")
                    * F.col("mau").cast("double")
                ),
                6,
            ).alias("stickiness"),
        )
        .orderBy("month")
    )


@register(
    "temporal_split_embargo",
    """
    with s as (
        select case when ts < timestamp '2024-01-20' then 'train'
                    when ts < timestamp '2024-01-22' then 'embargo'
                    else 'test' end as split,
               ts, user_id
        from events
    )
    select split,
           cast(count(*) as bigint) as n_events,
           cast(count(distinct user_id) as bigint) as n_users,
           min(ts) as min_ts,
           max(ts) as max_ts
    from s group by split
    order by split
    """,
)
def temporal_split_embargo(spark, sf_dir):
    """TEMPORAL train/test split with an EMBARGO gap — the third
    leakage control, distinct from both md5 content splitting
    (split_train_val_test: WHICH rows) and n-gram decontamination
    (eval_split_decontaminated: shared CONTENT): this one blocks
    leakage through TIME — autocorrelated signals let a model peek at
    test-period state through train rows adjacent in time, so the
    standard purge (de Prado's purged/embargoed CV, public) drops a
    buffer window between the last train point and the first test
    point. Train < 2024-01-20, a 2-day embargo is EXCLUDED from both
    sides, test >= 2024-01-22. Output is the per-split audit row
    (event/user counts + actual min/max ts) whose boundary columns
    PROVE the gap: max(train.ts) < embargo start and min(test.ts) >=
    embargo end are both visible in the result, so a downstream
    consumer can assert the contract instead of trusting it. Plan:
    one scan, a 3-way CASE, one map-side-combinable aggregate (the
    distinct adds the usual per-split dedup exchange); the split
    predicate is a timestamp compare that pushes to the parquet scan
    when a consumer materializes one side. No FP anywhere."""
    ev = _tbl(spark, sf_dir, "events")
    split = (
        F.when(F.col("ts") < F.lit("2024-01-20").cast("timestamp"), "train")
        .when(F.col("ts") < F.lit("2024-01-22").cast("timestamp"), "embargo")
        .otherwise("test")
    )
    return (
        ev.select(split.alias("split"), "ts", "user_id")
        .groupBy("split")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
        )
        .orderBy("split")
    )


@register(
    "topk_membership_churn",
    """
    with a as (
        select user_id, cast(count(*) as bigint) as n
        from events
        where ts >= timestamp '2024-01-01' and ts < timestamp '2024-01-16'
        group by user_id
        order by n desc, user_id limit 10
    ),
    b as (
        select user_id, cast(count(*) as bigint) as n
        from events
        where ts >= timestamp '2024-01-16' and ts < timestamp '2024-01-31'
        group by user_id
        order by n desc, user_id limit 10
    )
    select cast((select count(*) from a join b using (user_id)) as bigint)
               as n_stayed,
           cast((select count(*) from a
                 where user_id not in (select user_id from b)) as bigint)
               as n_exited,
           cast((select count(*) from b
                 where user_id not in (select user_id from a)) as bigint)
               as n_entered,
           round(cast((select count(*) from a join b using (user_id))
                      as double)
                 / cast((select count(*) from a) +
                        (select count(*) from b) -
                        (select count(*) from a join b using (user_id))
                        as double), 6) as topk_jaccard
    """,
)
def topk_membership_churn(spark, sf_dir):
    """TOP-K MEMBERSHIP CHURN between two adjacent periods — the
    rank-STABILITY monitor (distinct capability vs
    approx_topk_heavy_hitters, which reports ONE period's top-k, and
    vs ks_test_drift, which compares full DISTRIBUTIONS: this tracks
    whether the specific head entities a system pins resources on —
    cache entries, review queues, capacity plans — are still the same
    entities next period). Top-10 most-active users in the first half
    of January vs the second half, reduced to the stayed/exited/
    entered counts and the Jaccard of the two membership sets. Plan:
    two TakeOrdered(10) heads share one scan via a half-month CASE
    pivot... deliberately NOT: each half aggregates after its own
    pushed time-range filter (partition pruning at 100 TB beats the
    shared-scan trick — the flagship's DataFilters discipline), then
    two 10-row frames full-outer-join driver-free and collapse to ONE
    audit row of exact integer counts; ties at rank 10 break on
    user_id on both engines."""
    ev = _tbl(spark, sf_dir, "events")

    def topk(lo: str, hi: str):
        return (
            ev.filter(
                (F.col("ts") >= F.lit(lo).cast("timestamp"))
                & (F.col("ts") < F.lit(hi).cast("timestamp"))
            )
            .groupBy("user_id")
            .agg(F.count("*").cast("bigint").alias("n"))
            .orderBy(F.desc("n"), "user_id")
            .limit(10)
        )

    a = topk("2024-01-01", "2024-01-16").select("user_id")
    b = topk("2024-01-16", "2024-01-31").select("user_id")
    j = a.withColumn("in_a", F.lit(1)).join(
        b.withColumn("in_b", F.lit(1)), "user_id", "full_outer"
    )
    in_a = F.coalesce("in_a", F.lit(0))
    in_b = F.coalesce("in_b", F.lit(0))
    return j.agg(
        F.sum(in_a * in_b).cast("bigint").alias("n_stayed"),
        F.sum(in_a * (F.lit(1) - in_b)).cast("bigint").alias("n_exited"),
        F.sum((F.lit(1) - in_a) * in_b).cast("bigint").alias("n_entered"),
        F.round(
            F.sum(in_a * in_b).cast("double") / F.count("*").cast("double"),
            6,
        ).alias("topk_jaccard"),
    )
