"""Time-series extensions: as-of join, gap fill, sliding/session windows.

Split out of the flat registry.py in round 14; entry bodies are
unchanged — see registry/__init__.py for the aggregation contract.
"""
from __future__ import annotations

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


# ==========================================================================
