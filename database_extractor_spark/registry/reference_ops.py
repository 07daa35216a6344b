"""Reference-parity operators (SURVEY.md §2.1) and the first relational surface block (§2.2).

Split out of the flat registry.py in round 14; entry bodies are
unchanged — see registry/__init__.py for the aggregation contract.
"""
from __future__ import annotations

import datetime
import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import Window

from database_extractor_spark.operators import core as C
from database_extractor_spark.operators import relational as R
from database_extractor_spark.operators import similarity as S
from database_extractor_spark import timeutil
from database_extractor_spark.extract import query_database

from database_extractor_spark.registry._base import (
    EVENT_TYPES,
    TIME_FMT,
    register,
    _tbl,
)

# Reference-parity operators (SURVEY.md §2.1)
# ==========================================================================

_FLAGSHIP_CASES = ", ".join(
    f"max(case when event_type = '{t}' then v end) as {t}" for t in EVENT_TYPES
)

@register(
    "flagship_day_extract",
    f"""
    with binned as (
        select date_trunc('second', ts) as ts, event_type,
               arg_max(value, ts) as v
        from events
        where ts >= timestamp '2024-01-05' and ts < timestamp '2024-01-06'
        group by 1, 2
    )
    select ts, {_FLAGSHIP_CASES} from binned group by ts
    -- dropna(how='all') parity (degenerate audit r15): a second whose
    -- only points carry NULL values pivots to an all-NULL row, which
    -- the engine (like the reference's pandas dropna) removes
    having count(v) > 0
    order by ts
    """,
)
def flagship_day_extract(spark, sf_dir):
    """The reference's production pipeline (O1-O11): scan -> [start,stop) ->
    predicate -> 1s take-last downsample -> pivot ts x event_type -> sort.
    Reference: database_extractor.py:251-323,335-355."""
    return query_database(
        spark,
        source=os.path.join(sf_dir, "events.parquet"),
        query_time="2024-01-05T00:00:00Z",
        delta_time_end=(0, 24, 0, 0),
        filter="event_type RLIKE '.*'",
        column_key="event_type",
        time_col="ts",
        value_col="value",
        pivot_values=EVENT_TYPES,
        sort_by=["ts"],
        aggregate_window="1 second",
    )


@register(
    "o01_scan_project",
    "select event_id, event_type, value from events",
)
def o01_scan_project(spark, sf_dir):
    """O1 bucket scan + projection (column pruning reaches the parquet
    reader). Reference: database_extractor.py:291."""
    return _tbl(spark, sf_dir, "events").select("event_id", "event_type", "value")


@register(
    "o02_time_range_filter",
    """
    select event_id, ts, event_type, value from events
    where ts >= timestamp '2024-01-10' and ts < timestamp '2024-01-12'
    """,
)
def o02_time_range_filter(spark, sf_dir):
    """O2 half-open [start, stop). Reference: database_extractor.py:292."""
    ev = _tbl(spark, sf_dir, "events")
    return C.time_range(ev, "ts", "2024-01-10 00:00:00", "2024-01-12 00:00:00").select(
        "event_id", "ts", "event_type", "value"
    )


@register(
    "o03_time_shift_hours",
    """
    select event_id, ts - interval 8 hour as ts_local from events
    where ts < timestamp '2024-01-03'
    """,
)
def o03_time_shift_hours(spark, sf_dir):
    """O3 fixed integer-hour timeShift. Reference: database_extractor.py:293."""
    ev = _tbl(spark, sf_dir, "events").filter(F.col("ts") < F.lit("2024-01-03"))
    return C.time_shift(ev, "ts", hours=-8).select("event_id", F.col("ts").alias("ts_local"))


@register(
    "o03b_time_shift_zone",
    """
    select event_id, timezone('America/Vancouver', timezone('UTC', ts)) as ts_local
    from events where ts < timestamp '2024-01-03'
    """,
)
def o03b_time_shift_zone(spark, sf_dir):
    """O3 idiomatic form: IANA-zone conversion (fixes the reference's
    2024-only DST table, database_extractor.py:358-366)."""
    ev = _tbl(spark, sf_dir, "events").filter(F.col("ts") < F.lit("2024-01-03"))
    return C.time_shift(ev, "ts", zone="America/Vancouver").select(
        "event_id", F.col("ts").alias("ts_local")
    )


@register(
    "o04_row_predicate",
    """
    select event_id, event_type, value from events
    where regexp_matches(event_type, '^(click|view)$') and value > 50
    """,
)
def o04_row_predicate(spark, sf_dir):
    """O4 row predicate (regex + comparison). Reference:
    database_extractor.py:294,386-387."""
    ev = _tbl(spark, sf_dir, "events")
    return C.row_predicate(ev, "event_type RLIKE '^(click|view)$' AND value > 50").select(
        "event_id", "event_type", "value"
    )


@register(
    "o05_pivot_minute",
    f"""
    with binned as (
        select date_trunc('minute', ts) as ts_min, event_type,
               arg_max(value, ts) as v
        from events group by 1, 2
    )
    select ts_min, {", ".join(f"max(case when event_type = '{t}' then v end) as {t}" for t in EVENT_TYPES)}
    from binned group by ts_min
    """,
)
def o05_pivot_minute(spark, sf_dir):
    """O5 pivot long->wide with deterministic duplicate collapse.
    Reference: database_extractor.py:295."""
    ev = _tbl(spark, sf_dir, "events")
    binned = C.downsample_last(ev, "ts", ["event_type"], "value", every="1 minute")
    return C.pivot_wide(
        binned.withColumnRenamed("ts", "ts_min"),
        row_key="ts_min", column_key="event_type", value_col="value",
        values=EVENT_TYPES,
    )


@register(
    "o07_multi_sort",
    """
    select event_id, ts, event_type from events order by event_type, ts
    """,
)
def o07_multi_sort(spark, sf_dir):
    """O7 multi-column global sort (kept last in plan). Reference:
    database_extractor.py:297."""
    ev = _tbl(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    return C.sort_by_columns(ev, ["event_type", "ts", "missing_col_ignored"])


@register(
    "o08_downsample_1s_last",
    """
    select date_trunc('second', ts) as ts, event_type,
           arg_max(value, ts) as value
    from events group by 1, 2
    """,
)
def o08_downsample_1s_last(spark, sf_dir):
    """O8/O10 tumbling 1s take-last on the long table. Reference:
    database_extractor.py:299 (declared), :346-347 (resample)."""
    return C.downsample_last(_tbl(spark, sf_dir, "events"), "ts", ["event_type"], "value")


@register(
    "o08b_downsample_avg_minute",
    """
    select date_trunc('minute', ts) as ts, event_type,
           cast(sum(cast(value as decimal(18,4))) as double) / count(*) as value
    from events group by 1, 2
    """,
)
def o08b_downsample_avg_minute(spark, sf_dir):
    """O8 generic aggregate_function path (fn != last), decimal-exact avg."""
    ev = _tbl(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("minute", F.col("ts")).alias("ts"), "event_type"
    ).agg(
        (F.sum(F.col("value").cast("decimal(18,4)")).cast("double") / F.count("*")).alias("value")
    )


@register(
    "o09_drop_columns",
    "select event_id, ts, event_type, value from events",
)
def o09_drop_columns(spark, sf_dir):
    """O9 tolerant negative projection (dup + absent names harmless).
    Reference: database_extractor.py:326-332,374-377."""
    ev = _tbl(spark, sf_dir, "events")
    return C.drop_columns(ev, ["user_id", "props", "user_id", "not_a_column"])


@register(
    "o11_drop_allnull_rows",
    """
    with derived as (
        select event_id,
               case when value > 50 then value end as hi,
               case when value <= 50 then value end as lo
        from events
    )
    select * from derived where hi is not null or lo is not null
    """,
)
def o11_drop_allnull_rows(spark, sf_dir):
    """O11 drop rows where all subset columns are NULL. Reference:
    database_extractor.py:348."""
    ev = _tbl(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("value") > 50, F.col("value")).alias("hi"),
        F.when(F.col("value") <= 50, F.col("value")).alias("lo"),
    )
    return C.drop_all_null_rows(ev, subset=["hi", "lo"])


@register(
    "o12_guard_min_rows",
    "select (select count(*) from events) >= 10 as ok",
)
def o12_guard_min_rows(spark, sf_dir):
    """O12 small-result guard (limit(n).count() — stops scanning at n).
    Reference: database_extractor.py:336-343, main.py:136-137."""
    ok = C.has_min_rows(_tbl(spark, sf_dir, "events"), 10)
    return spark.createDataFrame([(ok,)], "ok boolean")


@register(
    "o13_sink_roundtrip",
    """
    select strftime(date_trunc('day', ts), '%Y-%m-%d') as d, count(*) as n
    from events group by 1
    """,
)
def o13_sink_roundtrip(spark, sf_dir):
    """O13/O14 sink parity: day-partitioned parquet write -> read-back;
    no rows lost or duplicated. Reference: database_extractor.py:349-355,
    main.py:72."""
    from database_extractor_spark.sinks import write_day_partitioned

    ev = _tbl(spark, sf_dir, "events")
    out = os.path.join(tempfile.mkdtemp(prefix="sinkrt_"), "events_by_day")
    write_day_partitioned(ev, "ts", out)
    back = spark.read.parquet(out)
    return back.groupBy(
        F.date_format("date", "yyyy-MM-dd").alias("d")
    ).agg(F.count("*").alias("n"))


@register(
    "o15_time_endpoints",
    f"""
    select
      strftime(timestamp '2024-03-10 10:30:00' - interval 2 hour + interval 30 minute
               + interval 8 hour, '{TIME_FMT}') as start_utc,
      strftime(timestamp '2024-03-10 10:30:00' + interval 1 day + interval 1 hour
               + interval 8 hour, '{TIME_FMT}') as end_utc
    """,
)
def o15_time_endpoints(spark, sf_dir):
    """O15 local time + signed deltas - tz offset -> UTC window strings.
    Reference: database_extractor.py:208-237."""
    start, end = timeutil.construct_query_time_endpoints(
        "2024-03-10T10:30:00Z", (0, -2, 30, 0), (1, 1, 0, 0), tz_offset=-8
    )
    return spark.createDataFrame([(start, end)], "start_utc string, end_utc string")


@register(
    "o16_deltatime_algebra",
    f"""
    select 'str_plus' as name,
           strftime(timestamp '2024-05-16 10:00:00' - interval 2 hour, '{TIME_FMT}') as result
    union all
    select 'dt_minus',
           strftime(timestamp '2024-05-16 10:00:00' - interval 2 hour - interval 30 minute, '{TIME_FMT}')
    union all
    select 'total_seconds', cast(1*86400 + 2*3600 + 3*60 + 4 as varchar)
    """,
)
def o16_deltatime_algebra(spark, sf_dir):
    """O16 DeltaTime arithmetic protocol + Mapping splat. Reference:
    database_extractor.py:29-88."""
    d2h = timeutil.DeltaTime(0, 2, 0, 0)
    rows = [
        ("str_plus", ("2024-05-16T10:00:00Z" - d2h).strftime(TIME_FMT)),
        ("dt_minus", (datetime.datetime(2024, 5, 16, 10) - (d2h + timeutil.DeltaTime(minutes=30))).strftime(TIME_FMT)),
        ("total_seconds", str(int(timeutil.DeltaTime(1, 2, 3, 4).to_timedelta().total_seconds()))),
    ]
    return spark.createDataFrame(rows, "name string, result string")


@register(
    "o17_shift_string_time",
    f"""
    select 'minus8h' as name,
           strftime(timestamp '2024-05-16 10:00:00' - interval 8 hour, '{TIME_FMT}') as result
    union all
    select 'plus_delta',
           strftime(timestamp '2024-05-16 10:00:00' + interval 1 day + interval 1 hour, '{TIME_FMT}')
    union all
    select 'noop', strftime(timestamp '2024-05-16 10:00:00', '{TIME_FMT}')
    """,
)
def o17_shift_string_time(spark, sf_dir):
    """O17 parse -> shift -> format round trip (int delta = hours).
    Reference: database_extractor.py:172-184."""
    rows = [
        ("minus8h", timeutil.shift_string_time("2024-05-16T10:00:00Z", -8)),
        ("plus_delta", timeutil.shift_string_time("2024-05-16T10:00:00Z", timeutil.DeltaTime(1, 1, 0, 0))),
        ("noop", timeutil.shift_string_time("2024-05-16T10:00:00Z", None)),
    ]
    return spark.createDataFrame(rows, "name string, result string")


_TZ_DATES = [
    "2023-12-15", "2024-03-09", "2024-03-10", "2024-03-11",
    "2024-06-15", "2024-11-02", "2024-11-03", "2024-11-04", "2025-06-15",
]

@register(
    "o18_tz_offset_dst",
    "\nunion all\n".join(
        f"""select '{d}' as d, cast((epoch(timestamp '{d} 12:00:00')
             - epoch(timezone('America/Vancouver', timestamp '{d} 12:00:00')))/3600 as bigint)
             as offset_hours"""
        for d in _TZ_DATES
    ),
)
def o18_tz_offset_dst(spark, sf_dir):
    """O18 DST-aware integer-hour offset, all years (the reference
    hardcodes 2024; database_extractor.py:358-366). Oracle recomputes the
    offset from DuckDB's independent tz database."""
    rows = [
        (d, timeutil.timezone_offset(datetime.datetime.strptime(d, "%Y-%m-%d").replace(hour=12)))
        for d in _TZ_DATES
    ]
    return spark.createDataFrame(rows, "d string, offset_hours bigint")


@register(
    "o19_day_partition_counts",
    """
    with binned as (
        select date_trunc('second', ts) as tsb, event_type, arg_max(value, ts) as v
        from events
        where ts >= timestamp '2024-01-03' and ts < timestamp '2024-01-06'
        group by 1, 2
    ),
    -- dropna(how='all') parity (degenerate audit r15): all-NULL-value
    -- seconds are dropped by the engine pipeline before the day count
    kept as (select tsb from binned group by tsb having count(v) > 0)
    select strftime(date_trunc('day', tsb), '%Y-%m-%d') as d,
           count(distinct tsb) as n
    from kept group by 1
    """,
)
def o19_day_partition_counts(spark, sf_dir):
    """O19/O20 multi-day extraction as ONE partitioned query (the
    reference loops days on the driver; database_extractor.py:369-420)."""
    wide = query_database(
        spark,
        source=os.path.join(sf_dir, "events.parquet"),
        query_time="2024-01-03T00:00:00Z",
        delta_time_end=(0, 72, 0, 0),
        column_key="event_type",
        time_col="ts",
        value_col="value",
        pivot_values=EVENT_TYPES,
        sort_by=["ts"],
        aggregate_window="1 second",
    )
    return wide.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("d")).agg(F.count("*").alias("n"))


@register(
    "o20_datetime_list",
    """
    select unnest(generate_series(timestamp '2024-02-27', timestamp '2024-03-02',
                                  interval 1 day)) as ts
    """,
)
def o20_datetime_list(spark, sf_dir):
    """O20 stride iteration, end-inclusive like the reference's
    `while current <= end` (main.py:92); leap day included."""
    days = timeutil.generate_datetime_list("2024-02-27T00:00:00Z", "2024-03-02T00:00:00Z")
    return spark.createDataFrame([(d,) for d in days], "ts timestamp")


@register(
    "o21_config_roundtrip",
    """
    select 'bucket' as key, 'prototype-zero' as val
    union all select 'column_key', 'id'
    union all select 'aggregate_window', '1 second'
    union all select 'delta_end_hours', '24'
    union all select 'sort_by', '_time'
    """,
)
def o21_config_roundtrip(spark, sf_dir):
    """O21/O22 TOML load + dataclass splat (golden-value oracle).
    Reference: database_extractor.py:91-169, main.py:124."""
    from database_extractor_spark.config import DataExtractorQueryConfig, load_config

    body = (
        '[query]\nbucket = "prototype-zero"\ncolumn_key = "id"\n'
        'aggregate_window = "1 second"\ndelta_time_end = [0, 24, 0, 0]\n'
        'sort_by = ["_time"]\n'
    )
    with tempfile.NamedTemporaryFile("w", suffix=".toml", delete=False) as f:
        f.write(body)
        path = f.name
    cfg = DataExtractorQueryConfig(**load_config(path)["query"])
    rows = [
        ("bucket", cfg.bucket),
        ("column_key", cfg.column_key),
        ("aggregate_window", cfg.aggregate_window),
        ("delta_end_hours", str(cfg.delta_time_end.hours)),
        ("sort_by", cfg.sort_by[0]),
    ]
    return spark.createDataFrame(rows, "key string, val string")


# ==========================================================================
# Relational surface (SURVEY.md §2.2)
# ==========================================================================

@register(
    "join_inner",
    """
    select o_orderkey, c_custkey, c_mktsegment
    from orders join customer on o_custkey = c_custkey
    """,
)
def join_inner(spark, sf_dir):
    o, c = _tbl(spark, sf_dir, "orders"), _tbl(spark, sf_dir, "customer")
    return R.join_tables(o, c, on=[o.o_custkey == c.c_custkey]).select(
        "o_orderkey", "c_custkey", "c_mktsegment"
    )


@register(
    "join_left",
    """
    select c_custkey, count(o_orderkey) as n_orders
    from customer left join orders on c_custkey = o_custkey
    group by c_custkey
    """,
)
def join_left(spark, sf_dir):
    o, c = _tbl(spark, sf_dir, "orders"), _tbl(spark, sf_dir, "customer")
    j = R.join_tables(c, o, on=[c.c_custkey == o.o_custkey], how="left")
    return j.groupBy("c_custkey").agg(F.count("o_orderkey").alias("n_orders"))


@register(
    "join_semi",
    """
    select c_custkey, c_name from customer
    where c_custkey in (select o_custkey from orders where o_totalprice > 300000)
    """,
)
def join_semi(spark, sf_dir):
    o, c = _tbl(spark, sf_dir, "orders"), _tbl(spark, sf_dir, "customer")
    big = o.filter("o_totalprice > 300000")
    return R.semi_join(c, big, on=[c.c_custkey == big.o_custkey]).select("c_custkey", "c_name")


@register(
    "join_anti",
    """
    select c_custkey from customer
    where c_custkey not in (select o_custkey from orders where o_totalprice > 300000)
    """,
)
def join_anti(spark, sf_dir):
    o, c = _tbl(spark, sf_dir, "orders"), _tbl(spark, sf_dir, "customer")
    big = o.filter("o_totalprice > 300000")
    return R.anti_join(c, big, on=[c.c_custkey == big.o_custkey]).select("c_custkey")


@register(
    "join_broadcast_agg",
    """
    select p_brand, count(*) as n_items,
           cast(sum(cast(l_extendedprice as decimal(18,4))) as double) as revenue
    from lineitem join part on l_partkey = p_partkey
    group by p_brand
    """,
)
def join_broadcast_agg(spark, sf_dir):
    """Broadcast the part dimension: no shuffle of the fact table for the
    join — the canonical star-schema plan at 100 TB."""
    li, p = _tbl(spark, sf_dir, "lineitem"), _tbl(spark, sf_dir, "part")
    j = R.join_tables(li, p, on=[li.l_partkey == p.p_partkey], broadcast_right=True)
    return j.groupBy("p_brand").agg(
        F.count("*").alias("n_items"),
        R.exact_sum("l_extendedprice", "revenue"),
    )


@register(
    "join_star_5way",
    """
    select n_name,
           cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,4))) as double)
             as revenue,
           count(*) as n_lineitems
    from customer
      join orders   on c_custkey = o_custkey
      join lineitem on o_orderkey = l_orderkey
      join supplier on l_suppkey = s_suppkey
      join nation   on c_nationkey = n_nationkey
    group by n_name
    """,
)
def join_star_5way(spark, sf_dir):
    """TPC-H-Q5-shaped star join, built FACT-FIRST: lineitem is the
    stream side of every join, the dimensions hash in around it.

    r17 (guide §3.1 — check the build side): the original
    customer→orders→lineitem order made Catalyst broadcast the pruned
    LINEITEM scan (its 4-column estimate fell under the 10 MB
    threshold, while the (customer ⋈ orders) intermediate has no usable
    size estimate without CBO) — the fact table was collected to the
    driver and shipped to every executor, the inverted build choice.
    Fact-first ordering leaves each dimension as a leaf with an honest
    file-size estimate: orders/customer auto-broadcast while they fit
    and degrade to a shuffle join at scale on their own (no forced
    broadcast of an SF-linear side); supplier/nation stay hinted. One
    scan of lineitem, zero fact-side exchanges before the 25-group
    aggregate. Measured min-of-5 at sf0.1: 1.83 s -> see
    OPTIMIZATION_r17.md; plan diff: BroadcastExchange(lineitem) ->
    BroadcastExchange(orders/customer), fact side streamed."""
    c = _tbl(spark, sf_dir, "customer")
    o = _tbl(spark, sf_dir, "orders")
    li = _tbl(spark, sf_dir, "lineitem")
    s = _tbl(spark, sf_dir, "supplier")
    n = _tbl(spark, sf_dir, "nation")
    j = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast("decimal(18,4)")
    return j.groupBy("n_name").agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count("*").alias("n_lineitems"),
    )


@register(
    "agg_suite",
    """
    select l_returnflag, l_linestatus,
           cast(sum(cast(l_quantity as decimal(18,4))) as double) as sum_qty,
           cast(sum(cast(l_extendedprice as decimal(18,4))) as double) as sum_price,
           min(l_extendedprice) as min_price,
           max(l_extendedprice) as max_price,
           count(*) as n,
           count(distinct l_partkey) as n_parts,
           cast(sum(cast(l_quantity as decimal(18,4))) as double) / count(*) as avg_qty
    from lineitem
    group by l_returnflag, l_linestatus
    """,
)
def agg_suite(spark, sf_dir):
    """TPC-H-Q1-shaped aggregation suite, decimal-exact sums/avg."""
    li = _tbl(spark, sf_dir, "lineitem")
    sum_qty = F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        sum_qty.alias("sum_qty"),
        R.exact_sum("l_extendedprice", "sum_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.count("*").alias("n"),
        F.count_distinct(F.col("l_partkey")).alias("n_parts"),
        (sum_qty / F.count("*")).alias("avg_qty"),
    )


@register(
    "agg_rollup",
    """
    select o_orderstatus, o_orderpriority, count(*) as n,
           cast(sum(cast(o_totalprice as decimal(18,4))) as double) as total
    from orders group by rollup(o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup(spark, sf_dir):
    o = _tbl(spark, sf_dir, "orders")
    return R.rollup_agg(
        o, ["o_orderstatus", "o_orderpriority"],
        [F.count("*").alias("n"), R.exact_sum("o_totalprice", "total")],
    )


@register(
    "agg_cube",
    """
    select o_orderstatus, o_orderpriority, count(*) as n
    from orders group by cube(o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark, sf_dir):
    o = _tbl(spark, sf_dir, "orders")
    return R.cube_agg(o, ["o_orderstatus", "o_orderpriority"], [F.count("*").alias("n")])


@register(
    "window_rank",
    """
    select c_custkey, c_mktsegment, rn from (
        select c_custkey, c_mktsegment,
               row_number() over (partition by c_mktsegment
                                  order by c_acctbal desc, c_custkey) as rn
        from customer
    ) where rn <= 5
    """,
)
def window_rank(spark, sf_dir):
    c = _tbl(spark, sf_dir, "customer")
    return R.top_k_per_group(
        c, ["c_mktsegment"], [F.desc("c_acctbal"), F.col("c_custkey")], 5,
        keep_rank=True,
    ).select("c_custkey", "c_mktsegment", F.col("rn").cast("long").alias("rn"))


@register(
    "window_lag",
    """
    select o_orderkey,
           lag(o_totalprice) over (partition by o_custkey
                                   order by o_orderdate, o_orderkey) as prev_price
    from orders
    """,
)
def window_lag(spark, sf_dir):
    o = _tbl(spark, sf_dir, "orders")
    return R.with_lag_lead(
        o, ["o_custkey"], [F.col("o_orderdate"), F.col("o_orderkey")],
        "o_totalprice", "prev_price",
    ).select("o_orderkey", "prev_price")


@register(
    "window_running_sum",
    """
    select o_orderkey,
           cast(sum(cast(o_totalprice as decimal(18,4)))
                over (partition by o_custkey order by o_orderdate, o_orderkey
                      rows between unbounded preceding and current row) as double)
             as running_total
    from orders
    """,
)
def window_running_sum(spark, sf_dir):
    o = _tbl(spark, sf_dir, "orders")
    out = R.with_running(
        o, ["o_custkey"], [F.col("o_orderdate"), F.col("o_orderkey")],
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")), "running_total",
    )
    return out.select("o_orderkey", F.col("running_total").cast("double").alias("running_total"))


@register(
    "topk_global",
    """
    select o_orderkey, o_totalprice from orders
    order by o_totalprice desc, o_orderkey limit 10
    """,
)
def topk_global(spark, sf_dir):
    o = _tbl(spark, sf_dir, "orders")
    return R.top_k(o, [F.desc("o_totalprice"), F.col("o_orderkey")], 10).select(
        "o_orderkey", "o_totalprice"
    )


@register(
    "topk_per_group",
    """
    select o_orderstatus, o_orderkey, o_totalprice from (
        select o_orderstatus, o_orderkey, o_totalprice,
               row_number() over (partition by o_orderstatus
                                  order by o_totalprice desc, o_orderkey) as rn
        from orders
    ) where rn <= 3
    """,
)
def topk_per_group(spark, sf_dir):
    o = _tbl(spark, sf_dir, "orders")
    return R.top_k_per_group(
        o, ["o_orderstatus"], [F.desc("o_totalprice"), F.col("o_orderkey")], 3
    ).select("o_orderstatus", "o_orderkey", "o_totalprice")


@register(
    "distinct_pairs",
    "select distinct o_orderstatus, o_orderpriority from orders",
)
def distinct_pairs(spark, sf_dir):
    return _tbl(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


@register(
    "dropdup_keep_first",
    """
    select user_id, event_type, min(event_id) as event_id
    from events group by user_id, event_type
    """,
)
def dropdup_keep_first(spark, sf_dir):
    """Deterministic dropDuplicates: first row per key under a defined
    order (Spark's stock dropDuplicates keeps an arbitrary row)."""
    ev = _tbl(spark, sf_dir, "events")
    return R.drop_duplicates_ordered(
        ev.select("user_id", "event_type", "event_id"),
        ["user_id", "event_type"], [F.col("event_id")],
    )


@register(
    "set_union",
    """
    select c_nationkey as nk from customer
    union
    select s_nationkey as nk from supplier
    """,
)
def set_union(spark, sf_dir):
    c = _tbl(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = _tbl(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return R.union_distinct(c, s)


@register(
    "set_intersect",
    """
    select c_nationkey as nk from customer
    intersect
    select s_nationkey as nk from supplier
    """,
)
def set_intersect(spark, sf_dir):
    c = _tbl(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = _tbl(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return R.intersect_distinct(c, s)


@register(
    "set_except",
    """
    select c_nationkey as nk from customer
    except
    select s_nationkey as nk from supplier
    """,
)
def set_except(spark, sf_dir):
    c = _tbl(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = _tbl(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return R.except_distinct(c, s)


@register(
    "unpivot_counts",
    """
    select 'F' as status, count(*) filter (where o_orderstatus = 'F') as n from orders
    union all
    select 'O', count(*) filter (where o_orderstatus = 'O') from orders
    union all
    select 'P', count(*) filter (where o_orderstatus = 'P') from orders
    """,
)
def unpivot_counts(spark, sf_dir):
    """Wide->long inverse of the pivot (ANSI UNPIVOT semantics)."""
    o = _tbl(spark, sf_dir, "orders")
    wide = o.agg(
        *[F.count(F.when(F.col("o_orderstatus") == s, 1)).alias(s) for s in ("F", "O", "P")]
    )
    return R.unpivot_long(wide, [], ["F", "O", "P"], "status", "n")


@register(
    "string_funcs",
    """
    select p_partkey,
           lower(p_name) as lname,
           upper(p_brand) as ubrand,
           cast(length(p_name) as integer) as name_len,
           string_split(p_name, ' ')[1] as first_token,
           substr(p_type, 1, 5) as type_prefix,
           p_brand || '#' || p_type as brand_type
    from part
    """,
)
def string_funcs(spark, sf_dir):
    p = _tbl(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lname"),
        F.upper("p_brand").alias("ubrand"),
        F.length("p_name").alias("name_len"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_token"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
    )


@register(
    "math_funcs",
    """
    select l_orderkey, l_linenumber,
           abs(l_discount - 0.05) as abs_diff,
           cast(floor(l_extendedprice) as bigint) as price_floor,
           cast(ceil(l_extendedprice) as bigint) as price_ceil,
           sqrt(l_extendedprice) as price_sqrt,
           l_extendedprice * l_extendedprice as price_sq,
           l_orderkey % 7 as key_mod
    from lineitem
    """,
)
def math_funcs(spark, sf_dir):
    li = _tbl(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_diff"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        (F.col("l_extendedprice") * F.col("l_extendedprice")).alias("price_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@register(
    "json_funcs",
    """
    select event_id,
           cast(json_extract_string(props, '$.k') as bigint) as k_val
    from events
    """,
)
def json_funcs(spark, sf_dir):
    ev = _tbl(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
    )


@register(
    "array_funcs",
    """
    select vec_id,
           cast(len(embedding) as integer) as dim,
           embedding[1]::double as first_elem,
           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) as l2
    from embeddings
    """,
)
def array_funcs(spark, sf_dir):
    e = _tbl(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.col("embedding").getItem(0).cast("double").alias("first_elem"),
        S.l2_norm(F.col("embedding")).alias("l2"),
    )


@register(
    "window_analytics",
    """
    select c_custkey,
           ntile(4) over w as quartile,
           percent_rank() over w as pct_rank,
           cume_dist() over w as cume,
           first_value(c_custkey) over w as top_cust
    from customer
    window w as (partition by c_mktsegment order by c_acctbal desc, c_custkey)
    """,
)
def window_analytics(spark, sf_dir):
    """Analytic window functions (ntile / percent_rank / cume_dist /
    first_value) — rank arithmetic is integer-derived, so doubles are
    bit-identical across engines."""
    c = _tbl(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.col("c_custkey"))
    return c.select(
        "c_custkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("c_custkey").over(w).alias("top_cust"),
    )


@register(
    "datetime_funcs",
    """
    select event_id,
           cast(year(ts) as integer) as y,
           cast(month(ts) as integer) as mo,
           cast(day(ts) as integer) as d,
           cast(hour(ts) as integer) as hr,
           cast(dayofweek(ts) + 1 as integer) as dow,
           cast(date_diff('day', date '2024-01-01', ts) as integer) as days_since
    from events
    """,
)
def datetime_funcs(spark, sf_dir):
    """Scalar date/time functions. Convention note pinned by the oracle:
    Spark dayofweek is 1-based Sunday=1, DuckDB's is 0-based Sunday=0."""
    ev = _tbl(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("hr"),
        F.dayofweek("ts").alias("dow"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias("days_since"),
    )


@register(
    "conditional_funcs",
    """
    select event_id,
           case when value > 100 then 'high' when value > 50 then 'mid'
                else 'low' end as bucket,
           coalesce(value, -1.0) as val_or_default,
           nullif(event_type, 'click') as non_click_type,
           greatest(value, 50.0) as at_least_50,
           least(value, 50.0) as at_most_50
    from events
    """,
)
def conditional_funcs(spark, sf_dir):
    """Conditional scalar surface: CASE / coalesce / nullif /
    greatest / least."""
    ev = _tbl(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("value") > 100, "high").when(F.col("value") > 50, "mid")
        .otherwise("low").alias("bucket"),
        F.coalesce(F.col("value"), F.lit(-1.0)).alias("val_or_default"),
        F.nullif(F.col("event_type"), F.lit("click")).alias("non_click_type"),
        F.greatest(F.col("value"), F.lit(50.0)).alias("at_least_50"),
        F.least(F.col("value"), F.lit(50.0)).alias("at_most_50"),
    )


@register(
    "agg_collect",
    """
    select o_orderstatus,
           array_to_string(list_sort(list(distinct o_orderpriority)), ',') as priorities
    from orders group by o_orderstatus
    """,
)
def agg_collect(spark, sf_dir):
    """collect_set made deterministic: sort_array + array_join (raw
    collect_list/collect_set ordering is shuffle-dependent and would
    never hash-match an oracle)."""
    o = _tbl(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.array_join(F.sort_array(F.collect_set("o_orderpriority")), ",").alias("priorities")
    )


@register(
    "percentile_agg",
    """
    select l_returnflag,
           quantile_cont(l_extendedprice, 0.5) as med_price,
           quantile_cont(l_extendedprice, 0.9) as p90_price,
           quantile_cont(l_quantity, 0.25) as q1_qty
    from lineitem group by l_returnflag
    """,
)
def percentile_agg(spark, sf_dir):
    """Exact continuous percentiles (bit-identical to DuckDB's
    quantile_cont: same sort + linear interpolation). At 100 TB prefer
    approx_percentile (t-digest sketch; see approx_distinct for the
    sketch-op pattern)."""
    li = _tbl(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("med_price"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("p90_price"),
        F.expr("percentile(l_quantity, 0.25)").alias("q1_qty"),
    )


@register(
    "histogram_fixed_bins",
    """
    select cast(floor(value / 25.0) as bigint) as bin, count(*) as n
    from events where value is not null group by 1
    """,
)
def histogram_fixed_bins(spark, sf_dir):
    """Fixed-width histogram via floor-division bucketing — one hash
    aggregate, the scale-sane way to histogram 100 TB (vs collecting)."""
    ev = _tbl(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return ev.groupBy(
        F.floor(F.col("value") / 25.0).cast("long").alias("bin")
    ).agg(F.count("*").alias("n"))


@register(
    "map_funcs",
    """
    select event_id,
           cast(json_extract_string(props, '$.k') as bigint) as k_from_map,
           cast(len(json_keys(props)) as integer) as n_keys
    from events
    """,
)
def map_funcs(spark, sf_dir):
    """MapType surface: parse the JSON props column into map<string,bigint>
    and read it with element_at / map_keys (the open-tag-set pattern from
    FIXTURES.md)."""
    ev = _tbl(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return ev.select(
        "event_id",
        F.element_at(m, "k").alias("k_from_map"),
        F.size(F.map_keys(m)).cast("int").alias("n_keys"),
    )


# ==========================================================================
