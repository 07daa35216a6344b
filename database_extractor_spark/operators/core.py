"""Reference-parity core operators, expressed as lazy DataFrame transforms.

Each function maps to one operator in SURVEY.md §2 / the reference pipeline
(src/database_extractor/database_extractor.py:291-298 Flux stages,
:326-355 pandas post-processing). All are pure plan constructors — no
actions, no collect — so Catalyst sees the whole chain and can push
filters/projections into the scan.

Scale notes (100 TB posture), per operator, inline below. The headline
design decision: we *downsample before pivoting* (the reference pivots raw
points, then resamples the wide frame client-side). The two orders are
semantically identical for per-(bin,key) take-last — but agg-then-pivot
shrinks data at the first shuffle (partial aggregation map-side), while
pivot-then-agg ships every raw point through the pivot. At 100 TB the
former is the only viable plan.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def time_range(df: DataFrame, ts_col: str, start, stop) -> DataFrame:
    """Half-open time-window filter: ``start <= ts < stop``.

    Parity: Flux ``range(start, stop)`` is start-inclusive / stop-exclusive
    (reference database_extractor.py:292). Inclusive-inclusive would
    double-count midnight points across day-partitioned extraction.

    Scale: a plain comparison predicate -> pushed to the parquet scan
    (row-group stats pruning) and prunes date partitions on a
    date-partitioned layout.
    """
    return df.filter((F.col(ts_col) >= F.lit(start)) & (F.col(ts_col) < F.lit(stop)))


def time_shift(df: DataFrame, ts_col: str, hours: int = 0, zone: Optional[str] = None) -> DataFrame:
    """Shift timestamps to local time.

    Two modes, matching the reference's two layers:
    - ``hours``: fixed integer-hour shift (Flux ``timeShift(duration: Nh)``,
      reference database_extractor.py:293).
    - ``zone``: IANA zone via ``from_utc_timestamp`` — the idiomatic fix for
      the reference's hardcoded 2024 DST table (database_extractor.py:358-366).
    """
    if zone is not None:
        return df.withColumn(ts_col, F.from_utc_timestamp(F.col(ts_col), zone))
    if hours == 0:
        return df
    return df.withColumn(ts_col, F.col(ts_col) + F.expr(f"INTERVAL {int(hours)} HOURS"))


def row_predicate(df: DataFrame, predicate: Union[str, Column, None]) -> DataFrame:
    """Row filter from an ANSI SQL boolean expression or a Column.

    Parity: Flux ``filter(fn: (r) => ...)`` with regex (``=~`` -> RLIKE) and
    equality predicates (reference database_extractor.py:294, :386-387).

    Scale: expression filters run inside whole-stage codegen before any
    shuffle; comparison/equality predicates additionally push to parquet
    stats. RLIKE does not push to stats but still runs in the scan stage.
    """
    if predicate is None:
        return df
    if isinstance(predicate, str):
        return df.filter(F.expr(predicate))
    return df.filter(predicate)


def deterministic_last(value_col: str, order_cols: Sequence[str], skip_nulls: bool = True) -> Column:
    """Aggregate: value at the greatest (order_cols...) tuple — a
    deterministic replacement for order-dependent ``last()``.

    Both Flux ``last`` and pandas ``resample().last()`` are defined by input
    order; Spark's ``last()`` is shuffle-order-dependent and would flap
    against any oracle. ``max_by(value, struct(order...))`` is
    deterministic, still a single-pass hash aggregate with map-side partial
    aggregation (no window-function sort), and matches DuckDB's
    ``arg_max(value, (order...))`` lexicographic struct ordering.

    ``skip_nulls=True`` (default) matches pandas ``resample().last()``,
    which returns the last *non-null* value in the bin (reference
    database_extractor.py:347): rows whose value is NULL get a NULL order
    key, and ``max_by`` ignores NULL keys — so a trailing null never
    shadows an earlier real value, and an all-null bin yields NULL.

    Performance: with ONE order column the aggregation buffer stays
    primitive and Spark plans a HashAggregate; a multi-column tiebreak
    needs a struct buffer, which demotes the plan to SortAggregate (an
    extra per-partition sort — measurable at scale). So pass tiebreakers
    only when the order column genuinely has duplicates within a group;
    with unique-per-group timestamps (the common case for sensor streams)
    the single-column form is both deterministic and the fastest plan.
    """
    if len(order_cols) == 1:
        key = F.col(order_cols[0])
    else:
        key = F.struct(*[F.col(c) for c in order_cols])
    if skip_nulls:
        key = F.when(F.col(value_col).isNotNull(), key)
    return F.max_by(F.col(value_col), key)


def downsample_last(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    value_col: str,
    every: str = "1 second",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Tumbling-window take-last per key, on the *long* table.

    Parity: the reference's ``resample("1s").last()`` on the wide frame
    (database_extractor.py:346-347) and the declared-but-disabled Flux
    ``aggregateWindow(every: 1s, fn: last, createEmpty: false)``
    (database_extractor.py:299). Bins are labeled by their left edge
    (pandas convention) and empty bins are never emitted (createEmpty:
    false), both of which ``date_trunc`` + groupBy give for free.

    Output schema: ``(ts, *key_cols, value_col)`` — long format, one row
    per non-empty (bin, key).

    Scale: one hash-aggregate shuffle keyed on (bin, keys); partial
    aggregation collapses most duplicates map-side. At 100 TB this is the
    operator that shrinks the data, so it runs as early as possible —
    before pivot, never after.
    """
    bin_col = _floor_time(F.col(ts_col), every)
    order = [ts_col, *tiebreak_cols]
    return (
        df.groupBy(bin_col.alias(ts_col), *key_cols)
        .agg(deterministic_last(value_col, order).alias(value_col))
    )


def _floor_time(col: Column, every: str) -> Column:
    """Floor a timestamp to the window unit. Whole-unit windows only —
    second/minute/hour/day map to date_trunc (codegen'd, no UDF)."""
    unit = every.strip().lower()
    aliases = {
        "1s": "second", "1 second": "second", "second": "second",
        "1m": "minute", "1 minute": "minute", "minute": "minute",
        "1h": "hour", "1 hour": "hour", "hour": "hour",
        "1d": "day", "1 day": "day", "day": "day",
    }
    if unit in aliases:
        return F.date_trunc(aliases[unit], col)
    # general N-unit tumbling window: window() start (left edge label)
    return F.window(col, every).getField("start")


def pivot_wide(
    df: DataFrame,
    row_key: str,
    column_key: str,
    value_col: str,
    values: Optional[Sequence[str]] = None,
    order_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Long -> wide pivot: one row per ``row_key``, one column per distinct
    ``column_key`` value, cell = ``value_col``.

    Parity: Flux ``pivot(rowKey:["_time"], columnKey:["k"],
    valueColumn:"_value")`` (reference database_extractor.py:295). Duplicate
    (row, column) pairs collapse deterministically to the value at the
    greatest (order_cols) — Flux keeps the last-encountered point; we make
    that reproducible (order defaults to the row key itself, callers that
    downsampled first have unique pairs anyway).

    Scale: ``values=None`` triggers Spark's extra distinct-scan job to
    discover the column domain — fine at test scale, but at 100 TB pass
    ``values`` explicitly (the domain is usually known config, as in the
    reference where it's the set of sensor ids).
    """
    order = list(order_cols) if order_cols else [row_key]
    agg = deterministic_last(value_col, order)
    grouped = df.groupBy(row_key)
    if values is not None:
        return grouped.pivot(column_key, list(values)).agg(agg)
    return grouped.pivot(column_key).agg(agg)


def drop_all_null_rows(df: DataFrame, subset: Optional[Sequence[str]] = None) -> DataFrame:
    """Remove rows where every column in ``subset`` is NULL.

    Parity: ``df.dropna(axis=0, how="all")`` after the wide resample
    (reference database_extractor.py:348) — prunes the empty 1 s bins the
    resample materialized. (Our agg-then-pivot order never materializes
    empty bins, but all-null rows can still arise from genuinely-null
    source values, so the operator stays.)
    """
    cols = list(subset) if subset else df.columns
    return df.na.drop(how="all", subset=cols)


def drop_columns(df: DataFrame, columns_to_drop: Optional[Sequence[str]]) -> DataFrame:
    """Negative projection, tolerant of absent and duplicate names.

    Parity: reference ``drop_columns`` skips missing columns and its prod
    drop list contains ``_measurement`` twice (database_extractor.py:326-332,
    :374-377) — Spark's ``drop`` already ignores both cases.

    Scale: placing the drop in the lazy plan lets ColumnPruning push it into
    the parquet scan (ReadSchema shrinks) — the reference ships full columns
    over the network and drops client-side.
    """
    if not columns_to_drop:
        return df
    return df.drop(*dict.fromkeys(columns_to_drop))


def sort_by_columns(df: DataFrame, sort_by: Optional[Sequence[str]]) -> DataFrame:
    """Global multi-column sort, skipping sort keys not in the schema.

    Parity: Flux ``sort(columns: [...])`` (reference database_extractor.py:297)
    with the reference's tolerance for config'd columns that were dropped.

    Scale: a global sort is a range-partition shuffle (sampled bounds) —
    keep it the *last* plan node, as the reference does; never sort before
    an aggregation that destroys the order anyway.
    """
    if not sort_by:
        return df
    present = [c for c in sort_by if c in df.columns]
    if not present:
        return df
    return df.orderBy(*present)


def has_min_rows(df: DataFrame, n: int) -> bool:
    """True iff the frame has at least ``n`` rows.

    Parity: the reference's small-result guards (empty -> skip; <10 rows ->
    discard; <20 rows -> no file; database_extractor.py:336-343,
    main.py:136-137).

    Scale: ``limit(n).count()`` — Spark stops scanning once n rows are
    found, instead of counting 100 TB to compare against 20.
    """
    if n <= 0:
        return True
    return df.limit(n).count() >= n
