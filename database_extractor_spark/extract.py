"""The central pipeline composer — Spark-native ``query_database``.

Replaces the reference's Flux-string compilation + remote execution +
pandas post-processing (reference src/database_extractor/
database_extractor.py:251-323 and :335-355) with ONE lazy DataFrame plan:

    scan -> time-range filter -> tz shift -> row predicate
         -> 1s downsample take-last (long)  [moved BEFORE the pivot]
         -> pivot long->wide -> drop all-null rows -> drop columns -> sort

The reference's order is scan->range->shift->filter->pivot->sort (server
side), then resample->dropna (client side). We fuse both phases into one
Catalyst-optimized plan and hoist the downsample ahead of the pivot (same
per-(bin,key) take-last semantics, far cheaper: the aggregate shrinks data
at the first shuffle instead of shipping raw points through the pivot).
The Flux ``group()`` stage (database_extractor.py:296) is a no-op here —
a DataFrame is already one flat relation.

Returns are *lazy* DataFrames — callers compose further or ``.toPandas()``
as the compatibility escape hatch (the reference returns materialized
pandas).
"""

from __future__ import annotations

import logging
import time
from datetime import datetime
from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_extractor_spark.operators.core import (
    downsample_last,
    drop_all_null_rows,
    drop_columns,
    has_min_rows,
    pivot_wide,
    row_predicate,
    sort_by_columns,
    time_range,
    time_shift,
)
from database_extractor_spark.sinks import write_dated_csv, write_day_partitioned
from database_extractor_spark.sources import read_source
from database_extractor_spark.timeutil import (
    DEFAULT_TIME_FORMAT,
    construct_query_time_endpoints,
    iter_days,
    timezone_offset,
)

logger = logging.getLogger(__name__)

#: the reference's production drop list (database_extractor.py:374-377);
#: includes a duplicate "_measurement" on purpose — drops are tolerant.
REFERENCE_DROP_LIST = [
    "result", "table", "_start",
    "_stop", "_measurement", "datatype",
    "_field", "_measurement", "category",
    "level", "machine", "module", "display_name",
]


def query_database(
    client: SparkSession,
    bucket: str = "",
    query_time: Union[str, datetime, None] = None,
    delta_time_start=(0, 0, 0, 0),
    delta_time_end=(0, 0, 0, 0),
    columns_to_drop: Optional[Sequence[str]] = None,
    filter: Optional[str] = None,  # noqa: A002 - name kept for reference parity
    column_key: str = "id",
    tz_offset: int = 0,
    time_format: str = DEFAULT_TIME_FORMAT,
    aggregate_function: str = "last",
    aggregate_window: Optional[str] = None,
    sort_by: Sequence[str] = ("_time", "_field"),
    # --- Spark-native knobs (optional) ---
    source: str = "",
    time_col: str = "_time",
    value_col: str = "_value",
    pivot_values: Optional[Sequence[str]] = None,
    tiebreak_cols: Sequence[str] = (),
    pivot: bool = True,
    infer_pivot_values: bool = True,
) -> DataFrame:
    """Extract a time window as a wide, time-indexed DataFrame (lazy).

    Signature mirrors the reference's ``query_database``
    (database_extractor.py:251-264) with ``client`` = SparkSession and
    ``bucket``/``source`` = parquet path or table name.

    ``aggregate_window`` defaults to None — raw pivoted points, exactly
    like the reference's ``query_database`` (its Flux aggregateWindow stage
    is commented out, database_extractor.py:299; the 1 s resample happens
    only on the per-day path in ``process_results`` :346-347). The per-day/
    range entry points below pass ``"1 second"`` to reproduce that path.

    Only ``aggregate_function="last"`` is specialized (deterministic
    max_by); other aggregate names are applied via the built-in function
    of that name, matching Flux's fn parameter surface.

    ``pivot_values`` / ``infer_pivot_values`` (VERDICT r14 item 6): when
    ``pivot_values`` is omitted, Spark discovers the pivot column domain
    with an EXTRA eager distinct-scan job over the filtered window — at
    100 TB that is a second full pass before the real query runs. The
    registry entries always pass explicit values; public callers that
    omit them get a logged WARNING with the cost, and can set
    ``infer_pivot_values=False`` to make the omission a hard error
    instead (the safe configuration for production pipelines where the
    column domain is known config, as in the reference's sensor-id set).
    """
    src = source or bucket
    start_utc, end_utc = construct_query_time_endpoints(
        query_time, delta_time_start, delta_time_end,
        tz_offset=tz_offset, time_format=time_format,
    )
    started = time.perf_counter()

    start_s, end_s = start_utc.replace("Z", ""), end_utc.replace("Z", "")
    # the window is also pushed into the scan in the column's native space
    # (prunes parquet row groups even for nanos-long fixtures); the
    # time_range below is the equivalent semantic filter
    df = read_source(client, src, ts_filter=(time_col, start_s, end_s))
    df = time_range(df, time_col, start_s, end_s)
    df = time_shift(df, time_col, hours=tz_offset)
    df = row_predicate(df, filter)

    if aggregate_window:
        if aggregate_function == "last":
            df = downsample_last(
                df, time_col, key_cols=[column_key], value_col=value_col,
                every=aggregate_window, tiebreak_cols=tiebreak_cols,
            )
        else:
            from database_extractor_spark.operators.core import _floor_time

            agg_col = getattr(F, aggregate_function)(F.col(value_col)).alias(value_col)
            df = df.groupBy(
                _floor_time(F.col(time_col), aggregate_window).alias(time_col),
                column_key,
            ).agg(agg_col)

    if pivot:
        if pivot_values is None:
            if not infer_pivot_values:
                raise ValueError(
                    "pivot_values is required when infer_pivot_values="
                    "False: discovering the pivot column domain costs an"
                    " extra eager distinct-scan over the window — pass"
                    f" the known domain of {column_key!r} explicitly"
                )
            logger.warning(
                "pivot_values not supplied: Spark will run an extra "
                "eager distinct-scan job over the window to discover "
                "the %r domain (a second full pass at scale). Pass "
                "pivot_values explicitly, or infer_pivot_values=False "
                "to make this an error.",
                column_key,
            )
        # after a downsample, (ts, key) is unique so the pivot's dedup
        # order is just the row key; otherwise tiebreakers disambiguate
        pivot_order = [time_col] if aggregate_window else [time_col, *tiebreak_cols]
        df = pivot_wide(
            df, row_key=time_col, column_key=column_key, value_col=value_col,
            values=pivot_values, order_cols=pivot_order,
        )
        df = drop_all_null_rows(df, subset=[c for c in df.columns if c != time_col])

    df = drop_columns(df, columns_to_drop)
    df = sort_by_columns(df, sort_by)

    logger.info(
        "Built extraction plan for %s in window [%s, %s) in %.4fs (lazy)",
        src, start_utc, end_utc, time.perf_counter() - started,
    )
    return df


def query_data_for_day(
    client: SparkSession,
    current_date: datetime,
    source: str,
    out_dir: Optional[str] = None,
    min_rows: int = 10,
    **overrides,
) -> Optional[DataFrame]:
    """One local calendar day ``[midnight, midnight+24h)`` -> wide frame,
    optionally written as a dated CSV when it clears the row guard.

    Parity: reference ``query_data_for_day`` + ``process_results``
    (database_extractor.py:369-399, :335-355) — tz offset from the date
    (DST-aware), 24 h window, <10-row results discarded.
    """
    tz = overrides.pop("tz_offset", timezone_offset(current_date))
    params = dict(
        source=source,
        query_time=current_date.strftime(DEFAULT_TIME_FORMAT),
        delta_time_start=(0, 0, 0, 0),
        delta_time_end=(0, 24, 0, 0),
        tz_offset=tz,
        columns_to_drop=REFERENCE_DROP_LIST,
        sort_by=["_time"],
        column_key="id",
        aggregate_window="1 second",
    )
    params.update(overrides)
    result = query_database(client, **params)

    # Guard parity: the reference checks the RAW pivoted row count before
    # resampling (process_results, database_extractor.py:336-343), so a
    # day with 15 raw seconds but 8 non-empty 1s bins is KEPT. The raw
    # pivoted row count equals the count of distinct raw timestamps in the
    # window, which we can get without materializing the raw pivot.
    raw_params = dict(params, aggregate_window=None, pivot=False,
                      columns_to_drop=None, sort_by=None)
    time_col = params.get("time_col", "_time")
    started = time.perf_counter()
    n_raw = query_database(client, **raw_params).select(time_col).distinct().count()
    if n_raw < min_rows:
        logger.info(
            "Fewer than %d rows for %s; ignoring results.", min_rows, current_date.date()
        )
        return None

    # Persist around log-count + sink so the full plan runs once. The
    # count doubles as the reference's execution-timed log line
    # (database_extractor.py:313-319 times the query action, not plan
    # construction).
    result.persist()
    try:
        n_rows = result.count()
        logger.info(
            "Query returned table of size %d rows x %d columns in %.4f s",
            n_rows, len(result.columns), time.perf_counter() - started,
        )
        if out_dir:
            write_dated_csv(result, out_dir, current_date)
        return result
    finally:
        # guard+write have both run off the cache by now; the returned
        # frame stays valid (recomputes lazily if composed further)
        result.unpersist()


def query_data_for_range(
    client: SparkSession,
    start_date: datetime,
    end_date: datetime,
    source: str,
    out_path: Optional[str] = None,
    **overrides,
) -> DataFrame:
    """Extract ``[start_date, end_date)`` as one distributed query per
    DST segment.

    The reference loops days on the driver (database_extractor.py:402-420,
    with a hand-rolled 2024-only calendar) and recomputes the DST-aware tz
    offset for *each day* (database_extractor.py:372). Looping per day in
    Spark would waste the scheduler, but using one offset for the whole
    range is wrong across a DST transition — so we group consecutive days
    that share an offset into segments (≤3 per year in practice), run ONE
    distributed query per segment, and union. Within a segment the sink is
    day-partitioned (``partitionBy(date)``) — per-day output atomicity,
    real parallelism across days, and correct calendars for every year.
    """
    days = list(iter_days(start_date, end_date))
    if not days:
        raise ValueError(f"empty date range [{start_date}, {end_date})")

    fixed_tz = overrides.pop("tz_offset", None)
    # consecutive-day runs sharing a tz offset -> (first_day, n_days, offset)
    segments: list[list] = []
    for d in days:
        off = fixed_tz if fixed_tz is not None else timezone_offset(d)
        if segments and segments[-1][2] == off:
            segments[-1][1] += 1
        else:
            segments.append([d, 1, off])

    frames = []
    for first_day, ndays, off in segments:
        params = dict(
            source=source,
            query_time=first_day.strftime(DEFAULT_TIME_FORMAT),
            delta_time_start=(0, 0, 0, 0),
            delta_time_end=(0, 24 * ndays, 0, 0),
            tz_offset=off,
            columns_to_drop=REFERENCE_DROP_LIST,
            sort_by=["_time"],
            column_key="id",
            aggregate_window="1 second",
        )
        params.update(overrides)
        frames.append(query_database(client, **params))

    result = frames[0]
    for f in frames[1:]:
        # dynamic pivots can yield different column sets per segment
        result = result.unionByName(f, allowMissingColumns=True)

    time_col = overrides.get("time_col", "_time")
    if out_path:
        write_day_partitioned(result, time_col, out_path)
    return result
