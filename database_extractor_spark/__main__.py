"""CLI entry point: ``python -m database_extractor_spark``.

Parity with the reference's ``main.py`` cron job (reference main.py:36-43):
with no arguments, extract YESTERDAY's data — "run at midnight, process the
previous day" — from the configured source into a dated CSV. Flags widen
that to a chosen day or an end-exclusive date range (the reference's
commented-out library examples, as real options).

Examples::

    python -m database_extractor_spark --source /data/events.parquet --out out/
    python -m database_extractor_spark --date 2024-01-05 \
        --source /root/testdata/sf0.001/events.parquet --out /tmp/out
    python -m database_extractor_spark --start 2024-01-05 --end 2024-01-08 \
        --source /data/events.parquet --out /tmp/range_out
    python -m database_extractor_spark --config config/application.toml \
        --source /data/events.parquet

A ``--config`` TOML/JSON/YAML file may carry a ``[query]`` table of
DataExtractorQueryConfig overrides and a ``[spark]`` table of session conf,
exactly like the reference's ``application.toml`` + ``.influxdb.toml``
pair collapses into one file here.
"""

from __future__ import annotations

import argparse
import logging
import sys
from datetime import datetime, timedelta


def _parse_date(s: str) -> datetime:
    return datetime.strptime(s, "%Y-%m-%d")


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="database_extractor_spark",
        description="Extract a day (default: yesterday) or a date range "
        "from a source into dated CSV / day-partitioned parquet.",
    )
    p.add_argument("--source", required=True, help="bucket: parquet/csv/json path, table, ...")
    p.add_argument("--config", help="TOML/JSON/YAML with [query] overrides and [spark] conf")
    p.add_argument("--date", type=_parse_date, help="extract this day (YYYY-MM-DD)")
    p.add_argument("--start", type=_parse_date, help="range start day (YYYY-MM-DD)")
    p.add_argument("--end", type=_parse_date, help="range end day, exclusive (YYYY-MM-DD)")
    p.add_argument("--out", help="output directory (omit for a dry run that only counts)")
    p.add_argument("--min-rows", type=int, default=10, help="small-result guard (reference: 10)")
    p.add_argument(
        "--time-col", default="_time",
        help="timestamp column (reference default '_time'; the synthetic "
        "fixtures use 'ts'). A [query] time_col in --config wins.",
    )
    args = p.parse_args(argv)

    if args.date and (args.start or args.end):
        p.error("--date and --start/--end are mutually exclusive")
    if bool(args.start) != bool(args.end):
        p.error("--start and --end must be given together")

    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(name)s %(message)s"
    )
    log = logging.getLogger("database_extractor_spark.cli")

    from database_extractor_spark.config import load_config
    from database_extractor_spark.extract import query_data_for_day, query_data_for_range
    from database_extractor_spark.session import create_spark_client

    overrides: dict = {"time_col": args.time_col}
    if args.config:
        loaded = load_config(args.config)
        if isinstance(loaded, dict):
            overrides.update(loaded.get("query", {}))
    spark = create_spark_client(args.config)

    if args.start:
        df = query_data_for_range(
            spark, args.start, args.end, source=args.source,
            out_path=args.out, **overrides,
        )
        log.info("range extract %s..%s: %d rows", args.start.date(), args.end.date(), df.count())
        return 0

    day = args.date or (
        datetime.now().replace(hour=0, minute=0, second=0, microsecond=0) - timedelta(days=1)
    )
    result = query_data_for_day(
        spark, day, source=args.source, out_dir=args.out,
        min_rows=args.min_rows, **overrides,
    )
    if result is None:
        log.warning("day %s produced fewer than %d rows; discarded (reference guard)",
                    day.date(), args.min_rows)
        return 1
    log.info("day extract %s: %d rows", day.date(), result.count())
    return 0


if __name__ == "__main__":
    sys.exit(main())
