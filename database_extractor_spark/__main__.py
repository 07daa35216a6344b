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


def _setup_logging(log_config: str | None) -> None:
    """Configure logging like the reference's ``setup_logging`` (ref
    main.py:23-33): load a dictConfig mapping from a YAML/TOML/JSON file,
    pre-create the directories any file handlers write into (the reference
    mkdirs ``logs/``; ref config/logger.yaml:14-22 uses rotating file
    handlers), and apply it. Without a file, plain basicConfig."""
    if not log_config:
        logging.basicConfig(
            level=logging.INFO, format="%(asctime)s %(levelname)s %(name)s %(message)s"
        )
        return
    from logging.config import dictConfig
    from pathlib import Path

    from database_extractor_spark.config import load_config

    cfg = load_config(log_config)
    if not isinstance(cfg, dict):
        raise TypeError(f"--log-config {log_config!r} did not parse to a mapping")
    for handler in (cfg.get("handlers") or {}).values():
        filename = handler.get("filename") if isinstance(handler, dict) else None
        if filename:
            Path(filename).parent.mkdir(parents=True, exist_ok=True)
    dictConfig(cfg)


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
        "--time-col", default=None,
        help="timestamp column (default '_time', the reference's name; the "
        "synthetic fixtures use 'ts'). An explicit flag beats a [query] "
        "time_col in --config.",
    )
    p.add_argument(
        "--log-config",
        help="YAML/TOML/JSON logging dictConfig (reference: config/logger.yaml "
        "with rotating file handlers); omit for stderr basicConfig",
    )
    args = p.parse_args(argv)

    if args.date and (args.start or args.end):
        p.error("--date and --start/--end are mutually exclusive")
    if bool(args.start) != bool(args.end):
        p.error("--start and --end must be given together")

    _setup_logging(args.log_config)
    log = logging.getLogger("database_extractor_spark.cli")

    from database_extractor_spark.config import load_config
    from database_extractor_spark.extract import query_data_for_day, query_data_for_range
    from database_extractor_spark.session import create_spark_client

    # config seeds the overrides; an explicitly-passed CLI flag wins
    overrides: dict = {}
    if args.config:
        loaded = load_config(args.config)
        if isinstance(loaded, dict):
            overrides.update(loaded.get("query", {}))
    if args.time_col is not None:
        overrides["time_col"] = args.time_col
    overrides.setdefault("time_col", "_time")
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
