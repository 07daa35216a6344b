"""CLI entry point (`python -m database_extractor_spark`) — the reference
main.py cron analog: day extract to dated CSV, range extract to
day-partitioned parquet, small-result guard exit code."""

from tests.conftest import SF_DIR

from database_extractor_spark.__main__ import main

CFG = '[query]\ntime_col = "ts"\ncolumn_key = "event_type"\nvalue_col = "value"\n'


def test_cli_day_extract_writes_dated_csv(spark, tmp_path):
    cfg = tmp_path / "app.toml"
    cfg.write_text(CFG)
    rc = main([
        "--date", "2024-01-05",
        "--source", f"{SF_DIR}/events.parquet",
        "--out", str(tmp_path / "out"),
        "--config", str(cfg),
    ])
    assert rc == 0
    parts = list((tmp_path / "out").glob("extract_2024-01-05.csv/*.csv"))
    assert parts, "dated CSV must land on disk"


def test_cli_range_extract_partitions_by_day(spark, tmp_path):
    cfg = tmp_path / "app.toml"
    cfg.write_text(CFG)
    rc = main([
        "--start", "2024-01-05", "--end", "2024-01-07",
        "--source", f"{SF_DIR}/events.parquet",
        "--out", str(tmp_path / "range_out"),
        "--config", str(cfg),
    ])
    assert rc == 0
    days = {p.name for p in (tmp_path / "range_out").glob("date=*")}
    assert days == {"date=2024-01-05", "date=2024-01-06"}


def test_cli_small_result_guard_exit_code(spark, tmp_path):
    cfg = tmp_path / "app.toml"
    cfg.write_text(CFG)
    rc = main([
        "--date", "1999-01-01",  # before the fixture's data
        "--source", f"{SF_DIR}/events.parquet",
        "--config", str(cfg),
    ])
    assert rc == 1


def test_cli_explicit_time_col_beats_config(spark, tmp_path):
    """CLI-beats-config precedence: a [query] time_col that is WRONG for
    the fixture must be overridden by an explicit --time-col flag."""
    cfg = tmp_path / "app.toml"
    cfg.write_text(
        '[query]\ntime_col = "no_such_column"\n'
        'column_key = "event_type"\nvalue_col = "value"\n'
    )
    rc = main([
        "--date", "2024-01-05",
        "--source", f"{SF_DIR}/events.parquet",
        "--out", str(tmp_path / "out"),
        "--config", str(cfg),
        "--time-col", "ts",
    ])
    assert rc == 0, "explicit --time-col must win over the config's bad value"


def test_cli_log_config_yaml_dictconfig(spark, tmp_path):
    """--log-config parity with the reference's rotating-file setup (ref
    main.py:23-33, config/logger.yaml:14-22): the YAML dictConfig is
    applied, the log directory is pre-created, and extract logs land in
    the rotating file."""
    import logging

    log_dir = tmp_path / "logs"  # must NOT exist yet: _setup_logging mkdirs it
    log_yaml = tmp_path / "logger.yaml"
    log_yaml.write_text(
        f"""
version: 1
disable_existing_loggers: false
handlers:
  extract.file:
    class: logging.handlers.RotatingFileHandler
    formatter: default
    level: INFO
    filename: {log_dir}/extract.log
    maxBytes: 10000000
    backupCount: 3
formatters:
  default:
    format: '%(asctime)s %(levelname)-8s %(message)s'
loggers:
  database_extractor_spark:
    level: INFO
    handlers:
      - extract.file
"""
    )
    cfg = tmp_path / "app.toml"
    cfg.write_text(CFG)
    try:
        rc = main([
            "--date", "2024-01-05",
            "--source", f"{SF_DIR}/events.parquet",
            "--out", str(tmp_path / "out"),
            "--config", str(cfg),
            "--log-config", str(log_yaml),
        ])
    finally:
        # detach the file handler so later tests don't keep writing here
        lg = logging.getLogger("database_extractor_spark")
        for h in list(lg.handlers):
            lg.removeHandler(h)
            h.close()
    assert rc == 0
    text = (log_dir / "extract.log").read_text()
    assert "day extract 2024-01-05" in text
