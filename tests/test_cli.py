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
