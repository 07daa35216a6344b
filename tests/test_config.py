"""O21/O22 coverage: config loading (TOML/JSON/YAML/bytes fallback) and the
query-config dataclass `**`-splat (reference database_extractor.py:91-169,
main.py:124)."""

import datetime

import pytest

from database_extractor_spark.config import DataExtractorQueryConfig, load_config
from database_extractor_spark.timeutil import DeltaTime

TOML_BODY = """
[query]
delta_time_start = [0, 0, 0, 0]
delta_time_end = [0, 24, 0, 0]
bucket = "prototype-zero"
column_key = "id"
aggregate_window = "1 second"
sort_by = ["_time"]
"""


def test_load_config_toml(tmp_path):
    p = tmp_path / "app.toml"
    p.write_text(TOML_BODY)
    cfg = load_config(p)
    assert cfg["query"]["bucket"] == "prototype-zero"
    assert cfg["query"]["delta_time_end"] == [0, 24, 0, 0]


def test_load_config_json_and_yaml(tmp_path):
    j = tmp_path / "c.json"
    j.write_text('{"query": {"bucket": "b1", "tz_offset": -8}}')
    assert load_config(j)["query"]["tz_offset"] == -8

    y = tmp_path / "c.yaml"
    y.write_text("query:\n  bucket: b2\n  column_key: _field\n")
    assert load_config(y)["query"]["column_key"] == "_field"


def test_load_config_bytes_fallback_and_missing(tmp_path):
    b = tmp_path / "blob.bin"
    b.write_bytes(b"\x00\x01")
    assert load_config(b) == b"\x00\x01"
    with pytest.raises(FileNotFoundError):
        load_config(tmp_path / "nope.toml")


def test_query_config_splat(tmp_path):
    """The reference's `DataExtractorQueryConfig(**config['query'])` then
    `query_database(client, qt, **config)` flow (reference main.py:124)."""
    p = tmp_path / "app.toml"
    p.write_text(TOML_BODY)
    cfg = DataExtractorQueryConfig(**load_config(p)["query"])
    assert isinstance(cfg.delta_time_end, DeltaTime)
    assert cfg.delta_time_end.hours == 24
    assert cfg.source == "prototype-zero"  # bucket aliased to source
    splat = dict(cfg)
    assert splat["column_key"] == "id" and splat["sort_by"] == ["_time"]


def test_query_config_defaults():
    cfg = DataExtractorQueryConfig()
    assert cfg.aggregate_function == "last"
    assert cfg.sort_by == ["_time", "_field"]
    assert cfg.delta_time_start.to_timedelta() == datetime.timedelta(0)
    with pytest.raises(KeyError):
        cfg["nope"]


def test_non_last_aggregate_branch(spark):
    """aggregate_function != 'last' routes through the generic groupBy path
    (extract.py) — previously uncovered (VERDICT r1 item 10)."""
    from database_extractor_spark.extract import query_database

    df = query_database(
        spark,
        source="/root/testdata/sf0.001/events.parquet",
        query_time="2024-01-05T00:00:00Z",
        delta_time_end=(0, 24, 0, 0),
        column_key="event_type",
        time_col="ts",
        value_col="value",
        aggregate_function="avg",
        aggregate_window="1 minute",
        pivot=False,
        sort_by=["ts"],
    )
    rows = df.collect()
    assert len(rows) > 0
    # minute bins only
    assert all(r["ts"].second == 0 and r["ts"].microsecond == 0 for r in rows)


def test_sql_entry_point_registers_tables(spark):
    """session.sql: the library-API analog — register provided frames as
    views and run arbitrary SQL (the fixture-dir path is exercised by the
    sql_windowed_cte registry entry's oracle compare)."""
    from database_extractor_spark.session import sql

    df = spark.range(5).toDF("x")
    out = sql(spark, "select count(*) as n from t5_sql_entry", tables={"t5_sql_entry": df})
    assert out.collect()[0]["n"] == 5
