"""End-to-end parity with the reference's own configuration: a
reference-shaped long table (FIXTURES.md family A), the reference's
application.toml knobs loaded through load_config, splatted through
DataExtractorQueryConfig into query_database — the exact flow of
reference main.py:115-149."""

import datetime

import duckdb
import pytest
from pyspark.sql import functions as F

from database_extractor_spark.config import DataExtractorQueryConfig, load_config
from database_extractor_spark.extract import REFERENCE_DROP_LIST, query_database

#: reference config/application.toml, adapted only in source/binding names
APPLICATION_TOML = """
[query]
delta_time_start = [0, 0, 0, 0]
delta_time_end = [0, 24, 0, 0]
tz_offset = 0
columns_to_drop = ["result", "table", "_start", "_stop", "_measurement", "_field"]
filter = "_measurement = 'liner_heater'"
column_key = "id"
aggregate_function = "last"
aggregate_window = "1 second"
sort_by = ["_time"]
"""


@pytest.fixture(scope="module")
def points_path(spark, tmp_path_factory):
    """Reference-shaped long fixture synthesized from events semantics:
    multiple points per second per id so the 1 s take-last and pivot
    duplicate collapse are exercised (FIXTURES.md family A recipe)."""
    base = datetime.datetime(2024, 1, 5)
    rows = []
    for s in range(0, 600, 7):          # points across the day
        for i, sensor in enumerate(["t1", "t2"]):
            for k in range(3):          # duplicates within the second
                rows.append((
                    base + datetime.timedelta(seconds=s, microseconds=k * 250_000),
                    "liner_heater", "value", float(s + i * 1000 + k), sensor,
                    "ok", 0, base, base + datetime.timedelta(days=1),
                ))
    rows.append((base + datetime.timedelta(seconds=3), "other_measurement",
                 "value", -1.0, "t1", "ok", 0, base, base + datetime.timedelta(days=1)))
    df = spark.createDataFrame(
        rows,
        "_time timestamp, _measurement string, _field string, _value double, "
        "id string, result string, table long, _start timestamp, _stop timestamp",
    )
    p = str(tmp_path_factory.mktemp("points") / "points.parquet")
    df.write.mode("overwrite").parquet(p)
    return p


def test_reference_application_toml_flow(spark, points_path, tmp_path):
    cfg_path = tmp_path / "application.toml"
    cfg_path.write_text(APPLICATION_TOML)
    config = DataExtractorQueryConfig(**load_config(cfg_path)["query"])

    wide = query_database(
        spark,
        query_time="2024-01-05T00:00:00Z",
        source=points_path,
        **{k: v for k, v in dict(config).items()
           if k not in ("source", "bucket", "time_format")},
    )
    # wide time-indexed matrix: _time + one column per sensor id
    assert wide.columns == ["_time", "t1", "t2"]

    got = wide.toPandas()
    con = duckdb.connect()
    con.execute(f"create view points as select * from '{points_path}/*.parquet'")
    want = con.sql("""
        with binned as (
            select date_trunc('second', _time) as _time, id, arg_max(_value, _time) as v
            from points
            where _measurement = 'liner_heater'
              and _time >= timestamp '2024-01-05' and _time < timestamp '2024-01-06'
            group by 1, 2
        )
        select _time,
               max(case when id = 't1' then v end) as t1,
               max(case when id = 't2' then v end) as t2
        from binned group by _time order by _time
    """).df()
    assert got.shape == want.shape
    assert (got["t1"].values == want["t1"].values).all()
    assert (got["t2"].values == want["t2"].values).all()
    # duplicate (ts, id) points collapsed to the LAST (k=2) value
    assert float(got.iloc[0]["t1"]) == 2.0
    # the other_measurement point was filtered by the config predicate
    assert -1.0 not in set(got["t1"]).union(got["t2"])


def test_reference_prod_drop_list_flow(spark, points_path):
    """The production drop list (with its intentional duplicate
    _measurement entry, database_extractor.py:374-377) applied end to
    end; metadata columns gone from the pivoted output."""
    wide = query_database(
        spark,
        query_time="2024-01-05T00:00:00Z",
        source=points_path,
        delta_time_end=(0, 24, 0, 0),
        columns_to_drop=REFERENCE_DROP_LIST,
        filter="id RLIKE '.*'",
        column_key="id",
        aggregate_window="1 second",
        sort_by=["_time"],
    )
    assert set(wide.columns) == {"_time", "t1", "t2"}
    assert wide.count() > 0
