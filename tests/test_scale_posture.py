"""Scale-posture assertions: the physical plans the engine promises at
100 TB, verified on the local plans Spark actually produces.

- bucketed tables: co-located join with NO shuffle exchange
- day-partitioned writes: date predicates prune partitions at the scan
- native-space pushdown: time-range predicates reach parquet row groups
"""

import os
import re

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def warehouse_spark():
    from database_extractor_spark.session import get_spark

    return get_spark(app_name="scale-posture")


def test_bucketed_join_has_no_shuffle(warehouse_spark, tmp_path):
    """Writing both join sides bucketed by the key makes the join
    shuffle-free (co-located SortMergeJoin) — the layout strategy for
    repeatedly-joined 100 TB fact tables."""
    spark = warehouse_spark
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")

    (orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
     .sortBy("o_orderkey").option("path", str(tmp_path / "orders_b"))
     .saveAsTable("orders_b"))
    (lineitem.write.mode("overwrite").bucketBy(8, "l_orderkey")
     .sortBy("l_orderkey").option("path", str(tmp_path / "lineitem_b"))
     .saveAsTable("lineitem_b"))

    # disable auto-broadcast so the small fixture actually plans SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("orders_b").join(
            spark.table("lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucketing removed both shuffles
        assert j.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_day_partitioned_write_prunes(warehouse_spark, tmp_path):
    from database_extractor_spark.sinks import write_day_partitioned
    from database_extractor_spark.sources import read_source

    spark = warehouse_spark
    ev = read_source(spark, f"{SF_DIR}/events.parquet")
    out = str(tmp_path / "events_by_day")
    write_day_partitioned(ev, "ts", out)

    filtered = spark.read.parquet(out).filter(F.col("date") == "2024-01-05")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)", plan)
    assert m and "2024-01-05" in m.group(1)  # pruning at the scan, not a filter node
    # only one day's directory is actually read
    n_days = len([d for d in os.listdir(out) if d.startswith("date=")])
    assert n_days > 1
    assert filtered.count() > 0


def test_native_space_pushdown_reaches_parquet(warehouse_spark):
    from database_extractor_spark.sources import read_source

    df = read_source(
        warehouse_spark, f"{SF_DIR}/events.parquet",
        ts_filter=("ts", "2024-01-05 00:00:00", "2024-01-06 00:00:00"),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PushedFilters: \[([^\]]*)", plan)
    assert m and "GreaterThanOrEqual(ts" in m.group(1) and "LessThan(ts" in m.group(1)


def test_compact_parquet_file_count_and_content(warehouse_spark, tmp_path):
    """compact_parquet sizes output files from actual input bytes: a tiny
    target fans out, a huge target produces one file, and content is
    preserved either way."""
    from database_extractor_spark.sinks import compact_parquet
    from database_extractor_spark.sources import read_source

    spark = warehouse_spark
    src = str(tmp_path / "fragmented")
    # 64 tiny files — the small-files problem in miniature
    spark.range(0, 10_000).repartition(64).write.parquet(src)

    one = str(tmp_path / "one")
    n1 = compact_parquet(read_source(spark, src + "/"), one, target_file_bytes=1 << 30)
    assert n1 == 1
    import glob
    assert len(glob.glob(one + "/part-*.parquet")) == 1

    many = str(tmp_path / "many")
    nm = compact_parquet(read_source(spark, src + "/"), many, target_file_bytes=8 * 1024)
    assert nm > 1
    assert len(glob.glob(many + "/part-*.parquet")) == nm

    got = read_source(spark, one + "/").agg(F.sum("id"), F.count("*")).collect()[0]
    assert (got[0], got[1]) == (10_000 * 9_999 // 2, 10_000)


def test_bucketed_join_registry_entry_plan(warehouse_spark):
    """The bucketed_join_colocated registry entry must sort-merge-join the
    two bucketed tables with NO Exchange on either join input — the only
    Exchange in the plan is the final aggregate's shuffle."""
    import __spark_entry__ as E

    df = E.queries()["bucketed_join_colocated"](warehouse_spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert plan.count("Exchange") == 1, plan


def test_bucketed_aggregation_has_no_shuffle(warehouse_spark):
    """Bucketing serves aggregation too: a groupBy on the bucket column of
    a bucketed table hash-aggregates per bucket file with NO Exchange —
    the same write-time layout amortizes joins AND aggregations."""
    spark = warehouse_spark
    from database_extractor_spark.sinks import write_bucketed

    write_bucketed(
        spark.read.parquet(f"{SF_DIR}/orders.parquet").select("o_custkey", "o_totalprice"),
        "orders_aggb", "o_custkey", n_buckets=8,
    )
    agg = spark.table("orders_aggb").groupBy("o_custkey").agg(F.sum("o_totalprice"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert "Exchange" not in plan, plan


def test_python_datasource_partition_parallel_scan(warehouse_spark):
    """The custom Python Data Source plans as a partition-parallel
    BatchScan (one Python worker per declared partition) — not a
    single-task bottleneck and not a row-at-a-time UDF stage."""
    from database_extractor_spark.sources.custom import register_synthetic_source

    spark = warehouse_spark
    register_synthetic_source(spark)
    df = (spark.read.format("synthetic_events")
          .option("rows", 64).option("partitions", 4).load())
    assert df.rdd.getNumPartitions() == 4
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchScan synthetic_events" in plan
    assert "BatchEvalPython" not in plan
