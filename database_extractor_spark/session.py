"""SparkSession factory — the engine's "client".

Replaces the reference's ``create_influxdb_client`` (reference:
src/database_extractor/database_extractor.py:187-205): instead of an HTTP
client pinged against a server, we build/get a SparkSession and smoke-check
it with a trivial job.

Scale posture: config here assumes the session may run on a real cluster —
AQE on (runtime shuffle-partition coalescing + skew-join splitting), Arrow
on (fast pandas interchange for the few Pandas-UDF operators), session
timezone pinned UTC (all engine timestamps are UTC; convert at the edges
with from_utc_timestamp).
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession

#: Named skew-handling conf profiles — the MEASURED playbook promoted to
#: configuration (BASELINE.md "Round-11: measured skew handling";
#: VERDICT r11 item 3). On the 15M-row/20%-hot-key fixture
#: (scripts/skew_bench.py):
#:
#: - ``"aqe-tuned"`` — the measured WINNER (1.86x vs the straggler plan,
#:   beating hand-salting's 1.73x with zero query rewrite): lower the
#:   AQE skew-split threshold to the hot-partition scale so NARROW-ROW
#:   skew splits too. The defaults (256m threshold) never fire on a
#:   3M-row/~90MB hot partition — row skew that fits under the byte
#:   threshold is exactly the 100TB failure mode. The 8m/4m values match
#:   the measured table; at cluster scale set them to ~(hot partition
#:   bytes)/4 the same way.
#: - ``"aqe-default"`` — Spark's shipped skew-join settings, pinned
#:   explicitly (the A/B reference point; measured 0.88x, i.e. noise —
#:   the defaults don't fire on narrow-row skew).
#:
#: NOT a profile: salting aggregates (measured 0.53x — map-side partial
#: aggregation already compresses hot keys; see the playbook's rule 1).
#: Query-side salting for AQE-less joins lives in
#: operators/relational.py::salted_join, not in session conf.
SKEW_PROFILES: dict[str, dict[str, str]] = {
    "aqe-tuned": {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
    },
    "aqe-default": {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
    },
}


def get_spark(
    app_name: str = "database-extractor-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
    skew_profile: str | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's default tuning.

    Local test default: ``local[$SPARK_GRAFT_CPUS or *]`` with
    shuffle partitions sized to cores rather than Spark's default 200 —
    at cluster scale callers pass their own master/conf and AQE coalescing
    corrects partition counts at runtime.

    ``skew_profile``: a SKEW_PROFILES name ("aqe-tuned" / "aqe-default")
    applying the measured skew playbook's confs; layered UNDER
    ``extra_conf`` so callers can still override individual keys.
    """
    if skew_profile is not None:
        profile = SKEW_PROFILES.get(skew_profile)
        if profile is None:
            raise ValueError(
                f"unknown skew_profile {skew_profile!r}; "
                f"expected one of {sorted(SKEW_PROFILES)}"
            )
        extra_conf = {**profile, **(extra_conf or {})}
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus_env = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus_env) if cpus_env and cpus_env.isdigit() else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # testdata's events.ts is parquet TIMESTAMP(NANOS), which vanilla
        # Spark refuses; read as long + convert (sources.read_source).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, str(v))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def sql(
    spark: SparkSession,
    query: str,
    tables: dict | None = None,
    sf_dir: str | None = None,
):
    """Run arbitrary SQL over the engine's tables — the reference's
    library-API entry point (reference README.md:41-75: build a query in
    code, hand it to the client) mapped onto Spark SQL.

    ``tables``: optional {name: DataFrame} registered as temp views first;
    ``sf_dir``: optional fixture directory whose parquet tables are
    registered as views via sources.load_tables. Returns the lazy result
    DataFrame — Catalyst plans the SQL identically to the DataFrame API,
    so pushdown/broadcast/AQE behavior is unchanged.
    """
    if sf_dir is not None:
        from database_extractor_spark.sources import load_tables

        load_tables(spark, sf_dir)
    for name, df in (tables or {}).items():
        df.createOrReplaceTempView(name)
    return spark.sql(query)


def create_spark_client(config_path: str | None = None) -> SparkSession:
    """Create a session and verify it executes a job (the reference pings
    InfluxDB and raises ConnectionError on failure; we run a 1-row job)."""
    conf = {}
    if config_path:
        from database_extractor_spark.config import load_config

        loaded = load_config(config_path)
        if isinstance(loaded, dict):
            conf = {str(k): str(v) for k, v in loaded.get("spark", {}).items()}
    spark = get_spark(extra_conf=conf)
    if spark.range(1).count() != 1:
        raise ConnectionError("SparkSession failed its smoke job")
    return spark


@contextmanager
def conf_window(spark: SparkSession, confs: dict[str, str]):
    """Session-conf WINDOW: set ``confs``, yield, restore every key to
    its prior value (or unset it if it had none) — even on error.

    This is the one sanctioned way to run a plan under non-default
    optimizer confs (broadcast threshold, bloom-filter injection,
    partition-overwrite mode, ...). Two rules the call sites must keep,
    factored out of the three formerly hand-rolled try/finally blocks
    (sql_join_hints / runtime_bloom_join / dynamic partition overwrite —
    VERDICT r13 item 6):

    - COMPILE INSIDE THE WINDOW. Spark reads these confs at optimization
      time, so a lazily-returned DataFrame would compile AFTER restore
      with the default confs; materialize inside (eager localCheckpoint
      or the write/collect itself) when the plan must reflect the window.
    - Session confs are process-global: a conf window is not reentrant
      per-key and not thread-safe across concurrently-compiling plans.
      Keep windows short and data-independent.
    """
    UNSET = object()
    saved: dict[str, object] = {}
    for k in confs:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = UNSET
    for k, v in confs.items():
        spark.conf.set(k, str(v))
    try:
        yield spark
    finally:
        for k, old in saved.items():
            if old is UNSET:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)
