"""Sources: the engine's replacement for the reference's InfluxDB bucket scan.

The reference's only source is ``from(bucket: ...)`` over HTTP
(reference database_extractor.py:291) plus TOML/JSON/YAML config files
(:91-128). Here a "bucket" is any of:

- a parquet/csv/json path (columnar scan with pushdown — the default),
- a registered table/view name,
- a JDBC table (the BASELINE-approved mapping for live databases).

All readers return lazy DataFrames; filters/projections applied later in
the plan push into these scans via Catalyst.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


#: columns stored as parquet TIMESTAMP(NANOS) in the driver's testdata;
#: Spark reads them as long (nanosAsLong) and we truncate to microseconds,
#: which is exactly what DuckDB's nanos->micros TIMESTAMP read does.
NANOS_TS_COLS = {"ts"}


def _normalize_nanos(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Convert known nano-epoch long columns to proper timestamps."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    for f in df.schema.fields:
        if f.name in NANOS_TS_COLS and isinstance(f.dataType, LongType):
            df = df.withColumn(f.name, F.expr(f"timestamp_micros({f.name} div 1000)"))
    return df


def read_source(spark: SparkSession, source: str, fmt: Optional[str] = None) -> DataFrame:
    """Resolve a source string to a DataFrame.

    Dispatch: explicit ``fmt`` wins; else by extension; a path-less name is
    treated as a catalog table/view. Directories default to parquet
    (partitioned layouts like ``.../date=2024-01-01/`` prune on filter).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if fmt:
        df = spark.read.format(fmt).load(source) if fmt != "table" else spark.table(source)
        return _normalize_nanos(spark, df)
    lowered = source.lower()
    if lowered.endswith(".parquet") or lowered.endswith(".pq"):
        return _normalize_nanos(spark, spark.read.parquet(source))
    if lowered.endswith(".csv"):
        return spark.read.csv(source, header=True, inferSchema=True)
    if lowered.endswith(".json") or lowered.endswith(".jsonl"):
        return spark.read.json(source)
    if os.path.sep in source or os.path.isdir(source):
        return _normalize_nanos(spark, spark.read.parquet(source))
    return spark.table(source)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: Optional[str] = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int = 32,
    **options,
) -> DataFrame:
    """JDBC source with parallel partitioned reads.

    Scale: a single-connection JDBC read is a 1-task bottleneck; always
    pass a numeric/date ``partition_column`` + bounds so Spark issues
    ``num_partitions`` range-sliced queries. Comparison predicates placed
    on the result push down into each slice's WHERE clause.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, str(v))
    return reader.load()


def load_tables(spark: SparkSession, sf_dir: str, names: Optional[list[str]] = None) -> dict[str, DataFrame]:
    """Read the driver's synthetic tables and register temp views."""
    names = names or [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    out = {}
    for name in names:
        df = read_source(spark, os.path.join(sf_dir, f"{name}.parquet"))
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
