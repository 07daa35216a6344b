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
    """Convert known nano-epoch long columns to proper timestamps.

    Only the NANOS fixture layout (rounds 1–4) hits this: with
    ``spark.sql.legacy.parquet.nanosAsLong`` the column arrives as a raw
    long. The round-5 fixtures write TIMESTAMP(MICROS,
    isAdjustedToUTC=false), which Spark 4 reads as TIMESTAMP_NTZ and
    passes through untouched here — NTZ compares naively against DuckDB's
    naive read of the same column, while the few operators that need a
    zoned TIMESTAMP (unix_micros arithmetic, stream watermarks) cast at
    the point of use (timeseries._epoch_us, streaming.stream_source)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    for f in df.schema.fields:
        if f.name in NANOS_TS_COLS and isinstance(f.dataType, LongType):
            df = df.withColumn(f.name, F.expr(f"timestamp_micros({f.name} div 1000)"))
    return df


def read_source(
    spark: SparkSession,
    source: str,
    fmt: Optional[str] = None,
    ts_filter: Optional[tuple] = None,
) -> DataFrame:
    """Resolve a source string to a DataFrame.

    Dispatch: explicit ``fmt`` wins; else by extension; a path-less name is
    treated as a catalog table/view. Directories default to parquet
    (partitioned layouts like ``.../date=2024-01-01/`` prune on filter).

    ``ts_filter=(col, start, stop)`` applies the half-open time window IN
    THE COLUMN'S NATIVE SPACE, before any type normalization. This matters
    for nanos-long timestamp columns: a filter on the converted timestamp
    cannot reach parquet row-group stats (Catalyst can't invert
    ``timestamp_micros``), but the exactly-equivalent raw predicate
    ``raw_nanos >= start_micros*1000 AND raw_nanos < stop_micros*1000``
    (floor-division equivalence, no widening needed) prunes row groups at
    the scan. The timestamp-space filter applied later by
    ``operators.core.time_range`` stays as the semantic source of truth —
    the two are equivalent, so the extra predicate is pure pushdown.
    """
    if fmt == "table" or (fmt is None and not (
        os.path.sep in source or os.path.isdir(source)
        or source.lower().endswith((".parquet", ".pq", ".csv", ".json", ".jsonl"))
    )):
        # same normalization/pushdown contract as file sources: a view over
        # nanos-long data gets proper timestamps, and ts_filter applies in
        # the column's native space (pushes through the view into its scan)
        tbl = spark.table(source)
        if ts_filter is not None:
            tbl = _apply_native_ts_filter(tbl, *ts_filter)
        return _normalize_nanos(spark, tbl)

    # safety for externally-built sessions; session.py sets this at create
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    lowered = source.lower()
    if fmt == "csv" or (fmt is None and lowered.endswith(".csv")):
        raw = spark.read.csv(source, header=True, inferSchema=True)
    elif fmt:
        raw = spark.read.format(fmt).load(source)
    elif lowered.endswith((".json", ".jsonl")):
        raw = spark.read.json(source)
    else:
        raw = spark.read.parquet(source)

    if ts_filter is not None:
        raw = _apply_native_ts_filter(raw, *ts_filter)
    return _normalize_nanos(spark, raw)


def _apply_native_ts_filter(df: DataFrame, col: str, start, stop) -> DataFrame:
    """Half-open [start, stop) in the column's on-disk representation, so
    the predicate reaches parquet stats (see read_source docstring)."""
    from datetime import datetime, timezone

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    field = next((f for f in df.schema.fields if f.name == col), None)
    if field is None:
        return df
    if isinstance(field.dataType, LongType) and col in NANOS_TS_COLS:
        def to_nanos(v) -> int:
            if isinstance(v, str):
                v = datetime.fromisoformat(v)
            if v.tzinfo is None:
                v = v.replace(tzinfo=timezone.utc)
            td = v - datetime(1970, 1, 1, tzinfo=timezone.utc)
            micros = (td.days * 86400 + td.seconds) * 1_000_000 + td.microseconds
            return micros * 1000

        return df.filter((F.col(col) >= to_nanos(start)) & (F.col(col) < to_nanos(stop)))
    return df.filter((F.col(col) >= F.lit(start)) & (F.col(col) < F.lit(stop)))


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
