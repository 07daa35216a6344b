"""Sinks: dated CSV (reference parity) and parquet (engine-native).

Parity targets:
- dated CSV write  -> reference database_extractor.py:349-355, main.py:147-149
- pickle sink      -> reference main.py:72 (pandas pickle); the Spark-native
  serialized form is parquet.

Scale: the reference writes one CSV per day from a driver-side loop. Here a
single write with ``partitionBy("date")`` produces the same per-day file
layout from one distributed job, with per-partition atomicity via the
commit protocol.
"""

from __future__ import annotations

import os
import shutil
from datetime import datetime
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", single_file: bool = False) -> None:
    """CSV sink with header; ``single_file`` coalesces to 1 task for the
    reference's one-file-per-day shape (only sane for small results —
    guards upstream enforce that, as in the reference)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", "true").csv(path)


def write_dated_csv(df: DataFrame, base_dir: str, current_date: datetime, prefix: str = "extract") -> str:
    """Reference-shaped dated path: ``{base}/{prefix}_{Y}-{m}-{d}.csv``."""
    path = f"{base_dir}/{prefix}_{current_date.year}-{current_date.month:02d}-{current_date.day:02d}.csv"
    write_csv(df, path, single_file=True)
    return path


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Optional[Sequence[str]] = None,
) -> None:
    out = df.write.mode(mode)
    if partition_by:
        out = out.partitionBy(*partition_by)
    out.parquet(path)


def write_day_partitioned(df: DataFrame, ts_col: str, path: str, mode: str = "overwrite") -> None:
    """One distributed write replacing the reference's day loop: derive a
    ``date`` column and ``partitionBy`` it — downstream readers get
    partition pruning on date predicates for free."""
    write_parquet(
        df.withColumn("date", F.to_date(F.col(ts_col))),
        path,
        mode=mode,
        partition_by=["date"],
    )


def compact_parquet(
    df: DataFrame,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    mode: str = "overwrite",
) -> int:
    """Small-files compaction: rewrite a DataFrame's source files into
    ~``target_file_bytes`` outputs. Small-files explosion is the top
    operational failure of long-lived parquet lakes (per-file open cost,
    scan-task explosion, NameNode/listing pressure) — compaction keeps
    scan parallelism matched to data volume.

    File count = ceil(input_bytes / target); local paths are sized
    directly, non-local (hdfs://, s3a://) via the Hadoop FileSystem API.
    Returns the number of files written. ``repartition(n)`` is a full
    round-robin shuffle — even output sizes, no skewed tail file.
    """
    import math
    import os as _os

    total = 0
    files = df.inputFiles()
    for f in files:
        if f.startswith("file:"):
            total += _os.path.getsize(f[len("file:"):])
        else:
            jvm = df.sparkSession._jvm
            jsc = df.sparkSession._jsc
            path = jvm.org.apache.hadoop.fs.Path(f)
            fs = path.getFileSystem(jsc.hadoopConfiguration())
            total += fs.getFileStatus(path).getLen()
    n = max(1, math.ceil(total / target_file_bytes))
    df.repartition(n).write.mode(mode).parquet(out_path)
    return n


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: Optional[str] = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed+sorted managed table: rows are hash-bucketed
    on ``bucket_col`` into ``n_buckets`` files per partition and sorted
    within each bucket.

    This is THE layout lever for repeated big joins/aggregations on the
    same key at 100 TB: two tables bucketed identically on the join key
    sort-merge-join bucket-to-bucket with NO Exchange on either side —
    the shuffle is paid once at write time and amortized over every
    subsequent query. (Requires spark.sql.sources.bucketing.enabled,
    on by default; bucket counts must match or divide evenly.)
    """
    if "." in table or "/" in table:
        raise ValueError(
            f"write_bucketed requires an unqualified table name, got {table!r}"
        )
    spark = df.sparkSession
    spark.sql(f"drop table if exists `{table}`")
    # a previous session may have left the managed location behind with no
    # catalog entry (in-memory catalog, persistent warehouse dir) — clear
    # it or saveAsTable refuses with LOCATION_ALREADY_EXISTS. Only safe
    # when the warehouse dir resolves to a non-empty absolute local path;
    # otherwise the join would produce a bare relative path and delete a
    # same-named directory in the process CWD.
    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    wh_local = wh.removeprefix("file:") if wh.startswith("file:") else (
        wh if "://" not in wh else ""
    )
    if wh_local and os.path.isabs(wh_local):
        loc = os.path.join(wh_local, table.lower())
        if os.path.isdir(loc):
            shutil.rmtree(loc)

    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    writer = writer.sortBy(sort_col or bucket_col)
    writer.saveAsTable(table)


def overwrite_partitions_dynamic(
    df: DataFrame, path: str, partition_by: Sequence[str]
) -> None:
    """Dynamic partition overwrite: replace ONLY the partitions present in
    ``df``, leaving sibling partitions untouched — the parquet-native
    upsert for late-arriving corrections (re-extract one day without
    rewriting the lake; the reference's per-day CSV overwrite generalized
    to a partitioned table). Static overwrite mode would truncate the
    whole root path; the mode is restored after the write
    (session.conf_window — the write itself materializes inside)."""
    from database_extractor_spark.session import conf_window

    spark = df.sparkSession
    with conf_window(
        spark, {"spark.sql.sources.partitionOverwriteMode": "dynamic"}
    ):
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
