#!/usr/bin/env python
"""Measure skew handling under REAL skew (VERDICT r9 item 5).

The registry's skew escape hatches (salted_agg's two-stage aggregate,
salted_join_agg's explode-salted join) and the AQE skew-join config are
oracle-proven EQUAL on the uniform fixture, but until round 10 were never
timed against a fixture where one key actually dominates. This script:

1. builds a HOT-KEY variant of the (preferably sf1) orders table — a
   deterministic ~20 % of all rows are remapped to ONE customer key
   (md5-bucketed on o_orderkey, so the choice is engine-portable and
   reproducible);
2. times, steady-state (warm-up + min-of-2, bench.py's discipline):
   - plain vs salted GROUP-BY aggregate (AQE on),
   - plain shuffle join vs salted join, each with AQE skew-join ON and
     OFF (broadcast disabled for the join variants — a broadcast join
     has no shuffle and therefore no skew exposure to measure);
3. asserts, before timing, that every rewritten variant returns EXACTLY
   the plain variant's rows on the skewed data (sorted-row compare — the
   same guarantee the DuckDB oracles give on the uniform fixture);
4. prints one JSON line with the timings and ratios for BASELINE.md's
   skew section.

Run: python scripts/skew_bench.py  [--src DIR] [--hot-pct 20]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(df, runs: int = 2) -> float:
    df.write.format("noop").mode("overwrite").save()  # warm-up
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    default_src = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".sf1"
    )
    if not os.path.exists(os.path.join(default_src, "orders.parquet")):
        default_src = "/root/testdata/sf0.1"
    ap.add_argument("--src", default=default_src)
    ap.add_argument("--hot-pct", type=int, default=20)
    ap.add_argument(
        "--replicate",
        type=int,
        default=10,
        help="replicate source orders N more times (distinct orderkeys, "
        "same custkey space) — at 1.5M rows a 20%% hot key still clears "
        "one core in milliseconds; the straggler only becomes measurable "
        "with a multi-million-row hot partition",
    )
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".skew"
        ),
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from database_extractor_spark.operators import relational as R
    from database_extractor_spark.session import get_spark

    spark = get_spark(app_name="skew_bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up

    # ---- 1. hot-key fixture ------------------------------------------------
    orders_path = os.path.join(args.out, "orders.parquet")
    if not os.path.exists(orders_path):
        o = spark.read.parquet(os.path.join(args.src, "orders.parquet")).select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        stride = int(o.agg(F.max("o_orderkey")).first()[0]) + 1
        reps = spark.range(args.replicate).withColumnRenamed("id", "__rep")
        o = o.crossJoin(F.broadcast(reps)).withColumn(
            "o_orderkey",
            (F.col("o_orderkey") + F.col("__rep") * F.lit(stride)).cast(
                "bigint"
            ),
        ).drop("__rep")
        hot = o.agg(F.min("o_custkey")).first()[0]
        bucket = (
            F.conv(
                F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8),
                16,
                10,
            ).cast("long")
            % 100
        )
        skewed = o.withColumn(
            "o_custkey",
            F.when(bucket < args.hot_pct, F.lit(hot)).otherwise(
                F.col("o_custkey")
            ),
        )
        skewed.repartition(32).write.mode("overwrite").parquet(orders_path)
    o = spark.read.parquet(orders_path)
    c = spark.read.parquet(os.path.join(args.src, "customer.parquet")).select(
        "c_custkey", "c_mktsegment"
    )
    n = o.count()
    hot_key, hot_n = (
        o.groupBy("o_custkey").count().orderBy(F.desc("count")).first()
    )
    print(
        f"# skew fixture: {n} orders, hot key {hot_key} holds "
        f"{hot_n} rows ({100.0 * hot_n / n:.1f} %)",
        file=sys.stderr,
    )

    # ---- 2. the four plans -------------------------------------------------
    def agg_plain():
        return o.groupBy("o_custkey").agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("total"),
        )

    def agg_salted():
        salt = (F.xxhash64("o_orderkey") % 16).cast("int")
        partial = (
            o.withColumn("__salt", salt)
            .groupBy("o_custkey", "__salt")
            .agg(
                F.count("*").alias("pn"),
                F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("pt"),
            )
        )
        return partial.groupBy("o_custkey").agg(
            F.sum("pn").cast("bigint").alias("n"),
            F.sum("pt").cast("double").alias("total"),
        )

    def join_plain():
        return (
            o.select("o_custkey", "o_totalprice")
            .join(c, o.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").cast("bigint").alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
                .cast("double")
                .alias("total"),
            )
        )

    def join_salted():
        joined = R.salted_join(
            o.select(F.col("o_custkey").alias("k"), "o_totalprice"),
            c.select(F.col("c_custkey").alias("k"), "c_mktsegment"),
            on="k",
        )
        return joined.groupBy("c_mktsegment").agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("total"),
        )

    # ---- 3. equality before timing ------------------------------------------
    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    assert rows(agg_salted()) == rows(agg_plain()), "salted agg diverged"
    assert rows(join_salted()) == rows(join_plain()), "salted join diverged"
    print("# salted == plain on the skewed fixture: OK", file=sys.stderr)

    # ---- 4. timings ----------------------------------------------------------
    res: dict[str, float] = {}
    res["agg_plain"] = _time(agg_plain())
    res["agg_salted"] = _time(agg_salted())

    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        res["join_plain_aqe_off"] = _time(join_plain())
        res["join_salted_aqe_off"] = _time(join_salted())
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        res["join_plain_aqe_skew"] = _time(join_plain())
        res["join_salted_aqe_on"] = _time(join_salted())
        # AQE's skew split only triggers on partitions > BOTH the 256 MB
        # byte threshold AND 5x the median — a multi-million-row hot
        # partition that fits under 256 MB is a straggler AQE's DEFAULTS
        # ignore. The tuned variant lowers the thresholds to what this
        # fixture's skew actually is, showing the config lever a cluster
        # operator would pull before hand-salting.
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "8m",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m"
        )
        res["join_plain_aqe_skew_tuned"] = _time(join_plain())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        spark.conf.unset(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        )
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")

    res["hot_share_pct"] = round(100.0 * hot_n / n, 1)
    res["n_rows"] = n
    res["src"] = args.src
    res["ratio_join_aqe_skew_vs_off"] = round(
        res["join_plain_aqe_off"] / max(res["join_plain_aqe_skew"], 1e-9), 2
    )
    res["ratio_join_aqe_tuned_vs_off"] = round(
        res["join_plain_aqe_off"]
        / max(res["join_plain_aqe_skew_tuned"], 1e-9),
        2,
    )
    res["ratio_join_salted_vs_plain_aqe_off"] = round(
        res["join_plain_aqe_off"] / max(res["join_salted_aqe_off"], 1e-9), 2
    )
    res["ratio_agg_salted_vs_plain"] = round(
        res["agg_plain"] / max(res["agg_salted"], 1e-9), 2
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
