#!/usr/bin/env python
"""Generate a 10x-scaled fixture ("sf1") from the driver's sf0.1 parquet.

Why: BASELINE.md's scaling-curve section (VERDICT r6 item 7) needs a second
measured scale point so the "would this plan survive a 100x scale-up" claims
rest on a curve, not a single dot. The driver only ships
sf{0.001,0.01,0.1}; this script replicates sf0.1 REPLICAS times with
key-space offsets so every FK relationship still joins:

- fact/bridge keys (orderkey, custkey, partkey, suppkey, doc_id, vec_id,
  event_id, user_id) are offset by ``replica * stride`` where stride is
  ``max(key)+1`` of the source table, so replica key ranges never collide
  and lineitem->orders->customer / lineitem->part/supplier joins keep
  exactly the sf0.1 match cardinality per replica;
- dimension tables (region, nation) are NOT scaled — TPC-H holds them
  fixed at every SF, and scaled facts still reference the same nationkeys;
- documents.text gets a per-replica prefix token so cross-replica copies
  are near-duplicates (high-Jaccard) instead of byte-identical — keeps
  MinHash/shingle workloads non-degenerate (real corpora are near-dup
  heavy, not exact-dup heavy);
- embeddings get a small per-replica additive jitter so ANN top-k doesn't
  collapse to 10-way exact ties;
- events timestamps are kept as-is: scaling density-per-window (not span)
  is the realistic way event volume grows.

Output goes to --out (default /root/repo/.sf1, gitignored). Run:

    python scripts/make_scaled_fixture.py
    SPARK_GRAFT_SF_DIR=/root/repo/.sf1 python bench.py
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICAS = 10

#: table -> columns to offset by replica*stride(max+1 of the FIRST listed
#: source table for that key name, so FKs share one stride)
KEYED = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
#: key-name -> (table, column) that defines the stride, shared across FKs
STRIDE_SOURCE = {
    "orderkey": ("orders", "o_orderkey"),
    "custkey": ("customer", "c_custkey"),
    "partkey": ("part", "p_partkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}
DIMS = ["region", "nation"]


def _key_family(col: str) -> str:
    for fam in STRIDE_SOURCE:
        if col.endswith(fam):
            return fam
    raise KeyError(col)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/.sf1")
    ap.add_argument("--replicas", type=int, default=REPLICAS)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from database_extractor_spark.session import get_spark

    spark = get_spark(app_name="make_scaled_fixture")

    strides = {}
    for fam, (tbl, col) in STRIDE_SOURCE.items():
        df = spark.read.parquet(os.path.join(args.src, f"{tbl}.parquet"))
        strides[fam] = int(df.agg(F.max(col)).first()[0]) + 1

    os.makedirs(args.out, exist_ok=True)
    for tbl in DIMS:
        spark.read.parquet(os.path.join(args.src, f"{tbl}.parquet")) \
            .write.mode("overwrite").parquet(os.path.join(args.out, f"{tbl}.parquet"))

    for tbl, keycols in KEYED.items():
        src = spark.read.parquet(os.path.join(args.src, f"{tbl}.parquet"))
        # cross join against a replica index, offset keys per replica —
        # stays fully distributed (no collect), one shuffle-free map stage
        reps = spark.range(args.replicas).withColumnRenamed("id", "__rep")
        df = src.crossJoin(F.broadcast(reps))
        for col in keycols:
            df = df.withColumn(
                col, (F.col(col) + F.col("__rep") * F.lit(strides[_key_family(col)])).cast("bigint")
            )
        if tbl == "documents":
            # replica 0 keeps the original byte-identical text so exact-dup
            # entries still see their sf0.1 distribution within a replica
            df = df.withColumn(
                "text",
                F.when(F.col("__rep") == 0, F.col("text")).otherwise(
                    F.concat(F.lit("[r"), F.col("__rep").cast("string"), F.lit("] "), F.col("text"))
                ),
            ).withColumn("n_chars", F.length("text").cast("bigint"))
        if tbl == "embeddings":
            df = df.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x: (x + F.col("__rep").cast("float") * F.lit(0.001)).cast("float"),
                ),
            )
        df.drop("__rep").repartition(32).write.mode("overwrite").parquet(
            os.path.join(args.out, f"{tbl}.parquet")
        )
        print(f"wrote {tbl} x{args.replicas}")
    spark.stop()


if __name__ == "__main__":
    main()
