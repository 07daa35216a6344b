#!/usr/bin/env python
"""Measure the streaming curation funnel over MANY micro-batches
(VERDICT r11 item 9's measurement half; the running-ledger rewrite is
the other half).

Before round 12 each micro-batch re-read EVERY prior batch's committed
part files (O(all prior batches) per batch — quadratic over the stream).
The ledger makes the per-batch read-back O(new batches): this script
splits the fixture's batch documents into N single-file micro-batches,
drives the same _stream_funnel_batch through maxFilesPerTrigger=1, and
reports per-batch wall times. Flat (or declining, as quotas fill) batch
times are the linearity proof; a quadratic read-back would show
monotonically growing times.

Round 13 (VERDICT r12 item 6): --gate minhash drives the streaming
NEAR-DUP gate (_stream_minhash_batch) through the same harness, so both
streaming entries carry a scaled many-batch anchor. The minhash gate's
per-batch work includes re-deriving prior-emitted signatures via the
broadcast semi-join — expected to grow GENTLY with cumulative emitted
count (the docstring's documented bound; a 100 TB deployment swaps to
the persisted bucketed signature table), while the ledger read-back
stays O(new batches) like the funnel's.

Run: python scripts/funnel_manybatch_bench.py [--sf-dir D] [--batches N]
     [--gate funnel|minhash]
Prints one JSON line: {"batch_secs": [...], "first3": s, "last3": s,
"emitted": n}.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--gate", choices=["funnel", "minhash"], default="funnel")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from database_extractor_spark import registry as R
    from database_extractor_spark.session import get_spark
    from database_extractor_spark.sources.custom import register_jsonl_sink

    spark = get_spark(app_name="funnel_manybatch")
    register_jsonl_sink(spark)

    base = tempfile.mkdtemp(prefix="funnel_mb_")
    src_dir = os.path.join(base, "src")
    out, ckpt = os.path.join(base, "out"), os.path.join(base, "ckpt")
    os.makedirs(out, exist_ok=True)

    docs = (
        spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
        .filter(F.col("doc_id") >= 250)
    )
    # EXACTLY one parquet file per micro-batch: a hash repartition on
    # doc_id % n collides distinct values into shared partitions (a
    # first cut produced 15 skewed files for --batches 20), so write
    # each round-robin slice as its own single-file append — n tiny
    # writes, deterministic and evenly sized
    n = args.batches
    for b in range(n):
        docs.filter(F.col("doc_id") % n == b).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)

    if args.gate == "funnel":
        state = R._funnel_corpus_fp(spark, args.sf_dir)
    else:
        from database_extractor_spark.operators import dedup as D

        state = D.with_minhash(
            spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
            .filter(F.col("doc_id") < 250)
            .select("doc_id", "text")
        ).localCheckpoint(eager=True)
    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )

    batch_secs: list[float] = []

    def run_batch(b, bid):
        t0 = time.perf_counter()
        if args.gate == "funnel":
            R._stream_funnel_batch(spark, b, bid, state, out)
        else:
            R._stream_minhash_batch(spark, b, bid, state, src_dir, out)
        batch_secs.append(round(time.perf_counter() - t0, 3))

    q = (
        stream.writeStream.foreachBatch(run_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError("many-batch drain exceeded 600 s")

    sink_schema = (
        R._FUNNEL_SINK_SCHEMA if args.gate == "funnel" else "doc_id bigint"
    )
    back = spark.read.schema(sink_schema).json(
        os.path.join(out, "part-*.jsonl")
    )
    emitted = back.count()
    k = min(3, len(batch_secs))
    print(
        json.dumps(
            {
                "batches": len(batch_secs),
                "batch_secs": batch_secs,
                "first3_avg": round(sum(batch_secs[:k]) / k, 3),
                "last3_avg": round(sum(batch_secs[-k:]) / k, 3),
                "emitted": emitted,
            }
        ),
        flush=True,
    )
    R._FUNNEL_LEDGER.pop(out, None)
    R._MINHASH_STREAM_LEDGER.pop(out, None)
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
