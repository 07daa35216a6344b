#!/usr/bin/env python
"""Time the five sf1 scale anchors at sf10 (VERDICT r9 item 4 / r10 item 3).

One ratio point (sf0.1 -> sf1) cannot distinguish linear from
quadratic-in-output growth; this adds the third point. The sf10 fixture
is make_scaled_fixture applied to .sf1 (so 100x the driver's sf0.1 rows:
60M lineitem, 500k documents, 200k embeddings).

Timing discipline: one warm-up + min-of-2 for anchors whose first run
is under 120 s, a single timed run otherwise (an output-pair-bound
dedup at 100x can be minutes; re-running it twice buys no precision the
curve needs). Prints one JSON line:
    {"anchors": {name: sec}, "n": {...}, "sf10_dir": ...}

Run: python scripts/sf10_anchor.py  [--dir /root/repo/.sf10]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ANCHORS = [
    "dedup_minhash_lsh",
    "dedup_containment_capped",
    "tpch_q21_waiting_suppliers",
    "graph_triangle_count",
    "ts_outlier_zscore",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/root/repo/.sf10")
    ap.add_argument("--single-run-above", type=float, default=120.0)
    ap.add_argument(
        "--anchors",
        default=None,
        help="comma-separated entry names to time instead of the default "
        "five (round-12: semdedup_prune,dedup_exact_substring_apply)",
    )
    ap.add_argument(
        "--shuffle-partitions",
        type=int,
        default=128,
        help="sf10 holds 100x the sf0.1 rows; 32 partitions (the sf0.1 "
        "default) makes each aggregation partition 100x larger and OOMs "
        "the hash aggregate. 128 keeps per-partition state at roughly "
        "the sf1 level — exactly the spark.sql.shuffle.partitions "
        "scaling a cluster deployment does.",
    )
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

    from database_extractor_spark.registry import QUERIES
    from database_extractor_spark.session import get_spark

    spark = get_spark(
        app_name="sf10_anchor", shuffle_partitions=args.shuffle_partitions
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up

    anchors = (
        [a.strip() for a in args.anchors.split(",") if a.strip()]
        if args.anchors
        else ANCHORS
    )
    unknown = [a for a in anchors if a not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown anchors (check before timing): {unknown}")
    res: dict[str, float] = {}
    for name in anchors:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, args.dir).write.format("noop").mode("overwrite").save()
        first = time.perf_counter() - t0
        if first < args.single_run_above:
            # warm-up done (`first`), report min of the 2 timed runs only
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, args.dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
        else:
            best = first  # single (cold) run for expensive anchors
        res[name] = round(best, 3)
        print(f"# {name}: {res[name]} s (first {round(first, 3)})",
              file=sys.stderr)

    import pyarrow.parquet as pq

    def nrows(t):
        p = os.path.join(args.dir, f"{t}.parquet")
        if os.path.isdir(p):
            import glob as g
            return sum(pq.read_metadata(f).num_rows
                       for f in g.glob(os.path.join(p, "*.parquet")))
        return pq.read_metadata(p).num_rows

    print(json.dumps({
        "anchors": res,
        "total": round(sum(res.values()), 3),
        "n": {t: nrows(t) for t in ("lineitem", "documents", "embeddings",
                                    "events", "orders")},
        "sf10_dir": args.dir,
    }))


if __name__ == "__main__":
    main()
