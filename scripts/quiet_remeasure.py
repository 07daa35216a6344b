"""Standalone quiet-box re-measure (the r07 protocol) for sf1 movers.

VERDICT r11 item 1: `ts_outlier_zscore` (+31%), `tpch_q21_waiting_suppliers`
(+26%) and `graph_triangle_count` (+13%) moved r10→r11 at sf1 with NO code
change to any of them (`git diff a6e6e27..HEAD` touches none); the claim
"box variance" must be re-earned with a standalone measure, not assumed.

Protocol (matches the round-7 re-measure recorded in BASELINE.md):
- fresh SparkSession, nothing else running on the box;
- os.getloadavg() recorded BEFORE the runs (the quiet-box evidence);
- per query: 1 warm-up + 5 timed runs, report the MIN (steady-state,
  JIT/shuffle-file warm — the number plan changes move, box load can't
  lower);
- noop sink (bench.py's action: full execution, no collect transfer).

Usage: python scripts/quiet_remeasure.py [query ...]  (default: the three
r11 movers). Prints one JSON line per query plus a summary line to paste
into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT = ["ts_outlier_zscore", "tpch_q21_waiting_suppliers", "graph_triangle_count"]
SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", os.path.join(REPO, ".sf1"))


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=None)
    ap.add_argument("--sf-dir", default=SF1_DIR,
                    help="fixture dir (default: the sf1 10x fixture)")
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()
    names = args.names or DEFAULT
    sf_dir = args.sf_dir
    load_before = os.getloadavg()

    import __spark_entry__ as E
    from database_extractor_spark.session import create_spark_client

    spark = create_spark_client()
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up

    queries = dict(E.queries())
    # bench-local pseudo-queries (e.g. dedup_minhash_pairs — the LSH
    # pair stage benched apart from clustering) are measurable too
    import bench as B

    queries.setdefault("dedup_minhash_pairs", B._dedup_minhash_pairs)
    results = {}
    for name in names:
        fn = queries[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        times = []
        for _ in range(args.runs):
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.monotonic() - t0, 3))
        results[name] = {"min": min(times), "runs": times}
        print(json.dumps({"query": name, "sf_dir": sf_dir, **results[name]}), flush=True)

    print(
        json.dumps(
            {
                "protocol": "fresh session, 1 warm-up + 5 timed, min, noop sink",
                "sf1_dir": sf_dir,
                "loadavg_before": load_before,
                "loadavg_after": os.getloadavg(),
                "min_by_query": {n: r["min"] for n, r in results.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
