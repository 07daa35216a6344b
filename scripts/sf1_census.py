#!/usr/bin/env python
"""Full-registry sf1 timing census (VERDICT r16 item 6).

One noop-write timed run per registry entry at the .sf1 fixture — the
enumeration pass that finds entries with sf1 > 1.5 s and no sf10 anchor
row, i.e. the un-measured tail where scale defects hide (the r16 sf10
extension found 3 real defects in 5 newly measured entries). Single-run
precision is enough for a >1.5 s threshold filter; the selected tail is
then anchored properly (min-of-2, 128 partitions) by sf10_anchor.py.

Prints one JSON line: {"times": {entry: sec}, "errors": {...}, "dir": ...}

Run: python scripts/sf1_census.py [--dir /root/repo/.sf1] [--out FILE]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/root/repo/.sf1")
    ap.add_argument("--out", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=64)
    ap.add_argument("--skip", default="", help="comma-separated entries")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

    from database_extractor_spark.registry import QUERIES
    from database_extractor_spark.session import get_spark

    spark = get_spark(
        app_name="sf1_census", shuffle_partitions=args.shuffle_partitions
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up

    skip = {s for s in args.skip.split(",") if s}
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    t_all = time.monotonic()
    for i, (name, fn) in enumerate(QUERIES.items()):
        if name in skip:
            continue
        t0 = time.perf_counter()
        try:
            fn(spark, args.dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — census, not a gate
            errors[name] = repr(exc)[:200]
        if (i + 1) % 25 == 0:
            print(
                f"# {i + 1}/{len(QUERIES)} ({time.monotonic() - t_all:.0f}s)",
                file=sys.stderr,
                flush=True,
            )
    out = {
        "times": times,
        "errors": errors,
        "dir": args.dir,
        "elapsed_sec": round(time.monotonic() - t_all, 1),
    }
    line = json.dumps(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line)
    print(line)


if __name__ == "__main__":
    main()
