#!/usr/bin/env python
"""Capture .explain("formatted") output for registry entries into
plans/r17/<name>_<tag>.txt — the optimization round's plan-evidence
deliverable (guide §1: record the plan shape before and after every
change; the judge checks plan claims against these files).

Usage:
    python scripts/capture_plans.py --tag before [names ...]
    python scripts/capture_plans.py --tag after --sf-dir /root/testdata/sf0.1 q1 q2

Default name set: bench.py's HEADLINE list.
"""
from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=None)
    ap.add_argument("--tag", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out-dir", default=os.path.join(REPO, "plans", "r17"))
    args = ap.parse_args()

    import bench as B
    from database_extractor_spark.registry import QUERIES
    from database_extractor_spark.session import get_spark

    names = args.names or list(B.HEADLINE)
    os.makedirs(args.out_dir, exist_ok=True)
    spark = get_spark(app_name="capture_plans")

    for name in names:
        fn = QUERIES[name]
        try:
            df = fn(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — record the failure, keep going
            plan = f"EXPLAIN FAILED: {e!r}"
        path = os.path.join(args.out_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
