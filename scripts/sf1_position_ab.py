"""A/B the sf1 anchors' BENCH POSITION (VERDICT r13 item 2).

Hypothesis under test: the r11->r13 driver-side growth of
`dedup_minhash_lsh` at sf1 (5.98 -> 7.26 -> 9.23 s, code unchanged) is
accumulated SESSION pressure — the sf1 suite ran LAST in bench.py, after
~75 noop actions over a registry that grew ~2k lines/round — not a plan
regression.

This script measures the SAME sf1 suite in the SAME process twice:

  position A ("fresh"): right after session start + JVM warm-up — the
      controlled position bench.py now uses (subprocess);
  position B ("aged"): after replaying bench.py's full headline +
      secondary sf0.1 workload (the pre-r14 bench position).

If B >> A on identical code, the bench-order hypothesis is confirmed and
the historical sf1 rows are position artifacts; if B ~= A, the drift
needs another explanation. Results go into BASELINE.md as the r14
attribution row.

Usage: python scripts/sf1_position_ab.py
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", os.path.join(REPO, ".sf1"))
SF01_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def time_suite(queries, names, sf_dir) -> dict[str, float]:
    out = {}
    for name in names:
        fn = queries[name]
        fn(SPARK, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            fn(SPARK, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        out[name] = round(best, 3)
    return out


def main() -> None:
    global SPARK
    import bench as B
    from database_extractor_spark.registry import QUERIES
    from database_extractor_spark.session import create_spark_client

    load0 = os.getloadavg()
    SPARK = create_spark_client()
    SPARK.range(1_000_000).selectExpr("sum(id)").collect()

    pos_a = time_suite(QUERIES, B.SF1_SUITE, SF1_DIR)
    print(json.dumps({"position": "A_fresh", **pos_a}), flush=True)

    # replay the in-session pressure: every headline + secondary entry at
    # sf0.1, 1 warm + 1 timed action each (the pre-r14 bench position)
    n_actions = 0
    for name in B.HEADLINE + B.SECONDARY:
        fn = QUERIES[name]
        for _ in range(2):
            fn(SPARK, SF01_DIR).write.format("noop").mode("overwrite").save()
            n_actions += 1
    print(json.dumps({"pressure_actions": n_actions}), flush=True)

    pos_b = time_suite(QUERIES, B.SF1_SUITE, SF1_DIR)
    print(json.dumps({"position": "B_aged", **pos_b}), flush=True)

    print(
        json.dumps(
            {
                "protocol": "same process, 1 warm + min-of-2 noop per query",
                "loadavg_start": load0,
                "loadavg_end": os.getloadavg(),
                "ratio_b_over_a": {
                    n: round(pos_b[n] / pos_a[n], 3) for n in pos_a
                },
            }
        )
    )


if __name__ == "__main__":
    main()
