#!/usr/bin/env python
"""Output denominators for the round-12 sf10 anchors (VERDICT r11 item 5).

Raw wall-clock alone cannot judge semdedup_prune / dedup_exact_substring:
on the replicated fixture their WORK grows faster than rows by design
(every original doc/vector becomes a ~10x-per-replication near-dup
family), so the honest bound is cost-per-unit-of-work:

- semdedup_prune: within-cluster candidate pairs sum(c_k * (c_k - 1) / 2)
  over the 16 trained clusters — the exact pair volume its dominant join
  emits (the entry's oracle pins n_lists=16, so pair volume is quadratic
  in cluster size on this fixture).
- dedup_exact_substring: emitted duplicate spans (the detection output).

Also measures the DEPLOYMENT configuration of semdedup at the largest
scale: n_lists scaled with the corpus (the paper's own scaling lever,
quoted in the entry docstring) — 160 frozen-seed clusters at sf10 keeps
cluster sizes at the sf1 level and should collapse the pair volume ~10x.

Run: python scripts/r12_scale_denominators.py [--dirs d1,d2,...]
Prints one JSON line per fixture dir.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIRS = ["/root/testdata/sf0.1", "/root/repo/.sf1", "/root/repo/.sf10"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", default=",".join(DIRS))
    ap.add_argument("--shuffle-partitions", type=int, default=128)
    # default None -> the API sizing rule similarity.auto_n_lists(N)
    # (round 13: the rule IS the deployment default; 160 at the 500k-row
    # sf10 corpus reproduces the measured r12 point via the API)
    ap.add_argument("--scaled-lists", type=int, default=None)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

    from pyspark.sql import functions as F

    from database_extractor_spark import registry as R
    from database_extractor_spark.operators import dedup as D
    from database_extractor_spark.operators import similarity as S
    from database_extractor_spark.session import get_spark

    spark = get_spark(
        app_name="r12_denominators", shuffle_partitions=args.shuffle_partitions
    )

    for d in args.dirs.split(","):
        d = d.strip()
        out: dict = {"dir": d}
        e = spark.read.parquet(os.path.join(d, "embeddings.parquet"))

        # --- semdedup pair volume at the entry's pinned n_lists=16 ---
        cents = R._trained_model(
            "ivf",
            d,
            R._TRAINED_IVF_CACHE,
            lambda: S.lloyd_rounds_cosine(e, R._fixture_seed_vecs(d), rounds=2),
        )
        assigned = S.ivf_assign(e, cents)
        sizes = assigned.groupBy("__list").count()
        out["semdedup_pairs_16"] = int(
            sizes.agg(
                F.sum(F.col("count") * (F.col("count") - 1) / 2).cast("bigint")
            ).first()[0]
        )

        # --- deployment config: n_lists scaled with the corpus ---
        # frozen-seed init widened to `scaled_lists` corpus vectors (the
        # same fixed-rule sampled quantizer, more of it), 2 Lloyd rounds
        n = args.scaled_lists
        if n is None:
            n = S.auto_n_lists(e.count())
        out["auto_n_lists"] = n
        import pyarrow.parquet as pq

        seed_rows = pq.read_table(
            os.path.join(d, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
            filters=[("vec_id", ">=", 1), ("vec_id", "<=", n)],
        ).to_pylist()
        seed_rows.sort(key=lambda r: r["vec_id"])
        seeds = [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in seed_rows
        ]
        t0 = time.perf_counter()
        cents_n = S.lloyd_rounds_cosine(e, seeds, rounds=2)
        av = S.ivf_assign(e, cents_n)
        norm = S.l2_norm(F.col("embedding"))
        av = av.select(
            "vec_id",
            F.transform(
                F.col("embedding"), lambda x: x.cast("double") / norm
            ).alias("__vn"),
            F.col("__list").cast("int").alias("cluster_id"),
        ).persist()
        pairs_n = int(
            av.groupBy("cluster_id")
            .count()
            .agg(
                F.sum(F.col("count") * (F.col("count") - 1) / 2).cast("bigint")
            )
            .first()[0]
        )
        a, b = av.alias("a"), av.alias("b")
        dropped = (
            a.join(b, "cluster_id")
            .filter(F.col("a.vec_id") < F.col("b.vec_id"))
            .filter(S.dot(F.col("a.__vn"), F.col("b.__vn")) >= 0.35)
            .select(F.col("b.vec_id").alias("vec_id"))
            .distinct()
        )
        out[f"semdedup_dropped_{n}"] = dropped.count()
        out[f"semdedup_pairs_{n}"] = pairs_n
        out[f"semdedup_wall_{n}"] = round(time.perf_counter() - t0, 3)
        av.unpersist(blocking=False)

        # --- exact-substring span volume (detection output) ---
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        out["substring_spans"] = D.exact_substring_spans(
            docs.select("doc_id", "text")
        ).count()

        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
