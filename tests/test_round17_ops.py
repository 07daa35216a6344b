"""Round-17 additions: scale-safe MNN, ADVICE pins, process guards."""

import os

from tests.conftest import SF_DIR


def test_ngram_jaccard_prederived_sh_matches_default(spark):
    """ADVICE r16: the ``sh`` parameter of ngram_jaccard_pairs (the
    persisted-artifact lane) requires distinct xxhash64'd shingles per
    document, enforced only by docstring — pin the contract by proving
    a caller-derived ``sh`` (built exactly as the default path builds
    it) reproduces the default-path pairs bit-for-bit."""
    from pyspark.sql import functions as F

    from database_extractor_spark.operators.dedup import (
        ngram_jaccard_pairs,
        shingles,
    )

    docs = spark.read.parquet(
        os.path.join(SF_DIR, "documents.parquet")
    ).select("doc_id", "text")

    default = ngram_jaccard_pairs(docs, threshold=0.5)
    sh = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                shingles(F.col("text"), 3), lambda s: F.xxhash64(s)
            )
        ).alias("s"),
    )
    prederived = ngram_jaccard_pairs(docs, threshold=0.5, sh=sh)

    key = lambda df: sorted(  # noqa: E731
        (r["id_a"], r["id_b"], r["jaccard"]) for r in df.collect()
    )
    d, p = key(default), key(prederived)
    assert len(d) > 0
    assert d == p


def test_market_basket_lift_broadcast_gate(spark):
    """ADVICE r16: the part dim grows with SF, so the broadcast must be
    gated. At fixture scale the gate keeps the broadcast (plan shows
    BroadcastHashJoin for the dim attach); the gate threshold itself is
    exercised by _path_bytes on the real fixture layout."""
    from database_extractor_spark.registry import QUERIES
    from database_extractor_spark.registry._base import _path_bytes

    part_bytes = _path_bytes(os.path.join(SF_DIR, "part.parquet"))
    assert 0 < part_bytes < 512 * 1024 * 1024
    df = QUERIES["market_basket_lift"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
