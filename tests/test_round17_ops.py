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


def test_mnn_bucketed_preserves_shared_cell_mutual_pairs(spark):
    """The bucketed variant's pinned invariant: restricting a candidate
    set keeps its max when the max is in the set — so every fixed-label
    mutual pair whose two members land in the SAME IVF cell must
    reappear in the bucketed result. Also: every bucketed pair shares
    label AND cell by construction."""
    from pyspark.sql import functions as F

    from database_extractor_spark.operators import similarity as S
    from database_extractor_spark.registry import QUERIES
    from database_extractor_spark.registry.llm_ops import (
        _auto_seed_vecs,
        _cached_ann_index,
    )

    exact = {
        (r["a_id"], r["b_id"])
        for r in QUERIES["mutual_nearest_neighbors"](spark, SF_DIR).collect()
    }
    bucketed = {
        (r["a_id"], r["b_id"])
        for r in QUERIES["mutual_nearest_neighbors_bucketed"](
            spark, SF_DIR
        ).collect()
    }
    assert bucketed, "bucketed MNN returned no pairs"

    e = spark.read.parquet(
        os.path.join(SF_DIR, "embeddings.parquet")
    ).select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    n = S.auto_n_lists(e.count())
    assigned = _cached_ann_index(
        "ivf_auto_mnn_v",
        SF_DIR,
        spark,
        lambda: S.ivf_assign(e, _auto_seed_vecs(SF_DIR, n), vec_col="v"),
    )
    cell = {
        r["vec_id"]: (r["label"], r["__list"])
        for r in assigned.select("vec_id", "label", "__list").collect()
    }
    for a, b in exact:
        if cell[a] == cell[b]:
            assert (a, b) in bucketed, (
                f"shared-cell mutual pair ({a},{b}) lost by bucketing"
            )
    for a, b in bucketed:
        assert cell[a] == cell[b]


def test_artifact_consumer_audit_derivation_and_shapes(spark):
    """VERDICT r16 item 5 plumbing: the artifact-consumer audit must
    (a) mechanically find every known consumer — new consumers enroll
    by construction, so a missing name here means the derivation broke
    — and (b) find no over-threshold unbounded artifact broadcast at
    this fixture (artifacts are tiny here, so any violation means the
    size gate itself broke). The scaled-fixture runs live in the
    BASELINE.md census."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "artifact_consumer_audit",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "artifact_consumer_audit.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    consumers = set(mod.consumer_entries())
    for must in (
        "mutual_nearest_neighbors_bucketed",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "eval_split_decontaminated",
        "ivf_index_maintenance",
        "semdedup_prune",
    ):
        assert must in consumers, f"consumer derivation lost {must}"

    from database_extractor_spark.registry import QUERIES

    art = mod.max_artifact_bytes(SF_DIR)
    for name in ("dedup_minhash_lsh", "mutual_nearest_neighbors_bucketed"):
        plan = (
            QUERIES[name](spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        hits = mod.unbounded_artifact_broadcasts(plan)
        if hits:
            assert art <= 10 * 1024 * 1024, (
                f"{name}: over-threshold artifact broadcast {hits}"
            )
