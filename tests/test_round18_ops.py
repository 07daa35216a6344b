"""Round-18 optimization pins: the containment df-cap skew guard and the
lang-id single-tokenize projection."""

import os
import re

from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_containment_skew_guard_path_matches_window_path(spark):
    """VERDICT r17 item 2: above CONTAINMENT_SKEW_GUARD_BYTES the df-cap
    switches from the count window (no map-side partial agg — one task
    owns a hot shingle's whole posting list) to the salted two-level
    aggregate. Pin that the guarded path (forced via skew_guard_bytes=0)
    emits bit-identical pairs, and that its plan carries NO Window and
    NO Sort over the posting stream (the straggler operators)."""
    from database_extractor_spark.operators.dedup import containment_pairs_capped

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    window_path = containment_pairs_capped(docs, threshold=0.8, df_cap=20)
    guarded_path = containment_pairs_capped(
        docs, threshold=0.8, df_cap=20, skew_guard_bytes=0
    )

    key = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    w, g = key(window_path), key(guarded_path)
    assert len(w) > 0
    assert w == g

    wp, gp = _plan(window_path), _plan(guarded_path)
    # default (small-source) path keeps the r17 window shape
    assert re.search(r"\(\d+\) Window", wp)
    # guarded path: no Window, no Sort anywhere (sort_array is an
    # expression, not a Sort node), both aggregation levels present
    assert not re.search(r"\(\d+\) Window", gp)
    assert not re.search(r"\(\d+\) Sort\b", gp)
    assert "pmod(xxhash64" in gp  # the salt key (the __salt alias is pruned)
    # and it must not regress to the r16 self-join-with-broadcast shape
    assert "SortMergeJoin" not in gp
    n_scans = len(re.findall(r"\(\d+\) Scan parquet", gp))
    assert n_scans <= 2, f"guarded path re-derived the corpus scan: {n_scans}"


def test_containment_skew_guard_on_hot_shingle_fixture(spark):
    """One boilerplate sentence shared by half the corpus: a single
    shingle with df = n/2. Both cap shapes must agree (here: no pair
    clears the threshold — boilerplate-only overlap is capped away)."""
    from pyspark.sql import functions as F

    from database_extractor_spark.operators.dedup import containment_pairs_capped

    boiler = "all rights reserved contact the publisher for licensing terms"
    docs = spark.range(4_000).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 2 == 0,
            F.concat(
                F.lit(boiler + " unique token "),
                F.col("id").cast("string"),
                F.lit(" tail "),
                (F.col("id") * 7919 % 104729).cast("string"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("document body "),
                F.col("id").cast("string"),
                F.lit(" filler "),
                (F.col("id") * 104729 % 7919).cast("string"),
            )
        )
        .alias("text"),
    )
    w = sorted(map(tuple, containment_pairs_capped(docs, df_cap=20).collect()))
    g = sorted(
        map(
            tuple,
            containment_pairs_capped(docs, df_cap=20, skew_guard_bytes=0).collect(),
        )
    )
    assert w == g


def test_lsh_pairs_stay_in_row_no_self_join(spark):
    """VERDICT r17 item 4 (the eval_split precedent): pin the r17
    lsh_candidate_pairs shape so a stats shift (e.g. the signature
    artifact growing real size estimates) can never bring back the
    bucket SELF-JOIN whose broadcast build side re-derived the whole
    banded subtree. The pair plan must carry NO join of any kind, NO
    BroadcastExchange, and exactly one Window (the bucket cap) over
    one derivation of the signature source."""
    from pyspark.sql import functions as F

    from database_extractor_spark.operators import dedup as D

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    sigs = D.with_minhash(docs, "text")
    plan = _plan(D.lsh_candidate_pairs(sigs))
    assert "Join" not in plan  # no SortMergeJoin/BroadcastHashJoin/SHJ
    assert "BroadcastExchange" not in plan
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_lang_id_single_tokenize_projection(spark):
    """The r18 with_lang_id rewrite materializes the token array once:
    the plan must contain exactly ONE split() of the text column (the
    folded r17 shape carried ~28), and lang_id_confusion_eval must scan
    documents exactly once with no join."""
    from database_extractor_spark.registry import QUERIES

    df = QUERIES["lang_id_confusion_eval"](spark, SF_DIR)
    plan = _plan(df)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Join" not in plan
    n_split = len(re.findall(r"split\(trim\(lower\(", plan))
    assert n_split == 1, f"tokenize duplicated {n_split}x in plan"
