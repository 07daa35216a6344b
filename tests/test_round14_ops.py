"""Round-14 additions: sparse-id dictionary-encoded bitmap distinct,
shared conf-window context manager, registry package split invariants."""

from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get(
    "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
)


@pytest.fixture(scope="module")
def spark():
    from database_extractor_spark.session import get_spark

    spark = get_spark(
        app_name="tests-r14", master="local[4]", shuffle_partitions=4
    )
    yield spark


def test_registry_split_preserves_contract():
    """The round-14 package split must be invisible to the driver
    contract: key-identical QUERIES/ORACLE entries, _VERIFY_FIRST
    names lead the insertion order, and the flat-module private-helper
    import surface still resolves."""
    from database_extractor_spark.registry import (
        ORACLE,
        QUERIES,
        _VERIFY_FIRST,
        _tbl,  # noqa: F401 — helper import surface
        _triangle_count_plan,  # noqa: F401
        _stream_funnel_batch,  # noqa: F401
    )

    assert set(QUERIES) == set(ORACLE)
    assert list(QUERIES)[: len(_VERIFY_FIRST)] == _VERIFY_FIRST
    # no module may regrow toward the flat-file hazard (VERDICT r13
    # item 3: "no file >4k lines")
    import pathlib

    import database_extractor_spark.registry as reg

    for p in pathlib.Path(reg.__file__).parent.glob("*.py"):
        n = sum(1 for _ in open(p))
        assert n < 4000, f"{p.name} has {n} lines (>4k)"


def test_bitmap_distinct_dictionary_matches_truth(spark):
    """The dictionary-encode + bitmap-fold compose must return exactly
    COUNT(DISTINCT user_id) per (event_type, day) — the encoding is a
    bijection, so the counts are invariant to it."""
    from pyspark.sql import functions as F

    from database_extractor_spark.registry import QUERIES, _tbl

    got = {
        (r["event_type"], str(r["day"])): r["n_users"]
        for r in QUERIES["bitmap_distinct_dictionary"](spark, SF_DIR).collect()
    }
    truth = {
        (r["event_type"], str(r["day"])): r["n"]
        for r in _tbl(spark, SF_DIR, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == truth and len(got) > 0


def test_bitmap_distinct_dictionary_plan_is_clean(spark):
    """Plan pins for the sparse-id lane (VERDICT r13 item 5): no Expand
    (the count-distinct rewrite this entry exists to avoid), no GLOBAL
    window (the dense rank must be bucket-partitioned), no cartesian /
    nested-loop join, no Python, and the dictionary encode must be an
    EQUI hash join on sparse_id — broadcast at tiny SF (Catalyst's
    stats-correct pick) but degrading to a shuffle join when the dim
    outgrows the broadcast threshold (the |users|-sized at-scale
    shape), proven here via a threshold=-1 conf window."""
    import re

    from database_extractor_spark.registry import QUERIES
    from database_extractor_spark.session import conf_window

    def plan_of():
        df = QUERIES["bitmap_distinct_dictionary"](spark, SF_DIR)
        return df._jdf.queryExecution().executedPlan().toString()

    plan = plan_of()
    for p in (plan,):
        assert "Expand" not in p, p
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p
        assert "BatchEvalPython" not in p
        assert not re.search(r"Window \[[^\n]*?\], \[\], \[", p), (
            "global window in plan"
        )
    assert "bitmap_construct_agg" in plan or "bitmap_count" in plan, plan
    assert re.search(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)[^\n]*sparse_id",
        plan,
    ), plan
    # at-scale shape: no broadcast -> the encode join must fall back to
    # a key-partitioned shuffle equi-join, never a nested loop
    with conf_window(
        spark, {"spark.sql.autoBroadcastJoinThreshold": "-1"}
    ):
        big = plan_of()
    assert re.search(
        r"(SortMergeJoin|ShuffledHashJoin)[^\n]*sparse_id", big
    ), big
    assert "BroadcastNestedLoopJoin" not in big


def test_conf_window_restores_and_unsets(spark):
    """conf_window must restore prior values on clean exit AND on error,
    and unset keys that had no prior value (VERDICT r13 item 6)."""
    import pytest as _pytest

    from database_extractor_spark.session import conf_window

    key = "spark.sql.autoBroadcastJoinThreshold"
    before = spark.conf.get(key)
    with conf_window(spark, {key: "-1"}):
        assert spark.conf.get(key) == "-1"
    assert spark.conf.get(key) == before

    with _pytest.raises(RuntimeError):
        with conf_window(spark, {key: "-1"}):
            raise RuntimeError("boom")
    assert spark.conf.get(key) == before

    novel = "spark.databaseextractor.test.confwindow"
    with _pytest.raises(Exception):
        spark.conf.get(novel)
    with conf_window(spark, {novel: "x"}):
        assert spark.conf.get(novel) == "x"
    with _pytest.raises(Exception):
        spark.conf.get(novel)


def test_sim_filtered_topk_prefilter_semantics(spark):
    """Pre-filter semantics: every returned id satisfies the metadata
    predicate, k is filled, and the predicate reaches the parquet scan
    as DataFilters (row-group skipping at scale)."""
    from database_extractor_spark.registry import QUERIES, _fixture_query_vec

    _, ql = _fixture_query_vec(SF_DIR)
    df = QUERIES["sim_filtered_topk"](spark, SF_DIR)
    rows = df.collect()
    assert len(rows) == 8
    for r in rows:
        assert r["vec_id"] % 3 == 0 and r["vec_id"] != 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "DataFilters: [" in plan and "% 3" in plan, plan
    # exact lane shape: no shuffle joins, no Python
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_doc_chunk_overlap_invariants(spark):
    """Chunking invariants: stride-24/size-32 windows — consecutive
    chunks overlap by 8 token positions, every token position is
    covered, only the tail chunk may be short, and chunking is
    shuffle-free up to the presentation sort."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from database_extractor_spark.registry import QUERIES, _tbl

    rows = QUERIES["doc_chunk_overlap"](spark, SF_DIR).collect()
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r["doc_id"]].append(r)
    n_tokens_truth = {
        r["doc_id"]: r["n"]
        for r in _tbl(spark, SF_DIR, "documents")
        .filter(F.col("text").isNotNull() & (F.length(F.trim("text")) > 0))
        .select(
            "doc_id",
            F.size(F.split(F.trim("text"), r"\s+")).alias("n"),
        )
        .collect()
    }
    assert set(by_doc) == set(n_tokens_truth)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        n = n_tokens_truth[doc_id]
        for i, c in enumerate(chunks):
            assert c["chunk_id"] == i
            assert c["start_tok"] == 1 + i * 24
            expect = min(32, n - c["start_tok"] + 1)
            assert c["n_tokens"] == expect
            if i < len(chunks) - 1:
                assert c["n_tokens"] == 32  # only the tail may be short
        # full coverage: last chunk reaches the final token
        last = chunks[-1]
        assert last["start_tok"] + last["n_tokens"] - 1 == n
    plan = (
        QUERIES["doc_chunk_overlap"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    # one scan, explode, project — the only exchange is the final sort's
    assert plan.count("Exchange") <= 1, plan
