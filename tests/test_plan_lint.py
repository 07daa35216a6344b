"""Plan lint: every registry entry's physical plan is checked for the
anti-patterns that break at 100 TB —

- CartesianProduct / BroadcastNestedLoopJoin (quadratic blowup)
- BatchEvalPython (row-at-a-time Python UDF; only Arrow-batched
  ArrowEvalPython/FlatMapGroupsInPandas are sanctioned, and only in the
  explicitly whitelisted pandas-extension entries)

Entries that EXECUTE on construction (streaming runs, sink roundtrips)
are linted on their result frame's plan where possible or skipped with
reason.
"""

import pytest

import __spark_entry__ as E
from tests.conftest import SF_DIR

#: entries whose callables run jobs on construction; their interesting
#: plan is inside the run (covered by their own tests)
EXECUTES_ON_BUILD = {
    "streaming_event_counts",
    "streaming_hopping_counts",
    "streaming_merge_upsert",
    "streaming_stateful_first_seen",
    "streaming_dedup",
    "streaming_incremental_sink",
    "upsert_day_overwrite",
    "schema_evolution_merge",
    "csv_source_roundtrip",
    "json_source_roundtrip",
    "jdbc_source_roundtrip",
    "text_source_roundtrip",
    "o13_sink_roundtrip",
    # writes its bucketed tables on build; join-plan shape asserted in
    # tests/test_scale_posture.py::test_bucketed_join_registry_entry_plan
    "bucketed_join_colocated",
}

#: entries allowed to contain Arrow-batched Python stages
ARROW_OK = {"pandas_ema", "multimodal_decode", "multimodal_resize"}

#: entries allowed ONE BroadcastNestedLoopJoin whose build side is a 1-row
#: global aggregate (crossJoin(broadcast(df.agg(...)))): the idiomatic
#: "attach a scalar in-plan" shape. The nested loop degenerates to a
#: constant-time single-row probe per stream row — O(n), not quadratic —
#: and it replaces a driver-side .count() that cost a whole extra job.
SCALAR_ATTACH_OK = {
    "text_tfidf",
    "text_unigram_logprob",
    "text_bigram_logprob",
    "share_of_total_agg",
    "equal_freq_binning",
    "text_bm25",
}


@pytest.mark.parametrize("name", sorted(E.queries().keys()))
def test_plan_has_no_scale_antipatterns(name, spark):
    if name in EXECUTES_ON_BUILD:
        pytest.skip("executes on build; plan covered by dedicated tests")
    df = E.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    if name in SCALAR_ATTACH_OK:
        assert plan.count("BroadcastNestedLoopJoin") <= 1, (
            f"{name}: only the single scalar-attach nested-loop join is allowed"
        )
        if "BroadcastNestedLoopJoin" in plan:
            # the whitelisted shape is O(n): the broadcast side must be a
            # single-row GLOBAL aggregate (IdentityBroadcastMode exchange
            # whose child is HashAggregate(keys=[])). A genuine multi-row
            # nested-loop regression would broadcast something else.
            import re as _re

            assert _re.search(
                r"BroadcastExchange IdentityBroadcastMode[^\n]*\n[\s:]*\+- "
                r"(?:Project [^\n]*\n[\s:]*\+- )?(?:Object)?HashAggregate\(keys=\[\]",
                plan,
            ), (
                f"{name}: nested-loop join build side is not a 1-row global "
                f"aggregate — quadratic-blowup risk:\n{plan}"
            )
    else:
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}: nested-loop join in plan"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF in plan"
    # an unpartitioned window funnels the whole input through ONE task —
    # the quiet scale-killer; every window must declare a partitioning
    import re

    assert not re.search(r"Window \[[^\n]*?\], \[\], \[", plan), (
        f"{name}: global (unpartitioned) window in plan"
    )
    if name not in ARROW_OK:
        assert "ArrowEvalPython" not in plan and "FlatMapGroupsInPandas" not in plan, (
            f"{name}: unexpected Python stage in plan"
        )
