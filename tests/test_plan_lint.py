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
    "streaming_quality_gate",
    "upsert_day_overwrite",
    "schema_evolution_merge",
    "csv_source_roundtrip",
    "json_source_roundtrip",
    "xml_source_roundtrip",
    "jdbc_source_roundtrip",
    "text_source_roundtrip",
    "o13_sink_roundtrip",
    # writes its bucketed tables on build; join-plan shape asserted in
    # tests/test_scale_posture.py::test_bucketed_join_registry_entry_plan
    "bucketed_join_colocated",
    # collects its bounded 50-row candidate pool on build; the
    # distributed pool plan is asserted in test_mmr_pool_plan below
    "mmr_diversified_topk",
    # writes its year-partitioned lake on build; the DPP plan shape is
    # asserted in tests/test_round7_ops.py::test_dpp_plan_prunes_at_runtime
    "dpp_partition_pruned_join",
    # runs the custom Python writer on build; the returned frame is the
    # read-back aggregate (Arrow/Python stages live in the write job)
    "python_datasource_sink_roundtrip",
    # compiles+materializes inside its conf window (bloom thresholds are
    # cluster-sized); the injected-filter plan is asserted in
    # tests/test_round9_ops.py::test_runtime_bloom_join_plan
    "runtime_bloom_join",
    # runs its streaming write on build; the returned frame is the
    # sink read-back aggregate (Python stages live in the write job)
    "python_datasource_stream_sink",
    # runs the observed extraction job on build; the returned frame is
    # the 1-row collected-metrics literal
    "observed_metrics_extract",
    # materializes its dropped set on build (signature cache released
    # before returning, the minhash_dedup discipline); the full lazy
    # candidate/verify plan is linted in
    # test_incremental_minhash_lazy_plan below
    "dedup_incremental_minhash",
    # runs its availableNow stream on build; the per-batch joins are the
    # incremental_minhash_dedup plan linted above
    "streaming_minhash_dedup",
    # collects its bounded 32-candidate pool + runs the greedy loop on
    # build (returned frame is the 8-row selection literal); the
    # distributed dot stage is linted by test_facility_dots_prechk_plan
    "facility_location_coreset",
}

#: entries allowed to contain Arrow-batched Python stages
ARROW_OK = {
    "pandas_ema",
    "multimodal_decode",
    "multimodal_resize",
    "multimodal_audio_decode",
    # Spark 4 Python UDTF, Arrow-batched (ArrowEvalPythonUDTF); the
    # row-at-a-time BatchEvalPythonUDTF form would still fail the lint
    "udtf_tokenize_offsets",
    # raw mapInArrow (round 9): RecordBatches straight into numpy
    "arrow_batch_normalize",
    # cogrouped applyInPandas (round 9): FlatMapCoGroupsInPandas
    "cogroup_pandas_asof",
}

#: entries allowed ONE BroadcastNestedLoopJoin whose build side is a 1-row
#: global aggregate (crossJoin(broadcast(df.agg(...)))): the idiomatic
#: "attach a scalar in-plan" shape. The nested loop degenerates to a
#: constant-time single-row probe per stream row — O(n), not quadratic —
#: and it replaces a driver-side .count() that cost a whole extra job.
#: entries allowed TWO chained scalar attaches — every nested-loop build
#: side is still shape-checked as a 1-row global aggregate below
SCALAR_ATTACH_OK_2 = {
    # conformal: k over the 1-row calibration count, then qhat (itself a
    # 1-row global aggregate) over the test scan
    "conformal_threshold",
}

SCALAR_ATTACH_OK = {
    "text_tfidf",
    "text_unigram_logprob",
    "text_bigram_logprob",
    "share_of_total_agg",
    "equal_freq_binning",
    "text_bm25",
    # RRF's lane 1 is text_bm25's plan verbatim, inheriting its 1-row
    # N/avgdl stats attach; the fusion stages add only equi-unions,
    # a lane-partitioned window, and TakeOrdered
    "hybrid_rank_fusion",
    # Q22's global-threshold CTE (`from cust, thr` with thr a 1-row
    # sum/count aggregate) is the same exact-integer scalar attach,
    # expressed through the SQL front-end
    "tpch_q22_global_sales_opportunity",
    # DSIR's corpus stats (V, total, target-total) ride one 1-row attach
    "dsir_importance_resample",
    # reuses text_unigram_logprob's plan, inheriting its corpus-total attach
    "ccnet_perplexity_buckets",
    # Tukey-fence quartiles ride one 1-row percentile aggregate
    "length_outlier_filter",
    # mixture normalizers (total sqrt-mass + total tokens) ride one
    # 1-row attach over the |langs|-row share table
    "mixture_epoch_plan",
    # RFM quartile edges (9 exact percentiles) ride one 1-row attach
    # over the per-user aggregate
    "user_rfm_segments",
    # novelty joins two 1-row global counts (batch-distinct x new) —
    # a 1-row x 1-row attach
    "ngram_novelty_ratio",
    # norm band edges (2 exact percentiles) ride one 1-row attach
    "embedding_norm_outliers",
    # KS sample sizes (n1, n2) ride one 1-row attach over the pooled
    # value-grid aggregate
    "ks_test_drift",

    # the basket-universe order count (1-row COUNT DISTINCT) rides one
    # attach; the pair self-join and marginal joins are all equi-joins
    "market_basket_lift",
    # the contingency-table column margins (1-row doc totals) ride one
    # attach over the min-df-gated token table
    "token_label_chi2",
    # the decile denominator (1-row max(doc_id)) rides one attach
    # before the per-doc bucket assignment
    "vocab_growth_curve",
    # the digit-share denominator (1-row total count) rides one attach
    # over the 9-row digit frame
    "benford_digit_profile",
    # the survival denominator (1-row user count) rides one attach
    # over the <= 31-row retention frame
    "user_retention_curve",
    # the bin frame (1-row min/max/count) rides one attach before the
    # 16-bucket assignment scan
    "histogram_quantile_interp",
    # the global-share denominator (1-row revenue total) rides one
    # attach over the 25-row nation frame
    "geo_rollup_share",
    # the skew denominator (1-row total/count/max) rides one attach
    # over the per-file frame
    "input_file_skew",
    # the 1-row bootstrap-replicate summary attaches to the 1-row
    # point-estimate aggregate
    "metric_bootstrap_ci",
    # the decile denominator (1-row max(vec_id)) rides one attach
    # before the per-vector bucket assignment
    "embedding_centroid_drift",
}


def _assert_no_antipatterns(plan: str, name: str) -> None:
    import re

    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    assert "BroadcastNestedLoopJoin" not in plan, f"{name}: nested-loop join in plan"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF in plan"
    assert not re.search(r"Window \[[^\n]*?\], \[\], \[", plan), (
        f"{name}: global (unpartitioned) window in plan"
    )


def test_local_checkpoint_usage_is_pinned():
    """Closes the round-6 lint loophole: an eager localCheckpoint during
    plan construction truncates everything before it to an ExistingRDD
    scan, so the registry-wide lint below cannot see the hidden subplan.
    Any function that calls localCheckpoint must therefore be on this
    list, and each listed function must have a PRE-checkpoint plan
    asserted by a dedicated test (or a lazily-built twin entry that the
    registry-wide lint covers)."""
    import pathlib
    import re

    import database_extractor_spark as pkg

    allowed = {
        # lazy twin linted by test_triangle_count_prechk_plan
        ("registry/tpch_ops.py", "_triangle_count_plan"),
        # lazy twin linted by test_pagerank_prechk_plan
        ("registry/cdc_ops.py", "_pagerank_plan"),
        # pair subplans have lazily-linted twins: dedup_ngram_jaccard /
        # embedding_near_dup are the same candidate plans the clustered
        # entries feed in, and test_llm_ops lints the minhash candidate
        # join; the checkpointed interior is a bounded fixpoint loop
        ("operators/dedup.py", "connected_components"),
        # must compile inside its conf window; pre-checkpoint plan linted
        # by test_round9_ops.py::test_runtime_bloom_join_plan
        ("registry/text_graph_ops.py", "runtime_bloom_join"),
        # edge list materialized once before the hop joins; lazy twin
        # linted by test_khop_prechk_plan below
        ("registry/text_graph_ops.py", "_khop_plan"),
        # corpus fingerprint set materialized once before the stream
        # starts (VERDICT r10 item 7); lazy twin linted by
        # test_funnel_corpus_fp_prechk_plan below
        ("registry/streaming_bpe_ops.py", "_funnel_corpus_fp"),
        # spaced-symbol vocab aggregated once per bpe_train_merges call;
        # lazy twin linted by test_bpe_words_prechk_plan below
        ("registry/streaming_bpe_ops.py", "_bpe_words"),
        # (r17: streaming_minhash_dedup no longer checkpoints — its
        # corpus signatures come from the persisted artifact, a plain
        # columnar scan; the artifact BUILD plan is with_minhash's,
        # linted by test_streaming_minhash_corpus_prechk_plan)
        # r13 ADVICE cap: dropped sets past MATERIALIZE_COLLECT_CAP are
        # localCheckpoint'ed instead of driver-collected; the
        # pre-checkpoint candidate/verify plan is the SAME plan the
        # materialize=False twin exposes (test_incremental_minhash_lazy_plan
        # lints it) — the checkpoint only swaps the materialization of
        # its final projection
        ("operators/dedup.py", "incremental_minhash_dedup"),
        # r13: compiled inside the autoBroadcastJoinThreshold=-1 conf
        # window (the runtime_bloom_join discipline); the PRE-checkpoint
        # hinted plan is re-derived and BroadcastHashJoin-pinned by
        # test_round13_ops.test_sql_join_hints_forces_broadcast_without_stats
        ("registry/sharding_ops.py", "sql_join_hints"),
        # r16: the candidate dot-array table is checkpointed once before
        # the greedy loop; lazy twin linted by
        # test_facility_dots_prechk_plan below
        ("registry/stats_ops.py", "facility_location_coreset"),
    }
    root = pathlib.Path(pkg.__file__).parent
    found = set()
    for path in root.rglob("*.py"):
        src = path.read_text()
        defs = [(m.start(), m.group(1)) for m in re.finditer(r"^def (\w+)", src, re.M)]
        for m in re.finditer(r"\.localCheckpoint\(", src):
            name = None
            for start, dname in defs:
                if start < m.start():
                    name = dname
            found.add((str(path.relative_to(root)), name))
    assert found == allowed, (
        f"localCheckpoint usage changed: unexpected {found - allowed}, "
        f"missing {allowed - found} — every checkpoint-using function needs "
        f"a dedicated pre-checkpoint plan test and a row in this list"
    )


def test_triangle_count_prechk_plan(spark):
    """graph_triangle_count's FULL lazy plan (pair-generation self-join +
    degree orientation + triangle joins, no checkpoints) must be free of
    the scale anti-patterns — round 6 hid the self-join and a global
    row_number behind two checkpoints; round 7 removed the window
    (packed d*2^32+node orientation key) and this test keeps the whole
    shape honest."""
    from database_extractor_spark.registry import _triangle_count_plan

    df = _triangle_count_plan(spark, SF_DIR, materialize=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    _assert_no_antipatterns(plan, "graph_triangle_count[pre-checkpoint]")
    # the oriented wedge join must be equi-join based: at least the pair
    # self-join, two orientation joins, and two triangle joins
    import re

    n_joins = len(re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", plan))
    assert n_joins >= 5, f"expected >=5 hash/merge joins, saw {n_joins}"


def test_mmr_pool_plan(spark):
    """mmr_diversified_topk's distributed stage (quantized integer
    relevance scoring + top-50 pooling) must be a TakeOrderedAndProject
    over the full corpus with the 1-row query vector broadcast — no
    cartesian blowup, no global sort materialization."""
    from database_extractor_spark.registry import _mmr_pool_plan

    df = _mmr_pool_plan(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan, f"pool is not a distributed top-k:\n{plan}"
    # the only nested-loop shape allowed is the 1-row query-vector attach
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "BatchEvalPython" not in plan


def test_pagerank_prechk_plan(spark):
    """pagerank_event_graph's per-round join+aggregate, lazily unrolled
    for two rounds with no checkpoints, must be free of the scale
    anti-patterns (the lag window is user-partitioned, the rank updates
    are keyed equi-joins)."""
    from database_extractor_spark.registry import _pagerank_plan

    df = _pagerank_plan(spark, SF_DIR, materialize=False, iters=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    _assert_no_antipatterns(plan, "pagerank_event_graph[pre-checkpoint]")


def test_khop_prechk_plan(spark):
    """graph_khop_reachability's lazy twin (edge derivation + all three
    hop joins, no checkpoint) must be free of the scale anti-patterns."""
    from database_extractor_spark.registry import _khop_plan

    df = _khop_plan(spark, SF_DIR, materialize=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    _assert_no_antipatterns(plan, "graph_khop_reachability[pre-checkpoint]")


def test_bpe_words_prechk_plan(spark):
    """bpe_train_merges' vocab subplan (hidden behind the eager
    localCheckpoint): one documents scan -> token explode -> word
    aggregate -> spaced-symbol projection, no anti-patterns."""
    from database_extractor_spark.registry import _bpe_words

    df = _bpe_words(spark, SF_DIR, materialize=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    _assert_no_antipatterns(plan, "bpe_train_merges[vocab]")


def test_funnel_corpus_fp_prechk_plan(spark):
    """streaming_curation_funnel's corpus-fingerprint subplan (the part
    hidden behind the eager localCheckpoint) must itself be free of the
    scale anti-patterns: one documents scan -> fingerprint -> distinct."""
    from database_extractor_spark.registry import _funnel_corpus_fp

    df = _funnel_corpus_fp(spark, SF_DIR, materialize=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    _assert_no_antipatterns(plan, "streaming_curation_funnel[corpus-fp]")


def test_facility_dots_prechk_plan(spark):
    """facility_location_coreset's dot-array subplan (hidden behind the
    eager localCheckpoint) must itself be free of the scale
    anti-patterns: one embeddings scan -> literal-matrix transform — no
    join, no explode, no Python stage."""
    from database_extractor_spark.registry.stats_ops import (
        _facility_dots_plan,
    )

    cand_vecs = [[i * 7 + j for j in range(64)] for i in range(4)]
    df = _facility_dots_plan(spark, SF_DIR, cand_vecs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    _assert_no_antipatterns(plan, "facility_location_coreset[dots]")
    assert "Join" not in plan, "dot stage must be a pure projection"


def test_streaming_minhash_corpus_prechk_plan(spark):
    """The corpus-signature BUILD plan streaming_minhash_dedup depends on
    (r17: served from the persisted artifact, whose builder is exactly
    this with_minhash subplan) must itself be free of the scale
    anti-patterns: one documents scan -> shingle explode -> 64-lane min
    aggregate."""
    from pyspark.sql import functions as F

    from database_extractor_spark.operators import dedup as D

    df = D.with_minhash(
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") < 250)
        .select("doc_id", "text")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    _assert_no_antipatterns(plan, "streaming_minhash_dedup[corpus-sigs]")


def test_incremental_minhash_lazy_plan(spark):
    """dedup_incremental_minhash's candidate/verify plan (hidden behind
    the eager dropped-set materialization in the registry entry) must be
    free of the scale anti-patterns: band-bucket equi-joins and the
    agreeing-lane verify join only."""
    from database_extractor_spark.operators import dedup as D

    sigs = D.with_minhash(
        spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "text"
        )
    )
    df = D.incremental_minhash_dedup(
        sigs.filter("doc_id < 250"),
        sigs.filter("doc_id >= 250"),
        materialize=False,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    _assert_no_antipatterns(plan, "dedup_incremental_minhash[lazy]")


@pytest.mark.parametrize("name", sorted(E.queries().keys()))
def test_plan_has_no_scale_antipatterns(name, spark):
    if name in EXECUTES_ON_BUILD:
        pytest.skip("executes on build; plan covered by dedicated tests")
    df = E.queries()[name](spark, SF_DIR)
    # driver-comparability guard (VERDICT r15 item 1): the driver's
    # pandas canonicalizer crashes on ARRAY/MAP/STRUCT cells
    # (unhashable), so a complex output column means the entry can
    # NEVER earn a green CORRECTNESS row — the inverted_index_postings
    # r15 failure class. EXECUTES_ON_BUILD entries get the same check
    # from both sweep scripts (non_driver_comparable_cols), which run
    # every entry each round.
    from pyspark.sql import types as T

    complex_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not complex_cols, (
        f"{name}: output columns {complex_cols} are ARRAY/MAP/STRUCT — "
        "the driver comparator cannot hash them; encode as a delimited "
        "string or explode to scalar rows"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    if name in SCALAR_ATTACH_OK or name in SCALAR_ATTACH_OK_2:
        cap = 2 if name in SCALAR_ATTACH_OK_2 else 1
        n_bnlj = plan.count("BroadcastNestedLoopJoin")
        assert n_bnlj <= cap, (
            f"{name}: only {cap} scalar-attach nested-loop join(s) allowed"
        )
        # EVERY IdentityBroadcastMode exchange (the BNLJ build side) must
        # be the 1-row global-aggregate shape — count must match, so a
        # second broadcast of something multi-row cannot hide behind the
        # cap
        import re as _re

        builds = _re.findall(
            r"BroadcastExchange IdentityBroadcastMode[^\n]*\n[\s:]*\+- "
            r"(?:(?:Project|Filter)[ \[][^\n]*\n[\s:]*\+- ){0,8}"
            r"(?:Object)?HashAggregate\(keys=\[\]",
            plan,
        )
        assert len(builds) >= n_bnlj, (
            f"{name}: {n_bnlj} nested-loop joins but only {len(builds)} "
            f"1-row global-aggregate build sides — a multi-row broadcast "
            f"is hiding behind the scalar-attach cap:\n{plan}"
        )
        if "BroadcastNestedLoopJoin" in plan:
            # the whitelisted shape is O(n): the broadcast side must be a
            # single-row GLOBAL aggregate (IdentityBroadcastMode exchange
            # whose child is HashAggregate(keys=[])). A genuine multi-row
            # nested-loop regression would broadcast something else.
            import re as _re

            # Project/Filter nodes are row-preserving/-reducing, so any
            # chain of them over the 1-row aggregate keeps the build side
            # at <= 1 row; allow a deep chain (ccnet's staged integer-log
            # columns legitimately stack 4 non-collapsible Projects)
            assert _re.search(
                r"BroadcastExchange IdentityBroadcastMode[^\n]*\n[\s:]*\+- "
                r"(?:(?:Project|Filter)[ \[][^\n]*\n[\s:]*\+- ){0,8}"
                r"(?:Object)?HashAggregate\(keys=\[\]",
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
        for node in (
            "ArrowEvalPython",
            "FlatMapGroupsInPandas",
            "FlatMapCoGroupsInPandas",
            "MapInPandas",
            "MapInArrow",
        ):
            assert node not in plan, f"{name}: unexpected Python stage {node} in plan"


def test_no_entry_frame_composition():
    """Composition lint (VERDICT r16 item 4): an entry body must never
    invoke another entry's callable (plan composition) — the r16 kappa
    incident showed a frame composition silently re-pays every
    component's heavy stages (two token explodes + a join, 130.7 s at
    sf10 for a one-scan-able statistic). Definitions may be shared, and
    ONLY through named ``_helper`` frames (quality_rater_decisions,
    _dedup_clusters_frame, _gopher_gate_frame, ...) that are visible,
    greppable cost-sharing points. Walks every registry entry's source
    AST and fails on (a) a call whose target name is another entry's
    function, or (b) any ``QUERIES[...]`` subscript call."""
    import ast
    import inspect
    import textwrap

    from database_extractor_spark.registry import QUERIES

    entry_fn_names = {fn.__name__ for fn in QUERIES.values()}
    violations = []
    for name, fn in QUERIES.items():
        src = textwrap.dedent(inspect.getsource(fn))
        tree = ast.parse(src)
        for node in ast.walk(tree):
            if not isinstance(node, ast.Call):
                continue
            f = node.func
            called = None
            if isinstance(f, ast.Name):
                called = f.id
            elif isinstance(f, ast.Attribute):
                called = f.attr
            elif (
                isinstance(f, ast.Subscript)
                and isinstance(f.value, ast.Name)
                and f.value.id == "QUERIES"
            ):
                violations.append((name, "QUERIES[...](...)"))
                continue
            if (
                called in entry_fn_names
                and called != fn.__name__
            ):
                violations.append((name, called))
    assert not violations, (
        "entries composing other entries' frames (use a shared _helper "
        f"instead): {violations}"
    )
