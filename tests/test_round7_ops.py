"""Round-7 additions: ADVICE r6 fixes (zscore quantization headroom,
merge-upsert startup recovery, ntile null ordering), the md5-lane
MinHash/SimHash oracle graduation, and the fixed-quantizer ANN companions.
"""

import datetime
import os
import shutil

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_zscore_quantization_headroom(spark):
    """ADVICE r6: the rolling z-score sums qv*qv over a 50-row window as
    int64. At the round-7 quantization (1e3) the worst-case window sum on
    the actual fixture must keep two orders of magnitude of headroom under
    int64 max, so regenerated fixtures with ~10x larger values cannot
    silently wrap in Spark while DuckDB promotes to HUGEINT."""
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    max_qv = (
        ev.select(F.max(F.abs(F.floor(F.col("value") * 1000.0))).alias("m"))
        .first()["m"]
    )
    worst_window_sum = 50 * max_qv * max_qv
    assert worst_window_sum < (1 << 63) // 100, (
        f"zscore squared-sum headroom eroded: worst window sum "
        f"{worst_window_sum:.3g} is within 100x of int64 max — requantize"
    )


def test_merge_upsert_recovers_parked_snapshot_without_new_batch(spark, tmp_path):
    """ADVICE r6: recovery must run at STARTUP, not only inside
    apply_batch — a restart against the same checkpoint with no new input
    invokes no batch at all, so a snapshot parked by a mid-swap crash
    would otherwise never be restored and the final read would fail."""
    from database_extractor_spark.streaming import streaming_merge_upsert

    src = os.path.join(SF_DIR, "events.parquet")
    out_dir = str(tmp_path / "upsert")
    expected = (
        streaming_merge_upsert(spark, src, out_dir=out_dir)
        .orderBy("user_id")
        .collect()
    )
    snap = os.path.join(out_dir, "snapshot")
    # Crash simulation at the worst point: live snapshot parked aside,
    # tmp never promoted. SAME out_dir -> checkpoint already has the
    # whole input committed -> the restarted query runs zero batches.
    os.rename(snap, f"{snap}_old")
    got = (
        streaming_merge_upsert(spark, src, out_dir=out_dir)
        .orderBy("user_id")
        .collect()
    )
    assert got == expected
    assert os.path.exists(snap) and not os.path.exists(f"{snap}_old")


def test_ntile_percentiles_rank_nulls_last(spark, tmp_path):
    """ADVICE r6: Spark defaults ASC window order to NULLS FIRST, DuckDB
    to NULLS LAST. The entry pins NULLS LAST on both sides; feed it a
    fixture WITH null values and assert nulls take the top ranks."""
    from database_extractor_spark.registry import QUERIES

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(seconds=i), 1, "click",
         None if i >= 8 else float(i), "{}")
        for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r["event_id"]: r
        for r in QUERIES["window_ntile_percentiles"](spark, str(tmp_path)).collect()
    }
    # the two null-value rows (ids 8, 9) must rank LAST: top quartile,
    # the largest percent_rank / cume_dist values
    assert out[8]["quartile"] == 4 and out[9]["quartile"] == 4
    assert out[9]["pct_rank"] == 1.0
    assert out[8]["pct_rank"] > out[7]["pct_rank"]


def test_minhash_lane_family_is_portable_and_seeded():
    """The md5-lane MinHash family must be reproducible across driver
    restarts (seeded constants — the oracle bakes them as literals) and
    stay inside the no-overflow envelope a*x + b < 2^62."""
    from database_extractor_spark.operators.dedup import (
        MINHASH_PRIME,
        minhash_lane_params,
    )

    p1 = minhash_lane_params(64)
    p2 = minhash_lane_params(64)
    assert p1 == p2 and len(p1) == 64
    assert all(1 <= a < MINHASH_PRIME and 0 <= b < MINHASH_PRIME for a, b in p1)
    worst = (MINHASH_PRIME - 1) * (MINHASH_PRIME - 1) + (MINHASH_PRIME - 1)
    assert worst < 1 << 62


def test_simhash_is_60_bit_nonnegative(spark):
    from database_extractor_spark.operators.dedup import SIMHASH_BITS, simhash_table

    assert SIMHASH_BITS == 60
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    vals = [r["sh"] for r in simhash_table(docs.limit(20)).collect()]
    assert vals and all(0 <= v < (1 << 60) for v in vals)


def test_ivf_fixed_assignment_matches_relational_argmax(spark):
    """The in-plan literal-seed assignment (argmax cosine, min seed id on
    ties) must equal the relational formulation the oracle uses."""
    from database_extractor_spark.registry import _fixture_seed_vecs
    from database_extractor_spark.operators.similarity import cosine, ivf_fixed_topk

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    seeds = _fixture_seed_vecs(SF_DIR)
    # relational: explode the 16 seeds per vector, rank by (cos desc, sid)
    seed_df = spark.createDataFrame(
        [(sid, vec) for sid, vec in seeds], "sid int, sv array<double>"
    )
    from pyspark.sql import Window

    fan = emb.select("vec_id", "embedding").crossJoin(F.broadcast(seed_df))
    ranked = fan.withColumn(
        "c", cosine(F.col("embedding"), F.col("sv"))
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("vec_id").orderBy(F.desc("c"), F.asc("sid"))
        ),
    ).filter("rn = 1").select("vec_id", F.col("sid").alias("want"))

    structs = [
        F.struct(
            (-cosine(F.col("embedding"), F.array(*[F.lit(v) for v in vec]))).alias("nc"),
            F.lit(sid).alias("sid"),
        )
        for sid, vec in seeds
    ]
    got = emb.select(
        "vec_id", F.array_min(F.array(*structs))["sid"].alias("got")
    )
    joined = got.join(ranked, "vec_id")
    assert joined.filter("got <> want").count() == 0

    # and the entry returns k well-formed rows
    q = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    top = ivf_fixed_topk(emb, seeds, q, k=10, nprobe=4, exclude_ids=[0]).collect()
    assert len(top) == 10 and all(r["vec_id"] != 0 for r in top)


def test_pq_fixed_rerank_beats_adc_only_recall(spark):
    """The exact re-rank stage must not lose ground vs the raw ADC
    ordering: the re-ranked top-10 of sim_pq_fixed should overlap the
    true exact-L2 top-10 at least as well as a no-rerank shortlist cut."""
    from database_extractor_spark.registry import _fixture_seed_vecs
    from database_extractor_spark.operators.similarity import pq_fixed_topk

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    seeds = _fixture_seed_vecs(SF_DIR)
    q = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]

    # exact L2 top-10 (numpy baseline)
    import numpy as np

    rows = emb.filter("vec_id <> 0").collect()
    qv = np.array(q)
    exact = sorted(
        ((float(((np.array(r["embedding"], dtype=np.float64) - qv) ** 2).sum()), r["vec_id"])
         for r in rows)
    )[:10]
    exact_ids = {vid for _, vid in exact}

    got = pq_fixed_topk(emb, seeds, q, k=10, rerank=100, exclude_ids=[0]).collect()
    got_ids = {r["vec_id"] for r in got}
    # two-stage PQ with a 100-wide shortlist on a 500-vector corpus
    # should recover most of the true top-10
    assert len(got_ids & exact_ids) >= 6


# ---------------------------------------------------------------------------
# Round-7 TPC-H batch: plan-shape pins for the optimizer properties each
# query exists to exercise (correctness itself is the oracle compare in
# test_entry_contract.py).
# ---------------------------------------------------------------------------

def _plan(spark, name):
    import __spark_entry__ as E

    return E.queries()[name](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()


def test_q19_disjunction_factors_into_both_scans(spark):
    """Q19's whole point: Catalyst must factor the per-side implications
    out of the 3-way OR — quantity bands push to the lineitem scan,
    size/brand bands to the part scan — and the join must stay a hash
    equi-join with the disjunction as a post-condition."""
    plan = _plan(spark, "tpch_q19_disjunctive_revenue")
    import re

    li_scan = re.search(r"FileScan parquet [^\n]*lineitem[^\n]*", plan).group(0)
    part_scan = re.search(r"FileScan parquet [^\n]*part\.parquet[^\n]*", plan).group(0)
    assert "l_quantity" in li_scan and "PushedFilters: [IsNotNull(l_partkey), Or(" in li_scan
    assert "p_size" in part_scan
    assert "BroadcastHashJoin" in plan and "BroadcastNestedLoopJoin" not in plan


def test_q17_subquery_decorrelates_to_aggregate_join(spark):
    """The correlated avg subquery must decorrelate into a per-partkey
    aggregate joined back on the key — never a per-row re-execution
    (which would surface as a nested-loop join)."""
    plan = _plan(spark, "tpch_q17_small_quantity_revenue")
    assert "partial_avg(l_quantity" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_q17_avg_threshold_is_engine_exact(spark):
    """The 0.2*avg comparison only hashes cross-engine because
    l_quantity is integral-valued: avg = exact-int sum / count is the
    same IEEE double everywhere. Pin the fixture property the proof
    rests on, so a regenerated fixture with fractional quantities fails
    HERE instead of as a driver hash mismatch."""
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    n_frac = li.filter(F.col("l_quantity") != F.floor("l_quantity")).count()
    assert n_frac == 0, "l_quantity no longer integral: Q17 avg exactness proof void"


def test_q15_max_equality_is_on_quantized_bigint(spark):
    """Tie-safe top supplier: the max-revenue equality must compare
    bigint cents (exact), not floating revenue (the cross-engine hash
    trap the docstring calls out)."""
    plan = _plan(spark, "tpch_q15_top_supplier")
    assert "total_cents" in plan
    # the scalar max arrives as a subquery result, compared on the long
    import re

    assert re.search(r"total_cents#\d+L", plan), "max-equality column is not a bigint"


def test_recursive_spine_is_bounded_and_broadcast(spark):
    """WITH RECURSIVE plans as UnionLoop; the 31-row spine must sit on
    the BROADCAST side of the outer join (the events aggregate is the
    big side at scale), and the recursion is calendar-bounded."""
    plan = _plan(spark, "sql_recursive_spine")
    assert "UnionLoop" in plan
    import __spark_entry__ as E

    rows = E.queries()["sql_recursive_spine"](spark, SF_DIR).collect()
    assert len(rows) == 31
    assert all(r["n_events"] >= 0 for r in rows)


def test_q22_not_exists_is_non_vacuous(spark):
    """The fixture assigns orders to every customer, which made the
    canonical Q22 'no orders' anti join match ZERO rows (a vacuous
    always-green oracle). The adapted predicate must keep the result
    non-empty at every SF so the driver hash actually constrains it."""
    import __spark_entry__ as E

    df = E.queries()["tpch_q22_global_sales_opportunity"](spark, SF_DIR)
    assert df.count() > 0


def test_q8_q20_q21_are_non_vacuous(spark):
    """Q8's region filter and Q20's dominance threshold were initially
    vacuous on the fixture (REGION_0 doesn't exist; no supplier holds
    50% of a part's volume once parts have many suppliers). Guard all
    three round-7 subquery entries against silently matching nothing —
    a 0-row oracle compare is always-green."""
    import __spark_entry__ as E

    # count at sf0.01 — the DRIVER's oracle-compare SF, where vacuity
    # would actually blind the gate (sf0.001 is legitimately sparse for
    # Q20/Q21's selective predicates)
    driver_sf = "/root/testdata/sf0.01"
    for name in (
        "tpch_q8_market_share",
        "tpch_q20_excess_stock",
        "tpch_q21_waiting_suppliers",
    ):
        assert E.queries()[name](spark, driver_sf).count() > 0, f"{name} is vacuous"


def test_dpp_plan_prunes_at_runtime(spark):
    """dpp_partition_pruned_join must actually engage dynamic partition
    pruning: the fact scan's PartitionFilters must carry a
    dynamicpruning subquery on l_year (a static filter cannot exist —
    the qualifying years are data-driven), and the dim must broadcast."""
    import __spark_entry__ as E

    df = E.queries()["dpp_partition_pruned_join"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), f"no DPP in plan:\n{plan[:2000]}"
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_jsonl_sink_abort_leaves_no_visible_output(spark, tmp_path):
    """The custom writer's two-phase commit: a task failure mid-job must
    leave NO visible part- files (staged files are either promoted by
    commit or removed by abort). Simulate by writing a frame whose last
    partition throws inside the Python worker."""
    from database_extractor_spark.sources.custom import register_jsonl_sink

    register_jsonl_sink(spark)
    out = str(tmp_path / "sink")
    df = spark.range(100).selectExpr(
        "id as event_id",
        "case when id = 99 then assert_true(false) else 'x' end as event_type",
        "cast(id as double) as value",
    )
    with pytest.raises(Exception):
        df.write.format("jsonl_sink").option("path", out).mode("append").save()
    import glob

    assert glob.glob(os.path.join(out, "part-*.jsonl")) == [], (
        "failed job left committed part files visible"
    )


def test_mmr_selection_is_more_diverse_than_plain_topk(spark):
    """MMR's entire point: the selected set's internal similarity must be
    LOWER than plain relevance top-10's. Compare max pairwise dot within
    each set (quantized ints, same measure the operator optimizes)."""
    import numpy as np

    from database_extractor_spark.registry import _mmr_pool_plan, QUERIES

    pool = {int(r["vec_id"]): np.asarray(r["e"], dtype=np.int64)
            for r in _mmr_pool_plan(spark, SF_DIR, pool=50).collect()}
    mmr_ids = [int(r["vec_id"]) for r in
               QUERIES["mmr_diversified_topk"](spark, SF_DIR).collect()]
    top10 = [int(r["vec_id"]) for r in
             _mmr_pool_plan(spark, SF_DIR, pool=10).collect()]

    def max_pair_sim(ids):
        return max(
            int(pool[a] @ pool[b]) for i, a in enumerate(ids) for b in ids[i + 1:]
        )

    assert max_pair_sim(mmr_ids) <= max_pair_sim(top10), (
        "MMR selection is no more diverse than plain top-k"
    )


def test_dsir_sample_is_biased_toward_high_importance(spark):
    """The Gumbel-top-k property DSIR rests on: the selected sample's
    mean log-importance must exceed the population mean (sampling
    proportional-ish to weights is biased toward high weights even when
    the fixture's cross-language vocabulary overlap keeps the absolute
    signal small). Also: en docs within the sample must score higher on
    average than non-en docs (the target distribution is lang='en')."""
    from database_extractor_spark.registry import _dsir_scored, QUERIES

    pop = [r["score"] for r in _dsir_scored(spark, SF_DIR).collect()]
    rows = QUERIES["dsir_importance_resample"](spark, SF_DIR).collect()
    sel = [r["score"] for r in rows]
    assert len(sel) < len(pop), "selection did not subsample"
    assert sum(sel) / len(sel) > sum(pop) / len(pop), (
        "selected sample is not biased toward high importance weights"
    )
    en = [r["score"] for r in rows if r["lang"] == "en"]
    other = [r["score"] for r in rows if r["lang"] != "en"]
    assert en, "no en docs selected"
    if other:
        assert sum(en) / len(en) > sum(other) / len(other)


def test_simhash_rejects_widths_beyond_base_hash():
    """Round-7 code-review finding: the portability rewrite narrowed the
    simhash base hash to 60 bits; bits=64 (the historical default) would
    overflow a JVM long and 61-63 would vote on always-zero bits. Both
    functions must REJECT out-of-range widths instead of silently
    corrupting."""
    from pyspark.sql import functions as F

    from database_extractor_spark.operators.dedup import simhash, simhash_table

    for bad in (0, 61, 64):
        with pytest.raises(ValueError):
            simhash(F.col("text"), bits=bad)


def test_documents_text_has_no_nulls_at_oracle_sfs():
    """The minhash/simhash oracles mirror the engine's NULL-text
    coalesce, but most text oracles (tokenize -> unnest) and engine
    paths (explode) DROP null-text docs in lockstep instead. That
    lockstep is only proven for non-null fixtures — pin the assumption
    (the q17 integral-quantity pattern) so a regenerated fixture with
    NULL text fails HERE, not as a driver hash mismatch."""
    import duckdb

    con = duckdb.connect()
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        n = con.execute(
            f"select count(*) from read_parquet('{sf}/documents.parquet') "
            "where text is null"
        ).fetchone()[0]
        assert n == 0, f"{sf}: {n} NULL-text docs — audit text-oracle NULL paths"


# ---------------------------------------------------------------------------
# Randomized equivalence for the round-7 decorrelation rewrites: the fixture
# oracles prove them on real data; these prove them on adversarial TIE-heavy
# inputs (duplicate prices/sizes, shared max shipdates) where rewrite bugs
# actually live. Few examples, tiny inputs — each example runs a Spark job.
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(1, 4)),  # (price_code, size)
        min_size=1, max_size=12,
    )
)
def test_skyline_rewrite_equals_bruteforce_under_ties(spark, rows):
    """skyline_pareto_frontier's prefix-max rewrite vs the O(n^2)
    dominance definition, on inputs dense with equal prices AND equal
    sizes (the tie cases the 4-row fixture frontier barely exercises)."""
    spark = spark
    data = [(i, 900.0 + pc, sz) for i, (pc, sz) in enumerate(rows)]

    def dominated(a):
        return any(
            b[1] <= a[1] and b[2] >= a[2] and (b[1] < a[1] or b[2] > a[2])
            for b in data if b[0] != a[0]
        )

    want = sorted(r[0] for r in data if not dominated(r))

    import tempfile

    from database_extractor_spark.registry import QUERIES

    d = tempfile.mkdtemp(prefix="sky_prop_")
    spark.createDataFrame(
        data, "p_partkey long, p_retailprice double, p_size int"
    ).write.mode("overwrite").parquet(os.path.join(d, "part.parquet"))
    got = sorted(
        r["p_partkey"] for r in QUERIES["skyline_pareto_frontier"](spark, d).collect()
    )
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        # (orderkey, suppkey, shipday) — tiny domains force shared maxima
        st.tuples(st.integers(0, 2), st.integers(0, 2), st.integers(0, 3)),
        min_size=1, max_size=14,
    )
)
def test_q21_max_other_trick_equals_nested_exists(spark, lines):
    """Q21's top-2 max_other derivation vs the canonical double-EXISTS
    semantics, brute-forced in Python: a line counts iff another supplier
    exists in the order AND none shipped strictly later."""
    spark = spark
    import datetime as _dt

    base = _dt.datetime(1996, 1, 1)
    data = [
        (ok, sk, base + _dt.timedelta(days=d), i)
        for i, (ok, sk, d) in enumerate(lines)
    ]

    def qualifies(row):
        ok, sk, ship, _ = row
        others = [r for r in data if r[0] == ok and r[1] != sk]
        return bool(others) and all(r[2] <= ship for r in others)

    want = sorted(r[3] for r in data if qualifies(r))

    from pyspark.sql import functions as F

    li = spark.createDataFrame(
        data, "l_orderkey long, l_suppkey long, l_shipdate timestamp, line_id long"
    )
    # replicate the entry's max_other derivation (registry
    # tpch_q21_waiting_suppliers) on the raw frame
    ms = li.groupBy("l_orderkey", "l_suppkey").agg(F.max("l_shipdate").alias("ms"))
    per_order = ms.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"), F.max("ms").alias("m1")
    )
    tops = (
        ms.join(per_order, "l_orderkey")
        .groupBy("l_orderkey", "n_supp", "m1")
        .agg(
            F.sum(F.when(F.col("ms") == F.col("m1"), 1).otherwise(0)).alias("cnt1"),
            F.max(F.when(F.col("ms") < F.col("m1"), F.col("ms"))).alias("m2"),
        )
    )
    max_other = ms.join(tops, "l_orderkey").select(
        "l_orderkey", "l_suppkey", "n_supp",
        F.when((F.col("ms") == F.col("m1")) & (F.col("cnt1") == 1), F.col("m2"))
        .otherwise(F.col("m1")).alias("max_other"),
    )
    got = sorted(
        r["line_id"]
        for r in li.join(max_other, ["l_orderkey", "l_suppkey"])
        .filter((F.col("n_supp") > 1) & (F.col("l_shipdate") >= F.col("max_other")))
        .collect()
    )
    assert got == want
