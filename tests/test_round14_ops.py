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


def test_hybrid_rank_fusion_semantics(spark):
    """RRF invariants: the fused score of every returned doc equals
    sum(1/(60+rank)) recomputed from the two lanes' independent
    rankings; docs found by BOTH lanes carry n_lanes=2; the plan uses a
    lane-partitioned window (never global) and TakeOrdered limits."""
    import re

    from database_extractor_spark.registry import (
        QUERIES,
        _fixture_query_vec,
        _tbl,
        text_bm25,
    )
    from database_extractor_spark.operators import similarity as S
    from pyspark.sql import functions as F

    out = QUERIES["hybrid_rank_fusion"](spark, SF_DIR).collect()
    assert len(out) == 10
    # recompute lane ranks driver-side
    bm = sorted(
        [(r["doc_id"], r["bm25"]) for r in text_bm25(spark, SF_DIR).collect()],
        key=lambda t: (-t[1], t[0]),
    )[:50]
    q, _ = _fixture_query_vec(SF_DIR)
    vs = S.brute_force_topk(
        _tbl(spark, SF_DIR, "embeddings"), q, k=50, exclude_ids=[0]
    ).collect()
    rank = {}
    for i, (d, _s) in enumerate(bm):
        rank.setdefault(d, []).append(i + 1)
    for i, r in enumerate(vs):
        rank.setdefault(r["vec_id"], []).append(i + 1)
    for r in out:
        expect = round(sum(1.0 / (60.0 + rr) for rr in rank[r["doc_id"]]), 6)
        assert abs(r["rrf"] - expect) < 1e-9, (r, expect)
        assert r["n_lanes"] == len(rank[r["doc_id"]])
    plan = (
        QUERIES["hybrid_rank_fusion"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert not re.search(r"Window \[[^\n]*?\], \[\], \[", plan), plan
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_incremental_agg_maintenance_never_rescans_history(spark):
    """The IVM proof: in the merged plan, the EVENTS parquet scan must
    carry the delta day's bounds as pushed data filters (history lives
    only in the snapshot partials file), and merge(partials) must equal
    the full recompute exactly."""
    from pyspark.sql import functions as F

    from database_extractor_spark.registry import QUERIES, _tbl

    df = QUERIES["incremental_agg_maintenance"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    ev_scans = [
        ln
        for ln in plan.splitlines()
        if "FileScan parquet" in ln and "events" in ln
    ]
    assert len(ev_scans) == 1, plan  # ONE events scan: the delta only
    assert "2024-01-25" in ev_scans[0] and "2024-01-26" in ev_scans[0], (
        ev_scans[0]
    )
    got = {r["event_type"]: (r["n_events"], r["sum_val"]) for r in df.collect()}
    truth = {
        r["event_type"]: (r["n"], r["s"])
        for r in _tbl(spark, SF_DIR, "events")
        .filter(F.col("ts") < F.lit("2024-01-26").cast("timestamp"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("s"),
        )
        .collect()
    }
    assert got == truth


def test_inverted_index_postings_invariants(spark):
    """Postings invariants: positions strictly increasing and 0-based,
    tf == len(positions), every surviving term's df within [2, 50], and
    the hot/hapax terms are really gone. Positions arrive as the
    ','-joined string encoding (the driver comparator cannot hash ARRAY
    cells — r15's one red row)."""
    from collections import Counter

    from database_extractor_spark.registry import QUERIES

    rows = QUERIES["inverted_index_postings"](spark, SF_DIR).collect()
    assert rows, "fixture should yield some postings"
    df_count = Counter(r["term"] for r in rows)
    for r in rows:
        assert isinstance(r["positions"], str)
        ps = [int(p) for p in r["positions"].split(",")]
        assert r["tf"] == len(ps)
        assert all(ps[i] < ps[i + 1] for i in range(len(ps) - 1))
        assert ps[0] >= 0
        assert 2 <= df_count[r["term"]] <= 50


def test_corpus_snapshot_diff_is_exact_change_feed(spark):
    """The diff must be exactly the change feed the synthesized
    evolution implies: removed = docs with id%7==3, changed = kept docs
    with id%11==5 (and not removed), added = re-keyed id%13==8 docs —
    and NO unchanged rows leak through."""
    from pyspark.sql import functions as F

    from database_extractor_spark.registry import QUERIES, _tbl

    rows = QUERIES["corpus_snapshot_diff"](spark, SF_DIR).collect()
    got = {(r["doc_id"], r["status"]) for r in rows}
    ids = [
        r["doc_id"]
        for r in _tbl(spark, SF_DIR, "documents").select("doc_id").collect()
    ]
    expect = set()
    for i in ids:
        if i % 7 == 3:
            expect.add((i, "removed"))
        elif i % 11 == 5:
            expect.add((i, "changed"))
        if i % 13 == 8:
            expect.add((i + 1000000, "added"))
    assert got == expect and len(got) > 0


def test_sql_unpivot_clause_matches_dataframe_melt(spark):
    """The SQL UNPIVOT clause must produce the same rows as the
    DataFrame unpivot API over the same wide frame — one lowering, two
    faces."""
    from pyspark.sql import functions as F

    from database_extractor_spark.registry import QUERIES, _tbl

    sql_rows = sorted(
        (r["o_orderpriority"], r["status"], r["n"])
        for r in QUERIES["sql_unpivot_clause"](spark, SF_DIR).collect()
    )
    wide = (
        _tbl(spark, SF_DIR, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.when(F.col("o_orderstatus") == "F", 1))
            .cast("bigint")
            .alias("n_f"),
            F.count(F.when(F.col("o_orderstatus") == "O", 1))
            .cast("bigint")
            .alias("n_o"),
            F.count(F.when(F.col("o_orderstatus") == "P", 1))
            .cast("bigint")
            .alias("n_p"),
        )
    )
    api_rows = sorted(
        (r["o_orderpriority"], r["status"], r["n"])
        for r in wide.unpivot(
            "o_orderpriority", ["n_f", "n_o", "n_p"], "status", "n"
        ).collect()
    )
    assert sql_rows == api_rows and len(sql_rows) == 15


def test_k_anonymity_audit_flags_small_classes(spark):
    """Every class's flag must equal (n >= 5), and class sizes must sum
    to the table size (no rows lost to the audit)."""
    from database_extractor_spark.registry import QUERIES, _tbl

    rows = QUERIES["k_anonymity_audit"](spark, SF_DIR).collect()
    assert sum(r["n"] for r in rows) == _tbl(
        spark, SF_DIR, "customer"
    ).count()
    for r in rows:
        assert r["meets_k"] == (r["n"] >= 5)


def test_hll_intersection_exact_regime_and_pruning(spark):
    """In the exact regime the inclusion-exclusion estimate must equal
    the true two-day user intersection, and the two-day bound must be
    pushed to the events scan (partition-prunable at scale)."""
    from pyspark.sql import functions as F

    from database_extractor_spark.registry import QUERIES, _tbl

    df = QUERIES["hll_intersection_estimate"](spark, SF_DIR)
    row = df.collect()[0]
    ev = _tbl(spark, SF_DIR, "events")
    day = F.to_date("ts")
    a = {
        r[0]
        for r in ev.filter(day == F.lit("2024-01-05"))
        .select("user_id")
        .distinct()
        .collect()
    }
    b = {
        r[0]
        for r in ev.filter(day == F.lit("2024-01-06"))
        .select("user_id")
        .distinct()
        .collect()
    }
    assert row["est_a"] == len(a) and row["est_b"] == len(b)
    assert row["est_union"] == len(a | b)
    assert row["est_intersection"] == len(a & b)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = [
        ln
        for ln in plan.splitlines()
        if "FileScan parquet" in ln and "events" in ln
    ]
    # AQE may print the scan twice (initial + final plan); every
    # occurrence must carry the pushed two-day bounds
    assert scan and all("2024-01-0" in ln for ln in scan), scan


def test_join_skew_diagnostic_consistency(spark):
    """The diagnostic must reconcile with the raw table: n_rows equals
    the fact row count, max_fanout equals the true hottest key, and the
    ppm ratio equals max*1e6*keys // rows exactly."""
    from pyspark.sql import functions as F

    from database_extractor_spark.registry import QUERIES, _tbl

    r = QUERIES["join_skew_diagnostic"](spark, SF_DIR).collect()[0]
    li = _tbl(spark, SF_DIR, "lineitem")
    assert r["n_rows"] == li.count()
    true_max = (
        li.groupBy("l_orderkey")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert r["max_fanout"] == true_max
    assert (
        r["skew_ratio_ppm"]
        == r["max_fanout"] * 1000000 * r["n_keys"] // r["n_rows"]
    )


def test_mutual_nearest_neighbors_reciprocity(spark):
    """Every returned pair must be reciprocal: b is a's top-1 AND a is
    b's top-1 within the label bucket (recomputed driver-side), and no
    a_id or b_id appears twice (top-1 sets are functions)."""
    from collections import defaultdict

    from database_extractor_spark.registry import QUERIES, _tbl

    rows = QUERIES["mutual_nearest_neighbors"](spark, SF_DIR).collect()
    assert rows
    a_ids = [r["a_id"] for r in rows]
    b_ids = [r["b_id"] for r in rows]
    assert len(a_ids) == len(set(a_ids)) and len(b_ids) == len(set(b_ids))
    # recompute the truth in python
    import math

    vecs = {
        r["vec_id"]: (r["label"], [float(x) for x in r["embedding"]])
        for r in _tbl(spark, SF_DIR, "embeddings").collect()
    }

    def cos(u, v):
        d = sum(x * y for x, y in zip(u, v))
        nu = math.sqrt(sum(x * x for x in u))
        nv = math.sqrt(sum(x * x for x in v))
        return 0.0 if nu * nv == 0 else d / (nu * nv)

    by_label = defaultdict(lambda: ([], []))
    for vid, (lab, v) in vecs.items():
        by_label[lab][vid % 2].append((vid, v))
    expected = set()
    for lab, (evens, odds) in by_label.items():
        for aid, av in evens:
            if not odds:
                continue
            nb = min(odds, key=lambda t: (-round(cos(av, t[1]), 6), t[0]))
            na = min(evens, key=lambda t: (-round(cos(t[1], nb[1]), 6), t[0]))
            if na[0] == aid:
                expected.add((aid, nb[0]))
    assert {(r["a_id"], r["b_id"]) for r in rows} == expected


def test_event_debounce_counts_reconcile(spark):
    """kept + debounced must equal total per type, totals must cover
    the whole table, and at least one event must actually debounce at
    the 1-day window (the fixture has same-day repeats)."""
    from database_extractor_spark.registry import QUERIES, _tbl

    rows = QUERIES["event_debounce"](spark, SF_DIR).collect()
    for r in rows:
        assert r["n_kept"] + r["n_debounced"] == r["n_total"]
    assert sum(r["n_total"] for r in rows) == _tbl(
        spark, SF_DIR, "events"
    ).count()
    assert sum(r["n_debounced"] for r in rows) > 0


def test_backfill_todo_ledger_statuses(spark):
    """The ledger must classify every input day exactly once: days past
    the processing cutoff are 'todo', processed days whose snapshot
    missed late rows are 'stale', the rest 'done' — with counts
    reconciling against the raw table."""
    from pyspark.sql import functions as F

    from database_extractor_spark.registry import QUERIES, _tbl

    rows = QUERIES["backfill_todo_ledger"](spark, SF_DIR).collect()
    n_days = (
        _tbl(spark, SF_DIR, "events")
        .select(F.to_date("ts").alias("d"))
        .distinct()
        .count()
    )
    assert len(rows) == n_days
    by_status = {}
    for r in rows:
        by_status.setdefault(r["status"], []).append(r)
        if r["status"] == "todo":
            assert r["n_output"] is None and str(r["day"]) > "2024-01-20"
        elif r["status"] == "stale":
            assert r["n_output"] < r["n_input"]
            assert "2024-01-16" <= str(r["day"]) <= "2024-01-20"
        else:
            assert r["n_output"] == r["n_input"]
    assert set(by_status) == {"todo", "stale", "done"}


def test_operator_catalog_is_fresh():
    """docs/OPERATORS.md is generated; its headline count must track the
    registry so the catalog cannot silently go stale."""
    import re

    from database_extractor_spark.registry import QUERIES

    doc = open("/root/repo/docs/OPERATORS.md").read()
    m = re.search(r"(\d+) named queries, (\d+) with independent", doc)
    assert m, "catalog headline missing"
    assert int(m.group(1)) == len(QUERIES), (
        "docs/OPERATORS.md is stale — rerun scripts/gen_catalog.py"
    )


def test_content_defined_chunks_shift_invariance(spark):
    """CDC's defining property: prepending one character to a document
    re-keys only the chunks up to the first re-synchronized boundary —
    the TAIL chunk hashes are unchanged, where fixed-grid chunking
    would re-key everything. Verified via the registry helper plan on
    an original vs shifted two-row frame."""
    from pyspark.sql import functions as F

    from database_extractor_spark.registry import _CDC_HASH

    text = (
        "the quick brown fox jumps over the lazy dog while the engine "
        "chunks content by rolling hash boundaries again and again and "
        "the quick brown fox jumps over the lazy dog while the engine "
        "chunks content by rolling hash boundaries once more for luck"
    )
    df = spark.createDataFrame(
        [(1, text), (2, "X" + text)], "doc_id long, text string"
    )
    bnds = F.expr(
        "case when length(text) >= 8 then"
        f" filter(sequence(8, length(text)), i -> {_CDC_HASH})"
        " else cast(array() as array<int>) end"
    )
    subs = F.expr(
        "filter(transform(sequence(1, size(bnds) + 1), k ->"
        " substring(text,"
        "   case when k = 1 then 1 else element_at(bnds, k - 1) + 1 end,"
        "   (case when k = size(bnds) + 1 then length(text)"
        "         else element_at(bnds, k) end)"
        "   - (case when k = 1 then 1"
        "           else element_at(bnds, k - 1) + 1 end) + 1)),"
        " s -> length(s) > 0)"
    )
    rows = {
        r["doc_id"]: r["chunks"]
        for r in df.select("doc_id", "text", bnds.alias("bnds"))
        .select("doc_id", subs.alias("chunks"))
        .collect()
    }
    orig, shifted = rows[1], rows[2]
    assert len(orig) >= 3, "fixture text must produce several chunks"
    # after the first boundary past the edit, the streams re-synchronize:
    # every original chunk except possibly the first must reappear
    assert set(orig[1:]).issubset(set(shifted))
    # and the shifted doc's FIRST chunk differs (it absorbed the edit)
    assert shifted[0] != orig[0]


def test_user_activity_streaks_matches_brute(spark):
    """Gaps-and-islands streaks must match a brute-force Python scan of
    each user's sorted distinct active days."""
    import duckdb

    from database_extractor_spark.registry import QUERIES

    got = {
        r["user_id"]: (r["longest_streak"], r["n_streaks"], r["n_active_days"])
        for r in QUERIES["user_activity_streaks"](spark, SF_DIR).collect()
    }
    days = duckdb.sql(
        f"select distinct user_id, cast(ts as date) as day"
        f" from '{SF_DIR}/events.parquet' order by 1, 2"
    ).fetchall()
    by_user: dict[int, list] = {}
    for u, d in days:
        by_user.setdefault(u, []).append(d)
    assert set(got) == set(by_user)
    for u, ds in by_user.items():
        streaks, cur = [], 1
        for a, b in zip(ds, ds[1:]):
            if (b - a).days == 1:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        assert got[u] == (max(streaks), len(streaks), len(ds)), u


def test_ks_test_drift_matches_brute(spark):
    """The integer-exact KS statistic must equal a brute-force pooled-CDF
    scan, and sit in [0, 1]."""
    import duckdb

    from database_extractor_spark.registry import QUERIES

    row = QUERIES["ks_test_drift"](spark, SF_DIR).collect()[0]
    vals = duckdb.sql(
        f"""select value,
                   case when ts < timestamp '2024-01-08' then 1 else 0 end
            from '{SF_DIR}/events.parquet'
            where ts >= timestamp '2024-01-01'
              and ts < timestamp '2024-01-15' and value is not null
            order by value"""
    ).fetchall()
    n1 = sum(s for _, s in vals)
    n2 = len(vals) - n1
    cum1 = cum2 = best = 0
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j][0] == vals[i][0]:
            cum1 += vals[j][1]
            cum2 += 1 - vals[j][1]
            j += 1
        best = max(best, abs(cum1 * n2 - cum2 * n1))
        i = j
    assert (row["n1"], row["n2"], row["ks_num"]) == (n1, n2, best)
    assert row["ks_stat"] == best / (n1 * n2)
    assert 0.0 <= row["ks_stat"] <= 1.0


def test_market_basket_lift_invariants(spark):
    """Pair support can never exceed either marginal; lift must equal the
    exact integer ratio; pairs are canonically ordered (brand_a <
    brand_b) and the output is the deterministic top-20."""
    import duckdb

    from database_extractor_spark.registry import QUERIES

    rows = QUERIES["market_basket_lift"](spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    n_orders = duckdb.sql(
        f"""select count(distinct l_orderkey)
            from '{SF_DIR}/lineitem.parquet' l
            join '{SF_DIR}/part.parquet' p on l.l_partkey = p.p_partkey"""
    ).fetchone()[0]
    for r in rows:
        assert r["brand_a"] < r["brand_b"]
        assert r["n_ab"] <= min(r["n_a"], r["n_b"])
        assert r["lift"] == (r["n_ab"] * n_orders) / (r["n_a"] * r["n_b"])
    counts = [r["n_ab"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_quality_score_auc_matches_brute(spark):
    """The prefix-sum AUC must equal a brute-force O(P*Q) pairwise
    Mann-Whitney count over the per-document integer scores."""
    from pyspark.sql import functions as F

    from database_extractor_spark.registry import QUERIES, _tbl, _qc_wsum
    from database_extractor_spark.operators import text as T

    row = QUERIES["quality_score_auc"](spark, SF_DIR).collect()[0]
    toks = T.tokens(F.lower(F.trim(F.col("text"))))
    docs = (
        _tbl(spark, SF_DIR, "documents")
        .select(
            (F.col("lang") == "en").alias("pos"),
            _qc_wsum(toks).alias("s"),
        )
        .collect()
    )
    pos = sorted(r["s"] for r in docs if r["pos"])
    neg = sorted(r["s"] for r in docs if not r["pos"])
    assert (row["n_pos"], row["n_neg"]) == (len(pos), len(neg))
    num2 = sum(
        2 * sum(1 for q in neg if q < p) + sum(1 for q in neg if q == p)
        for p in pos
    )
    assert row["auc_num2"] == num2
    assert row["auc"] == num2 / (2 * len(pos) * len(neg))
    assert 0.0 <= row["auc"] <= 1.0


def test_multi_touch_attribution_invariants(spark):
    """Milli-credits must conserve: each purchase with k touched
    channels contributes exactly k * (1000 div k) <= 1000 milli-units,
    and channel totals must sum to that global amount."""
    import duckdb

    from database_extractor_spark.registry import QUERIES

    rows = QUERIES["multi_touch_attribution_linear"](spark, SF_DIR).collect()
    assert rows, "fixture must produce attributed conversions"
    got_total = sum(r["credit_milli"] for r in rows)
    ks = duckdb.sql(
        f"""with p as (select event_id as p_id, user_id, ts as p_ts
                       from '{SF_DIR}/events.parquet'
                       where event_type = 'purchase'),
        t as (select user_id, ts as t_ts, event_type as channel
              from '{SF_DIR}/events.parquet'
              where event_type <> 'purchase'),
        d as (select distinct p.p_id, t.channel from p join t
              on p.user_id = t.user_id
             and t.t_ts >= p.p_ts - interval 3 day and t.t_ts < p.p_ts)
        select count(*) as k from d group by p_id"""
    ).fetchall()
    want_total = sum(k * (1000 // k) for (k,) in ks)
    assert got_total == want_total
    # every contributing purchase pays out at most 1000 milli-units
    assert got_total <= 1000 * len(ks)
    for r in rows:
        assert 0 < r["credit_milli"] <= 1000 * r["n_conversions"]


def test_calibration_reliability_invariants(spark):
    """Reliability bins must partition the corpus: n sums to the doc
    count, n_pos <= n per bin, mean_pred must lie inside the bin's
    score interval, and pos_rate is the exact ratio."""
    import duckdb

    from database_extractor_spark.registry import QUERIES

    rows = QUERIES["calibration_reliability"](spark, SF_DIR).collect()
    n_docs = duckdb.sql(
        f"select count(*) from '{SF_DIR}/documents.parquet'"
    ).fetchone()[0]
    assert sum(r["n"] for r in rows) == n_docs
    assert len(rows) >= 3, "temperature-scaled scores must spread bins"
    for r in rows:
        assert 0 <= r["n_pos"] <= r["n"]
        lo, hi = r["bin"] / 10.0, (r["bin"] + 1) / 10.0
        assert lo <= r["mean_pred"] <= hi, (r["bin"], r["mean_pred"])
        assert r["pos_rate"] == r["n_pos"] / r["n"]


def test_embedding_cosine_histogram_invariants(spark):
    """Histogram counts must total the exact within-label pair count of
    the md5 sample, and bins must stay inside [-1, 1] cosine range."""
    import duckdb
    from collections import Counter

    from database_extractor_spark.registry import QUERIES

    rows = QUERIES["embedding_cosine_histogram"](spark, SF_DIR).collect()
    labels = duckdb.sql(
        f"""select label from '{SF_DIR}/embeddings.parquet'
            where ('0x' || substr(md5(cast(vec_id as varchar)), 1, 8))::bigint
                  % 2 = 0"""
    ).fetchall()
    per = Counter(l for (l,) in labels)
    want_pairs = sum(c * (c - 1) // 2 for c in per.values())
    assert sum(r["n"] for r in rows) == want_pairs
    for r in rows:
        assert -21 <= r["bin"] <= 20
        assert r["n"] > 0


def test_ohlc_bars_matches_brute(spark):
    """The single-aggregate struct-ordered OHLC must equal a brute
    recompute from each bar's time-sorted rows (open = first by
    (ts, event_id), close = last, high/low = extremes, n = count)."""
    import duckdb

    from database_extractor_spark.registry import QUERIES

    got = {
        (r["event_type"], r["bar_ts"]): (
            r["open"], r["high"], r["low"], r["close"], r["n"]
        )
        for r in QUERIES["ohlc_bars"](spark, SF_DIR).collect()
    }
    rows = duckdb.sql(
        f"""select event_type, date_trunc('minute', ts), ts, event_id, value
            from '{SF_DIR}/events.parquet' where value is not null
            order by event_type, 2, ts, event_id"""
    ).fetchall()
    bars: dict = {}
    for et, bts, ts, eid, v in rows:
        bars.setdefault((et, bts), []).append(v)
    assert set(got) == set(bars)
    for k, vs in bars.items():
        assert got[k] == (vs[0], max(vs), min(vs), vs[-1], len(vs)), k


def test_token_label_chi2_invariants(spark):
    """Contingency cells must respect margins, chi2 must be the exact
    integer-ratio value, and the output must be the deterministic
    top-20 above the min-df gate."""
    import duckdb

    from database_extractor_spark.registry import QUERIES

    rows = QUERIES["token_label_chi2"](spark, SF_DIR).collect()
    assert len(rows) == 20
    ta, tb = duckdb.sql(
        f"""select sum(case when lang = 'en' then 1 else 0 end),
                   sum(case when lang = 'en' then 0 else 1 end)
            from '{SF_DIR}/documents.parquet'"""
    ).fetchone()
    chis = []
    for r in rows:
        a, b = r["n_pos_docs"], r["n_neg_docs"]
        assert a + b >= 20 and a <= ta and b <= tb
        det = a * (tb - b) - b * (ta - a)
        want = ((ta + tb) * det * det) / (
            (a + b) * ((ta - a) + (tb - b)) * ta * tb
        )
        assert r["chi2"] == want
        chis.append(r["chi2"])
    assert chis == sorted(chis, reverse=True)


def test_embedding_dim_stats_matches_numpy(spark):
    """Micro-quantized integer moments must reproduce numpy's per-dim
    mean/std on the quantized values to double precision, and min/max
    must be the raw extremes."""
    import numpy as np
    import duckdb

    from database_extractor_spark.registry import QUERIES

    rows = QUERIES["embedding_dim_stats"](spark, SF_DIR).collect()
    vecs = np.array(
        [
            v[0]
            for v in duckdb.sql(
                f"select embedding from '{SF_DIR}/embeddings.parquet' order by vec_id"
            ).fetchall()
        ],
        dtype=np.float64,
    )
    assert len(rows) == vecs.shape[1]
    for r in rows:
        col = vecs[:, r["dim"]]
        xi = np.round(col * 1e6)
        assert r["n"] == len(col)
        assert r["mean"] == xi.sum() / (1e6 * len(col))
        var = (np.sum(xi * xi) - xi.sum() ** 2 / len(col)) / len(col)
        assert abs(r["std"] - np.sqrt(var) / 1e6) < 1e-15
        assert (r["min_x"], r["max_x"]) == (col.min(), col.max())
