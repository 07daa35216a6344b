"""Round-8 operators: exact-substring dedup span semantics, the Python
UDTF offset map, and the frozen-weight quality classifier."""

import hashlib
import math
import re

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


# ---------------------------------------------------------------------------
# exact-substring dedup
# ---------------------------------------------------------------------------


def _spans(spark, rows, **kw):
    from database_extractor_spark.operators.dedup import exact_substring_spans

    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = exact_substring_spans(df, **kw)
    return sorted(tuple(r) for r in out.collect())


def test_planted_duplicate_span_found_and_maximal(spark):
    """A 10-token run shared verbatim by two otherwise-different documents
    must come back as ONE maximal span with exact offsets, not a pile of
    overlapping gram hits."""
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, "x1 x2 x3 " + shared + " y1 y2"),
        (2, "z1 " + shared + " w1 w2 w3 w4"),
    ]
    got = _spans(spark, rows, gram=5, min_tokens=8, df_cap=20)
    # doc 1: tokens 4..13 (1-based); doc 2: tokens 2..11
    assert got == [(1, 2, 4, 2, 10)]


def test_two_disjoint_spans_stay_separate(spark):
    """Two shared runs separated by non-matching tokens (same diagonal
    broken by a gap) merge into two spans, not one."""
    a = "p1 p2 p3 p4 p5 p6 p7 p8"
    b = "q1 q2 q3 q4 q5 q6 q7 q8"
    rows = [
        (1, a + " mid1 mid2 " + b),
        (2, a + " other1 other2 " + b),
    ]
    got = _spans(spark, rows, gram=5, min_tokens=8, df_cap=20)
    assert got == [(1, 2, 1, 1, 8), (1, 2, 11, 11, 8)]


def test_sub_min_span_dropped(spark):
    """A shared run shorter than min_tokens is filtered out."""
    shared = "s1 s2 s3 s4 s5 s6"  # 6 tokens < 8
    rows = [(1, "a1 a2 " + shared), (2, shared + " b1 b2")]
    assert _spans(spark, rows, gram=5, min_tokens=8, df_cap=20) == []


def test_df_cap_drops_boilerplate_grams(spark):
    """A gram present in more than df_cap documents is dropped from the
    index: the boilerplate run matches NOWHERE once capped."""
    boiler = "c1 c2 c3 c4 c5 c6 c7 c8 c9"
    rows = [(i, f"u{i} " + boiler) for i in range(1, 6)]  # 5 docs share it
    assert _spans(spark, rows, gram=5, min_tokens=8, df_cap=4) == []
    # raise the cap and every pair reports the span
    got = _spans(spark, rows, gram=5, min_tokens=8, df_cap=10)
    assert len(got) == 10  # C(5,2) pairs
    assert all(t[4] == 9 for t in got)


def test_short_docs_emit_no_grams(spark):
    """Documents under the gram width produce an empty hash array (no
    partial-gram fallback)."""
    from database_extractor_spark.operators.text import rolling_hashes

    df = spark.createDataFrame([("a b c",), ("",)], "text string")
    out = df.select(rolling_hashes(F.col("text"), 5).alias("h")).collect()
    assert [r["h"] for r in out] == [[], []]


def test_rolling_hash_matches_md5_reference(spark):
    """The gram hash is the portable 60-bit md5 lane, reproducible outside
    Spark byte-for-byte."""
    txt = "one two three four five six"
    df = spark.createDataFrame([(txt,)], "text string")
    out = df.select(
        F.posexplode(
            __import__(
                "database_extractor_spark.operators.text", fromlist=["rolling_hashes"]
            ).rolling_hashes(F.col("text"), 5)
        ).alias("pos", "h")
    ).collect()
    toks = txt.split()
    expect = [
        int(hashlib.md5(" ".join(toks[i : i + 5]).encode()).hexdigest()[:15], 16)
        for i in range(len(toks) - 5 + 1)
    ]
    assert [(r["pos"], r["h"]) for r in out] == list(enumerate(expect))


def test_exact_substring_registry_rows(spark):
    """Fixture smoke: the registry entry returns spans on the sf0.001
    corpus with valid offsets (positive, 1-based, >= min span length)."""
    import __spark_entry__ as E

    rows = E.queries()["dedup_exact_substring"](spark, SF_DIR).collect()
    for r in rows:
        assert r["id_a"] < r["id_b"]
        assert r["a_start"] >= 1 and r["b_start"] >= 1
        assert r["n_tokens"] >= 8


# ---------------------------------------------------------------------------
# UDTF: tokenize_with_offsets
# ---------------------------------------------------------------------------


def test_udtf_offsets_reconstruct_normalized_text(spark):
    """Every emitted (char_start, char_end) slice of the normalized text
    must equal the emitted token — the offset map's defining property."""
    import __spark_entry__ as E

    out = E.queries()["udtf_tokenize_offsets"](spark, SF_DIR)
    sample = out.filter(F.col("doc_id") < 10).collect()
    assert sample
    docs = {
        r["doc_id"]: re.sub(r"\s+", " ", r["text"].strip().lower())
        for r in pq.read_table(f"{SF_DIR}/documents.parquet")
        .to_pylist()
        if r["doc_id"] < 10
    }
    for r in sample:
        norm = docs[r["doc_id"]]
        assert norm[r["char_start"] : r["char_end"]] == r["token"]
        assert r["char_end"] - r["char_start"] == len(r["token"])


def test_udtf_plan_is_arrow_batched(spark):
    """The UDTF must run as ArrowEvalPythonUDTF (vectorized), never the
    row-at-a-time BatchEvalPythonUDTF the lint bans."""
    import __spark_entry__ as E

    plan = (
        E.queries()["udtf_tokenize_offsets"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPythonUDTF" in plan
    assert "BatchEvalPython " not in plan


# ---------------------------------------------------------------------------
# quality classifier
# ---------------------------------------------------------------------------


def _py_quality(text: str, weights):
    toks = re.split(r"\s+", text.strip().lower())
    wsum = sum(
        weights[int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 64] for t in toks
    )
    n = len(toks)
    z = wsum / (1000.0 * n)
    return round(1.0 / (1.0 + math.exp(-z)), 6), wsum >= 0, n


def test_quality_classifier_matches_independent_reimplementation(spark):
    """Scores from the Spark expression pipeline equal a from-scratch
    Python scorer on every sf0.001 document (independent-implementation
    property, the DSIR-style correctness pin)."""
    import __spark_entry__ as E
    from database_extractor_spark.registry import _qc_weights

    w = _qc_weights()
    got = {
        r["doc_id"]: (r["score"], r["quality_pass"], r["n_tokens"])
        for r in E.queries()["quality_classifier_score"](spark, SF_DIR).collect()
    }
    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pylist()
    assert len(got) == len(docs)
    for d in docs:
        score, ok, n = _py_quality(d["text"], w)
        assert got[d["doc_id"]] == (score, ok, n), d["doc_id"]


def test_quality_classifier_selection_is_nondegenerate(spark):
    """Selection-bias sanity (the DSIR lesson): the scorer must actually
    separate documents — a formulation bug that collapses z toward 0
    (e.g. dividing by a wrong scale) degenerates every score to ~0.5 and
    the keep set to all-or-nothing."""
    import __spark_entry__ as E

    rows = E.queries()["quality_classifier_score"](spark, SF_DIR).collect()
    scores = [r["score"] for r in rows]
    passed = sum(r["quality_pass"] for r in rows)
    assert 0 < passed < len(rows)
    assert max(scores) - min(scores) > 0.01
    # keep decision is the exact integer predicate, consistent with score
    for r in rows:
        assert r["quality_pass"] == (r["score"] >= 0.5)


# ---------------------------------------------------------------------------
# ANN index cache (materialized assignment/codes)
# ---------------------------------------------------------------------------


def test_ann_index_cache_rebuilds_on_session_mismatch(spark):
    """The persisted IVF-assignment / PQ-codes DataFrames are bound to the
    session that built them; a stale entry from a restarted session must
    be rebuilt, not returned (the r4 _PQ_INDEX_CACHE lesson, re-pinned
    for the round-8 materialized-index cache)."""
    import types

    from database_extractor_spark import registry as R

    stale = types.SimpleNamespace(sparkSession=object())
    # keyed by (kind, fixture CONTENT fingerprint) since r12 (0cb8a98)
    key = ("pq", R._parquet_fingerprint(SF_DIR, "embeddings"))
    old = R._ANN_INDEX_CACHE.get(key)
    R._ANN_INDEX_CACHE[key] = stale
    try:
        out = R.QUERIES["sim_pq_topk"](spark, SF_DIR)
        assert R._ANN_INDEX_CACHE[key] is not stale
        assert R._ANN_INDEX_CACHE[key].sparkSession is spark
        assert out.count() == 10
        fresh = R._ANN_INDEX_CACHE[key]
        R.QUERIES["sim_pq_topk"](spark, SF_DIR)
        assert R._ANN_INDEX_CACHE[key] is fresh  # reused, not rebuilt
    finally:
        R._ANN_INDEX_CACHE.pop(key, None)
        if old is not None and old.sparkSession is spark:
            R._ANN_INDEX_CACHE[key] = old


# ---------------------------------------------------------------------------
# exact-substring remediation (span removal)
# ---------------------------------------------------------------------------


def test_remove_spans_cuts_later_doc_only(spark):
    """The duplicated run is cut from the LATER doc (id_b) and only
    there; the earlier doc keeps the canonical copy; untouched docs pass
    through with whitespace normalized."""
    from database_extractor_spark.operators.dedup import (
        exact_substring_spans,
        remove_spans,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, "x1 x2 x3 " + shared + " y1 y2"),
        (2, "z1 " + shared + " w1 w2 w3 w4"),
        (3, "totally unrelated document with enough tokens here"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    spans = exact_substring_spans(df, gram=5, min_tokens=8, df_cap=20)
    out = {r["doc_id"]: r for r in remove_spans(df, spans).collect()}
    assert out[1]["n_removed"] == 0 and out[1]["text_clean"] == rows[0][1]
    assert out[2]["n_removed"] == 10
    assert out[2]["text_clean"] == "z1 w1 w2 w3 w4"
    assert out[3]["n_removed"] == 0 and out[3]["text_clean"] == rows[2][1]


def test_remove_spans_unions_overlapping_spans(spark):
    """A doc that is id_b in several pairs loses the UNION of its spans —
    overlapping spans must not double-count removals."""
    from database_extractor_spark.operators.dedup import remove_spans

    docs = spark.createDataFrame(
        [(9, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")], "doc_id bigint, text string"
    )
    spans = spark.createDataFrame(
        [(1, 9, 1, 2, 8), (2, 9, 1, 4, 5)],
        "id_a bigint, id_b bigint, a_start int, b_start int, n_tokens int",
    )
    out = remove_spans(docs, spans).collect()[0]
    # union of [2,10) and [4,9) = positions 2..9 -> 8 tokens removed
    assert out["n_removed"] == 8
    assert out["text_clean"] == "t1 t10"


def test_exact_substring_apply_registry_consistency(spark):
    """Registry smoke on sf0.001: token accounting adds up and at least
    one document is actually cleaned (the corpus has planted near-dups)."""
    import __spark_entry__ as E

    rows = E.queries()["dedup_exact_substring_apply"](spark, SF_DIR).collect()
    assert sum(r["n_removed"] for r in rows) > 0
    for r in rows:
        kept = len(r["text_clean"].split()) if r["text_clean"] else 0
        assert kept == r["n_tokens_before"] - r["n_removed"]


# ---------------------------------------------------------------------------
# exact-substring vs brute-force DP reference (property)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


def _dp_spans(docs, min_tokens):
    """O(n^2) dynamic-programming reference: maximal common token runs of
    length >= min_tokens across every doc pair — the textbook definition
    the distributed gram-index operator must reproduce (with the df cap
    disabled and no hash collisions)."""
    out = []
    ids = sorted(docs)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = docs[ids[ai]], docs[ids[bi]]
            L = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
            for i in range(1, len(a) + 1):
                for j in range(1, len(b) + 1):
                    if a[i - 1] == b[j - 1]:
                        L[i][j] = L[i - 1][j - 1] + 1
            for i in range(1, len(a) + 1):
                for j in range(1, len(b) + 1):
                    l = L[i][j]
                    if l < min_tokens:
                        continue
                    # maximal: not extendable to (i+1, j+1)
                    if i < len(a) and j < len(b) and a[i] == b[j]:
                        continue
                    out.append((ids[ai], ids[bi], i - l + 1, j - l + 1, l))
    return sorted(out)


@given(
    st.lists(
        st.lists(st.sampled_from("abcde"), min_size=0, max_size=26),
        min_size=2,
        max_size=4,
    )
)
@settings(max_examples=6, deadline=None)
def test_exact_substring_matches_dp_reference(spark, token_lists):
    """Tie-heavy random corpora (5-token alphabet -> dense repeats,
    multiple diagonals, overlapping runs): the gram-index operator's
    maximal spans must equal the brute-force DP reference exactly."""
    from database_extractor_spark.operators.dedup import exact_substring_spans

    docs = {i + 1: toks for i, toks in enumerate(token_lists)}
    rows = [(i, " ".join(toks)) for i, toks in docs.items()]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = sorted(
        tuple(r)
        for r in exact_substring_spans(
            df, gram=3, min_tokens=4, df_cap=10**6
        ).collect()
    )
    assert got == _dp_spans(docs, 4)


def test_cluster_balanced_sample_quota_and_spread(spark):
    """Every cluster contributes at most its quota, more than one cluster
    is represented (the balance property), and repeat calls are
    deterministic (md5 rank, no rand())."""
    import collections

    import __spark_entry__ as E

    fn = E.queries()["cluster_balanced_sample"]
    rows = fn(spark, SF_DIR).collect()
    per = collections.Counter(r["cluster_id"] for r in rows)
    assert max(per.values()) <= 10
    assert len(per) > 1
    again = fn(spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_semdedup_drop_set_is_consistent(spark):
    """Every dropped doc has a kept (or earlier) same-cluster partner
    above the threshold; keep-first means the SMALLEST id of any
    similar group always survives."""
    import __spark_entry__ as E
    from database_extractor_spark import registry as R

    rows = E.queries()["semdedup_prune"](spark, SF_DIR).collect()
    dropped = {r["vec_id"] for r in rows if not r["kept"]}
    assert 0 < len(dropped) < len(rows)
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r["vec_id"])
    # smallest id per cluster can never be dropped (no earlier partner)
    for ids in by_cluster.values():
        assert min(ids) not in dropped


def test_trained_ann_serves_from_materialized_index(spark):
    """After the first call, the trained IVF/PQ entries must serve from
    the persisted index (InMemoryTableScan in the warm plan) — the
    round-8 perf fix that took PQ search from 6.5 s to 0.7 s; a
    regression here re-pays index construction per query."""
    from database_extractor_spark import registry as R

    for name in ["sim_ivf_kmeans", "sim_pq_topk", "cluster_balanced_sample",
                 "semdedup_prune"]:
        R.QUERIES[name](spark, SF_DIR)  # ensure caches are built
        plan = (
            R.QUERIES[name](spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "InMemoryTableScan" in plan, f"{name} rebuilds its index per query"


def test_exact_substring_gram_exchange_is_reused(spark):
    """The md5 gram-emission subtree feeds both the df-cap aggregate and
    both self-join sides; AQE must materialize that exchange ONCE and
    reuse it (ReusedExchange in the final adaptive plan) — without reuse
    the most expensive stage (per-position md5 over every document) runs
    four times."""
    import __spark_entry__ as E

    df = E.queries()["dedup_exact_substring"](spark, SF_DIR)
    df.collect()  # finalize the adaptive plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ReusedExchange") >= 1, plan[:2000]


def test_streaming_quality_gate_converges_to_batch(spark):
    """The streaming gate's per-language totals equal the batch
    classifier's aggregation — incremental micro-batch execution
    converges to the batch answer (keep decisions are integer-exact, so
    no FP boundary can drift between the two)."""
    import collections

    import __spark_entry__ as E

    batch = E.queries()["quality_classifier_score"](spark, SF_DIR).collect()
    want_total = collections.Counter(r["lang"] for r in batch)
    want_pass = collections.Counter(r["lang"] for r in batch if r["quality_pass"])
    got = E.queries()["streaming_quality_gate"](spark, SF_DIR).collect()
    assert {r["lang"]: r["n_total"] for r in got} == dict(want_total)
    assert {r["lang"]: r["n_pass"] for r in got} == {
        k: want_pass.get(k, 0) for k in want_total
    }
