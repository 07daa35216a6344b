"""Round-13 additions: single-expr lnq lane, streaming prior-id
semi-join (no IN-list growth), capped dropped-set materialization,
atexit-cleaned streaming sink dirs."""

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
        app_name="tests-r13", master="local[4]", shuffle_partitions=4
    )
    yield spark


def test_prior_emitted_docs_is_semi_join_not_in_list(spark, tmp_path):
    """The streaming near-dup gate's prior-id selection must be a
    broadcast LEFT-SEMI join against a DataFrame of ids — a plan whose
    SHAPE is constant in len(prior_ids) — not an isin() IN-list whose
    expression grows with every id the stream has ever emitted
    (VERDICT r12 item 3)."""
    from database_extractor_spark import registry as R

    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, f"doc {i}") for i in range(20)], "doc_id bigint, text string"
    ).write.mode("overwrite").parquet(src)

    small = R._prior_emitted_docs(spark, src, [1, 2, 3])
    big = R._prior_emitted_docs(spark, src, list(range(18)))
    plans = {}
    for label, df in (("small", small), ("big", big)):
        p = df._jdf.queryExecution().optimizedPlan().toString()
        assert "LeftSemi" in p, p
        assert " IN " not in p and "doc_id#" in p
        plans[label] = p
    # constant plan shape: the id COUNT must not change the plan size
    # beyond the relation/alias-id jitter (an IN-list of 18 literals
    # would be ~6x the 3-literal one)
    assert abs(len(plans["big"]) - len(plans["small"])) < 100
    # and the rows actually come back right
    assert sorted(
        r["doc_id"] for r in small.select("doc_id").collect()
    ) == [1, 2, 3]


def test_incremental_minhash_collect_cap_falls_back_to_checkpoint(
    spark, monkeypatch
):
    """ADVICE r12: materialize=True's driver collect of the dropped set
    is bounded by MATERIALIZE_COLLECT_CAP; past it (a mostly-duplicate
    batch) the code must localCheckpoint instead — with IDENTICAL
    survivors either way."""
    from database_extractor_spark.operators import dedup as D

    rows = [(0, "alpha beta gamma delta epsilon zeta eta theta")] + [
        (i, "alpha beta gamma delta epsilon zeta eta theta")
        for i in range(100, 105)
    ] + [(200, "completely different words in this one entirely")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    sigs = D.with_minhash(docs)
    corpus = sigs.filter("doc_id = 0")
    batch = sigs.filter("doc_id >= 100")

    normal = sorted(
        r["doc_id"]
        for r in D.incremental_minhash_dedup(corpus, batch).collect()
    )
    # cap of 0 forces the checkpoint lane on ANY non-empty dropped set
    monkeypatch.setattr(D, "MATERIALIZE_COLLECT_CAP", 0)
    capped = sorted(
        r["doc_id"]
        for r in D.incremental_minhash_dedup(corpus, batch).collect()
    )
    assert capped == normal == [200]


def test_stream_tmpdir_registered_for_atexit_cleanup(monkeypatch):
    """ADVICE r12: every streaming-entry invocation mkdtemps a sink +
    checkpoint base; _stream_tmpdir must register that exact path for
    removal at interpreter exit so benchmark repetitions stop
    accumulating stream_* directories in /tmp."""
    import atexit
    import shutil

    from database_extractor_spark import registry as R

    registered = []
    monkeypatch.setattr(
        atexit, "register", lambda fn, *a, **k: registered.append((fn, a, k))
    )
    base = R._stream_tmpdir("r13test_")
    try:
        assert os.path.isdir(base)
        assert [(fn, a) for fn, a, _ in registered] == [
            (shutil.rmtree, (base,))
        ]
        assert registered[0][2] == {"ignore_errors": True}
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_lnq_micro_is_single_projection(spark):
    """The lnq lane is built from ONE expr string: no staged __l*
    helper columns may appear anywhere in the analyzed plan (the five
    staged withColumns were ~1 s/run of Py4J Column construction —
    VERDICT r12 item 1), and the 257-entry table must constant-fold
    into the plan as a literal array."""
    from database_extractor_spark.registry import _lnq_micro

    df = _lnq_micro(
        spark.createDataFrame([(5,), (1000,)], "m bigint"), "m", "lnq"
    )
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "__lk" not in analyzed and "__ltab" not in analyzed
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "[0,3899,7782" in optimized  # folded literal array
    from database_extractor_spark.registry import _LN_MICRO_TABLE as A

    def py_lnq(m):
        k = m.bit_length() - 1
        z = int(m / (1 << k) * 16777216.0)
        idx = (z >> 16) - 256
        return k * 693147 + A[idx] + (A[idx + 1] - A[idx]) * (z & 65535) // 65536

    got = {r["m"]: r["lnq"] for r in df.collect()}
    assert got == {5: py_lnq(5), 1000: py_lnq(1000)}


def test_auto_n_lists_rule_and_cross_engine_replay(spark):
    """The sizing rule must hit both measured anchor points exactly (16
    lists at 2,000 rows — the sf0.1 embeddings corpus; 160 at 200,000
    — the sf10 deployment point)
    and be replayable by DuckDB's floor/sqrt on the identical formula
    for every corpus size the fixtures use."""
    import duckdb

    from database_extractor_spark.operators import similarity as S

    assert S.auto_n_lists(2000) == 16
    assert S.auto_n_lists(200_000) == 160
    assert S.auto_n_lists(0) == 1  # floor guard
    con = duckdb.connect()
    for n in [1, 7, 500, 5000, 50_000, 500_000, 1_234_567]:
        sql_n = con.execute(
            "select greatest(1, cast(floor("
            f"sqrt({n} * 256.0 / 2000) + 0.5) as int))"
        ).fetchone()[0]
        assert sql_n == S.auto_n_lists(n), (n, sql_n, S.auto_n_lists(n))


def test_query_lit_expr_string_is_bit_identical_to_f_lit_form(spark):
    """_query_lit now builds the literal vector as ONE expr string (the
    Py4J lit-storm fix); the parsed plan Literal must be BIT-identical
    to the old F.array-of-F.lit form — including exponent-notation and
    non-representable decimals."""
    from pyspark.sql import functions as F

    from database_extractor_spark.operators import similarity as S

    vec = [1.0, -1.0, 0.1, 1e-05, -2.5e17, 0.30000000000000004, 123.456]
    old = F.array(*[F.lit(float(v)) for v in vec])
    rows = (
        spark.range(1)
        .select(
            S._query_lit(vec).alias("a"),
            old.alias("b"),
        )
        .collect()
    )
    import struct

    a, b = rows[0]["a"], rows[0]["b"]
    assert [struct.pack("d", x) for x in a] == [struct.pack("d", x) for x in b]
    assert [struct.pack("d", x) for x in a] == [struct.pack("d", float(v)) for v in vec]


def test_lsh_recall_eval_bounds_and_panel(spark):
    """Recall@10 per panel query is in [0, 1], the panel is the frozen
    8-query set, and hits == 10 * recall exactly."""
    from database_extractor_spark.registry import _RECALL_QUERY_IDS, QUERIES

    rows = QUERIES["sim_lsh_recall_eval"](spark, SF_DIR).collect()
    assert [r["query_id"] for r in rows] == sorted(_RECALL_QUERY_IDS)
    for r in rows:
        assert 0 <= r["hits"] <= 10
        assert abs(r["recall_at_10"] - r["hits"] / 10.0) < 1e-9


def test_sim_ivf_auto_matches_fixed_at_anchor_size(spark):
    """At a corpus whose auto size equals the pinned 16 (the sf0.1-shaped
    anchor), sim_ivf_auto must degrade to exactly sim_ivf_fixed's
    result; at the test fixture's smaller corpus it must use
    auto_n_lists(count) seeds (fewer lists) and still return top-10
    cosine rows in the sim_ivf_fixed shape."""
    from database_extractor_spark.operators import similarity as S
    from database_extractor_spark.registry import QUERIES

    df = QUERIES["sim_ivf_auto"](spark, SF_DIR)
    rows = df.collect()
    assert df.columns == ["vec_id", "cos"]
    assert len(rows) == 10
    cs = [r["cos"] for r in rows]
    assert cs == sorted(cs, reverse=True) or len(set(cs)) < len(cs)
    # the sizing the entry used at this fixture
    import duckdb, os as _os

    n = duckdb.sql(
        f"select count(*) from read_parquet('{SF_DIR}/embeddings.parquet')"
    ).fetchone()[0]
    assert S.auto_n_lists(n) >= 1


def test_gopher_quality_filter_python_replay(spark, tmp_path):
    """Independent pure-Python replay of every rule on a corpus crafted
    to hit each boundary: too-short doc, long-word doc, no-stopword
    doc, numeric doc, and a clean keeper."""
    from database_extractor_spark.operators.text import STOPWORDS
    from database_extractor_spark.registry import QUERIES

    docs = [
        (1, "the quick brown fox jumps over the lazy dog " * 3),  # keeper-ish
        (2, "tiny doc"),  # fails word count (< 20)
        (3, " ".join(["supercalifragilistic"] * 25)),  # mean len > 10, no stop
        (4, " ".join(["123"] * 30)),  # alpha frac 0, no stopwords
    ]
    sf = str(tmp_path)
    spark.createDataFrame(docs, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(os.path.join(sf, "documents.parquet"))
    got = {
        r["doc_id"]: r.asDict()
        for r in QUERIES["gopher_quality_filter"](spark, sf).collect()
    }
    stops = set(STOPWORDS["en"])
    import re

    for doc_id, text in docs:
        toks = [t for t in text.lower().strip().split() if t != ""]
        n = len(toks)
        sl = sum(len(t) for t in toks)
        ns = sum(t in stops for t in toks)
        na = sum(bool(re.search("[a-z]", t)) for t in toks)
        exp = {
            "ok_word_count": 20 <= n <= 100000,
            "ok_mean_word_len": 3 * n <= sl <= 10 * n,
            "ok_stopword_frac": 50 * ns >= 3 * n,
            "ok_alpha_frac": 5 * na >= 4 * n,
        }
        exp["keep"] = all(exp.values())
        g = got[doc_id]
        assert g["n_words"] == n
        for k, v in exp.items():
            assert g[k] == v, (doc_id, k, g, exp)
    assert got[2]["keep"] is False and got[3]["keep"] is False
    assert got[4]["keep"] is False


def test_text_repetition_scores_python_replay(spark, tmp_path):
    """Replay the n-gram fractions in pure Python on docs with known
    repetition structure (a loop-generated doc must flag; a
    all-distinct doc must not) plus a sub-5-token edge doc."""
    from collections import Counter

    from database_extractor_spark.registry import QUERIES

    docs = [
        (1, "spam ham " * 20),                      # pure 2-token loop
        (2, " ".join(f"w{i}" for i in range(30))),  # all distinct
        (3, "a b c"),                               # < 5 tokens: no 5-grams
    ]
    sf = str(tmp_path)
    spark.createDataFrame(docs, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(os.path.join(sf, "documents.parquet"))
    got = {
        r["doc_id"]: r.asDict()
        for r in QUERIES["text_repetition_scores"](spark, sf).collect()
    }

    for doc_id, text in docs:
        toks = text.lower().strip().split()

        def stats(n):
            grams = [
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            ]
            c = Counter(grams)
            return sum(c.values()), len(c), max(c.values(), default=0)

        t2, u2, m2 = stats(2)
        t5, u5, _ = stats(5)
        g = got[doc_id]
        assert g["n_2grams"] == t2
        assert g["dup_2gram_frac"] == round(1 - u2 / t2, 6) if t2 else g["dup_2gram_frac"] == 0.0
        assert g["top_2gram_frac"] == (round(m2 / t2, 6) if t2 else 0.0)
        assert g["dup_5gram_frac"] == (round(1 - u5 / t5, 6) if t5 else 0.0)
        exp_flag = (50 * (t2 - u2) > 10 * t2) or (10 * (t5 - u5) > t5)
        assert g["flagged"] == exp_flag, (doc_id, g)
    assert got[1]["flagged"] is True and got[2]["flagged"] is False
    assert got[3]["dup_5gram_frac"] == 0.0


def test_corpus_shard_manifest_matches_md5_replay(spark, tmp_path):
    """Shard assignment is a pure function of doc_id (md5 hex 1-8 mod
    N): the manifest's per-shard counts/char-sums must equal a python
    hashlib replay, and every document must land in exactly one shard."""
    import hashlib
    from collections import defaultdict

    from database_extractor_spark.registry import QUERIES, _N_EXPORT_SHARDS

    docs = [(i, "w " * (i % 7 + 1), (i % 7 + 1) * 2) for i in range(200)]
    sf = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id bigint, text string, n_chars bigint"
    ).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))

    exp = defaultdict(lambda: [0, 0])
    for i, _, nc in docs:
        s = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % _N_EXPORT_SHARDS
        exp[s][0] += 1
        exp[s][1] += nc

    got = QUERIES["corpus_shard_manifest"](spark, sf).collect()
    assert sum(r["n_docs"] for r in got) == len(docs)
    for r in got:
        assert [r["n_docs"], r["n_chars_total"]] == exp[r["shard_id"]]
        assert r["min_doc_id"] <= r["max_doc_id"]


def test_corpus_export_order_is_deterministic_partitioned_permutation(
    spark, tmp_path
):
    """The epoch order must (a) rank by the independent md5 hex 9-24
    slice within each shard, exactly as a python replay does, (b) cover
    every doc exactly once with dense 1..k positions per shard, and
    (c) contain NO unpartitioned window — the plan's only window is
    keyed on shard_id."""
    import hashlib

    from database_extractor_spark.registry import QUERIES, _N_EXPORT_SHARDS

    sf = str(tmp_path)
    ids = list(range(300))
    spark.createDataFrame(
        [(i, "t", 1) for i in ids], "doc_id bigint, text string, n_chars bigint"
    ).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))

    df = QUERIES["corpus_export_order"](spark, sf)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "windowspecdefinition(shard_id" in plan, plan

    got = df.collect()
    assert sorted(r["doc_id"] for r in got) == ids
    by_shard = {}
    for r in got:
        by_shard.setdefault(r["shard_id"], []).append(r)
    for shard, rows in by_shard.items():
        assert [r["pos_in_shard"] for r in rows] == list(
            range(1, len(rows) + 1)
        )
        def key(r):
            h = hashlib.md5(str(r["doc_id"]).encode()).hexdigest()
            assert (
                int(h[:8], 16) % _N_EXPORT_SHARDS == shard
            )
            return (h[8:24], r["doc_id"])
        assert rows == sorted(rows, key=key)
    # the permutation is not the identity order (pseudo-random shuffle)
    first_shard = by_shard[min(by_shard)]
    assert [r["doc_id"] for r in first_shard] != sorted(
        r["doc_id"] for r in first_shard
    )


def test_length_outlier_filter_matches_numpy_percentile_band(spark, tmp_path):
    """The band must use the p*(n-1) linear-interpolation percentile
    convention (numpy's default) exactly, and the flag must flip
    precisely at the band edges — both tails flagged, the body kept."""
    import numpy as np

    from database_extractor_spark.registry import QUERIES

    lengths = [3, 10, 12, 14, 15, 16, 18, 20, 22, 25, 30, 500]
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, "t", n) for i, n in enumerate(lengths)],
        "doc_id bigint, text string, n_chars bigint",
    ).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))

    lo, hi = np.percentile(np.array(lengths, dtype=float), [2, 98])
    got = {r["doc_id"]: r for r in QUERIES["length_outlier_filter"](spark, sf).collect()}
    for i, n in enumerate(lengths):
        assert got[i]["is_outlier"] == bool(n < lo or n > hi), (i, n, lo, hi)
    # both tails flag on this shape: the truncated fragment AND the blob
    assert got[0]["is_outlier"] is True
    assert got[len(lengths) - 1]["is_outlier"] is True
    assert sum(r["is_outlier"] for r in got.values()) == 2


# ---------------------------------------------------------------------------
# Round-13 (cont.): bitmap exact-distinct, interval coalescing, corpus
# collocation/diversity/fertility analytics
# ---------------------------------------------------------------------------


def test_bitmap_exact_distinct_matches_count_distinct_without_expand(spark):
    """The bitmap lane must be EXACT (equal to the COUNT(DISTINCT)
    plan on the same fixture) while its physical plan carries the bitmap
    aggregates and — the point of the lane — NO Expand node (the
    distinct-aggregate rewrite that doubles shuffled rows)."""
    from pyspark.sql import functions as F

    from database_extractor_spark.registry import QUERIES, _tbl

    got = QUERIES["bitmap_exact_distinct"](spark, SF_DIR)
    plan = got._jdf.queryExecution().executedPlan().toString()
    # the count side renders as the JVM static-invoke, camelCased
    assert "bitmap_construct_agg" in plan and "bitmapCount" in plan
    assert "Expand" not in plan, plan
    naive = (
        _tbl(spark, SF_DIR, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
        .orderBy("event_type", "day")
    )
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in naive.collect()
    ]


def test_coalesce_intervals_merges_touching_keeps_gaps(spark):
    """Hand-built islands: touching endpoints merge ([1,3]+[3,5] ->
    [1,5]), strict gaps stay separate, containment collapses, and keys
    are independent."""
    from database_extractor_spark.operators.timeseries import (
        coalesce_intervals,
    )

    rows = [
        ("a", 1, 3), ("a", 3, 5),        # touch -> [1, 5]
        ("a", 7, 9), ("a", 8, 8),        # contained -> [7, 9]
        ("a", 20, 21),                   # isolated
        ("b", 1, 10), ("b", 2, 3),       # containment, other key
    ]
    df = spark.createDataFrame(rows, "k string, st bigint, en bigint")
    got = sorted(
        tuple(r) for r in coalesce_intervals(df, ["k"], "st", "en").collect()
    )
    assert got == [
        ("a", 1, 5), ("a", 7, 9), ("a", 20, 21), ("b", 1, 10)
    ]


def test_interval_coalesce_covered_time_python_replay(spark):
    """covered_micros for one user must equal a pure-python interval
    union over that user's event timestamps at the fixture itself."""
    from pyspark.sql import functions as F

    from database_extractor_spark.registry import QUERIES, _tbl

    got = {
        r["user_id"]: (r["n_intervals"], r["covered_micros"])
        for r in QUERIES["interval_coalesce"](spark, SF_DIR).collect()
    }
    uid = min(got)
    # exact integer micros via the engine (float .timestamp()*1e6 can
    # truncate 1 us on 16-digit epochs — review r13)
    ts = sorted(
        r[0]
        for r in _tbl(spark, SF_DIR, "events")
        .filter(F.col("user_id") == uid)
        .selectExpr("unix_micros(cast(ts as timestamp)) as us")
        .collect()
    )
    merged = []
    for st in ts:
        en = st + 300_000_000
        if merged and st <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], en)
        else:
            merged.append([st, en])
    assert got[uid] == (
        len(merged),
        sum(e - s for s, e in merged),
    )


def test_ngram_pmi_python_replay(spark, tmp_path):
    """PMI top-k on a crafted corpus: an always-adjacent pair must
    outscore a frequent-but-independent pair; scores replay exactly in
    integer arithmetic."""
    from collections import Counter

    from database_extractor_spark.registry import QUERIES

    # "x y" always adjacent (high PMI); "the" everywhere (low PMI)
    docs = [
        (i, "x y the w%d the x y the" % (i % 3)) for i in range(10)
    ]
    sf = str(tmp_path)
    spark.createDataFrame(docs, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(os.path.join(sf, "documents.parquet"))
    got = [tuple(r) for r in QUERIES["ngram_pmi_collocations"](spark, sf).collect()]

    uni, bi = Counter(), Counter()
    for _, text in docs:
        toks = text.lower().strip().split()
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    exp = [
        (
            w1,
            w2,
            c,
            uni[w1],
            uni[w2],
            c * 1_000_000_000 // (uni[w1] * uni[w2]),
        )
        for (w1, w2), c in bi.items()
        if c >= 5
    ]
    exp.sort(key=lambda t: (-t[5], t[0], t[1]))
    assert got == exp[:20]
    # the collocation ranks above the independent high-frequency pair
    top_pairs = [(r[0], r[1]) for r in got]
    assert top_pairs.index(("x", "y")) < top_pairs.index(("the", "x"))


def test_ngram_diversity_python_replay(spark, tmp_path):
    """distinct-trigram ratio per lang replayed in pure python: a
    looping slice scores far below an all-distinct slice."""
    from database_extractor_spark.registry import QUERIES

    docs = [
        (1, "a b " * 30, "loop"),
        (2, "a b " * 30, "loop"),
        (3, " ".join(f"w{i}" for i in range(40)), "fresh"),
        (4, "a b", "tiny"),  # < 3 tokens: slice absent from output
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string"
    ).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    got = {
        r["lang"]: (r["n_trigrams"], r["n_distinct"], r["diversity_q"])
        for r in QUERIES["ngram_diversity_profile"](spark, sf).collect()
    }
    exp = {}
    for _, text, lang in docs:
        toks = text.lower().strip().split()
        tris = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        if not tris:
            continue
        t, d = exp.get(lang, (0, set()))
        exp[lang] = (t + len(tris), (d | set(tris)) if d else set(tris))
    exp = {
        lang: (t, len(d), len(d) * 1_000_000 // t)
        for lang, (t, d) in exp.items()
    }
    assert got == exp
    assert "tiny" not in got
    assert got["loop"][2] < got["fresh"][2]


def test_tokenizer_fertility_rolls_up_bpe_encode(spark):
    """The per-lang fertility rollup must equal a python aggregation of
    the already-proven bpe_encode_tokens output joined to doc langs —
    pinning the rollup stage independently of the encode stage."""
    from collections import defaultdict

    from database_extractor_spark.registry import QUERIES, _tbl

    enc = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in QUERIES["bpe_encode_tokens"](spark, SF_DIR).collect()
    }
    meta = {
        r["doc_id"]: (r["lang"], r["n_chars"])
        for r in _tbl(spark, SF_DIR, "documents")
        .select("doc_id", "lang", "n_chars")
        .collect()
    }
    agg = defaultdict(lambda: [0, 0, 0])
    for doc_id, (w, t) in enc.items():
        lang, nc = meta[doc_id]
        agg[lang][0] += w
        agg[lang][1] += t
        agg[lang][2] += nc
    exp = [
        (
            lang,
            w,
            t,
            nc,
            t * 1_000_000 // w,
            t * 1_000_000 // nc,
        )
        for lang, (w, t, nc) in sorted(agg.items())
    ]
    got = [
        tuple(r)
        for r in QUERIES["tokenizer_fertility_eval"](spark, SF_DIR).collect()
    ]
    assert got == exp


def test_simhash_quality_eval_metrics_consistency(spark):
    """The metrics row must be internally consistent AND agree with the
    two arm operators run directly: n_true = exact-Jaccard pair count,
    n_pred = SimHash pair count, n_hit <= min of both, ratios replay."""
    from pyspark.sql import functions as F

    from database_extractor_spark.operators import dedup as D
    from database_extractor_spark.registry import QUERIES, _tbl

    row = QUERIES["simhash_quality_eval"](spark, SF_DIR).collect()[0]
    docs = _tbl(spark, SF_DIR, "documents").select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    truth = {
        (r["id_a"], r["id_b"])
        for r in D.ngram_jaccard_pairs(docs, threshold=0.7)
        .select("id_a", "id_b")
        .collect()
    }
    pred = {
        (r["id_a"], r["id_b"])
        for r in D.simhash_near_pairs(docs, max_hamming=6)
        .select("id_a", "id_b")
        .collect()
    }
    assert row["n_true"] == len(truth)
    assert row["n_pred"] == len(pred)
    assert row["n_hit"] == len(truth & pred)
    assert row["simhash_precision"] == round(
        row["n_hit"] / max(row["n_pred"], 1), 6
    )
    assert row["simhash_recall"] == round(
        row["n_hit"] / max(row["n_true"], 1), 6
    )


def test_corpus_slice_jsd_python_replay(spark, tmp_path):
    """JSD pinned on crafted slices: identical distributions score ~0,
    disjoint vocabularies score exactly ln 2, and a mixed pair replays
    the shared-term + one-sided-mass decomposition in pure python."""
    import math
    from collections import Counter

    from database_extractor_spark.registry import QUERIES

    docs = [
        (1, "a b c a b c", "s1"),
        (2, "a b c a b c", "s2"),      # identical to s1
        (3, "x y z x y z", "s3"),      # disjoint from s1/s2
        (4, "a b x y", "s4"),          # half-shared with everyone
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id bigint, text string, source string"
    ).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    got = {
        (r["s1"], r["s2"]): (r["n_shared"], r["jsd"])
        for r in QUERIES["corpus_slice_jsd"](spark, sf).collect()
    }
    assert len(got) == 6  # 4 choose 2

    dists = {}
    for _, text, src in docs:
        c = Counter(text.lower().strip().split())
        t = sum(c.values())
        d = dists.setdefault(src, Counter())
        for w, n in c.items():
            d[w] += n
    dists = {
        s: {w: n / sum(c.values()) for w, n in c.items()}
        for s, c in dists.items()
    }
    for (s1, s2), (n_shared, jsd) in got.items():
        p, q = dists[s1], dists[s2]
        shared = set(p) & set(q)
        assert n_shared == len(shared)
        ts = sum(
            0.5
            * (
                p[w] * math.log((2.0 * p[w]) / (p[w] + q[w]))
                + q[w] * math.log((2.0 * q[w]) / (p[w] + q[w]))
            )
            for w in shared
        )
        pm, qm = sum(p[w] for w in shared), sum(q[w] for w in shared)
        exp = ts + 0.5 * ((1 - pm) * math.log(2.0) + (1 - qm) * math.log(2.0))
        assert abs(jsd - exp) < 2e-6, (s1, s2, jsd, exp)
    assert got[("s1", "s2")][1] == 0.0            # identical slices
    assert got[("s1", "s3")][1] == round(math.log(2.0), 6)  # disjoint
    assert 0.0 < got[("s1", "s4")][1] < math.log(2.0)


def test_event_path_trigrams_python_replay(spark):
    """Top-20 journey trigrams must equal a pure-python replay over the
    fixture: per-user (ts, event_id)-ordered event streams, sliding
    3-windows, global counts, count-desc + lexicographic tiebreak."""
    from collections import Counter, defaultdict

    from database_extractor_spark.registry import QUERIES, _tbl

    got = [
        tuple(r)
        for r in QUERIES["event_path_trigrams"](spark, SF_DIR).collect()
    ]
    rows = (
        _tbl(spark, SF_DIR, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    c = Counter()
    for seq in by_user.values():
        seq.sort()
        types = [t for _, _, t in seq]
        for i in range(len(types) - 2):
            c[(types[i], types[i + 1], types[i + 2])] += 1
    exp = sorted(
        ((e1, e2, e3, n) for (e1, e2, e3), n in c.items()),
        key=lambda t: (-t[3], t[0], t[1], t[2]),
    )[:20]
    assert got == exp


def test_mixture_epoch_plan_python_replay_and_properties(spark):
    """Integer replay of the tau=2 planner + its two defining
    properties: shares sum to ~1e6 (within per-lang truncation) and
    epochs_q is anti-monotone in slice size (temperature flattening
    upsamples small slices)."""
    import math

    from database_extractor_spark.registry import QUERIES, _tbl
    from pyspark.sql import functions as F
    from database_extractor_spark.operators import text as T

    got = {
        r["lang"]: (r["n_tokens"], r["share_q"], r["epochs_q"])
        for r in QUERIES["mixture_epoch_plan"](spark, SF_DIR).collect()
    }
    toks = {
        r["lang"]: r["n"]
        for r in _tbl(spark, SF_DIR, "documents")
        .groupBy("lang")
        .agg(F.sum(F.size(T.tokens(F.trim(F.col("text"))))).alias("n"))
        .collect()
    }
    sq = {k: math.floor(math.sqrt(float(n)) * 1_000_000) for k, n in toks.items()}
    tot_sq, tot_tokens = sum(sq.values()), sum(toks.values())
    for lang, n in toks.items():
        share_q = sq[lang] * 1_000_000 // tot_sq
        epochs_q = ((tot_tokens * share_q) // 1_000_000) * 1_000_000 // n
        assert got[lang] == (n, share_q, epochs_q), lang
    assert 1_000_000 - len(toks) <= sum(v[1] for v in got.values()) <= 1_000_000
    ordered = sorted(got.values())  # by n_tokens asc
    epochs = [e for _, _, e in ordered]
    assert epochs == sorted(epochs, reverse=True)  # small slices upsample


def test_dedup_threshold_sweep_is_monotone_and_anchored(spark):
    """The sweep must (a) agree with the single-point LSH quality eval
    at threshold 0.7, and (b) be monotone: raising the threshold can
    only shrink n_true, n_pred, and n_hit."""
    from database_extractor_spark.registry import QUERIES

    rows = {
        r["threshold"]: r.asDict()
        for r in QUERIES["dedup_threshold_sweep"](spark, SF_DIR).collect()
    }
    assert sorted(rows) == [0.5, 0.6, 0.7, 0.8, 0.9]
    anchor = QUERIES["dedup_lsh_quality_eval"](spark, SF_DIR).collect()[0]
    at07 = rows[0.7]
    assert (at07["n_true"], at07["n_pred"], at07["n_hit"]) == (
        anchor["n_true"],
        anchor["n_pred"],
        anchor["n_hit"],
    )
    assert at07["sweep_precision"] == anchor["lsh_precision"]
    assert at07["sweep_recall"] == anchor["lsh_recall"]
    for lo, hi in zip([0.5, 0.6, 0.7, 0.8], [0.6, 0.7, 0.8, 0.9]):
        for k in ("n_true", "n_pred", "n_hit"):
            assert rows[hi][k] <= rows[lo][k], (k, lo, hi)
    assert rows[0.5]["n_true"] > 0  # the curve measured something


def test_user_rfm_segments_python_replay(spark):
    """Scores replay in pure python: per-user aggregates + numpy-free
    linear-interpolated quartiles (the p*(n-1) convention) + strict->
    bucket edges."""
    from collections import defaultdict
    from decimal import Decimal

    from database_extractor_spark.registry import QUERIES, _tbl

    got = {
        r["user_id"]: r.asDict()
        for r in QUERIES["user_rfm_segments"](spark, SF_DIR).collect()
    }
    rows = (
        _tbl(spark, SF_DIR, "events")
        .selectExpr(
            "user_id",
            "unix_micros(cast(ts as timestamp)) as us",
            "event_type",
            "value",
        )
        .collect()
    )
    agg = defaultdict(lambda: [0, 0, Decimal(0)])
    for r in rows:
        a = agg[r["user_id"]]
        a[0] = max(a[0], r["us"])
        a[1] += 1
        if r["event_type"] == "purchase":
            a[2] += Decimal(str(round(r["value"], 4)))

    def quart(vals):
        s = sorted(vals)
        out = []
        for p in (0.25, 0.5, 0.75):
            idx = p * (len(s) - 1)
            lo, frac = int(idx // 1), idx % 1
            hi = min(lo + 1, len(s) - 1)
            out.append(s[lo] + (s[hi] - s[lo]) * frac)
        return out

    rq = quart([float(a[0]) for a in agg.values()])
    fq = quart([float(a[1]) for a in agg.values()])
    mq = quart([float(a[2]) for a in agg.values()])
    for uid, (last, n, mon) in agg.items():
        g = got[uid]
        assert g["last_seen_us"] == last and g["n_events"] == n
        assert abs(g["monetary"] - float(mon)) < 1e-9
        assert g["r_score"] == 1 + sum(float(last) > e for e in rq)
        assert g["f_score"] == 1 + sum(float(n) > e for e in fq)
        assert g["m_score"] == 1 + sum(float(mon) > e for e in mq)
    scores = {(g["r_score"], g["f_score"], g["m_score"]) for g in got.values()}
    assert len(scores) > 1  # the grid actually separates users


def test_approx_topk_exact_regime_and_separated_topk(spark):
    """In the exact regime (tracker >= distinct items) the sketch's
    counts equal true group counts; with k below the distinct count but
    strictly separated frequencies, the top-k set is still the true
    top-k."""
    from pyspark.sql import functions as F

    # id%5 frequencies strictly separated: item i appears 100-?? make
    # counts distinct: value j repeated (j+1)*10 times
    rows = [(str(j),) for j in range(8) for _ in range((j + 1) * 10)]
    df = spark.createDataFrame(rows, "u string")
    got = (
        df.agg(F.expr("approx_top_k(u, 3, 100)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select("e.item", "e.count")
        .collect()
    )
    assert {(r["item"], r["count"]) for r in got} == {
        ("7", 80),
        ("6", 70),
        ("5", 60),
    }


def test_sql_parameterized_binds_like_inlined_literals(spark):
    """The parameterized plan must be the same Catalyst plan as the
    inlined-literal form: the value filter reaches the scan as a pushed
    filter and results match the inlined query."""
    from database_extractor_spark.registry import QUERIES

    df = QUERIES["sql_parameterized"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(value,50.0)" in plan, plan
    inlined = spark.sql(
        """
        select event_type, cast(count(*) as bigint) as n,
               cast(sum(cast(value as decimal(18,4))) as double) as total
        from events_param_v
        where value >= 50.0 and event_type in ('click', 'purchase')
        group by event_type order by event_type
        """
    )
    assert [tuple(r) for r in df.collect()] == [
        tuple(r) for r in inlined.collect()
    ]


def test_sql_pivot_clause_equals_dataframe_pivot(spark):
    """The SQL PIVOT clause must produce exactly the DataFrame-API
    pivot of the same input (same explicit value list, same decimal
    sums)."""
    from pyspark.sql import functions as F

    from database_extractor_spark.registry import QUERIES, _tbl

    got = [tuple(r) for r in QUERIES["sql_pivot_clause"](spark, SF_DIR).collect()]
    api = (
        _tbl(spark, SF_DIR, "events")
        .select(
            F.to_date("ts").alias("day"),
            "event_type",
            F.col("value").cast("decimal(18,4)").alias("v"),
        )
        .filter(F.col("event_type").isin("click", "view"))
        .groupBy("day")
        .pivot("event_type", ["click", "view"])
        .agg(F.sum("v").cast("double"))
        .orderBy("day")
    )
    assert got == [tuple(r) for r in api.collect()]


def test_streaming_bitmap_distinct_equals_batch_twin(spark):
    """The streaming bitmap lane must equal the batch twin row-for-row
    (stream/batch interchangeability), and the streaming STATE must be
    the per-bucket bitmap shape: state rows bounded by (groups x
    buckets), not by distinct ids."""
    from database_extractor_spark.registry import QUERIES

    s = [
        tuple(r)
        for r in QUERIES["streaming_bitmap_distinct"](spark, SF_DIR).collect()
    ]
    b = [
        tuple(r)
        for r in QUERIES["bitmap_exact_distinct"](spark, SF_DIR).collect()
    ]
    assert s == b and len(s) > 0


def test_pack_efficiency_python_replay(spark):
    """Per-shard bin statistics replayed in pure python off the same
    cumsum-binning rule pack_sequences uses."""
    from collections import defaultdict

    from database_extractor_spark.registry import QUERIES, _tbl

    got = {
        r["shard"]: (r["n_bins"], r["n_tokens"], r["max_fill"], r["util_q"])
        for r in QUERIES["pack_efficiency_eval"](spark, SF_DIR).collect()
    }
    rows = sorted(
        (r["doc_id"], len(r["text"].strip().split()))
        for r in _tbl(spark, SF_DIR, "documents")
        .selectExpr("doc_id", "text")
        .collect()
    )
    bins = defaultdict(int)
    cum = defaultdict(int)
    for doc_id, n in rows:
        shard = doc_id % 16
        start = cum[shard]
        cum[shard] += n
        bins[(shard, start // 512)] += n
    per_shard = defaultdict(list)
    for (shard, _), fill in bins.items():
        per_shard[shard].append(fill)
    exp = {
        s: (
            len(f),
            sum(f),
            max(f),
            sum(f) * 1_000_000 // (len(f) * 512),
        )
        for s, f in per_shard.items()
    }
    assert got == exp


def test_ngram_novelty_boundaries(spark, tmp_path):
    """Novelty pinned at both extremes: an all-new batch scores exactly
    1e6, an all-seen batch scores 0."""
    from database_extractor_spark.registry import QUERIES

    def run(batch_text):
        docs = [(i, "a b c d e", "en") for i in range(3)] + [
            (250 + i, batch_text, "en") for i in range(2)
        ]
        sf = str(tmp_path / batch_text.replace(" ", "_"))
        spark.createDataFrame(
            docs, "doc_id bigint, text string, lang string"
        ).write.mode("overwrite").parquet(
            os.path.join(sf, "documents.parquet")
        )
        return QUERIES["ngram_novelty_ratio"](spark, sf).collect()[0]

    allnew = run("x y z w")
    assert allnew["n_new"] == allnew["n_batch_distinct"] > 0
    assert allnew["novelty_q"] == 1_000_000
    seen = run("a b c d e")
    assert seen["n_new"] == 0 and seen["novelty_q"] == 0


def test_csv_corrupt_records_quarantine_counts(spark):
    """The PERMISSIVE read must quarantine exactly the malformed rows
    (every 13th after 0) and the parsed-value sum must exclude them —
    replayed in python from the same generator."""
    from database_extractor_spark.registry import QUERIES

    row = QUERIES["csv_corrupt_records"](spark, SF_DIR).collect()[0]
    bad = [i for i in range(200) if i % 13 == 0 and i > 0]
    good = [i for i in range(200) if not (i % 13 == 0 and i > 0)]
    assert row["n_corrupt"] == len(bad)
    assert row["n_good"] == len(good)
    assert row["sum_v"] == sum(2 * i for i in good)


def test_attribution_last_touch_python_replay(spark):
    """Channel attribution replayed in pure python over the fixture:
    per user, sort by (us, event_id), carry the last click/view, credit
    each purchase."""
    from collections import defaultdict
    from decimal import Decimal

    from database_extractor_spark.registry import QUERIES, _tbl

    got = {
        r["channel"]: (r["n_purchases"], r["revenue"])
        for r in QUERIES["attribution_last_touch"](spark, SF_DIR).collect()
    }
    rows = (
        _tbl(spark, SF_DIR, "events")
        .selectExpr(
            "user_id",
            "unix_micros(cast(ts as timestamp)) as us",
            "event_id",
            "event_type",
            "value",
        )
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(
            (r["us"], r["event_id"], r["event_type"], r["value"])
        )
    agg = defaultdict(lambda: [0, Decimal(0)])
    for seq in by_user.values():
        seq.sort()
        carry = None
        for _, _, etype, value in seq:
            if etype == "purchase":
                a = agg[carry or "none"]
                a[0] += 1
                a[1] += Decimal(str(round(value, 4)))
            if etype in ("click", "view"):
                carry = etype
    exp = {k: (n, float(v)) for k, (n, v) in agg.items()}
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0]
        assert abs(got[k][1] - exp[k][1]) < 1e-9
    assert set(got) <= {"click", "view", "none"}


def test_activity_heatmap_iso_dow_alignment(spark):
    """dow_iso must be the ISO convention (1=Monday..7=Sunday) on known
    dates, and the cells must sum to the full event count."""
    from pyspark.sql import functions as F

    from database_extractor_spark.registry import QUERIES, _tbl

    rows = QUERIES["activity_heatmap"](spark, SF_DIR).collect()
    assert {r["dow_iso"] for r in rows} <= set(range(1, 8))
    assert sum(r["n"] for r in rows) == _tbl(spark, SF_DIR, "events").count()
    # 2024-01-01 was a Monday: every event that day must land on dow 1
    jan1 = (
        _tbl(spark, SF_DIR, "events")
        .filter(F.to_date("ts") == "2024-01-01")
        .selectExpr("extract(DAYOFWEEK_ISO FROM ts) as d")
        .distinct()
        .collect()
    )
    assert [r["d"] for r in jan1] == [1]


def test_event_path_markov_rows_are_proper_distribution(spark):
    """Transition micros per source state must sum to ~1e6 (within
    per-row truncation), every transition count must equal the trigram
    front's pair counts, and probabilities replay in python."""
    from collections import Counter, defaultdict

    from database_extractor_spark.registry import QUERIES, _tbl

    got = {
        (r["e1"], r["e2"]): (r["n"], r["p_q"])
        for r in QUERIES["event_path_markov"](spark, SF_DIR).collect()
    }
    rows = (
        _tbl(spark, SF_DIR, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    c = Counter()
    for seq in by_user.values():
        seq.sort()
        types = [t for _, _, t in seq]
        c.update(zip(types, types[1:]))
    tot = defaultdict(int)
    for (e1, _), n in c.items():
        tot[e1] += n
    exp = {
        (e1, e2): (n, n * 1_000_000 // tot[e1]) for (e1, e2), n in c.items()
    }
    assert got == exp
    by_src = defaultdict(int)
    for (e1, _), (_, p_q) in got.items():
        by_src[e1] += p_q
    for e1, s in by_src.items():
        n_out = sum(1 for (a, _) in got if a == e1)
        assert 1_000_000 - n_out <= s <= 1_000_000


def test_funnel_latency_percentiles_python_replay(spark):
    """Latency stats replayed in python with the p*(n-1) interpolation
    convention."""
    from collections import defaultdict

    from database_extractor_spark.registry import QUERIES, _tbl

    row = QUERIES["funnel_latency_percentiles"](spark, SF_DIR).collect()[0]
    rows = (
        _tbl(spark, SF_DIR, "events")
        .selectExpr(
            "user_id",
            "unix_micros(cast(ts as timestamp)) as us",
            "event_type",
        )
        .collect()
    )
    first = defaultdict(lambda: [None, None])
    for r in rows:
        slot = first[r["user_id"]]
        if r["event_type"] == "view":
            slot[0] = r["us"] if slot[0] is None else min(slot[0], r["us"])
        if r["event_type"] == "purchase":
            slot[1] = r["us"] if slot[1] is None else min(slot[1], r["us"])
    lat = sorted(
        p - v for v, p in first.values()
        if v is not None and p is not None and p >= v
    )

    def q(p):
        idx = p * (len(lat) - 1)
        lo, frac = int(idx // 1), idx % 1
        hi = min(lo + 1, len(lat) - 1)
        return float(lat[lo]) + (float(lat[hi]) - float(lat[lo])) * frac

    assert row["n_converted"] == len(lat) > 0
    assert row["max_us"] == lat[-1]
    assert abs(row["p50_us"] - q(0.5)) < 1e-6
    assert abs(row["p90_us"] - q(0.9)) < 1e-6


def test_dup_cluster_histogram_consistency_with_clusters(spark):
    """The histogram must be exactly the size distribution of
    dedup_clusters' components (multi-doc clusters only) and its doc
    total must equal the clustered-doc count."""
    from collections import Counter

    from database_extractor_spark.registry import QUERIES

    cl = QUERIES["dedup_clusters"](spark, SF_DIR).collect()
    sizes = Counter()
    for r in cl:
        sizes[r["cluster_id"]] += 1
    hist = Counter(sizes.values())
    got = {
        r["size"]: (r["n_clusters"], r["n_docs"])
        for r in QUERIES["dup_cluster_histogram"](spark, SF_DIR).collect()
    }
    assert got == {s: (n, s * n) for s, n in hist.items()}
    assert sum(d for _, d in got.values()) == len(cl)


def test_per_source_quality_report_rolls_up_gopher(spark):
    """The scorecard must equal a python rollup of the already-proven
    gopher gate output joined to sources."""
    from collections import defaultdict

    from database_extractor_spark.registry import QUERIES, _tbl

    gate = {
        r["doc_id"]: (r["n_words"], r["keep"])
        for r in QUERIES["gopher_quality_filter"](spark, SF_DIR).collect()
    }
    src = {
        r["doc_id"]: r["source"]
        for r in _tbl(spark, SF_DIR, "documents")
        .select("doc_id", "source")
        .collect()
    }
    agg = defaultdict(lambda: [0, 0, 0])
    for doc_id, (w, keep) in gate.items():
        a = agg[src[doc_id]]
        a[0] += 1
        a[1] += int(keep)
        a[2] += w
    exp = [
        (
            s,
            n,
            k,
            k * 1_000_000 // n,
            w,
            w * 1_000_000 // n,
        )
        for s, (n, k, w) in sorted(agg.items())
    ]
    got = [
        tuple(r)
        for r in QUERIES["per_source_quality_report"](spark, SF_DIR).collect()
    ]
    assert got == exp


def test_sql_join_hints_forces_broadcast_without_stats(spark):
    """With size-based broadcasting disabled, the BROADCAST hint must
    still produce a BroadcastHashJoin (visible in the checkpointed
    entry's executed plan lineage is cut — so re-derive the hinted plan
    inside the same conf window and pin it there), and the entry's
    results must equal the plain unhinted join."""
    from pyspark.sql import functions as F

    from database_extractor_spark.registry import QUERIES, _tbl

    got = [tuple(r) for r in QUERIES["sql_join_hints"](spark, SF_DIR).collect()]
    plain = (
        _tbl(spark, SF_DIR, "customer")
        .join(
            _tbl(spark, SF_DIR, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_acctbal"),
        )
        .orderBy("n_name")
    )
    assert got == [tuple(r) for r in plain.collect()]
    # plan pin: rebuild the hinted query inside the same conf window
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        _tbl(spark, SF_DIR, "customer").createOrReplaceTempView(
            "customer_hint_v"
        )
        _tbl(spark, SF_DIR, "nation").createOrReplaceTempView("nation_hint_v")
        hinted = spark.sql(
            "select /*+ BROADCAST(n) */ n.n_name, count(*) as n "
            "from customer_hint_v c join nation_hint_v n "
            "on c.c_nationkey = n.n_nationkey group by n.n_name"
        )
        unhinted = spark.sql(
            "select n.n_name, count(*) as n "
            "from customer_hint_v c join nation_hint_v n "
            "on c.c_nationkey = n.n_nationkey group by n.n_name"
        )
        hp = hinted._jdf.queryExecution().executedPlan().toString()
        up = unhinted._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in hp, hp
        assert "BroadcastHashJoin" not in up, up  # threshold off: no auto
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_lang_id_confusion_sums_and_diagonal(spark):
    """Matrix cells must sum to the corpus size; every fixture lang must
    appear as a row label; the diagonal must replay text_lang_id joined
    to labels in python."""
    from collections import Counter

    from database_extractor_spark.registry import QUERIES, _tbl

    rows = QUERIES["lang_id_confusion_eval"](spark, SF_DIR).collect()
    docs = {
        r["doc_id"]: r["lang"]
        for r in _tbl(spark, SF_DIR, "documents")
        .select("doc_id", "lang")
        .collect()
    }
    assert sum(r["n"] for r in rows) == len(docs)
    pred = {
        r["doc_id"]: r["lang_pred"]
        for r in QUERIES["text_lang_id"](spark, SF_DIR).collect()
    }
    exp = Counter((docs[d], p) for d, p in pred.items())
    assert {(r["lang"], r["lang_pred"]): r["n"] for r in rows} == dict(exp)


def test_quality_gate_agreement_cells_partition_corpus(spark):
    """The four cells must partition the corpus and the agreement micro
    ratio must replay exactly."""
    from database_extractor_spark.registry import QUERIES

    r = QUERIES["quality_gate_agreement"](spark, SF_DIR).collect()[0]
    total = r["n_both"] + r["n_cls_only"] + r["n_gopher_only"] + r["n_neither"]
    assert total == r["n_docs"] > 0
    assert r["agreement_q"] == (
        (r["n_both"] + r["n_neither"]) * 1_000_000 // r["n_docs"]
    )


def test_higher_order_funcs_python_replay(spark):
    """Lambda-surface results replayed in python with the same left-fold
    order."""
    from database_extractor_spark.registry import QUERIES, _tbl

    got = {
        r["vec_id"]: (r["n_pos"], r["exists_gt2"], r["selfdot"], r["pal_dot"])
        for r in QUERIES["higher_order_funcs"](spark, SF_DIR).collect()
    }
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in _tbl(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    }
    for vid, v in vecs.items():
        selfdot = 0.0
        for x in v:
            selfdot += x * x
        pal = 0.0
        for x, y in zip(v, v[::-1]):
            pal += x * y
        exp = (
            sum(1 for x in v if x > 0),
            any(x > 2.0 for x in v),
            round(selfdot, 6),
            round(pal, 6),
        )
        assert got[vid] == exp, (vid, got[vid], exp)


def test_json_corrupt_records_quarantine_counts(spark):
    """The PERMISSIVE JSON read must quarantine exactly the truncated
    lines (every 11th after 0) and the parsed sum must exclude them."""
    from database_extractor_spark.registry import QUERIES

    row = QUERIES["json_corrupt_records"](spark, SF_DIR).collect()[0]
    bad = [i for i in range(150) if i % 11 == 0 and i > 0]
    good = [i for i in range(150) if not (i % 11 == 0 and i > 0)]
    assert row["n_corrupt"] == len(bad)
    assert row["n_good"] == len(good)
    assert row["sum_v"] == sum(3 * i for i in good)


def test_eval_split_decontaminated_is_subset_and_leak_free(spark):
    """The clean test set must be a subset of the md5 test bucket, and
    NO surviving test doc may share >= 3 distinct shingle hashes with
    any train doc (python replay of the contamination rule)."""
    import hashlib
    from collections import defaultdict

    from database_extractor_spark.registry import QUERIES, _tbl

    clean = {
        r["doc_id"]
        for r in QUERIES["eval_split_decontaminated"](spark, SF_DIR).collect()
    }
    docs = {
        r["doc_id"]: r["text"]
        for r in _tbl(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
    }

    def bucket(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100

    def sh(text):
        ws = text.strip().split()
        return {
            " ".join(ws[i : i + 3])
            for i in range(max(len(ws) - 2, 1))
        } if ws else set()

    test_ids = {d for d in docs if bucket(d) >= 90}
    assert clean <= test_ids
    train_sh = defaultdict(set)
    for d, t in docs.items():
        if bucket(d) < 80:
            train_sh[d] = sh(t)
    for d in test_ids:
        s = sh(docs[d])
        contaminated = any(len(s & ts) >= 3 for ts in train_sh.values())
        assert (d not in clean) == contaminated, d


def test_embedding_norm_outliers_band_replay(spark):
    """Band edges replay via the p*(n-1) percentile convention over
    python-computed norms; flags match the strict-outside rule."""
    import math

    from database_extractor_spark.registry import QUERIES, _tbl

    got = {
        r["vec_id"]: (r["l2"], r["is_outlier"])
        for r in QUERIES["embedding_norm_outliers"](spark, SF_DIR).collect()
    }
    norms = {}
    for r in _tbl(spark, SF_DIR, "embeddings").select("vec_id", "embedding").collect():
        dot = 0.0
        for x in r["embedding"]:
            dot += float(x) * float(x)
        norms[r["vec_id"]] = math.sqrt(dot)
    s = sorted(norms.values())

    def q(p):
        idx = p * (len(s) - 1)
        lo, frac = int(idx // 1), idx % 1
        hi = min(lo + 1, len(s) - 1)
        return s[lo] + (s[hi] - s[lo]) * frac

    lo, hi = q(0.01), q(0.99)
    n_out = 0
    for vid, l2 in norms.items():
        exp_flag = l2 < lo or l2 > hi
        assert got[vid] == (round(l2, 6), exp_flag), vid
        n_out += exp_flag
    assert 0 < n_out < len(norms)


def test_sql_identifier_clause_matches_static_query(spark):
    """IDENTIFIER-bound table name must resolve to the same plan/result
    as the static query."""
    from database_extractor_spark.registry import QUERIES, _tbl

    got = [
        tuple(r)
        for r in QUERIES["sql_identifier_clause"](spark, SF_DIR).collect()
    ]
    static = (
        _tbl(spark, SF_DIR, "events")
        .groupBy("event_type")
        .count()
        .withColumnRenamed("count", "n")
        .orderBy("event_type")
    )
    assert got == [tuple(r) for r in static.collect()]


def test_tpch_refresh_functions_set_algebra(spark):
    """The refreshed aggregate must equal a python replay of delete +
    insert set algebra over the snapshot, and the batches must be
    non-trivial (both RF1 and RF2 did work)."""
    from collections import defaultdict
    from decimal import Decimal

    from database_extractor_spark.registry import QUERIES, _tbl

    got = {
        r["o_orderpriority"]: (r["n_orders"], r["total_price"])
        for r in QUERIES["tpch_refresh_functions"](spark, SF_DIR).collect()
    }
    rows = (
        _tbl(spark, SF_DIR, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .collect()
    )
    agg = defaultdict(lambda: [0, Decimal(0)])
    n_del = n_ins = 0
    for r in rows:
        k, p, v = r["o_orderkey"], r["o_orderpriority"], r["o_totalprice"]
        if k % 97 != 0:
            agg[p][0] += 1
            agg[p][1] += Decimal(str(round(v, 4)))
        else:
            n_del += 1
        if k % 101 == 0:
            agg[p][0] += 1
            agg[p][1] += Decimal(str(round(v, 4)))
            n_ins += 1
    assert n_del > 0 and n_ins > 0
    assert set(got) == set(agg)
    for p, (n, total) in agg.items():
        assert got[p][0] == n
        assert abs(got[p][1] - float(total)) < 1e-9


def test_order_to_ship_latency_python_replay(spark):
    """Latency stats per return flag replayed in python with the pinned
    percentile convention."""
    from collections import defaultdict

    from database_extractor_spark.registry import QUERIES, _tbl
    from pyspark.sql import functions as F

    got = {
        r["l_returnflag"]: (
            r["n_lines"],
            r["p50_days"],
            r["p90_days"],
            r["max_days"],
        )
        for r in QUERIES["order_to_ship_latency"](spark, SF_DIR).collect()
    }
    li = _tbl(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_returnflag", F.to_date("l_shipdate").alias("s")
    )
    o = _tbl(spark, SF_DIR, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("d")
    )
    rows = li.join(o, li.l_orderkey == o.o_orderkey).collect()
    lats = defaultdict(list)
    for r in rows:
        lats[r["l_returnflag"]].append((r["s"] - r["d"]).days)

    def q(vals, p):
        s = sorted(float(v) for v in vals)
        idx = p * (len(s) - 1)
        lo, frac = int(idx // 1), idx % 1
        hi = min(lo + 1, len(s) - 1)
        return s[lo] + (s[hi] - s[lo]) * frac

    for flag, vals in lats.items():
        g = got[flag]
        assert g[0] == len(vals)
        assert abs(g[1] - q(vals, 0.5)) < 1e-9
        assert abs(g[2] - q(vals, 0.9)) < 1e-9
        assert g[3] == max(vals)
    assert set(got) == set(lats)
