"""Round-9 regression tests: the four r8 ADVICE fixes.

1. jsonl_sink commit() sweeps only ITS OWN job's staged files.
2. _dpp_fact_path keys the shared lake on fixture CONTENT, not path only.
3. Lloyd means are integer-quantized (order-independent, engine-exact).
4. exact_substring_spans caps total gram occurrences, not just df.
"""
import os
import shutil

import pytest

from tests.conftest import SF_DIR


# ---------------------------------------------------------------------------
# 1. job-scoped staged-file sweep
# ---------------------------------------------------------------------------

def test_jsonl_sink_commit_spares_other_jobs_staged_files(tmp_path):
    """Two writers (= two concurrent jobs) share a sink directory: job A's
    commit must sweep A's own orphaned staged files but NOT job B's
    staged-but-uncommitted output (ADVICE r8: the unscoped sweep made the
    first committer delete the second job's files)."""
    from database_extractor_spark.sources.custom import JsonlSinkWriter

    out = str(tmp_path / "sink")
    os.makedirs(out)
    a = JsonlSinkWriter({"path": out})
    b = JsonlSinkWriter({"path": out})
    assert a.job_id != b.job_id

    a_orphan = os.path.join(out, f"_staged-{a.job_id}-deadtask.jsonl")
    b_live = os.path.join(out, f"_staged-{b.job_id}-inflight.jsonl")
    for p in (a_orphan, b_live):
        with open(p, "w") as f:
            f.write('{"x": 1}\n')

    a.commit([])  # no messages to promote; only the sweep runs

    assert not os.path.exists(a_orphan), "own orphan must be swept"
    assert os.path.exists(b_live), "other job's staged file must survive"

    # and job B can still commit its staged file afterwards
    class Msg:
        tmp_path = b_live

    b.commit([Msg()])
    assert not os.path.exists(b_live)
    assert os.path.exists(
        os.path.join(out, f"part-{b.job_id}-inflight.jsonl")
    )


# ---------------------------------------------------------------------------
# 2. DPP lake content fingerprint
# ---------------------------------------------------------------------------

def test_dpp_lake_path_tracks_fixture_content(spark, tmp_path):
    """The lake cache is keyed on fixture CONTENT (size + parquet footer
    hash, round 10), not mtime: a data change must resolve to a NEW lake
    directory, while a bare mtime bump (tar/rsync -t restores, build
    caches touching files) is identical content and must REUSE the
    existing lake — that's the intended cache hit, not staleness."""
    import pyarrow.parquet as pq

    from database_extractor_spark.registry import _dpp_fact_path

    fx = tmp_path / "sf"
    fx.mkdir()
    shutil.copy(os.path.join(SF_DIR, "lineitem.parquet"), fx / "lineitem.parquet")

    p1 = _dpp_fact_path(spark, str(fx))
    assert os.path.exists(os.path.join(p1, "_SUCCESS"))

    # mtime-only bump: same bytes => same fingerprint => SAME lake
    st = os.stat(fx / "lineitem.parquet")
    os.utime(fx / "lineitem.parquet", ns=(st.st_atime_ns, st.st_mtime_ns + 10**9))
    assert _dpp_fact_path(spark, str(fx)) == p1, (
        "identical content must reuse the cached lake regardless of mtime"
    )

    # real regeneration: drop one row and rewrite — footer (row counts,
    # stats, offsets) changes => NEW lake
    tbl = pq.read_table(fx / "lineitem.parquet")
    pq.write_table(tbl.slice(0, tbl.num_rows - 1), fx / "lineitem.parquet")
    p2 = _dpp_fact_path(spark, str(fx))
    assert p1 != p2, "content-fingerprinted lake must not reuse stale layout"
    for p in (p1, p2):
        shutil.rmtree(os.path.dirname(p), ignore_errors=True)


# ---------------------------------------------------------------------------
# 3. canonical (order-independent) Lloyd means
# ---------------------------------------------------------------------------

def test_canonical_mean_is_exact_and_partition_invariant(spark):
    """_canonical_mean must equal the exact rational mean of the quantized
    values (computable in pure Python) regardless of partitioning — the
    property plain avg() lacks under distributed summation order."""
    import pyspark.sql.functions as F

    from database_extractor_spark.operators.similarity import _canonical_mean

    # adversarial values: many near-representability-edge doubles whose
    # naive float sum depends on order at ~1e-13
    vals = [0.1 + i * 1e-7 + (1e-13 if i % 3 else -1e-13) for i in range(999)]
    expect = round(sum(int((v * 1e9 + 0.5) // 1) for v in vals) / len(vals) / 1e9, 6)
    for parts in (1, 7, 32):
        df = spark.createDataFrame([(v,) for v in vals], "v double").repartition(parts)
        got = df.agg(_canonical_mean(F.col("v"), 6).alias("m")).collect()[0]["m"]
        assert got == expect, f"parts={parts}: {got} != {expect}"


# ---------------------------------------------------------------------------
# 4. exact-substring occurrence cap
# ---------------------------------------------------------------------------

def test_exact_substring_occ_cap_bounds_repeated_token_blowup(spark):
    """A gram repeated k times in each of two documents has df=2 (passes
    the df cap) but k^2 inverted-index hit rows; the occurrence cap must
    exclude it (ADVICE r8). The unique shared sentence must still match."""
    from database_extractor_spark.operators.dedup import exact_substring_spans

    boiler = " ".join(["spam ham eggs bacon toast"] * 100)  # each rotation gram ~200 occ
    quote = "the quick brown fox jumps over the lazy dog today"
    docs = [
        (1, f"{boiler} {quote}"),
        (2, f"{quote} {boiler}"),
        (3, "completely unrelated filler text with no duplicate runs at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")

    capped = exact_substring_spans(df, gram=5, min_tokens=8, df_cap=20).collect()
    uncapped = exact_substring_spans(
        df, gram=5, min_tokens=8, df_cap=20, occ_cap=10**9
    ).collect()

    def span_tokens(rows):
        return sum(r["n_tokens"] for r in rows)

    # the quote region must be found either way...
    assert any(r["n_tokens"] >= 8 for r in capped)
    # ...but the capped run must not report the degenerate boilerplate
    # region, which the uncapped run does
    assert span_tokens(uncapped) > span_tokens(capped)
    assert all(r["n_tokens"] <= 2 * len(quote.split()) for r in capped)


# ---------------------------------------------------------------------------
# round-9 entries
# ---------------------------------------------------------------------------

def test_runtime_bloom_join_plan(spark):
    """Inside the forced-threshold conf window, the compiled plan must
    carry the runtime bloom filter: a bloom_filter_agg on the dim side
    and a might_contain predicate pushed into the fact scan side of the
    shuffle join."""
    import database_extractor_spark.registry as R

    plan = R._with_bloom_confs(
        spark,
        lambda: R._runtime_bloom_plan(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString(),
    )
    assert "bloom_filter_agg" in plan, f"no bloom filter built:\n{plan[:2000]}"
    assert "might_contain" in plan, "bloom filter not applied to fact side"
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # and the conf window must restore: the session default is cluster-sized
    assert (
        spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )
        != "0"
    )


def test_khop_distances_are_minimal_and_deduped(spark):
    """Each (entity, id) appears ONCE with its minimum hop distance, and
    every claimed distance is consistent with the edge set computed
    independently in Python."""
    import duckdb

    import __spark_entry__ as E

    rows = E.queries()["graph_khop_reachability"](spark, SF_DIR).collect()
    seen = [(r["entity"], r["id"]) for r in rows]
    assert len(seen) == len(set(seen)), "duplicate node rows"

    edges = duckdb.sql(
        f"""select distinct o.o_custkey, l.l_suppkey
        from '{SF_DIR}/orders.parquet' o
        join '{SF_DIR}/lineitem.parquet' l on l.l_orderkey = o.o_orderkey"""
    ).fetchall()
    suppliers_of = {}
    customers_of = {}
    for c, s in edges:
        suppliers_of.setdefault(c, set()).add(s)
        customers_of.setdefault(s, set()).add(c)
    h1 = suppliers_of.get(1, set())
    h2 = {c for s in h1 for c in customers_of[s]} - {1}
    h3 = {s for c in h2 for s in suppliers_of[c]} - h1
    expect = (
        {("customer", 1, 0)}
        | {("supplier", s, 1) for s in h1}
        | {("customer", c, 2) for c in h2}
        | {("supplier", s, 3) for s in h3}
    )
    assert {(r["entity"], r["id"], r["dist"]) for r in rows} == expect


def test_string_agg_ordered_is_shuffle_order_invariant(spark):
    """The within-group ordered concatenation must be identical however
    the input is partitioned — THE property unordered collect_list-based
    concat lacks."""
    import __spark_entry__ as E

    base = {
        r["user_id"]: (r["journey"], r["n_events"])
        for r in E.queries()["string_agg_ordered"](spark, SF_DIR).collect()
    }
    # rebuild over a deliberately scrambled partitioning of the same data
    import pyspark.sql.functions as F

    from database_extractor_spark.sources import read_source
    import os as _os

    ev = read_source(spark, _os.path.join(SF_DIR, "events.parquet"))
    ev.repartition(13, F.col("event_type")).createOrReplaceTempView("events")
    again = {
        r["user_id"]: (r["journey"], r["n_events"])
        for r in spark.sql(
            """
            with firstn as (
                select user_id, event_type, ts, event_id,
                       row_number() over (partition by user_id
                                          order by ts, event_id) as rn
                from events
            )
            select user_id,
                   listagg(event_type, '>')
                       within group (order by ts, event_id) as journey,
                   cast(count(*) as bigint) as n_events
            from firstn where rn <= 20
            group by user_id
            """
        ).collect()
    }
    assert base == again
    assert all(n <= 20 for _, n in base.values())


def test_arrow_normalize_matches_numpy_reference(spark):
    """mapInArrow output must equal a straight numpy recomputation from
    the parquet (independent of Arrow batch slicing), and normalized
    heads must be consistent with l2: renormalizing them changes nothing."""
    import numpy as np
    import pyarrow.parquet as pq

    import __spark_entry__ as E

    got = {
        r["vec_id"]: (r["l2"], r["v0"], r["v1"], r["v2"])
        for r in E.queries()["arrow_batch_normalize"](spark, SF_DIR).collect()
    }
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    x = np.asarray(t.column("embedding").combine_chunks().flatten(), dtype=np.float64)
    x = x.reshape(len(ids), -1)
    q = np.floor(x * 1e6 + 0.5)
    l2 = np.sqrt((q * q).sum(axis=1)) / 1e6
    for i, vid in enumerate(ids):
        el2 = float(np.floor(l2[i] * 1e6 + 0.5) / 1e6)
        ev = tuple(float(np.floor(x[i, j] / l2[i] * 1e6 + 0.5) / 1e6) for j in range(3))
        assert got[vid] == (el2, *ev), f"vec {vid}: {got[vid]} != {(el2, *ev)}"
    assert abs(np.mean([v[0] for v in got.values()]) - 1.0) < 0.01  # unit-norm fixture


def test_lateral_topk_decorrelates_to_hash_join(spark):
    """Catalyst must compile the correlated LATERAL LIMIT subquery into a
    partitioned rank + equi-join — NOT a per-outer-row nested loop."""
    import __spark_entry__ as E

    df = E.queries()["lateral_topk_per_key"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan
    rows = df.collect()
    # every nation contributes at most 2 rows, ordered desc within nation
    from collections import Counter

    per = Counter(r["n_name"] for r in rows)
    assert max(per.values()) <= 2


def test_ccnet_buckets_are_balanced_within_language(spark):
    """ntile(3) guarantees per-language tercile sizes differing by at
    most one, and bucket assignment must follow the score ordering
    (every head doc scores >= every tail doc of the same language)."""
    from collections import defaultdict

    import __spark_entry__ as E

    rows = E.queries()["ccnet_perplexity_buckets"](spark, SF_DIR).collect()
    by_lang = defaultdict(lambda: defaultdict(list))
    for r in rows:
        by_lang[r["lang"]][r["bucket"]].append(r["avg_logprob"])
    for lang, buckets in by_lang.items():
        sizes = [len(buckets.get(b, [])) for b in ("head", "middle", "tail")]
        assert max(sizes) - min(sizes) <= 1, f"{lang}: unbalanced {sizes}"
        if buckets.get("head") and buckets.get("tail"):
            assert min(buckets["head"]) >= max(buckets["tail"]), lang


def test_url_domain_cap_enforces_per_host_quota(spark):
    """No host may exceed 5 documents, parsed fields must round-trip the
    synthesized URL structure, and the kept set must be the md5-rank
    prefix (deterministic across runs)."""
    from collections import Counter

    import __spark_entry__ as E

    rows = E.queries()["url_domain_cap"](spark, SF_DIR).collect()
    per_host = Counter(r["host"] for r in rows)
    assert max(per_host.values()) <= 5
    for r in rows:
        assert r["host"].endswith(".example.com")
        assert r["path"].endswith(f"/doc-{r['doc_id']}")
        assert r["ref"] == f"r{r['doc_id'] % 7}"
    again = E.queries()["url_domain_cap"](spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_cogroup_asof_matches_window_computation(spark):
    """The cogrouped-pandas merge_asof must agree with an independent
    Python recomputation over the raw events, including NULL for
    purchases with no prior signup."""
    import bisect

    import duckdb

    import __spark_entry__ as E

    df = E.queries()["cogroup_pandas_asof"](spark, SF_DIR)
    # count() runs the aggressive column-pruning path that dropped the
    # right child's user_id when both cogroup sides shared one read's
    # lineage (the independent-reads fix in the entry); keep exercising it
    assert df.count() > 0
    got = {r["event_id"]: r["micros_since_signup"] for r in df.collect()}
    ev = duckdb.sql(
        f"""select user_id, event_id, epoch_us(ts) as us, event_type
        from '{SF_DIR}/events.parquet'
        where event_type in ('purchase', 'signup')"""
    ).fetchall()
    signups = {}
    for u, _, us, t in ev:
        if t == "signup":
            signups.setdefault(u, []).append(us)
    for s in signups.values():
        s.sort()
    n_checked = 0
    for u, eid, us, t in ev:
        if t != "purchase":
            continue
        s = signups.get(u, [])
        i = bisect.bisect_right(s, us)
        expect = (us - s[i - 1]) if i else None
        assert got[eid] == expect, (eid, got[eid], expect)
        n_checked += 1
    assert n_checked == len(got) > 0


def test_pivot_multi_agg_column_crossproduct(spark):
    """The listed-value multi-agg pivot must produce the value x agg
    column cross-product with zero-filled absent combinations, matching
    per-user recomputation from the raw events."""
    import duckdb

    import __spark_entry__ as E

    df = E.queries()["pivot_multi_agg"](spark, SF_DIR)
    assert df.columns == [
        "user_id", "purchase_n", "purchase_millis", "error_n", "error_millis",
    ]
    got = {r["user_id"]: (r["purchase_n"], r["error_n"]) for r in df.collect()}
    raw = dict(
        duckdb.sql(
            f"""select user_id, [count(*) filter (where event_type='purchase'),
                                 count(*) filter (where event_type='error')]
            from '{SF_DIR}/events.parquet' group by user_id"""
        ).fetchall()
    )
    assert got == {u: tuple(v) for u, v in raw.items()}


def test_stream_sink_batch_scoped_commit_and_exactly_once(spark, tmp_path):
    """The streaming writer must promote staged files under batch-scoped
    names (part-b{batchId}-...), and a second availableNow run against
    the same checkpoint must write NOTHING new (source offsets are
    committed — exactly-once through the custom Python sink)."""
    import glob

    from pyspark.sql import functions as F

    from database_extractor_spark.sources.custom import register_jsonl_sink
    from database_extractor_spark.streaming import stream_source

    register_jsonl_sink(spark)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run():
        stream = stream_source(spark, os.path.join(SF_DIR, "documents.parquet"))
        q = (
            stream.select("doc_id", "lang")
            .writeStream.format("jsonl_sink")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream drain timed out"

    run()
    files = glob.glob(os.path.join(out, "*.jsonl"))
    assert files, "stream sink wrote nothing"
    assert all(os.path.basename(f).startswith("part-b") for f in files), files
    n_lines = sum(1 for f in files for _ in open(f))
    n_docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).count()
    assert n_lines == n_docs

    run()  # same checkpoint: no new data -> no new files, no new lines
    files2 = glob.glob(os.path.join(out, "*.jsonl"))
    assert sorted(files2) == sorted(files)
    assert sum(1 for f in files2 for _ in open(f)) == n_docs


def test_stream_sink_multi_batch_commit_names(spark, tmp_path):
    """With maxFilesPerTrigger=1 over a multi-file source, the stream
    writer must commit SEVERAL batches, each under its own batch-scoped
    prefix, with no rows lost across batch boundaries."""
    import glob
    import re

    from pyspark.sql import functions as F

    from database_extractor_spark.sources.custom import register_jsonl_sink

    register_jsonl_sink(spark)
    src = str(tmp_path / "src")
    (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select("doc_id", "lang")
        .repartition(3)
        .write.parquet(src)
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = spark.readStream.schema("doc_id bigint, lang string").option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = (
        stream.writeStream.format("jsonl_sink")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream drain timed out"
    files = glob.glob(os.path.join(out, "part-b*.jsonl"))
    batches = {re.match(r"part-b(\d+)-", os.path.basename(f)).group(1) for f in files}
    assert len(batches) >= 3, f"expected >=3 batches, saw {sorted(batches)}"
    n_lines = sum(1 for f in files for _ in open(f))
    n_docs = spark.read.parquet(src).count()
    assert n_lines == n_docs


def test_try_funcs_null_semantics(spark):
    """try_* must degrade to NULL exactly where the guarded oracle says:
    zero divisors, non-numeric casts, bigint overflow — and succeed
    everywhere else."""
    import __spark_entry__ as E

    rows = E.queries()["try_funcs"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["bad_int"] is None and r["bad_ts"] is None
        assert r["k_int"] is not None  # props.k always parses
        overflowed = r["event_id"] % 1000 == 0 and r["event_id"] > 0
        assert (r["guarded_add"] is None) == overflowed
    # at least one zero-divisor user exists in the fixture
    assert any(r["safe_ratio"] is None for r in rows)
    assert any(r["safe_ratio"] is not None for r in rows)


def test_collation_groups_fold_case(spark):
    """UTF8_LCASE grouping must produce exactly the same group count and
    sizes as explicit lower() normalization, with the synthesized mixed
    casing actually present in the input."""
    import duckdb

    import __spark_entry__ as E

    got = {
        r["source_ci"]: r["n_docs"]
        for r in E.queries()["collation_ci_group"](spark, SF_DIR).collect()
    }
    exact = dict(
        duckdb.sql(
            f"""select source, count(*) from '{SF_DIR}/documents.parquet'
            group by source"""
        ).fetchall()
    )
    assert got == exact  # folding upper(source) back == raw source counts


def test_hll_union_equals_exact_at_fixture_scale(spark):
    """Per-day sketch estimates and the unioned total must equal exact
    distinct counts (the exact-regime contract), at sf0.001 AND at the
    bench scale factor's cardinality."""
    import duckdb

    import __spark_entry__ as E

    rows = {r["grain"]: r["n_users"] for r in
            E.queries()["hll_sketch_union_distinct"](spark, SF_DIR).collect()}
    exact = dict(
        duckdb.sql(
            f"""select cast(cast(ts as date) as varchar), count(distinct user_id)
            from '{SF_DIR}/events.parquet' group by 1"""
        ).fetchall()
    )
    exact["ALL"] = duckdb.sql(
        f"select count(distinct user_id) from '{SF_DIR}/events.parquet'"
    ).fetchone()[0]
    assert rows == exact


def test_observed_metrics_ride_the_action(spark):
    """The observation's counters must equal a direct recomputation AND
    be produced by the extraction job itself (the returned frame is a
    local 1-row literal — no second scan of events)."""
    import duckdb

    import __spark_entry__ as E

    df = E.queries()["observed_metrics_extract"](spark, SF_DIR)
    row = df.collect()[0]
    exact = duckdb.sql(
        f"""select count(*),
                   sum(cast(floor(value * 1000.0) as bigint)),
                   sum(case when event_type = 'error' then 1 else 0 end)
        from '{SF_DIR}/events.parquet'
        where ts >= timestamp '2024-01-02' and ts < timestamp '2024-01-03'"""
    ).fetchone()
    assert (row["n_rows"], row["value_millis"], row["n_errors"]) == exact
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan and "FileScan" not in plan


def test_stream_sink_replayed_batch_replaces_not_duplicates(tmp_path):
    """Crash-window replay: a batch whose commit landed but whose offset
    log didn't is re-run by a NEW writer incarnation with fresh staging
    names. commit(batchId) must REPLACE the earlier copy, not add a
    second one (the exactly-once contract across the crash window)."""
    import glob

    from database_extractor_spark.sources.custom import JsonlSinkStreamWriter

    out = str(tmp_path / "sink")

    class Msg:
        def __init__(self, p):
            self.tmp_path = p

    def stage(writer, content):
        # mirror the real staging shape (_stage_partition: 32-hex task
        # uuid) — the replay sweep matches only the full committed-file
        # structure, so a fake with a non-hex task suffix would be
        # (correctly) ignored by it
        import uuid

        p = os.path.join(
            out, f"_staged-{writer.job_id}-{uuid.uuid4().hex}.jsonl"
        )
        os.makedirs(out, exist_ok=True)
        with open(p, "w") as f:
            f.write(content)
        return Msg(p)

    old = JsonlSinkStreamWriter({"path": out})
    old.commit([stage(old, '{"x": "old"}\n')], 7)
    assert len(glob.glob(os.path.join(out, "part-b7-*.jsonl"))) == 1

    replay = JsonlSinkStreamWriter({"path": out})
    replay.commit([stage(replay, '{"x": "replay"}\n')], 7)
    files = glob.glob(os.path.join(out, "part-b7-*.jsonl"))
    assert len(files) == 1, "replayed batch duplicated instead of replacing"
    assert open(files[0]).read() == '{"x": "replay"}\n'


def test_arrow_normalize_guards_zero_and_ragged(spark):
    """A zero vector's NORM is well-defined (0.0) but its direction is
    not: components come back NULL (not inf/NaN) — the r15 degenerate-
    audit contract shared with the DuckDB oracle. Ragged list columns
    are refused loudly."""
    import pytest as _pytest

    from database_extractor_spark.operators.arrow_ext import normalize_head

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])],
        "vec_id bigint, embedding array<double>",
    )
    rows = {r["vec_id"]: r for r in normalize_head(df, head=2).collect()}
    assert rows[1]["l2"] == 5.0 and rows[1]["v0"] == 0.6
    assert rows[2]["l2"] == 0.0 and rows[2]["v0"] is None

    # raggedness is only detectable (and only harmful) WITHIN a batch —
    # coalesce(1) forces both rows into one
    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0])],
        "vec_id bigint, embedding array<double>",
    ).coalesce(1)
    with _pytest.raises(Exception, match="ragged"):
        normalize_head(ragged, head=1).collect()


def test_canonical_pick_elects_longest_per_cluster(spark):
    """Exactly one canonical per cluster; every member maps to it; the
    canonical is a maximal-length member (ties to smallest doc_id)."""
    from collections import defaultdict

    import duckdb

    import __spark_entry__ as E

    rows = E.queries()["dedup_canonical_pick"](spark, SF_DIR).collect()
    assert rows
    n_chars = dict(
        duckdb.sql(
            f"select doc_id, n_chars from '{SF_DIR}/documents.parquet'"
        ).fetchall()
    )
    by_cluster = defaultdict(list)
    for r in rows:
        by_cluster[r["cluster_id"]].append(r)
    for cid, members in by_cluster.items():
        canons = {r["canonical_id"] for r in members}
        assert len(canons) == 1, f"cluster {cid}: multiple canonicals"
        canon = canons.pop()
        flags = [r for r in members if r["is_canonical"]]
        assert len(flags) == 1 and flags[0]["doc_id"] == canon
        best = max(n_chars[r["doc_id"]] for r in members)
        assert n_chars[canon] == best
        assert canon == min(
            r["doc_id"] for r in members if n_chars[r["doc_id"]] == best
        )


@pytest.mark.parametrize(
    "name",
    ["topk_per_group", "url_domain_cap", "lateral_topk_per_key", "cap_per_group"],
)
def test_rank_filters_get_window_group_limit(name, spark):
    """Every rank-then-filter entry must compile with WindowGroupLimit —
    Spark's partial per-group top-k BEFORE the window shuffle, the
    optimization that keeps a k-per-group filter from shipping whole
    groups across the wire at 100 TB. Losing it (e.g. by filtering on a
    derived rank column Catalyst can't see through) would be a silent
    scale regression."""
    import __spark_entry__ as E

    plan = (
        E.queries()[name](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, f"{name} lost WindowGroupLimit:\n{plan[:1500]}"


def test_curation_funnel_is_monotonic_and_consistent(spark):
    """Each stage can only shrink the corpus (n_raw >= n_quality >=
    n_dedup >= n_capped per language), totals must cover every document,
    and the quality stage must agree with the standalone classifier
    entry's keep decisions."""
    import duckdb

    import __spark_entry__ as E

    rows = E.queries()["corpus_curation_funnel"](spark, SF_DIR).collect()
    for r in rows:
        assert (
            r["n_raw"] >= r["n_quality"] >= r["n_dedup"] >= r["n_capped"] >= 0
        ), dict(r.asDict())
    n_docs = duckdb.sql(
        f"select count(*) from '{SF_DIR}/documents.parquet'"
    ).fetchone()[0]
    assert sum(r["n_raw"] for r in rows) == n_docs

    qc = E.queries()["quality_classifier_score"](spark, SF_DIR).collect()
    from collections import Counter

    passes = Counter()
    langs = {}
    for q in qc:
        langs.setdefault(q["lang"], 0)
        if q["quality_pass"]:
            passes[q["lang"]] += 1
    assert {r["lang"]: r["n_quality"] for r in rows} == {
        lang: passes.get(lang, 0) for lang in langs
    }
