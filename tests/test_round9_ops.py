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
    """A regenerated fixture (same path, new mtime) must resolve to a NEW
    lake directory instead of silently reusing the stale layout."""
    from database_extractor_spark.registry import _dpp_fact_path

    fx = tmp_path / "sf"
    fx.mkdir()
    shutil.copy(os.path.join(SF_DIR, "lineitem.parquet"), fx / "lineitem.parquet")

    p1 = _dpp_fact_path(spark, str(fx))
    assert os.path.exists(os.path.join(p1, "_SUCCESS"))
    # "regenerate" the fixture: bump mtime only
    st = os.stat(fx / "lineitem.parquet")
    os.utime(fx / "lineitem.parquet", ns=(st.st_atime_ns, st.st_mtime_ns + 10**9))
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
