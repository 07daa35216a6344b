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
