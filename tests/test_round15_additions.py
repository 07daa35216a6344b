"""Round-15 additions (entries 347-350): l-diversity audit, temporal
split with embargo, top-k membership churn, IVF nprobe-recall curve.
Each entry carries a full DuckDB oracle; these tests pin the invariants
an oracle compare can't see — privacy-property math, the embargo-gap
contract, set-algebra identities, curve monotonicity and the exact
right endpoint."""

from __future__ import annotations

import datetime
import os

import pytest

SF_DIR = os.environ.get(
    "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
)


@pytest.fixture(scope="module")
def spark():
    from database_extractor_spark.session import get_spark

    spark = get_spark(
        app_name="tests-r15-additions", master="local[4]",
        shuffle_partitions=4,
    )
    yield spark


def test_l_diversity_bounds_and_flag(spark):
    """1 <= l <= min(n, 5 segments); meets_l is exactly l >= 3; classes
    partition the customer table."""
    from database_extractor_spark.registry import QUERIES, _tbl

    rows = QUERIES["l_diversity_audit"](spark, SF_DIR).collect()
    assert rows, "audit must report at least one equivalence class"
    total = 0
    for r in rows:
        assert 1 <= r["l"] <= min(r["n"], 5), r
        assert r["meets_l"] == (r["l"] >= 3), r
        total += r["n"]
    assert total == _tbl(spark, SF_DIR, "customer").count()


def test_temporal_split_embargo_gap_holds(spark):
    """The boundary columns PROVE the embargo: max(train) < embargo
    start, min(test) >= embargo end, and the three splits partition the
    events table exactly."""
    from database_extractor_spark.registry import QUERIES, _tbl

    got = {
        r["split"]: r
        for r in QUERIES["temporal_split_embargo"](spark, SF_DIR).collect()
    }
    t1 = datetime.datetime(2024, 1, 20)
    t2 = datetime.datetime(2024, 1, 22)
    assert got["train"]["max_ts"] < t1
    assert got["test"]["min_ts"] >= t2
    if "embargo" in got:
        assert t1 <= got["embargo"]["min_ts"]
        assert got["embargo"]["max_ts"] < t2
    assert sum(r["n_events"] for r in got.values()) == _tbl(
        spark, SF_DIR, "events"
    ).count()


def test_topk_membership_churn_set_algebra(spark):
    """stayed + exited = |A|, stayed + entered = |B| (both 10 on a
    fixture with >= 10 active users per half), and the Jaccard equals
    stayed / (stayed + exited + entered) exactly."""
    from database_extractor_spark.registry import QUERIES

    r = QUERIES["topk_membership_churn"](spark, SF_DIR).collect()[0]
    n_a = r["n_stayed"] + r["n_exited"]
    n_b = r["n_stayed"] + r["n_entered"]
    assert n_a == n_b == 10
    union = r["n_stayed"] + r["n_exited"] + r["n_entered"]
    assert r["topk_jaccard"] == round(r["n_stayed"] / union, 6)


def test_ivf_nprobe_recall_curve_monotone_right_endpoint(spark):
    """recall@10 is non-decreasing in nprobe (more probed lists can only
    add candidates) and nprobe = n_lists = 16 IS exact search, so the
    right endpoint is exactly 1.0."""
    from database_extractor_spark.registry import QUERIES

    rows = QUERIES["ivf_nprobe_recall_curve"](spark, SF_DIR).collect()
    assert [r["nprobe"] for r in rows] == [1, 2, 4, 8, 16]
    recalls = [r["mean_recall_at_10"] for r in rows]
    assert recalls == sorted(recalls), recalls
    assert recalls[-1] == 1.0
    assert rows[-1]["total_hits"] == 80  # 8 queries x top-10


def test_char_entropy_extremes_and_exclusions(spark, tmp_path):
    """A one-character-repeated doc scores exactly 0.0; a doc of k
    distinct equiprobable chars scores round(ln k, 6); NULL/empty docs
    are excluded (no distribution to measure)."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from database_extractor_spark.registry import QUERIES

    sf = str(tmp_path)
    docs = [(1, "aaaaaaaa"), (2, "abcd"), (3, None), (4, "")]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d[0] for d in docs], pa.int64()),
                "text": pa.array([d[1] for d in docs], pa.string()),
                "lang": pa.array(["en"] * 4, pa.string()),
                "source": pa.array(["s"] * 4, pa.string()),
                "n_chars": pa.array(
                    [len(d[1]) if d[1] else 0 for d in docs], pa.int64()
                ),
            }
        ),
        os.path.join(sf, "documents.parquet"),
    )
    got = {
        r["doc_id"]: r
        for r in QUERIES["char_entropy_quality"](spark, sf).collect()
    }
    assert set(got) == {1, 2}
    assert got[1]["char_entropy"] == 0.0
    assert got[1]["n_distinct_chars"] == 1
    assert got[2]["char_entropy"] == round(math.log(4.0), 6)


def test_stratified_kfold_balance_and_determinism(spark):
    """Within every stratum the five folds differ by at most one
    document; folds partition the corpus; two invocations agree row
    for row (frozen md5 shuffle)."""
    from collections import Counter

    from database_extractor_spark.registry import QUERIES, _tbl

    rows = QUERIES["stratified_kfold_assignment"](spark, SF_DIR).collect()
    assert len(rows) == _tbl(spark, SF_DIR, "documents").count()
    per = Counter((r["lang"], r["fold"]) for r in rows)
    langs = {r["lang"] for r in rows}
    for lang in langs:
        sizes = [per.get((lang, f), 0) for f in range(5)]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
    again = {
        (r["doc_id"], r["fold"])
        for r in QUERIES["stratified_kfold_assignment"](spark, SF_DIR)
        .collect()
    }
    assert again == {(r["doc_id"], r["fold"]) for r in rows}
