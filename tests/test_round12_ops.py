"""Round-12 additions: skew conf profiles, batched BPE training,
integer-lane perplexity buckets, persisted index caches, incremental
near-dup dedup."""

from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get(
    "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
)
SF_MID = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    from database_extractor_spark.session import get_spark

    spark = get_spark(app_name="tests-r12", master="local[4]", shuffle_partitions=4)
    yield spark


def test_skew_profile_applies_measured_confs(spark):
    """get_spark(skew_profile="aqe-tuned") must set exactly the confs the
    measured playbook recorded as the winner (BASELINE.md round-11 skew
    table: threshold 8m / advisory 4m beat hand-salting 1.86x vs 1.73x),
    and unknown profile names must fail loudly."""
    from database_extractor_spark.session import SKEW_PROFILES, get_spark

    keys = [
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    ]
    saved = {k: spark.conf.get(k, None) for k in keys}
    try:
        s = get_spark(app_name="tests-r12", skew_profile="aqe-tuned")
        assert s is spark  # getOrCreate reuses; confs applied to it
        assert s.conf.get(keys[1]) == "8m"
        assert s.conf.get(keys[2]) == "4m"
        assert s.conf.get(keys[0]) == "true"
        # extra_conf layers OVER the profile
        s = get_spark(
            app_name="tests-r12",
            skew_profile="aqe-tuned",
            extra_conf={keys[2]: "16m"},
        )
        assert s.conf.get(keys[2]) == "16m"
        with pytest.raises(ValueError, match="unknown skew_profile"):
            get_spark(skew_profile="nope")
        assert set(SKEW_PROFILES) == {"aqe-tuned", "aqe-default"}
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_lnq_micro_matches_pure_python_spec(spark):
    """The integer fixed-point log lane is a SPEC (bit-length + frozen
    table + interpolation, all integer/IEEE-exact ops); Spark must
    reproduce the pure-Python replay bit-for-bit — including the awkward
    spots: powers of two, 2^k - 1, and values > 2^32."""
    import math

    from pyspark.sql import functions as F

    from database_extractor_spark.registry import _LN_MICRO_TABLE, _lnq_micro

    A = _LN_MICRO_TABLE

    def py_lnq(m):
        k = m.bit_length() - 1
        z = int(math.floor(m / (1 << k) * 16777216.0))
        idx = (z >> 16) - 256
        frac = z & 65535
        return k * 693147 + A[idx] + (A[idx + 1] - A[idx]) * frac // 65536

    ms = (
        list(range(1, 300))
        + [2**k for k in range(1, 53)]
        + [2**k - 1 for k in range(2, 53)]
        + [999_983, 10**9 + 7, 2**52 + 12345]
    )
    df = _lnq_micro(
        spark.createDataFrame([(m,) for m in ms], "m bigint"), "m", "lnq"
    )
    got = {r["m"]: r["lnq"] for r in df.collect()}
    assert got == {m: py_lnq(m) for m in ms}
    # accuracy of the spec itself (not cross-engine): within 10 micro-nats
    assert all(abs(py_lnq(m) - 1e6 * math.log(m)) < 10.5 for m in ms)


def test_ccnet_plan_contains_no_log_call(spark):
    """VERDICT r11 item 4's 'done' condition, plan-pinned: the ccnet
    scoring plan must contain NO logarithm evaluation — the former
    floor(ln·1e6) lane assumed JVM Math.log ≡ DuckDB libm ln to 1 ulp."""
    import re

    import __spark_entry__ as E

    df = E.queries()["ccnet_perplexity_buckets"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"\bLOG\(|\bln\(", plan, re.IGNORECASE), plan[:2000]
