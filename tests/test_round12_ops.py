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
