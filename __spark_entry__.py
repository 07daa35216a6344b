"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``database_extractor_spark.registry``; this file
only adapts it to the contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's production
    pipeline (scan -> time window -> predicate -> 1s take-last downsample ->
    pivot ts x event_type -> sort) as one Catalyst-optimized plan."""
    from database_extractor_spark.registry import QUERIES

    return QUERIES["flagship_day_extract"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    LLM-pipeline extensions). Each callable takes (spark, sf_dir)."""
    from database_extractor_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for EVERY registry entry — the two
    dicts are kept key-identical (len(ORACLE) == len(QUERIES), asserted
    in tests/test_round5_ops.py), none omitted. The last holdouts
    graduated in round 8
    (sim_ivf_kmeans / sim_pq_topk — deterministic-Lloyd training unrolled
    into the oracle SQL via canonical quantized means), following
    dedup_minhash_lsh / dedup_simhash in round 7 (md5-lane portable
    hashing) and sim_ann_lsh / approx_distinct in round 6 (seeded-plane
    literals / exact-regime HLL)."""
    from database_extractor_spark.registry import ORACLE

    return dict(ORACLE)
