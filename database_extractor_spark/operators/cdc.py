"""Change-data-capture application: MERGE INTO semantics as one
DataFrame plan.

The lakehouse staple the reference has no analog for (its pipeline is
read-only extraction): apply a batch of keyed changes — inserts, updates,
deletes — to a base snapshot and produce the next snapshot. Delta/Iceberg
expose this as ``MERGE INTO``; on plain parquet the same semantics are
one full-outer join:

    next = base ⟗ changes ON key
           — change row absent           → keep base row
           — change op == delete         → drop the key
           — otherwise (update / insert) → take the change payload

Scale: a single shuffle-on-key join (sort-merge at cluster scale; AQE
broadcasts a small change batch automatically — the common CDC case of a
day's changes against a large snapshot). Linear in |base| + |changes|,
no window, no driver state. Pair with a partition-overwrite sink
(sinks.upsert_day_overwrite) to commit only affected partitions.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_changes(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply a keyed change batch to a base snapshot (MERGE INTO).

    ``changes`` must carry ``key_cols``, ``op_col`` and the same payload
    columns as ``base``; ``op_col`` values other than ``delete_op`` are
    upserts (insert if the key is new, update otherwise). Exactly one
    change row per key is the caller's contract — pre-deduplicate a
    multi-row feed with a take-latest (operators.core.deterministic_last)
    first.

    Returns the next snapshot with ``base``'s column order.
    """
    keys = list(key_cols)
    payload = [c for c in base.columns if c not in keys]
    ch = changes.select(
        *keys,
        F.col(op_col).alias("__op"),
        *[F.col(c).alias(f"__new_{c}") for c in payload],
    )
    merged = base.join(ch, on=keys, how="full_outer")
    kept = merged.filter(F.col("__op").isNull() | (F.col("__op") != delete_op))
    out = [
        *keys,
        *[
            F.when(F.col("__op").isNotNull(), F.col(f"__new_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in payload
        ],
    ]
    return kept.select(*out)
