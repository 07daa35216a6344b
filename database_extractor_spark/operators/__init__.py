"""Operator library: reference-parity core ops + relational helpers +
LLM-data-pipeline extensions (dedup, similarity, text, multimodal)."""

from database_extractor_spark.operators.core import (
    deterministic_last,
    downsample_last,
    drop_all_null_rows,
    drop_columns,
    has_min_rows,
    pivot_wide,
    row_predicate,
    sort_by_columns,
    time_range,
    time_shift,
)

__all__ = [
    "time_range",
    "time_shift",
    "row_predicate",
    "pivot_wide",
    "deterministic_last",
    "downsample_last",
    "drop_all_null_rows",
    "drop_columns",
    "has_min_rows",
    "sort_by_columns",
]
