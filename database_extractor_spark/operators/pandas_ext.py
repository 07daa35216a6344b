"""The sanctioned Python extension point: Arrow-batched grouped pandas
operators for semantics the built-in functions genuinely can't express.

The reference has no UDFs at all (pure config-driven pipeline), and neither
does this engine's hot path — every other operator module is built-in
functions only. This module is the documented escape hatch, kept to the
fast variant (``applyInPandas``: Arrow transfer, one Python worker per
group-partition, vectorized pandas inside) and to genuinely sequential
algorithms — the canonical example being exponential moving averages,
whose recurrence ema_t = a*x_t + (1-a)*ema_{t-1} has no fixed-depth
closed form in relational algebra.

Scale posture: one shuffle on the group keys; each group must fit a
worker's memory (time-series per sensor id — fine; do NOT group by a
constant). Arrow batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StructField, StructType


def grouped_ema(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
    out_col: str = "ema",
) -> DataFrame:
    """Per-key exponential moving average ordered by time (pandas
    ``ewm(alpha).mean()`` inside applyInPandas).

    Output schema: (*key_cols, ts_col, value_col, out_col). Rows within a
    group are sorted by (ts, value) before the recurrence so the result is
    deterministic under shuffle reordering.
    """
    key_fields = [df.schema[k] for k in key_cols]
    schema = StructType(
        key_fields
        + [df.schema[ts_col], df.schema[value_col], StructField(out_col, DoubleType())]
    )
    cols = [*key_cols, ts_col, value_col]

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, value_col]).reset_index(drop=True)
        out = pdf[cols].copy()
        out[out_col] = pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        return out

    return df.select(*cols).groupBy(*key_cols).applyInPandas(run, schema)


def grouped_apply(
    df: DataFrame,
    key_cols: Sequence[str],
    fn,
    schema: StructType,
) -> DataFrame:
    """Generic grouped pandas transform — the raw extension point the
    reference's users would reach for (fn: pandas.DataFrame ->
    pandas.DataFrame, one call per key group)."""
    return df.groupBy(*key_cols).applyInPandas(fn, schema)
