"""Relational surface: joins, aggregation suite, window functions, set ops,
top-k, distinct, unpivot.

The reference is a single-table pipeline (its only FROM is one bucket,
reference src/database_extractor/database_extractor.py:291), so none of
these exist there — they are the §2.2 engine surface SURVEY.md mandates:
thin, scale-annotated wrappers over stock DataFrame ops, where the work is
correct semantics + tests, not engine code. Catalyst supplies pushdown,
join reordering and AQE; these helpers only encode the decisions Catalyst
can't make for us (broadcast hints, deterministic tie-breaking, explicit
salting for skew).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

JoinKeys = Union[str, Sequence[str], Column]


def join_tables(
    left: DataFrame,
    right: DataFrame,
    on: JoinKeys,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Join with an optional broadcast hint on the build side.

    Scale: an equi-join on big tables is a shuffle on the key; when the
    right side is a dimension table (region/nation/part-scale), broadcasting
    it removes the shuffle entirely — pass ``broadcast_right=True``. AQE
    will also auto-broadcast below the threshold, but the hint makes the
    plan deterministic for dimension tables we *know* are small.
    """
    r = F.broadcast(right) if broadcast_right else right
    if isinstance(on, str):
        on = [on]
    return left.join(r, on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: JoinKeys, broadcast_right: bool = True) -> DataFrame:
    """Rows of ``left`` with a match in ``right`` (left columns only).

    Scale: existence checks must be semi joins, never ``isin(collect())``
    — the right side stays distributed (or broadcast), no driver round-trip.
    """
    return join_tables(left, right, on, how="left_semi", broadcast_right=broadcast_right)


def anti_join(left: DataFrame, right: DataFrame, on: JoinKeys, broadcast_right: bool = True) -> DataFrame:
    """Rows of ``left`` with NO match in ``right``."""
    return join_tables(left, right, on, how="left_anti", broadcast_right=broadcast_right)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-resistant equi-join: salt the (skewed) left key into
    ``salt_buckets`` sub-keys and explode the right side to match.

    Scale: when one key holds a large share of rows, its single shuffle
    partition becomes the straggler; salting splits it into
    ``salt_buckets`` parallel partitions at the cost of replicating the
    right side ``salt_buckets``×. AQE's skew-join handles moderate skew
    automatically — reach for explicit salting only for the pathological
    keys AQE can't split (e.g. a single key > executor memory).

    Only ``inner``/``left`` are supported: the right side is replicated
    across every salt bucket, so right/full joins would emit an unmatched
    right row once per bucket and anti/semi semantics break outright.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "the replicated right side breaks right/full/semi/anti semantics"
        )
    salt = (F.rand(seed=42) * salt_buckets).cast("int")
    l_salted = left.withColumn("__salt", salt)
    r_salted = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = l_salted.join(r_salted, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def aggregate(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """groupBy().agg() with pre-aliased aggregate Columns.

    Scale: hash aggregation with map-side partial aggregation — one
    shuffle on the group keys. Prefer ``approx_count_distinct`` over
    ``count_distinct`` at scale (the exact form needs a second expand).
    """
    return df.groupBy(*group_cols).agg(*aggs)


def rollup_agg(df: DataFrame, group_cols: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    """Hierarchical subtotals: (a,b) -> (a) -> () grand total; NULL marks
    the rolled-up level, matching ANSI ROLLUP."""
    return df.rollup(*group_cols).agg(*aggs)


def cube_agg(df: DataFrame, group_cols: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    """All grouping-set combinations of ``group_cols`` (ANSI CUBE)."""
    return df.cube(*group_cols).agg(*aggs)


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Global top-k. Pass a tie-breaking final sort key (e.g. a primary
    key) or the selected set is nondeterministic under ties.

    Scale: ``orderBy().limit(k)`` compiles to TakeOrderedAndProject —
    each partition keeps its local top-k, only k×partitions rows reach
    the driver-side merge; no global sort materializes.
    """
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """Per-group top-k via row_number over a window.

    Scale: one shuffle on the group keys + per-partition sort. row_number
    (not rank) + a unique tiebreaker in ``order_by`` keeps the result
    deterministic and exactly k rows per group.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


def drop_duplicates_ordered(
    df: DataFrame,
    subset: Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """Deterministic dropDuplicates: keep the FIRST row per ``subset`` group
    under ``order_by``.

    Spark's ``dropDuplicates`` keeps an *arbitrary* row per key (whichever
    arrives first after the shuffle) — unusable for oracle-checked or
    reproducible pipelines. This is the row_number()=1 form: same single
    shuffle, deterministic survivor.
    """
    w = Window.partitionBy(*subset).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def union_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    """ANSI UNION (set semantics). unionByName tolerates column order."""
    return a.unionByName(b).distinct()


def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """ANSI UNION ALL (bag semantics) — no shuffle at all."""
    return a.unionByName(b)


def intersect_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def except_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    """ANSI EXCEPT (set semantics): distinct rows of ``a`` not in ``b``.
    (Not ``exceptAll().distinct()``, which removes only |b| occurrences
    from the bag and keeps keys that appear more often in ``a``.)"""
    return a.subtract(b)


def intersect_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """ANSI INTERSECT ALL (multiset): each row kept min(count_a, count_b)
    times — one aggregate per side on the full row, not a distinct."""
    return a.intersectAll(b)


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """ANSI EXCEPT ALL (multiset): each row kept
    max(count_a - count_b, 0) times."""
    return a.exceptAll(b)


def unpivot_long(
    df: DataFrame,
    ids: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "key",
    value_name: str = "value",
) -> DataFrame:
    """Wide -> long (inverse of pivot_wide; ANSI UNPIVOT / stack()).

    Scale: narrow per-row transform, no shuffle; output rows =
    input rows × len(value_cols). NULL cells are dropped, matching ANSI
    UNPIVOT (and making unpivot(pivot(x)) == x for non-null data).
    """
    out = df.unpivot(list(ids), list(value_cols), var_name, value_name)
    return out.filter(F.col(value_name).isNotNull())


def with_running(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    agg: Column,
    out_col: str,
) -> DataFrame:
    """Running/cumulative aggregate per group (rows unbounded-preceding ->
    current), e.g. a running total of order value per customer.

    Scale: one shuffle on ``group_cols`` + per-partition sort; state is a
    single accumulator per group (no buffering of the full frame).
    """
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, agg.over(w))


def with_lag_lead(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    col: str,
    lag_col: str = "prev",
    lead_col: Optional[str] = None,
) -> DataFrame:
    """lag (and optionally lead) of ``col`` within each ordered group."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    out = df.withColumn(lag_col, F.lag(col).over(w))
    if lead_col:
        out = out.withColumn(lead_col, F.lead(col).over(w))
    return out


def exact_sum(col: Union[str, Column], alias: str, scale: int = 4) -> Column:
    """Order-independent exact SUM of a double column via decimal cast.

    Floating-point summation differs across partition orders and engines
    (a hash-aggregated Spark sum vs a sequential DuckDB sum disagree in the
    last ulps); casting each addend to DECIMAL(18, scale) first makes the
    sum exact and bit-identical everywhere — this is how every money-typed
    aggregate here stays oracle-checkable. Result is cast back to double.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal(18,{scale})")).cast("double").alias(alias)
    )
