"""Arrow-native extension seam: ``DataFrame.mapInArrow``.

Rounds 2-8 cover the Python extension surface with pandas_udf /
applyInPandas / mapInPandas (Arrow-batched via pandas) and the Spark 4
Python UDTF; this module adds the remaining face — raw ``mapInArrow``,
where the user function receives ``pyarrow.RecordBatch`` objects with NO
pandas materialization in between. That is the right seam for columnar
numeric kernels (numpy/SIMD over the Arrow buffers) and for zero-copy
interop with Arrow-native libraries: one fewer conversion than
mapInPandas, and list columns stay packed (values + offsets) instead of
exploding into per-row Python lists.

Reference parity: the reference's extension point is "hand the extracted
frame to user code" (database_extractor.py:~387 returns a DataFrame the
caller post-processes); mapInArrow is that seam expressed on Spark's
executor side, batch-streaming instead of driver-materialized.

Scale: executors stream fixed-size Arrow batches (
spark.sql.execution.arrow.maxRecordsPerBatch) through the Python worker;
per-batch numpy work is O(batch), state never outlives a batch, and the
operator composes with whatever partitioning the upstream plan chose —
nothing here forces a shuffle.
"""
from __future__ import annotations

from pyspark.sql import DataFrame


def vector_dim(emb, vec_col: str) -> int:
    """Validated row width of an Arrow vector column (ADVICE r9):
    list/large_list columns are checked for raggedness via their offsets;
    fixed_size_list is rectangular by construction; anything else — or a
    ragged list — raises a self-describing ValueError instead of the
    opaque AttributeError/reshape failure a blind offsets access gave."""
    import numpy as np
    import pyarrow as pa

    t = emb.type
    if pa.types.is_fixed_size_list(t):
        return t.list_size
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        lens = np.diff(np.asarray(emb.offsets))
        if len(lens) == 0:
            # empty batches are normal in mapInArrow — there is no row to
            # take a width from; 0 lets callers emit an empty batch of the
            # declared schema instead of tripping numpy's opaque
            # "zero-size array to reduction operation" from lens.min()
            return 0
        if lens.min() != lens.max():
            raise ValueError(
                f"{vec_col} is ragged (lengths {lens.min()}..{lens.max()})"
            )
        return int(lens[0])
    raise ValueError(
        f"{vec_col} must be a list/large_list/fixed_size_list of "
        f"float/double, got Arrow type {t}"
    )


def normalize_head(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    head: int = 3,
    dp: int = 6,
) -> DataFrame:
    """Per-vector L2 norm + the first ``head`` L2-normalized components,
    computed batch-at-a-time in numpy over the raw Arrow buffers.

    Engine-portable arithmetic (the md5/integer-quantization discipline of
    the rest of the repo, applied to floats): the squared norm is summed
    over INTEGER-quantized components (floor(x*1e6 + 0.5) — every term and
    every partial sum below 2^53, so the reduction is exact and
    order-independent in numpy and in any SQL engine), and all rounding is
    floor(v*10^dp + 0.5)/10^dp — identical expressions re-playable in
    DuckDB, with no dependence on numpy's banker's rounding or summation
    order.
    """
    import numpy as np
    import pyarrow as pa

    scale = float(10**dp)
    out_schema = ", ".join(
        [f"{id_col} bigint", "l2 double"] + [f"v{i} double" for i in range(head)]
    )

    def batches(it):
        for b in it:
            n = b.num_rows
            if n == 0:
                continue
            ids = b.column(b.schema.get_field_index(id_col)).cast(pa.int64())
            emb = b.column(b.schema.get_field_index(vec_col))
            # the reshape below assumes a RECTANGULAR non-null list
            # column; a ragged or null row would silently scramble every
            # later row of the batch, so fail loudly instead
            if emb.null_count:
                raise ValueError(f"{vec_col} contains null vectors")
            dim = vector_dim(emb, vec_col)
            # flatten() honors the ListArray's offsets (slices included):
            # one contiguous values buffer -> (n, dim) with zero Python
            # per-row work
            vals = np.asarray(emb.flatten(), dtype=np.float64)
            x = vals.reshape(n, dim)
            q = np.floor(x * 1e6 + 0.5)  # exact integers in doubles
            l2 = np.sqrt((q * q).sum(axis=1)) / 1e6
            # a zero (or all-below-quantization) vector has no DIRECTION:
            # its components normalize to NULL rather than silent inf/NaN.
            # The NORM itself is well-defined (0.0) and stays non-null —
            # the oracle's floor(x/l2...) hits DuckDB's /0 -> NULL for the
            # same component rows (degenerate audit r15).
            zero = l2 == 0.0
            mask = zero if zero.any() else None
            safe = np.where(zero, 1.0, l2)
            cols = {
                id_col: ids,
                "l2": pa.array(np.floor(l2 * scale + 0.5) / scale),
            }
            for i in range(head):
                cols[f"v{i}"] = pa.array(
                    np.floor(x[:, i] / safe * scale + 0.5) / scale, mask=mask
                )
            yield pa.RecordBatch.from_pydict(cols)

    return df.mapInArrow(batches, out_schema)
