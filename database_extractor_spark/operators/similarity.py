"""Similarity search over embedding columns (array<float>): brute-force
cosine top-k as the exact baseline, random-hyperplane LSH bucketing and a
partition-pruned (IVF-style) variant as the scale paths.

North-star LLM-pipeline operator (not in the reference) over the
``embeddings`` table. Design rules for 100 TB:

- The exact path never cross-joins: the query vector is a plan-time
  literal array, cosine is a per-row expression (zip_with + aggregate,
  JVM-side), and top-k compiles to TakeOrderedAndProject (per-partition
  heaps, k×partitions rows to the driver).
- The ANN paths prune candidates BEFORE scoring: LSH bucket equality or a
  coarse partition key (IVF list / any precomputed cluster id) — both are
  scan-with-filter plans, broadcastable and partition-prunable when the
  table is written bucketed/partitioned by the key.
- All math in double: float32 accumulation drifts from every oracle.
"""

from __future__ import annotations

import random
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns, accumulated in double (sequential
    left-to-right fold — matches DuckDB's list_dot_product on DOUBLE[])."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity in double precision; 0.0 for a zero vector
    (instead of NaN) so ordering stays total."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def _query_lit(query_vec: Sequence[float]) -> Column:
    """Array literal built from ONE expr string — a single Py4J call.
    The former ``F.array(*[F.lit(v) ...])`` issued len(vec) round-trips
    (~1-4 ms each) PER literal vector at plan-BUILD time; an IVF argmax
    over 16 centroids paid 1024 of them (~1 s of driver overhead per
    build — the _LN_MICRO_SQL lesson, BASELINE.md r13). repr() emits the
    shortest decimal that round-trips the double and Spark's literal
    parse is correctly rounded, so the folded plan Literal is
    bit-identical to the old form."""
    return F.expr(
        "array(" + ",".join(f"{float(v)!r}D" for v in query_vec) + ")"
    )


def cosine_to_literal(
    vec_col: Column, lit_vec: Sequence[float], vnorm: Column | None = None
) -> Column:
    """Cosine against a DRIVER-SIDE literal vector with the literal's norm
    precomputed in Python — one dot fold per row instead of three
    (Catalyst does not constant-fold higher-order aggregates, so
    ``cosine(col, lit)`` re-folds the literal's norm per row). Pass
    ``vnorm`` (a shared ``l2_norm(vec_col)`` column) to also amortize the
    row norm across many literals (the IVF argmax case: 16 centroids ->
    one row-norm fold instead of 16).

    FP contract: bit-identical to :func:`cosine` — the Python left fold
    over the literal equals the engine fold (same IEEE sequence), the
    denominator keeps the ``|v| * |q|`` multiplication order, and the
    zero-denominator guard still returns 0.0.
    """
    import math

    qn = math.sqrt(_pydot(lit_vec, lit_vec))
    vn = l2_norm(vec_col) if vnorm is None else vnorm
    denom = vn * F.lit(qn)
    return F.when(denom == 0, F.lit(0.0)).otherwise(
        dot(vec_col, _query_lit(lit_vec)) / denom
    )


def brute_force_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: Sequence[int] = (),
) -> DataFrame:
    """Exact cosine top-k against a literal query vector.

    Output: (id, cos) ordered by (cos desc, id) — the id tiebreak keeps
    the selected set deterministic under score ties.

    Scale: one narrow scan computing a double per row + TakeOrdered; no
    shuffle, no cartesian. This is the correctness baseline the ANN paths
    are measured against (recall@k).
    """
    # zip_with silently truncates on length mismatch — score only rows whose
    # dimensionality matches the query instead of producing wrong numbers
    scored = df.filter(F.size(F.col(vec_col)) == len(query_vec)).select(
        F.col(id_col),
        F.round(
            cosine_to_literal(F.col(vec_col), [float(v) for v in query_vec]), 6
        ).alias("cos"),
    )
    if exclude_ids:
        scored = scored.filter(~F.col(id_col).isin(*[int(i) for i in exclude_ids]))
    return scored.orderBy(F.col("cos").desc(), F.col(id_col)).limit(k)


# --------------------------------------------------------------------------
# Random-hyperplane LSH
# --------------------------------------------------------------------------

def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> list[list[float]]:
    """Deterministic Rademacher (+1/-1) hyperplanes — reproducible across
    driver restarts, so bucket ids are stable table state."""
    rng = random.Random(seed)
    return [[1.0 if rng.random() < 0.5 else -1.0 for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket(vec_col: Column, planes: Sequence[Sequence[float]]) -> Column:
    """Sign-of-projection bit per hyperplane, packed into an int bucket id.

    Per-row expression (n_planes × dim multiply-adds, JVM-side). Vectors
    with small angle agree on most sign bits -> land in the same bucket
    with high probability.
    """
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        # _query_lit: one expr-string literal per plane, not dim F.lits
        proj = dot(vec_col, _query_lit(plane))
        bucket = bucket + F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def with_lsh_bucket(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    n_planes: int = 16,
    seed: int = 42,
    out_col: str = "bucket",
) -> DataFrame:
    return df.withColumn(out_col, lsh_bucket(F.col(vec_col), hyperplanes(dim, n_planes, seed)))


def _py_bucket(query_vec: Sequence[float], planes: Sequence[Sequence[float]]) -> int:
    """Driver-side bucket of the query vector (same math as lsh_bucket)."""
    b = 0
    for i, plane in enumerate(planes):
        if sum(float(x) * p for x, p in zip(query_vec, plane)) >= 0:
            b |= 1 << i
    return b


def _literal_cosine_sql(vec_sql: str, lit_vec: Sequence[float], vnorm_sql: str) -> str:
    """SQL text of ``cosine_to_literal(col(vec_sql), lit_vec, col(vnorm_sql))``
    — the same guarded fold (zero-denominator -> 0.0, |v| * |q| order,
    query norm python-folded per the _pydot contract), produced as ONE
    string so a caller assembling a whole panel/centroid set pays a
    single Py4J call instead of ~12 per literal vector (r18, VERDICT
    r17 item 5: the 16-centroid struct loops cost ~1 s of driver-side
    expression construction PER INVOCATION, flat across SF). ``{x!r}D``
    literals round-trip doubles exactly (the _query_lit discipline);
    the CASE / aggregate / zip_with expressions parse to the identical
    Catalyst tree the Column-API form builds, so results stay
    bit-identical (oracle-verified per call site)."""
    import math

    vec = [float(x) for x in lit_vec]
    qn = math.sqrt(_pydot(vec, vec))
    arr = "array(" + ",".join(f"{x!r}D" for x in vec) + ")"
    dot_sql = (
        f"aggregate(zip_with({vec_sql}, {arr}, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0.0D, (acc, v) -> acc + v)"
    )
    denom = f"({vnorm_sql} * {qn!r}D)"
    return f"(CASE WHEN {denom} = 0.0D THEN 0.0D ELSE {dot_sql} / {denom} END)"


def neg_cosine_struct_array(
    vec_sql: str,
    cents: Sequence[tuple[int, Sequence[float]]],
    vnorm_sql: str,
) -> Column:
    """``array<struct<nc: double, sid: int>>`` of NEGATED cosines against
    a literal centroid set, from one SQL string (see _literal_cosine_sql)
    — array_min / array_sort over it picks rank-1/rank-2 centroids by
    (nc asc, sid asc), the IVF argmin discipline. ``vec_sql`` /
    ``vnorm_sql`` are SQL column references (simple identifiers)."""
    parts = [
        "struct(-"
        + _literal_cosine_sql(vec_sql, vec, vnorm_sql)
        + f" as nc, {int(sid)} as sid)"
        for sid, vec in cents
    ]
    return F.expr("array(" + ",".join(parts) + ")")


def panel_cosine_struct_array(
    vec_sql: str,
    panel: Sequence[tuple[int, Sequence[float]]],
    vnorm_sql: str,
    round_dp: int = 6,
) -> Column:
    """``array<struct<qid: int, c: double>>`` of ROUNDED cosines against
    the literal query panel, from one SQL string — the recall evals'
    exact-arm explode payload (6-dp rounding before ranking, the
    sim_recall_eval discipline)."""
    parts = [
        f"struct({int(qid)} as qid, round("
        + _literal_cosine_sql(vec_sql, qv, vnorm_sql)
        + f", {int(round_dp)}) as c)"
        for qid, qv in panel
    ]
    return F.expr("array(" + ",".join(parts) + ")")


def panel_l2_struct_array(
    vec_sql: str,
    panel: Sequence[tuple[int, Sequence[float]]],
    dxx_sql: str,
    round_dp: int = 6,
) -> Column:
    """``array<struct<qid: int, d: double>>`` of ROUNDED squared-L2
    distances ``|x|^2 - 2<x,q> + |q|^2`` against the literal query
    panel, from one SQL string (the _literal_cosine_sql discipline for
    the PQ eval's distance panel; ``dxx_sql`` references the shared
    per-row |x|^2 fold). Bit-identical to the Column-API form: same
    literal round-trip, same left-assoc add order, |q|^2 python-folded
    per the _pydot contract."""
    parts = []
    for qid, qv in panel:
        vec = [float(x) for x in qv]
        qq = _pydot(vec, vec)
        arr = "array(" + ",".join(f"{x!r}D" for x in vec) + ")"
        dot_sql = (
            f"aggregate(zip_with({vec_sql}, {arr}, "
            "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            "0.0D, (acc, v) -> acc + v)"
        )
        parts.append(
            f"struct({int(qid)} as qid, round("
            f"{dxx_sql} - 2.0D * {dot_sql} + {qq!r}D, {int(round_dp)}) as d)"
        )
    return F.expr("array(" + ",".join(parts) + ")")


def _pydot(a: Sequence[float], b: Sequence[float]) -> float:
    """Driver-side sequential-fold dot product. ONE shared definition:
    this fold order must mirror DuckDB's list_dot_product and the
    engine-side aggregate(zip_with(...)) fold so quantizer/codebook
    literals baked into oracles stay bit-identical — independent copies
    could drift and silently break oracle parity."""
    s = 0.0
    for x, y in zip(a, b):
        s += float(x) * float(y)
    return s


def _pycos(a: Sequence[float], b: Sequence[float]) -> float:
    """Driver-side cosine built on the shared fold (see _pydot)."""
    import math

    d = math.sqrt(_pydot(a, a)) * math.sqrt(_pydot(b, b))
    return _pydot(a, b) / d if d else 0.0


def ann_topk_lsh(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    multiprobe_hamming: int = 1,
    exclude_ids: Sequence[int] = (),
) -> DataFrame:
    """Approximate top-k: score only vectors whose LSH bucket is within
    ``multiprobe_hamming`` bits of the query's bucket.

    Scale: candidate filter is `bucket IN (probe set)` — a pushable
    predicate; when the table is bucketed/partitioned by `bucket` this
    prunes file groups at the scan. Expected candidates ≈ N × (probe
    buckets / 2^n_planes); recall tunes with n_planes (fewer planes =
    bigger buckets = higher recall, more scoring).
    """
    dim = len(query_vec)
    planes = hyperplanes(dim, n_planes, seed)
    qb = _py_bucket(query_vec, planes)
    probes = [qb]
    if multiprobe_hamming >= 1:
        probes += [qb ^ (1 << i) for i in range(n_planes)]
    if multiprobe_hamming >= 2:
        probes += [
            qb ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    bucketed = with_lsh_bucket(df, dim, vec_col, n_planes, seed)
    candidates = bucketed.filter(F.col("bucket").isin(probes))
    return brute_force_topk(candidates, query_vec, k, id_col, vec_col, exclude_ids=exclude_ids)


# --------------------------------------------------------------------------
# Partition-pruned (IVF-style) search
# --------------------------------------------------------------------------

def partitioned_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    partition_col: str,
    partition_values: Sequence,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k restricted to the coarse partitions nearest the query (IVF
    semantics: ``partition_col`` is the inverted-list id — a k-means
    cluster label, a category, a shard key).

    Scale: the partition predicate prunes at the scan (partition/row-group
    level on a partitioned layout); scoring touches only the probed lists.
    """
    pruned = df.filter(F.col(partition_col).isin(list(partition_values)))
    return brute_force_topk(pruned, query_vec, k, id_col, vec_col)


def _canonical_mean(col, round_dp: int):
    """Order-independent per-dimension mean for Lloyd updates: quantize
    each value to an integer (floor(x*1e9 + 0.5) — exact in any engine),
    sum the integers (exact, associative, so distributed reduction order
    cannot matter), divide back and round. ADVICE r8: plain avg() left
    oracle parity hanging on Spark's and DuckDB's float summation ORDERS
    producing the same 6-dp rounding — a value within ~1e-13 of a rounding
    boundary could flip a centroid literal and cascade through later
    rounds. With integer sums both engines round the bit-identical double,
    closing that failure mode. Quantization error (<=5e-10 per value) is
    1e3 below the 6-dp centroid grid, far under anything that moves an
    assignment."""
    q = F.floor(col * F.lit(1e9) + F.lit(0.5)).cast("bigint")
    return F.round(F.sum(q) / F.count(F.lit(1)) / F.lit(1e9), round_dp)


def lloyd_rounds_cosine(
    df: DataFrame,
    seeds: Sequence[tuple[int, Sequence[float]]],
    rounds: int = 2,
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> list[tuple[int, list[float]]]:
    """Deterministic spherical-KMeans training: ``rounds`` Lloyd
    assignment/mean iterations starting from the FROZEN sampled ``seeds``
    (the random-sample init, pinned). Returns trained (seed_id, centroid)
    pairs — the same shape as ``seeds``, so :func:`ivf_fixed_topk` serves
    queries against the trained quantizer unchanged.

    This replaces the earlier pyspark.ml KMeans fit (round 8): ml's
    centroids are opaque model state (parallel reduce order, internal
    init), so the IVF entry could only ever get a rows-only driver check.
    Pinning the init to a data-derived sample and the round count, and
    ROUNDING each round's means to ``round_dp``, makes training a pure
    function of the data that a DuckDB oracle replays as chained CTEs —
    assignment is argmax cosine over centroid literals (smallest seed id
    on ties), the update is the per-dimension mean — computed as an
    integer-quantized sum (:func:`_canonical_mean`) so the reduction is
    exact and order-independent in BOTH engines, not merely
    rounded-after-drift (ADVICE r8).

    Scale: per round, ONE scan (argmax over n_lists literal centroids —
    narrow projection) + one n_lists-row aggregate; the collect is
    n_lists x dim rounded doubles — bounded model state, the PCA
    power-iteration pattern. Empty lists keep their previous centroid.

    Sizing the quantizer: pass ``auto_n_lists(df.count())`` seeds unless
    a config is pinned for oracle replay — list count must GROW with the
    corpus (measured at sf10: a frozen 16-list config goes quadratic in
    within-list pairs while auto-sized 160 lists restore ~linear cost;
    BASELINE.md r12).
    """
    dim = len(seeds[0][1])
    cents = [(int(s), [float(x) for x in v]) for s, v in seeds]
    for _ in range(rounds):
        # r18: fold set from ONE SQL string (see neg_cosine_struct_array)
        structs = neg_cosine_struct_array(f"`{vec_col}`", cents, "`__vnorm`")
        assigned = df.withColumn("__vnorm", l2_norm(F.col(vec_col))).select(
            F.array_min(structs)["sid"].alias("__list"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
        )
        rows = (
            assigned.groupBy("__list")
            .agg(
                *[
                    _canonical_mean(F.col("__v")[d], round_dp).alias(f"c{d}")
                    for d in range(dim)
                ]
            )
            .collect()
        )
        got = {int(r["__list"]): [float(r[f"c{d}"]) for d in range(dim)] for r in rows}
        cents = [(s, got.get(s, v)) for s, v in cents]
    return cents


def auto_n_lists(
    n_rows: int, base_rows: int = 2000, base_lists: int = 16
) -> int:
    """The IVF/SemDeDup list-count sizing rule, promoted from a measured
    footnote to THE API default (VERDICT r12 item 7): square-root
    scaling anchored at the fixture's oracle-pinned config —

        n_lists = round(base_lists * sqrt(n_rows / base_rows))

    i.e. 16 lists at the 2,000-vector sf0.1 embeddings corpus and
    **160 at the 200,000-vector sf10 corpus — the measured deployment
    point**
    (BASELINE.md r12: within-cluster pairs fall 9.5x, the semdedup
    train+assign+pair run falls 966 -> 156 s). Square-root growth keeps
    per-list size growing as sqrt(N) too, balancing quantizer cost
    (propto n_lists per row) against within-list pair cost (propto
    list size) — the standard IVF guidance (Faiss: n_lists ~ k*sqrt(N)).

    CROSS-ENGINE DETERMINISTIC: computed as
    floor(sqrt(n_rows * base_lists^2 / base_rows) + 0.5) where every
    step — int->double conversion, multiply, divide, sqrt, +0.5, floor
    — is an exactly-rounded IEEE 754 core operation (sqrt is a basic
    IEEE op, NOT a libm approximation), so any engine (Spark, DuckDB,
    NumPy) replays the same integer from the same row count; a SQL
    oracle can size its seed CTE with the identical formula.
    """
    import math

    return max(
        1,
        int(
            math.floor(
                math.sqrt(n_rows * float(base_lists * base_lists) / base_rows)
                + 0.5
            )
        ),
    )


def ivf_assign(
    df: DataFrame,
    seeds: Sequence[tuple[int, Sequence[float]]],
    vec_col: str = "embedding",
    list_col: str = "__list",
) -> DataFrame:
    """Assign every vector to its inverted list: argmax cosine over the
    (trained or frozen) centroid literals, smallest seed id on ties — a
    pure scan+project, no join. This is the MATERIALIZABLE half of IVF:
    at scale (and in the registry entries) the assignment is computed
    once, persisted/laid out by ``list_col``, and served to every query,
    so repeat searches pay only the probe-pruned scan, not n_lists x dim
    multiply-adds per row per query."""
    # r18: fold set from ONE SQL string (see neg_cosine_struct_array)
    structs = neg_cosine_struct_array(f"`{vec_col}`", seeds, "`__vnorm`")
    return (
        df.withColumn("__vnorm", l2_norm(F.col(vec_col)))
        .withColumn(list_col, F.array_min(structs)["sid"])
        .drop("__vnorm")
    )


def ivf_fixed_topk(
    df: DataFrame,
    seeds: Sequence[tuple[int, Sequence[float]]],
    query_vec: Sequence[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: Sequence[int] = (),
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF with a FIXED sampled-seed coarse quantizer: the inverted lists
    are defined by ``seeds`` — (seed_id, vector) pairs drawn from the
    corpus by a fixed rule (the random-sample initialization step of
    KMeans, frozen as the quantizer). Unlike ``ivf_index``/``ivf_topk``
    (trained model state -> rows-only driver check), every quantity here
    is a deterministic function of the DATA, so a DuckDB oracle replays
    assignment, probe selection, and the final top-k bit-identically
    (VERDICT r6 item 6).

    Assignment is an in-plan per-row expression (argmax cosine over the
    seed literals, smallest seed id on ties) — a pure scan+project, no
    join; probe selection (the ``nprobe`` seeds nearest the query) is
    driver-side float math over the tiny seed set. Scale: identical plan
    shape to ivf_topk — `assigned IN (probes)` prunes when the table is
    laid out by list id; scored rows ≈ N * nprobe / n_lists.
    """
    if assigned is None:
        assigned = ivf_assign(df, seeds, vec_col=vec_col)

    ranked = sorted(
        ((_pycos(query_vec, vec), int(sid)) for sid, vec in seeds),
        key=lambda t: (-t[0], t[1]),
    )
    probes = [sid for _, sid in ranked[:nprobe]]
    pruned = assigned.filter(F.col("__list").isin(probes)).drop("__list")
    return brute_force_topk(pruned, query_vec, k, id_col, vec_col, exclude_ids=exclude_ids)


def pq_codebooks(
    seeds: Sequence[tuple[int, Sequence[float]]], m: int
) -> list[list[list[float]]]:
    """codebooks[j][c]: subvector ``j`` of seed rank ``c`` (seed order =
    code index) — shared by encode, the ADC table, and the oracles."""
    dim = len(seeds[0][1])
    sub = dim // m
    assert m * sub == dim, f"dim {dim} not divisible into {m} subspaces"
    return [
        [[float(v) for v in vec[j * sub:(j + 1) * sub]] for _, vec in seeds]
        for j in range(m)
    ]


def pq_encode(
    df: DataFrame,
    seeds: Sequence[tuple[int, Sequence[float]]],
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector as ``m`` codes (per subspace: argmin squared-L2
    to the codeword literals via the dot identity, smallest code on ties)
    -> (id, vector, __code0..__code{m-1}). This is the MATERIALIZABLE half
    of PQ — the compressed index a real deployment persists; the registry
    entries cache/persist it so repeat queries pay ADC lookups over stored
    codes, not m x k codeword distances per row per query."""
    codebooks = pq_codebooks(seeds, m)
    sub = len(codebooks[0][0])
    code_cols = []
    for j in range(m):
        xj = F.slice(F.col(vec_col), j * sub + 1, sub)
        dxx = dot(xj, xj)
        structs = [
            F.struct(
                (
                    dxx
                    - F.lit(2.0) * dot(xj, _query_lit(cw))
                    + F.lit(_pydot(cw, cw))
                ).alias("d"),
                F.lit(c).alias("c"),
            )
            for c, cw in enumerate(codebooks[j])
        ]
        code_cols.append(F.array_min(F.array(*structs))["c"].alias(f"__code{j}"))
    return df.select(F.col(id_col), F.col(vec_col), *code_cols)


def pq_fixed_topk(
    df: DataFrame,
    seeds: Sequence[tuple[int, Sequence[float]]],
    query_vec: Sequence[float],
    m: int = 8,
    k: int = 10,
    rerank: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: Sequence[int] = (),
    encoded: DataFrame | None = None,
) -> DataFrame:
    """Product quantization with FIXED sampled codebooks: subspace ``j``'s
    codewords are the ``j``-th subvectors of the ``seeds`` (same frozen
    sample as :func:`ivf_fixed_topk`), so encoding, the ADC table, and the
    two-stage search are all deterministic functions of the data — fully
    SQL-oracle-able, unlike the KMeans-trained ``pq_index`` (VERDICT r6
    item 6).

    Portability contract (every formula mirrored verbatim in the oracle):
    squared-L2 terms use the dot-product identity ``|x|^2 - 2<x,c> +
    |c|^2`` (list_dot_product is the one cross-engine-identical fold;
    a direct (x-y)^2 fold has no DuckDB twin), codeword/ADC argmins break
    ties on the smallest code index, and the ADC sum adds the ``m``
    lookups in subspace order.

    Scale: encode is scan+project (per-row expression over literal
    codewords), shortlist is TakeOrdered on the compressed distance, and
    only ``rerank`` rows touch full vectors via a broadcast semi-join —
    the standard two-stage PQ shape.
    """
    codebooks = pq_codebooks(seeds, m)
    sub = len(codebooks[0][0])
    q = [float(v) for v in query_vec]
    if encoded is None:
        encoded = pq_encode(df, seeds, m, id_col, vec_col)

    # ADC lookup tables: query-to-codeword distances (driver-side floats —
    # the same left-fold IEEE sequence the oracle's list_dot_product runs)
    total = None
    for j in range(m):
        qj = q[j * sub:(j + 1) * sub]
        table = [
            _pydot(qj, qj) - 2.0 * _pydot(qj, cw) + _pydot(cw, cw)
            for cw in codebooks[j]
        ]
        lookup = F.element_at(
            _query_lit(table), F.col(f"__code{j}") + 1
        )
        total = lookup if total is None else total + lookup
    scored = encoded.withColumn("approx_dist", F.round(total, 6))
    if exclude_ids:
        scored = scored.filter(~F.col(id_col).isin(*[int(i) for i in exclude_ids]))

    shortlist = (
        scored.select(id_col, "approx_dist")
        .orderBy(F.col("approx_dist"), F.col(id_col))
        .limit(int(rerank))
        .select(id_col)
    )
    qlit = _query_lit(q)
    exact_d = dot(F.col(vec_col), F.col(vec_col)) - F.lit(2.0) * dot(
        F.col(vec_col), qlit
    ) + F.lit(_pydot(q, q))
    return (
        encoded.join(F.broadcast(shortlist), id_col, "left_semi")
        .select(F.col(id_col), F.round(exact_d, 6).alias("approx_dist"))
        .orderBy(F.col("approx_dist"), F.col(id_col))
        .limit(k)
    )


def pairwise_similar_lsh(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """All pairs with cosine >= threshold, candidate-generated by shared
    LSH bucket (embedding-cosine near-dup detection).

    Scale: equi-self-join on bucket — shuffle on bucket id, quadratic only
    within buckets (2^n_planes buckets keeps them small); never cartesian.
    High thresholds want more planes (smaller buckets, still ~full recall
    because near-identical vectors agree on almost all sign bits).
    """
    b = with_lsh_bucket(df.select(id_col, vec_col), dim, vec_col, n_planes, seed)
    lhs, rhs = b.alias("a"), b.alias("b")
    pairs = (
        lhs.join(rhs, on="bucket")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .distinct()
    )
    return pairs


def hard_negatives_lsh(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    n_planes: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Hard-negative mining for contrastive training data: for each anchor
    vector, the most-similar vector with a DIFFERENT label among those
    sharing its LSH bucket — the highest-value negatives for a contrastive
    or triplet loss.

    Bucket-scoped by construction (never all-pairs): candidate pairs come
    from an equi-self-join on the seeded-hyperplane bucket id, quadratic
    only within buckets. Anchors whose bucket holds no cross-label vector
    emit no row (they have no hard negative at this banding resolution —
    rerun with fewer planes to widen buckets). Determinism: cosine is
    rounded to 6dp and ties break on the SMALLEST negative id, so the
    argmax is engine-independent.

    Scale: shuffle on bucket id; at corpus scale pre-partition/bucket the
    table by the LSH bucket and the join is co-located.
    """
    # per-row norm ONCE before the self-join: cosine inside the join would
    # re-aggregate both self-dots per PAIR (3x64 ops/pair); hoisting them
    # leaves one dot per pair — bit-identical values (same expressions on
    # the same inputs, just computed pre-join), ~3x less pair work
    b = with_lsh_bucket(
        df.select(id_col, vec_col, label_col), dim, vec_col, n_planes, seed
    ).withColumn("__nrm", l2_norm(F.col(vec_col)))
    a = b.select(
        F.col(id_col).alias("anchor_id"),
        F.col(vec_col).alias("__av"),
        F.col(label_col).alias("__al"),
        F.col("__nrm").alias("__an"),
        "bucket",
    )
    c = b.select(
        F.col(id_col).alias("neg_id"),
        F.col(vec_col).alias("__nv"),
        F.col(label_col).alias("__nl"),
        F.col("__nrm").alias("__cn"),
        "bucket",
    )
    denom = F.col("__an") * F.col("__cn")
    cos = F.when(denom == 0, F.lit(0.0)).otherwise(
        dot(F.col("__av"), F.col("__nv")) / denom
    )
    scored = (
        a.join(c, on="bucket")
        .filter(F.col("__al") != F.col("__nl"))
        .select("anchor_id", "neg_id", F.round(cos, 6).alias("cos"))
    )
    key = F.struct(F.col("cos"), (-F.col("neg_id")).alias("neg"))
    return scored.groupBy("anchor_id").agg(
        F.max_by("neg_id", key).alias("hard_neg_id"),
        F.max("cos").alias("neg_cos"),
    )


# --------------------------------------------------------------------------
# Product quantization (PQ) — memory-compressed ANN
# --------------------------------------------------------------------------

def lloyd_rounds_pq(
    df: DataFrame,
    seeds: Sequence[tuple[int, Sequence[float]]],
    m: int = 8,
    rounds: int = 2,
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> list[tuple[int, list[float]]]:
    """Deterministic per-subspace Lloyd training of PQ codebooks from the
    frozen seed sample: subspace ``j``'s 16 codewords start as the ``j``-th
    subvectors of ``seeds`` and take ``rounds`` squared-L2
    assignment/mean updates. Returns trained full-length vectors (the
    subspace-``j`` codeword of seed rank ``c``, concatenated over ``j``) —
    exactly the shape :func:`pq_fixed_topk` slices its codebooks from, so
    encode/ADC/re-rank serve against the trained codebooks unchanged.

    Same design as :func:`lloyd_rounds_cosine` (replacing the opaque
    pyspark.ml per-subspace KMeans, round 8): frozen init + fixed rounds +
    per-round mean rounding make training a pure engine-portable function
    of the data; distances use the dot-product identity, ties take the
    smallest code index. Scale: per round ONE scan emitting (subspace,
    code, subvector) via an in-plan explode of m structs, one (m x k)-row
    aggregate; the collect is m*k*(dim/m) rounded doubles — bounded model
    state. Empty cells keep their previous codeword.
    """
    dim = len(seeds[0][1])
    sub = dim // m
    assert m * sub == dim, f"dim {dim} not divisible into {m} subspaces"
    n_codes = len(seeds)
    books = [
        [[float(x) for x in v[j * sub:(j + 1) * sub]] for _, v in seeds]
        for j in range(m)
    ]
    for _ in range(rounds):
        per_sub = []
        for j in range(m):
            xj = F.transform(
                F.slice(F.col(vec_col), j * sub + 1, sub), lambda x: x.cast("double")
            )
            dxx = dot(xj, xj)
            structs = [
                F.struct(
                    (
                        dxx
                        - F.lit(2.0) * dot(xj, _query_lit(cw))
                        + F.lit(_pydot(cw, cw))
                    ).alias("d"),
                    F.lit(c).alias("c"),
                )
                for c, cw in enumerate(books[j])
            ]
            per_sub.append(
                F.struct(
                    F.lit(j).alias("j"),
                    F.array_min(F.array(*structs))["c"].alias("code"),
                    xj.alias("x"),
                )
            )
        ex = df.select(F.explode(F.array(*per_sub)).alias("s")).select(
            "s.j", "s.code", "s.x"
        )
        rows = (
            ex.groupBy("j", "code")
            .agg(
                *[
                    _canonical_mean(F.col("x")[d], round_dp).alias(f"c{d}")
                    for d in range(sub)
                ]
            )
            .collect()
        )
        got = {
            (int(r["j"]), int(r["code"])): [float(r[f"c{d}"]) for d in range(sub)]
            for r in rows
        }
        books = [
            [got.get((j, c), books[j][c]) for c in range(n_codes)] for j in range(m)
        ]
    return [
        (sid, [x for j in range(m) for x in books[j][c]])
        for c, (sid, _) in enumerate(seeds)
    ]


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label mean embedding in LONG format: (label, pos, centroid) with
    ``pos`` the 1-based vector component index — the centroid table behind
    IVF coarse quantizers, class prototypes, and drift monitors.

    Long format on purpose: posexplode turns the vector into (pos, value)
    rows so the mean is one plain hash-aggregate on (label, pos) — fully
    parallel, no UDF, no array-of-structs shuffle — and an array-free
    schema that any SQL engine can reproduce. Sums go through a decimal
    cast (order-independent, engine-exact), then back to double.
    """
    e = df.select(label_col, F.posexplode(vec_col).alias("pos0", "v"))
    return (
        e.groupBy(label_col, (F.col("pos0") + 1).cast("int").alias("pos"))
        .agg(
            F.round(
                F.sum(F.col("v").cast("double").cast("decimal(28,10)")).cast("double")
                / F.count("*"),
                6,
            ).alias("centroid")
        )
    )


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "q8",
    scale_col: str = "scale",
) -> DataFrame:
    """Per-vector symmetric int8 quantization: q_i = round(127·x_i/maxabs),
    plus the de-quantization scale (maxabs/127) — the standard storage/
    bandwidth compression for embedding corpora (4× smaller than float32,
    8× than float64; ANN shortlist quality is barely affected).

    All arithmetic is element-wise built-ins (transform/aggregate) —
    JVM-side, no shuffle, pushes column pruning to the scan. An all-zero
    vector quantizes to zeros with scale 0 rather than dividing by zero.
    """
    v = F.col(vec_col)
    maxabs = F.aggregate(
        F.transform(v, lambda x: F.abs(x.cast("double"))),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    d = df.withColumn("__maxabs", maxabs)
    q = F.when(F.col("__maxabs") == 0.0, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(
            v,
            lambda x: F.round(x.cast("double") * F.lit(127.0) / F.col("__maxabs"), 0).cast(
                "int"
            ),
        )
    )
    return (
        d.withColumn(out_col, q)
        .withColumn(scale_col, F.col("__maxabs") / F.lit(127.0))
        .drop("__maxabs")
    )
