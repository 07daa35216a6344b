"""Relational / pipeline surface (cont.) and the SQL front-end (library API analog).

Split out of the flat registry.py in round 14; entry bodies are
unchanged — see registry/__init__.py for the aggregation contract.
"""
from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import Window

from database_extractor_spark.operators import dedup as D
from database_extractor_spark.operators import relational as R
from database_extractor_spark.operators import similarity as S
from database_extractor_spark.operators import text as T
from database_extractor_spark.sources import read_source

from database_extractor_spark.registry._base import (
    ORACLE,
    register,
    _tbl,
)
from database_extractor_spark.registry.llm_ops import (
    _NORM,
    _cached_shingle3,
)

# More relational / pipeline surface
# ==========================================================================

@register(
    "grouping_sets",
    """
    select o_orderstatus, o_orderpriority, count(*) as n from orders
    group by grouping sets ((o_orderstatus), (o_orderpriority), ())
    """,
)
def grouping_sets_q(spark, sf_dir):
    """Explicit GROUPING SETS (SQL surface; rollup/cube are the DataFrame
    flavors above)."""
    view = "orders_gs_view"
    _tbl(spark, sf_dir, "orders").createOrReplaceTempView(view)
    return spark.sql(
        f"""select o_orderstatus, o_orderpriority, count(*) as n from {view}
            group by grouping sets ((o_orderstatus), (o_orderpriority), ())"""
    )


@register(
    "not_exists_subquery",
    """
    select c_custkey from customer
    where not exists (
        select 1 from orders where o_custkey = c_custkey and o_orderstatus = 'P'
    )
    """,
)
def not_exists_subquery(spark, sf_dir):
    """Correlated NOT EXISTS (decorrelated by Catalyst into an anti
    join)."""
    _tbl(spark, sf_dir, "customer").createOrReplaceTempView("customer_sq_view")
    _tbl(spark, sf_dir, "orders").createOrReplaceTempView("orders_sq_view")
    return spark.sql(
        """select c_custkey from customer_sq_view
           where not exists (select 1 from orders_sq_view
                             where o_custkey = c_custkey and o_orderstatus = 'P')"""
    )


@register(
    "deterministic_sample",
    """
    select event_id, event_type from events
    where ('0x' || substr(md5(cast(event_id as varchar)), 1, 8))::bigint % 100 < 10
    """,
)
def deterministic_sample(spark, sf_dir):
    """Portable deterministic ~10% sample by content hash (md5 of the key
    — reproducible across engines/runs, unlike TABLESAMPLE/rand()).
    Scale: pure scan-side predicate, prunes nothing but shuffles nothing."""
    ev = _tbl(spark, sf_dir, "events")
    bucket = F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10).cast("long") % 100
    return ev.filter(bucket < 10).select("event_id", "event_type")


@register(
    "approx_distinct",
    """
    select date_trunc('day', ts) as day,
           count(distinct event_type) as approx_event_types,
           count(distinct user_id) as approx_users,
           count(distinct event_type) as exact_event_types,
           count(distinct user_id) as exact_users
    from events group by 1
    """,
)
def approx_distinct(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++): sketch-based distinct at
    scale — a single map-side-combinable hash aggregate, no exact-distinct
    Expand. Oracled in the sketch's EXACT regime (VERDICT r4 item 7): at
    rsd=0.005 the register array resolves per-day cardinalities of ~5
    event types and ~135 users with zero error (verified at sf0.001 and
    sf0.01 — the driver's SF — where approx == exact on every day; HLL is
    hash-deterministic, so the value cannot flap between runs). The oracle
    states the exact distinct for both columns. The genuinely-approximate
    regime (default rsd=0.05 on the full user_id domain) keeps its
    bounded-error property pin in tests/test_timeseries_ops.py.

    r17 census fix (144.6 s at sf0.1 -> sub-second): mixing the two
    rsd=0.005 HLL sketches into the SAME aggregate as two Expand-based
    COUNT(DISTINCT)s made Spark key the partial aggregate on
    (day, gid, distinct-col) — one ~48 KB p=16 register array PER
    (day x distinct value) group instead of per day, exploding sketch
    state with corpus cardinality. The sketch pass and the exact pass
    now run as separate day-keyed aggregates joined on |days| rows —
    each is map-side combinable with bounded state, the shape a 100 TB
    rollup needs anyway."""
    ev = _tbl(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    hll = ev.groupBy(day).agg(
        F.approx_count_distinct("event_type", 0.005).alias("approx_event_types"),
        F.approx_count_distinct("user_id", 0.005).alias("approx_users"),
    )
    exact = ev.groupBy(day).agg(
        F.count_distinct("event_type").alias("exact_event_types"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    return hll.join(exact, "day").select(
        "day",
        "approx_event_types",
        "approx_users",
        "exact_event_types",
        "exact_users",
    )


@register(
    "text_tfidf",
    r"""
    with toks as (
        select doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) as token
        from documents
    ),
    tf as (select doc_id, token, count(*) as tf from toks group by 1, 2),
    df as (select token, count(distinct doc_id) as df from toks group by 1),
    n as (select count(*) as n from documents)
    select tf.doc_id, tf.token, tf.tf,
           round(tf.tf * ln(cast(n.n as double) / df.df), 6) as tfidf
    from tf join df on tf.token = df.token cross join n
    """,
)
def text_tfidf(spark, sf_dir):
    """TF-IDF over the corpus: explode -> tf per (doc, token), df per
    token, idf = ln(N/df). One explode + two keyed shuffles; the df table
    is tiny and broadcast into the final join."""
    docs = _tbl(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(T.tokens(F.lower(F.trim(F.col("text"))))).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfreq = toks.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    # corpus size as an in-plan 1-row aggregate attached via broadcast
    # cross join (NOT a driver .count(): that re-ran the scan as its own
    # job before the real one). The resulting BroadcastNestedLoopJoin has
    # a single-row build side — a constant-time probe per row, O(n); the
    # plan lint whitelists exactly this scalar-attach shape.
    n = docs.agg(F.count("*").alias("__n"))
    return (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id", "token", "tf",
            F.round(
                F.col("tf") * F.log(F.col("__n").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )


@register(
    "text_chunking",
    r"""
    with w as (
        select doc_id, string_split_regex(trim(text), '\s+') as ws from documents
    )
    select doc_id, start,
           array_to_string(ws[start:start+23], ' ') as chunk
    from w, unnest(range(1, len(ws) + 1, 16)) as t(start)
    """,
)
def text_chunking(spark, sf_dir):
    """Fixed-size token chunking with overlap (24-token chunks, stride 16)
    — the training-data windowing step. Pure per-row explode, no
    shuffle."""
    docs = _tbl(spark, sf_dir, "documents")
    toks = T.tokens(F.trim(F.col("text")))
    n = F.size(toks)
    starts = F.sequence(F.lit(1), n, F.lit(16))
    return docs.select(
        "doc_id",
        F.explode(starts).alias("start"),
        toks.alias("__ws"),
    ).select(
        "doc_id",
        F.col("start").cast("long").alias("start"),
        F.concat_ws(" ", F.slice("__ws", F.col("start"), 24)).alias("chunk"),
    )


def _near_dup_oracle(dim: int = 64, n_planes: int = 6, seed: int = 42) -> str:
    """DuckDB oracle for embedding_near_dup: the hyperplanes are seeded
    Rademacher +/-1 vectors computed on the driver (S.hyperplanes), so the
    SAME constants can be embedded as SQL literals — the bucket ids are
    deterministic, not engine-hash state, making this LSH entry fully
    oracle-able. Projection/cosine mirror the Spark expression sequence
    (sequential double fold == list_dot_product on DOUBLE[])."""
    planes = S.hyperplanes(dim, n_planes, seed)

    def lit(plane):
        return "[" + ", ".join(f"{v:.1f}" for v in plane) + "]::DOUBLE[]"

    bucket = " + ".join(
        f"{1 << i} * (case when list_dot_product(embedding::DOUBLE[], {lit(p)})"
        " >= 0 then 1 else 0 end)"
        for i, p in enumerate(planes)
    )
    norm = (
        "sqrt(list_dot_product({0}.embedding::DOUBLE[], {0}.embedding::DOUBLE[]))"
    )
    denom = f"({norm.format('a')} * {norm.format('c')})"
    return f"""
    with b as (
        select vec_id, embedding, {bucket} as bucket
        from embeddings
    ),
    pairs as (
        select a.vec_id as id_a, c.vec_id as id_b,
               round(case when {denom} = 0 then 0.0
                          else list_dot_product(a.embedding::DOUBLE[],
                                                c.embedding::DOUBLE[]) / {denom}
                     end, 6) as cos
        from b a join b c on a.bucket = c.bucket and a.vec_id < c.vec_id
    )
    select distinct id_a, id_b, cos from pairs where cos >= 0.3
    """


@register("embedding_near_dup", _near_dup_oracle())
def embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs via LSH bucket join (never
    cartesian). Plan shape pinned in tests. The hyperplanes are seeded
    driver-side constants (not engine hash state), so unlike the
    minhash/simhash entries this one carries a full DuckDB oracle with the
    same +/-1 plane literals baked into the SQL."""
    return S.pairwise_similar_lsh(
        _tbl(spark, sf_dir, "embeddings"), threshold=0.3, n_planes=6
    )


@register(
    "streaming_stateful_first_seen",
    """
    select user_id, min(ts) as first_ts, count(*) as n
    from events group by user_id
    """,
)
def streaming_stateful_first_seen(spark, sf_dir):
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user first-seen timestamp + running count carried in the state
    store; one availableNow batch must equal the batch aggregation."""
    from database_extractor_spark.streaming import streaming_first_seen

    return streaming_first_seen(spark, os.path.join(sf_dir, "events.parquet"))


@register(
    "pandas_ema",
    """
    with recursive base as (
        select user_id, ts, value,
               row_number() over (partition by user_id order by ts, value) as rn
        from events where event_type = 'purchase'
    ),
    rec as (
        select user_id, ts, value, rn, value as ema from base where rn = 1
        union all
        select b.user_id, b.ts, b.value, b.rn, 0.3 * b.value + 0.7 * r.ema
        from rec r join base b on b.user_id = r.user_id and b.rn = r.rn + 1
    )
    select user_id, ts, value, round(ema, 6) as ema from rec
    """,
)
def pandas_ema(spark, sf_dir):
    """Per-key EMA via the applyInPandas extension point (Arrow-batched,
    one worker per key group) — the canonical sequential-recurrence
    operator relational algebra can't express. Also pinned against an
    explicit Python recurrence in tests/test_pandas_ext.py.

    Oracled since round 4: DuckDB replays the recurrence as a recursive
    CTE stepping row_number per key (all keys advance per iteration, so
    iterations = max rows per key, not total rows). pandas
    ``ewm(adjust=False)`` and ``0.3*v + 0.7*e`` agree to ~1e-14 over the
    ≈10² steps a key sees here; both sides round to 6 dp, far above the
    drift, so the value-hash compare is exact."""
    from database_extractor_spark.operators.pandas_ext import grouped_ema

    ev = _tbl(spark, sf_dir, "events").filter("event_type = 'purchase'")
    out = grouped_ema(ev, ["user_id"], "ts", "value", alpha=0.3)
    return out.withColumn("ema", F.round("ema", 6))


@register(
    "csv_source_roundtrip",
    "select event_type, count(*) as n from events group by event_type",
)
def csv_source_roundtrip(spark, sf_dir):
    """CSV source/sink parity (reference O13 writes dated CSVs): write
    events as CSV, read back through read_source, aggregate — no rows
    lost and types re-infer correctly."""
    ev = _tbl(spark, sf_dir, "events").select("event_id", "event_type", "value")
    out = os.path.join(tempfile.mkdtemp(prefix="csvrt_"), "events_csv")
    ev.write.mode("overwrite").option("header", "true").csv(out)
    back = read_source(spark, out + "/", fmt="csv")
    return back.groupBy("event_type").agg(F.count("*").alias("n"))


@register(
    "xml_source_roundtrip",
    """
    select event_type, count(*) as n,
           cast(sum(cast(floor(value * 1000.0) as bigint)) as bigint)
               as value_millis
    from events group by event_type
    """,
)
def xml_source_roundtrip(spark, sf_dir):
    """XML source/sink parity — Spark 4's BUILT-IN xml format (the
    spark-xml package folded into core), completing the file-format
    matrix (parquet/csv/json/text/orc/jdbc/custom-python + xml; avro
    stays out — it ships as an external module this container can't
    add). Events round-trip through ``<row>`` elements with schema
    re-inference, then aggregate: no rows lost, numerics re-infer
    (value comes back double — the quantized sum proves values, not
    just counts, survive). Scale: XML is a splittable-by-rowTag text
    source; like csv/json it is an INGEST format — the first job
    converts to parquet, nobody scans XML twice."""
    ev = _tbl(spark, sf_dir, "events").select("event_id", "event_type", "value")
    out = os.path.join(tempfile.mkdtemp(prefix="xmlrt_"), "events_xml")
    (
        ev.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "events")
        .option("rowTag", "row")
        .save(out)
    )
    back = spark.read.format("xml").option("rowTag", "row").load(out)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.floor(F.col("value") * 1000.0).cast("bigint"))
        .cast("bigint")
        .alias("value_millis"),
    )


@register(
    "jdbc_source_roundtrip",
    "select event_type, count(*) as n from events group by event_type",
)
def jdbc_source_roundtrip(spark, sf_dir):
    """JDBC source with range-partitioned parallel reads (the
    BASELINE-approved live-database mapping, here against Spark's bundled
    embedded Derby): write events over JDBC, read back sliced into 4
    partition queries, aggregate — no rows lost.

    The ``first()`` below fetches partition bounds with one scalar query —
    standard JDBC-read practice, fine for this 3-row Derby check. At scale
    the bounds should come from catalog statistics or pipeline config
    instead (a MAX() over a large un-indexed table is a full scan on the
    database side, and a driver round-trip per query); ``read_jdbc``
    accepts them as plain arguments for exactly that reason."""
    from database_extractor_spark.sources import read_jdbc

    url = "jdbc:derby:memory:registrydb;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    ev = _tbl(spark, sf_dir, "events").select("event_id", "event_type", "value")
    (ev.write.format("jdbc").option("url", url).option("dbtable", "events_t")
     .option("driver", driver).mode("overwrite").save())
    hi = ev.agg(F.max("event_id")).first()[0]
    back = read_jdbc(
        spark, url, "events_t", partition_column="event_id",
        lower_bound=0, upper_bound=int(hi) + 1, num_partitions=4, driver=driver,
    )
    return back.groupBy("event_type").agg(F.count("*").alias("n"))


@register(
    "json_source_roundtrip",
    "select event_type, count(*) as n from events group by event_type",
)
def json_source_roundtrip(spark, sf_dir):
    """JSON-lines source/sink roundtrip through read_source."""
    ev = _tbl(spark, sf_dir, "events").select("event_id", "event_type", "value")
    out = os.path.join(tempfile.mkdtemp(prefix="jsonrt_"), "events_json")
    ev.write.mode("overwrite").json(out)
    back = read_source(spark, out + "/", fmt="json")
    return back.groupBy("event_type").agg(F.count("*").alias("n"))


@register(
    "text_repetition",
    r"""
    with t as (
        select doc_id, string_split_regex(lower(trim(text)), '\s+') as toks
        from documents
    )
    select doc_id,
           cast(len(toks) as integer) as n_tokens,
           cast(len(list_distinct(toks)) as integer) as n_distinct,
           round(cast(len(list_distinct(toks)) as double) / greatest(len(toks), 1), 4)
             as distinct_ratio
    from t
    """,
)
def text_repetition(spark, sf_dir):
    """Repetition/diversity metric: distinct-token ratio per document
    (low ratio = boilerplate/spam candidate). Per-row array ops only."""
    docs = _tbl(spark, sf_dir, "documents")
    toks = T.tokens(F.lower(F.trim(F.col("text"))))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.round(
            F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1)), 4
        ).alias("distinct_ratio"),
    )


@register(
    "text_unigram_logprob",
    r"""
    with toks as (
        select doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) as token
        from documents
    ),
    freq as (select token, count(*) as c from toks group by 1),
    total as (select count(*) as total from toks)
    select t.doc_id,
           round(sum(ln(cast(f.c as double) / total.total))
                 / count(*), 4) as avg_logprob
    from toks t join freq f on t.token = f.token cross join total
    group by t.doc_id
    """,
)
def text_unigram_logprob(spark, sf_dir):
    """Corpus-unigram LM score per document (mean token log-probability)
    — the cheap perplexity proxy used to rank training data. The per-doc
    sum of ln(c/total) is FP-order-sensitive across engines, but with
    ≲10² tokens/doc the drift is ~1e-14 — far inside the 4 dp round that
    both sides apply, so the oracle compare stays exact."""
    docs = _tbl(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(T.tokens(F.lower(F.trim(F.col("text"))))).alias("token")
    )
    freq = toks.groupBy("token").agg(F.count("*").alias("c"))
    # corpus token total in-plan (1-row agg attached via broadcast cross
    # join — the scalar-attach shape the plan lint whitelists) instead of
    # a driver .count() that re-ran the tokenize+explode scan as a whole
    # extra job per invocation
    total = toks.agg(F.count("*").alias("__total"))
    scored = (
        toks.join(F.broadcast(freq), "token")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.log(F.col("c").cast("double") / F.col("__total").cast("double")).alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.round(F.sum("lp") / F.count("*"), 4).alias("avg_logprob")
    )


@register(
    "range_join_counts",
    """
    select o.o_orderpriority, count(*) as n
    from (select l_shipdate,
                 l_shipdate + interval 7 day as l_enddate
          from lineitem where l_quantity >= 49) l
    join orders o on o.o_orderdate between l.l_shipdate and l.l_enddate
    group by o_orderpriority
    """,
)
def range_join_counts(spark, sf_dir):
    """Point-in-interval range join (orders placed within a week of a
    high-quantity shipment), AGGREGATED — and therefore executed with
    the aggregation PUSHED THROUGH the range join (r17 census fix):
    the general pair-producing form (operators.timeseries.range_join,
    the bucketed equi-join rewrite) materializes |intervals| x
    points-per-interval pairs, and since BOTH sides grow with SF the
    pair set grows ~SF^2 — measured 1.2G pairs / 34 s at sf1 and a
    projected ~120G pairs at sf10 (the warm-up run was killed at 10+
    min). For a COUNT-shaped consumer none of those pairs need to
    exist: orders pre-aggregate to per-(day, priority) counts (bounded
    by calendar x priorities, broadcastable at any SF), each interval
    explodes into its 8 covered days (a fixed x8, not data-dependent
    fan), and the equi-join on the day attaches pre-summed counts —
    identical result, cost linear in |intervals|. Catalyst cannot do
    this rewrite itself (the aggregate is above a non-equi join in the
    logical plan); it is the hand-applied partial-aggregation-pushdown
    a 100 TB engine needs for aggregate-over-range-join, while
    range_join stays the right operator when the pairs themselves are
    the output (asof/enrichment shapes)."""
    li = (
        _tbl(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 49)
        .select("l_shipdate")
    )
    od = (
        _tbl(spark, sf_dir, "orders")
        .groupBy("o_orderdate", "o_orderpriority")
        .agg(F.count("*").alias("__n"))
    )
    days = li.select(
        F.explode(
            F.sequence(
                F.col("l_shipdate"), F.date_add(F.col("l_shipdate"), 7)
            )
        ).alias("d")
    )
    return (
        days.join(F.broadcast(od), days.d == od.o_orderdate)
        .groupBy("o_orderpriority")
        .agg(F.sum("__n").cast("bigint").alias("n"))
    )


@register(
    "window_frames",
    """
    select event_id,
           cast(sum(cast(value as decimal(18,6)))
                over (partition by event_type order by ts, event_id
                      rows between 3 preceding and current row) as double) as moving_sum,
           lead(value) over (partition by event_type order by ts, event_id) as next_val,
           nth_value(value, 2)
               over (partition by event_type order by ts, event_id
                     rows between unbounded preceding and current row) as second_val
    from events
    """,
)
def window_frames(spark, sf_dir):
    """Explicit window frames: a bounded ROWS frame (4-point moving sum,
    decimal-exact so frame-order FP drift can't break the oracle), lead(),
    and nth_value() over a running frame. Ordering key (ts, event_id) is
    unique, so every frame is deterministic."""
    ev = _tbl(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w.rowsBetween(-3, Window.currentRow))
        .cast("double")
        .alias("moving_sum"),
        F.lead("value").over(w).alias("next_val"),
        F.nth_value("value", 2)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("second_val"),
    )


@register(
    "stat_funcs",
    """
    select l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) as qp_corr,
           round(stddev_samp(l_quantity), 6) as qty_sd,
           round(var_samp(l_quantity), 6) as qty_var,
           round(covar_samp(l_quantity, l_extendedprice), 4) as qp_cov,
           round(regr_slope(l_extendedprice, l_quantity), 4) as price_per_qty
    from lineitem group by l_returnflag
    """,
)
def stat_funcs(spark, sf_dir):
    """Statistical aggregates (corr / stddev / variance / covariance /
    regression slope). Both engines use single-pass co-moment updates
    whose drift is ~1e-12 relative — orders of magnitude inside the
    rounds applied on both sides, so the compare stays exact. corr is
    composed as try_divide(covar_samp, sd*sd) because Spark's built-in
    corr THROWS under ANSI on a zero-variance group where DuckDB
    returns NULL (degenerate audit r15) — the composition returns the
    same NULL and is round-6-identical on non-degenerate groups."""
    li = _tbl(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.try_divide(
                F.covar_samp("l_quantity", "l_extendedprice"),
                F.stddev_samp("l_quantity")
                * F.stddev_samp("l_extendedprice"),
            ),
            6,
        ).alias("qp_corr"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("qty_sd"),
        F.round(F.var_samp("l_quantity"), 6).alias("qty_var"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("qp_cov"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("price_per_qty"),
    )


@register(
    "orc_source_roundtrip",
    """
    select event_type, count(*) as n,
           cast(sum(cast(value as decimal(18,6))) as double) as sum_val
    from events group by event_type
    """,
)
def orc_source_roundtrip(spark, sf_dir):
    """ORC source/sink parity: write events as ORC (Spark-native columnar
    alternative to parquet), read back through read_source, aggregate.
    The oracle reads the original parquet — equality proves the roundtrip
    is lossless including timestamp/double fidelity."""
    ev = _tbl(spark, sf_dir, "events").select("event_type", "value")
    out = os.path.join(tempfile.mkdtemp(prefix="orcrt_"), "events_orc")
    ev.write.mode("overwrite").orc(out)
    back = read_source(spark, out + "/", fmt="orc")
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        R.exact_sum("value", "sum_val", scale=6),
    )


@register(
    "stratified_sample",
    """
    select event_type, count(*) as n
    from events
    where ('0x' || substr(md5(cast(event_id as varchar)), 1, 8))::bigint % 100
          < case event_type when 'click' then 10 when 'view' then 25 else 50 end
    group by event_type
    """,
)
def stratified_sample(spark, sf_dir):
    """Stratified deterministic sampling (sampleBy analog): per-stratum
    fractions via the same portable md5 hash-mod as deterministic_sample
    — downsample dominant classes harder, reproducibly across engines.
    Scale: pure scan-side predicate, no shuffle before the count."""
    ev = _tbl(spark, sf_dir, "events")
    bucket = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10).cast("long")
        % 100
    )
    frac = (
        F.when(F.col("event_type") == "click", 10)
        .when(F.col("event_type") == "view", 25)
        .otherwise(50)
    )
    return ev.filter(bucket < frac).groupBy("event_type").agg(F.count("*").alias("n"))


@register(
    "salted_agg",
    """
    select o_custkey, cast(count(*) as bigint) as n,
           cast(sum(cast(o_totalprice as decimal(18,4))) as double) as total
    from orders group by o_custkey
    """,
)
def salted_agg(spark, sf_dir):
    """Two-stage salted aggregation: stage 1 groups by (key, salt) to
    spread a hot key over 16 reducers, stage 2 re-aggregates partials by
    key. The oracle is the PLAIN group-by — proving salting is a pure
    physical rewrite (decimal sums keep re-aggregation exact). This is
    the skew escape hatch when one key holds a double-digit share of
    rows and AQE's skew split can't help a single hash-agg key."""
    o = _tbl(spark, sf_dir, "orders")
    salt = (F.xxhash64("o_orderkey") % 16).cast("int")
    partial = (
        o.withColumn("__salt", salt)
        .groupBy("o_custkey", "__salt")
        .agg(
            F.count("*").alias("pn"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("pt"),
        )
    )
    return partial.groupBy("o_custkey").agg(
        F.sum("pn").cast("bigint").alias("n"),
        F.sum("pt").cast("double").alias("total"),
    )


@register(
    "dedup_clusters",
    r"""
    with recursive pairs as (
        with words as (
            -- coalesce mirrors the engine's shingles(): NULL text ->
            -- the single ''-shingle (degenerate audit r15)
            select doc_id,
                   string_split_regex(trim(coalesce(text, '')), '\s+') as ws
            from documents
        ),
        sh as (
            select doc_id, unnest(list_distinct(
                [array_to_string(ws[i:i+2], ' ') for i in range(1, greatest(len(ws) - 2, 1) + 1)]
            )) as s
            from words
        ),
        sizes as (select doc_id, count(*) as n from sh group by doc_id),
        common as (
            select a.doc_id as id_a, b.doc_id as id_b, count(*) as c
            from sh a join sh b on a.s = b.s and a.doc_id < b.doc_id
            group by 1, 2
        )
        select id_a, id_b
        from common
          join sizes s1 on id_a = s1.doc_id
          join sizes s2 on id_b = s2.doc_id
        where round(c / (s1.n + s2.n - c), 4) >= 0.5
    ),
    edges as (select id_a as u, id_b as v from pairs union select id_b, id_a from pairs),
    reach as (
        select u, v from edges
        union
        select r.u, e.v from reach r join edges e on r.v = e.u where e.v <> r.u
    )
    select u as doc_id, least(u, min(v)) as cluster_id
    from reach group by u
    """,
)
def dedup_clusters(spark, sf_dir):
    """Near-duplicate CLUSTERING: exact-jaccard pairs (>= 0.5) fed through
    iterative min-label connected components — the step that turns
    pairwise hits into per-document dedup decisions (cluster_id = min
    doc_id in the component; keep one row per cluster downstream). The
    oracle recomputes the same components with a recursive-CTE transitive
    closure, so the iterative Spark fixpoint is checked end-to-end."""
    return _dedup_clusters_frame(spark, sf_dir)


def _dedup_clusters_frame(spark, sf_dir):
    """The dedup_clusters plan as a shared helper — the sanctioned
    frame-sharing route (r17 composition lint: entries may share
    DEFINITIONS through named helpers; an entry invoking another
    entry's callable hides re-paid scans, the r16 kappa incident).
    Consumers: dedup_clusters, dedup_canonical_pick,
    dup_cluster_histogram."""
    pairs = D.ngram_jaccard_pairs(_tbl(spark, sf_dir, "documents"), threshold=0.5)
    return D.connected_components(pairs.select("id_a", "id_b"))


def _canonical_pick_oracle() -> str:
    """Oracle for dedup_canonical_pick: re-run the clustering oracle as a
    derived table (the dedup_exact_substring_apply pattern — DuckDB
    allows WITH RECURSIVE inside a FROM subquery), then pick each
    cluster's survivor with the same window."""
    return f"""
    with cl as (select doc_id, cluster_id from ({ORACLE["dedup_clusters"]})),
    j as (
        select cl.doc_id, cl.cluster_id, d.n_chars
        from cl join documents d using (doc_id)
    )
    select doc_id, cluster_id,
           first_value(doc_id) over (
               partition by cluster_id order by n_chars desc, doc_id
           ) as canonical_id,
           doc_id = first_value(doc_id) over (
               partition by cluster_id order by n_chars desc, doc_id
           ) as is_canonical
    from j
    order by cluster_id, doc_id
    """


@register("dedup_canonical_pick", _canonical_pick_oracle())
def dedup_canonical_pick(spark, sf_dir):
    """Survivorship — the decision step BETWEEN clustering and deletion
    that every dedup pipeline needs: within each near-duplicate cluster
    (dedup_clusters' components), elect the canonical document (longest
    text, ties to the smallest doc_id — the 'keep the richest copy'
    policy) and emit the doc -> canonical remap plus the keep flag.
    Downstream, non-canonical rows are dropped and references remap to
    canonical_id; the remap table is exactly what an incremental corpus
    needs to redirect citations/links of deleted duplicates. Spark-
    first: one join to attach the tie-break feature, one
    cluster-partitioned first_value window — clusters are tiny by
    construction, so the window shuffles on cluster_id and parallelizes
    across clusters. The oracle replays clustering (recursive-CTE
    closure) and the same election window."""
    clusters = _dedup_clusters_frame(spark, sf_dir)
    docs = _tbl(spark, sf_dir, "documents").select("doc_id", "n_chars")
    j = clusters.join(docs, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    canonical = F.first("doc_id").over(w)
    return j.select(
        "doc_id",
        "cluster_id",
        canonical.alias("canonical_id"),
        (F.col("doc_id") == canonical).alias("is_canonical"),
    )


@register(
    "streaming_join_static",
    """
    select date_trunc('hour', e.ts) as window_start, c.c_mktsegment,
           count(*) as n,
           cast(sum(cast(e.value as decimal(18,6))) as double) as sum_val
    from events e join customer c on e.user_id = c.c_custkey
    group by 1, 2
    """,
)
def streaming_join_static(spark, sf_dir):
    """Stream-static enrichment join: the events stream joins the customer
    dimension (broadcast — the canonical streaming lookup pattern; the
    static side is re-read per micro-batch, no state), then a tumbling
    hourly aggregate, executed with the availableNow trigger. Oracle =
    the equivalent batch join/aggregate, proving the incremental plan
    converges to the batch answer."""
    from database_extractor_spark.streaming import (
        adaptive_state_partitions,
        run_available_now,
        stream_source,
    )

    _src = os.path.join(sf_dir, "events.parquet")
    stream = stream_source(spark, _src)
    cust = _tbl(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = stream.join(F.broadcast(cust), stream["user_id"] == cust["c_custkey"])
    agg = joined.groupBy(
        F.window("ts", "1 hour").getField("start").alias("window_start"),
        "c_mktsegment",
    ).agg(
        F.count("*").alias("n"),
        R.exact_sum("value", "sum_val", scale=6),
    )
    return run_available_now(
        spark, agg, state_partitions=adaptive_state_partitions(spark, _src)
    )


@register(
    "multimodal_frame_sample",
    """
    select doc_id,
           cast(unnest(range(0, 24 + doc_id % 100, 10)) as bigint) as frame_idx
    from documents
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    """Video frame-sampling plan: each clip row expands into the frame
    indices a decoder would pull (every 10th frame; clip length derived
    deterministically from doc_id since the fixture has no real video).
    The explode-of-sequence expansion is the real Spark plumbing; the
    per-frame decode is the stubbed step (operators.multimodal)."""
    docs = _tbl(spark, sf_dir, "documents").select("doc_id")
    from database_extractor_spark.operators.multimodal import frame_sample_plan

    clips = docs.withColumn("n_frames", (F.lit(24) + F.col("doc_id") % 100).cast("long"))
    return frame_sample_plan(clips, every_n=10).select(
        "doc_id", F.col("frame_idx").cast("long").alias("frame_idx")
    )


@register(
    "o14_pickle_sink_roundtrip",
    """
    select event_type, count(*) as n,
           cast(sum(cast(value as decimal(18,6))) as double) as sum_val
    from events group by event_type
    """,
)
def o14_pickle_sink_roundtrip(spark, sf_dir):
    """O14 pickle sink parity (reference main.py:72 pickles the day's
    DataFrame): the Spark-native serialized form is parquet via
    sinks.write_parquet. Write events through the sink, read back,
    aggregate; the oracle reads the ORIGINAL table — equality proves the
    sink+source roundtrip is lossless."""
    from database_extractor_spark.sinks import write_parquet

    ev = _tbl(spark, sf_dir, "events").select("event_type", "value")
    out = os.path.join(tempfile.mkdtemp(prefix="pklrt_"), "events_pickle_parity")
    write_parquet(ev, out)
    back = read_source(spark, out + "/")
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        R.exact_sum("value", "sum_val", scale=6),
    )


@register(
    "streaming_stream_stream_join",
    """
    select c.event_id as click_id, p.event_id as purchase_id
    from events c join events p
      on c.user_id = p.user_id
     and c.event_type = 'click' and p.event_type = 'purchase'
     and p.ts > c.ts and p.ts <= c.ts + interval 1 hour
    """,
)
def streaming_stream_stream_join(spark, sf_dir):
    """Stream-stream interval join (funnel attribution: purchase within
    1 h of a click by the same user). Both sides carry watermarks so the
    join state is evicted once the interval can no longer match — the
    bounded-state form of the batch equi+range join the oracle runs.
    Inner matches emit immediately in append mode, so availableNow over
    the bounded fixture yields exactly the batch pair set."""
    from database_extractor_spark.streaming import (
        adaptive_state_partitions,
        run_available_now,
        stream_source,
    )

    path = os.path.join(sf_dir, "events.parquet")
    clicks = (
        stream_source(spark, path)
        .filter(F.col("event_type") == "click")
        .withWatermark("ts", "1 hour")
        .select(F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
    )
    purchases = (
        stream_source(spark, path)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "1 hour")
        .select(F.col("event_id").alias("purchase_id"), F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "c_user = p_user and p_ts > c_ts and p_ts <= c_ts + interval 1 hour"
        ),
    )
    return run_available_now(
        spark,
        joined.select("click_id", "purchase_id"),
        output_mode="append",
        state_partitions=adaptive_state_partitions(spark, path),
    )


@register(
    "profile_columns",
    """
    select 'event_id' as col_name,
           cast(count(*) - count(event_id) as bigint) as n_null,
           cast(count(distinct event_id) as bigint) as n_distinct,
           cast(min(event_id) as double) as min_v,
           cast(max(event_id) as double) as max_v
    from events
    union all
    select 'user_id', cast(count(*) - count(user_id) as bigint),
           cast(count(distinct user_id) as bigint),
           cast(min(user_id) as double), cast(max(user_id) as double)
    from events
    union all
    select 'value', cast(count(*) - count(value) as bigint),
           cast(count(distinct value) as bigint),
           min(value), max(value)
    from events
    """,
)
def profile_columns(spark, sf_dir):
    """Data-quality profiler: per-column null count, exact distinct
    count, min/max — the pre-training sanity pass over a new table. ONE
    scan + one aggregate emitting all columns' stats, then stack() to
    long form (the oracle's union-all re-scans; at 100 TB one pass is
    the only acceptable plan)."""
    ev = _tbl(spark, sf_dir, "events")
    agg = ev.agg(
        F.count("*").alias("n"),
        *[F.count(c).alias(f"c_{c}") for c in ("event_id", "user_id", "value")],
        *[F.count_distinct(F.col(c)).alias(f"d_{c}") for c in ("event_id", "user_id", "value")],
        *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in ("event_id", "user_id", "value")],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in ("event_id", "user_id", "value")],
    )
    stack = ", ".join(
        f"'{c}', cast(n - c_{c} as bigint), cast(d_{c} as bigint), mn_{c}, mx_{c}"
        for c in ("event_id", "user_id", "value")
    )
    return agg.selectExpr(
        f"stack(3, {stack}) as (col_name, n_null, n_distinct, min_v, max_v)"
    )


@register(
    "multimodal_audio_decode",
    """
    with b as (select doc_id, octet_length(encode(text)) as n from documents)
    select doc_id,
           -- NULL payload -> all-NULL metadata (degenerate audit r15);
           -- a bare CASE n % 3 sends NULL into the ELSE branch
           cast(case when n is null then null
                     when n % 3 = 0 then 8000
                     when n % 3 = 1 then 16000
                     else 44100 end as integer) as sample_rate,
           cast(n * 4 as bigint) as n_samples,
           round(n * 4 * 1000.0 /
                 (case when n % 3 = 0 then 8000
                       when n % 3 = 1 then 16000
                       else 44100 end), 4) as duration_ms
    from b
    """,
)
def multimodal_audio_decode(spark, sf_dir):
    """Audio-decode plumbing via mapInPandas (Arrow batches in, typed
    feature rows out) with the decoder stubbed to a deterministic fake —
    formulas mirrored in the oracle SQL; the real decoder drops into
    decode_audio_batch when an audio library exists."""
    from database_extractor_spark.operators.multimodal import attach_payload, fake_decode_audio

    d = attach_payload(_tbl(spark, sf_dir, "documents"), "text")
    return fake_decode_audio(d)


@register(
    "maintenance_compact",
    """
    select event_type, cast(count(*) as bigint) as n
    from events group by event_type
    """,
)
def maintenance_compact(spark, sf_dir):
    """Small-files compaction as a maintenance op: rewrite the events
    table at a target file size, read the compacted copy back, aggregate.
    Oracle reads the ORIGINAL — equality proves compaction is
    content-preserving."""
    from database_extractor_spark.sinks import compact_parquet

    ev = _tbl(spark, sf_dir, "events")
    out = os.path.join(tempfile.mkdtemp(prefix="compact_"), "events_compacted")
    compact_parquet(ev, out, target_file_bytes=32 * 1024 * 1024)
    back = read_source(spark, out + "/")
    return back.groupBy("event_type").agg(F.count("*").cast("bigint").alias("n"))


@register(
    "time_hierarchy_rollup",
    """
    select date_trunc('month', ts) as mo, date_trunc('day', ts) as d,
           cast(hour(ts) as integer) as hr,
           cast(count(*) as bigint) as n,
           cast(sum(cast(value as decimal(18,6))) as double) as sum_val
    from events
    group by rollup(date_trunc('month', ts), date_trunc('day', ts), hour(ts))
    """,
)
def time_hierarchy_rollup(spark, sf_dir):
    """Hypertable-style continuous-aggregate rollup: one pass emits the
    hour, day, month, and grand-total grains (ROLLUP over the derived
    time hierarchy). At scale this is the materialized summary a
    timeseries store maintains; here it is a single map-side-combined
    aggregate — coarser grains reuse the finer shuffle, not a re-scan."""
    ev = _tbl(spark, sf_dir, "events")
    return ev.rollup(
        F.date_trunc("month", "ts").alias("mo"),
        F.date_trunc("day", "ts").alias("d"),
        F.hour("ts").alias("hr"),
    ).agg(
        F.count("*").alias("n"),
        R.exact_sum("value", "sum_val", scale=6),
    )


@register(
    "approx_percentile_sketch",
    """
    select event_type,
           quantile_disc(value, 0.5) as p50,
           quantile_disc(value, 0.95) as p95
    from events group by event_type
    """,
)
def approx_percentile_sketch(spark, sf_dir):
    """Mergeable quantile sketch (approx_percentile). At accuracy >= group
    size the sketch degenerates to the exact nearest-rank element, which
    matches DuckDB quantile_disc — so THIS configuration is oracled
    exactly; the approximate regime's rank-error bound is pinned by
    tests/test_timeseries_ops.py. At 100 TB the sketch is the only option
    (bounded memory, mergeable across partitions); exact quantile_cont
    parity lives in percentile_agg."""
    ev = _tbl(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("approx_percentile(value, 0.5, 1000000)").alias("p50"),
        F.expr("approx_percentile(value, 0.95, 1000000)").alias("p95"),
    )


@register(
    "salted_join_agg",
    """
    select c.c_mktsegment, cast(count(*) as bigint) as n,
           cast(sum(cast(o.o_totalprice as decimal(18,4))) as double) as total
    from orders o join customer c on o.o_custkey = c.c_custkey
    group by c.c_mktsegment
    """,
)
def salted_join_agg(spark, sf_dir):
    """Skew-salted equi-join (relational.salted_join: left side salted
    into 16 sub-keys, right side exploded to match) followed by an
    aggregate. The oracle is the PLAIN join — proving salting is a pure
    physical rewrite, the escape hatch for a single pathological key AQE
    cannot split (decimal sums keep the aggregate exact)."""
    o = _tbl(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = _tbl(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = R.salted_join(
        o.withColumnRenamed("o_custkey", "k"),
        c.withColumnRenamed("c_custkey", "k"),
        on="k",
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("total"),
    )


@register(
    "regex_funcs",
    r"""
    select doc_id,
           regexp_extract(text, '([0-9]+)', 1) as first_number,
           cast(length(regexp_replace(text, '[aeiou]', '', 'g')) as integer) as len_novowels,
           cast(len(regexp_extract_all(text, '[A-Za-z]+')) as integer) as n_words
    from documents
    """,
)
def regex_funcs(spark, sf_dir):
    """Regex scalar surface: extract / global replace / extract-all.
    Both engines return '' for a non-matching extract, and Spark's
    regexp_replace is global by default (DuckDB needs the 'g' flag)."""
    d = _tbl(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([0-9]+)", 1).alias("first_number"),
        F.length(F.regexp_replace("text", r"[aeiou]", "")).alias("len_novowels"),
        F.size(F.regexp_extract_all("text", F.lit(r"[A-Za-z]+"), 0)).alias("n_words"),
    )


@register(
    "window_time_range_frame",
    """
    select event_id,
           cast(sum(cast(value as decimal(18,6)))
                over (partition by event_type order by ts
                      range between interval 10 minute preceding and current row)
                as double) as sum_10min
    from events
    """,
)
def window_time_range_frame(spark, sf_dir):
    """Time-based RANGE window frame: per event, the decimal-exact sum of
    the trailing 10 minutes within its type. Spark range frames need a
    numeric ordering key — epoch MICROseconds (a seconds cast would
    truncate sub-second timestamps and shift frame membership vs the SQL
    interval frame). RANGE frames are tie-safe (all rows at equal ts
    share a frame), so no unique tiebreak column is needed."""
    ev = _tbl(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-600 * 1_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double").alias("sum_10min"),
    )


@register(
    "dedup_incremental",
    f"""
    with k as (select doc_id, md5({_NORM}) as key from documents),
    existing as (select distinct key from k where doc_id < 250)
    select k.doc_id from k
    where k.doc_id >= 250 and k.key not in (select key from existing)
    """,
)
def dedup_incremental(spark, sf_dir):
    """Incremental dedup — the production crawl flow: drop incoming
    documents whose normalized fingerprint already exists in the corpus
    (here: ids >= 250 vs the 'existing' first half). A LEFT ANTI join on
    the 128-bit fingerprint — the corpus side ships 16-byte keys only,
    never text, and at 100 TB the corpus key set is a bucketed table the
    daily batch anti-joins against without reshuffling the corpus."""
    docs = _tbl(spark, sf_dir, "documents")
    keyed = T.with_fingerprint(docs, "text", "__key")
    existing = keyed.filter(F.col("doc_id") < 250).select("__key").distinct()
    incoming = keyed.filter(F.col("doc_id") >= 250)
    return incoming.join(existing, "__key", "left_anti").select("doc_id")


@register(
    "decontaminate_ngram_overlap",
    r"""
    with words as (
        select doc_id, string_split_regex(trim(text), '\s+') as ws from documents
    ),
    sh as (
        select doc_id, unnest(list_distinct(
            [array_to_string(ws[i:i+2], ' ') for i in range(1, greatest(len(ws) - 2, 1) + 1)]
        )) as s
        from words
    ),
    tr as (select * from sh where doc_id % 2 = 0),
    ev as (select * from sh where doc_id % 2 = 1),
    common as (
        select tr.doc_id as a, ev.doc_id as b, count(*) as c
        from tr join ev on tr.s = ev.s group by 1, 2
    )
    select distinct a as doc_id from common where c >= 3
    """,
)
def decontaminate_ngram_overlap(spark, sf_dir):
    """Train/eval decontamination: flag training documents sharing >= 3
    distinct 3-gram shingles with any eval document (fixture split: even
    ids train, odd ids eval). Same inverted-index equi-join shape as
    exact Jaccard — shuffle on the 8-byte shingle hash, never a cartesian
    — because contamination checks at corpus scale are exactly a
    cross-corpus near-dup sweep. Shingles come from the persisted
    per-content artifact (r16; see llm_ops._cached_shingle3)."""
    sh = _cached_shingle3(spark, sf_dir)
    tr = sh.filter(F.col("doc_id") % 2 == 0).withColumnRenamed("doc_id", "a")
    ev = sh.filter(F.col("doc_id") % 2 == 1).withColumnRenamed("doc_id", "b")
    common = tr.join(ev, "s").groupBy("a", "b").agg(F.count("*").alias("c"))
    return common.filter(F.col("c") >= 3).select(F.col("a").alias("doc_id")).distinct()


@register(
    "cap_per_group",
    """
    with ranked as (
        select doc_id, lang,
               row_number() over (partition by lang order by doc_id) as rn
        from documents
    )
    select doc_id, lang from ranked where rn <= 50
    """,
)
def cap_per_group(spark, sf_dir):
    """Per-group quota sampling (at most 50 docs per language) — the
    domain-balancing cap every corpus mix applies. row_number over a
    deterministic order + filter; one shuffle on the group key. For
    heavy-hitter groups at 100 TB, pre-filter each partition to its
    local top-50 by the same order before the shuffle (Spark's window
    already pushes a partial limit when the order is a prefix sort)."""
    docs = _tbl(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("doc_id")
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 50)
        .select("doc_id", "lang")
    )


@register(
    "null_safe_join",
    """
    with a as (select distinct nullif(event_type, 'click') as k from events),
    b as (select distinct nullif(event_type, 'view') as k from events)
    select a.k as k_a, b.k as k_b
    from a join b on a.k is not distinct from b.k
    """,
)
def null_safe_join(spark, sf_dir):
    """Null-safe equality join (Spark <=> / SQL IS NOT DISTINCT FROM):
    NULL keys match each other instead of vanishing — the semantics
    required when joining on nullable business keys. Still a hash
    equi-join (the null bucket is one key), not a nested loop."""
    ev = _tbl(spark, sf_dir, "events")
    a = ev.select(F.nullif("event_type", F.lit("click")).alias("k_a")).distinct()
    b = ev.select(F.nullif("event_type", F.lit("view")).alias("k_b")).distinct()
    return a.join(b, a["k_a"].eqNullSafe(b["k_b"]))


@register(
    "filtered_agg",
    """
    select o_orderpriority,
           cast(count(*) filter (where o_orderstatus = 'F') as bigint) as n_f,
           cast(count(*) filter (where o_orderstatus = 'O') as bigint) as n_o,
           cast(sum(cast(o_totalprice as decimal(18,4)))
                filter (where o_orderstatus = 'F') as double) as total_f
    from orders group by o_orderpriority
    """,
)
def filtered_agg(spark, sf_dir):
    """FILTER-clause aggregates (conditional aggregation): one pass, one
    shuffle, N conditions — the idiom that replaces N filtered scans.
    Spark expresses it as count/sum over CASE; empty groups yield NULL
    sums on both engines."""
    o = _tbl(spark, sf_dir, "orders")
    is_f = F.col("o_orderstatus") == "F"
    return o.groupBy("o_orderpriority").agg(
        F.count(F.when(is_f, 1)).alias("n_f"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_o"),
        F.sum(F.when(is_f, F.col("o_totalprice").cast("decimal(18,4)")))
        .cast("double")
        .alias("total_f"),
    )


@register(
    "scalar_subquery",
    """
    select o_orderkey, o_totalprice
    from orders
    where o_totalprice > 1.5 * (
        select cast(avg(cast(o_totalprice as decimal(18,4))) as double) from orders
    )
    """,
)
def scalar_subquery(spark, sf_dir):
    """Scalar subquery through the SQL FRONT-END (spark.sql over a temp
    view) — the engine's full SQL surface, not just the DataFrame API.
    Catalyst plans the subquery as a one-row broadcast, not a per-row
    re-execution; the decimal-cast avg keeps the threshold bit-identical
    across engines so no boundary row can flip. Threshold is 1.5x the
    mean (not 2x): at sf0.01 no order exceeds 2x, which made the round-3
    compare a vacuous 0-row pass; 1.5x exercises the predicate boundary
    with a few thousand qualifying rows."""
    _tbl(spark, sf_dir, "orders").createOrReplaceTempView("orders_sq_v")
    return spark.sql(
        """
        select o_orderkey, o_totalprice
        from orders_sq_v
        where o_totalprice > 1.5 * (
            select cast(avg(cast(o_totalprice as decimal(18,4))) as double)
            from orders_sq_v
        )
        """
    )


@register(
    "posexplode_tokens",
    r"""
    with words as (
        select doc_id, string_split_regex(lower(trim(text)), '\s+') as ws
        from documents
    ),
    ex as (
        select doc_id,
               unnest([{'p': i - 1, 'tok': ws[i]} for i in range(1, len(ws) + 1)]) as u
        from words
    )
    select doc_id, cast(u.p as integer) as pos, u.tok as token from ex
    """,
)
def posexplode_tokens(spark, sf_dir):
    """Ordinal explode (posexplode): token position survives the
    flatten — required whenever downstream windows or chunkers need
    token order back after the explode."""
    docs = _tbl(spark, sf_dir, "documents")
    toks = T.tokens(F.lower(F.trim(F.col("text"))))
    return docs.select("doc_id", F.posexplode(toks).alias("pos", "token"))


@register(
    "federated_join",
    """
    select c.c_mktsegment, n.n_name,
           cast(count(*) as bigint) as n,
           cast(sum(cast(e.value as decimal(18,6))) as double) as sum_val
    from events e
      join customer c on e.user_id = c.c_custkey
      join nation n on c.c_nationkey = n.n_nationkey
    group by c.c_mktsegment, n.n_name
    """,
)
def federated_join(spark, sf_dir):
    """Federated query: a parquet fact table joined to a CSV dimension
    and a JDBC (embedded Derby) dimension in ONE plan — the
    database-extractor capability generalized: Catalyst plans across
    heterogeneous sources, broadcasts the small dims, and the oracle
    (reading only the parquet originals) proves no source loses or
    mangles rows. Schemas are declared on the CSV read (inference cannot
    be trusted for dims) and the JDBC dim reads in a single partition
    (it is broadcast-small)."""
    ev = _tbl(spark, sf_dir, "events")

    cust = _tbl(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment", "c_nationkey")
    csv_dir = os.path.join(tempfile.mkdtemp(prefix="fed_"), "customer_csv")
    cust.write.mode("overwrite").option("header", "true").csv(csv_dir)
    cust_csv = (
        spark.read.schema("c_custkey long, c_mktsegment string, c_nationkey int")
        .option("header", "true")
        .csv(csv_dir + "/")
    )

    url = "jdbc:derby:memory:feddb;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    nat = _tbl(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    (nat.write.format("jdbc").option("url", url).option("dbtable", "nation_t")
     .option("driver", driver).mode("overwrite").save())
    nat_jdbc = (
        spark.read.format("jdbc").option("url", url)
        .option("dbtable", "nation_t").option("driver", driver).load()
    )

    joined = (
        ev.join(F.broadcast(cust_csv), ev["user_id"] == cust_csv["c_custkey"])
        .join(F.broadcast(nat_jdbc), F.col("c_nationkey") == nat_jdbc["n_nationkey"])
    )
    return joined.groupBy("c_mktsegment", "n_name").agg(
        F.count("*").cast("bigint").alias("n"),
        R.exact_sum("value", "sum_val", scale=6),
    )


# ==========================================================================
# SQL front-end (library API analog — reference README.md:41-75)
# ==========================================================================

#: dialect-common SQL: the SAME text runs on Spark SQL and DuckDB, so the
#: query string IS its own oracle
_SQL_WINDOWED_CTE = """
    select o_custkey, o_orderkey, o_totalprice
    from (
        select o_custkey, o_orderkey, o_totalprice,
               row_number() over (
                   partition by o_custkey
                   order by o_totalprice desc, o_orderkey
               ) as rk
        from orders
    ) ranked
    where rk = 1
"""


@register("sql_windowed_cte", _SQL_WINDOWED_CTE)
def sql_windowed_cte(spark, sf_dir):
    """The session.sql() library entry point end-to-end: register the
    fixture views, run a windowed subquery (top order per customer,
    deterministic tiebreak) as ONE dialect-common SQL string — the
    identical text serves as the DuckDB oracle."""
    from database_extractor_spark.session import sql as run_sql

    return run_sql(spark, _SQL_WINDOWED_CTE, sf_dir=sf_dir)


# ==========================================================================


@register(
    "benford_digit_profile",
    """
    with d as (
        select substr(cast(cast(floor(o_totalprice) as bigint) as varchar),
                      1, 1) as digit
        from orders
        where o_totalprice >= 1.0
    ),
    cnt as (
        select digit, cast(count(*) as bigint) as n
        from d group by digit
    ),
    tot as (select cast(sum(n) as bigint) as t from cnt),
    exp_p as (
        select * from (values
            ('1', 0.30103), ('2', 0.176091), ('3', 0.124939),
            ('4', 0.09691), ('5', 0.079181), ('6', 0.066947),
            ('7', 0.057992), ('8', 0.051153), ('9', 0.045757)
        ) as v(digit, pd)
    ),
    expd as (select digit, cast(pd as double) as p from exp_p)
    select e.digit,
           coalesce(c.n, 0) as n,
           round(cast(coalesce(c.n, 0) as double)
                 / cast(t.t as double), 6) as obs_p,
           e.p as exp_p,
           round((cast(coalesce(c.n, 0) as double)
                  - cast(t.t as double) * e.p)
                 * (cast(coalesce(c.n, 0) as double)
                    - cast(t.t as double) * e.p)
                 / (cast(t.t as double) * e.p), 6) as chi2_term
    from expd e
    left join cnt c on e.digit = c.digit
    cross join tot t
    order by e.digit
    """,
)
def benford_digit_profile(spark, sf_dir):
    """BENFORD'S-LAW first-digit profile over order totals — the
    classic fabricated-data / pipeline-corruption screen (organically
    generated magnitudes follow P(d) = log10(1 + 1/d); a synthetic or
    truncated feed flattens the curve, and the per-digit chi-square
    terms localize WHICH digit band drifted). The first significant
    digit is extracted WITHOUT float formatting (cross-engine repr of
    doubles differs): floor -> exact bigint -> string -> substr, so
    both engines classify identical digits. Expected probabilities are
    COMMITTED 6-dp constants (the _qc_weights/_LN_MICRO_TABLE
    discipline — no runtime log10 on either engine); observed shares
    and chi-square terms are one identical IEEE double expression, and
    the 9-row digit frame LEFT-joins counts so a digit absent from the
    data still reports (n=0, its full expected-count chi2 term) instead
    of vanishing. Scale: one map-side-combinable 9-group aggregate +
    two broadcast attaches (the 1-row total and the 9-row constant
    dim); nothing downstream exceeds 9 rows."""
    o = _tbl(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1.0)
    d = o.select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        ).alias("digit")
    )
    cnt = d.groupBy("digit").agg(F.count("*").cast("bigint").alias("n"))
    tot = cnt.agg(F.sum("n").cast("bigint").alias("t"))
    exp_p = spark.createDataFrame(
        [
            ("1", 0.30103), ("2", 0.176091), ("3", 0.124939),
            ("4", 0.09691), ("5", 0.079181), ("6", 0.066947),
            ("7", 0.057992), ("8", 0.051153), ("9", 0.045757),
        ],
        "digit string, p double",
    )
    n = F.coalesce("n", F.lit(0)).cast("bigint")
    nd = n.cast("double")
    expected = F.col("t").cast("double") * F.col("p")
    return (
        exp_p.join(F.broadcast(cnt), "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            n.alias("n"),
            F.round(nd / F.col("t").cast("double"), 6).alias("obs_p"),
            F.col("p").alias("exp_p"),
            F.round(
                (nd - expected) * (nd - expected) / expected, 6
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


#: dialect-common: GROUP BY ALL infers the grouping keys from the
#: non-aggregate select list on BOTH engines (Spark 3.4+/DuckDB), so the
#: query text is again its own oracle
_SQL_GROUP_BY_ALL = """
    select event_type, date_trunc('day', ts) as day,
           cast(count(*) as bigint) as n,
           cast(count(distinct user_id) as bigint) as n_users
    from events
    group by all
    order by event_type, day
"""


@register("sql_group_by_all", _SQL_GROUP_BY_ALL)
def sql_group_by_all(spark, sf_dir):
    """GROUP BY ALL through the SQL front end — the analyst-facing
    sugar (grouping keys inferred from the select list) that modern
    warehouses treat as table stakes; one dialect-common string runs
    verbatim on Spark SQL and DuckDB, so the text is its own oracle.
    Plan-wise it resolves to the identical hash aggregate as an
    explicit GROUP BY 1, 2 — the distinct-count expansion and the
    day-grain partial aggregation are unchanged."""
    from database_extractor_spark.session import sql as run_sql

    return run_sql(spark, _SQL_GROUP_BY_ALL, sf_dir=sf_dir)

