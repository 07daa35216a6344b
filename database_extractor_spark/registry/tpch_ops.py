"""TPC-H canon (all 22 queries + refresh), rank windows, rolling outliers, graph ops (rounds 6-7).

Split out of the flat registry.py in round 14; entry bodies are
unchanged — see registry/__init__.py for the aggregation contract.
"""
from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import Window
from pyspark.sql import DataFrame
from pyspark.sql import SparkSession

from database_extractor_spark.operators import core as C
from database_extractor_spark.operators import dedup as D
from database_extractor_spark.operators import relational as R
from database_extractor_spark.operators import similarity as S
from database_extractor_spark.operators import text as T

from database_extractor_spark.registry._base import (
    ORACLE,
    register,
    _tbl,
    _parquet_fingerprint,
    _path_bytes,
)

# Round 6: TPC-H canon (Q1/Q5/Q18), rank windows, rolling outliers,
# co-occurrence triangles, boilerplate sentence dedup
# ==========================================================================

@register(
    "tpch_q1_pricing_summary",
    """
    select l_returnflag, l_linestatus,
           cast(sum(cast(l_quantity as decimal(18,4))) as double) as sum_qty,
           cast(sum(cast(l_extendedprice as decimal(18,4))) as double)
               as sum_base_price,
           cast(sum(cast(floor(l_extendedprice * (1 - l_discount) * 10000.0)
                         as bigint)) as double) / 10000.0 as sum_disc_price,
           cast(sum(cast(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                               * 10000.0) as bigint)) as double) / 10000.0
               as sum_charge,
           cast(sum(cast(l_quantity as decimal(18,4))) as double) / count(*)
               as avg_qty,
           cast(sum(cast(l_extendedprice as decimal(18,4))) as double) / count(*)
               as avg_price,
           cast(sum(cast(l_discount as decimal(18,4))) as double) / count(*)
               as avg_disc,
           count(*) as count_order
    from lineitem
    where l_shipdate <= timestamp '2000-09-02'
    group by l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 (pricing summary report): the canonical scan-heavy
    single-pass aggregate — one shuffle on a 6-ish-key group, partial
    aggregation collapses everything map-side, the shipdate filter and
    7-column projection push to the parquet scan. Raw-column sums use the
    audited-safe per-addend DECIMAL cast; the derived products
    (disc_price, charge) use floor-quantized integer terms — products are
    exactly the structured-value shape that hit the ts_integral
    cross-engine rounding tie (see tests/test_round6_ops.py audit)."""
    li = _tbl(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp")
    )

    def dec_sum(c):
        return F.sum(F.col(c).cast("decimal(18,4)")).cast("double")

    disc = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    charge = disc * (F.lit(1) + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dec_sum("l_quantity").alias("sum_qty"),
        dec_sum("l_extendedprice").alias("sum_base_price"),
        (F.sum(F.floor(disc * F.lit(10000.0))) / F.lit(10000.0)).alias(
            "sum_disc_price"
        ),
        (F.sum(F.floor(charge * F.lit(10000.0))) / F.lit(10000.0)).alias(
            "sum_charge"
        ),
        (dec_sum("l_quantity") / F.count("*")).alias("avg_qty"),
        (dec_sum("l_extendedprice") / F.count("*")).alias("avg_price"),
        (dec_sum("l_discount") / F.count("*")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "tpch_q5_local_supplier",
    """
    select n_name,
           cast(sum(cast(floor(l_extendedprice * (1 - l_discount) * 10000.0)
                         as bigint)) as double) / 10000.0 as revenue
    from customer
    join orders on c_custkey = o_custkey
    join lineitem on l_orderkey = o_orderkey
    join supplier on l_suppkey = s_suppkey and c_nationkey = s_nationkey
    join nation on s_nationkey = n_nationkey
    join region on n_regionkey = r_regionkey
    where r_name = 'ASIA'
      and o_orderdate >= timestamp '1996-01-01'
      and o_orderdate < timestamp '1998-01-01'
    group by n_name
    order by revenue desc, n_name
    """,
)
def tpch_q5_local_supplier(spark, sf_dir):
    """TPC-H Q5 (local supplier volume): 6-table join where customer and
    supplier must share a nation — the classic join-ordering stress.
    Spark-first shape: region->nation prunes to the ASIA nation keys and
    BROADCASTs into supplier (tiny dims never shuffle the fact side);
    the lineitem-orders-customer chain shuffles on its natural keys with
    the date filter pushed into the orders scan; the c_nationkey =
    s_nationkey equality rides the supplier join as a second key, not a
    post-filter. Revenue uses tie-proof floor-quantized terms."""
    asia_nations = (
        _tbl(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                _tbl(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    supp = _tbl(spark, sf_dir, "supplier").join(
        F.broadcast(asia_nations),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    orders = _tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = _tbl(spark, sf_dir, "customer")
    li = _tbl(spark, sf_dir, "lineitem")
    rev_term = F.floor(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * F.lit(10000.0)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .groupBy("n_name")
        .agg((F.sum(rev_term) / F.lit(10000.0)).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "tpch_q18_large_customers",
    """
    select c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           cast(sum(cast(l_quantity as decimal(18,4))) as double) as total_qty
    from customer
    join orders on c_custkey = o_custkey
    join lineitem on o_orderkey = l_orderkey
    where o_orderkey in (
        select l_orderkey from lineitem
        group by l_orderkey having sum(l_quantity) > 300
    )
    group by c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    order by o_totalprice desc, o_orderkey
    limit 100
    """,
)
def tpch_q18_large_customers(spark, sf_dir):
    """TPC-H Q18 (large-volume customers): aggregate subquery feeding a
    semi join — find orders whose total quantity exceeds 300 and attach
    their customers. Spark-first: the qualifying-order list is its own
    keyed aggregate (sum of integer-valued doubles — exact below 2^53,
    engine-independent) LEFT SEMI joined into lineitem before the wide
    joins, so the expensive customer join only sees qualifying rows; the
    top-100 is TakeOrderedAndProject."""
    li = _tbl(spark, sf_dir, "lineitem")
    qualifying = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    li_q = li.join(qualifying, "l_orderkey", "left_semi")
    orders = _tbl(spark, sf_dir, "orders")
    cust = _tbl(spark, sf_dir, "customer")
    return (
        li_q.join(orders, li_q.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "total_qty")
    )


@register(
    "window_ntile_percentiles",
    """
    select event_id, event_type,
           ntile(4) over w as quartile,
           percent_rank() over w as pct_rank,
           cume_dist() over w as cum_dist
    from events
    window w as (partition by event_type order by value nulls last, event_id)
    """,
)
def window_ntile_percentiles(spark, sf_dir):
    """Rank-family windows the suite lacked: ntile quartiles,
    percent_rank, cume_dist per series. All three are pure rank
    arithmetic over a deterministic (value, event_id) order, so the
    doubles are (rank-1)/(n-1)-style integer ratios — identical on any
    engine, no rounding needed. One shuffle on the partition key.

    Null ordering is pinned explicitly (ADVICE r6): Spark defaults ASC
    windows to NULLS FIRST, DuckDB to NULLS LAST — events.value has no
    nulls today, but a regenerated fixture with nulls would silently flip
    every rank cross-engine without asc_nulls_last / 'nulls last'."""
    ev = _tbl(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.asc_nulls_last("value"), "event_id"
    )
    return ev.select(
        "event_id",
        "event_type",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cum_dist"),
    )


@register(
    "ts_outlier_zscore",
    """
    with q as (
        select event_id, event_type, ts, value,
               cast(floor(value * 1000.0) as bigint) as qv
        from events
    ),
    s as (
        select event_id, event_type, ts, value, qv,
               cast(sum(qv) over w as double) as s1,
               cast(sum(qv * qv) over w as double) as s2,
               cast(count(*) over w as double) as n
        from q
        window w as (partition by event_type order by ts, event_id
                     rows between 49 preceding and current row)
    )
    select event_id, event_type, ts, value,
           (qv - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1)) as z
    from s
    where n >= 20 and (s2 - s1 * s1 / n) > 0
      and abs((qv - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1))) > 3
    """,
)
def ts_outlier_zscore(spark, sf_dir):
    """Rolling z-score outlier detection (|z| > 3 against the trailing
    50-point window, minimum 20 points) — the streaming-friendly anomaly
    gate for sensor feeds. Engine-exact by construction: values quantize
    to integer milli-units (floor of an IEEE product), the rolling sum
    and sum-of-squares are exact integer window sums, and the z
    expression is the same IEEE double sequence on both engines — so
    even the |z| > 3 boundary cuts identically. One keyed window pass,
    no joins.

    Quantization is 1e3 (ADVICE r6): at 1e6 the 50-row sum of qv*qv
    reached ~7% of int64 max at sf0.1 — Spark would WRAP on ~4x larger
    values while DuckDB silently promotes to HUGEINT. At 1e3, |value| up
    to ~6e5 keeps the squared window sum under 1% of int64 max
    (50*(6e5*1e3)^2 ~ 1.8e16); headroom on the actual fixture is pinned
    by tests/test_round7_ops.py."""
    ev = _tbl(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-49, 0)
    )
    q = ev.withColumn("qv", F.floor(F.col("value") * F.lit(1000.0)))
    s = (
        q.withColumn("s1", F.sum("qv").over(w).cast("double"))
        .withColumn("s2", F.sum(F.col("qv") * F.col("qv")).over(w).cast("double"))
        .withColumn("n", F.count("*").over(w).cast("double"))
    )
    var_num = F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")
    z = (F.col("qv") - F.col("s1") / F.col("n")) / F.sqrt(
        var_num / (F.col("n") - F.lit(1))
    )
    return (
        s.filter((F.col("n") >= 20) & (var_num > 0))
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > 3)
        .select("event_id", "event_type", "ts", "value", "z")
    )


@register(
    "ts_seasonal_anomaly",
    """
    with prof as (
        select event_type, extract(hour from ts) as hh,
               cast(sum(cast(value as decimal(18,4))) as double) / count(*)
                   as baseline
        from events group by 1, 2
    )
    select e.event_id, e.event_type,
           round(e.value - p.baseline, 6) as residual
    from events e
      join prof p on e.event_type = p.event_type
                 and extract(hour from e.ts) = p.hh
    order by round(abs(e.value - p.baseline), 6) desc, e.event_id
    limit 50
    """,
)
def ts_seasonal_anomaly(spark, sf_dir):
    """SEASONAL-BASELINE anomaly detection — the complement of
    ts_outlier_zscore's trailing window: a metric that is normal for
    3 am but wild for noon only shows against a seasonality profile,
    the first model every metrics platform fits. Profile = per
    (event_type, hour-of-day) mean (decimal-exact sum / count, the
    engine's cross-engine-exact mean discipline), residual = value -
    baseline, output = top-50 by |residual| (rounded 6 dp before
    ranking, event_id tiebreak — the hash-stable rank discipline).
    Scale: the profile is a <= |types| x 24-row aggregate (map-side
    partial combine collapses it early) BROADCAST back onto one events
    scan, then TakeOrdered(50) — two scans, no wide shuffle, no window
    over the fact table; at 100 TB the profile stays KB-sized however
    the events grow."""
    e = _tbl(spark, sf_dir, "events")
    prof = e.groupBy(
        "event_type", F.hour("ts").alias("hh")
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
            / F.count("*")
        ).alias("baseline")
    )
    resid = F.col("value") - F.col("baseline")
    return (
        e.withColumn("hh", F.hour("ts"))
        .join(F.broadcast(prof), ["event_type", "hh"])
        .select(
            "event_id",
            "event_type",
            F.round(resid, 6).alias("residual"),
            F.round(F.abs(resid), 6).alias("__rank"),
        )
        .orderBy(F.desc("__rank"), "event_id")
        .limit(50)
        .drop("__rank")
    )


def _triangle_count_plan(spark, sf_dir, materialize: bool = True) -> DataFrame:
    """Triangle-count plan builder, shared by the registry entry
    (``materialize=True``: one eager localCheckpoint on the supported
    pair core) and the plan lint (``materialize=False``: the FULL lazy
    plan, so the pair-generation join and the orientation joins are
    asserted cartesian-free — closing the round-6 checkpoint loophole,
    tests/test_plan_lint.py::test_triangle_count_prechk_plan)."""
    # Repartition by the join key FIRST: the fixture parquet exposes only
    # 3 splits, and a broadcast self-join inherits the probe side's
    # partitioning — 3 tasks on a 32-core box (measured 2.3 s for pair
    # generation alone). One explicit shuffle spreads the fan-out join
    # and the support aggregate across every core; at cluster scale the
    # same repartition is what bounds per-task fan-out memory.
    li = (
        _tbl(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .repartition(spark.sparkContext.defaultParallelism, "l_orderkey")
    )
    a = li.alias("a")
    b = li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= 2)
        .select("pa", "pb")
    )
    small_core = False
    if materialize:
        # materialize the ~4k-edge supported core ONCE (round 7: the only
        # checkpoint — deg and the orientation joins re-derive from it for
        # pennies, where recomputing the lineitem self-join per branch
        # would dominate). ADVICE/VERDICT r6 item 4 trimmed the second
        # (edges) checkpoint: the three triangle branches now recompute
        # two broadcast joins over the tiny checkpointed core instead of
        # re-materializing a relabeled copy.
        pairs = pairs.localCheckpoint(eager=True)
        # r17 (guide §3.1): a localCheckpoint ERASES size statistics —
        # LogicalRDD reports the default (huge) sizeInBytes — so every
        # join over the core planned as a sort-merge join (8 SMJ / 17
        # Exchanges in the sf1 plan) even though the supported core is
        # a few thousand edges. The checkpoint is already materialized,
        # so counting it is free: gate broadcasts on the MEASURED edge
        # count (the connected_components driver_max_edges discipline —
        # a bounded, size-gated broadcast, never an unconditional hint
        # on an SF-linear side). A core past the gate keeps the SMJ
        # plan, which is the right shape for a genuinely large core.
        # r18 (ADVICE r17): the gate was 2M edges — borrowed from the
        # driver union-find bound, but a BROADCAST of 2M (lo, hi) rows
        # builds a ~130 MB hash relation on the driver AND every
        # executor, three times over (keyed + e2 + e3). 500k edges
        # (~32 MB built) keeps the broadcast comfortably inside the
        # default 1g driver heap; the sf1 core is ~4k edges, far below
        # either bound.
        small_core = pairs.count() <= 500_000
    deg = (
        pairs.select(F.col("pa").alias("node"))
        .unionAll(pairs.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    # Degree orientation WITHOUT a global window (round 7, closing the
    # round-6 lint blind spot): the orientation key packs (degree, node)
    # into one int64 — k = d * 2^32 + node — whose integer order IS the
    # (d, node) lexicographic order the old global row_number produced.
    # No rank, no single-task window, and the oracle replays the same
    # packing. Bounds: node ids < 2^32 and degree < 2^31 (degree <= |V|,
    # and |V| is part-key-bounded); at larger id domains widen to a
    # (d, node) struct key — same joins, same comparisons.
    keyed = deg.select("node", (F.col("d") * F.lit(1 << 32) + F.col("node")).alias("k"))
    if small_core:
        keyed = F.broadcast(keyed)
    ka = keyed.alias("ka")
    kb = keyed.alias("kb")
    edges = (
        pairs.join(ka, F.col("pa") == F.col("ka.node"))
        .join(kb, F.col("pb") == F.col("kb.node"))
        .select(
            F.least(F.col("ka.k"), F.col("kb.k")).alias("lo"),
            F.greatest(F.col("ka.k"), F.col("kb.k")).alias("hi"),
        )
    )
    e1 = edges.alias("e1")
    e2 = (F.broadcast(edges) if small_core else edges).alias("e2")
    e3 = (F.broadcast(edges) if small_core else edges).alias("e3")
    tri = e1.join(
        e2, (F.col("e1.lo") == F.col("e2.lo")) & (F.col("e1.hi") < F.col("e2.hi"))
    ).join(
        e3,
        (F.col("e3.lo") == F.col("e1.hi")) & (F.col("e3.hi") == F.col("e2.hi")),
    )
    return tri.agg(F.count("*").alias("n_triangles"))


@register(
    "graph_triangle_count",
    """
    with pairs as (
        select a.l_partkey as pa, b.l_partkey as pb
        from lineitem a
        join lineitem b
          on a.l_orderkey = b.l_orderkey and a.l_partkey < b.l_partkey
        group by 1, 2 having count(*) >= 2
    ),
    deg as (
        select node, count(*) as d from (
            select pa as node from pairs
            union all
            select pb as node from pairs
        ) group by node
    ),
    keyed as (
        select node, d * 4294967296 + node as k from deg
    ),
    edges as (
        select least(ka.k, kb.k) as lo, greatest(ka.k, kb.k) as hi
        from pairs
        join keyed ka on pa = ka.node
        join keyed kb on pb = kb.node
    )
    select count(*) as n_triangles
    from edges e1
    join edges e2 on e1.lo = e2.lo and e1.hi < e2.hi
    join edges e3 on e3.lo = e1.hi and e3.hi = e2.hi
    """,
)
def graph_triangle_count(spark, sf_dir):
    """Triangle counting over the part co-occurrence graph (edges =
    part pairs co-occurring in >= 2 orders; market-basket cohesion with
    the standard min-support cut — unfiltered co-occurrence is noise-
    dominated singleton pairs, ~1.2M edges and 1.9M triangles at sf0.1
    where the supported core is ~4k edges).
    The compact-forward formulation: every edge is oriented from its
    lower-(degree, id) endpoint to the higher one, so the wedge join
    e1(a,b)-e2(a,c) fans out only from each node's HIGHER-ordered
    neighbors — sum of C(outdeg, 2) with outdeg bounded ~O(sqrt(E)) —
    instead of exploding through hub nodes (key-ordered orientation
    measured 13 s at sf0.1 on this dense co-occurrence graph; degree
    orientation cuts the wedge set ~20x). Each triangle (a<b<c in
    orientation order) counts exactly once via the oriented equi-join
    chain; all shuffle joins, never cartesian. Since round 7 the
    orientation key is the packed int64 d*2^32+node — no global
    row_number, no single-task window, one localCheckpoint (the pair
    core), and the full lazy plan is linted pre-checkpoint."""
    return _triangle_count_plan(spark, sf_dir, materialize=True)


@register(
    "sentence_dedup",
    r"""
    with aug as (
        select doc_id,
               lower(text) || '. subscribe to ' || source ||
               ' newsletter today. thanks for reading ' || source ||
               ' daily digest.' as text
        from documents
    ),
    s as (
        select doc_id, trim(x.s) as sent
        from aug, unnest(string_split_regex(text, '[.!?]\s+')) x(s)
        where length(trim(x.s)) >= 20
    ),
    d as (select distinct doc_id, sent from s),
    cnt as (select sent, count(*) as nd from d group by 1)
    select s.doc_id,
           count(*) as n_sentences,
           cast(sum(case when cnt.nd >= 5 then 1 else 0 end) as bigint)
               as n_boilerplate
    from s join cnt on s.sent = cnt.sent
    group by s.doc_id
    """,
)
def sentence_dedup(spark, sf_dir):
    """Boilerplate sentence detection — the corpus-level cleanup pass
    that strips repeated template sentences (nav footers, subscribe
    prompts) before training: split docs into sentences, count DISTINCT
    documents per normalized sentence, flag sentences shared by >= 5
    docs. The fixture text has no natural repetition, so a deterministic
    per-source footer is appended first (the text_pii_scrub augmentation
    trick) — each source's footer recurs across its ~25 docs and must be
    flagged; organic sentences must not. Scale: sentences shuffle by
    their own hash for the count (16-byte keys, not bodies); the
    per-doc re-join is the same equi-key. Spark and DuckDB split on the
    same RE2-compatible regex."""
    docs = _tbl(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.lower(F.col("text")),
            F.lit(". subscribe to "),
            F.col("source"),
            F.lit(" newsletter today. thanks for reading "),
            F.col("source"),
            F.lit(" daily digest."),
        ).alias("text"),
    )
    sent = (
        aug.select(
            "doc_id",
            F.explode(F.split(F.col("text"), r"[.!?]\s+")).alias("raw"),
        )
        .select("doc_id", F.trim(F.col("raw")).alias("sent"))
        .filter(F.length("sent") >= 20)
    )
    cnt = (
        sent.select("doc_id", "sent")
        .distinct()
        .groupBy("sent")
        .agg(F.count("*").alias("nd"))
    )
    return (
        sent.join(cnt, "sent")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_sentences"),
            F.sum(F.when(F.col("nd") >= 5, 1).otherwise(0))
            .cast("long")
            .alias("n_boilerplate"),
        )
    )



@register(
    "asof_join_forward",
    """
    with probes as (
        select user_id, ts, event_id from events where event_type = 'click'
    ),
    quotes as (
        select user_id, date_trunc('second', ts) as qts, value as qv
        from events where event_type = 'purchase' and value is not null
        qualify row_number() over (
            partition by user_id, date_trunc('second', ts)
            order by ts desc, event_id desc) = 1
    )
    select p.event_id, p.user_id,
           case when q.qts <= p.ts + interval 30 minute then q.qv
           end as next_purchase
    from probes p asof left join quotes q
      on p.user_id = q.user_id and p.ts <= q.qts
    """,
)
def asof_join_forward(spark, sf_dir):
    """FORWARD as-of join (pandas merge_asof direction='forward'): each
    click gets the user's NEXT purchase value, nulled when it is more
    than 30 minutes in the future — lookahead labeling for conversion
    prediction. Same single union + keyed-window pass as backward as-of
    with the scan order reversed; oracle is DuckDB's native forward ASOF
    (p.ts <= q.qts). Tiebreak and the NULL-quote clock guard are shared
    with the backward path."""
    from database_extractor_spark.operators.timeseries import asof_join

    ev = _tbl(spark, sf_dir, "events")
    probes = ev.filter("event_type = 'click'").select("user_id", "ts", "event_id")
    quotes = C.downsample_last(
        ev.filter("event_type = 'purchase'"), "ts", ["user_id"], "value",
        tiebreak_cols=["event_id"],
    ).withColumnRenamed("ts", "qts").withColumnRenamed("value", "qv")
    out = asof_join(
        probes, quotes, on=["user_id"], left_ts="ts", right_ts="qts",
        value_col="qv", out_col="next_purchase", tolerance="30 minutes",
        direction="forward",
    )
    return out.select("event_id", "user_id", "next_purchase")


@register(
    "series_correlation",
    """
    with hc as (
        select event_type, date_trunc('hour', ts) as hour,
               count(*) as c
        from events group by 1, 2
    ),
    j as (
        select a.event_type as et_a, b.event_type as et_b,
               a.c as x, b.c as y
        from hc a join hc b
          on a.hour = b.hour and a.event_type < b.event_type
    ),
    m as (
        select et_a, et_b,
               cast(count(*) as bigint) as n,
               cast(sum(x) as bigint) as sx, cast(sum(y) as bigint) as sy,
               cast(sum(x * y) as bigint) as sxy,
               cast(sum(x * x) as bigint) as sxx,
               cast(sum(y * y) as bigint) as syy
        from j group by 1, 2
    )
    select et_a, et_b, n,
           (cast(n * sxy - sx * sy as double))
               / (sqrt(cast(n * sxx - sx * sx as double))
                  * sqrt(cast(n * syy - sy * sy as double))) as r
    from m
    where n * sxx - sx * sx > 0 and n * syy - sy * sy > 0
    """,
)
def series_correlation(spark, sf_dir):
    """Cross-series Pearson correlation: hourly activity counts per
    event type, correlated across every series pair over their common
    hours — the co-movement matrix behind anomaly correlation and
    metric clustering. Engine-exact by construction: every moment (n,
    sums, cross/square sums) is INTEGER arithmetic on counts, and the
    final r is one shared IEEE expression — no float accumulation
    anywhere, so no rounding tie is possible. Scale: the hourly
    pre-aggregate shrinks the fact table first (the downsample-early
    rule); the pair join fans out series x series per hour, quadratic
    only in the number of SERIES, never in rows."""
    ev = _tbl(spark, sf_dir, "events")
    hc = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count("*").alias("c"))
    a, b = hc.alias("a"), hc.alias("b")
    j = a.join(
        b,
        (F.col("a.hour") == F.col("b.hour"))
        & (F.col("a.event_type") < F.col("b.event_type")),
    ).select(
        F.col("a.event_type").alias("et_a"),
        F.col("b.event_type").alias("et_b"),
        F.col("a.c").alias("x"),
        F.col("b.c").alias("y"),
    )
    m = j.groupBy("et_a", "et_b").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return (
        m.filter((dx > 0) & (dy > 0))
        .withColumn(
            "r",
            num.cast("double") / (F.sqrt(dx.cast("double")) * F.sqrt(dy.cast("double"))),
        )
        .select("et_a", "et_b", "n", "r")
    )


def _crosslingual_oracle(dim: int = 64, n_planes: int = 6, seed: int = 42,
                         threshold: float = 0.3) -> str:
    """Bitext-mining oracle: same seeded-plane bucket join as
    embedding_near_dup, then a documents join keyed on the shared
    vec_id/doc_id space filters to CROSS-LANGUAGE pairs."""
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
        select distinct a.vec_id as id_a, c.vec_id as id_b,
               round(case when {denom} = 0 then 0.0
                          else list_dot_product(a.embedding::DOUBLE[],
                                                c.embedding::DOUBLE[]) / {denom}
                     end, 6) as cos
        from b a join b c on a.bucket = c.bucket and a.vec_id < c.vec_id
    )
    select id_a, id_b, da.lang as lang_a, db.lang as lang_b, cos
    from pairs
    join documents da on id_a = da.doc_id
    join documents db on id_b = db.doc_id
    where cos >= {threshold} and da.lang <> db.lang
    """


@register("crosslingual_pair_mining", _crosslingual_oracle())
def crosslingual_pair_mining(spark, sf_dir):
    """Bitext-style mining: high-cosine embedding pairs whose documents
    are in DIFFERENT languages — the candidate generator for parallel-
    corpus construction (translation pairs for multilingual training).
    Candidates come from the seeded-plane LSH bucket join (never
    all-pairs); the documents join rides the shared vec_id/doc_id key
    with the small lang projection broadcast. Fully oracled via the
    plane-literal replay."""
    emb = _tbl(spark, sf_dir, "embeddings")
    docs = _tbl(spark, sf_dir, "documents").select("doc_id", "lang")
    pairs = S.pairwise_similar_lsh(emb, threshold=0.3, n_planes=6)
    da = docs.alias("da")
    db = docs.alias("db")
    return (
        pairs.join(F.broadcast(da), F.col("id_a") == F.col("da.doc_id"))
        .join(F.broadcast(db), F.col("id_b") == F.col("db.doc_id"))
        .filter(F.col("da.lang") != F.col("db.lang"))
        .select(
            "id_a", "id_b",
            F.col("da.lang").alias("lang_a"),
            F.col("db.lang").alias("lang_b"),
            "cos",
        )
    )



def _pca_power_oracle(dim: int = 64, iters: int = 6) -> str:
    """Unrolled-CTE oracle for embedding_pca_power_iteration — the
    pagerank trick extended to linear algebra. Every order-dependent
    float sum (the matvec s = Xw, the co-vector y = X^T s, the squared
    norm) is floor-quantized to integer nano-units before summation, so
    Spark's distributed aggregation and DuckDB's serial one produce the
    SAME doubles, and the per-element divisions/sqrt are shared IEEE
    expressions. w0 = 1/8 per coordinate (unit 64-vector)."""
    w_prev = "w0"
    ctes = [
        "w0 as (select j as idx, 0.125 as wv from range({d}) t(j))".format(d=dim)
    ]
    for it in range(1, iters + 1):
        ctes.append(
            f"""s{it} as (
        select vec_id,
               cast(sum(cast(floor(e.embedding[j.j + 1]::DOUBLE * w.wv
                                   * 1000000000.0) as bigint)) as double)
                   / 1000000000.0 as s
        from embeddings e
        cross join range({dim}) j(j)
        join {w_prev} w on w.idx = j.j
        group by vec_id
    )"""
        )
        ctes.append(
            f"""y{it} as (
        select j.j as idx,
               cast(sum(cast(floor(e.embedding[j.j + 1]::DOUBLE * s.s
                                   * 1000000000.0) as bigint)) as double)
                   / 1000000000.0 as y
        from embeddings e
        join s{it} s using (vec_id)
        cross join range({dim}) j(j)
        group by j.j
    )"""
        )
        ctes.append(
            f"""n{it} as (
        select cast(sum(cast(floor(y * y * 1000000000.0) as bigint)) as double)
                   / 1000000000.0 as n2
        from y{it}
    )"""
        )
        ctes.append(
            f"w{it} as (select idx, y / sqrt(n2) as wv from y{it}, n{it})"
        )
        w_prev = f"w{it}"
    return (
        "with " + ",\n    ".join(ctes)
        + f"\n    select idx as dim, wv as loading from w{iters}"
    )


@register("embedding_pca_power_iteration", _pca_power_oracle())
def embedding_pca_power_iteration(spark, sf_dir):
    """Dominant principal direction of the embedding Gram matrix by
    POWER ITERATION — the engine's template for iterative distributed
    linear algebra (the pagerank loop shape applied to matvecs): each
    round computes s = Xw (per-row quantized dot with the broadcast
    w literals), y = X^T s (posexplode + per-coordinate integer-exact
    sum — ONE shuffle of N x 64 narrow rows), collects the 64-value
    model state, normalizes driver-side with the same IEEE ops, and
    feeds w back as literals. Fully oracled: the DuckDB twin unrolls
    the same 6 iterations as CTEs; floor-quantized nano-unit terms make
    every cross-row sum order-independent, so the loadings match
    bit-for-bit. Scale: per-iteration cost is one narrow shuffle;
    at 100 TB swap posexplode for per-partition float64 accumulators
    (mapInPandas partial sums) — the quantization contract is unchanged.
    Like pagerank_event_graph, the entry pins the ITERATION MECHANISM
    at a fixed round count; convergence to the true eigenvector is
    governed by the spectral gap ((l2/l1)^k — the fixture Gram matrix
    is nearly flat at 0.98, so production use would run Lanczos or
    subspace iteration with deflation on the same matvec plan)."""
    import math

    emb = _tbl(spark, sf_dir, "embeddings")
    dim, iters, q = 64, 6, 1000000000.0
    w = [0.125] * dim
    ydf = None
    n2 = None
    for _ in range(iters):
        w_lit = S._query_lit(w)
        s_col = (
            F.aggregate(
                F.zip_with(
                    F.col("embedding"),
                    w_lit,
                    lambda x, wv: F.floor(x.cast("double") * wv * F.lit(q)),
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).cast("double")
            / F.lit(q)
        )
        sdf = emb.select("vec_id", "embedding", s_col.alias("s"))
        exploded = sdf.select("s", F.posexplode("embedding"))
        terms = exploded.select(
            F.col("pos"),
            F.floor(F.col("col").cast("double") * F.col("s") * F.lit(q)).alias("t"),
        )
        ydf = terms.groupBy("pos").agg(F.sum("t").alias("ts"))
        ys = {r["pos"]: r["ts"] / q for r in ydf.collect()}
        n2 = sum(math.floor(ys[j] * ys[j] * q) for j in range(dim)) / q
        w = [ys[j] / math.sqrt(n2) for j in range(dim)]
    return ydf.select(
        F.col("pos").alias("dim"),
        ((F.col("ts").cast("double") / F.lit(q)) / F.lit(math.sqrt(n2))).alias(
            "loading"
        ),
    )



@register(
    "tpch_q10_returned_items",
    """
    select c_custkey, c_name,
           cast(sum(cast(floor(l_extendedprice * (1 - l_discount) * 10000.0)
                         as bigint)) as double) / 10000.0 as revenue,
           c_acctbal, n_name
    from customer
    join orders on c_custkey = o_custkey
    join lineitem on l_orderkey = o_orderkey
    join nation on c_nationkey = n_nationkey
    where o_orderdate >= timestamp '1996-01-01'
      and o_orderdate < timestamp '1996-07-01'
      and l_returnflag = 'R'
    group by c_custkey, c_name, c_acctbal, n_name
    order by revenue desc, c_custkey
    limit 20
    """,
)
def tpch_q10_returned_items(spark, sf_dir):
    """TPC-H Q10 (returned-item reporting): which customers returned the
    most revenue last quarter. The fourth canonical join shape in the
    suite: date-filtered orders and returnflag-filtered lineitem shuffle
    on their natural keys, the customer dimension joins on custkey, and
    the 25-row nation dim broadcasts; top-20 is TakeOrderedAndProject
    with a c_custkey tiebreak. Revenue uses the tie-proof floor-
    quantized terms."""
    orders = _tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = _tbl(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = _tbl(spark, sf_dir, "customer")
    nation = _tbl(spark, sf_dir, "nation")
    rev_term = F.floor(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * F.lit(10000.0)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg((F.sum(rev_term) / F.lit(10000.0)).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )



@register(
    "set_intersect_all",
    """
    select l_suppkey as k from lineitem where l_returnflag = 'R'
    intersect all
    select l_suppkey as k from lineitem where l_returnflag = 'A'
    """,
)
def set_intersect_all(spark, sf_dir):
    """ANSI INTERSECT ALL — multiset semantics the distinct-based
    set_intersect entry can't express: each supplier key survives
    min(returned-count, acknowledged-count) times. Spark plans this as
    per-side row counts + a generate, one shuffle per side."""
    li = _tbl(spark, sf_dir, "lineitem")
    a = li.filter("l_returnflag = 'R'").select(F.col("l_suppkey").alias("k"))
    b = li.filter("l_returnflag = 'A'").select(F.col("l_suppkey").alias("k"))
    return R.intersect_all(a, b)


@register(
    "set_except_all",
    """
    select l_suppkey as k from lineitem where l_returnflag = 'R'
    except all
    select l_suppkey as k from lineitem where l_returnflag = 'A'
    """,
)
def set_except_all(spark, sf_dir):
    """ANSI EXCEPT ALL — multiset difference: each supplier key kept
    max(returned-count - acknowledged-count, 0) times, distinguishing
    volume imbalance from mere membership (which set_except tests)."""
    li = _tbl(spark, sf_dir, "lineitem")
    a = li.filter("l_returnflag = 'R'").select(F.col("l_suppkey").alias("k"))
    b = li.filter("l_returnflag = 'A'").select(F.col("l_suppkey").alias("k"))
    return R.except_all(a, b)



@register(
    "tpch_q6_forecast_revenue",
    """
    select cast(sum(cast(floor(l_extendedprice * l_discount * 10000.0)
                         as bigint)) as double) / 10000.0 as revenue
    from lineitem
    where l_shipdate >= timestamp '1996-01-01'
      and l_shipdate < timestamp '1997-01-01'
      and l_discount between 0.05 and 0.07
      and l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 (forecasting revenue change): the pure-pushdown probe —
    three range predicates and a two-column projection that must ALL
    reach the parquet scan (PushedFilters + ReadSchema), one global sum,
    no shuffle beyond the single-row aggregate exchange. The canonical
    'is your scan path lazy enough' benchmark. Floor-quantized terms."""
    li = _tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    term = F.floor(F.col("l_extendedprice") * F.col("l_discount") * F.lit(10000.0))
    return li.agg((F.sum(term) / F.lit(10000.0)).alias("revenue"))


@register(
    "tpch_q4_order_priority",
    """
    select o_orderpriority, count(*) as order_count
    from orders
    where o_orderdate >= timestamp '1996-01-01'
      and o_orderdate < timestamp '1996-07-01'
      and exists (
          select 1 from lineitem
          where l_orderkey = o_orderkey and l_returnflag = 'R'
      )
    group by o_orderpriority
    order by o_orderpriority
    """,
)
def tpch_q4_order_priority(spark, sf_dir):
    """TPC-H Q4 (order priority checking), adapted to the fixture
    schema: the reference Q4's late-delivery predicate uses
    l_commitdate/l_receiptdate, which the fixture lacks — the EXISTS
    shape is preserved with 'has a returned line' (l_returnflag = 'R')
    as the correlated condition. Spark-first: the EXISTS compiles to a
    LEFT SEMI join from the date-filtered orders onto the flag-filtered
    lineitem keys — the semi join deduplicates multi-line matches
    without a distinct, then one small group-count."""
    orders = _tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    flagged = (
        _tbl(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(flagged, orders.o_orderkey == flagged.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


_TPCH_Q2_SQL = """
    with partsupp as (
        select l_partkey as ps_partkey, l_suppkey as ps_suppkey,
               min(l_extendedprice / l_quantity) as ps_supplycost
        from lineitem group by 1, 2
    )
    select s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name
    from part p
      join partsupp ps on p.p_partkey = ps.ps_partkey
      join supplier s on s.s_suppkey = ps.ps_suppkey
      join nation n on s.s_nationkey = n.n_nationkey
      join region r on n.n_regionkey = r.r_regionkey
    where p.p_size <= 10 and p.p_type = 'LARGE'
      and r.r_name = 'EUROPE'
      and ps.ps_supplycost = (
          select min(ps2.ps_supplycost)
          from partsupp ps2
            join supplier s2 on s2.s_suppkey = ps2.ps_suppkey
            join nation n2 on s2.s_nationkey = n2.n_nationkey
            join region r2 on n2.n_regionkey = r2.r_regionkey
          where ps2.ps_partkey = p.p_partkey and r2.r_name = 'EUROPE'
      )
    order by s.s_acctbal desc, n.n_name, s.s_name, p.p_partkey
    limit 100
"""


@register("tpch_q2_min_cost_supplier", _TPCH_Q2_SQL)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 (minimum-cost supplier), adapted to the fixture schema:
    there is no partsupp table, so the part-supplier link is derived from
    lineitem — ps_supplycost := min unit price (l_extendedprice /
    l_quantity) ever charged for that (part, supplier) — and the missing
    address/phone/comment output columns are dropped. The SHAPE under
    test is preserved exactly: a correlated scalar subquery (per-part min
    cost among same-region suppliers) over a 4-way dim join, the one
    subquery form the suite had not pinned at TPC-H complexity (VERDICT
    r6 item 8). Spark-first: issued through the SQL front-end so Catalyst
    decorrelates the subquery into a per-part min aggregate joined back
    on (partkey, cost) — double equality is safe because both sides
    compute the identical IEEE division/min. region->nation->supplier
    broadcast down the dim chain; the derived partsupp shuffles once on
    its composite key and is shared by both subquery instances."""
    for t in ("part", "supplier", "nation", "region", "lineitem"):
        _tbl(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_TPCH_Q2_SQL)


_TPCH_Q16_SQL = """
    with ps as (
        select distinct l_partkey as ps_partkey, l_suppkey as ps_suppkey
        from lineitem
    )
    select p_brand, p_type, p_size,
           cast(count(distinct ps_suppkey) as bigint) as supplier_cnt
    from ps join part on p_partkey = ps_partkey
    where p_brand <> 'Brand#13'
      and p_type <> 'PROMO'
      and p_size in (1, 4, 7, 10, 13, 16, 19, 23)
      and ps_suppkey not in (
          select s_suppkey from supplier where s_acctbal < 0
      )
    group by p_brand, p_type, p_size
    order by supplier_cnt desc, p_brand, p_type, p_size
"""


@register("tpch_q16_parts_supplier", _TPCH_Q16_SQL)
def tpch_q16_parts_supplier(spark, sf_dir):
    """TPC-H Q16 (parts/supplier relationship), adapted to the fixture
    schema: partsupp := distinct (l_partkey, l_suppkey) from lineitem,
    and the 'customer complaints' supplier exclusion (s_comment LIKE,
    which the fixture lacks) becomes s_acctbal < 0 — same NOT IN shape,
    same tiny exclusion set. This pins the two forms the suite lacked at
    TPC-H complexity (VERDICT r6 item 8): a null-aware NOT IN anti join
    plus a count-DISTINCT aggregate over a filtered dim join. Spark-first:
    NOT IN on a non-null key compiles to a null-aware broadcast anti
    join (hash, not nested-loop); part is broadcast; the distinct pair
    derivation and the count-distinct expansion shuffle on the same
    partkey-led keys."""
    for t in ("part", "supplier", "lineitem"):
        _tbl(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_TPCH_Q16_SQL)


@register(
    "tpch_q7_volume_shipping",
    """
    select supp_nation, cust_nation, l_year,
           cast(sum(cents) as double) / 10000.0 as revenue
    from (
        select n1.n_name as supp_nation, n2.n_name as cust_nation,
               year(l.l_shipdate) as l_year,
               cast(floor(l.l_extendedprice * (1 - l.l_discount) * 10000.0)
                    as bigint) as cents
        from supplier s
          join lineitem l on s.s_suppkey = l.l_suppkey
          join orders o on o.o_orderkey = l.l_orderkey
          join customer c on c.c_custkey = o.o_custkey
          join nation n1 on s.s_nationkey = n1.n_nationkey
          join nation n2 on c.c_nationkey = n2.n_nationkey
        where ((n1.n_name = 'NATION_1' and n2.n_name = 'NATION_2')
            or (n1.n_name = 'NATION_2' and n2.n_name = 'NATION_1'))
          and l.l_shipdate >= timestamp '1996-01-01'
          and l.l_shipdate < timestamp '1998-01-01'
    ) shipping
    group by supp_nation, cust_nation, l_year
    order by supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 (volume shipping): bilateral trade volume between two
    nations by shipment year — the suite's widest fact-fact-dim join fan
    (lineitem joins BOTH its supplier's nation and, through orders ->
    customer, its customer's nation). Adapted names: the fixture's
    nations are NATION_<k>. Spark-first: nation (25 rows, joined twice
    under different aliases), supplier and customer broadcast; the only
    real shuffle is lineitem->orders on orderkey; the disjunctive
    nation-pair predicate is applied post-join where both nation names
    are in scope, and Catalyst still pushes the shipdate range to the
    scan. Revenue floor-quantized to bigint cents for engine-exact
    summation (the Q6 pattern)."""
    for t in ("supplier", "lineitem", "orders", "customer", "nation"):
        _tbl(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(ORACLE["tpch_q7_volume_shipping"])


@register(
    "tpch_q12_shipmode_priority",
    """
    select l_linestatus as ship_group,
           cast(sum(case when o_orderpriority in ('1-URGENT', '2-HIGH')
                         then 1 else 0 end) as bigint) as high_line_count,
           cast(sum(case when o_orderpriority in ('1-URGENT', '2-HIGH')
                         then 0 else 1 end) as bigint) as low_line_count
    from orders join lineitem on o_orderkey = l_orderkey
    where l_shipdate >= o_orderdate + interval 90 day
      and l_shipdate >= timestamp '1996-01-01'
      and l_shipdate < timestamp '1997-01-01'
    group by l_linestatus
    order by l_linestatus
    """,
)
def tpch_q12_shipmode_priority(spark, sf_dir):
    """TPC-H Q12 (shipping modes and order priority), adapted to the
    fixture schema: there is no l_shipmode/l_commitdate/l_receiptdate,
    so the mode group is l_linestatus and 'late delivery' becomes
    'shipped more than 90 days after the order date' — preserving the
    SHAPE: an orders-lineitem join filtered by an inter-column date
    predicate, then a CASE-bucketed conditional count by class. The
    inter-column predicate (l_shipdate >= o_orderdate + 90d) cannot be
    pushed to either scan — it is evaluated in the join's post-condition
    — but the absolute shipdate range still prunes the lineitem scan.
    Built with the DataFrame API (interval literal syntax differs from
    DuckDB's)."""
    orders = _tbl(spark, sf_dir, "orders")
    li = _tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy(F.col("l_linestatus").alias("ship_group"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_group")
    )


@register(
    "tpch_q13_customer_distribution",
    """
    select c_count, count(*) as custdist
    from (
        select c.c_custkey, count(o.o_orderkey) as c_count
        from customer c
          left outer join orders o
            on c.c_custkey = o.o_custkey
           and o.o_orderpriority <> '5-LOW'
        group by c.c_custkey
    ) c_orders
    group by c_count
    order by custdist desc, c_count desc
    """,
)
def tpch_q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 (customer distribution): the two-level aggregation
    shape — count orders per customer THROUGH a left outer join (so
    zero-order customers survive with c_count = 0), then histogram the
    per-customer counts. Adapted filter: the reference excludes orders
    by o_comment LIKE (fixture lacks comments); o_orderpriority <>
    '5-LOW' preserves the join-side-predicate placement (it must sit in
    the JOIN condition, not a WHERE, or zero-order customers vanish).
    Spark-first: outer join shuffles on custkey, the first aggregate
    reuses that partitioning (no extra exchange), the second aggregate
    is over ~|distinct counts| rows."""
    for t in ("customer", "orders"):
        _tbl(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(ORACLE["tpch_q13_customer_distribution"])


@register(
    "tpch_q14_promo_revenue",
    """
    select 100.00 * cast(sum(case when p_type = 'PROMO' then cents else 0 end)
                         as double)
                  / cast(sum(cents) as double) as promo_revenue
    from (
        select cast(floor(l_extendedprice * (1 - l_discount) * 10000.0)
                    as bigint) as cents, p_type
        from lineitem join part on l_partkey = p_partkey
        where l_shipdate >= timestamp '1996-09-01'
          and l_shipdate < timestamp '1996-10-01'
    ) t
    """,
)
def tpch_q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 (promotion effect): conditional-aggregate ratio — the
    percentage of one month's revenue from PROMO parts (the fixture's
    p_type domain includes exactly 'PROMO', no adaptation needed beyond
    dropping the 'PROMO%' prefix match to equality). Both sums are
    floor-quantized bigint cents, so the final ratio is one
    exactly-reproducible double division. Spark-first: the one-month
    shipdate range prunes the lineitem scan; part is broadcast; both
    conditional sums fold into a single partial-aggregate pass (one
    HashAggregate, two CASE accumulators), one single-row exchange."""
    for t in ("lineitem", "part"):
        _tbl(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(ORACLE["tpch_q14_promo_revenue"])


@register(
    "tpch_q15_top_supplier",
    """
    with revenue as (
        select l_suppkey as supplier_no,
               sum(cast(floor(l_extendedprice * (1 - l_discount) * 10000.0)
                        as bigint)) as total_cents
        from lineitem
        where l_shipdate >= timestamp '1996-01-01'
          and l_shipdate < timestamp '1996-04-01'
        group by l_suppkey
    )
    select s_suppkey, s_name,
           cast(total_cents as double) / 10000.0 as total_revenue
    from supplier join revenue on s_suppkey = supplier_no
    where total_cents = (select max(total_cents) from revenue)
    order by s_suppkey
    """,
)
def tpch_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 (top supplier): the aggregate-of-aggregate scalar
    subquery shape — a quarterly revenue-per-supplier view consumed
    twice, once as the join input and once reduced to its max, with the
    tie-safe equality join back (ALL suppliers at the max revenue
    return, which is why TPC-H specifies this shape instead of LIMIT 1).
    Revenue is summed as floor-quantized bigint cents, making the
    max-equality exact across engines — the reference's double equality
    is the textbook cross-engine hash-mismatch trap. Spark-first: the
    CTE is planned once per consumer with the scalar max as a separate
    tiny subquery stage; supplier (1k rows) is broadcast onto the
    aggregated (not raw) side."""
    for t in ("lineitem", "supplier"):
        _tbl(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(ORACLE["tpch_q15_top_supplier"])


@register(
    "tpch_q17_small_quantity_revenue",
    """
    select cast(sum(cast(floor(l.l_extendedprice * 100.0) as bigint)) as double)
           / 700.0 as avg_yearly
    from lineitem l join part p on p.p_partkey = l.l_partkey
    where p.p_brand = 'Brand#23' and p.p_size = 5
      and l.l_quantity < 0.2 * (
          select avg(l2.l_quantity) from lineitem l2
          where l2.l_partkey = p.p_partkey
      )
    """,
)
def tpch_q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 (small-quantity-order revenue): the correlated scalar
    AGGREGATE subquery — each lineitem row is compared against the
    average order quantity OF ITS OWN PART. Adapted: the container
    attribute doesn't exist, so the part filter is p_brand + p_size.
    Determinism: l_quantity is integral-valued, so avg() = exact integer
    sum / count is the identical IEEE double in both engines, and the
    0.2x comparison cannot flip; the output sum is floor-quantized
    cents / 700 (sum/7.0 in cents). Spark-first: Catalyst decorrelates
    the subquery into a per-partkey average aggregated over the FULL
    lineitem (not just Brand#23 rows) joined back on partkey — the
    filtered side is tiny after the broadcast part filter, the
    decorrelated aggregate is the one real shuffle."""
    for t in ("lineitem", "part"):
        _tbl(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(ORACLE["tpch_q17_small_quantity_revenue"])


@register(
    "tpch_q19_disjunctive_revenue",
    """
    select cast(sum(cast(floor(l_extendedprice * (1 - l_discount) * 10000.0)
                         as bigint)) as double) / 10000.0 as revenue
    from lineitem join part on p_partkey = l_partkey
    where (p_brand = 'Brand#12' and p_size between 1 and 5
           and l_quantity >= 1 and l_quantity <= 11)
       or (p_brand = 'Brand#23' and p_size between 1 and 10
           and l_quantity >= 10 and l_quantity <= 20)
       or (p_brand = 'Brand#34' and p_size between 1 and 15
           and l_quantity >= 20 and l_quantity <= 30)
    """,
)
def tpch_q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 (discounted revenue): the disjunctive-predicate
    pushdown probe — three OR'd conjunctions that each mix part-side
    (brand, size) and lineitem-side (quantity) conditions across the
    join. Adapted: no p_container/l_shipmode/l_shipinstruct in the
    fixture, so each branch keeps its brand + size-range + quantity-band
    core. The optimizer test: Catalyst must factor the per-side
    implications out of the OR — l_quantity between 1 and 30 pushes to
    the lineitem scan, p_size between 1 and 15 to the part scan — while
    the full disjunction evaluates post-join on an equi (not
    nested-loop) hash join. The plan-lint cartesian ban holds this
    entry to that."""
    for t in ("lineitem", "part"):
        _tbl(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(ORACLE["tpch_q19_disjunctive_revenue"])


@register(
    "tpch_q22_global_sales_opportunity",
    """
    with cust as (
        select right(c_name, 2) as cntrycode, c_acctbal, c_custkey
        from customer
        where right(c_name, 2) in ('01', '12', '23', '34', '45', '56', '67')
    ),
    thr as (
        select sum(cast(round(c_acctbal * 100.0) as bigint)) as total_cents,
               count(*) as n
        from cust where c_acctbal > 0.0
    )
    select cntrycode, count(*) as numcust,
           cast(sum(cast(round(c_acctbal * 100.0) as bigint)) as double)
           / 100.0 as totacctbal
    from cust, thr
    where cast(round(c_acctbal * 100.0) as bigint) * n > total_cents
      and not exists (
          select 1 from orders
          where o_custkey = c_custkey
            and o_orderpriority = '1-URGENT'
            and o_orderdate >= timestamp '1999-01-01'
      )
    group by cntrycode
    order by cntrycode
    """,
)
def tpch_q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 (global sales opportunity): above-average-balance
    customers WITH NO (recent urgent) ORDERS, grouped by country code.
    Adapted twice: the fixture has no c_phone, so the 2-char code is
    right(c_name, 2) — the same derived-substring-membership shape — and
    because the fixture assigns orders to essentially EVERY customer
    (0 order-less customers at sf0.01), the anti-join condition becomes
    'no 1-URGENT order since 1999', keeping the NOT EXISTS non-vacuous
    at every SF instead of matching zero rows. Two shapes pinned at
    once: a NOT EXISTS anti join against a predicated orders scan, and a
    global
    average threshold which the canonical query leaves as a float avg()
    scalar subquery — here restated as an exact integer cross-product
    test (acctbal_cents * n > total_cents), so the boundary cannot flip
    between engines' float summation orders. Spark-first: the threshold
    is the whitelisted 1-row scalar attach (broadcast single-row
    aggregate, O(n) probe — see tests/test_plan_lint.py
    SCALAR_ATTACH_OK); the anti join builds on the filtered customer
    side; both aggregates reuse the cntrycode shuffle."""
    for t in ("customer", "orders"):
        _tbl(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(ORACLE["tpch_q22_global_sales_opportunity"])


@register(
    "sql_recursive_spine",
    """
    with recursive nums(n) as (
        select 0
        union all
        select n + 1 from nums where n < 30
    ),
    daily as (
        select cast(ts as date) as d, count(*) as n_events,
               count(distinct user_id) as n_users
        from events
        where ts >= timestamp '1995-01-01' and ts < timestamp '1995-02-01'
        group by cast(ts as date)
    )
    select cast(spine.d as varchar) as day,
           cast(coalesce(daily.n_events, 0) as bigint) as n_events,
           cast(coalesce(daily.n_users, 0) as bigint) as n_users
    from (select date '1995-01-01' + n as d from nums) spine
      left join daily on daily.d = spine.d
    order by day
    """,
)
def sql_recursive_spine(spark, sf_dir):
    """Recursive-CTE calendar spine (Spark 4's WITH RECURSIVE): generate
    all 31 January-1995 days by recursion, left-join the events table's
    daily activity, and emit zero rows for silent days — the canonical
    'gap-free report' shape that a non-recursive engine needs a
    sequence() explode for (gap_fill_linear's approach; this entry pins
    the SQL-standard form DuckDB also runs). Scale posture: recursion
    depth is the calendar length (31), driver-side plan unrolling only —
    the data-side work is one pruned scan + small aggregate; the spine
    side is 31 rows, broadcast. Spark's date arithmetic differs
    (date_add vs DuckDB's date + int), so the Spark plan is issued with
    its own dialect string below."""
    _tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        with recursive nums(n) as (
            select 0
            union all
            select n + 1 from nums where n < 30
        ),
        daily as (
            select cast(ts as date) as d, count(*) as n_events,
                   count(distinct user_id) as n_users
            from events
            where ts >= timestamp '1995-01-01' and ts < timestamp '1995-02-01'
            group by cast(ts as date)
        )
        select cast(spine.d as string) as day,
               coalesce(daily.n_events, 0) as n_events,
               coalesce(daily.n_users, 0) as n_users
        from (select date_add(date '1995-01-01', n) as d from nums) spine
          left join daily on daily.d = spine.d
        order by day
        """
    )


@register(
    "dedup_containment_capped",
    r"""
    with words as (
        -- coalesce mirrors the engine's shingles(): NULL text -> the
        -- single ''-shingle (degenerate audit r15)
        select doc_id, string_split_regex(trim(coalesce(text, '')), '\s+')
               as ws
        from documents
    ),
    sh as (
        select doc_id, unnest(list_distinct(
            [array_to_string(ws[i:i+2], ' ') for i in range(1, greatest(len(ws) - 2, 1) + 1)]
        )) as s
        from words
    ),
    dfreq as (select s, count(*) as dfv from sh group by s),
    kept as (
        select sh.doc_id, sh.s
        from sh join dfreq on sh.s = dfreq.s
        where dfreq.dfv <= 20
    ),
    sizes as (select doc_id, count(*) as n from kept group by doc_id),
    common as (
        select a.doc_id as id_a, b.doc_id as id_b, count(*) as c
        from kept a join kept b on a.s = b.s and a.doc_id <> b.doc_id
        group by 1, 2
    )
    select id_a, id_b, round(c / s1.n, 4) as containment
    from common join sizes s1 on id_a = s1.doc_id
    where round(c / s1.n, 4) >= 0.8
    """,
)
def dedup_containment_capped(spark, sf_dir):
    """Directed containment with the hot-shingle DOCUMENT-FREQUENCY cap
    (df <= 20) applied before the inverted-index self-join — the 100 TB
    mitigation dedup_containment's docstring prescribes, promoted to a
    first-class oracled operator. The self-join's cost is sum(df(s)^2):
    the round-7 sf1 scaling run measured the uncapped entry at 18x for
    10x docs precisely because replica boilerplate shingles fatten that
    tail; capping bounds every shingle's fan-out at df_cap^2 = 400 pairs
    and drops only non-discriminative shingles. Containment is measured
    over the kept-shingle universe (numerator AND denominator), so the
    ratio stays a true containment of the informative shingles. See
    operators/dedup.py:containment_pairs_capped."""
    return D.containment_pairs_capped(
        _tbl(spark, sf_dir, "documents"), threshold=0.8, shingle_n=3, df_cap=20
    )


@register(
    "dsir_importance_resample",
    r"""
    with toks as (
        select doc_id, lang,
               unnest(string_split_regex(lower(trim(text)), '\s+')) as token
        from documents
    ),
    stats as (
        select count(distinct token) as v, count(*) as tr,
               sum(case when lang = 'en' then 1 else 0 end) as tt
        from toks
    ),
    fr as (select token, count(*) as cr from toks group by token),
    ft as (select token, count(*) as ct from toks where lang = 'en'
           group by token),
    scored as (
        select t.doc_id, max(t.lang) as lang,
               round(sum(ln(cast(coalesce(ft.ct, 0) + 1 as double) / (tt + v))
                       - ln(cast(fr.cr + 1 as double) / (tr + v))), 4)
               + 0.0 as score
        from toks t
          join fr on t.token = fr.token
          left join ft on t.token = ft.token
          cross join stats
        group by t.doc_id
    )
    select doc_id, lang, score
    from scored
    order by score + round(-ln(-ln(
              ((('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::bigint + 1)
               / 4294967297.0))), 4) desc,
             doc_id
    limit 200
    """,
)
def dsir_importance_resample(spark, sf_dir):
    """DSIR-style data selection (importance resampling toward a target
    distribution; Xie et al. 2023, public): score every document by the
    summed log importance ratio (log of the DSIR weight; a per-token MEAN shrinks the signal below the Gumbel noise and degenerates to uniform sampling — pinned by test) between an add-one-smoothed
    TARGET unigram LM (here: the lang='en' slice) and the RAW-corpus LM,
    then draw a 200-doc sample via Gumbel-top-k — adding a deterministic
    Gumbel(0,1) perturbation (-ln(-ln(u)), u from the portable md5 lane)
    to each log-weight and taking the top k, which is exactly sampling
    without replacement proportional to the importance weights. Fully
    reproducible: no rand(), the same md5-lane trick as
    deterministic_sample. Scale: tokenize+explode, one broadcast-able
    token-frequency join pair, ONE 1-row corpus-stats attach
    (whitelisted scalar broadcast), per-doc aggregate, then
    TakeOrderedAndProject — no global sort materializes. FP posture:
    both engines round the score and the Gumbel key to 4 dp (ln drift
    ~1e-14, the text_unigram_logprob precedent), ties at the k-boundary
    broken by doc_id."""
    scored = _dsir_scored(spark, sf_dir)
    u = (
        (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
         .cast("long") + 1)
        / F.lit(4294967297.0)
    )
    gumbel = F.round(-F.log(-F.log(u)), 4)
    return (
        scored.orderBy((F.col("score") + gumbel).desc(), "doc_id")
        .limit(200)
        .select("doc_id", "lang", "score")
    )


def _dsir_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR importance log-weights (the scoring stage of
    dsir_importance_resample, before the Gumbel-top-k draw) — exposed so
    tests can compare the selected sample's score distribution against
    the full population's."""
    docs = _tbl(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang",
        F.explode(T.tokens(F.lower(F.trim(F.col("text"))))).alias("token"),
    )
    stats = toks.agg(
        F.countDistinct("token").alias("__v"),
        F.count("*").alias("__tr"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("__tt"),
    )
    fr = toks.groupBy("token").agg(F.count("*").alias("cr"))
    ft = (
        toks.filter(F.col("lang") == "en")
        .groupBy("token")
        .agg(F.count("*").alias("ct"))
    )
    lp = (
        F.log((F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
              / (F.col("__tt") + F.col("__v")))
        - F.log((F.col("cr") + 1).cast("double") / (F.col("__tr") + F.col("__v")))
    )
    # the token-frequency tables grow with VOCABULARY size, so no explicit
    # broadcast hint (ADVICE r7: an unconditional hint bypasses
    # autoBroadcastJoinThreshold and can OOM at corpus scale) — AQE picks
    # broadcast when the measured build side fits, shuffle join otherwise.
    # The 1-row stats attach stays an explicit broadcast: always tiny.
    return (
        toks.join(fr, "token")
        .join(ft, "token", "left")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        # + 0.0 normalizes IEEE -0.0 to +0.0 (cross-engine hash identity)
        .agg(F.max("lang").alias("lang"), (F.round(F.sum(lp), 4) + F.lit(0.0)).alias("score"))
    )


def _word_freqs(spark, sf_dir):
    """Word-frequency table (word, wc) over lowercased whitespace tokens,
    single-char words dropped — the shared input of the two BPE entries
    (bpe_pair_counts and bpe_train_merges) and the exact Spark twin of
    their oracles' word CTE. One definition so a tokenization change
    cannot desynchronize the siblings."""
    docs = _tbl(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(T.tokens(F.lower(F.trim(F.col("text"))))).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("wc"))
        .filter(F.length("word") >= 2)
    )


@register(
    "bpe_pair_counts",
    r"""
    with words as (
        select word, count(*) as wc from (
            select unnest(string_split_regex(lower(trim(text)), '\s+')) as word
            from documents
        ) group by word
    )
    select substr(word, i, 2) as pair, cast(sum(wc) as bigint) as pair_count
    from (select word, wc, unnest(range(1, len(word))) as i
          from words where len(word) >= 2)
    group by pair
    order by pair_count desc, pair
    limit 20
    """,
)
def bpe_pair_counts(spark, sf_dir):
    """BPE tokenizer-training inner loop, distributed: count adjacent
    symbol pairs across the corpus weighted by word frequency — the
    statistic each byte-pair-encoding merge step maximizes. The key
    scale move is aggregating words FIRST (|vocab| rows, zipfian-small)
    so the quadratic-ish pair explode runs over distinct words x their
    counts, not over every token occurrence; pair emission is
    substr(word, i, 2) over a per-row index sequence — no Python, no
    shuffle until the final pair aggregate. Integer counts, engine-exact
    top-20 with lexicographic tiebreak."""
    words = _word_freqs(spark, sf_dir)
    pairs = words.select(
        "wc",
        F.explode(F.sequence(F.lit(1), F.length("word") - 1)).alias("i"),
        F.col("word"),
    ).select(F.expr("substr(word, i, 2)").alias("pair"), "wc")
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wc").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "pair")
        .limit(20)
    )


@register(
    "tpch_q8_market_share",
    """
    select o_year,
           cast(sum(case when supp_nation = 'NATION_1' then cents else 0 end)
                as double)
           / cast(sum(cents) as double) as mkt_share
    from (
        select year(o.o_orderdate) as o_year,
               n1.n_name as supp_nation,
               cast(floor(l.l_extendedprice * (1 - l.l_discount) * 10000.0)
                    as bigint) as cents
        from lineitem l
          join part p on p.p_partkey = l.l_partkey
          join supplier s on s.s_suppkey = l.l_suppkey
          join orders o on o.o_orderkey = l.l_orderkey
          join customer c on c.c_custkey = o.o_custkey
          join nation n1 on s.s_nationkey = n1.n_nationkey
          join nation n2 on c.c_nationkey = n2.n_nationkey
          join region r on n2.n_regionkey = r.r_regionkey
        where r.r_name = 'EUROPE'
          and p.p_type = 'ECONOMY'
          and o.o_orderdate >= timestamp '1996-01-01'
          and o.o_orderdate < timestamp '1998-01-01'
    ) all_nations
    group by o_year
    order by o_year
    """,
)
def tpch_q8_market_share(spark, sf_dir):
    """TPC-H Q8 (national market share): NATION_1 suppliers' share of
    ECONOMY-part revenue among EUROPE-region customers, by order year — the
    suite's widest join fan (8 tables: lineitem reaches nation through
    BOTH the supplier and the orders->customer->region chain). Adapted
    names only (NATION_k / REGION_k / p_type domain). The ratio is two
    floor-quantized bigint-cent sums -> one exact double division per
    year, so no float-summation-order hazard. Spark-first: every dim
    (part, supplier, customer, nation x2, region) broadcasts; the only
    fact-fact shuffle is lineitem-orders on orderkey; both CASE sums
    fold into one HashAggregate pass keyed by year."""
    for t in ("lineitem", "part", "supplier", "orders", "customer", "nation", "region"):
        _tbl(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(ORACLE["tpch_q8_market_share"])


@register(
    "tpch_q20_excess_stock",
    """
    with partsupp as (
        select l_partkey as ps_partkey, l_suppkey as ps_suppkey,
               sum(l_quantity) as ps_qty
        from lineitem group by 1, 2
    )
    select s_name, round(s_acctbal, 2) as s_acctbal
    from supplier join nation on s_nationkey = n_nationkey
    where n_name = 'NATION_1'
      and s_suppkey in (
          select ps1.ps_suppkey from partsupp ps1
          where ps1.ps_partkey in (
              select p_partkey from part where p_type = 'SMALL'
          )
          and ps1.ps_qty * (
              select count(*) from partsupp p2
              where p2.ps_partkey = ps1.ps_partkey
          ) > 2.0 * (
              select sum(p3.ps_qty) from partsupp p3
              where p3.ps_partkey = ps1.ps_partkey
          )
      )
    order by s_name
    """,
)
def tpch_q20_excess_stock(spark, sf_dir):
    """TPC-H Q20 (potential part promotion): the NESTED subquery chain —
    an IN whose subquery contains another IN plus CORRELATED scalar
    aggregates. Adapted: no partsupp/availqty in the fixture, so
    partsupp derives from lineitem and 'availqty > half of this
    part's lineitem volume' becomes 'this supplier carries more than
    2x the part's FAIR SHARE of shipped quantity' (qty * n_suppliers >
    2 * total — a dominant-supplier query; an absolute 50% cut goes
    vacuous as supplier counts per part grow with SF, this stays
    populated at every SF). Shape-identical correlation, doubled: two
    correlated scalar aggregates over the same derived partsupp.
    Determinism: l_quantity is integral, so every sum/count is exact
    and the comparison cannot flip. Spark-first: Catalyst decorrelates the scalar sum into a
    per-partkey aggregate equi-joined back; both INs become LEFT SEMI
    joins; part's p_type filter broadcasts into the chain."""
    for t in ("lineitem", "supplier", "nation", "part"):
        _tbl(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(ORACLE["tpch_q20_excess_stock"])


@register(
    "tpch_q21_waiting_suppliers",
    """
    select s_name, cast(count(*) as bigint) as numwait
    from supplier s
      join lineitem l1 on s.s_suppkey = l1.l_suppkey
      join orders o on o.o_orderkey = l1.l_orderkey
      join nation n on s.s_nationkey = n.n_nationkey
    where n.n_name = 'NATION_1'
      and o.o_orderstatus = 'F'
      and l1.l_shipdate >= o.o_orderdate + interval 60 day
      and exists (
          select 1 from lineitem l2
          where l2.l_orderkey = l1.l_orderkey
            and l2.l_suppkey <> l1.l_suppkey
      )
      and not exists (
          select 1 from lineitem l3
          where l3.l_orderkey = l1.l_orderkey
            and l3.l_suppkey <> l1.l_suppkey
            and l3.l_shipdate > l1.l_shipdate
      )
    group by s_name
    order by numwait desc, s_name
    """,
)
def tpch_q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 (suppliers who kept orders waiting): the double
    correlated EXISTS / NOT EXISTS — the hardest TPC-H subquery shape.
    Adapted: no commit/receipt dates, so 'delivered late' is shipdate
    >= orderdate + 60d, and the l2/l3 correlation keys on shipdate
    (the supplier who shipped LAST among multi-supplier finished
    orders). Spark-first REWRITE: the NOT EXISTS carries an inequality
    correlation (l3.l_shipdate > l1.l_shipdate), which a hash join
    cannot express — Spark would fall to a nested-loop per order — so
    it is restated as l1.shipdate >= max(shipdate over the order's
    OTHER suppliers), derived once per (order, supplier) with the
    top-2 trick (per-supplier max -> per-order global max m1, count of
    suppliers at m1, runner-up m2; max_other = m2 only for the unique
    m1 holder). Everything becomes keyed equi-joins on orderkey — the
    classic manual decorrelation Catalyst cannot do automatically for
    inequality correlation. The DuckDB oracle keeps the canonical
    nested-EXISTS form, proving the rewrite equivalent on every
    fixture."""
    li = _tbl(spark, sf_dir, "lineitem")
    # "no OTHER supplier shipped strictly later than l1" ==
    # l1.shipdate >= max shipdate over the order's OTHER suppliers.
    # Derive that per (order, supplier) with the top-2 trick: per-supplier
    # max -> per-order global max m1, #suppliers at m1, runner-up m2;
    # max_other = m1 unless this supplier is the UNIQUE holder of m1, in
    # which case m2.
    #
    # r17 (guide §2.4 — share one partitioning): the per-order stats
    # used to be two AGGREGATE+JOIN round-trips over ms, which
    # referenced (and re-aggregated) the ms subtree three times — four
    # lineitem scans in the sf1 plan. The same stats are order-grain
    # functions of ms rows, i.e. two chained windows over ONE
    # partitionBy(l_orderkey) — a single exchange+sort, no join-backs.
    # Plan: 10 Exchanges -> 7, lineitem scans 4 -> 2
    # (plans/r17/tpch_q21_waiting_suppliers_sf1_{before,after}.txt);
    # same-session A/B at sf1: 5.70/10.47 -> 4.58/5.16 s (min/median),
    # identical 31 rows.
    ms = li.groupBy("l_orderkey", "l_suppkey").agg(F.max("l_shipdate").alias("ms"))
    w = Window.partitionBy("l_orderkey")
    e1 = ms.select(
        "l_orderkey", "l_suppkey", "ms",
        F.count("*").over(w).alias("n_supp"),
        F.max("ms").over(w).alias("m1"),
    )
    e2 = e1.select(
        "l_orderkey", "l_suppkey", "ms", "n_supp", "m1",
        F.sum(F.when(F.col("ms") == F.col("m1"), 1).otherwise(0)).over(w).alias("cnt1"),
        F.max(F.when(F.col("ms") < F.col("m1"), F.col("ms"))).over(w).alias("m2"),
    )
    max_other = e2.select(
        "l_orderkey", "l_suppkey", "n_supp",
        F.when(
            (F.col("ms") == F.col("m1")) & (F.col("cnt1") == 1), F.col("m2")
        ).otherwise(F.col("m1")).alias("max_other"),
    )
    s = _tbl(spark, sf_dir, "supplier")
    n = _tbl(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    o = _tbl(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        li.join(max_other, ["l_orderkey", "l_suppkey"])
        .filter((F.col("n_supp") > 1) & (F.col("l_shipdate") >= F.col("max_other")))
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


@register(
    "tpch_q9_product_profit",
    """
    with partsupp as (
        select l_partkey as ps_partkey, l_suppkey as ps_suppkey,
               min(l_extendedprice / l_quantity) as ps_supplycost
        from lineitem group by 1, 2
    )
    select nation, o_year,
           cast(sum(profit_cents) as double) / 10000.0 as sum_profit
    from (
        select n.n_name as nation, year(o.o_orderdate) as o_year,
               cast(floor((l.l_extendedprice * (1 - l.l_discount)
                           - ps.ps_supplycost * l.l_quantity) * 10000.0)
                    as bigint) as profit_cents
        from lineitem l
          join part p on p.p_partkey = l.l_partkey
          join supplier s on s.s_suppkey = l.l_suppkey
          join partsupp ps on ps.ps_partkey = l.l_partkey
                          and ps.ps_suppkey = l.l_suppkey
          join orders o on o.o_orderkey = l.l_orderkey
          join nation n on s.s_nationkey = n.n_nationkey
        where p.p_name like '%ring%'
    ) profit
    group by nation, o_year
    order by nation, o_year desc
    """,
)
def tpch_q9_product_profit(spark, sf_dir):
    """TPC-H Q9 (product type profit): per-nation per-year profit on a
    part-name LIKE family — the composite-key fact-to-derived-fact join
    (lineitem joins the derived partsupp on BOTH partkey and suppkey).
    Adapted: ps_supplycost is Q2's derived min unit price
    (min(l_extendedprice / l_quantity) per part-supplier), p_name LIKE
    '%ring%' replaces '%green%' (fixture name vocabulary). Determinism:
    ps_supplycost is a min over identical IEEE divisions — the same
    double on any engine — so each profit term is floor-quantized from
    an engine-identical product. Spark-first: the '%ring%' filter can't
    prune the scan but broadcasts part early; partsupp shuffles once on
    the composite key, reused by the probe join; nation broadcasts."""
    for t in ("lineitem", "part", "supplier", "orders", "nation"):
        _tbl(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(ORACLE["tpch_q9_product_profit"])


@register(
    "tpch_q11_important_stock",
    """
    with partsupp as (
        select l.l_partkey as ps_partkey,
               cast(floor(min(l.l_extendedprice / l.l_quantity)
                          * sum(l.l_quantity) * 100.0) as bigint) as value_cents
        from lineitem l
          join supplier s on s.s_suppkey = l.l_suppkey
          join nation n on s.s_nationkey = n.n_nationkey
        where n.n_name = 'NATION_1'
        group by l.l_partkey, l.l_suppkey
    )
    select ps_partkey, cast(sum(value_cents) as double) / 100.0 as value
    from partsupp
    group by ps_partkey
    having sum(value_cents) > (
        select sum(value_cents) * 0.001 from partsupp
    )
    order by value desc, ps_partkey
    """,
)
def tpch_q11_important_stock(spark, sf_dir):
    """TPC-H Q11 (important stock identification): the HAVING-with-
    global-scalar-subquery shape — per-part inventory value within one
    nation, kept only when it exceeds a fraction of the NATION-WIDE
    total (0.001, scaled to the fixture). Adapted: value :=
    min-unit-price x total shipped quantity per (part, supplier),
    floor-quantized to bigint cents at the leaf so both the per-part
    sums and the global threshold sum are exact integer arithmetic —
    the canonical query's double sum would hash-flip on summation
    order. Spark-first: one aggregate produces the per-(part,supplier)
    values; the global total is the same aggregated relation reduced
    again and attached as a scalar subquery (Spark plans it as a
    separate tiny subquery stage, not a join); supplier/nation
    broadcast into the grouped scan."""
    for t in ("lineitem", "supplier", "nation"):
        _tbl(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(ORACLE["tpch_q11_important_stock"])




def _dpp_fact_path(spark: SparkSession, sf_dir: str) -> str:
    """Write (once per session+sf_dir) lineitem partitioned by ship year
    to a temp lake, for the DPP entry. Cached so repeated invocations in
    one session re-use the layout (the realistic shape: the lake exists,
    queries come later)."""
    # deterministic path keyed by sf_dir (stream_source's digest scheme):
    # every session — bench, pytest, driver — resolves the SAME lake and
    # reuses it instead of writing a fresh mkdtemp copy per session
    # (ADVICE r7: the per-session copies accumulated in /tmp). A completed
    # write is detected by parquet's _SUCCESS marker; a session that finds
    # it skips the write entirely.
    # key the shared lake on the fixture's CONTENT as well as its path
    # (ADVICE r8/r9) — see _parquet_fingerprint for the footer-hash
    # rationale
    digest = _parquet_fingerprint(sf_dir, "lineitem")
    path = os.path.join(tempfile.gettempdir(), f"dpp_lake_{digest}", "lake")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    # build in a private staging dir, then atomically rename into place:
    # two sessions racing this function (bench alongside pytest) must not
    # interleave writes under one directory — the loser of the rename
    # keeps the winner's complete lake and discards its own copy
    stage = os.path.join(tempfile.mkdtemp(prefix=f"dpp_stage_{digest}_"), "lake")
    (
        _tbl(spark, sf_dir, "lineitem")
        .withColumn("l_year", F.year("l_shipdate"))
        .write.partitionBy("l_year")
        .mode("overwrite")
        .parquet(stage)
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    try:
        os.rename(stage, path)
    except OSError:
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            raise
        import shutil

        shutil.rmtree(stage, ignore_errors=True)
    # drop the now-empty (or discarded) staging parent either way
    import shutil

    shutil.rmtree(os.path.dirname(stage), ignore_errors=True)
    return path


@register(
    "dpp_partition_pruned_join",
    """
    with dim as (
        select distinct year(o_orderdate) as o_year
        from orders
        where o_orderdate >= timestamp '1999-06-01'
    )
    select cast(year(l_shipdate) as int) as l_year,
           cast(count(*) as bigint) as n_lines,
           cast(sum(cast(floor(l_extendedprice * (1 - l_discount) * 10000.0)
                         as bigint)) as double) / 10000.0 as revenue
    from lineitem join dim on year(l_shipdate) = o_year
    group by 1
    order by l_year
    """,
)
def dpp_partition_pruned_join(spark, sf_dir):
    """Dynamic partition pruning: the fact table is laid out partitioned
    by ship year, and the dim side is 'the distinct order years since
    1999-06' — the qualifying year SET exists only at runtime (no
    optimizer rule derives year(o_orderdate) bounds from a timestamp
    range, so static partition pruning cannot apply; a LIMIT-based dim
    doesn't even trigger the rule, which requires a selective
    predicate). Spark inserts a dynamicpruning#... subquery on the fact's partition
    column at runtime, reusing the broadcast dim to skip the losing
    year partitions entirely — at 100 TB this is the difference between
    scanning 3/7 of the lake and all of it. Plan shape (partitioned
    scan + PartitionFilters: [dynamicpruning...]) is pinned in
    tests/test_round7_ops.py; the oracle replays the same join against
    the unpartitioned source (results are layout-independent).
    EXECUTES_ON_BUILD: the partitioned lake is written once per
    session."""
    path = _dpp_fact_path(spark, sf_dir)
    fact = spark.read.parquet(path)
    dim = (
        _tbl(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-06-01").cast("timestamp"))
        .select(F.year("o_orderdate").alias("o_year"))
        .distinct()
    )
    cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(10000.0))
    return (
        fact.join(F.broadcast(dim), fact.l_year == F.col("o_year"))
        .groupBy(F.col("l_year").cast("int").alias("l_year"))
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            (F.sum(cents.cast("bigint")).cast("double") / F.lit(10000.0)).alias("revenue"),
        )
        .orderBy("l_year")
    )


@register(
    "skyline_pareto_frontier",
    """
    select p_partkey, p_retailprice, p_size
    from part p
    where not exists (
        select 1 from part b
        where b.p_retailprice <= p.p_retailprice and b.p_size >= p.p_size
          and (b.p_retailprice < p.p_retailprice or b.p_size > p.p_size)
    )
    order by p_retailprice, p_partkey
    """,
)
def skyline_pareto_frontier(spark, sf_dir):
    """2-D skyline (Pareto frontier): parts not strictly dominated on
    (minimize retail price, maximize size) — the classic multi-criteria
    shortlist. The canonical form is a correlated NOT EXISTS with
    INEQUALITY correlation on both attributes (the DuckDB oracle keeps
    it), which on any engine degenerates to an O(n^2) nested loop.
    Spark-first rewrite, O(n log n) and equi-join-only: collapse to
    per-distinct-price max size (value-domain bounded: <=10k two-decimal
    prices in [900, 1000]), then a TWO-LEVEL distributed prefix max (the
    cumulative_distinct_users pattern) — intra-bucket running max over a
    window PARTITIONED by $10 price bucket plus a broadcast cross-bucket
    exclusive prefix-max carry — yielding for every price the max size
    among STRICTLY cheaper parts. A part survives iff that max is
    smaller than its size (no cheaper part at least as big) AND no
    same-price part is strictly bigger. No global window, no
    cartesian; the frontier itself is ~H(n) = ln(n) rows."""
    part = _tbl(spark, sf_dir, "part").select("p_partkey", "p_retailprice", "p_size")
    pp = (
        part.groupBy("p_retailprice")
        .agg(F.max("p_size").alias("mx"))
        .withColumn("bkt", F.floor(F.col("p_retailprice") / F.lit(10.0)))
    )
    w = (
        Window.partitionBy("bkt")
        .orderBy("p_retailprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # exclusive cross-bucket carry: max bucket-max over all EARLIER buckets
    carry = (
        pp.groupBy("bkt").agg(F.max("mx").alias("bm"))
        .agg(F.sort_array(F.collect_list(F.struct("bkt", "bm"))).alias("a"))
        .select(
            F.explode(
                F.expr(
                    "transform(a, (s, i) -> struct(s.bkt as bkt, "
                    "aggregate(slice(a, 1, i), -1L, "  # i is 0-based: exclusive prefix
                    "(acc, t) -> greatest(acc, cast(t.bm as bigint))) as carry))"
                )
            ).alias("s")
        )
        .select("s.bkt", "s.carry")
    )
    ranked = (
        pp.withColumn("runmax_le", F.max("mx").over(w))
        .withColumn("lag_le", F.lag("runmax_le").over(Window.partitionBy("bkt").orderBy("p_retailprice")))
        .join(F.broadcast(carry), "bkt")
        .select(
            "p_retailprice", "mx",
            F.greatest(F.coalesce(F.col("lag_le"), F.lit(-1)).cast("long"), F.col("carry"))
            .alias("runmax_lt"),
        )
    )
    return (
        part.join(ranked, "p_retailprice")
        .filter(
            (F.col("runmax_lt") < F.col("p_size")) & (F.col("mx") <= F.col("p_size"))
        )
        .select("p_partkey", "p_retailprice", "p_size")
        .orderBy("p_retailprice", "p_partkey")
    )


@register(
    "pit_join_scd2",
    """
    with o as (
        select user_id, ts, event_id, event_type,
               lag(event_type) over (partition by user_id order by ts, event_id)
                 as prev
        from events
    ),
    c as (
        select user_id, ts, event_id, event_type from o
        where prev is null or prev <> event_type
    ),
    hist as (
        select user_id, event_type, ts as valid_from,
               lead(ts) over (partition by user_id order by ts, event_id)
                 as valid_to
        from c
    ),
    probes as (
        select event_id, user_id, ts from events
        where event_type = 'purchase'
    )
    select p.event_id, p.user_id, p.ts, h.event_type as state_at
    from probes p join hist h on p.user_id = h.user_id
     and h.valid_from <= p.ts
     and (h.valid_to is null or p.ts < h.valid_to)
    """,
)
def pit_join_scd2(spark, sf_dir):
    """Point-in-time (PIT) join against the SCD2 dimension — the
    feature-store primitive that makes training joins leakage-free:
    each label row (here: every purchase event) is joined to the
    dimension state that was valid AT ITS TIMESTAMP, never to a future
    version. The oracle keeps the canonical interval-predicate join
    (valid_from <= ts < valid_to), which on any engine is a range join;
    the Spark plan observes that PIT-validity equals backward-AS-OF on
    the version start times, and reuses the one-pass union+window as-of
    plan (operators/timeseries.asof_join): one shuffle on user_id,
    linear, no range-condition fan-out. Zero-length versions (two state
    changes at one timestamp) are dropped from the quote side first —
    exactly the rows the canonical interval predicate can never match —
    which also dedupes quotes to one per (key, ts)."""
    from database_extractor_spark.operators.timeseries import asof_join, scd2_history

    ev = _tbl(spark, sf_dir, "events")
    hist = scd2_history(ev, "user_id", "event_type", "ts", tiebreak_col="event_id")
    quotes = hist.filter(
        F.col("valid_to").isNull() | (F.col("valid_to") > F.col("valid_from"))
    ).select("user_id", F.col("valid_from").alias("qts"), F.col("event_type").alias("state"))
    probes = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        probes, quotes, on=["user_id"], left_ts="ts", right_ts="qts",
        value_col="state", out_col="state_at",
    )
    # the oracle's INNER interval join: drop probes with no valid version
    # (cannot occur on this fixture — every probe is itself in the log —
    # but keeps the semantics aligned if a probe predates all history)
    return out.filter(F.col("state_at").isNotNull()).select(
        "event_id", "user_id", "ts", "state_at"
    )


@register(
    "variant_semi_structured",
    """
    select event_type,
           cast(count(*) as bigint) as n,
           cast(sum(cast(json_extract(props, '$.k') as bigint)) as bigint)
             as sum_k,
           cast(max(cast(json_extract(props, '$.k') as bigint)) as bigint)
             as max_k
    from events
    where cast(json_extract(props, '$.k') as bigint) >= 50
    group by event_type
    order by event_type
    """,
)
def variant_semi_structured(spark, sf_dir):
    """Semi-structured analytics through Spark 4's VARIANT type: props is
    parsed ONCE into the binary variant encoding (parse_json), then
    field access is variant_get path extraction — the open-table-format
    answer to schema-on-read JSON columns (vs json_funcs' per-access
    get_json_object string re-parsing; at 100 TB the single parse +
    binary field reads replace N string scans per row). The oracle
    states the same pipeline over DuckDB's JSON extraction; all
    extracted values are integers, so the filter/sums are engine-exact."""
    ev = _tbl(spark, sf_dir, "events")
    k = F.expr("cast(variant_get(parse_json(props), '$.k', 'bigint') as bigint)")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k") >= 50)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.max("k").cast("bigint").alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "python_datasource_sink_roundtrip",
    """
    select event_type, cast(count(*) as bigint) as n,
           cast(sum(cast(floor(value * 1000.0) as bigint)) as double) / 1000.0
             as sum_val
    from events
    where event_id % 5 = 0
    group by event_type
    order by event_type
    """,
)
def python_datasource_sink_roundtrip(spark, sf_dir):
    """Writer face of the Spark 4 custom Python Data Source seam
    (sources/custom.py:JsonlSinkDataSource): every 5th event is written
    through ``format("jsonl_sink")`` — partition-parallel Python
    writers, two-phase staged-file commit (a failed or speculative task
    can never leave partial output visible) — then read back with an
    explicit schema and aggregated; the oracle replays the aggregate on
    the original table, so any row lost, duplicated, or corrupted by
    the sink fails the value hash. Completes the custom-connector
    surface: batch read (r04), stream read (r06), and now write.
    EXECUTES_ON_BUILD (the sink runs on call)."""
    from database_extractor_spark.sources.custom import register_jsonl_sink

    register_jsonl_sink(spark)
    out_dir = os.path.join(tempfile.mkdtemp(prefix="pyds_sink_"), "out")
    ev = (
        _tbl(spark, sf_dir, "events")
        .filter(F.col("event_id") % 5 == 0)
        .select("event_id", "event_type", "value")
    )
    ev.write.format("jsonl_sink").option("path", out_dir).mode("append").save()
    back = spark.read.schema("event_id bigint, event_type string, value double").json(
        out_dir
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            (F.sum(F.floor(F.col("value") * 1000.0).cast("bigint")).cast("double")
             / F.lit(1000.0)).alias("sum_val"),
        )
        .orderBy("event_type")
    )


def _mmr_pool_plan(spark: SparkSession, sf_dir: str, pool: int = 50) -> DataFrame:
    """The DISTRIBUTED stage of mmr_diversified_topk: quantize every
    embedding to 1e6-scaled bigints, score relevance against the
    vec_id=0 query vector as an integer dot product (exact — max |dot|
    ~2e13 is far under 2^53, so even double math on these values is
    exact), and take the top-``pool`` candidates. Exposed separately so
    tests/test_plan_lint.py can assert the full lazy plan
    (TakeOrderedAndProject, no cartesian) — the registry entry collects
    this pool on build (bounded: pool x 64 bigints), so the entry's own
    returned plan is a LocalTableScan."""
    emb = _tbl(spark, sf_dir, "embeddings").select(
        "vec_id",
        # widen float->double BEFORE the multiply: a float x float product
        # rounds to 24-bit mantissa first (DuckDB's default), landing some
        # values exactly on .5 and flipping the round vs double math
        F.expr(
            "transform(embedding, x -> cast(round(cast(x as double) * 1000000.0) as bigint))"
        ).alias("e"),
    )
    qe = emb.filter("vec_id = 0").select(F.col("e").alias("qe"))
    return (
        emb.filter("vec_id <> 0")
        .crossJoin(F.broadcast(qe))
        .select(
            "vec_id", "e",
            F.expr(
                "aggregate(zip_with(e, qe, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"
            ).alias("rel"),
        )
        .orderBy(F.col("rel").desc(), "vec_id")
        .limit(pool)
    )


def _mmr_oracle_sql(pool: int = 50, k: int = 10) -> str:
    """Unrolled-CTE DuckDB replay of the MMR greedy (the PCA-oracle
    pattern applied to submodular selection): sel1 = argmax relevance;
    sel{i} adds the argmax of 7*rel - 3*max_dot_to_selected. All
    arithmetic is integer-valued (1e6-quantized embeddings; dots < 2^53
    so DOUBLE list_dot_product is exact), ties broken by vec_id — the
    selection is bit-reproducible on any engine."""
    # every CTE is MATERIALIZED: DuckDB inlines CTEs by default, and each
    # sel{{i}} references sel{{i-1}} three times — naive inlining expands
    # the chain 3^k-fold (observed as "too many open files" on the
    # parquet view). Materialization keeps the unroll linear in k.
    parts = [f"""
    with emb as materialized (
        select vec_id,
               [cast(round(cast(x as double) * 1000000.0) as bigint)
                for x in embedding] as e
        from embeddings
    ),
    q as materialized (select e as qe from emb where vec_id = 0),
    pool as materialized (
        select emb.vec_id, emb.e,
               cast(list_dot_product(emb.e::DOUBLE[], q.qe::DOUBLE[]) as bigint) as rel
        from emb, q where emb.vec_id <> 0
        order by rel desc, vec_id limit {pool}
    ),
    sel1 as materialized (select vec_id, e, rel, 1 as rank from pool
             order by rel desc, vec_id limit 1)"""]
    for i in range(2, k + 1):
        parts.append(f""",
    s{i} as materialized (
        select p.vec_id, p.e, p.rel, {i} as rank
        from pool p
        where p.vec_id not in (select vec_id from sel{i - 1})
        order by 7 * p.rel - 3 * (
            select max(cast(list_dot_product(p.e::DOUBLE[], s.e::DOUBLE[]) as bigint))
            from sel{i - 1} s) desc, p.vec_id
        limit 1
    ),
    sel{i} as materialized (select * from sel{i - 1} union all select * from s{i})""")
    parts.append(f"""
    select cast(rank as int) as rank, vec_id, rel as relevance
    from sel{k} order by rank""")
    return "".join(parts)


@register("mmr_diversified_topk", _mmr_oracle_sql())
def mmr_diversified_topk(spark, sf_dir):
    """Maximal Marginal Relevance selection (Carbonell & Goldstein 1998,
    public): pick k=10 vectors that are RELEVANT to the query but
    mutually DIVERSE — greedy argmax of lambda*rel(c) -
    (1-lambda)*max_{s in S} sim(c, s), lambda=0.7 (integerized as
    7*rel - 3*maxsim). The training-data use case: diverse few-shot /
    eval-set selection where plain top-k returns 10 near-duplicates.

    Spark-first split: relevance scoring + top-50 pooling run
    distributed over the full corpus (_mmr_pool_plan —
    TakeOrderedAndProject, integer-exact dots); the greedy itself is
    inherently sequential over k x pool = 500 comparisons, so the pool
    (bounded by construction: 50 rows x 64 bigints) is collected as
    model state — the union-find/PCA bounded-collect pattern — and the
    selection replayed in exact int64 arithmetic. At 100 TB only the
    pool stage grows; the greedy stays 500 comparisons. Oracle: the
    full greedy unrolled as 10 chained CTEs, bit-identical integer
    scores, vec_id ties."""
    rows = _mmr_pool_plan(spark, sf_dir, pool=50).collect()
    import numpy as np

    E = {int(r["vec_id"]): np.asarray(r["e"], dtype=np.int64) for r in rows}
    rel = {int(r["vec_id"]): int(r["rel"]) for r in rows}
    selected: list[int] = []
    out: list[tuple[int, int, int]] = []
    while len(out) < 10 and len(out) < len(E):
        best = None
        for vid in sorted(E):
            if vid in selected:
                continue
            maxsim = max((int(E[vid] @ E[s]) for s in selected), default=0)
            score = 7 * rel[vid] - 3 * maxsim
            if best is None or score > best[0]:
                best = (score, vid)
        selected.append(best[1])
        out.append((len(out) + 1, best[1], rel[best[1]]))
    return spark.createDataFrame(out, "rank int, vec_id bigint, relevance bigint")


# ==========================================================================

@register(
    "market_basket_lift",
    """
    with ob as (
        select distinct l_orderkey, p_brand
        from lineitem join part on l_partkey = p_partkey
    ),
    pr as (
        select a.p_brand as brand_a, b.p_brand as brand_b,
               cast(count(*) as bigint) as n_ab
        from ob a join ob b
          on a.l_orderkey = b.l_orderkey and a.p_brand < b.p_brand
        group by 1, 2
    ),
    bt as (select p_brand, cast(count(*) as bigint) as n from ob group by 1),
    tot as (select cast(count(distinct l_orderkey) as bigint) as n_orders
            from ob)
    select brand_a, brand_b, n_ab, ta.n as n_a, tb.n as n_b,
           cast(n_ab * n_orders as double)
               / cast(ta.n * tb.n as double) as lift
    from pr
    join bt ta on pr.brand_a = ta.p_brand
    join bt tb on pr.brand_b = tb.p_brand
    cross join tot
    order by n_ab desc, brand_a, brand_b
    limit 20
    """,
)
def market_basket_lift(spark, sf_dir):
    """MARKET-BASKET CO-OCCURRENCE with lift — the association-rule
    primitive (brands bought together within one order, scored by
    lift = P(a,b) / (P(a)P(b))): collapse lineitem x part to ONE sorted
    distinct-brand array per order (a single orderkey-keyed aggregate),
    enumerate within-basket pairs IN-ROW from that array (brand_a <
    brand_b by the sort), then attach per-brand marginals and the order
    total. The lift ratio is computed from four exact bigints with ONE
    double division at the end (identical expression both engines), so
    ordering by n_ab with the full (brand_a, brand_b) tiebreak is
    deterministic. Scale (r16 rework, measured at sf10): the original
    distinct + orderkey self-join paid THREE ~55M-row exchanges
    (distinct on (order, brand), then both self-join sides re-shuffled
    on orderkey) and read 161 s at sf10; the basket-array form pays ONE
    exchange (the groupBy(orderkey) collect_set, map-side combinable)
    and generates the Σ C(b(o), 2) pairs — bounded by basket size
    (TPC-H ≤ 7 lineitems), never corpus-quadratic — inside the row via
    an indexed transform over the sorted array: 23 s at sf10. Brand
    marginals and the order total fall out of the SAME array table
    (explode / count), so nothing rescans the fact join."""
    li = _tbl(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pt = _tbl(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # ADVICE r16: the part dim grows 200k x SF rows — SF-linear, so an
    # unconditional broadcast is unbounded model state by this repo's
    # own discipline. Gate on the on-disk footprint: the 2-column
    # projection of part stays broadcastable far past sf10 (~6 MB/SF
    # on disk), but past the gate the plan degrades gracefully to the
    # shuffle join rather than OOMing the driver. The "ONE exchange"
    # claim below holds in the broadcast regime; in the fallback regime
    # the dim join adds its own exchange by design.
    part_bytes = _path_bytes(os.path.join(sf_dir, "part.parquet"))
    dim = pt if part_bytes > 512 * 1024 * 1024 else F.broadcast(pt)
    arr = (
        li.join(dim, li.l_partkey == pt.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("p_brand")).alias("bs"))
    )
    pair_expr = (
        "flatten(transform(bs, (x, i) -> "
        "transform(slice(bs, i + 2, size(bs) - i - 1), "
        "y -> named_struct('brand_a', x, 'brand_b', y))))"
    )
    pr = (
        arr.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.brand_a", "p.brand_b")
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").cast("bigint").alias("n_ab"))
    )
    bt = (
        arr.select(F.explode("bs").alias("p_brand"))
        .groupBy("p_brand")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    tot = arr.agg(F.count("*").cast("bigint").alias("n_orders"))
    return (
        pr.join(
            F.broadcast(bt.withColumnRenamed("n", "n_a")),
            pr.brand_a == F.col("p_brand"),
        )
        .drop("p_brand")
        .join(
            F.broadcast(bt.withColumnRenamed("n", "n_b")),
            F.col("brand_b") == F.col("p_brand"),
        )
        .drop("p_brand")
        .crossJoin(F.broadcast(tot))
        .select(
            "brand_a",
            "brand_b",
            "n_ab",
            "n_a",
            "n_b",
            (
                (F.col("n_ab") * F.col("n_orders")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("lift"),
        )
        .orderBy(F.desc("n_ab"), "brand_a", "brand_b")
        .limit(20)
    )


@register(
    "revenue_pareto_by_nation",
    """
    with rev as (
        select c.c_nationkey, o.o_custkey,
               sum(cast(o.o_totalprice as decimal(28,4))) as r
        from orders o join customer c on o.o_custkey = c.c_custkey
        group by c.c_nationkey, o.o_custkey
    ),
    ranked as (
        select c_nationkey, r,
               cast(row_number() over (
                   partition by c_nationkey
                   order by r desc, o_custkey) as bigint) as rk,
               sum(r) over (
                   partition by c_nationkey
                   order by r desc, o_custkey
                   rows between unbounded preceding and current row)
                   as cum_r,
               cast(count(*) over (partition by c_nationkey) as bigint)
                   as n_cust,
               sum(r) over (partition by c_nationkey) as tot_r
        from rev
    ),
    hit as (
        select c_nationkey, n_cust, tot_r, min(rk) as top_n
        from ranked
        where cum_r * 10 >= tot_r * 8
        group by c_nationkey, n_cust, tot_r
    )
    select n.n_name as nation, h.n_cust as n_customers, h.top_n,
           round(cast(h.top_n as double) / cast(h.n_cust as double), 6)
               as pareto_share,
           round(cast(h.tot_r as double), 2) as total_revenue
    from hit h join nation n on h.c_nationkey = n.n_nationkey
    order by nation
    """,
)
def revenue_pareto_by_nation(spark, sf_dir):
    """REVENUE PARETO CONCENTRATION per nation — the smallest number of
    customers covering 80% of a market's revenue, and the share of the
    customer base they represent (the classic 80/20 account-management
    screen; token_gini_by_source is the same concentration question
    asked of corpora — THIS is the relational original on a real
    money column). Exactness: per-customer revenue sums o_totalprice
    through decimal(28,4) (order-independent — the repo's double-sum
    discipline), the ranking tiebreaks on custkey, and the 80%
    threshold test cross-multiplies DECIMALS (cum*10 >= tot*8) so no
    FP boundary decides membership; only the two display ratios touch
    doubles. Plan: customer-grain partial aggregate (map-side), then
    every window is PARTITIONED by nation (25-way), the nation-name
    attach is a broadcast equi-join, and the per-nation argmin is one
    grouped min — no global sort, no scalar attach."""
    o = _tbl(spark, sf_dir, "orders")
    c = _tbl(spark, sf_dir, "customer")
    n = _tbl(spark, sf_dir, "nation")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_nationkey", "o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(28,4)")).alias("r")
        )
    )
    wo = Window.partitionBy("c_nationkey").orderBy(
        F.desc("r"), "o_custkey"
    )
    wall = Window.partitionBy("c_nationkey")
    ranked = rev.select(
        "c_nationkey",
        "r",
        F.row_number().over(wo).cast("bigint").alias("rk"),
        F.sum("r")
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum_r"),
        F.count("*").over(wall).cast("bigint").alias("n_cust"),
        F.sum("r").over(wall).alias("tot_r"),
    )
    hit = (
        ranked.filter(F.col("cum_r") * 10 >= F.col("tot_r") * 8)
        .groupBy("c_nationkey", "n_cust", "tot_r")
        .agg(F.min("rk").alias("top_n"))
    )
    return (
        hit.join(F.broadcast(n), hit["c_nationkey"] == n["n_nationkey"])
        .select(
            F.col("n_name").alias("nation"),
            F.col("n_cust").alias("n_customers"),
            "top_n",
            F.round(
                F.col("top_n").cast("double") / F.col("n_cust").cast("double"),
                6,
            ).alias("pareto_share"),
            F.round(F.col("tot_r").cast("double"), 2).alias("total_revenue"),
        )
        .orderBy("nation")
    )


@register(
    "geo_rollup_share",
    """
    with nat_rev as (
        select c.c_nationkey,
               sum(cast(o.o_totalprice as decimal(28,4))) as r
        from orders o join customer c on o.o_custkey = c.c_custkey
        group by c.c_nationkey
    ),
    named as (
        select rg.r_name as region, n.n_name as nation, nr.r
        from nat_rev nr
        join nation n on nr.c_nationkey = n.n_nationkey
        join region rg on n.n_regionkey = rg.r_regionkey
    ),
    tot as (select sum(r) as g from named)
    select region, nation,
           round(cast(r as double), 2) as revenue,
           round(cast(r as double)
                 / cast(sum(r) over (partition by region) as double), 6)
               as share_of_region,
           round(cast(r as double) / cast(t.g as double), 6)
               as share_of_global
    from named cross join tot t
    order by region, nation
    """,
)
def geo_rollup_share(spark, sf_dir):
    """GEOGRAPHY ROLLUP with PERCENT-OF-PARENT — revenue per nation
    with its share of the parent region AND of the global total (the
    two-level drill-down every BI hierarchy renders;
    time_hierarchy_rollup is the same idea on the calendar axis, and
    share_of_total_agg the single-level case — this adds the
    PARENT-relative share, which needs a second grouping grain in the
    same frame). Exactness: revenue sums o_totalprice through
    decimal(28,4) (order-independent), both shares divide decimal-
    exact numerators once into doubles, round 6/2 guard display.
    Plan: the orders-customer equi-join collapses to nation grain
    map-side (25 rows), the two dimension attaches are broadcast
    equi-joins, the region share is a window PARTITIONED by region
    over <= 25 rows, and the global denominator is the single
    whitelisted 1-row scalar attach."""
    o = _tbl(spark, sf_dir, "orders")
    c = _tbl(spark, sf_dir, "customer")
    n = _tbl(spark, sf_dir, "nation")
    rg = _tbl(spark, sf_dir, "region")
    nat_rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_nationkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(28,4)")).alias("r"))
    )
    named = (
        nat_rev.join(
            F.broadcast(n), nat_rev["c_nationkey"] == n["n_nationkey"]
        )
        .join(F.broadcast(rg), n["n_regionkey"] == rg["r_regionkey"])
        .select(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            "r",
        )
    )
    tot = named.agg(F.sum("r").alias("g"))
    wreg = Window.partitionBy("region")
    return (
        named.crossJoin(F.broadcast(tot))
        .select(
            "region",
            "nation",
            F.round(F.col("r").cast("double"), 2).alias("revenue"),
            F.round(
                F.col("r").cast("double")
                / F.sum("r").over(wreg).cast("double"),
                6,
            ).alias("share_of_region"),
            F.round(
                F.col("r").cast("double") / F.col("g").cast("double"), 6
            ).alias("share_of_global"),
        )
        .orderBy("region", "nation")
    )


@register(
    "cohort_revenue_ltv",
    """
    with first_m as (
        select o_custkey,
               min(date_trunc('month', o_orderdate)) as m0
        from orders group by o_custkey
    ),
    placed as (
        select f.m0 as cohort_month,
               (year(o.o_orderdate) - year(f.m0)) * 12
                 + (month(o.o_orderdate) - month(f.m0)) as offset_m,
               o.o_custkey,
               cast(o.o_totalprice as decimal(28,4)) as p
        from orders o join first_m f on o.o_custkey = f.o_custkey
    ),
    cell as (
        select cohort_month, cast(offset_m as int) as offset_m,
               cast(count(distinct o_custkey) as bigint) as n_active,
               sum(p) as rev
        from placed
        where offset_m <= 11
        group by cohort_month, offset_m
    )
    select cohort_month, offset_m, n_active,
           round(cast(rev as double), 2) as revenue,
           round(cast(sum(rev) over (
                     partition by cohort_month order by offset_m
                     rows between unbounded preceding and current row)
                 as double), 2) as cum_revenue
    from cell
    order by cohort_month, offset_m
    """,
)
def cohort_revenue_ltv(spark, sf_dir):
    """COHORT REVENUE / LTV matrix — customers grouped by FIRST-ORDER
    month, revenue tracked by months-since-acquisition (the
    lifetime-value curve finance builds retention economics on;
    cohort_retention counts ACTIVITY on the events table — this
    accumulates MONEY on orders, the other half of the cohort pair).
    Month offsets are exact integer calendar arithmetic
    ((y2-y1)*12 + (m2-m1) — no date subtraction FP), revenue sums
    through decimal(28,4), the 12-month horizon caps the matrix, and
    cumulative LTV is a window PARTITIONED by cohort over <= 12 rows.
    Plan: one customer-grain min-aggregate, one equi-join back to
    orders (broadcast-able: first_m is one row per customer — at
    100 TB it shuffles on custkey, the exchange the orders table
    already pays for Q13/Q18), then cells are cohorts x 12."""
    o = _tbl(spark, sf_dir, "orders")
    first_m = o.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", F.col("o_orderdate"))).alias("m0")
    )
    placed = o.join(first_m, "o_custkey").select(
        F.col("m0").alias("cohort_month"),
        (
            (F.year("o_orderdate") - F.year("m0")) * 12
            + (F.month("o_orderdate") - F.month("m0"))
        ).alias("offset_m"),
        "o_custkey",
        F.col("o_totalprice").cast("decimal(28,4)").alias("p"),
    )
    cell = (
        placed.filter(F.col("offset_m") <= 11)
        .groupBy("cohort_month", F.col("offset_m").cast("int").alias("offset_m"))
        .agg(
            F.countDistinct("o_custkey").cast("bigint").alias("n_active"),
            F.sum("p").alias("rev"),
        )
    )
    wc = (
        Window.partitionBy("cohort_month")
        .orderBy("offset_m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cell.select(
        "cohort_month",
        "offset_m",
        "n_active",
        F.round(F.col("rev").cast("double"), 2).alias("revenue"),
        F.round(F.sum("rev").over(wc).cast("double"), 2).alias(
            "cum_revenue"
        ),
    ).orderBy("cohort_month", "offset_m")


@register(
    "business_days_latency",
    """
    with j as (
        select o.o_orderpriority,
               date_diff('day', date '1970-01-05',
                         cast(l.l_shipdate as date)) as d2,
               date_diff('day', date '1970-01-05',
                         cast(o.o_orderdate as date)) as d1
        from lineitem l join orders o on l.l_orderkey = o.o_orderkey
    ),
    bd as (
        select o_orderpriority,
               (5 * (d2 // 7) + least(d2 % 7, 5))
               - (5 * (d1 // 7) + least(d1 % 7, 5)) as b
        from j
    )
    select o_orderpriority,
           cast(count(*) as bigint) as n_lines,
           round(cast(sum(b) as double) / count(*), 6) as avg_bdays,
           cast(max(b) as bigint) as max_bdays
    from bd group by o_orderpriority
    order by o_orderpriority
    """,
)
def business_days_latency(spark, sf_dir):
    """BUSINESS-DAY fulfillment latency per order priority — calendar
    arithmetic that SKIPS WEEKENDS, in closed form (no calendar table,
    no per-day loop): anchor every date to Monday 1970-01-05 and count
    B(d) = 5*(days div 7) + min(days mod 7, 5) accumulated business
    days; the latency is B(ship) - B(order), SIGNED — the synthetic
    fixture ships some lines before their order date, and a signed
    latency surfaces that inconsistency instead of clamping it (the
    data_quality_checks instinct). The formula is exact integer
    arithmetic validated against a day-walking brute force (tests),
    runs identically on both engines, and extends the calendar-day
    sibling order_to_ship_latency the way a real SLA is actually
    written ("5 business days"). Plan: one orderkey
    equi-join (the exchange every TPC-H lineitem-orders query pays),
    per-row integer math, one 5-group map-side-combinable rollup —
    the average divides exact int64 sums once."""
    l = _tbl(spark, sf_dir, "lineitem")
    o = _tbl(spark, sf_dir, "orders")
    anchor = F.lit("1970-01-05").cast("date")
    d2 = F.datediff(F.col("l_shipdate").cast("date"), anchor)
    d1 = F.datediff(F.col("o_orderdate").cast("date"), anchor)
    bfun = lambda d: F.lit(5) * F.expr(f"({d}) div 7") + F.least(
        F.expr(f"({d}) % 7"), F.lit(5)
    )
    j = l.join(o, l["l_orderkey"] == o["o_orderkey"]).select(
        "o_orderpriority",
        d2.alias("d2"),
        d1.alias("d1"),
    )
    b = (
        F.lit(5) * F.expr("d2 div 7")
        + F.least(F.expr("d2 % 7"), F.lit(5))
        - (F.lit(5) * F.expr("d1 div 7") + F.least(F.expr("d1 % 7"), F.lit(5)))
    )
    return (
        j.select("o_orderpriority", b.alias("b"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.round(F.sum("b").cast("double") / F.count("*"), 6).alias(
                "avg_bdays"
            ),
            F.max("b").cast("bigint").alias("max_bdays"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "column_masking_view",
    """
    select c_custkey,
           'cust_' || substr(md5(c_name), 1, 8) as name_masked,
           case when c_acctbal < 0 then 'negative'
                when c_acctbal < 1000 then 'low'
                when c_acctbal < 5000 then 'mid'
                else 'high' end as acctbal_band,
           c_mktsegment,
           c_nationkey
    from customer
    order by c_custkey
    """,
)
def column_masking_view(spark, sf_dir):
    """DETERMINISTIC COLUMN MASKING — the governance projection that
    ships a customer table to an analytics tier: direct identifiers
    pseudonymize via keyed-hash tokens ('cust_' + md5 prefix — stable
    across runs and engines, so joins on the token still work
    downstream), the quasi-identifying balance GENERALIZES to coarse
    bands (the k-anonymity lever k_anonymity_audit measures — these
    two entries are the apply/measure pair of the same control), and
    everything else passes through. Band edges are exact double
    compares identical on both engines (fixture balances are 2-dp
    values away from the thresholds; a production deployment bands on
    integer cents, the benford/checksum discipline). Plan: pure
    per-row projection — no shuffle, no UDF, full codegen; masking
    100 TB costs exactly one scan."""
    c = _tbl(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat(
            F.lit("cust_"), F.substring(F.md5(F.col("c_name")), 1, 8)
        ).alias("name_masked"),
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 1000, "low")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("acctbal_band"),
        "c_mktsegment",
        "c_nationkey",
    ).orderBy("c_custkey")


@register(
    "order_dispersion_index",
    """
    with per_order as (
        select o.o_orderpriority, o.o_orderkey,
               cast(count(l.l_orderkey) as bigint) as k
        from orders o
        left join lineitem l on l.l_orderkey = o.o_orderkey
        group by o.o_orderpriority, o.o_orderkey
    ),
    m as (
        select o_orderpriority,
               cast(count(*) as bigint) as n,
               cast(sum(k) as bigint) as s,
               cast(sum(k * k) as bigint) as sq
        from per_order group by o_orderpriority
    )
    select o_orderpriority, n as n_orders,
           round(cast(s as double) / cast(n as double), 6) as mean_lines,
           round(cast(n * sq - s * s as double)
                 / (cast(n as double) * cast(s as double)), 6)
               as dispersion_index,
           (n * sq - s * s > n * s) as overdispersed
    from m
    order by o_orderpriority
    """,
)
def order_dispersion_index(spark, sf_dir):
    """INDEX OF DISPERSION (variance-to-mean ratio) of lines-per-order,
    per priority — the Poissonness check for count data (D = 1: orders
    accumulate lines like independent arrivals; D > 1: bursty/clumped
    — a few megabaskets carry the volume, which changes how you
    partition the fulfillment workload; D < 1: regularized, e.g. a
    cap is binding). The basket-size COUNTS come from one orderkey
    equi-join (LEFT join so zero-line orders count as k=0 — dropping
    them biases D upward), the per-priority moments are exact int64
    (n*sq - s^2 <= n * max_k^2 * n — safe past 1e8 orders per group),
    the verdict bit cross-multiplies exact integers (n*sq - s^2 >
    n*s <=> D > 1, no FP boundary), and only the two display ratios
    divide into doubles. Plan: the lineitem-orders exchange every
    TPC-H query pays, then two map-side-combinable aggregates."""
    o = _tbl(spark, sf_dir, "orders")
    l = _tbl(spark, sf_dir, "lineitem")
    per_order = (
        o.join(l, l["l_orderkey"] == o["o_orderkey"], "left")
        .groupBy("o_orderpriority", "o_orderkey")
        .agg(F.count("l_orderkey").cast("bigint").alias("k"))
    )
    m = per_order.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("k").cast("bigint").alias("s"),
        F.sum(F.col("k") * F.col("k")).cast("bigint").alias("sq"),
    )
    n, s2, sq = F.col("n"), F.col("s"), F.col("sq")
    return m.select(
        "o_orderpriority",
        n.alias("n_orders"),
        F.round(s2.cast("double") / n.cast("double"), 6).alias("mean_lines"),
        # try_divide = DuckDB's /: NULL (not a crash) when every order
        # in a priority has zero lines (s = 0; degenerate audit r15) —
        # dispersion of an all-empty group is undefined
        F.round(
            F.try_divide(
                (n * sq - s2 * s2).cast("double"),
                n.cast("double") * s2.cast("double"),
            ),
            6,
        ).alias("dispersion_index"),
        (n * sq - s2 * s2 > n * s2).alias("overdispersed"),
    ).orderBy("o_orderpriority")


@register(
    "new_vs_repeat_revenue",
    """
    with first_m as (
        select o_custkey,
               min(date_trunc('month', o_orderdate)) as m0
        from orders group by o_custkey
    ),
    tagged as (
        select date_trunc('month', o.o_orderdate) as month,
               case when date_trunc('month', o.o_orderdate) = f.m0
                    then 1 else 0 end as is_new,
               cast(o.o_totalprice as decimal(28,4)) as p
        from orders o join first_m f on o.o_custkey = f.o_custkey
    )
    select month,
           cast(count(*) as bigint) as n_orders,
           cast(sum(is_new) as bigint) as n_new_orders,
           round(cast(sum(case when is_new = 1 then p end) as double), 2)
               as revenue_new,
           round(cast(sum(case when is_new = 0 then p end) as double), 2)
               as revenue_repeat,
           round(cast(sum(case when is_new = 1 then p else 0 end)
                      as double)
                 / cast(sum(p) as double), 6) as new_share
    from tagged
    group by month
    order by month
    """,
)
def new_vs_repeat_revenue(spark, sf_dir):
    """NEW-vs-REPEAT revenue decomposition per calendar month — every
    growth chart's first split: is this month's revenue acquisition
    (customers in their FIRST month) or retention (returning
    customers)? A rising total with a falling repeat share is churn
    wearing a growth costume — the single most common misread this
    query exists to prevent. cohort_revenue_ltv tracks each cohort
    FORWARD through its own offsets; this is the calendar-month
    TRANSPOSE management actually reviews. Exactness: the first-month
    tag is an exact timestamp equality on month-truncated dates,
    revenue sums through decimal(28,4); an all-new or all-repeat
    month leaves the other lane NULL (sum over an empty CASE branch —
    identical on both engines, and honest: zero repeat revenue and no
    repeat orders are different facts); new_share divides
    decimal-exact sums once. Plan: one customer-grain min-aggregate,
    one custkey equi-join back to orders (the cohort_revenue_ltv
    exchange), one month-grain rollup."""
    o = _tbl(spark, sf_dir, "orders")
    first_m = o.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", F.col("o_orderdate"))).alias("m0")
    )
    tagged = o.join(first_m, "o_custkey").select(
        F.date_trunc("month", F.col("o_orderdate")).alias("month"),
        F.when(
            F.date_trunc("month", F.col("o_orderdate")) == F.col("m0"), 1
        )
        .otherwise(0)
        .alias("is_new"),
        F.col("o_totalprice").cast("decimal(28,4)").alias("p"),
    )
    return (
        tagged.groupBy("month")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum("is_new").cast("bigint").alias("n_new_orders"),
            F.round(
                F.sum(F.when(F.col("is_new") == 1, F.col("p"))).cast(
                    "double"
                ),
                2,
            ).alias("revenue_new"),
            F.round(
                F.sum(F.when(F.col("is_new") == 0, F.col("p"))).cast(
                    "double"
                ),
                2,
            ).alias("revenue_repeat"),
            F.round(
                F.sum(
                    F.when(F.col("is_new") == 1, F.col("p")).otherwise(
                        F.lit(0).cast("decimal(28,4)")
                    )
                ).cast("double")
                / F.sum("p").cast("double"),
                6,
            ).alias("new_share"),
        )
        .orderBy("month")
    )
