"""Training-export sharding and the round-13 surface (bitmap distinct, interval coalesce, corpus evals, SQL clauses).

Split out of the flat registry.py in round 14; entry bodies are
unchanged — see registry/__init__.py for the aggregation contract.
"""
from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import Window

from database_extractor_spark.operators import dedup as D
from database_extractor_spark.operators import similarity as S
from database_extractor_spark.operators import text as T

from database_extractor_spark.registry._base import (
    ORACLE,
    register,
    _tbl,
)
from database_extractor_spark.registry.llm_ops import (
    _cached_minhash_sigs,
    _cached_shingle3,
    _cached_simhash_table,
    _jaccard_truth_ctes,
    _minhash_dup_ctes,
    _simhash_oracle,
    _stream_tmpdir,
)
from database_extractor_spark.registry.pipeline_ops import (
    _pack_sequences_frame,
)
from database_extractor_spark.registry.relational_ops import (
    _dedup_clusters_frame,
)
from database_extractor_spark.registry.streaming_bpe_ops import (
    _GOPHER_ORACLE,
    _bpe_encode_frame,
    _bpe_encode_oracle,
    _gopher_gate_frame,
)

# Training-export sharding (round 13)
# ==========================================================================
# The last mile of a corpus pipeline: after dedup/curation, the surviving
# documents are exported as N balanced shards in a DETERMINISTIC
# pseudo-random order a dataloader can stream. A naive global
# ORDER BY rand() is both non-reproducible and a full global sort; the
# standard engine move is hash-sharding (shard = md5(doc_id) % N — the
# split_train_val_test discipline, so a document never changes shard as
# the corpus grows) plus a WITHIN-shard sort on an independent slice of
# the same digest. No global ordering structure exists anywhere in the
# plan: each shard sorts independently, which is exactly what a
# 1000-executor export wants (shard count scales with corpus bytes, e.g.
# ceil(bytes / 1 GiB); 16 is the oracle-pinned fixture config).

_N_EXPORT_SHARDS = 16


def _round6(x: float) -> float:
    """The driver-side twin of DuckDB ``round(x, 6)`` on a double.

    DuckDB computes ``std::round(x * 10^6) / 10^6`` — half-away-from-
    zero on the FP PRODUCT — verified empirically (ADVICE r14 follow-up):
    stored 0.0001244999... has product 124.49999999999999 -> 124, while
    stored 0.1234564999... has product exactly 123456.5 -> 123457. So
    neither Decimal(repr(x)) (quantizes the shortest round-trip STRING;
    the original ADVICE bug: repr '0.0001245' -> 0.000125) nor
    Decimal(x) (quantizes the exact binary expansion; misses the
    product-tie at 0.1234565 -> 0.123456) reproduces it. Emulate the
    product rounding exactly: Decimal of the FP product (exact by
    construction), quantized HALF_UP (= half away from zero), divided
    back in FP. Python's built-in round is banker's — also wrong."""
    from decimal import ROUND_HALF_UP, Decimal

    return (
        float(
            Decimal(x * 1e6).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
        )
        / 1e6
    )

_SHARD_SQL = (
    "('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::bigint"
    f" % {_N_EXPORT_SHARDS}"
)


def _shard_col() -> F.Column:
    return (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % _N_EXPORT_SHARDS
    ).alias("shard_id")


@register(
    "corpus_shard_manifest",
    f"""
    with s as (
        select doc_id, n_chars, {_SHARD_SQL} as shard_id
        from documents
    )
    select shard_id,
           cast(count(*) as bigint) as n_docs,
           cast(sum(n_chars) as bigint) as n_chars_total,
           min(doc_id) as min_doc_id,
           max(doc_id) as max_doc_id
    from s group by shard_id order by shard_id
    """,
)
def corpus_shard_manifest(spark, sf_dir):
    """Shard MANIFEST for a training-data export: per shard, document
    count, total characters, and the doc-id range — the sidecar file a
    dataloader reads to plan an epoch (and the balance check that md5
    hash-sharding actually yields ~uniform shards, no skewed shard to
    straggle the export). One hash aggregate on a key that is uniform by
    construction; N_shards rows out regardless of corpus size."""
    docs = _tbl(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", "n_chars", _shard_col())
        .groupBy("shard_id")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars_total"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("shard_id")
    )


@register(
    "corpus_export_order",
    f"""
    with s as (
        select doc_id,
               {_SHARD_SQL} as shard_id,
               substr(md5(cast(doc_id as varchar)), 9, 16) as ord_key
        from documents
    )
    select doc_id, shard_id,
           cast(row_number() over (
               partition by shard_id order by ord_key, doc_id
           ) as bigint) as pos_in_shard
    from s order by shard_id, pos_in_shard
    """,
)
def corpus_export_order(spark, sf_dir):
    """Deterministic pseudo-random EPOCH ORDER: each document gets
    (shard_id, pos_in_shard), where the position orders by an
    independent slice of the md5 digest (hex chars 9-24 — disjoint from
    the 1-8 slice that picked the shard, so shard and order are
    independent fingerprint bits). Reading shards in id order and each
    shard in pos order replays the identical global permutation on every
    engine and every run — reproducible training, no rand().

    Spark-first: the ONLY ordering structure is a window PARTITIONED BY
    shard_id — there is no global sort or single-task window anywhere;
    at 100 TB each shard ranks independently on its own executor set and
    the per-shard sort is the per-file sort the export writer needs
    anyway."""
    docs = _tbl(spark, sf_dir, "documents")
    s = docs.select(
        "doc_id",
        _shard_col(),
        F.substring(F.md5(F.col("doc_id").cast("string")), 9, 16).alias("ord_key"),
    )
    w = Window.partitionBy("shard_id").orderBy("ord_key", "doc_id")
    return (
        s.select(
            "doc_id",
            "shard_id",
            F.row_number().over(w).cast("bigint").alias("pos_in_shard"),
        )
        .orderBy("shard_id", "pos_in_shard")
    )


@register(
    "length_outlier_filter",
    """
    with q as (
        select quantile_cont(n_chars, 0.02) as lo,
               quantile_cont(n_chars, 0.98) as hi
        from documents
    )
    select d.doc_id, d.n_chars,
           (d.n_chars < q.lo or d.n_chars > q.hi) as is_outlier
    from documents d cross join q
    order by d.doc_id
    """,
)
def length_outlier_filter(spark, sf_dir):
    """Percentile-band length trim (the curation step that drops
    truncated fragments and concatenation blobs before tokenization):
    flag documents whose n_chars falls outside the corpus [P2, P98]
    band. The band thresholds are EXACT percentiles — Spark
    `percentile` and DuckDB quantile_cont share the index = p*(n-1)
    linear-interpolation convention and parse the same p literal to the
    same double, so both engines run the identical IEEE sequence and
    every band comparison lands bit-identically (probed on all three
    fixtures before this entry landed). The textbook Tukey-fence
    variant (Q3 + 1.5*IQR) was probed first and is PROVABLY vacuous on
    any bounded near-uniform length distribution (max < 1.5*range), so
    the tail-trim form is the one that does real work.

    Spark-first: the thresholds ride ONE 1-row global aggregate
    attached in-plan via crossJoin(broadcast(...)) — the whitelisted
    scalar attach, no driver collect. Exact percentile aggregates
    buffer per-distinct-value counts, which is safe here because the
    key domain (document length) is bounded — for an unbounded-domain
    column at 100 TB the approx_percentile sketch is the swap-in."""
    docs = _tbl(spark, sf_dir, "documents")
    q = docs.agg(
        F.expr("percentile(n_chars, 0.02)").alias("lo"),
        F.expr("percentile(n_chars, 0.98)").alias("hi"),
    )
    return (
        docs.crossJoin(F.broadcast(q))
        .select(
            "doc_id",
            "n_chars",
            (
                (F.col("n_chars") < F.col("lo"))
                | (F.col("n_chars") > F.col("hi"))
            ).alias("is_outlier"),
        )
        .orderBy("doc_id")
    )


# ==========================================================================
# Round 13 (cont.): bitmap exact-distinct, interval coalescing, corpus
# collocation/diversity/fertility analytics
# ==========================================================================


@register(
    "bitmap_exact_distinct",
    """
    select event_type, cast(ts as date) as day,
           cast(count(distinct user_id) as bigint) as n_users
    from events
    group by event_type, cast(ts as date)
    order by event_type, day
    """,
)
def bitmap_exact_distinct(spark, sf_dir):
    """EXACT distinct users per (event_type, day) via bitmap aggregates
    (bitmap_bucket_number / bitmap_bit_position / bitmap_construct_agg /
    bitmap_count) — the scale-native exact-distinct lane between the two
    existing ones: COUNT(DISTINCT) (exact, but Aggregate-Expand doubles
    the shuffled rows and keeps every distinct id in the hash map) and
    the HLL sketch (hll_sketch_union_distinct — mergeable but approximate).
    Bitmaps give BOTH: ids fold into fixed 4 KB bitmaps (32768 id bits
    per bucket) during the MAP-SIDE partial aggregate, so the exchange
    carries at most one bitmap per (group, bucket) per mapper instead of
    the raw id stream, merges are bitwise-OR (associative — AQE can
    two-stage it freely), and popcount-sum at the end is exact. At 100 TB
    this is the exact-DAU plan: shuffle bytes scale with id-space/32768
    per group, not with event rows. Dense bounded ids (user_id here) are
    the sweet spot; a sparse 64-bit id domain pays one bucket per 32768-id
    SPAN and would first dictionary-encode ids (a dim join) or fall back
    to the HLL lane."""
    ev = _tbl(spark, sf_dir, "events")
    per_bucket = (
        ev.select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.col("user_id"),
        )
        .groupBy(
            "event_type",
            "day",
            F.expr("bitmap_bucket_number(user_id)").alias("__bucket"),
        )
        .agg(
            F.expr(
                "bitmap_construct_agg(bitmap_bit_position(user_id))"
            ).alias("__bm")
        )
    )
    return (
        per_bucket.groupBy("event_type", "day")
        .agg(
            F.sum(F.expr("bitmap_count(__bm)"))
            .cast("bigint")
            .alias("n_users")
        )
        .orderBy("event_type", "day")
    )


@register(
    "bitmap_distinct_dictionary",
    """
    select event_type, cast(ts as date) as day,
           cast(count(distinct user_id) as bigint) as n_users
    from events
    group by event_type, cast(ts as date)
    order by event_type, day
    """,
)
def bitmap_distinct_dictionary(spark, sf_dir):
    """The SPARSE-id composition bitmap_exact_distinct documents but
    defers: a 64-bit snowflake-style id domain would pay one 4 KB bitmap
    bucket per 32768-id SPAN, so sparse ids must first dictionary-encode
    to a dense 0..n-1 domain. This entry proves the full compose on a
    deliberately sparsified id (user_id * 2654435761 mod 2^40 — an odd
    multiplier is a bijection mod 2^40, so distinct users stay distinct
    while ids scatter across the 40-bit space):

      1. distinct sparse ids -> DISTRIBUTED dense rank WITHOUT a global
         window (the lint-barred shape): pmod-bucket the ids, row_number
         inside each bucket (partitioned window), then add per-bucket
         base offsets. The offsets come from a bounded model-state
         collect — exactly NB=64 count rows, fixed by construction, the
         Lloyd-centroid discipline — folded into a literal map lookup.
      2. fact join dim on sparse_id: a plain shuffle hash equi-join,
         both sides co-partitioned by the key (NOT broadcast — the
         dictionary is |users|-sized and grows with the corpus).
      3. bitmap fold on the dense id, identical to bitmap_exact_distinct
         (map-side partial bitmaps, bitwise-OR merge, popcount-sum).

    At 100 TB the dictionary build is one distinct + one partitioned
    window over |users| rows and the encode is one key-partitioned join;
    shuffle bytes after that scale with n_users/32768 per group, not
    with event rows. Output is invariant to the encoding (any bijection
    gives the same distinct counts), so the oracle is the plain
    COUNT(DISTINCT) truth. Plan is Expand-free (no count-distinct
    rewrite) and global-window-free — pinned by
    tests/test_round14_ops.py."""
    n_buckets = 64
    ev = _tbl(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.pmod(F.col("user_id").cast("bigint") * F.lit(2654435761),
               F.lit(1 << 40)).alias("sparse_id"),
    )
    ids = ev.select("sparse_id").distinct().withColumn(
        "bkt", F.pmod("sparse_id", F.lit(n_buckets))
    )
    rk_w = Window.partitionBy("bkt").orderBy("sparse_id")
    ranked = ids.withColumn("rk", F.row_number().over(rk_w))
    # bounded model-state collect: exactly n_buckets count rows (64 by
    # construction, never data-sized) -> cumulative base offsets as a
    # literal map, the same bounded-collect pattern as Lloyd centroids.
    counts = {
        r["bkt"]: r["n"]
        for r in ranked.groupBy("bkt")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    offsets, acc = {}, 0
    for b in range(n_buckets):
        offsets[b] = acc
        acc += counts.get(b, 0)
    off_map = F.create_map(
        *[F.lit(x) for b in range(n_buckets) for x in (b, offsets[b])]
    )
    dim = ranked.select(
        "sparse_id",
        (off_map[F.col("bkt")] + F.col("rk") - F.lit(1)).alias("dense_id"),
    )
    enc = ev.join(dim, "sparse_id")
    per_bucket = enc.groupBy(
        "event_type",
        "day",
        F.expr("bitmap_bucket_number(dense_id)").alias("__bucket"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(dense_id))").alias(
            "__bm"
        )
    )
    return (
        per_bucket.groupBy("event_type", "day")
        .agg(
            F.sum(F.expr("bitmap_count(__bm)"))
            .cast("bigint")
            .alias("n_users")
        )
        .orderBy("event_type", "day")
    )


@register(
    "interval_coalesce",
    """
    with iv as (
        select user_id, epoch_us(ts) as st, epoch_us(ts) + 300000000 as en
        from events
    ),
    m as (
        select user_id, st, en,
               max(en) over (partition by user_id order by st, en
                             rows between unbounded preceding
                             and 1 preceding) as pm
        from iv
    ),
    isl as (
        select user_id, st, en,
               sum(case when pm is null or st > pm then 1 else 0 end)
                   over (partition by user_id order by st, en
                         rows between unbounded preceding
                         and current row) as g
        from m
    ),
    per as (
        select user_id, g, min(st) as s, max(en) as e
        from isl group by user_id, g
    )
    select user_id,
           cast(count(*) as bigint) as n_intervals,
           cast(sum(e - s) as bigint) as covered_micros
    from per group by user_id order by user_id
    """,
)
def interval_coalesce(spark, sf_dir):
    """Interval-union coverage per user — expand each event to a 5-minute
    activity interval ``[ts, ts+300s)`` in integer microseconds, merge
    overlapping-or-touching intervals per user (gaps-and-islands, the
    first-class :func:`operators.timeseries.coalesce_intervals`), and
    report merged-interval count + total covered time. The relational op
    behind availability/SLA coverage, ad-break stitching, and
    active-time billing; session_windows answers "how many sessions",
    this answers "how much WALL TIME was covered" with exact integer
    arithmetic.

    Scale: one hash exchange on user_id; both window passes and the
    island groupBy reuse that partitioning (no self-join — the naive
    overlap self-join is quadratic per key). The final per-user rollup
    is a second tiny aggregate on the same key."""
    from database_extractor_spark.operators.timeseries import (
        _epoch_us,
        coalesce_intervals,
    )

    iv = (
        _tbl(spark, sf_dir, "events")
        .select("user_id", _epoch_us("ts").alias("st"))
        .withColumn("en", F.col("st") + F.lit(300_000_000))
    )
    merged = coalesce_intervals(iv, ["user_id"], "st", "en")
    return (
        merged.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_intervals"),
            F.sum(F.col("en") - F.col("st"))
            .cast("bigint")
            .alias("covered_micros"),
        )
        .orderBy("user_id")
    )


@register(
    "ngram_pmi_collocations",
    r"""
    with toks as (
        select string_split_regex(lower(trim(text)), '\s+') as ws
        from documents
    ),
    bg as (
        select u.w1 as w1, u.w2 as w2
        from (
            select unnest([{'w1': ws[i], 'w2': ws[i+1]}
                           for i in range(1, len(ws))]) as u
            from toks where len(ws) >= 2
        )
    ),
    bc as (select w1, w2, cast(count(*) as bigint) as c_xy
           from bg group by w1, w2),
    uc as (select w, cast(count(*) as bigint) as c
           from (select unnest(ws) as w from toks) group by w)
    select b.w1, b.w2, b.c_xy, ux.c as c_x, uy.c as c_y,
           cast(b.c_xy * 1000000000 // (ux.c * uy.c) as bigint) as score_q
    from bc b
    join uc ux on b.w1 = ux.w
    join uc uy on b.w2 = uy.w
    where b.c_xy >= 5
    order by score_q desc, b.w1, b.w2
    limit 20
    """,
)
def ngram_pmi_collocations(spark, sf_dir):
    """Top-20 bigram collocations by pointwise mutual information — the
    corpus-analytics pass that surfaces multi-word units ("new york",
    "machine learning") worth atomizing before tokenizer training.
    Ranking is EXACT: PMI = ln(c_xy * N_uni^2 / (N_bg * c_x * c_y)) is
    monotone in the rational c_xy/(c_x*c_y) (corpus totals are
    rank-constant), so the score is the scaled integer quotient
    ``c_xy * 1e9 div (c_x * c_y)`` — bigint division truncates toward
    zero identically in Spark (`div`) and DuckDB (`//`) on positive
    operands, no libm in the ordering. (Headroom: c_xy * 1e9 needs
    c_xy < 9.2e9 before bigint overflow — fine until ~10^10 occurrences
    of one bigram; past that, swap the scale constant down or the score
    to DECIMAL(38,0).)

    Scale: bigram/unigram counts are map-side-combined groupBys over one
    tokenize pass; the score join hits the BIGRAM table (bounded by
    vocab^2, zipf-small in practice) with two broadcast-able unigram
    lookups (bounded by vocab), and min-support c_xy >= 5 prunes the
    long tail before the joins. TakeOrdered(20) — no global sort."""
    docs = _tbl(spark, sf_dir, "documents")
    toks = docs.select(
        T.tokens(F.lower(F.trim(F.col("text")))).alias("ws")
    )
    n = F.size("ws")
    bg = (
        toks.filter(n >= 2)
        .withColumn("w1s", F.slice("ws", 1, n - 1))
        .withColumn("w2s", F.slice("ws", 2, n - 1))
        .select(F.explode(F.arrays_zip("w1s", "w2s")).alias("p"))
        .select(F.col("p.w1s").alias("w1"), F.col("p.w2s").alias("w2"))
    )
    bc = bg.groupBy("w1", "w2").agg(F.count("*").cast("bigint").alias("c_xy"))
    uc = (
        toks.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    return (
        bc.filter(F.col("c_xy") >= 5)
        .join(F.broadcast(uc.withColumnRenamed("c", "c_x")), bc.w1 == uc.w)
        .drop("w")
        .join(
            F.broadcast(
                uc.withColumnRenamed("c", "c_y").withColumnRenamed(
                    "w", "w_"
                )
            ),
            F.col("w2") == F.col("w_"),
        )
        .drop("w_")
        .select(
            "w1",
            "w2",
            "c_xy",
            "c_x",
            "c_y",
            F.expr("c_xy * 1000000000L div (c_x * c_y)")
            .cast("bigint")
            .alias("score_q"),
        )
        .orderBy(F.desc("score_q"), "w1", "w2")
        .limit(20)
    )


@register(
    "ngram_diversity_profile",
    r"""
    with toks as (
        select lang, string_split_regex(lower(trim(text)), '\s+') as ws
        from documents
    ),
    tri as (
        select lang,
               unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                       for i in range(1, len(ws) - 1)]) as tg
        from toks where len(ws) >= 3
    )
    select lang,
           cast(count(*) as bigint) as n_trigrams,
           cast(count(distinct tg) as bigint) as n_distinct,
           cast(count(distinct tg) * 1000000 // count(*) as bigint)
               as diversity_q
    from tri group by lang order by lang
    """,
)
def ngram_diversity_profile(spark, sf_dir):
    """Distinct-n diversity per language slice — distinct trigrams over
    total trigrams (micro-scaled exact integer ratio), the standard
    repetitiveness/mode-collapse gauge for a corpus slice before it
    enters a training mix (low distinct-3 = boilerplate or synthetic
    loops; the text_repetition entries flag single DOCUMENTS, this
    profiles the SLICE). Trigrams come from one transform(sequence(...))
    over the token array — no self-join, no UDF; the per-lang
    count-distinct is one Expand aggregate whose key space is bounded by
    observed trigram diversity itself."""
    docs = _tbl(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", T.tokens(F.lower(F.trim(F.col("text")))).alias("ws")
    )
    tri = toks.filter(F.size("ws") >= 3).select(
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws) - 2), i -> "
                "concat(element_at(ws, i), ' ', element_at(ws, i + 1),"
                " ' ', element_at(ws, i + 2)))"
            )
        ).alias("tg"),
    )
    return (
        tri.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_trigrams"),
            F.countDistinct("tg").cast("bigint").alias("n_distinct"),
        )
        .select(
            "lang",
            "n_trigrams",
            "n_distinct",
            F.expr("n_distinct * 1000000L div n_trigrams")
            .cast("bigint")
            .alias("diversity_q"),
        )
        .orderBy("lang")
    )


def _fertility_oracle() -> str:
    """Per-lang rollup over the full train-then-encode replay — the BPE
    encode oracle (train CTEs + vocab encode + per-doc join) runs as a
    parenthesized subquery; DuckDB allows a WITH chain inside FROM (...)."""
    return f"""
    select d.lang,
           cast(sum(e.n_words) as bigint) as n_words,
           cast(sum(e.n_tokens) as bigint) as n_tokens,
           cast(sum(d.n_chars) as bigint) as n_chars,
           cast(cast(sum(e.n_tokens) as bigint) * 1000000
                // cast(sum(e.n_words) as bigint) as bigint) as fertility_q,
           cast(cast(sum(e.n_tokens) as bigint) * 1000000
                // cast(sum(d.n_chars) as bigint) as bigint) as density_q
    from ({_bpe_encode_oracle()}) e
    join documents d using (doc_id)
    group by d.lang order by d.lang
    """


@register("tokenizer_fertility_eval", _fertility_oracle())
def tokenizer_fertility_eval(spark, sf_dir):
    """Tokenizer FERTILITY per language — tokens-per-word and
    tokens-per-char (micro-scaled exact integer ratios) of the trained
    BPE tokenizer, per lang slice. The eval that catches a tokenizer
    starving a language (high fertility = more tokens per word = less
    effective context and higher training cost for that slice); run it
    before committing a vocab, re-run per corpus snapshot. Builds on
    bpe_encode_tokens' vocab-encode-then-join plan (merges from the
    per-content-fingerprint cache — no retraining) plus one broadcast-
    sized join to (doc_id, lang, n_chars) and a per-lang rollup; the
    oracle replays training AND encoding AND the rollup, so drift in any
    stage breaks the hash."""
    enc = _bpe_encode_frame(spark, sf_dir)
    docs = _tbl(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    return (
        enc.join(docs, "doc_id")
        .groupBy("lang")
        .agg(
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
        )
        .select(
            "lang",
            "n_words",
            "n_tokens",
            "n_chars",
            F.expr("n_tokens * 1000000L div n_words")
            .cast("bigint")
            .alias("fertility_q"),
            F.expr("n_tokens * 1000000L div n_chars")
            .cast("bigint")
            .alias("density_q"),
        )
        .orderBy("lang")
    )


_SIMHASH_QUALITY_ORACLE = _minhash_dup_ctes() + _jaccard_truth_ctes(0.7) + f""",
    pred as (select id_a, id_b from ({_simhash_oracle()})),
    m as (
        select cast((select count(*) from truth) as bigint) as n_true,
               cast((select count(*) from pred) as bigint) as n_pred,
               cast((select count(*) from truth t
                     join pred p on t.id_a = p.id_a and t.id_b = p.id_b)
                    as bigint) as n_hit
    )
    select n_true, n_pred, n_hit,
           round(n_hit / greatest(n_pred, 1), 6) as simhash_precision,
           round(n_hit / greatest(n_true, 1), 6) as simhash_recall
    from m
"""


@register("simhash_quality_eval", _SIMHASH_QUALITY_ORACLE)
def simhash_quality_eval(spark, sf_dir):
    """SimHash-index QUALITY EVAL — the SimHash sibling of
    dedup_lsh_quality_eval, against the SAME exact shingle-Jaccard >= 0.7
    ground truth, so the two cheap index families (banded MinHash vs
    hamming-banded SimHash) report comparable precision/recall and a
    deployment can pick per corpus. SimHash hashes unigram tokens into
    one 60-bit sketch (constant per-doc state vs MinHash's 64 lanes —
    8x smaller signature table), so its agreement notion differs from
    the shingle-set truth by construction; THIS entry is the measurement
    of that gap, not a bug workaround. Plan shape: both arms are
    inverted-index / band-bucket equi-joins (never cartesian), merged by
    ONE full-outer join aggregated to a single metrics row."""
    docs = _tbl(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    truth = D.ngram_jaccard_pairs(docs, threshold=0.7).select("id_a", "id_b")
    pred = D.simhash_near_pairs(
        docs, max_hamming=6, sig_df=_cached_simhash_table(spark, sf_dir)
    ).select("id_a", "id_b")
    j = truth.withColumn("t", F.lit(1)).join(
        pred.withColumn("p", F.lit(1)), ["id_a", "id_b"], "full"
    )
    agg = j.agg(
        F.coalesce(F.sum(F.coalesce("t", F.lit(0))), F.lit(0))
        .cast("bigint")
        .alias("n_true"),
        F.coalesce(F.sum(F.coalesce("p", F.lit(0))), F.lit(0))
        .cast("bigint")
        .alias("n_pred"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("t").isNotNull() & F.col("p").isNotNull(), 1
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_hit"),
    )
    return agg.select(
        "n_true",
        "n_pred",
        "n_hit",
        F.round(
            F.col("n_hit") / F.greatest(F.col("n_pred"), F.lit(1)), 6
        ).alias("simhash_precision"),
        F.round(
            F.col("n_hit") / F.greatest(F.col("n_true"), F.lit(1)), 6
        ).alias("simhash_recall"),
    )


@register(
    "corpus_slice_jsd",
    r"""
    with tok as (
        select source,
               unnest(string_split_regex(lower(trim(text)), '\s+')) as word
        from documents
    ),
    cnt as (select source, word, cast(count(*) as bigint) as n
            from tok group by 1, 2),
    tot as (select source, cast(sum(n) as bigint) as t
            from cnt group by 1),
    dist as (
        select c.source, word,
               cast(n as double) / cast(t as double) as p
        from cnt c join tot using (source)
    ),
    sh as (
        select a.source as s1, b.source as s2, a.p as pa, b.p as pb
        from dist a join dist b
          on a.word = b.word and a.source < b.source
    ),
    agg as (
        select s1, s2,
               cast(count(*) as bigint) as n_shared,
               cast(sum(cast(0.5 * (pa * ln((2.0 * pa) / (pa + pb))
                                    + pb * ln((2.0 * pb) / (pa + pb)))
                             as decimal(18,12))) as double) as tshared,
               cast(sum(cast(pa as decimal(18,12))) as double) as pm,
               cast(sum(cast(pb as decimal(18,12))) as double) as qm
        from sh group by s1, s2
    ),
    pairs as (
        select a.source as s1, b.source as s2
        from (select distinct source from documents where source is not null) a
        join (select distinct source from documents where source is not null) b
          on a.source < b.source
    )
    select p.s1, p.s2,
           coalesce(agg.n_shared, 0) as n_shared,
           round(coalesce(tshared, 0.0)
                 + 0.5 * ((1 - coalesce(pm, 0.0)) * ln(2.0)
                          + (1 - coalesce(qm, 0.0)) * ln(2.0)),
                 6) as jsd
    from pairs p left join agg on p.s1 = agg.s1 and p.s2 = agg.s2
    order by p.s1, p.s2
    """,
)
def corpus_slice_jsd(spark, sf_dir):
    """Pairwise Jensen-Shannon divergence between the unigram
    distributions of every pair of corpus SOURCES — the slice-similarity
    matrix behind training-mixture design (which domains are
    near-duplicates of each other distribution-wise, which add genuinely
    new text; the DoReMi/DSIR-adjacent statistic at slice granularity
    where dsir_importance_resample works per document). Split into
    shared-vocabulary terms (inner join on word) plus the one-sided
    closed form: a word present only in p has m = p/2, so its JSD
    contribution is exactly p*ln(2)/2 — one-sided mass = 1 - sum(shared
    p), no full-outer vocab join needed. Fully-disjoint pairs (no shared
    words — the MOST divergent, exactly the pairs the mixture designer
    must see) are restored by a left join from the complete pair
    universe, landing at exactly ln 2. Per-term doubles run the
    identical IEEE sequence on both engines (the entropy_profile
    discipline), term sums are decimal-exact, final round 6.

    Scale: two map-side-combinable aggregates over the corpus produce a
    |slices| x |vocab| distribution table; everything after is bounded
    by vocab x slices^2, never by corpus rows. The slice LIST (not the
    vocab) is collected to build the pair frame — a bounded model-state
    collect (slices are domains/languages, dozens not millions), the
    Lloyd-centroid discipline; an inequality self-join would be a
    lint-barred nested loop for the same rows."""
    docs = _tbl(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        F.explode(T.tokens(F.lower(F.trim(F.col("text"))))).alias("word"),
    )
    cnt = tok.groupBy("source", "word").agg(
        F.count("*").cast("bigint").alias("n")
    )
    tot = cnt.groupBy("source").agg(F.sum("n").cast("bigint").alias("t"))
    dist = cnt.join(F.broadcast(tot), "source").select(
        "source",
        "word",
        (F.col("n").cast("double") / F.col("t").cast("double")).alias("p"),
    )
    a = dist.select(
        F.col("source").alias("s1"),
        F.col("word").alias("w1"),
        F.col("p").alias("pa"),
    )
    b = dist.select(
        F.col("source").alias("s2"),
        F.col("word").alias("w2"),
        F.col("p").alias("pb"),
    )
    pa, pb = F.col("pa"), F.col("pb")
    term = (
        F.lit(0.5)
        * (
            pa * F.log((F.lit(2.0) * pa) / (pa + pb))
            + pb * F.log((F.lit(2.0) * pb) / (pa + pb))
        )
    ).cast("decimal(18,12)")
    sh = a.join(b, (F.col("w1") == F.col("w2")) & (F.col("s1") < F.col("s2")))
    agg = sh.groupBy("s1", "s2").agg(
        F.count("*").cast("bigint").alias("n_shared"),
        F.sum(term).cast("double").alias("tshared"),
        F.sum(pa.cast("decimal(18,12)")).cast("double").alias("pm"),
        F.sum(pb.cast("decimal(18,12)")).cast("double").alias("qm"),
    )
    # bounded model-state collect: the SLICE list (domains/languages —
    # dozens by construction), never the vocab; builds the complete pair
    # universe so fully-disjoint pairs surface at exactly ln 2 instead
    # of vanishing from the shared-word inner join. Enumerated from a
    # single-column distinct over the source parquet — NOT from `tot`,
    # whose lineage re-runs the corpus tokenize+count aggregate as a
    # second job (review r13). A NULL slice is excluded, matching the
    # oracle's `a.source < b.source` pair semantics (NULL compares
    # UNKNOWN in SQL and joins nothing). The oracle pair CTE enumerates
    # the SAME universe (distinct non-null documents.source, r13 ADVICE):
    # a slice whose documents are all NULL-text still pairs, landing at
    # the ln 2 disjoint-slice convention on both engines.
    srcs = sorted(
        r[0]
        for r in docs.select("source").distinct().collect()
        if r[0] is not None
    )
    pairs = spark.createDataFrame(
        [(x, y) for i, x in enumerate(srcs) for y in srcs[i + 1:]],
        "s1 string, s2 string",
    )
    ln2 = F.log(F.lit(2.0))
    return (
        pairs.join(F.broadcast(agg), ["s1", "s2"], "left")
        .select(
            "s1",
            "s2",
            F.coalesce("n_shared", F.lit(0)).cast("bigint").alias("n_shared"),
            F.round(
                F.coalesce("tshared", F.lit(0.0))
                + F.lit(0.5)
                * (
                    (F.lit(1.0) - F.coalesce("pm", F.lit(0.0))) * ln2
                    + (F.lit(1.0) - F.coalesce("qm", F.lit(0.0))) * ln2
                ),
                6,
            ).alias("jsd"),
        )
        .orderBy("s1", "s2")
    )


@register(
    "event_path_trigrams",
    """
    with p as (
        select user_id, event_type as e1,
               lead(event_type, 1) over w as e2,
               lead(event_type, 2) over w as e3
        from events
        window w as (partition by user_id order by ts, event_id)
    )
    select e1, e2, e3, cast(count(*) as bigint) as n_paths
    from p where e2 is not null and e3 is not null
    group by e1, e2, e3
    order by n_paths desc, e1, e2, e3
    limit 20
    """,
)
def event_path_trigrams(spark, sf_dir):
    """Free-path journey mining — the top-20 event-type TRIGRAMS across
    user journeys (funnel_conversion checks ONE fixed stage sequence;
    this surfaces which 3-step paths actually dominate, the exploration
    pass that tells you which funnels to define). One user-partitioned
    window pass (two leads share the frame sort), a map-side-combinable
    count over the at-most-|event_types|^3 path space, and
    TakeOrdered(20) — no global sort, no self-joins (the naive
    formulation is two self-joins on consecutive-rank conditions).
    Deterministic: (ts, event_id) totally orders each journey, count
    ties break lexicographically."""
    ev = _tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        p.filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count("*").cast("bigint").alias("n_paths"))
        .orderBy(F.desc("n_paths"), "e1", "e2", "e3")
        .limit(20)
    )


@register(
    "mixture_epoch_plan",
    """
    with c as (
        select lang,
               cast(sum(cast(len(string_split_regex(trim(text), '\\s+'))
                             as bigint)) as bigint) as n_tokens
        from documents group by lang
    ),
    s as (
        select lang, n_tokens,
               cast(floor(sqrt(cast(n_tokens as double)) * 1000000)
                    as bigint) as sq
        from c
    ),
    t as (select cast(sum(sq) as bigint) as tot_sq,
                 cast(sum(n_tokens) as bigint) as tot_tokens from s)
    select lang, n_tokens,
           sq * 1000000 // tot_sq as share_q,
           ((tot_tokens * (sq * 1000000 // tot_sq)) // 1000000)
               * 1000000 // n_tokens as epochs_q
    from s cross join t
    order by lang
    """,
)
def mixture_epoch_plan(spark, sf_dir):
    """Temperature-mixture PLANNER — the arithmetic a training run does
    before sampling: per-language token counts -> tau=2 temperature
    shares (share ∝ tokens^(1/2), the multilingual-rebalance exponent)
    -> micro-epochs per language to fill a budget of one corpus pass
    (epochs_q > 1e6 = that slice repeats / upsamples, < 1e6 =
    downsamples; mixture_weighted_sample then EXECUTES such a plan with
    md5 buckets). EXACT cross-engine: tokens^(1/2) is sqrt — a correctly
    rounded IEEE core op (no libm pow) — immediately floor-quantized to
    integer micros, so the share normalization and the epoch ratio are
    pure bigint division, identical truncation both engines.

    Scale: one map-side-combinable aggregate over the corpus, a 1-row
    global attach (the whitelisted broadcast scalar), and a
    |langs|-row projection. Headroom: sq holds sqrt(tokens)*1e6 —
    bigint-safe past 10^24 corpus tokens; sq*1e6 needs sum(sq) <
    9.2e12, i.e. ~8.5e13 corpus tokens per slice set, after which the
    scale constant drops a digit."""
    docs = _tbl(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(
        F.sum(F.size(T.tokens(F.trim(F.col("text")))).cast("bigint"))
        .cast("bigint")
        .alias("n_tokens")
    )
    s = c.withColumn(
        "sq",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * F.lit(1000000))
        .cast("bigint"),
    )
    t = s.agg(
        F.sum("sq").cast("bigint").alias("tot_sq"),
        F.sum("n_tokens").cast("bigint").alias("tot_tokens"),
    )
    j = s.crossJoin(F.broadcast(t))
    share_q = F.expr("sq * 1000000L div tot_sq")
    return (
        j.select(
            "lang",
            "n_tokens",
            share_q.alias("share_q"),
            F.expr(
                "((tot_tokens * (sq * 1000000L div tot_sq)) div 1000000L)"
                " * 1000000L div n_tokens"
            ).alias("epochs_q"),
        )
        .orderBy("lang")
    )


_SWEEP_ORACLE = _minhash_dup_ctes() + _jaccard_truth_ctes(0.5, with_value=True) + """,
    est as (
        select id_a, id_b,
               round(len([i for i in range(1, 65)
                          if sa.sig[i] = sb.sig[i]]) / 64.0, 4) as est_jaccard
        from pairs
          join sig sa on id_a = sa.doc_id
          join sig sb on id_b = sb.doc_id
    ),
    estk as (select * from est where est_jaccard >= 0.5),
    fo as (
        select t.jaccard, e.est_jaccard
        from truth t full outer join estk e
          on t.id_a = e.id_a and t.id_b = e.id_b
    ),
    thr as (select unnest([0.5, 0.6, 0.7, 0.8, 0.9]) as threshold),
    m as (
        select threshold,
               cast(sum(case when jaccard >= threshold
                             then 1 else 0 end) as bigint) as n_true,
               cast(sum(case when est_jaccard >= threshold
                             then 1 else 0 end) as bigint) as n_pred,
               cast(sum(case when jaccard >= threshold
                              and est_jaccard >= threshold
                             then 1 else 0 end) as bigint) as n_hit
        from fo cross join thr group by threshold
    )
    select threshold, n_true, n_pred, n_hit,
           round(n_hit / greatest(n_pred, 1), 6) as sweep_precision,
           round(n_hit / greatest(n_true, 1), 6) as sweep_recall
    from m order by threshold
"""


@register("dedup_threshold_sweep", _SWEEP_ORACLE)
def dedup_threshold_sweep(spark, sf_dir):
    """Banding calibration CURVE — dedup_lsh_quality_eval generalized
    from one operating point to the precision/recall sweep over
    thresholds 0.5..0.9, in ONE pass: both pair sets are built once
    (exact-Jaccard truth >= 0.5, banded-candidate estimate >= 0.5),
    full-outer-joined once, and the five thresholds ride an
    explode(array(...)) generator over that joined set — five metric
    rows for the cost of one eval. This is the plot a deployment reads
    to pick its threshold: recall collapses below the S-curve knee the
    16-band/4-row banding is tuned for, precision climbs above it —
    re-running the whole eval per candidate threshold (the naive loop)
    re-pays the dominant exact-truth arm each time.

    Scale: identical join shapes to dedup_lsh_quality_eval (inverted
    index + band buckets, never cartesian); the threshold explode
    multiplies only the joined PAIR set (x5), not the corpus. r17
    census fix: the truth arm now hands the PERSISTED shingle artifact
    (_cached_shingle3 — (doc_id, s) xxhash64 3-grams, byte-identical
    to the inline derivation incl. the NULL->''-shingle rule) to
    ngram_jaccard_pairs via its ``sh`` parameter — the artifact lane
    that parameter was built for (ADVICE r16 flagged it caller-less):
    the tokenize+explode stage drops out and BOTH sides of the
    inverted-index self-join read the one cached frame. Measured
    min-of-2 at sf1: 128.0 -> 32.7 s."""
    docs = _tbl(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    truth = D.ngram_jaccard_pairs(
        docs, threshold=0.5, sh=_cached_shingle3(spark, sf_dir)
    )
    sigs = _cached_minhash_sigs(spark, sf_dir)
    pred = (
        D.estimate_jaccard(D.lsh_candidate_pairs(sigs), sigs)
        .filter(F.col("est_jaccard") >= 0.5)
        .select("id_a", "id_b", "est_jaccard")
    )
    fo = truth.join(pred, ["id_a", "id_b"], "full").select(
        "jaccard", "est_jaccard"
    )
    sw = fo.select(
        F.explode(
            F.array(*[F.lit(t) for t in (0.5, 0.6, 0.7, 0.8, 0.9)])
        ).alias("threshold"),
        "jaccard",
        "est_jaccard",
    )
    hit_true = F.when(F.col("jaccard") >= F.col("threshold"), 1).otherwise(0)
    hit_pred = F.when(
        F.col("est_jaccard") >= F.col("threshold"), 1
    ).otherwise(0)
    m = sw.groupBy("threshold").agg(
        F.sum(hit_true).cast("bigint").alias("n_true"),
        F.sum(hit_pred).cast("bigint").alias("n_pred"),
        F.sum(
            F.when(
                (F.col("jaccard") >= F.col("threshold"))
                & (F.col("est_jaccard") >= F.col("threshold")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_hit"),
    )
    return m.select(
        "threshold",
        "n_true",
        "n_pred",
        "n_hit",
        F.round(
            F.col("n_hit") / F.greatest(F.col("n_pred"), F.lit(1)), 6
        ).alias("sweep_precision"),
        F.round(
            F.col("n_hit") / F.greatest(F.col("n_true"), F.lit(1)), 6
        ).alias("sweep_recall"),
    ).orderBy("threshold")


@register(
    "user_rfm_segments",
    """
    with base as (
        select user_id,
               max(epoch_us(ts)) as last_seen_us,
               cast(count(*) as bigint) as n_events,
               cast(sum(cast(case when event_type = 'purchase'
                                  then value else 0.0 end
                             as decimal(18,4))) as double) as monetary
        from events group by user_id
    ),
    q as (
        select quantile_cont(last_seen_us, 0.25) as r1,
               quantile_cont(last_seen_us, 0.50) as r2,
               quantile_cont(last_seen_us, 0.75) as r3,
               quantile_cont(cast(n_events as double), 0.25) as f1,
               quantile_cont(cast(n_events as double), 0.50) as f2,
               quantile_cont(cast(n_events as double), 0.75) as f3,
               quantile_cont(monetary, 0.25) as m1,
               quantile_cont(monetary, 0.50) as m2,
               quantile_cont(monetary, 0.75) as m3
        from base
    )
    select user_id, last_seen_us, n_events, monetary,
           cast(1 + (case when last_seen_us > r1 then 1 else 0 end)
                  + (case when last_seen_us > r2 then 1 else 0 end)
                  + (case when last_seen_us > r3 then 1 else 0 end)
                as integer) as r_score,
           cast(1 + (case when cast(n_events as double) > f1 then 1 else 0 end)
                  + (case when cast(n_events as double) > f2 then 1 else 0 end)
                  + (case when cast(n_events as double) > f3 then 1 else 0 end)
                as integer) as f_score,
           cast(1 + (case when monetary > m1 then 1 else 0 end)
                  + (case when monetary > m2 then 1 else 0 end)
                  + (case when monetary > m3 then 1 else 0 end)
                as integer) as m_score
    from base cross join q
    order by user_id
    """,
)
def user_rfm_segments(spark, sf_dir):
    """RFM segmentation — recency (last activity), frequency (event
    count), monetary (exact purchase-value sum) per user, each scored
    1-4 against the corpus quartiles: the classic user-value grid
    (4=best quartile on every axis). Quartile scoring uses the
    lint-clean global-binning shape (equal_freq_binning /
    length_outlier_filter): ONE 1-row exact-percentile aggregate
    broadcast-attached in-plan — not a global ntile window, which would
    funnel every user through one task. Spark `percentile` and DuckDB
    `quantile_cont` share the p*(n-1) interpolation convention on
    identical doubles, monetary is the decimal-exact money sum
    (relational.exact_sum), and strict `>` bucket edges make every
    score replay bit-identically.

    Scale: one map-side-combinable aggregate over events, one 1-row
    attach, one projection — no per-user state beyond the aggregate."""
    from database_extractor_spark.operators.relational import exact_sum
    from database_extractor_spark.operators.timeseries import _epoch_us

    ev = _tbl(spark, sf_dir, "events")
    base = ev.groupBy("user_id").agg(
        F.max(_epoch_us("ts")).alias("last_seen_us"),
        F.count("*").cast("bigint").alias("n_events"),
        exact_sum(
            F.when(F.col("event_type") == "purchase", F.col("value"))
            .otherwise(F.lit(0.0)),
            "monetary",
        ),
    )
    q = base.agg(
        F.expr("percentile(last_seen_us, 0.25)").alias("r1"),
        F.expr("percentile(last_seen_us, 0.50)").alias("r2"),
        F.expr("percentile(last_seen_us, 0.75)").alias("r3"),
        F.expr("percentile(cast(n_events as double), 0.25)").alias("f1"),
        F.expr("percentile(cast(n_events as double), 0.50)").alias("f2"),
        F.expr("percentile(cast(n_events as double), 0.75)").alias("f3"),
        F.expr("percentile(monetary, 0.25)").alias("m1"),
        F.expr("percentile(monetary, 0.50)").alias("m2"),
        F.expr("percentile(monetary, 0.75)").alias("m3"),
    )

    def score(col, e1, e2, e3):
        c = F.col(col) if isinstance(col, str) else col
        return (
            F.lit(1)
            + F.when(c > F.col(e1), 1).otherwise(0)
            + F.when(c > F.col(e2), 1).otherwise(0)
            + F.when(c > F.col(e3), 1).otherwise(0)
        ).cast("int")

    return (
        base.crossJoin(F.broadcast(q))
        .select(
            "user_id",
            "last_seen_us",
            "n_events",
            "monetary",
            score("last_seen_us", "r1", "r2", "r3").alias("r_score"),
            score(
                F.col("n_events").cast("double"), "f1", "f2", "f3"
            ).alias("f_score"),
            score("monetary", "m1", "m2", "m3").alias("m_score"),
        )
        .orderBy("user_id")
    )


@register(
    "approx_topk_heavy_hitters",
    """
    select cast(user_id as varchar) as item,
           cast(count(*) as bigint) as n
    from events
    group by user_id
    order by n desc, item
    limit 25
    """,
)
def approx_topk_heavy_hitters(spark, sf_dir):
    """Heavy hitters via the approx_top_k SKETCH — the frequent-items
    member of the mergeable-sketch family (HLL = distinct,
    approx_percentile = quantiles, this = top items): per-partition
    sketches of bounded size merge associatively, so the hot-key census
    at 100 TB costs one pass with fixed memory instead of a full
    groupBy over every key. Run here in the EXACT regime (the
    approx_distinct / approx_percentile_sketch discipline):
    maxItemsTracked=100000 exceeds every fixture's distinct-user count,
    so tracked counts are exact and the DuckDB group-count oracle
    matches bit-for-bit; the approx regime (more keys than tracker
    slots) is property-tested, not oracled. The sketch's own output
    order is tie-UNSPECIFIED, so the entry re-sorts deterministically
    (count desc, item) and cuts top-25 OUTSIDE the sketch — never trust
    a sketch's tie order across engines."""
    ev = _tbl(spark, sf_dir, "events")
    tk = ev.agg(
        F.expr(
            "approx_top_k(cast(user_id as string), 5000, 100000)"
        ).alias("tk")
    )
    return (
        tk.select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("item"),
            F.col("e.count").cast("bigint").alias("n"),
        )
        .orderBy(F.desc("n"), "item")
        .limit(25)
    )


@register(
    "sql_parameterized",
    """
    select event_type, cast(count(*) as bigint) as n,
           cast(sum(cast(value as decimal(18,4))) as double) as total
    from events
    where value >= 50.0 and event_type in ('click', 'purchase')
    group by event_type
    order by event_type
    """,
)
def sql_parameterized(spark, sf_dir):
    """Parameterized SQL front end (spark.sql(..., args={...}) — named
    ``:param`` markers bound server-side): the injection-safe seam every
    multi-tenant query service needs; string-assembled SQL is how the
    reference builds ALL its queries (Flux string concatenation,
    database_extractor.py:264-300), so this is the modern replacement
    for that whole class. Parameters bind as literals in the analyzed
    plan — same Catalyst plan as the inlined query (filter pushdown
    intact), which is exactly what the inlined-literal oracle checks."""
    docs = _tbl(spark, sf_dir, "events")
    docs.createOrReplaceTempView("events_param_v")
    return spark.sql(
        """
        select event_type, cast(count(*) as bigint) as n,
               cast(sum(cast(value as decimal(18,4))) as double) as total
        from events_param_v
        where value >= :lo and event_type in (:t1, :t2)
        group by event_type
        order by event_type
        """,
        args={"lo": 50.0, "t1": "click", "t2": "purchase"},
    )


@register(
    "sql_pivot_clause",
    """
    select cast(ts as date) as day,
           cast(sum(case when event_type = 'click'
                         then cast(value as decimal(18,4)) end)
                as double) as click,
           cast(sum(case when event_type = 'view'
                         then cast(value as decimal(18,4)) end)
                as double) as view
    from events
    where event_type in ('click', 'view')
    group by cast(ts as date)
    order by day
    """,
)
def sql_pivot_clause(spark, sf_dir):
    """The SQL PIVOT clause — the front-end face of pivot (o05/
    pivot_multi_agg cover the DataFrame API; sql_windowed_cte did the
    same for windows): `FROM t PIVOT (agg FOR col IN (...))` with an
    explicit value list, which is what keeps the operation ONE pass at
    scale (implicit-value pivots need a distinct-scan first to discover
    columns — the reference's pandas pivot does exactly that hidden
    scan). Decimal-exact value sums; the oracle states the equivalent
    CASE-conditional aggregate, which is also the physical plan Spark
    lowers PIVOT to."""
    ev = _tbl(spark, sf_dir, "events")
    ev.select(
        F.to_date("ts").alias("day"), "event_type", "value"
    ).createOrReplaceTempView("events_pivot_v")
    return spark.sql(
        """
        select * from (
            select day, event_type, cast(value as decimal(18,4)) as v
            from events_pivot_v
            where event_type in ('click', 'view')
        )
        pivot (cast(sum(v) as double) for event_type in ('click', 'view'))
        order by day
        """
    )


@register(
    "streaming_bitmap_distinct",
    """
    select event_type, cast(ts as date) as day,
           cast(count(distinct user_id) as bigint) as n_users
    from events
    group by event_type, cast(ts as date)
    order by event_type, day
    """,
)
def streaming_bitmap_distinct_q(spark, sf_dir):
    """The STREAMING face of bitmap_exact_distinct: per-(type, day,
    bucket) bitmaps maintained as streaming state (bitwise-OR per
    micro-batch — bounded 4 KB per state row, vs one state row PER id
    for dropDuplicates-style exact distinct), popcount-summed by a batch
    query over the snapshot. One availableNow drain of the fixture must
    equal the batch COUNT(DISTINCT) oracle exactly — same oracle as the
    batch twin, proving stream/batch interchangeability of the lane."""
    from database_extractor_spark.streaming import streaming_bitmap_distinct

    return streaming_bitmap_distinct(
        spark, os.path.join(sf_dir, "events.parquet")
    )


@register(
    "pack_efficiency_eval",
    r"""
    with toks as (
        select doc_id, doc_id % 16 as shard,
               cast(len(string_split_regex(trim(text), '\s+')) as bigint)
                   as n_tokens
        from documents
    ),
    packed as (
        select shard, n_tokens,
               cast(floor((cast(sum(n_tokens) over w as bigint) - n_tokens)
                          / 512.0) as bigint) as pack_seq
        from toks
        window w as (partition by shard order by doc_id
                     rows between unbounded preceding and current row)
    ),
    bins as (
        select shard, pack_seq, cast(sum(n_tokens) as bigint) as fill
        from packed group by shard, pack_seq
    )
    select shard,
           cast(count(*) as bigint) as n_bins,
           cast(sum(fill) as bigint) as n_tokens,
           cast(max(fill) as bigint) as max_fill,
           cast(cast(sum(fill) as bigint) * 1000000
                // (cast(count(*) as bigint) * 512) as bigint) as util_q
    from bins group by shard order by shard
    """,
)
def pack_efficiency_eval(spark, sf_dir):
    """Packing-efficiency QA for pack_sequences — per shard: bin count,
    token total, the largest bin (start-assigned bins can exceed the
    512 capacity when a document straddles the boundary — max_fill is
    the overflow audit), and capacity utilization in exact micro units
    (tokens * 1e6 div (bins * 512)). This is the report a training run
    reads before committing a packing config: utilization is the
    padding-waste complement, and a low number says the bin size or
    shard order needs work. Builds directly on pack_sequences' OUTPUT
    (review r13: re-stating the shard/bin rule here would silently
    audit a DIFFERENT packing if the packer's literals ever change —
    the composition discipline of per_source_quality_report), plus one
    extra keyed aggregate on the packer's own frame."""
    packed = _pack_sequences_frame(spark, sf_dir)
    bins = packed.groupBy("shard", "pack_seq").agg(
        F.sum("n_tokens").cast("bigint").alias("fill")
    )
    return (
        bins.groupBy("shard")
        .agg(
            F.count("*").cast("bigint").alias("n_bins"),
            F.sum("fill").cast("bigint").alias("n_tokens"),
            F.max("fill").cast("bigint").alias("max_fill"),
        )
        .select(
            "shard",
            "n_bins",
            "n_tokens",
            "max_fill",
            F.expr("n_tokens * 1000000L div (n_bins * 512L)")
            .cast("bigint")
            .alias("util_q"),
        )
        .orderBy("shard")
    )


@register(
    "ngram_novelty_ratio",
    r"""
    with toks as (
        select doc_id,
               string_split_regex(lower(trim(text)), '\s+') as ws
        from documents
    ),
    tri as (
        select doc_id >= 250 as is_batch,
               unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                       for i in range(1, len(ws) - 1)]) as tg
        from toks where len(ws) >= 3
    ),
    b as (select distinct tg from tri where is_batch),
    c as (select distinct tg from tri where not is_batch),
    m as (
        select cast((select count(*) from b) as bigint) as n_batch_distinct,
               cast((select count(*) from b
                     where tg not in (select tg from c)) as bigint) as n_new
    )
    select n_batch_distinct, n_new,
           n_new * 1000000 // greatest(n_batch_distinct, 1) as novelty_q
    from m
    """,
)
def ngram_novelty_ratio(spark, sf_dir):
    """Content NOVELTY of an incoming batch vs the existing corpus — the
    fraction of the batch's distinct trigrams never seen before (batch =
    doc_id >= 250, the same split the streaming gates use; in production
    the crawl increment vs the lake). The go/no-go signal for paying a
    crawl's processing cost: near-zero novelty means the source is
    re-serving known content and belongs behind the dedup gate, high
    novelty earns a full curation pass. Exact distinct-trigram sets via
    one tokenize pass + a LEFT ANTI join on trigram (shuffle on the
    trigram key, bounded by observed trigram diversity — never a
    containment scan of the corpus text)."""
    docs = _tbl(spark, sf_dir, "documents")
    toks = docs.select(
        (F.col("doc_id") >= 250).alias("is_batch"),
        T.tokens(F.lower(F.trim(F.col("text")))).alias("ws"),
    )
    tri = toks.filter(F.size("ws") >= 3).select(
        "is_batch",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws) - 2), i -> "
                "concat(element_at(ws, i), ' ', element_at(ws, i + 1),"
                " ' ', element_at(ws, i + 2)))"
            )
        ).alias("tg"),
    )
    b = tri.filter("is_batch").select("tg").distinct()
    c = tri.filter("not is_batch").select("tg").distinct()
    new = b.join(c, "tg", "left_anti")
    return (
        b.agg(F.count("*").cast("bigint").alias("n_batch_distinct"))
        .crossJoin(
            F.broadcast(new.agg(F.count("*").cast("bigint").alias("n_new")))
        )
        .select(
            "n_batch_distinct",
            "n_new",
            F.expr(
                "n_new * 1000000L div greatest(n_batch_distinct, 1L)"
            ).alias("novelty_q"),
        )
    )


#: per-process path of the deterministic dirty CSV fixture
_DIRTY_CSV_PATH: dict[str, str] = {}


@register(
    "csv_corrupt_records",
    """
    with r as (select unnest(range(0, 200)) as i),
    flags as (select i, (i % 13 = 0 and i > 0) as bad from r)
    select cast(sum(case when not bad then 1 else 0 end) as bigint)
               as n_good,
           cast(sum(case when bad then 1 else 0 end) as bigint)
               as n_corrupt,
           cast(sum(case when not bad then i * 2 else 0 end) as bigint)
               as sum_v
    from flags
    """,
)
def csv_corrupt_records(spark, sf_dir):
    """Malformed-row QUARANTINE on CSV ingestion — PERMISSIVE mode with
    columnNameOfCorruptRecord: bad rows land whole in the corrupt-record
    column instead of killing the job (FAILFAST) or silently vanishing
    (DROPMALFORMED), so ingestion can count, sample, and re-drive them —
    the hardening every 100 TB pipeline needs on third-party file drops.
    The dirty file is generated deterministically (every 13th row gets a
    non-numeric id token), so the oracle replays the expected good/bad
    split and value sum from range() arithmetic — the python_datasource
    formula-replay pattern: the oracle checks the SEMANTICS of the
    quarantine without needing DuckDB to mimic Spark's CSV parser."""
    # one dirty file per PROCESS (review r13: this entry is in the bench
    # rotation — a fresh mkdtemp + rewrite per invocation accumulates
    # temp dirs and atexit handlers; _stream_tmpdir is the shared
    # atexit-cleaned mkdtemp helper)
    path = _DIRTY_CSV_PATH.get("path")
    if path is None or not os.path.exists(path):
        path = os.path.join(_stream_tmpdir("dirty_csv_"), "rows.csv")
        with open(path, "w") as f:
            f.write("id,v\n")
            for i in range(200):
                if i % 13 == 0 and i > 0:
                    f.write(f"oops_row_{i},not_a_number\n")
                else:
                    f.write(f"{i},{i * 2}\n")
        _DIRTY_CSV_PATH["path"] = path
    df = (
        spark.read.option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .schema("id bigint, v bigint, _bad string")
        .csv(path)
    )
    return df.agg(
        F.sum(F.when(F.col("_bad").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_good"),
        F.sum(F.when(F.col("_bad").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_corrupt"),
        F.sum(F.when(F.col("_bad").isNull(), F.col("v")).otherwise(0))
        .cast("bigint")
        .alias("sum_v"),
    )


@register(
    "attribution_last_touch",
    """
    with t as (
        select user_id, epoch_us(ts) as us, event_id, event_type, value,
               case when event_type in ('click', 'view')
                    then event_type end as touch
        from events
    ),
    a as (
        select *,
               last_value(touch ignore nulls) over (
                   partition by user_id order by us, event_id
                   rows between unbounded preceding and 1 preceding
               ) as attr
        from t
    )
    select coalesce(attr, 'none') as channel,
           cast(count(*) as bigint) as n_purchases,
           cast(sum(cast(value as decimal(18,4))) as double) as revenue
    from a where event_type = 'purchase'
    group by coalesce(attr, 'none')
    order by channel
    """,
)
def attribution_last_touch(spark, sf_dir):
    """LAST-TOUCH revenue attribution — every purchase credits the
    user's most recent PRECEDING touch event (click or view; purchases
    with no prior touch fall in the 'none' bucket): the marketing
    question behind the funnel ("which channel gets the revenue"),
    answered with the single-pass union-and-carry shape the as-of join
    uses — touches and purchases ride ONE user-partitioned ordered
    window (last ignore-nulls over strictly-earlier rows), no
    touches-x-purchases range join. Deterministic: (us, event_id)
    totally orders each user's stream. Revenue is the decimal-exact
    money sum.

    Scale: one hash exchange on user_id + one window pass + a 5-row
    aggregate — the naive per-purchase backward range join is quadratic
    per user and this is its standard linear rewrite."""
    from database_extractor_spark.operators.relational import exact_sum
    from database_extractor_spark.operators.timeseries import _epoch_us

    ev = _tbl(spark, sf_dir, "events")
    tagged = ev.select(
        "user_id",
        _epoch_us("ts").alias("us"),
        "event_id",
        "event_type",
        "value",
        F.when(
            F.col("event_type").isin("click", "view"), F.col("event_type")
        ).alias("touch"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    attributed = tagged.withColumn(
        "attr", F.last("touch", ignorenulls=True).over(w)
    )
    return (
        attributed.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("attr", F.lit("none")).alias("channel"))
        .agg(
            F.count("*").cast("bigint").alias("n_purchases"),
            exact_sum("value", "revenue"),
        )
        .orderBy("channel")
    )


@register(
    "activity_heatmap",
    """
    select date_part('isodow', ts) as dow_iso,
           date_part('hour', ts) as hour,
           cast(count(*) as bigint) as n,
           cast(sum(cast(value as decimal(18,4))) as double) as total
    from events
    group by date_part('isodow', ts), date_part('hour', ts)
    order by dow_iso, hour
    """,
)
def activity_heatmap(spark, sf_dir):
    """Weekday-x-hour activity heatmap — the load-profile report behind
    capacity planning and anomaly baselines (ts_seasonal_anomaly uses
    hour-of-day; this is its 2-D reporting face). The cross-engine trap
    this entry pins: day-of-week NUMBERING differs per engine (Spark
    `dayofweek` counts 1=Sunday, DuckDB `dayofweek` 0=Sunday) — both
    sides use the ISO convention (1=Monday..7=Sunday: Spark
    `extract(DAYOFWEEK_ISO ...)`, DuckDB `isodow`) so the key aligns
    bit-identically. One map-side-combinable aggregate over at most
    168 groups."""
    from database_extractor_spark.operators.relational import exact_sum

    ev = _tbl(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.expr("extract(DAYOFWEEK_ISO FROM ts)")
            .cast("bigint")
            .alias("dow_iso"),
            F.hour("ts").cast("bigint").alias("hour"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n"),
            exact_sum("value", "total"),
        )
        .orderBy("dow_iso", "hour")
    )


@register(
    "event_path_markov",
    """
    with p as (
        select event_type as e1,
               lead(event_type, 1) over (
                   partition by user_id order by ts, event_id) as e2
        from events
    ),
    bg as (
        select e1, e2, cast(count(*) as bigint) as n
        from p where e2 is not null group by e1, e2
    ),
    tot as (select e1, cast(sum(n) as bigint) as t from bg group by e1)
    select bg.e1, bg.e2, bg.n,
           bg.n * 1000000 // tot.t as p_q
    from bg join tot using (e1)
    order by e1, e2
    """,
)
def event_path_markov(spark, sf_dir):
    """First-order Markov TRANSITION MATRIX over user journeys —
    P(next event | current event) as exact scaled-integer micros (n
    transitions from e1 to e2 over all transitions leaving e1): the
    model behind next-action prediction baselines and journey
    simulation; event_path_trigrams surfaces hot 3-paths, this gives
    the normalized one-step dynamics. One user-partitioned window pass
    (the same (ts, event_id) total order), a |types|^2-bounded count,
    and a broadcast row-marginal join; probabilities are pure bigint
    division — no doubles anywhere."""
    ev = _tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
    )
    bg = (
        p.filter(F.col("e2").isNotNull())
        .groupBy("e1", "e2")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    tot = bg.groupBy("e1").agg(F.sum("n").cast("bigint").alias("t"))
    return (
        bg.join(F.broadcast(tot), "e1")
        .select("e1", "e2", "n", F.expr("n * 1000000L div t").alias("p_q"))
        .orderBy("e1", "e2")
    )


@register(
    "funnel_latency_percentiles",
    """
    with f as (
        select user_id,
               min(case when event_type = 'view'
                        then epoch_us(ts) end) as t_view,
               min(case when event_type = 'purchase'
                        then epoch_us(ts) end) as t_purchase
        from events group by user_id
    ),
    lat as (
        select t_purchase - t_view as latency_us
        from f
        where t_view is not null and t_purchase is not null
          and t_purchase >= t_view
    )
    select cast(count(*) as bigint) as n_converted,
           quantile_cont(cast(latency_us as double), 0.50) as p50_us,
           quantile_cont(cast(latency_us as double), 0.90) as p90_us,
           cast(max(latency_us) as bigint) as max_us
    from lat
    """,
)
def funnel_latency_percentiles(spark, sf_dir):
    """Funnel LATENCY distribution — funnel_conversion counts who
    converts; this measures HOW LONG conversion takes (first view ->
    first purchase per user, exact integer micros), summarized as
    p50/p90/max. The SLA-style report product teams read next to the
    conversion rate. One per-user conditional-min aggregate (map-side
    combinable) + one global exact-percentile aggregate over the
    |converted users| latencies; percentiles interpolate on identical
    doubles both engines (the length_outlier_filter convention)."""
    from database_extractor_spark.operators.timeseries import _epoch_us

    ev = _tbl(spark, sf_dir, "events")
    us = _epoch_us("ts")
    f = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", us)).alias("t_view"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias(
            "t_purchase"
        ),
    )
    lat = f.filter(
        F.col("t_view").isNotNull()
        & F.col("t_purchase").isNotNull()
        & (F.col("t_purchase") >= F.col("t_view"))
    ).select((F.col("t_purchase") - F.col("t_view")).alias("latency_us"))
    return lat.agg(
        F.count("*").cast("bigint").alias("n_converted"),
        F.expr("percentile(cast(latency_us as double), 0.50)").alias(
            "p50_us"
        ),
        F.expr("percentile(cast(latency_us as double), 0.90)").alias(
            "p90_us"
        ),
        F.max("latency_us").cast("bigint").alias("max_us"),
    )


def _dup_histogram_oracle() -> str:
    """Cluster-size histogram over the dedup_clusters components oracle
    (the _canonical_pick_oracle derived-table pattern)."""
    return f"""
    with cl as (select doc_id, cluster_id from ({ORACLE["dedup_clusters"]})),
    sizes as (
        select cluster_id, cast(count(*) as bigint) as size
        from cl group by cluster_id
    )
    select size,
           cast(count(*) as bigint) as n_clusters,
           cast(size * count(*) as bigint) as n_docs
    from sizes group by size order by size
    """


@register("dup_cluster_histogram", _dup_histogram_oracle())
def dup_cluster_histogram(spark, sf_dir):
    """Corpus DUPLICATION PROFILE — the cluster-size histogram of the
    near-dup components (size -> how many clusters, how many documents):
    the one-page answer to "how duplicated is this corpus", read before
    choosing dedup aggressiveness (a long tail of pairs is normal;
    mega-clusters mean boilerplate and call for the exact-substring or
    containment lanes instead). Rides the same pairs -> components
    machinery as dedup_clusters (inverted-index join + pointer-jumping
    CC, never all-pairs) plus two tiny keyed aggregates; only multi-doc
    clusters appear (singletons are the complement and would dominate
    the histogram without adding signal)."""
    # compose the shared dedup_clusters FRAME helper (review r13:
    # restating the pair generator + threshold here would desynchronize
    # the histogram from the clustering it reports on; r17 composition
    # lint: the sharing goes through the named helper, not the entry
    # callable — its oracle already derives from ORACLE["dedup_clusters"])
    cl = _dedup_clusters_frame(spark, sf_dir)
    sizes = cl.groupBy("cluster_id").agg(
        F.count("*").cast("bigint").alias("size")
    )
    return (
        sizes.groupBy("size")
        .agg(F.count("*").cast("bigint").alias("n_clusters"))
        .select(
            "size",
            "n_clusters",
            (F.col("size") * F.col("n_clusters"))
            .cast("bigint")
            .alias("n_docs"),
        )
        .orderBy("size")
    )


def _source_quality_oracle() -> str:
    """Per-source rollup over the Gopher gate oracle as a derived table
    (the _canonical_pick_oracle pattern)."""
    return f"""
    with g as (select doc_id, n_words, keep from ({_GOPHER_ORACLE})),
    j as (
        select d.source, g.n_words, g.keep
        from g join documents d using (doc_id)
    )
    select source,
           cast(count(*) as bigint) as n_docs,
           cast(sum(case when keep then 1 else 0 end) as bigint) as n_keep,
           cast(sum(case when keep then 1 else 0 end) as bigint)
               * 1000000 // cast(count(*) as bigint) as keep_q,
           cast(sum(n_words) as bigint) as n_words,
           cast(sum(n_words) as bigint) * 1000000
               // cast(count(*) as bigint) as mean_words_q
    from j group by source order by source
    """


@register("per_source_quality_report", _source_quality_oracle())
def per_source_quality_report(spark, sf_dir):
    """SLICE SCORECARD — per source: document count, Gopher-gate keep
    count and keep RATE (exact micro ratio), token volume, and mean
    document length. This is the table a curator actually reads when
    deciding which sources to keep, cap, or drop (corpus_slice_jsd says
    which slices are redundant; this says which are junk): composes the
    oracled Gopher gate with one broadcast-sized source join and a
    per-source rollup, so the oracle replays gate AND rollup. All
    ratios pure bigint division."""
    g = _gopher_gate_frame(spark, sf_dir).select(
        "doc_id", "n_words", "keep"
    )
    docs = _tbl(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        g.join(docs, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_keep"),
            F.sum("n_words").cast("bigint").alias("n_words"),
        )
        .select(
            "source",
            "n_docs",
            "n_keep",
            F.expr("n_keep * 1000000L div n_docs").alias("keep_q"),
            "n_words",
            F.expr("n_words * 1000000L div n_docs").alias("mean_words_q"),
        )
        .orderBy("source")
    )


@register(
    "sql_join_hints",
    """
    select n.n_name,
           cast(count(*) as bigint) as n_customers,
           cast(sum(cast(c.c_acctbal as decimal(18,4))) as double)
               as total_acctbal
    from customer c join nation n on c.c_nationkey = n.n_nationkey
    group by n.n_name
    order by n.n_name
    """,
)
def sql_join_hints(spark, sf_dir):
    """SQL JOIN HINTS — `/*+ BROADCAST(n) */` forcing a broadcast hash
    join when the optimizer's size-based choice is disabled entirely
    (autoBroadcastJoinThreshold=-1 inside the entry window, the
    _with_bloom_confs conf-restore discipline): the escape hatch for
    the 100 TB case the planner can't see — a logically-small dim whose
    on-disk stats lie (post-filter selectivity, fresh table, remote
    source without statistics). Hints are advisory-but-honored for
    broadcast; the plan must show BroadcastHashJoin with NO size
    information available (plan-pinned in tests), and results equal the
    plain join (the oracle) because a hint can never change semantics.
    Compilation happens inside the conf window (session.conf_window —
    the shared restore discipline) via eager localCheckpoint, the
    runtime_bloom_join pattern."""
    from database_extractor_spark.session import conf_window

    with conf_window(spark, {"spark.sql.autoBroadcastJoinThreshold": "-1"}):
        _tbl(spark, sf_dir, "customer").createOrReplaceTempView(
            "customer_hint_v"
        )
        _tbl(spark, sf_dir, "nation").createOrReplaceTempView(
            "nation_hint_v"
        )
        return spark.sql(
            """
            select /*+ BROADCAST(n) */
                   n.n_name,
                   cast(count(*) as bigint) as n_customers,
                   cast(sum(cast(c.c_acctbal as decimal(18,4))) as double)
                       as total_acctbal
            from customer_hint_v c
            join nation_hint_v n on c.c_nationkey = n.n_nationkey
            group by n.n_name
            order by n.n_name
            """
        ).localCheckpoint(eager=True)


def _lang_confusion_oracle() -> str:
    """Confusion matrix over the text_lang_id oracle as a derived table
    joined to the fixture's lang labels."""
    return f"""
    with p as (select doc_id, lang_pred from ({ORACLE["text_lang_id"]}))
    select d.lang, p.lang_pred, cast(count(*) as bigint) as n
    from p join documents d using (doc_id)
    group by d.lang, p.lang_pred
    order by lang, lang_pred
    """


@register("lang_id_confusion_eval", _lang_confusion_oracle())
def lang_id_confusion_eval(spark, sf_dir):
    """Language-ID CONFUSION MATRIX — predicted vs labeled language,
    cell counts: the eval loop for the stopword-hit heuristic
    (text_lang_id), the same close-the-loop discipline as the ANN
    recall panel and the LSH precision/recall evals — an identifier you
    have not scored against labels is a guess. Off-diagonal mass tells
    you which language pairs the stopword lists confuse and where 'und'
    (no hits / tie) swallows real text. ONE scan + a |langs|^2-bounded
    aggregate: lang_pred and the label live on the SAME documents row,
    so the r17 shape's doc_id self-join (second scan + broadcast of a
    documents-derived column — an SF-linear build side at corpus scale)
    was pure overhead; r18 removes it (guide §2.4 — identical 10-row
    matrix, 2.25 -> 0.66 s together with the with_lang_id
    single-tokenize fix). The oracle replays the identifier AND the
    rollup."""
    from database_extractor_spark.operators import text as T

    return (
        T.with_lang_id(_tbl(spark, sf_dir, "documents"))
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy("lang", "lang_pred")
    )


def _gate_agreement_oracle() -> str:
    """Binary agreement of the two quality gates, both oracles as
    derived tables."""
    return f"""
    with g as (select doc_id, keep from ({_GOPHER_ORACLE})),
    c as (select doc_id, quality_pass
          from ({ORACLE["quality_classifier_score"]})),
    j as (
        select g.keep as gopher_keep, c.quality_pass as cls_keep
        from g join c using (doc_id)
    )
    select cast(count(*) as bigint) as n_docs,
           cast(sum(case when gopher_keep and cls_keep
                         then 1 else 0 end) as bigint) as n_both,
           cast(sum(case when cls_keep and not gopher_keep
                         then 1 else 0 end) as bigint) as n_cls_only,
           cast(sum(case when gopher_keep and not cls_keep
                         then 1 else 0 end) as bigint) as n_gopher_only,
           cast(sum(case when not gopher_keep and not cls_keep
                         then 1 else 0 end) as bigint) as n_neither,
           (cast(sum(case when gopher_keep and cls_keep then 1 else 0 end)
                 as bigint)
            + cast(sum(case when not gopher_keep and not cls_keep
                            then 1 else 0 end) as bigint))
               * 1000000 // cast(count(*) as bigint) as agreement_q
    from j
    """


@register("quality_gate_agreement", _gate_agreement_oracle())
def quality_gate_agreement(spark, sf_dir):
    """GATE AGREEMENT — the 2x2 confusion of the heuristic Gopher gate
    against the learned classifier gate plus exact micro agreement
    rate: the sanity check run before swapping one quality gate for
    another in a curation funnel (high disagreement means the swap
    silently changes the corpus; the disagreement cells are exactly the
    documents to sample and read). Both gates' decisions come from the
    shared ONE-SCAN helper (streaming_bpe_ops.quality_rater_decisions —
    r16: composing the two entries' FRAMES re-paid both tokenize
    pipelines plus a doc_id join, 130.7 s at sf10 vs single digits
    one-scan); the oracle replays both gates AND the agreement
    arithmetic."""
    from database_extractor_spark.registry.streaming_bpe_ops import (
        quality_rater_decisions,
    )

    j = quality_rater_decisions(spark, sf_dir)
    both = F.sum(
        F.when(F.col("gopher_keep") & F.col("cls_keep"), 1).otherwise(0)
    ).cast("bigint")
    neither = F.sum(
        F.when(~F.col("gopher_keep") & ~F.col("cls_keep"), 1).otherwise(0)
    ).cast("bigint")
    return j.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        both.alias("n_both"),
        F.sum(
            F.when(F.col("cls_keep") & ~F.col("gopher_keep"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_cls_only"),
        F.sum(
            F.when(F.col("gopher_keep") & ~F.col("cls_keep"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_gopher_only"),
        neither.alias("n_neither"),
        F.expr(
            "(cast(sum(case when gopher_keep and cls_keep then 1 else 0 end)"
            " as bigint)"
            " + cast(sum(case when not gopher_keep and not cls_keep"
            " then 1 else 0 end) as bigint))"
            " * 1000000L div count(*)"
        ).alias("agreement_q"),
    )


@register(
    "higher_order_funcs",
    """
    select vec_id,
           cast(len(list_filter(embedding, x -> x > 0)) as integer)
               as n_pos,
           len(list_filter(embedding, x -> x > 2.0)) > 0 as exists_gt2,
           case when embedding is null then null
                else round(list_reduce(
                    list_concat([0.0::DOUBLE],
                                list_transform(embedding::DOUBLE[],
                                               x -> x * x)),
                    (acc, x) -> acc + x), 6) end as selfdot,
           case when embedding is null then null
                else round(list_dot_product(embedding::DOUBLE[],
                                            list_reverse(
                                                embedding::DOUBLE[])), 6)
                end as pal_dot
    from embeddings
    order by vec_id
    """,
)
def higher_order_funcs(spark, sf_dir):
    """HIGHER-ORDER array functions — the lambda surface (filter /
    exists / aggregate / zip_with) that keeps per-element logic
    JVM-side and codegen'd where a row-at-a-time Python UDF would cost
    10-100x (the central UDF-avoidance lever of this repo): per vector,
    positive-element count, a threshold EXISTS, the self dot product as
    an explicit aggregate() left-fold, and a zip_with against the
    reversed vector. Exactness: both engines LEFT-fold the lambda over
    the same element order on identical doubles — the identical IEEE
    sequence — and zip_with(x, reverse(x)) mirrors DuckDB's
    list_dot_product with list_reverse (same order of partial sums
    because dot products fold left too); round 6 guards the display
    value. The oracle's list_reduce is seeded with the SAME 0.0 init
    as F.aggregate via list_concat([0.0], ...) (r13 ADVICE): a bare
    list_reduce errors on empty lists and skips the init on 1-element
    lists, so both engines now share fold semantics on degenerate
    inputs too. NULL arrays are case-guarded in the oracle (r15):
    DuckDB's list_concat([0.0], NULL) yields [0.0] (fold 0.0) and its
    vectorized list_dot_product REJECTS null rows, while Spark's
    aggregate/zip_with propagate NULL — the guard aligns both on NULL
    (tests/test_oracle_hardening.py). Pure per-row projection — no
    shuffle, no UDF."""
    e = _tbl(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    demb = F.expr("transform(embedding, x -> cast(x as double))")
    selfdot = F.aggregate(
        F.expr(
            "transform(embedding, x -> cast(x as double)"
            " * cast(x as double))"
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pal = F.aggregate(
        F.zip_with(demb, F.reverse(demb), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id",
        F.size(F.filter(emb, lambda x: x > F.lit(0))).alias("n_pos"),
        F.exists(emb, lambda x: x > F.lit(2.0)).alias("exists_gt2"),
        F.round(selfdot, 6).alias("selfdot"),
        F.round(pal, 6).alias("pal_dot"),
    ).orderBy("vec_id")


#: per-process path of the deterministic dirty JSONL fixture
_DIRTY_JSON_PATH: dict[str, str] = {}


@register(
    "json_corrupt_records",
    """
    with r as (select unnest(range(0, 150)) as i),
    flags as (select i, (i % 11 = 0 and i > 0) as bad from r)
    select cast(sum(case when not bad then 1 else 0 end) as bigint)
               as n_good,
           cast(sum(case when bad then 1 else 0 end) as bigint)
               as n_corrupt,
           cast(sum(case when not bad then i * 3 else 0 end) as bigint)
               as sum_v
    from flags
    """,
)
def json_corrupt_records(spark, sf_dir):
    """Malformed-record quarantine for JSON LINES — the JSON sibling of
    csv_corrupt_records (a DIFFERENT parser with different failure
    modes: truncated objects and bare non-JSON lines rather than column
    drift), same PERMISSIVE + columnNameOfCorruptRecord contract, same
    formula-replay oracle over the deterministic dirty file (every 11th
    line is cut mid-object). Spark restriction honored by construction:
    a query may not reference ONLY the corrupt column — this aggregate
    reads parsed and corrupt columns together in one pass."""
    path = _DIRTY_JSON_PATH.get("path")
    if path is None or not os.path.exists(path):
        path = os.path.join(_stream_tmpdir("dirty_json_"), "rows.jsonl")
        with open(path, "w") as f:
            for i in range(150):
                if i % 11 == 0 and i > 0:
                    f.write('{"id": %d, "v":' % i + "\n")  # truncated
                else:
                    f.write('{"id": %d, "v": %d}' % (i, i * 3) + "\n")
        _DIRTY_JSON_PATH["path"] = path
    df = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .schema("id bigint, v bigint, _bad string")
        .json(path)
    )
    return df.agg(
        F.sum(F.when(F.col("_bad").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_good"),
        F.sum(F.when(F.col("_bad").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_corrupt"),
        F.sum(F.when(F.col("_bad").isNull(), F.col("v")).otherwise(0))
        .cast("bigint")
        .alias("sum_v"),
    )


@register(
    "eval_split_decontaminated",
    r"""
    with b as (
        select doc_id, text,
               ('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::bigint
                   % 100 as bkt
        from documents
    ),
    words as (select doc_id, bkt,
                     string_split_regex(trim(text), '\s+') as ws from b),
    sh0 as (
        select doc_id, bkt, unnest(list_distinct(
            [array_to_string(ws[i:i+2], ' ')
             for i in range(1, greatest(len(ws) - 2, 1) + 1)]
        )) as s
        from words
    ),
    -- hot-shingle df cap (r15 sf10 anchor): corpus-wide boilerplate
    -- shingles are non-discriminative for leakage and quadratic in the
    -- join; df <= 100 never binds at fixture scale (max df: 7 at
    -- sf0.01, 25 at sf0.1)
    sh as (
        select sh0.doc_id, sh0.bkt, sh0.s from sh0
        qualify count(*) over (partition by s) <= 100
    ),
    tr as (select doc_id, s from sh where bkt < 80),
    ev as (select doc_id, s from sh where bkt >= 90),
    contaminated as (
        select ev.doc_id from (
            select ev.doc_id, count(*) as c
            from tr join ev on tr.s = ev.s
            group by tr.doc_id, ev.doc_id
        ) ev where c >= 3
    )
    select doc_id from b
    where bkt >= 90 and doc_id not in (select doc_id from contaminated)
    order by doc_id
    """,
)
def eval_split_decontaminated(spark, sf_dir):
    """LEAKAGE-SAFE EVAL SPLIT — the composition of the md5 80/10/10
    split with n-gram decontamination: take the deterministic TEST
    bucket (split_train_val_test's md5 rule) and PURGE every test
    document sharing >= 3 distinct 3-gram shingles with any TRAIN
    document. This is the step that makes an eval set trustworthy — a
    random split of a crawl leaks near-duplicates across the boundary,
    and an eval doc the model saw in training inflates every metric
    downstream (train docs stay; the EVAL side pays the removal, since
    eval sets are cheap and training tokens are not). Same
    inverted-index equi-join as decontaminate_ngram_overlap (shuffle on
    the 8-byte shingle hash, never cartesian) + one LEFT ANTI join.

    Hot-shingle df cap (r15, from the sf10 anchor): the join's cost is
    sum over shingles of df_train x df_eval, and replica boilerplate
    fattens exactly that tail — measured 164x wall-clock for 10x docs
    UNCAPPED at sf10 (702 s), the dedup_containment lesson recurring.
    Shingles held by > 100 documents are corpus boilerplate, not
    leakage evidence (the GPT-3-style decontamination convention of
    ignoring too-common n-grams), so both engines drop them BEFORE the
    join; the cap NEVER BINDS at fixture scale (max df 7 at sf0.01, 25
    at sf0.1 — driver rows unchanged) and bounds per-shingle fan-out
    at 100^2 at any scale."""
    docs = _tbl(spark, sf_dir, "documents")
    bkt = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 100
    )
    # shingles from the persisted per-content artifact (r16 — this
    # entry previously paid the tokenize+explode TWICE, once under the
    # df-cap aggregate and once under the join-back; the artifact read
    # eliminates both). bkt is a scalar md5 of doc_id, recomputed on
    # the artifact rows.
    sh0 = _cached_shingle3(spark, sf_dir).withColumn("bkt", bkt)
    # drop hot shingles by joining back the df <= 100 keys. THREE
    # formulations were measured at sf10 (r15) and this inner-join one
    # wins decisively because its s-shuffle is REUSED: the SMJ leaves
    # sh partitioned/sorted on s, so the tr x ev join below adds NO
    # second exchange. A window count over s must sort the full
    # 60M-row table INCLUDING the pre-filter hot partitions (432 s); a
    # broadcast anti-join against the tiny hot set avoids this shuffle
    # but then pays the full s-shuffle anyway inside tr x ev (352 s);
    # the join-back runs 31.7 s. The merge HINT is load-bearing (r16):
    # the shingle artifact gives Spark REAL size stats (a parquet read,
    # unlike the unestimable explode it replaced), so AQE silently
    # re-planned the join-back as a BroadcastHashJoin — the rejected
    # 352 s formulation — and the sf10 anchor read 502 s. Forcing SMJ
    # restores the shared s-exchange; sf10 re-measured 15.7 s — 2x
    # BETTER than the r15 anchor (31.7), because the artifact also
    # removed the doubled shingle derive (BASELINE.md r16).
    dfreq = sh0.groupBy("s").agg(F.count("*").alias("__df"))
    sh = sh0.join(
        dfreq.filter(F.col("__df") <= 100).hint("merge"), "s"
    ).drop("__df")
    tr = sh.filter(F.col("bkt") < 80).select(F.col("doc_id").alias("a"), "s")
    ev = sh.filter(F.col("bkt") >= 90).select(F.col("doc_id").alias("b"), "s")
    contaminated = (
        tr.join(ev, "s")
        .groupBy("a", "b")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 3)
        .select(F.col("b").alias("doc_id"))
        .distinct()
    )
    test = docs.select("doc_id", bkt.alias("bkt")).filter(
        F.col("bkt") >= 90
    )
    return (
        test.join(contaminated, "doc_id", "left_anti")
        .select("doc_id")
        .orderBy("doc_id")
    )


@register(
    "embedding_norm_outliers",
    """
    with n as (
        select vec_id,
               sqrt(list_dot_product(embedding::DOUBLE[],
                                     embedding::DOUBLE[])) as l2
        from embeddings
    ),
    q as (
        select quantile_cont(l2, 0.01) as lo, quantile_cont(l2, 0.99) as hi
        from n
    )
    select vec_id, round(l2, 6) as l2,
           (l2 < q.lo or l2 > q.hi) as is_outlier
    from n cross join q
    order by vec_id
    """,
)
def embedding_norm_outliers(spark, sf_dir):
    """Embedding-space HEALTH GATE — flag vectors whose L2 norm falls
    outside the corpus [P1, P99] band: failed or truncated encodes
    produce near-zero norms and overflow bugs produce huge ones, and
    both poison cosine-space dedup/ANN downstream (a near-zero vector is
    'similar' to everything after normalization). The embedding sibling
    of length_outlier_filter: one narrow norm projection (identical
    sqrt(dot) sequence both engines), one 1-row exact-percentile
    aggregate broadcast-attached in-plan, band compare on the RAW
    double (round 6 only on the displayed value)."""
    e = _tbl(spark, sf_dir, "embeddings")
    n = e.select("vec_id", S.l2_norm(F.col("embedding")).alias("l2"))
    q = n.agg(
        F.expr("percentile(l2, 0.01)").alias("lo"),
        F.expr("percentile(l2, 0.99)").alias("hi"),
    )
    return (
        n.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round("l2", 6).alias("l2"),
            ((F.col("l2") < F.col("lo")) | (F.col("l2") > F.col("hi"))).alias(
                "is_outlier"
            ),
        )
        .orderBy("vec_id")
    )


@register(
    "sql_identifier_clause",
    """
    select event_type, cast(count(*) as bigint) as n
    from events group by event_type order by event_type
    """,
)
def sql_identifier_clause(spark, sf_dir):
    """The IDENTIFIER(:param) clause — the injection-safe DYNAMIC TABLE
    NAME seam (sql_parameterized covers value parameters; this covers
    the object-name dimension): a multi-tenant query service routing
    the same query over per-tenant tables binds the table name as a
    parameter instead of string-splicing it, and IDENTIFIER guarantees
    the binding can only ever be a name, never an expression. The
    resolved plan is identical to the static query (the oracle)."""
    _tbl(spark, sf_dir, "events").createOrReplaceTempView("events_ident_v")
    return spark.sql(
        """
        select event_type, cast(count(*) as bigint) as n
        from IDENTIFIER(:tbl) group by event_type order by event_type
        """,
        args={"tbl": "events_ident_v"},
    )


@register(
    "tpch_refresh_functions",
    """
    with ins as (
        select o_orderkey + 10000000 as o_orderkey, o_orderpriority,
               o_totalprice
        from orders where o_orderkey % 101 = 0
    ),
    kept as (
        select o_orderkey, o_orderpriority, o_totalprice
        from orders where o_orderkey % 97 <> 0
    ),
    refreshed as (
        select * from kept union all select * from ins
    )
    select o_orderpriority,
           cast(count(*) as bigint) as n_orders,
           cast(sum(cast(o_totalprice as decimal(18,4))) as double)
               as total_price
    from refreshed
    group by o_orderpriority
    order by o_orderpriority
    """,
)
def tpch_refresh_functions(spark, sf_dir):
    """TPC-H REFRESH FUNCTIONS (RF1 insert + RF2 delete) — the half of
    the benchmark beyond the 22 queries: apply a deterministic insert
    batch (fixture-derived new orders, re-keyed into a disjoint range)
    and a delete batch (every 97th order key) to the orders snapshot,
    then prove the refreshed snapshot with a priority-level aggregate.
    The classic RF semantics are set algebra — ONE anti-join (deletes
    ship keys only) + ONE union — not a row-at-a-time maintenance loop;
    at 100 TB both batches hash-join/append against the bucketed
    snapshot without rewriting unaffected partitions (the
    upsert_day_overwrite / cdc_merge_apply machinery handles the
    on-disk form; this entry pins the REFRESH ARITHMETIC itself,
    decimal-exact)."""
    o = _tbl(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    ins = o.filter(F.col("o_orderkey") % 101 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_orderpriority",
        "o_totalprice",
    )
    deletes = o.filter(F.col("o_orderkey") % 97 == 0).select("o_orderkey")
    refreshed = o.join(deletes, "o_orderkey", "left_anti").unionByName(ins)
    from database_extractor_spark.operators.relational import exact_sum

    return (
        refreshed.groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            exact_sum("o_totalprice", "total_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "order_to_ship_latency",
    """
    with lat as (
        select l.l_returnflag,
               date_diff('day', o.o_orderdate, l.l_shipdate) as days
        from lineitem l join orders o on l.l_orderkey = o.o_orderkey
    )
    select l_returnflag,
           cast(count(*) as bigint) as n_lines,
           quantile_cont(cast(days as double), 0.50) as p50_days,
           quantile_cont(cast(days as double), 0.90) as p90_days,
           cast(max(days) as bigint) as max_days
    from lat group by l_returnflag order by l_returnflag
    """,
)
def order_to_ship_latency(spark, sf_dir):
    """Order-to-ship FULFILLMENT latency — days from order placement to
    line shipment, summarized per return flag as p50/p90/max: the
    supply-chain SLA report (funnel_latency_percentiles is the
    clickstream twin; this is the warehouse-side one, and the returned
    flag split shows whether slow fulfillment correlates with returns).
    One fact-to-fact equi-join on the natural key (at 100 TB both
    sides bucket on orderkey — the bucketed_join_colocated layout makes
    this exchange-free), integer day arithmetic, one exact-percentile
    aggregate per flag (the pinned p*(n-1) convention)."""
    li = _tbl(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_shipdate"
    )
    o = _tbl(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lat = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_returnflag",
        F.datediff(
            F.to_date("l_shipdate"), F.to_date("o_orderdate")
        ).alias("days"),
    )
    return (
        lat.groupBy("l_returnflag")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.expr("percentile(cast(days as double), 0.50)").alias(
                "p50_days"
            ),
            F.expr("percentile(cast(days as double), 0.90)").alias(
                "p90_days"
            ),
            F.max("days").cast("bigint").alias("max_days"),
        )
        .orderBy("l_returnflag")
    )


# ==========================================================================
# Round 14: incremental view maintenance, inverted-index postings
# ==========================================================================


@register(
    "incremental_agg_maintenance",
    """
    select event_type,
           cast(count(*) as bigint) as n_events,
           cast(sum(cast(value as decimal(18,6))) as double) as sum_val
    from events
    where ts < timestamp '2024-01-26'
    group by event_type
    order by event_type
    """,
)
def incremental_agg_maintenance(spark, sf_dir):
    """INCREMENTAL AGGREGATE MAINTENANCE — the materialized-view delta
    merge that keeps a 100 TB rollup fresh without rescanning history:
    the running aggregate is stored as MERGEABLE PARTIAL STATE (per
    (event_type, day): count + decimal sum — both associative), and a
    new day folds in by aggregating ONLY the delta partition and
    re-aggregating partials. History cost is |groups| snapshot rows,
    not |events| history rows; the events scan in the merged plan
    carries the delta's day bound as a pushed filter (plan-pinned in
    tests — the proof nothing re-reads the old days). Exactness: counts
    merge as bigint sums, value sums stay decimal(18,6) through the
    snapshot parquet and the merge, cast to double only at the edge —
    so merge(partials) is bit-identical to the oracle's full recompute.
    The same shape maintains daily rollups under streaming_merge_upsert
    semantics; time_hierarchy_rollup is the BATCH form of this state."""
    ev = _tbl(spark, sf_dir, "events")
    cutoff, delta_end = "2024-01-25", "2024-01-26"
    partials = lambda df: (  # noqa: E731 — local plan shape, not an API
        df.groupBy("event_type", F.to_date("ts").alias("day")).agg(
            F.count("*").cast("bigint").alias("pn"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("psum"),
        )
    )
    snap_path = os.path.join(_stream_tmpdir("ivm_"), "snapshot")
    partials(
        ev.filter(F.col("ts") < F.lit(cutoff).cast("timestamp"))
    ).write.mode("overwrite").parquet(snap_path)
    delta = partials(
        ev.filter(
            (F.col("ts") >= F.lit(cutoff).cast("timestamp"))
            & (F.col("ts") < F.lit(delta_end).cast("timestamp"))
        )
    )
    snap = spark.read.parquet(snap_path)
    return (
        snap.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("pn").cast("bigint").alias("n_events"),
            F.sum("psum").cast("double").alias("sum_val"),
        )
        .orderBy("event_type")
    )


@register(
    "inverted_index_postings",
    r"""
    with toks as (
        select doc_id,
               unnest(string_split_regex(trim(text), '\s+')) as term,
               generate_subscripts(string_split_regex(trim(text), '\s+'), 1)
                   - 1 as pos
        from documents
        where text is not null and len(trim(text)) > 0
    ),
    posting as (
        select term, doc_id,
               cast(count(*) as bigint) as tf,
               string_agg(cast(pos as varchar), ',' order by pos)
                   as positions
        from toks group by term, doc_id
    ),
    dfreq as (
        select term, cast(count(*) as bigint) as df from posting group by term
    )
    select p.term, p.doc_id, p.tf, p.positions
    from posting p join dfreq using (term)
    where df between 2 and 50
    order by term, doc_id
    """,
)
def inverted_index_postings(spark, sf_dir):
    """INVERTED-INDEX POSTINGS BUILD — the (term -> doc, positions)
    table behind phrase search, span-level decontamination and BM25
    serving, materialized as a first-class data product: one
    posexplode pass, one (term, doc) aggregate collecting the ORDERED
    position list (sort_array over collect_list — deterministic
    regardless of shuffle arrival order, then joined to a ','-string:
    the driver's pandas canonicalizer cannot hash ARRAY cells —
    CORRECTNESS_r15's one red row — so the postings ship in the
    delimited encoding a real index segment file uses anyway; guarded
    registry-wide by tests/test_plan_lint.py's no-complex-output-
    columns check), and a document-frequency gate
    2 <= df <= 50 that drops hapax terms (index noise) AND stopword-
    grade terms whose posting lists grow with the corpus — the
    unbounded-posting hazard at 100 TB (the df-cap discipline of
    dedup_containment_capped; a production index shards those terms or
    tiers them into a separate stopword index). Both aggregates shuffle
    on term, so the df gate and the postings join co-locate without a
    second exchange. Positions are 0-based on both engines (DuckDB
    generate_subscripts is 1-based, normalized in the oracle)."""
    docs = _tbl(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length(F.trim("text")) > 0)
    )
    toks = docs.select(
        "doc_id",
        F.posexplode(T.tokens(F.col("text"))).alias("pos", "term"),
    )
    posting = toks.groupBy("term", "doc_id").agg(
        F.count("*").cast("bigint").alias("tf"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.col("pos").cast("bigint"))),
                lambda p: p.cast("string"),
            ),
            ",",
        ).alias("positions"),
    )
    dfreq = (
        posting.groupBy("term")
        .agg(F.count("*").cast("bigint").alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= 50))
    )
    return (
        posting.join(dfreq.select("term"), "term")
        .select("term", "doc_id", "tf", "positions")
        .orderBy("term", "doc_id")
    )


@register(
    "corpus_snapshot_diff",
    """
    with a as (select doc_id, md5(coalesce(text, '')) as h from documents),
    b_kept as (
        select doc_id,
               md5(coalesce(text, '')
                   || case when doc_id % 11 = 5 then ' rev2' else '' end) as h
        from documents where doc_id % 7 <> 3
    ),
    b_new as (
        select doc_id + 1000000 as doc_id, md5(coalesce(text, '')) as h
        from documents where doc_id % 13 = 8
    ),
    b as (select * from b_kept union all select * from b_new)
    select coalesce(a.doc_id, b.doc_id) as doc_id,
           case when a.doc_id is null then 'added'
                when b.doc_id is null then 'removed'
                else 'changed' end as status
    from a full outer join b on a.doc_id = b.doc_id
    where a.doc_id is null or b.doc_id is null or a.h <> b.h
    order by doc_id
    """,
)
def corpus_snapshot_diff(spark, sf_dir):
    """SNAPSHOT DIFF / CDC EXTRACTION — the inverse of cdc_merge_apply:
    given two corpus releases, DERIVE the change feed (added / removed /
    changed by content hash) that merge would need to turn A into B.
    This is corpus release management at 100 TB: one full-outer
    shuffle join of two (doc_id, md5(text)) projections — 16-byte-hash
    rows, never the text — emitting ONLY the delta (unchanged rows,
    the overwhelming majority of a release, are filtered before
    anything downstream sees them). Snapshot B is synthesized in-plan
    from the same table by a deterministic evolution (every 7th doc
    removed, every 11th revised, every 13th re-keyed as an addition)
    so the oracle replays it exactly; in production the two sides are
    two parquet roots and the plan is unchanged. Content equality is
    md5 — portable across engines and cheap to bucket the join on."""
    docs = _tbl(spark, sf_dir, "documents")
    a = docs.select(
        "doc_id", F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("h")
    )
    b_kept = docs.filter(F.col("doc_id") % 7 != 3).select(
        "doc_id",
        F.md5(
            F.concat(
                F.coalesce(F.col("text"), F.lit("")),
                F.when(F.col("doc_id") % 11 == 5, F.lit(" rev2")).otherwise(
                    F.lit("")
                ),
            )
        ).alias("h"),
    )
    b_new = docs.filter(F.col("doc_id") % 13 == 8).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("h"),
    )
    b = b_kept.unionByName(b_new)
    j = a.alias("a").join(
        b.alias("b"), F.col("a.doc_id") == F.col("b.doc_id"), "full_outer"
    )
    return (
        j.filter(
            F.col("a.doc_id").isNull()
            | F.col("b.doc_id").isNull()
            | (F.col("a.h") != F.col("b.h"))
        )
        .select(
            F.coalesce(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_id"),
            F.when(F.col("a.doc_id").isNull(), F.lit("added"))
            .when(F.col("b.doc_id").isNull(), F.lit("removed"))
            .otherwise(F.lit("changed"))
            .alias("status"),
        )
        .orderBy("doc_id")
    )


@register(
    "sql_unpivot_clause",
    """
    with w as (
        select o_orderpriority,
               cast(count(case when o_orderstatus = 'F' then 1 end)
                    as bigint) as n_f,
               cast(count(case when o_orderstatus = 'O' then 1 end)
                    as bigint) as n_o,
               cast(count(case when o_orderstatus = 'P' then 1 end)
                    as bigint) as n_p
        from orders group by o_orderpriority
    )
    select o_orderpriority, status, n from (
        select o_orderpriority, 'n_f' as status, n_f as n from w
        union all select o_orderpriority, 'n_o', n_o from w
        union all select o_orderpriority, 'n_p', n_p from w
    )
    order by o_orderpriority, status
    """,
)
def sql_unpivot_clause(spark, sf_dir):
    """The SQL UNPIVOT front end — the wide->long sibling of
    sql_pivot_clause, completing the PIVOT/UNPIVOT pair at the SQL
    surface: a per-priority status-count matrix folds back to
    (priority, status, n) rows through the standard `UNPIVOT (n FOR
    status IN (...))` clause, which Catalyst lowers to the same Expand
    projection the DataFrame melt/unpivot API produces — one pass, no
    join, row count = rows x |listed columns|. Spark's UNPIVOT drops
    NULL measure values by default; these counts are never NULL (the
    CASE-count form yields 0), so both engines see all 15 rows. The
    oracle states the clause's exact union-all semantics."""
    _tbl(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_unpivot_v"
    )
    return spark.sql(
        """
        with w as (
            select o_orderpriority,
                   cast(count(case when o_orderstatus = 'F' then 1 end)
                        as bigint) as n_f,
                   cast(count(case when o_orderstatus = 'O' then 1 end)
                        as bigint) as n_o,
                   cast(count(case when o_orderstatus = 'P' then 1 end)
                        as bigint) as n_p
            from orders_unpivot_v group by o_orderpriority
        )
        select o_orderpriority, status, n
        from w unpivot (n for status in (n_f, n_o, n_p))
        order by o_orderpriority, status
        """
    )


@register(
    "length_bucket_batching",
    r"""
    with toks as (
        select doc_id,
               cast(len(string_split_regex(trim(text), '\s+')) as bigint)
                   as n_tokens
        from documents
        where text is not null and len(trim(text)) > 0
    ),
    bucketed as (
        select doc_id, n_tokens,
               case when n_tokens <= 16 then 16
                    when n_tokens <= 32 then 32
                    when n_tokens <= 64 then 64
                    when n_tokens <= 128 then 128
                    when n_tokens <= 256 then 256
                    when n_tokens <= 512 then 512
                    else 1024 end as bucket_len
        from toks
    )
    select bucket_len,
           cast(count(*) as bigint) as n_docs,
           cast(sum(n_tokens) as bigint) as sum_tokens,
           cast(count(*) * bucket_len as bigint) as padded_tokens,
           cast((count(*) * bucket_len - sum(n_tokens)) * 1000000
                // (count(*) * bucket_len) as bigint) as waste_ppm
    from bucketed
    group by bucket_len
    order by bucket_len
    """,
)
def length_bucket_batching(spark, sf_dir):
    """LENGTH-BUCKETED BATCHING — the OTHER standard training-batch
    strategy next to first-fit packing (pack_sequences): instead of
    concatenating documents into full windows, group similar-length
    documents into fixed bucket sizes (16/32/.../512/1024 tokens) and
    pad each to its bucket — simpler serving (no attention-mask
    surgery across document boundaries) at the cost of padding waste.
    This entry produces the decision table: per bucket, document count,
    real tokens, padded tokens, and waste in EXACT integer ppm
    ((padded - real) * 1e6 div padded — no float division, so the
    ranking against pack_efficiency_eval's packing efficiency is
    engine-exact). One narrow scan + one 7-group aggregate: the
    strategy chooser costs nothing at any scale, which is the point —
    run both evals, pick per corpus. The bucket menu is a fixed CASE
    ladder (not log2 float math) so boundary docs land identically on
    both engines."""
    docs = _tbl(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length(F.trim("text")) > 0)
    )
    n_tok = F.size(T.tokens(F.col("text"))).cast("bigint")
    bucket = (
        F.when(n_tok <= 16, 16)
        .when(n_tok <= 32, 32)
        .when(n_tok <= 64, 64)
        .when(n_tok <= 128, 128)
        .when(n_tok <= 256, 256)
        .when(n_tok <= 512, 512)
        .otherwise(1024)
    ).cast("bigint")
    b = docs.select(n_tok.alias("n_tokens"), bucket.alias("bucket_len"))
    cnt, tot = F.count("*").cast("bigint"), F.sum("n_tokens").cast("bigint")
    return (
        b.groupBy("bucket_len")
        .agg(
            cnt.alias("n_docs"),
            tot.alias("sum_tokens"),
            (cnt * F.col("bucket_len")).cast("bigint").alias("padded_tokens"),
            F.expr(
                "(count(*) * bucket_len - sum(n_tokens)) * 1000000L"
                " div (count(*) * bucket_len)"
            )
            .cast("bigint")
            .alias("waste_ppm"),
        )
        .orderBy("bucket_len")
    )


@register(
    "k_anonymity_audit",
    """
    select c_nationkey, c_mktsegment,
           cast(count(*) as bigint) as n,
           count(*) >= 5 as meets_k
    from customer
    group by c_nationkey, c_mktsegment
    order by c_nationkey, c_mktsegment
    """,
)
def k_anonymity_audit(spark, sf_dir):
    """K-ANONYMITY AUDIT — the privacy gate before a data release: for
    the chosen quasi-identifier tuple (nation, market segment), every
    equivalence class smaller than k=5 is a re-identification risk and
    must be generalized (coarsen the quasi-identifier) or suppressed
    before the release ships. The other half of the privacy lane next
    to text_pii_scrub: scrubbing removes DIRECT identifiers, this
    audits the INDIRECT ones. One map-side-combinable aggregate over
    the quasi-identifier key — at 100 TB the audit costs one shuffle of
    |classes| partial rows, and the failing classes (the actionable
    output) are typically a tiny fraction. The flag threshold is an
    integer count compare — no FP boundary."""
    c = _tbl(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").cast("bigint").alias("n"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "n",
            (F.col("n") >= 5).alias("meets_k"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


@register(
    "l_diversity_audit",
    """
    with g as (
        select c_nationkey,
               case when c_acctbal < 0 then 'negative'
                    when c_acctbal < 1000 then 'low'
                    when c_acctbal < 5000 then 'mid'
                    else 'high' end as bal_band,
               c_mktsegment
        from customer
    ),
    cls as (
        select c_nationkey, bal_band,
               cast(count(*) as bigint) as n,
               cast(count(distinct c_mktsegment) as bigint) as l
        from g group by c_nationkey, bal_band
    )
    select c_nationkey, bal_band, n, l, l >= 3 as meets_l
    from cls
    order by c_nationkey, bal_band
    """,
)
def l_diversity_audit(spark, sf_dir):
    """L-DIVERSITY AUDIT — the privacy property k-anonymity cannot see
    (distinct capability vs k_anonymity_audit: k bounds CLASS SIZE, l
    bounds the SENSITIVE-VALUE variety inside a class — a 1000-row
    class where everyone shares one market segment passes any k yet
    leaks the sensitive attribute for every member; Machanavajjhala
    et al. 2007, public). Quasi-identifier = (nation, account-balance
    band — the same banding column_masking_view generalizes to);
    sensitive attribute = market segment; each equivalence class
    reports its size AND its distinct-sensitive count l, flagged
    against l >= 3. Plan: one map-side-combinable aggregate with a
    count(distinct) over the class key — at 100 TB this is one
    shuffle of (class, segment) partials, the same cost shape as the
    k-audit plus the distinct's dedup. Integer compares only — no FP
    boundary. Band edges are exact double compares (the
    column_masking_view discipline: fixture balances are 2-dp values
    away from the thresholds)."""
    c = _tbl(spark, sf_dir, "customer")
    band = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 1000, "low")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
    )
    cls = (
        c.select("c_nationkey", band.alias("bal_band"), "c_mktsegment")
        .groupBy("c_nationkey", "bal_band")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.countDistinct("c_mktsegment").cast("bigint").alias("l"),
        )
    )
    return cls.select(
        "c_nationkey",
        "bal_band",
        "n",
        "l",
        (F.col("l") >= 3).alias("meets_l"),
    ).orderBy("c_nationkey", "bal_band")


@register(
    "hll_intersection_estimate",
    """
    with a as (select distinct user_id from events
               where cast(ts as date) = date '2024-01-05'),
    b as (select distinct user_id from events
          where cast(ts as date) = date '2024-01-06'),
    u as (select user_id from a union select user_id from b)
    select cast((select count(*) from a) as bigint) as est_a,
           cast((select count(*) from b) as bigint) as est_b,
           cast((select count(*) from u) as bigint) as est_union,
           cast((select count(*) from a) + (select count(*) from b)
                - (select count(*) from u) as bigint) as est_intersection
    """,
)
def hll_intersection_estimate(spark, sf_dir):
    """SKETCH ALGEBRA: distinct-set INTERSECTION via inclusion-
    exclusion over HLL sketches — |A∩B| = est(A) + est(B) - est(A∪B).
    HLL unions losslessly (hll_sketch_union_distinct) but cannot
    intersect directly; inclusion-exclusion is the standard workaround
    for audience-overlap questions (users active on BOTH days) when
    only per-slice sketches are retained. Both day sketches build in
    ONE pass over the two-day scan (FILTER-ed hll_sketch_agg — no
    second job), the union is a driver-free hll_union of the two
    sketch values, and day-partition pruning reaches the scan. Exact
    regime: lgConfigK=14 against the fixture's ~1e3 user cardinality
    makes every estimate exact, so the oracle is the exact set
    arithmetic (the approx_distinct discipline); at production
    cardinalities the docstring caveat applies — inclusion-exclusion
    COMPOUNDS the ~1.6%/sqrt(2^lgK) relative error and can go negative
    for near-disjoint sets; clamp and size lgK for the smallest set,
    or keep exact bitmap lanes for small-k intersections."""
    ev = _tbl(spark, sf_dir, "events").filter(
        (F.to_date("ts") >= F.lit("2024-01-05"))
        & (F.to_date("ts") <= F.lit("2024-01-06"))
    )
    day = F.to_date("ts")
    sk = ev.agg(
        F.expr(
            "hll_sketch_agg(user_id, 14)"
            " filter (where cast(ts as date) = date '2024-01-05')"
        ).alias("sk_a"),
        F.expr(
            "hll_sketch_agg(user_id, 14)"
            " filter (where cast(ts as date) = date '2024-01-06')"
        ).alias("sk_b"),
    )
    return sk.select(
        F.expr("cast(hll_sketch_estimate(sk_a) as bigint)").alias("est_a"),
        F.expr("cast(hll_sketch_estimate(sk_b) as bigint)").alias("est_b"),
        F.expr(
            "cast(hll_sketch_estimate(hll_union(sk_a, sk_b)) as bigint)"
        ).alias("est_union"),
        F.expr(
            "cast(hll_sketch_estimate(sk_a) + hll_sketch_estimate(sk_b)"
            " - hll_sketch_estimate(hll_union(sk_a, sk_b)) as bigint)"
        ).alias("est_intersection"),
    )


@register(
    "join_skew_diagnostic",
    """
    with k as (
        select l_orderkey, cast(count(*) as bigint) as fanout
        from lineitem group by l_orderkey
    )
    select cast(count(*) as bigint) as n_keys,
           cast(sum(fanout) as bigint) as n_rows,
           cast(max(fanout) as bigint) as max_fanout,
           cast(quantile_cont(fanout, 0.99) as double) as p99_fanout,
           cast(quantile_cont(fanout, 0.50) as double) as p50_fanout,
           cast(max(fanout) * 1000000 * count(*) // sum(fanout)
                as bigint) as skew_ratio_ppm
    from k
    """,
)
def join_skew_diagnostic(spark, sf_dir):
    """PRE-JOIN SKEW DIAGNOSTIC — the measurement that picks a lane
    from the skew playbook BEFORE the join runs: the fact side's
    per-key fanout distribution (count, max, exact p50/p99) plus
    max/mean in exact integer ppm. Read it against session.
    SKEW_PROFILES: max_fanout ~ p99 means uniform keys (plain join);
    max_fanout >> p99 with narrow rows is exactly the skew that hides
    under AQE's 256 MB byte threshold (use the measured "aqe-tuned"
    profile or relational.salted_join). Cost: one map-side-combinable
    count per key + one |keys|-row percentile aggregate — at 100 TB
    this is the cheap scan you run once per (table, key) and cache in
    table metadata, the same place NDV stats live. Exactness: fanouts
    are integers; quantile_cont interpolation runs the identical IEEE
    sequence on both engines (the percentile_agg discipline); the
    ratio is integer div."""
    li = _tbl(spark, sf_dir, "lineitem")
    k = li.groupBy("l_orderkey").agg(
        F.count("*").cast("bigint").alias("fanout")
    )
    return k.agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum("fanout").cast("bigint").alias("n_rows"),
        F.max("fanout").cast("bigint").alias("max_fanout"),
        F.expr("percentile(fanout, 0.99)").alias("p99_fanout"),
        F.expr("percentile(fanout, 0.50)").alias("p50_fanout"),
        F.expr(
            "cast(max(fanout) * 1000000L * count(*)"
            " div sum(fanout) as bigint)"
        ).alias("skew_ratio_ppm"),
    )


@register(
    "mutual_nearest_neighbors",
    """
    with a as (select vec_id as a_id, label,
                      embedding::DOUBLE[] as av
               from embeddings where vec_id % 2 = 0),
    b as (select vec_id as b_id, label,
                 embedding::DOUBLE[] as bv
          from embeddings where vec_id % 2 = 1),
    pairs as (
        -- zero-norm guard: cosine vs a zero vector is 0.0 on both
        -- engines (degenerate audit r15; DuckDB /0 is NULL otherwise)
        select a_id, b_id,
               round(case when sqrt(list_dot_product(av, av))
                               * sqrt(list_dot_product(bv, bv)) = 0
                          then 0.0
                          else list_dot_product(av, bv)
                               / (sqrt(list_dot_product(av, av))
                                  * sqrt(list_dot_product(bv, bv))) end,
                     6) as cos
        from a join b using (label)
    ),
    na as (select a_id, b_id, cos,
                  row_number() over (partition by a_id
                                     order by cos desc, b_id) as ra
           from pairs),
    nb as (select a_id, b_id,
                  row_number() over (partition by b_id
                                     order by cos desc, a_id) as rb
           from pairs)
    select na.a_id, na.b_id, na.cos
    from na join nb on na.a_id = nb.a_id and na.b_id = nb.b_id
    where na.ra = 1 and nb.rb = 1
    order by na.a_id
    """,
)
def mutual_nearest_neighbors(spark, sf_dir):
    """MUTUAL NEAREST NEIGHBORS — the bitext/alignment-mining
    primitive (LASER/CCMatrix-style margin mining's core step): pair
    two corpus sides and keep only pairs where each is the OTHER's
    top-1 by cosine — the reciprocal check that kills the hubness
    false-positives a one-directional top-1 produces. Sides here are
    the even/odd vec_id halves; candidate pairs are bounded by the
    LABEL equi-join (the coarse-quantizer-bucket discipline of
    sim_ivf_* — at 100 TB the label is the IVF cell assignment, so
    pair volume is sum of per-cell |A_c| x |B_c|, never |A| x |B|;
    and because within-cell work is quadratic in CELL size, the cell
    count must GROW with the corpus — c ∝ N cells of bounded size keep
    total pair volume ∝ N, the auto_n_lists sizing rule's exact
    argument. The fixture's 4 fixed labels give ~130x work at 10x data
    — measured at sf1 and recorded in BASELINE.md as the motivation
    for that rule, not as this plan's scale posture). Per-side L2
    norms are computed ONCE in the side projections and reused across
    every pair (the cosine helper's three folds per pair collapse to
    one dot fold — same IEEE values, hoisted). Two partitioned windows
    (by a_id, by b_id) extract each side's top-1 with deterministic id
    tie-break; the mutual filter is one equi-join of the two rank-1
    sets. Cosine doubles run the identical IEEE sequence on both
    engines, so ranks agree exactly."""
    e = _tbl(spark, sf_dir, "embeddings")
    a = e.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("a_id"),
        "label",
        F.col("embedding").alias("av"),
        S.l2_norm(F.col("embedding")).alias("an"),
    )
    b = e.filter(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("b_id"),
        F.col("label").alias("label_b"),
        F.col("embedding").alias("bv"),
        S.l2_norm(F.col("embedding")).alias("bn"),
    )
    denom = F.col("an") * F.col("bn")
    cos = F.when(denom == 0, F.lit(0.0)).otherwise(
        S.dot(F.col("av"), F.col("bv")) / denom
    )
    pairs = a.join(b, F.col("label") == F.col("label_b")).select(
        "a_id", "b_id", F.round(cos, 6).alias("cos")
    )
    wa = Window.partitionBy("a_id").orderBy(F.desc("cos"), "b_id")
    wb = Window.partitionBy("b_id").orderBy(F.desc("cos"), "a_id")
    na = pairs.withColumn("ra", F.row_number().over(wa)).filter("ra = 1")
    nb = pairs.withColumn("rb", F.row_number().over(wb)).filter("rb = 1")
    return (
        na.select("a_id", "b_id", "cos")
        .join(nb.select("a_id", "b_id"), ["a_id", "b_id"])
        .orderBy("a_id")
    )


@register(
    "event_debounce",
    """
    with g as (
        select event_type, value,
               epoch_us(ts) - lag(epoch_us(ts)) over (
                   partition by user_id, event_type
                   order by ts, event_id) as gap_us
        from events
    )
    select event_type,
           cast(count(*) as bigint) as n_total,
           cast(sum(case when gap_us is null or gap_us > 86400000000
                         then 1 else 0 end) as bigint) as n_kept,
           cast(sum(case when gap_us is not null
                          and gap_us <= 86400000000
                         then 1 else 0 end) as bigint) as n_debounced
    from g
    group by event_type
    order by event_type
    """,
)
def event_debounce(spark, sf_dir):
    """EVENT DEBOUNCING — the telemetry pre-aggregation filter: a
    repeat of the same (user, event_type) within the debounce window
    (1 day here) is noise (double-clicks, retry storms, duplicate
    beacons) and is dropped before counting. One (user, type)-keyed
    window computes the gap to the previous occurrence in EXACT epoch
    micros (integer compare against the window, no timestamp
    arithmetic in doubles); the first occurrence per key always
    survives (NULL gap). Distinct from dropDuplicates (exact-key
    dedup, no time dimension) and from session_windows (which GROUPS
    by gaps; debounce FILTERS by them). At 100 TB: one hash exchange
    on (user_id, event_type) shared by the lag and the rollup — the
    same shape as interval_coalesce."""
    ev = _tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    g = ev.select(
        "event_type",
        (ts_us - F.lag(ts_us).over(w)).alias("gap_us"),
    )
    window_us = 86400000000  # 1 day
    kept = F.col("gap_us").isNull() | (F.col("gap_us") > window_us)
    return (
        g.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_total"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_kept"),
            F.sum(F.when(~kept, 1).otherwise(0))
            .cast("bigint")
            .alias("n_debounced"),
        )
        .orderBy("event_type")
    )


@register(
    "backfill_todo_ledger",
    """
    with inp as (
        select cast(ts as date) as day,
               cast(count(*) as bigint) as n_input
        from events group by 1
    ),
    outp as (
        select cast(ts as date) as day,
               cast(count(*) filter (where cast(ts as date) < date '2024-01-16'
                                        or event_id % 13 <> 0)
                    as bigint) as n_output
        from events
        where cast(ts as date) <= date '2024-01-20'
        group by 1
    )
    select i.day,
           case when o.day is null then 'todo'
                when o.n_output <> i.n_input then 'stale'
                else 'done' end as status,
           i.n_input,
           o.n_output
    from inp i left join outp o on i.day = o.day
    order by i.day
    """,
)
def backfill_todo_ledger(spark, sf_dir):
    """BACKFILL TODO LEDGER — the bookkeeping half of the reference's
    per-day batch loop (extract.query_data_for_range processes days;
    THIS decides which days): reconcile the input lake against the
    processed-output lake and emit per-day status — 'todo' (no output
    exists), 'stale' (output exists but its row count no longer matches
    the input — late-arriving data landed after processing), 'done'.
    The entry runs the REAL mechanics: per-day output aggregates are
    WRITTEN to a parquet lake in-plan (days through Jan 20; days from
    Jan 16 deliberately processed from an input snapshot missing the
    event_id%13 rows, simulating late arrivals), read back, and
    LEFT-joined to the per-day input counts — a |days|-row join, never
    a row-level diff. At 100 TB this ledger is the idempotent-rerun
    driver: both sides are day-grain aggregates (map-side combinable),
    the join is broadcast-sized, and the 'stale' test is an exact
    bigint compare. The oracle replays the snapshot rule arithmetically
    (no lake needed — output counts are a deterministic function of the
    input)."""
    ev = _tbl(spark, sf_dir, "events")
    day = F.to_date("ts")
    inp = ev.groupBy(day.alias("day")).agg(
        F.count("*").cast("bigint").alias("n_input")
    )
    cutoff, late_from = "2024-01-20", "2024-01-16"
    processed = ev.filter(day <= F.lit(cutoff)).filter(
        (day < F.lit(late_from)) | (F.col("event_id") % 13 != 0)
    )
    lake = os.path.join(_stream_tmpdir("ledger_"), "daily_outputs")
    processed.groupBy(day.alias("day")).agg(
        F.count("*").cast("bigint").alias("n_output")
    ).write.mode("overwrite").parquet(lake)
    outp = spark.read.parquet(lake)
    j = inp.join(outp, "day", "left")
    return j.select(
        "day",
        F.when(F.col("n_output").isNull(), F.lit("todo"))
        .when(F.col("n_output") != F.col("n_input"), F.lit("stale"))
        .otherwise(F.lit("done"))
        .alias("status"),
        "n_input",
        "n_output",
    ).orderBy("day")


#: shared windowed Rabin-style hash (window 8, base 31, exact bigint —
#: max value 128*31^7 < 2^42, no modular reduction needed) and the
#: boundary rule (hash % 64 == 0): IDENTICAL expression text on both
#: engines, so boundaries agree bit-exactly.
_CDC_HASH = (
    "(cast(ascii(substring(text, i, 1)) as bigint)"
    " + cast(ascii(substring(text, i-1, 1)) as bigint) * 31"
    " + cast(ascii(substring(text, i-2, 1)) as bigint) * 961"
    " + cast(ascii(substring(text, i-3, 1)) as bigint) * 29791"
    " + cast(ascii(substring(text, i-4, 1)) as bigint) * 923521"
    " + cast(ascii(substring(text, i-5, 1)) as bigint) * 28629151"
    " + cast(ascii(substring(text, i-6, 1)) as bigint) * 887503681"
    " + cast(ascii(substring(text, i-7, 1)) as bigint) * 27512614111)"
    " % 64 = 0"
)


@register(
    "content_defined_chunks",
    f"""
    with d as (
        select doc_id, text,
               list_filter(range(8, len(text) + 1), i -> {_CDC_HASH})
                   as bnds
        from documents where text is not null and len(text) >= 1
    ),
    subs as (
        select doc_id,
               list_filter(
                   list_transform(range(1, len(bnds) + 2), k ->
                       substring(text,
                           case when k = 1 then 1
                                else bnds[k - 1] + 1 end,
                           (case when k = len(bnds) + 1 then len(text)
                                 else bnds[k] end)
                           - (case when k = 1 then 1
                                   else bnds[k - 1] + 1 end) + 1)),
                   s -> len(s) > 0) as chunks
        from d
    ),
    ch as (select doc_id, md5(unnest(chunks)) as h from subs)
    select cast(count(distinct doc_id) as bigint) as n_docs,
           cast(count(*) as bigint) as n_chunks,
           cast(count(distinct h) as bigint) as n_distinct_chunks,
           cast(count(*) - count(distinct h) as bigint) as dup_chunks,
           cast((count(*) - count(distinct h)) * 1000000 // count(*)
                as bigint) as dup_ppm
    from ch
    """,
)
def content_defined_chunks(spark, sf_dir):
    """CONTENT-DEFINED CHUNKING (CDC) — the storage-dedup primitive
    behind rsync/restic/LBFS-style incremental transfer and chunk-level
    corpus dedup: cut boundaries where a WINDOWED ROLLING HASH of the
    last 8 characters hits a target residue (64-way -> ~64-char
    expected chunks), so boundaries are a function of LOCAL CONTENT.
    Insert one character and fixed-grid chunking (text_chunking)
    re-keys every downstream chunk; CDC re-keys only the chunk
    containing the edit — the shift-invariance pytest pins exactly
    that. Everything is JVM-side higher-order functions: one
    filter(sequence) computes boundary positions (the 8-term windowed
    hash is EXACT bigint arithmetic — max 128*31^7 < 2^42, no modular
    reduction, so both engines agree bit-exactly), one transform
    slices the chunks, md5 fingerprints them, and a corpus aggregate
    reports total vs distinct chunk hashes with the duplicate ratio in
    exact integer ppm. No Python, no shuffle before the final
    aggregate; per-row cost is O(8n) character probes. At 100 TB the
    chunk-hash table IS the dedup index: new data uploads only chunks
    whose md5 is unseen (the backup-tool economics), and boilerplate
    shared across documents surfaces as dup_chunks without any
    pairwise comparison. Parallelism note: the probe pass is
    COMPUTE-heavy per input byte, so a sub-split-sized input (one
    small parquet file = ONE task) must be repartitioned first or it
    runs on one core — measured 12.06 -> ~1 s at sf0.1 (a single
    580 KiB file) from this one repartition; at real scale the input's
    own splits provide the parallelism and AQE coalescing absorbs any
    excess partitions."""
    docs = (
        _tbl(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.length("text") >= 1))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    bnds = F.expr(
        "case when length(text) >= 8 then"
        f" filter(sequence(8, length(text)), i -> {_CDC_HASH})"
        " else cast(array() as array<int>) end"
    )
    d = docs.select("doc_id", "text", bnds.alias("bnds"))
    subs = F.expr(
        "filter(transform(sequence(1, size(bnds) + 1), k ->"
        " substring(text,"
        "   case when k = 1 then 1 else element_at(bnds, k - 1) + 1 end,"
        "   (case when k = size(bnds) + 1 then length(text)"
        "         else element_at(bnds, k) end)"
        "   - (case when k = 1 then 1"
        "           else element_at(bnds, k - 1) + 1 end) + 1)),"
        " s -> length(s) > 0)"
    )
    ch = d.select(
        "doc_id", F.explode(subs).alias("chunk")
    ).select("doc_id", F.md5("chunk").alias("h"))
    return ch.agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("n_chunks"),
        F.countDistinct("h").cast("bigint").alias("n_distinct_chunks"),
        (F.count("*") - F.countDistinct("h"))
        .cast("bigint")
        .alias("dup_chunks"),
        F.expr(
            "cast((count(*) - count(distinct h)) * 1000000L"
            " div count(*) as bigint)"
        ).alias("dup_ppm"),
    )

@register(
    "multi_touch_attribution_linear",
    """
    with p as (
        select event_id as p_id, user_id, ts as p_ts
        from events where event_type = 'purchase'
    ),
    t as (
        select user_id, ts as t_ts, event_type as channel
        from events where event_type <> 'purchase'
    ),
    d as (
        select distinct p.p_id, t.channel
        from p join t on p.user_id = t.user_id
         and t.t_ts >= p.p_ts - interval 3 day and t.t_ts < p.p_ts
    ),
    k as (select p_id, cast(count(*) as bigint) as k from d group by p_id)
    select d.channel,
           cast(count(*) as bigint) as n_conversions,
           cast(sum(1000 // k.k) as bigint) as credit_milli
    from d join k on d.p_id = k.p_id
    group by d.channel
    order by d.channel
    """,
)
def multi_touch_attribution_linear(spark, sf_dir):
    """LINEAR MULTI-TOUCH ATTRIBUTION — the fractional-credit
    counterpart of attribution_last_touch (which awards each
    conversion to ONE channel): every distinct channel the user
    touched in the 3 days before a purchase shares the conversion's
    credit equally. Credit is integer MILLI-UNITS via 1000 div k
    (truncating integer division — identical on both engines), so the
    per-channel rollup is an exact bigint sum with NO order-dependent
    FP accumulation; the deliberate <=999/1000 truncation remainder is
    documented, not redistributed. Plan: purchases equi-join touches
    on user_id with the half-open 3-day range as a post-join filter
    (fan-out bounded by per-user event rate x window, the
    funnel_latency shape), distinct to (purchase, channel), one
    |purchases|-row count for k, one broadcast-sized rollup. At
    100 TB: the only exchange is the user_id hash both sides already
    share; k and the credit join stay on the purchase key."""
    ev = _tbl(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        ts.alias("p_ts"),
    )
    t = ev.filter(F.col("event_type") != "purchase").select(
        "user_id",
        ts.alias("t_ts"),
        F.col("event_type").alias("channel"),
    )
    d = (
        p.join(t, "user_id")
        .filter(
            (F.col("t_ts") >= F.col("p_ts") - F.expr("interval 3 days"))
            & (F.col("t_ts") < F.col("p_ts"))
        )
        .select("p_id", "channel")
        .distinct()
    )
    k = d.groupBy("p_id").agg(F.count("*").cast("bigint").alias("k"))
    return (
        d.join(k, "p_id")
        .groupBy("channel")
        .agg(
            F.count("*").cast("bigint").alias("n_conversions"),
            F.sum(F.expr("1000L div k")).cast("bigint").alias("credit_milli"),
        )
        .orderBy("channel")
    )


@register(
    "mixture_waterfill_allocation",
    r"""
    with cap as (
        select source,
               cast(coalesce(
                   sum(len(string_split_regex(lower(trim(text)), '\s+'))),
                   0) as bigint) as c
        from documents where source is not null group by source
    ),
    tot as (select cast(sum(c) as bigint) as t_all,
                   cast(count(*) as bigint) as n from cap),
    budget as (select t_all // 2 as t, n, t_all from tot),
    sorted as (
        select source, c,
               cast(row_number() over (order by c, source) as bigint) as rk
        from cap
    ),
    pre as (
        select rk, c,
               cast(sum(c) over (order by rk
                   rows between unbounded preceding and current row)
                   as bigint) as s_k
        from sorted
    ),
    -- candidate k = number of fully-saturated (smallest) sources;
    -- k feasible iff S_k + (n-k)*c_k <= T (k=0 uses S_0=0, c_0=0)
    kpick as (
        select max(k) as k from (
            select 0 as k from budget
            union all
            select p.rk as k
            from pre p cross join budget b
            where p.s_k + (b.n - p.rk) * p.c <= b.t
        )
    ),
    params as (
        select b.t, b.n, kp.k,
               coalesce((select s_k from pre where rk = kp.k), 0) as s_k
        from budget b cross join kpick kp
    )
    select c.source, c.c as cap_tokens,
           case when c.c * (p.n - p.k) <= (p.t - p.s_k)
                then cast(c.c as double)
                else round(cast(p.t - p.s_k as double)
                           / cast(p.n - p.k as double), 6) end
               as alloc_tokens,
           (c.c * (p.n - p.k) <= (p.t - p.s_k)) as saturated
    from cap c cross join params p
    order by c.source
    """,
)
def mixture_waterfill_allocation(spark, sf_dir):
    """WATER-FILLING token-budget allocation across corpus sources —
    the capped-uniform mixture allocator (give every source the same
    token budget L, except sources too small to spend it, which
    contribute everything they have; L solves sum(min(cap, L)) = T).
    This is the allocator you use when the mixture target is
    "maximally uniform under availability caps" — a different family
    from mixture_epoch_plan's temperature reweighting (which shapes
    proportions) and dsir_importance_resample (which shapes content).
    Budget here: T = half the corpus tokens. Exactness: caps and
    prefix sums are int64; the saturation decision for EVERY source
    cross-multiplies exact integers (c*(n-k) <= T-S_k — no FP
    boundary), and only the display value of L divides once. The
    breakpoint k (how many smallest sources saturate) maximizes k
    over the same exact inequality. Scale: caps come from one
    map-side-combinable aggregate; the waterfill itself runs over the
    |sources|-row frame — collected driver-side as bounded model
    state (the Lloyd-centroid/slice-list discipline: sources are
    dozens, not millions) and re-emitted as plan literals joined back
    to the distributed caps frame by one broadcast equi-join."""
    # NULL sources are excluded (the corpus_slice_jsd slice convention:
    # unattributed docs get no budget line) and an all-NULL-text source
    # coalesces to a 0-token cap instead of a NULL that crashes the
    # driver-side int() — both latent-degenerate edges pinned by
    # scripts/degenerate_oracle_audit.py (r15).
    docs = _tbl(spark, sf_dir, "documents").filter(
        F.col("source").isNotNull()
    )
    cap = docs.groupBy("source").agg(
        F.coalesce(
            F.sum(F.size(T.tokens(F.lower(F.trim(F.col("text")))))),
            F.lit(0),
        )
        .cast("bigint")
        .alias("c")
    )
    # bounded model-state collect: |sources| rows
    caps = sorted((r["source"], int(r["c"])) for r in cap.collect())
    if not caps:
        return spark.createDataFrame(
            [],
            "source string, cap_tokens bigint, alloc_tokens double,"
            " saturated boolean",
        )
    n = len(caps)
    t_all = sum(c for _, c in caps)
    t = t_all // 2
    by_c = sorted(caps, key=lambda sc: (sc[1], sc[0]))
    prefix = [0]
    for _, c in by_c:
        prefix.append(prefix[-1] + c)
    k = 0
    for cand in range(1, n):
        if prefix[cand] + (n - cand) * by_c[cand - 1][1] <= t:
            k = cand
    # re-check k=0 dominance handled by loop start; alloc decisions:
    s_k = prefix[k]
    # half-up 6-dp rounding of the exact binary expansion to mirror
    # SQL ROUND on the stored double (see _round6 for the repr trap)
    level = _round6((t - s_k) / (n - k))
    rows = []
    for src, c in caps:
        saturated = c * (n - k) <= (t - s_k)
        alloc = float(c) if saturated else level
        rows.append((src, saturated, alloc))
    lit = spark.createDataFrame(
        rows, "source string, saturated boolean, alloc_tokens double"
    )
    return (
        cap.join(F.broadcast(lit), "source")
        .select(
            "source",
            F.col("c").alias("cap_tokens"),
            "alloc_tokens",
            "saturated",
        )
        .orderBy("source")
    )


@register(
    "attribution_time_decay",
    """
    with p as (
        select event_id as p_id, user_id, epoch_us(ts) as p_us
        from events where event_type = 'purchase'
    ),
    t as (
        select user_id, epoch_us(ts) as t_us, event_type as channel
        from events where event_type <> 'purchase'
    ),
    d as (
        select p.p_id, t.channel,
               case (p.p_us - t.t_us) // 86400000000
                    when 0 then 1000 when 1 then 500 else 250 end as w
        from p join t on p.user_id = t.user_id
         and t.t_us >= p.p_us - 3 * 86400000000
         and t.t_us < p.p_us
    ),
    pc as (
        select p_id, channel, cast(sum(w) as bigint) as w_pc
        from d group by p_id, channel
    ),
    ptot as (select p_id, cast(sum(w_pc) as bigint) as w_p
             from pc group by p_id)
    select pc.channel,
           cast(count(*) as bigint) as n_conversions,
           cast(sum((pc.w_pc * 1000000) // ptot.w_p) as bigint)
               as credit_micro
    from pc join ptot on pc.p_id = ptot.p_id
    group by pc.channel
    order by pc.channel
    """,
)
def attribution_time_decay(spark, sf_dir):
    """TIME-DECAY MULTI-TOUCH ATTRIBUTION — the third standard model
    beside last-touch (winner-take-all) and linear (equal split):
    every touch in the 3-day lookback earns weight halving per full
    day of age (the classic half-life-one-day kernel), and each
    conversion's credit splits proportionally. The decay weights are
    DYADIC case constants (1000/500/250 by exact integer day buckets
    from microsecond epochs — the ewma_event_rate no-libm
    discipline), per-(conversion, channel) weights sum exactly in
    int64, and the proportional split is truncating integer division
    scaled to MICRO-credits ((w_pc * 1e6) div w_p) — identical on
    both engines, no FP accumulation anywhere; the <= |channels|
    micro-unit truncation remainder per conversion is documented, not
    redistributed. Unlike the linear model this weights every TOUCH
    (a channel touched twice yesterday outweighs one touched once),
    so the two entries answer different budget questions. Plan: the
    same user_id equi-join + half-open range filter as the linear
    entry, then purchase-keyed rollups — the only exchange is the
    user_id hash."""
    ev = _tbl(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", us.alias("p_us")
    )
    t = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", us.alias("t_us"), F.col("event_type").alias("channel")
    )
    day_us = 86400000000
    gap = F.expr(f"(p_us - t_us) div {day_us}")
    w = (
        F.when(gap == 0, 1000).when(gap == 1, 500).otherwise(250)
    )
    d = (
        p.join(t, "user_id")
        .filter(
            (F.col("t_us") >= F.col("p_us") - F.lit(3 * day_us))
            & (F.col("t_us") < F.col("p_us"))
        )
        .select("p_id", "channel", w.alias("w"))
    )
    pc = d.groupBy("p_id", "channel").agg(
        F.sum("w").cast("bigint").alias("w_pc")
    )
    ptot = pc.groupBy("p_id").agg(F.sum("w_pc").cast("bigint").alias("w_p"))
    return (
        pc.join(ptot, "p_id")
        .groupBy("channel")
        .agg(
            F.count("*").cast("bigint").alias("n_conversions"),
            F.sum(F.expr("(w_pc * 1000000) div w_p"))
            .cast("bigint")
            .alias("credit_micro"),
        )
        .orderBy("channel")
    )


@register(
    "source_shingle_overlap",
    r"""
    with words as (
        -- coalesce mirrors the engine's shingles(): NULL text -> the
        -- single ''-shingle (degenerate audit r15)
        select source,
               string_split_regex(lower(trim(coalesce(text, ''))), '\s+')
                   as ws
        from documents
    ),
    sh as (
        select distinct source, md5(s) as fp
        from (
            select source, unnest(list_distinct(
                [array_to_string(ws[i:i+4], ' ')
                 for i in range(1, greatest(len(ws) - 4, 1) + 1)]
            )) as s
            from words
        )
    ),
    per_src as (select source, cast(count(*) as bigint) as n_sh
                from sh group by source),
    pairs as (
        select a.source as s1, b.source as s2,
               cast(count(*) as bigint) as n_shared
        from sh a join sh b on a.fp = b.fp and a.source < b.source
        group by a.source, b.source
    )
    select p.s1, p.s2, p.n_shared,
           round(cast(p.n_shared as double)
                 / cast(least(x.n_sh, y.n_sh) as double), 6)
               as containment
    from pairs p
    join per_src x on p.s1 = x.source
    join per_src y on p.s2 = y.source
    order by p.n_shared desc, p.s1, p.s2
    limit 20
    """,
)
def source_shingle_overlap(spark, sf_dir):
    """CROSS-SOURCE CONTENT-OVERLAP matrix — for each pair of corpus
    sources, how many distinct 5-gram shingles they SHARE, normalized
    by the smaller source's shingle count (set containment). This is
    the exact-content complement of corpus_slice_jsd (distributional
    similarity): JSD says two slices use similar WORDS, this says
    they contain the same PASSAGES — the signal that two "different"
    crawls are actually mirrors and one should be dropped from the
    mixture. Plan: the standard inverted-index exchange (distinct
    (source, shingle-md5) rows shuffle once on the 16-byte
    fingerprint; the pair fan-out inside a shingle group is bounded
    by C(|sources|, 2) — sources are dozens, so a corpus-wide hot
    shingle costs ~200 rows, not a cartesian), per-source totals are
    a broadcast |sources|-row attach, and the output is
    TakeOrdered(20). Top pairs rank by shared-shingle count with a
    lexicographic tiebreak. The input repartitions before the
    shingle explode — the content_defined_chunks rule: a sub-split-
    sized documents file is ONE task, serializing the compute-heavy
    per-token stage (measured 3.8 -> ~1.4 s at sf0.1); real-scale
    inputs bring their own splits and the tiny shuffle vanishes in
    the noise."""
    docs = _tbl(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    sh = (
        docs.select(
            "source",
            F.explode(
                D.shingles(F.lower(F.trim(F.col("text"))), 5)
            ).alias("s"),
        )
        .select("source", F.md5("s").alias("fp"))
        .distinct()
    )
    per_src = sh.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_sh")
    )
    a = sh.select(F.col("source").alias("s1"), "fp")
    b = sh.select(F.col("source").alias("s2"), F.col("fp").alias("fp2"))
    pairs = (
        a.join(b, (F.col("fp") == F.col("fp2")) & (F.col("s1") < F.col("s2")))
        .groupBy("s1", "s2")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
    )
    x = per_src.select(F.col("source").alias("s1"), F.col("n_sh").alias("n1"))
    y = per_src.select(F.col("source").alias("s2"), F.col("n_sh").alias("n2"))
    return (
        pairs.join(F.broadcast(x), "s1")
        .join(F.broadcast(y), "s2")
        .select(
            "s1",
            "s2",
            "n_shared",
            F.round(
                F.col("n_shared").cast("double")
                / F.least("n1", "n2").cast("double"),
                6,
            ).alias("containment"),
        )
        .orderBy(F.desc("n_shared"), "s1", "s2")
        .limit(20)
    )
