"""Exact-substring dedup, UDTF, quality classifier, CCNet perplexity, k-hop reachability (rounds 8-9).

Split out of the flat registry.py in round 14; entry bodies are
unchanged — see registry/__init__.py for the aggregation contract.
"""
from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import Window

from database_extractor_spark.operators import dedup as D
from database_extractor_spark.operators import text as T

from database_extractor_spark.registry._base import (
    ORACLE,
    register,
    _tbl,
)

# round 8: exact-substring dedup, UDTF, quality classifier
# ==========================================================================


@register(
    "dedup_exact_substring",
    r"""
    with toks as (
        select doc_id, string_split_regex(lower(trim(text)), '\s+') as t
        from documents
    ),
    grams as (
        select doc_id, cast(i - 1 as int) as pos,
               ('0x' || substr(md5(array_to_string(t[i:i+4], ' ')), 1, 15))::bigint as g
        from (select doc_id, t, unnest(range(1, len(t) - 5 + 2)) as i
              from toks where len(t) >= 5)
    ),
    kept as (
        select * from grams
        where g in (select g from grams group by g
                    having count(distinct doc_id) <= 20 and count(*) <= 80)
    ),
    hits as (
        select a.doc_id as id_a, b.doc_id as id_b, a.pos as pos_a, b.pos as pos_b
        from kept a join kept b using (g)
        where a.doc_id < b.doc_id
    ),
    runs as (
        select id_a, id_b, pos_a - pos_b as diag, pos_a,
               pos_a - row_number() over (
                   partition by id_a, id_b, pos_a - pos_b order by pos_a) as grp
        from hits
    ),
    spans as (
        select id_a, id_b, diag, min(pos_a) as a0, max(pos_a) as a1
        from runs group by id_a, id_b, diag, grp
    )
    select id_a, id_b,
           cast(a0 + 1 as int) as a_start,
           cast(a0 - diag + 1 as int) as b_start,
           cast(a1 - a0 + 5 as int) as n_tokens
    from spans
    where a1 - a0 + 5 >= 8
    order by id_a, id_b, a_start, b_start
    """,
)
def dedup_exact_substring(spark, sf_dir):
    """Exact-substring dedup (Lee et al. 2022): every maximal cross-document
    run of >= 8 verbatim-shared tokens, via a rolling 5-gram md5 inverted
    index (df <= 20 and total-occurrence <= 80 hot-gram caps — the second
    bounds within-document repetition blowup) + diagonal gaps-and-islands
    span merge —
    the duplicate-SPAN operator that set-overlap dedups (MinHash/Jaccard)
    structurally miss. See operators/dedup.py:exact_substring_spans for the
    100 TB shape (equi-join only, partitioned window, df-capped fan-out);
    the oracle replays gram hashing, cap, and merge on the same md5 lane."""
    return D.exact_substring_spans(
        _tbl(spark, sf_dir, "documents"), gram=5, min_tokens=8, df_cap=20
    )


def _exact_substring_apply_oracle() -> str:
    """Oracle for the remediation entry: re-run the span-detection oracle
    as a subquery (DuckDB allows WITH inside a derived table), then cut
    the spans from each id_b document with the same 1-based token
    positions and rebuild the text."""
    spans_sql = ORACLE["dedup_exact_substring"]
    return f"""
    with sp as (
        select id_b as doc_id, b_start, n_tokens from ({spans_sql})
    ),
    atoks as (
        select doc_id, string_split_regex(trim(text), '\\s+') as t
        from documents
    ),
    atok as (
        select doc_id, cast(i as int) as p, t[i] as tk
        from (select doc_id, t, unnest(range(1, len(t) + 1)) as i from atoks)
    ),
    akept as (
        select atok.doc_id, atok.p, atok.tk from atok
        where not exists (
            select 1 from sp
            where sp.doc_id = atok.doc_id
              and atok.p >= sp.b_start and atok.p < sp.b_start + sp.n_tokens)
    ),
    aagg as (
        select doc_id, count(*) as n_kept,
               array_to_string(list(tk order by p), ' ') as text_clean
        from akept group by doc_id
    )
    select d.doc_id,
           cast(len(t.t) as int) as n_tokens_before,
           cast(len(t.t) - coalesce(aagg.n_kept, 0) as int) as n_removed,
           coalesce(aagg.text_clean, '') as text_clean
    from documents d
      join atoks t using (doc_id)
      left join aagg using (doc_id)
    order by d.doc_id
    """


@register("dedup_exact_substring_apply", _exact_substring_apply_oracle())
def dedup_exact_substring_apply(spark, sf_dir):
    """The REMEDIATION half of exact-substring dedup (Lee et al. 2022):
    detect duplicate spans (dedup_exact_substring's plan feeds in
    unchanged) and CUT each one from the later document of its pair,
    emitting the cleaned corpus with per-doc removal counts — detect ->
    cut, the complete pipeline a corpus dedup pass actually ships. See
    operators/dedup.py:remove_spans for the shape (tiny span aggregate
    left-joined back, then one narrow higher-order-function projection —
    no UDF, no extra shuffle); the oracle replays span detection as a
    subquery and the cut as an anti-semi position filter."""
    docs = _tbl(spark, sf_dir, "documents")
    spans = D.exact_substring_spans(docs, gram=5, min_tokens=8, df_cap=20)
    return D.remove_spans(docs, spans)


@register(
    "udtf_tokenize_offsets",
    r"""
    with w as (
        select doc_id,
               string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                            ' ') as ws
        from documents
        where len(trim(text)) > 0
    ),
    tok as (
        select doc_id, cast(i as int) as token_idx, ws[i] as token,
               cast(coalesce(sum(len(ws[i]) + 1) over (
                   partition by doc_id order by i
                   rows between unbounded preceding and 1 preceding), 0) as int)
               as char_start
        from (select doc_id, ws, unnest(range(1, len(ws) + 1)) as i from w)
    )
    select doc_id, token_idx, token, char_start,
           cast(char_start + len(token) as int) as char_end
    from tok
    order by doc_id, token_idx
    """,
)
def udtf_tokenize_offsets(spark, sf_dir):
    """Python UDTF (Spark 4 table-function extension point, SURVEY §2.2
    UDF/UDAF/UDTF): tokenize each document and emit one row per token with
    its CHARACTER span [char_start, char_end) in the whitespace-normalized
    text — the offset map annotation pipelines need to project token-level
    decisions (PII masks, dedup spans) back onto text. The cumulative
    char cursor is an imperative per-row scan — the table-function shape —
    while the oracle replays it relationally as a partitioned prefix-sum
    window. Arrow-batched (`useArrow=True` -> ArrowEvalPythonUDTF, the
    sanctioned vectorized Python stage; row-at-a-time BatchEvalPythonUDTF
    stays banned by the plan lint), invoked through the SQL LATERAL
    correlated-table-function syntax. Scale: per-row generator over one
    scan — embarrassingly parallel, no shuffle, output ~n_tokens rows."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="token_idx int, token string, char_start int, char_end int",
        useArrow=True,
    )
    class TokenizeWithOffsets:
        def eval(self, text):
            import re

            norm = re.sub(r"\s+", " ", (text or "").strip().lower())
            if not norm:
                return
            pos = 0
            for i, t in enumerate(norm.split(" "), start=1):
                yield i, t, pos, pos + len(t)
                pos += len(t) + 1

    spark.udtf.register("tokenize_with_offsets", TokenizeWithOffsets)
    _tbl(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        select d.doc_id, t.token_idx, t.token, t.char_start, t.char_end
        from documents d, lateral tokenize_with_offsets(d.text) t
        """
    )


def _qc_weights(n_buckets: int = 64) -> list[int]:
    """Frozen INTEGER weights of the hashed-feature linear quality scorer:
    w_j = md5("qcw{j}") mapped into [-1000, 1000]. A stand-in for trained
    fasttext-style classifier weights with the same plan shape — frozen at
    registration so both engines embed identical literals, and integer so
    the per-document weight sum is EXACT under any summation order (the
    FP-portability lesson of dsir/text_tfidf applied at the design stage).
    """
    import hashlib

    return [
        int(hashlib.md5(f"qcw{j}".encode()).hexdigest()[:8], 16) % 2001 - 1000
        for j in range(n_buckets)
    ]


def _qc_wsum_sql() -> str:
    """The classifier's summed-weight SQL term — ONE definition shared by
    every oracle that replays _qc_wsum (score entry, streaming gate,
    curation funnel), so a weight/bucket/hash-width change cannot land in
    one oracle and silently miss another."""
    wlit = "[" + ", ".join(str(v) for v in _qc_weights()) + "]"
    return (
        f"sum({wlit}[cast(('0x' || substr(md5(token), 1, 8))::bigint % 64"
        " as int) + 1])"
    )


def _qc_oracle() -> str:
    return f"""
    with docs as (
        select doc_id, lang,
               string_split_regex(lower(trim(text)), '\\s+') as t
        from documents
    ),
    ws as (
        select doc_id,
               {_qc_wsum_sql()} as wsum,
               count(*) as n
        from (select doc_id, unnest(t) as token from docs)
        group by doc_id
    )
    select d.doc_id, d.lang, cast(len(d.t) as int) as n_tokens,
           round(1.0 / (1.0 + exp(-(ws.wsum / (1000.0 * ws.n)))), 6) as score,
           ws.wsum >= 0 as quality_pass
    -- LEFT join (degenerate audit r15): a NULL-text doc has no token
    -- rows, but the scorer still emits its row with NULL score/pass —
    -- an inner join silently drops it from the report
    from docs d left join ws on d.doc_id = ws.doc_id
    order by d.doc_id
    """


def _qc_wsum(toks_col) -> "F.Column":
    """Summed frozen integer weight of a token array — the classifier's
    linear term, shared by the batch entry and the streaming gate (the
    expression is stateless and narrow, so it is streamable as-is)."""
    warr = F.expr(
        "array(" + ",".join(f"{v}L" for v in _qc_weights()) + ")"
    )

    def weight_of(t):
        bucket = (
            F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long") % 64
        ).cast("int")
        return F.element_at(warr, bucket + 1).cast("long")

    return F.aggregate(
        F.transform(toks_col, weight_of),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


@register("quality_classifier_score", _qc_oracle())
def quality_classifier_score(spark, sf_dir):
    """Learned-filter scoring (the fasttext-style linear classifier step
    between heuristic text_quality and DSIR selection, VERDICT r7 item 5):
    hash every token into 64 feature buckets (portable 32-bit md5 lane),
    dot the bucket counts with FROZEN integer weights, squash through a
    sigmoid -> per-document quality score + keep/drop decision.

    Spark-first: the whole scorer is ONE narrow projection — tokens ->
    transform(token -> weight_literal[md5_bucket]) -> integer aggregate
    fold -> sigmoid — no shuffle, no UDF, no model server; 100 TB cost is
    a single scan. The keep decision compares the INTEGER weight sum to 0
    (algebraically = score >= 0.5), immune to FP-boundary flips; only the
    reported score rounds a double (6 dp, exp drift ~1e-16). Weights are
    literals in both engines (_qc_weights), so the oracle is exact."""
    toks = T.tokens(F.lower(F.trim(F.col("text"))))
    docs = _tbl(spark, sf_dir, "documents").select(
        "doc_id", "lang", toks.alias("__toks")
    )
    wsum = _qc_wsum(F.col("__toks"))
    n = F.size(F.col("__toks"))
    z = F.col("__wsum") / (1000.0 * n)
    return (
        docs.withColumn("__wsum", wsum)
        .select(
            "doc_id",
            "lang",
            n.cast("int").alias("n_tokens"),
            F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("score"),
            (F.col("__wsum") >= 0).alias("quality_pass"),
        )
    )


def _qc_gate_oracle() -> str:
    return f"""
    with docs as (
        select doc_id, lang,
               string_split_regex(lower(trim(text)), '\\s+') as t
        from documents
    ),
    ws as (
        select doc_id,
               {_qc_wsum_sql()} as wsum
        from (select doc_id, unnest(t) as token from docs)
        group by doc_id
    )
    select d.lang, cast(count(*) as bigint) as n_total,
           cast(sum(case when ws.wsum >= 0 then 1 else 0 end) as bigint)
               as n_pass
    -- LEFT join (degenerate audit r15): NULL-text docs count in
    -- n_total and fail the gate (NULL wsum -> else 0)
    from docs d left join ws on d.doc_id = ws.doc_id
    group by d.lang
    order by d.lang
    """


@register("streaming_quality_gate", _qc_gate_oracle())
def streaming_quality_gate(spark, sf_dir):
    """The quality classifier as a STREAMING gate: documents arrive as a
    file stream, each micro-batch is scored by the same frozen-weight
    expression the batch entry uses (_qc_wsum — stateless, narrow, so
    the plan is streamable unchanged), and a running per-language
    total/pass count aggregates across batches (availableNow trigger).
    The batch oracle proves the incremental aggregation converges to the
    batch answer — the corpus-ingest shape where filtering happens ON
    ARRIVAL rather than as a post-hoc scan. Keep decisions are the exact
    integer weight-sum predicate, so there is no FP boundary to drift
    between micro-batch and batch execution."""
    from database_extractor_spark.streaming import (
        adaptive_state_partitions,
        run_available_now,
        stream_source,
    )

    _src = os.path.join(sf_dir, "documents.parquet")
    stream = stream_source(spark, _src)
    toks = T.tokens(F.lower(F.trim(F.col("text"))))
    scored = stream.select("lang", _qc_wsum(toks).alias("__wsum"))
    agg = scored.groupBy("lang").agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(F.col("__wsum") >= 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_pass"),
    )
    return run_available_now(
        spark, agg, state_partitions=adaptive_state_partitions(spark, _src)
    )


def _auc_oracle() -> str:
    return f"""
    with docs as (
        select doc_id, lang,
               string_split_regex(lower(trim(text)), '\\s+') as t
        from documents
    ),
    ws as (
        select doc_id, {_qc_wsum_sql()} as wsum
        from (select doc_id, unnest(t) as token from docs)
        group by doc_id
    ),
    sc as (
        select case when d.lang = 'en' then 1 else 0 end as pos,
               cast(ws.wsum as bigint) as s
        from docs d join ws on d.doc_id = ws.doc_id
    ),
    g as (
        select s, cast(sum(pos) as bigint) as p,
               cast(sum(1 - pos) as bigint) as q
        from sc group by s
    ),
    c as (
        select p, q,
               cast(sum(q) over (order by s
                   rows between unbounded preceding and current row)
                   as bigint) as cq
        from g
    )
    select cast(sum(p) as bigint) as n_pos,
           cast(sum(q) as bigint) as n_neg,
           cast(sum(p * (2 * cq - q)) as bigint) as auc_num2,
           cast(sum(p * (2 * cq - q)) as double)
               / cast(2 * sum(p) * sum(q) as double) as auc
    from c
    """


@register("quality_score_auc", _auc_oracle())
def quality_score_auc(spark, sf_dir):
    """EXACT tie-aware ROC-AUC of the quality classifier against an
    English/non-English label — the eval that tells you whether a
    learned filter actually ranks wanted documents above unwanted ones
    (the threshold-free companion of quality_gate_agreement's fixed-
    cutoff confusion counts). Uses the Mann-Whitney identity: AUC =
    [#(pos > neg pairs) + ½#(ties)] / (P·Q), computed WITHOUT pair
    enumeration — group documents by their exact INTEGER weight sum
    (_qc_wsum, the same frozen score quality_classifier_score squashes),
    prefix-sum the negative counts over ordered distinct scores, and
    fold Σ p(s)·(2·cumq_below(s) + q(s)) = 2·AUC·P·Q, all in bigints;
    the single double division happens once at the end, identically on
    both engines. The prefix sum is the registry's two-level
    distributed form (cumulative_distinct_users): intra-band window
    PARTITIONED by floor(s/2^14) (exact in doubles — power-of-two
    divisor), cross-band carry from per-band totals via one sorted-
    array fold, broadcast back. Scale: distinct scores shuffle once;
    no O(P·Q) pair join ever exists, so a 100 TB corpus evaluates at
    scan + two bounded exchanges. The frozen hashed weights stand in
    for a trained model with the identical plan shape."""
    toks = T.tokens(F.lower(F.trim(F.col("text"))))
    docs = _tbl(spark, sf_dir, "documents").select(
        "doc_id", "lang", toks.alias("__toks")
    )
    sc = docs.select(
        (F.col("lang") == "en").cast("long").alias("pos"),
        _qc_wsum(F.col("__toks")).cast("bigint").alias("s"),
        # unscorable (NULL-text) docs are EXCLUDED from the eval — a
        # rank eval cannot place a doc with no score (degenerate audit
        # r15; the oracle's token join drops them for the same reason)
    ).filter(F.col("s").isNotNull())
    g = sc.groupBy("s").agg(
        F.sum("pos").cast("bigint").alias("p"),
        F.sum(F.lit(1) - F.col("pos")).cast("bigint").alias("q"),
    ).withColumn("band", F.floor(F.col("s") / F.lit(16384)))
    w = (
        Window.partitionBy("band")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = (
        g.groupBy("band")
        .agg(F.sum("q").alias("tq"))
        .agg(F.sort_array(F.collect_list(F.struct("band", "tq"))).alias("a"))
        .select(
            F.explode(
                F.expr(
                    "transform(a, (s, i) -> struct(s.band as band, "
                    "aggregate(slice(a, 1, i), 0L, (acc, u) -> acc + u.tq)"
                    " as kq))"
                )
            ).alias("s")
        )
        .select("s.band", "s.kq")
    )
    c = (
        g.withColumn("iq", F.sum("q").over(w))
        .join(F.broadcast(carry), "band")
        .select(
            "p",
            "q",
            (F.col("iq") + F.col("kq")).cast("bigint").alias("cq"),
        )
    )
    term = F.col("p") * (F.lit(2) * F.col("cq") - F.col("q"))
    return c.agg(
        F.sum("p").cast("bigint").alias("n_pos"),
        F.sum("q").cast("bigint").alias("n_neg"),
        F.sum(term).cast("bigint").alias("auc_num2"),
        (
            F.sum(term).cast("double")
            / (F.lit(2) * F.sum("p") * F.sum("q")).cast("double")
        ).alias("auc"),
    )


def _calibration_oracle() -> str:
    return f"""
    with docs as (
        select doc_id, lang,
               string_split_regex(lower(trim(text)), '\\s+') as t
        from documents
    ),
    ws as (
        select doc_id, {_qc_wsum_sql()} as wsum, count(*) as n
        from (select doc_id, unnest(t) as token from docs)
        group by doc_id
    ),
    sc as (
        select case when d.lang = 'en' then 1 else 0 end as pos,
               round(1.0 / (1.0 + exp(-(ws.wsum / (100.0 * ws.n)))), 6)
                   as score
        from docs d join ws on d.doc_id = ws.doc_id
    )
    select cast(floor(score * 10) as int) as bin,
           cast(count(*) as bigint) as n,
           cast(sum(pos) as bigint) as n_pos,
           round(cast(sum(cast(score as decimal(20, 12))) as double)
                 / count(*), 6) as mean_pred,
           cast(sum(pos) as double) / count(*) as pos_rate
    from sc
    group by 1
    order by bin
    """


@register("calibration_reliability", _calibration_oracle())
def calibration_reliability(spark, sf_dir):
    """CALIBRATION RELIABILITY TABLE of the quality classifier — the
    third leg of the filter-eval tripod: quality_gate_agreement checks
    a fixed cutoff, quality_score_auc checks ranking, THIS checks
    whether the predicted probabilities MEAN what they say (bin
    documents by predicted score, compare each bin's mean prediction
    to its empirical positive rate — the reliability-diagram table).
    The prediction is the TEMPERATURE-SCALED score sigmoid(wsum /
    (100*n)) — T = 0.1 of the canonical classifier scale — exactly
    the knob calibration analysis exists to tune; the canonical
    T = 1 score concentrates every fixture document into two bins,
    which would leave the table's mechanics unexercised.
    Exactness discipline: the per-document sigmoid score is rounded to
    6 dp first (identical IEEE sequence both engines — the
    quality_classifier_score contract), the bin is floor(score*10) on
    those identical doubles, and the bin's mean goes through a
    DECIMAL(20,12) sum (order-independent, exact at this magnitude)
    before ONE double division — no FP accumulation drift can split a
    bin across engines. Scale: one scan + a <=11-row aggregate; the
    100 TB cost is the token fold quality_classifier_score already
    pays."""
    toks = T.tokens(F.lower(F.trim(F.col("text"))))
    docs = _tbl(spark, sf_dir, "documents").select(
        "doc_id", "lang", toks.alias("__toks")
    )
    wsum = _qc_wsum(F.col("__toks"))
    n = F.size(F.col("__toks"))
    sc = docs.withColumn("__wsum", wsum).select(
        (F.col("lang") == "en").cast("long").alias("pos"),
        F.round(
            F.lit(1.0)
            / (F.lit(1.0) + F.exp(-(F.col("__wsum") / (100.0 * n)))),
            6,
        ).alias("score"),
        # unscorable (NULL-text) docs are excluded — no calibration bin
        # exists for a doc with no prediction (degenerate audit r15)
    ).filter(F.col("score").isNotNull())
    return (
        sc.groupBy(
            F.floor(F.col("score") * 10).cast("int").alias("bin")
        )
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("pos").cast("bigint").alias("n_pos"),
            F.round(
                F.sum(F.col("score").cast("decimal(20,12)")).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_pred"),
            (F.sum("pos").cast("double") / F.count("*")).alias("pos_rate"),
        )
        .orderBy("bin")
    )


def _chi2_oracle() -> str:
    return """
    with docs as (
        select doc_id,
               case when lang = 'en' then 1 else 0 end as pos,
               string_split_regex(lower(trim(text)), '\\s+') as t
        from documents
    ),
    pres as (
        select distinct doc_id, pos, token
        from (select doc_id, pos, unnest(t) as token from docs)
    ),
    tk as (
        select token,
               cast(sum(pos) as bigint) as a,
               cast(sum(1 - pos) as bigint) as b
        from pres group by token
        having sum(pos) + sum(1 - pos) >= 20
    ),
    tot as (
        select cast(sum(pos) as bigint) as ta,
               cast(sum(1 - pos) as bigint) as tb
        from docs
    )
    select token,
           a as n_pos_docs,
           b as n_neg_docs,
           cast(ta + tb as double)
           * cast(a * (tb - b) - b * (ta - a) as double)
           * cast(a * (tb - b) - b * (ta - a) as double)
           / (cast(a + b as double) * cast((ta - a) + (tb - b) as double)
              * cast(ta as double) * cast(tb as double)) as chi2
    from tk cross join tot
    order by chi2 desc, token
    limit 20
    """


@register("token_label_chi2", _chi2_oracle())
def token_label_chi2(spark, sf_dir):
    """TOKEN-LABEL chi-square ASSOCIATION — the feature-selection scan
    behind every bag-of-words quality/language classifier (which tokens
    separate English from non-English documents?): build the per-token
    2x2 presence contingency table (a = positive docs containing the
    token, b = negative docs containing it; column margins from the
    1-row document totals) and rank by chi² = N·(ad-bc)² / ((a+b)(c+d)
    (a+c)(b+d)). Every table cell and the 2x2 determinant are EXACT
    bigints (|det| <= ta*tb, int64-safe to ~3e9 docs); the chi² ratio
    itself is evaluated by ONE identical double expression on both
    engines — det² can exceed int64 at corpus scale (it did at the 50k
    -doc sf1 fixture), so each factor casts to double BEFORE squaring,
    and determinism comes from identical IEEE sequencing, not integer
    exactness. The (chi2 desc, token) tiebreak keeps the top-20
    deterministic. The min-df 20 gate prunes the long
    tail before ranking. Scale: (doc, token) presence pairs shuffle
    once on token — the inverted-index exchange dedup_containment
    already pays; totals attach as the idiomatic 1-row broadcast; the
    output is TakeOrdered(20), never a global sort."""
    toks = T.tokens(F.lower(F.trim(F.col("text"))))
    docs = _tbl(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("lang") == "en").cast("long").alias("pos"),
        toks.alias("__toks"),
    )
    pres = docs.select(
        "doc_id", "pos", F.explode("__toks").alias("token")
    ).distinct()
    tk = (
        pres.groupBy("token")
        .agg(
            F.sum("pos").cast("bigint").alias("a"),
            F.sum(F.lit(1) - F.col("pos")).cast("bigint").alias("b"),
        )
        .filter(F.col("a") + F.col("b") >= 20)
    )
    tot = docs.agg(
        F.sum("pos").cast("bigint").alias("ta"),
        F.sum(F.lit(1) - F.col("pos")).cast("bigint").alias("tb"),
    )
    j = tk.crossJoin(F.broadcast(tot))
    det = F.col("a") * (F.col("tb") - F.col("b")) - F.col("b") * (
        F.col("ta") - F.col("a")
    )
    chi2 = (
        (F.col("ta") + F.col("tb")).cast("double")
        * det.cast("double")
        * det.cast("double")
        / (
            (F.col("a") + F.col("b")).cast("double")
            * ((F.col("ta") - F.col("a")) + (F.col("tb") - F.col("b"))).cast(
                "double"
            )
            * F.col("ta").cast("double")
            * F.col("tb").cast("double")
        )
    )
    return (
        j.select(
            "token",
            F.col("a").alias("n_pos_docs"),
            F.col("b").alias("n_neg_docs"),
            chi2.alias("chi2"),
        )
        .orderBy(F.desc("chi2"), "token")
        .limit(20)
    )


# ==========================================================================
# Round 9: CCNet perplexity buckets, k-hop graph reachability, ordered
# listagg, Arrow-native mapInArrow, runtime bloom-filter join, LATERAL
# correlated top-k
# ==========================================================================

#: Frozen 257-entry fixed-point log table: _LN_MICRO_TABLE[i] =
#: round(1e6 * ln(1 + i/256)) for i = 0..256 (entry 256 = round(1e6*ln 2)
#: = 693147, the per-octave step). Committed CONSTANTS (the _qc_weights
#: discipline) — neither engine evaluates a transcendental at runtime,
#: so there is NO libm in the ccnet lane at all (VERDICT r11 item 4).
_LN_MICRO_TABLE = (
    0, 3899, 7782, 11651, 15504, 19343, 23167, 26977, 30772, 34552,
    38319, 42071, 45810, 49534, 53245, 56941, 60625, 64294, 67951,
    71594, 75223, 78840, 82444, 86034, 89612, 93177, 96730, 100269,
    103797, 107312, 110814, 114305, 117783, 121249, 124703, 128146,
    131576, 134995, 138402, 141798, 145182, 148555, 151916, 155266,
    158605, 161933, 165250, 168555, 171850, 175134, 178408, 181670,
    184922, 188164, 191395, 194615, 197826, 201026, 204216, 207395,
    210565, 213724, 216874, 220014, 223144, 226264, 229374, 232475,
    235566, 238648, 241720, 244783, 247836, 250880, 253915, 256941,
    259958, 262965, 265964, 268953, 271934, 274905, 277868, 280823,
    283768, 286705, 289633, 292553, 295464, 298367, 301261, 304147,
    307025, 309894, 312756, 315609, 318454, 321291, 324119, 326940,
    329753, 332558, 335356, 338145, 340927, 343701, 346467, 349225,
    351976, 354720, 357456, 360184, 362905, 365619, 368326, 371025,
    373716, 376401, 379078, 381749, 384412, 387068, 389717, 392359,
    394994, 397622, 400243, 402858, 405465, 408066, 410660, 413247,
    415828, 418402, 420969, 423530, 426084, 428632, 431173, 433708,
    436237, 438759, 441275, 443784, 446287, 448784, 451275, 453759,
    456237, 458710, 461176, 463636, 466090, 468538, 470980, 473416,
    475846, 478270, 480689, 483101, 485508, 487909, 490304, 492693,
    495077, 497455, 499828, 502195, 504556, 506912, 509262, 511607,
    513946, 516279, 518608, 520931, 523248, 525560, 527867, 530169,
    532465, 534756, 537041, 539322, 541597, 543867, 546132, 548392,
    550647, 552897, 555142, 557381, 559616, 561845, 564070, 566290,
    568505, 570715, 572920, 575120, 577315, 579506, 581692, 583873,
    586049, 588221, 590387, 592550, 594707, 596860, 599008, 601152,
    603291, 605425, 607555, 609681, 611802, 613918, 616030, 618137,
    620240, 622339, 624433, 626523, 628609, 630690, 632767, 634839,
    636907, 638971, 641031, 643087, 645138, 647185, 649228, 651267,
    653301, 655332, 657358, 659380, 661398, 663413, 665423, 667429,
    669431, 671429, 673423, 675413, 677399, 679381, 681359, 683334,
    685304, 687271, 689233, 691192, 693147,
)


#: The table as ONE SQL array literal. Building it as
#: ``F.array(*[F.lit(v).cast("bigint") ...])`` costs 257 Py4J
#: round-trips (~0.5-1.1 s of pure driver-side Column construction,
#: measured) EVERY time a query plan is built — the r12→r13 2.7×
#: "regression" on ccnet_perplexity_buckets was entirely this
#: build-time overhead, paid twice per run (freq + total lanes), not
#: execution cost (lnq on 5M rows ran in the same wall as on 50k).
#: One expr string is a single Py4J call (~3 ms) and Catalyst
#: constant-folds it to the identical array Literal.
_LN_MICRO_SQL = "array(" + ",".join(f"{v}L" for v in _LN_MICRO_TABLE) + ")"


def _lnq_micro(df, mcol: str, out: str):
    """Attach ``out`` = integer fixed-point 1e6·ln(mcol) for a positive
    bigint column, computed WITHOUT any transcendental function:

    - octave: k = floor(log2 m) via length(bin(m)) - 1 (pure string/int);
    - mantissa: r = m / 2^k ∈ [1, 2) — EXACT in double (division by a
      power of two only rescales the exponent; m < 2^53), then
      z = floor(r·2^24), also exact, splits into an 8-bit table index
      and a 16-bit interpolation fraction;
    - lnq = k·693147 + T[idx] + (T[idx+1] − T[idx])·frac div 65536 over
      the frozen _LN_MICRO_TABLE — all integer ops.

    Every step is either integer arithmetic or an IEEE-exact double op
    (scale by 2^k, floor), so JVM and any SQL engine produce the SAME
    integer bit-for-bit — the property the previous floor(ln·1e6) lane
    could not guarantee across libms. Accuracy vs true 1e6·ln(m):
    within ~10 (1e-5 nats) — measured max 9.4 over m ≤ 5000 plus spot
    checks to 2^52; plenty for quality bucketing, and the value is the
    SPEC, not an approximation of one.

    VERDICT r12 item 1: built as ONE projection from ONE expr string
    (one Py4J call) instead of five staged withColumns over an
    F.array of 257 F.lits — identical math and identical folded plan
    constants, minus ~1 s/run of driver-side Column-construction
    overhead. Repeated subterms (lz appears in both the index and the
    fraction; the table literal in both probes) are shared at runtime
    by codegen subexpression elimination, and the lane only ever runs
    over the |vocab|-row FREQ table and the 1-row total anyway."""
    m = f"`{mcol}`"
    lk = f"(length(bin({m})) - 1)"
    lz = (
        f"cast(floor(cast({m} as double)"
        f" / cast(shiftleft(cast(1 as bigint), {lk}) as double)"
        f" * 16777216.0) as bigint)"
    )
    lidx = f"(cast(shiftright({lz}, 16) as int) - 256)"
    lfrac = f"({lz} % 65536)"
    tab = _LN_MICRO_SQL
    return df.withColumn(
        out,
        F.expr(
            f"cast({lk} as bigint) * 693147"
            f" + element_at({tab}, {lidx} + 1)"
            f" + ((element_at({tab}, {lidx} + 2) - element_at({tab}, {lidx} + 1))"
            f" * {lfrac}) div 65536"
        ),
    )


def _lnq_lane_sql(src: str, mcol: str, keep: str) -> str:
    """DuckDB replay of _lnq_micro (same staged shape; `//` is DuckDB's
    integer floor division, matching Spark's `div` on the nonnegative
    operands here). Module-level so tests can rebuild the lane (e.g. the
    scrambled-summation-order replay) without duplicating it."""
    tab = "[" + ",".join(str(v) for v in _LN_MICRO_TABLE) + "]"
    return f"""(
        select {keep},
               (cast(lk as bigint) * 693147
                + lntab[lidx + 1]
                + ((lntab[lidx + 2] - lntab[lidx + 1]) * lfrac) // 65536)
                   as lnq
        from (
            select {keep}, lk,
                   cast((lz >> 16) as int) - 256 as lidx,
                   lz % 65536 as lfrac, lntab
            from (
                select {keep}, length(bin({mcol})) - 1 as lk,
                       cast(floor(cast({mcol} as double)
                            / cast(((1::bigint) << (length(bin({mcol})) - 1))
                                   as double)
                            * 16777216.0) as bigint) as lz,
                       {tab} as lntab
                from {src}
            )
        )
    )"""


def _ccnet_oracle() -> str:
    lane = _lnq_lane_sql
    return rf"""
    with toks as (
        select doc_id,
               unnest(string_split_regex(lower(trim(text)), '\s+')) as token
        from documents
    ),
    freq as (select token, count(*) as c from toks group by 1),
    total as (select count(*) as total from toks),
    lq_c as {lane("freq", "c", "token")},
    lq_t as {lane("total", "total", "total")},
    lp as (
        select t.doc_id,
               round(cast(sum(lc.lnq - lt.lnq) as double) / 1000000.0
                     / count(*), 4) as avg_logprob
        from toks t join lq_c lc on t.token = lc.token cross join lq_t lt
        group by t.doc_id
    )
    select d.doc_id, d.lang, lp.avg_logprob,
           case ntile(3) over (partition by d.lang
                               order by lp.avg_logprob desc, d.doc_id)
                when 1 then 'head' when 2 then 'middle' else 'tail'
           end as bucket
    from documents d join lp using (doc_id)
    order by d.doc_id
    """


@register("ccnet_perplexity_buckets", _ccnet_oracle())
def ccnet_perplexity_buckets(spark, sf_dir):
    """CCNet-style quality bucketing (Wenzek et al. 2020, public): rank
    every document within its LANGUAGE by an LM score (here the corpus-
    unigram mean log-probability — the repo's perplexity proxy lane) and
    split each language into equal head/middle/tail terciles; pipelines
    then keep head+middle or sample by bucket. Spark-first: the score is
    text_unigram_logprob's plan with lang CARRIED THROUGH the score
    aggregation (lang is functionally determined by doc_id, so grouping
    on (doc_id, lang) is free — re-joining documents just to attach
    lang would cost a second scan plus a doc_id join); the split is one
    lang-partitioned ntile(3) window over (score desc, doc_id) — a total
    order, so the tercile boundary is deterministic and the DuckDB
    replay is hash-identical. Because the score is the SORT KEY of that
    window, it uses the _canonical_mean discipline (ADVICE r9) taken to
    its endpoint (VERDICT r11 item 4): each token's log-probability is
    the INTEGER fixed-point lane of _lnq_micro — lnq(c) − lnq(total),
    where lnq is bit-length + frozen-table interpolation, pure integer
    and IEEE-exact ops only, NO libm call in either engine — so the
    per-doc sum is an exact int64, order-independent, and both engines
    divide and round the bit-identical double. The former lane's
    residual assumption (JVM Math.log ≡ DuckDB ln to 1 ulp at a .5e-6
    quantization boundary) is gone: there is nothing transcendental
    left to diverge. Scale: lnq costs a handful of integer ops on the
    FREQ table (|vocab| rows) and the 1-row total, not per token; the
    window partitions by language (parallel across langs; within a
    language ntile is the same sort-shuffle any per-lang ranking
    costs); no new shuffles beyond the score's token aggregate."""
    toks = _tbl(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.explode(T.tokens(F.lower(F.trim(F.col("text"))))).alias("token"),
    )
    freq = _lnq_micro(
        toks.groupBy("token").agg(F.count("*").alias("c")), "c", "__clnq"
    )
    total = _lnq_micro(
        toks.agg(F.count("*").alias("__total")), "__total", "__tlnq"
    )
    lp = (
        toks.join(F.broadcast(freq), "token")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "lang",
            (F.col("__clnq") - F.col("__tlnq")).alias("lpq"),
        )
        .groupBy("doc_id", "lang")
        .agg(
            F.round(
                F.sum("lpq").cast("double") / F.lit(1000000.0) / F.count("*"),
                4,
            ).alias("avg_logprob")
        )
    )
    w = Window.partitionBy("lang").orderBy(F.desc("avg_logprob"), F.asc("doc_id"))
    t = F.ntile(3).over(w)
    return lp.select(
        "doc_id",
        "lang",
        "avg_logprob",
        F.when(t == 1, "head").when(t == 2, "middle").otherwise("tail")
        .alias("bucket"),
    )


_KHOP_ORACLE = """
    with e as (
        select distinct o.o_custkey as c, l.l_suppkey as s
        from orders o join lineitem l on l.l_orderkey = o.o_orderkey
    ),
    h1 as (select distinct s from e where c = 1),
    h2 as (
        select distinct e.c from e join h1 using (s) where e.c <> 1
    ),
    h3 as (
        select distinct e.s from e join h2 using (c)
        where e.s not in (select s from h1)
    )
    select entity, id, dist from (
        select 'customer' as entity, cast(1 as bigint) as id, 0 as dist
        union all select 'supplier', s, 1 from h1
        union all select 'customer', c, 2 from h2
        union all select 'supplier', s, 3 from h3
    )
    order by dist, entity, id
    """


def _khop_plan(spark, sf_dir, materialize: bool = True):
    """graph_khop_reachability's plan builder. ``materialize=True`` (the
    entry) derives the (customer, supplier) edge list ONCE and
    localCheckpoints it before the hop joins — lazily, each of the three
    hops (plus two nested references) re-derived the orders x lineitem
    join + distinct because the per-branch broadcast/shuffle variants
    defeat AQE exchange reuse (measured: 21 Exchanges, 0 Reused); a
    production BFS materializes its edge list exactly once.
    ``materialize=False`` is the lazy twin the plan lint checks so the
    edge derivation itself is asserted cartesian-free."""
    o = _tbl(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"), F.col("o_custkey").alias("c")
    )
    li = _tbl(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s")
    )
    e = o.join(li, "ok").select("c", "s").distinct()
    if materialize:
        e = e.localCheckpoint(eager=True)
    h1 = e.filter(F.col("c") == 1).select("s").distinct()
    h2 = (
        e.join(F.broadcast(h1), "s")
        .filter(F.col("c") != 1)
        .select("c")
        .distinct()
    )
    h3 = (
        e.join(h2, "c")
        .select("s")
        .distinct()
        .join(F.broadcast(h1), "s", "left_anti")
    )
    row0 = spark.range(1).select(
        F.lit("customer").alias("entity"),
        F.lit(1).cast("bigint").alias("id"),
        F.lit(0).cast("int").alias("dist"),
    )
    lab = lambda df, ent, col, d: df.select(
        F.lit(ent).alias("entity"),
        F.col(col).cast("bigint").alias("id"),
        F.lit(d).cast("int").alias("dist"),
    )
    return (
        row0.unionAll(lab(h1, "supplier", "s", 1))
        .unionAll(lab(h2, "customer", "c", 2))
        .unionAll(lab(h3, "supplier", "s", 3))
    )


@register("graph_khop_reachability", _KHOP_ORACLE)
def graph_khop_reachability(spark, sf_dir):
    """k-hop BFS reachability (k=3) over the bipartite customer-supplier
    graph (an edge when a customer's order contains a supplier's line):
    every node within 3 hops of customer 1, labeled with its MINIMUM hop
    distance. The graph-exploration shape the iterative entries
    (components, PageRank) don't cover: frontier expansion with per-hop
    DEDUPLICATION — each hop is one equi-join (edges x frontier) plus a
    distinct, and already-visited nodes are subtracted (left_anti) so
    the frontier carries min-dist semantics and its size is bounded by
    the node set, not by path counts (THE failure mode of naive BFS at
    scale: path multiplicity grows geometrically, node count doesn't).
    The edge list is derived once and materialized (see _khop_plan);
    the hops then run against it — hop joins shuffle on node id, early
    frontiers broadcast (customer 1's supplier set is tiny), the
    distincts are the scale guard. The oracle replays hops as chained
    CTEs."""
    return _khop_plan(spark, sf_dir, materialize=True)


@register(
    "string_agg_ordered",
    """
    with firstn as (
        select user_id, event_type, ts, event_id,
               row_number() over (partition by user_id
                                  order by ts, event_id) as rn
        from events
    )
    select user_id,
           string_agg(event_type, '>' order by ts, event_id) as journey,
           cast(count(*) as bigint) as n_events
    from firstn where rn <= 20
    group by user_id
    order by user_id
    """,
)
def string_agg_ordered(spark, sf_dir):
    """Ordered string aggregation — ``listagg(...) within group (order
    by ...)``, new in Spark 4: each user's first-20-event journey as a
    '>'-delimited path string (the sessionized-journey feature a funnel/
    markov analysis feeds on). The within-group sort key (ts, event_id)
    is a TOTAL order, so the concatenation is deterministic and DuckDB's
    string_agg(... order by ...) replays it byte-identically — the
    pitfall this entry pins is that concat over collect_list without an
    explicit order is shuffle-order-dependent and irreproducible.
    Scale: row_number + listagg share ONE user-partitioned sort shuffle
    (window and aggregate co-partition); the rn <= 20 cap bounds every
    journey string regardless of per-user event count — unbounded
    listagg over a power-law user is the string-blowup analog of the
    dedup df-cap, same mitigation."""
    _tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        with firstn as (
            select user_id, event_type, ts, event_id,
                   row_number() over (partition by user_id
                                      order by ts, event_id) as rn
            from events
        )
        select user_id,
               listagg(event_type, '>')
                   within group (order by ts, event_id) as journey,
               cast(count(*) as bigint) as n_events
        from firstn where rn <= 20
        group by user_id
        """
    )


def _arrow_normalize_oracle(head: int = 3, dp: int = 6) -> str:
    scale = 10**dp
    vcols = ",\n           ".join(
        f"floor(v[{i + 1}] / l2 * {scale} + 0.5) / {scale} as v{i}"
        for i in range(head)
    )
    return f"""
    with e as (select vec_id,
                      list_transform(embedding, x -> x::DOUBLE) as v
               from embeddings),
    n as (
        select vec_id, v,
               sqrt(list_sum(list_transform(
                   v, x -> floor(x * 1e6 + 0.5) * floor(x * 1e6 + 0.5))))
               / 1e6 as l2
        from e
    )
    select vec_id,
           floor(l2 * {scale} + 0.5) / {scale} as l2,
           {vcols}
    from n order by vec_id
    """


@register("arrow_batch_normalize", _arrow_normalize_oracle())
def arrow_batch_normalize(spark, sf_dir):
    """The raw-Arrow extension seam: per-vector L2 norm + first-3
    normalized components via ``mapInArrow`` — executors stream
    RecordBatches into numpy with no pandas materialization, the
    columnar-kernel fast path of the Python extension surface (UDF/
    pandas/UDTF faces are covered by earlier entries; this is the
    fourth and last). All arithmetic is engine-portable by construction
    (integer-quantized squared sums below 2^53, floor-based half-up
    rounding), so the DuckDB oracle replays the numpy math exactly —
    see operators/arrow_ext.py for the discipline. Scale: stateless
    per-batch map, no shuffle, composes with upstream partitioning."""
    from database_extractor_spark.operators.arrow_ext import normalize_head

    return normalize_head(_tbl(spark, sf_dir, "embeddings"))


def _runtime_bloom_plan(spark, sf_dir):
    """Build the bloom-join query with runtime-filter injection forced ON
    at fixture scale (thresholds are sized for real clusters: the
    application side must look >10 GB by default). Returns the LAZY frame;
    callers must compile or execute it INSIDE this conf window — so the
    entry materializes eagerly and the plan test captures the compiled
    plan string before confs are restored (both via _with_bloom_confs)."""
    li = _tbl(spark, sf_dir, "lineitem")
    o = _tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-02-01").cast("timestamp"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            (
                F.sum(
                    F.floor(
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))
                        * 10000.0
                    ).cast("bigint")
                ).cast("double")
                / 10000.0
            ).alias("revenue"),
        )
    )


def _with_bloom_confs(spark, fn):
    """Run ``fn()`` with runtime bloom-filter injection forced on (and
    broadcast joins off, so the join is the shuffle join bloom filters
    exist for), restoring every conf afterwards via the shared
    session.conf_window. Compilation must happen inside ``fn`` — Spark
    reads these confs at optimization time."""
    from database_extractor_spark.session import conf_window

    with conf_window(
        spark,
        {
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    ):
        return fn()


@register(
    "runtime_bloom_join",
    """
    select o.o_orderpriority,
           cast(count(*) as bigint) as n_lines,
           cast(sum(cast(floor(l.l_extendedprice * (1 - l.l_discount)
                               * 10000.0) as bigint)) as double) / 10000.0
               as revenue
    from lineitem l join orders o on l.l_orderkey = o.o_orderkey
    where o.o_orderdate >= timestamp '1998-01-01'
      and o.o_orderdate < timestamp '1998-02-01'
    group by o.o_orderpriority
    order by o.o_orderpriority
    """,
)
def runtime_bloom_join(spark, sf_dir):
    """Runtime bloom-filter join: a selective dim filter (one order
    month) whose qualifying KEY SET exists only at runtime is turned by
    Spark into a bloom filter and pushed into the FACT side's scan — the
    row-level sibling of dynamic partition pruning (dpp_partition_
    pruned_join prunes whole partitions; this prunes rows of an
    UNPARTITIONED fact before the join shuffle, the dominant cost when
    the fact is 100 TB and the dim keeps 1%). Injection thresholds
    assume cluster-scale inputs, so the entry forces them for the
    fixture and materializes inside that window (eager localCheckpoint;
    confs restored after — no cross-entry leakage); the injected
    might_contain filter is plan-asserted in tests. The oracle is the
    plain join — the bloom filter is a pure pre-filter (false positives
    re-checked by the join), so results are bit-identical with and
    without it."""
    return _with_bloom_confs(
        spark, lambda: _runtime_bloom_plan(spark, sf_dir).localCheckpoint(eager=True)
    )


@register(
    "url_domain_cap",
    r"""
    with u as (
        select doc_id,
               'https://' || source || '.example.com/' || lang || '/doc-'
                   || doc_id || '?ref=r' || (doc_id % 7) as url
        from documents
    ),
    parsed as (
        select doc_id,
               regexp_extract(url, '^https://([^/]+)', 1) as host,
               regexp_extract(url, '^https://[^/]+([^?]*)', 1) as path,
               regexp_extract(url, 'ref=([^&]+)', 1) as ref
        from u
    )
    select host, doc_id, path, ref from parsed
    qualify row_number() over (
        partition by host order by md5(doc_id::VARCHAR), doc_id) <= 5
    order by host, doc_id
    """,
)
def url_domain_cap(spark, sf_dir):
    """URL parsing + per-domain capping — the Common-Crawl-style step a
    web-corpus pipeline runs before anything else: canonicalize each
    document's URL, extract host/path/query fields (Spark's built-in
    ``parse_url``, JVM-side), and cap documents PER DOMAIN (md5-ranked
    row_number <= 5) so no single host dominates the corpus — the
    domain-level twin of cap_per_group. URLs are synthesized
    deterministically from (source, lang, doc_id) since the fixture
    carries no URL column; the oracle re-parses with portable regexes,
    so the entry proves parse_url's extraction against an independent
    implementation. Scale: parse is a narrow projection; the cap is one
    host-partitioned window — domains are the natural partition key and
    the md5 rank needs no global sort."""
    docs = _tbl(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/"),
        F.col("lang"), F.lit("/doc-"), F.col("doc_id").cast("string"),
        F.lit("?ref=r"), (F.col("doc_id") % 7).cast("string"),
    )
    parsed = docs.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("ref")).alias("ref"),
    )
    w = Window.partitionBy("host").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        parsed.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= 5)
        .select("host", "doc_id", "path", "ref")
    )


@register(
    "cogroup_pandas_asof",
    """
    select p.user_id, p.event_id,
           epoch_us(p.ts) - epoch_us(s.ts) as micros_since_signup
    from (select user_id, event_id, ts from events
          where event_type = 'purchase') p
    asof left join (select user_id, ts from events
                    where event_type = 'signup') s
      on p.user_id = s.user_id and s.ts <= p.ts
    order by p.user_id, p.event_id
    """,
)
def cogroup_pandas_asof(spark, sf_dir):
    """Cogrouped ``applyInPandas`` — the two-sided pandas extension face
    (``df1.groupBy(k).cogroup(df2.groupBy(k)).applyInPandas``): per
    user, each purchase is tagged with microseconds since that user's
    most recent prior-or-same-instant signup via pandas ``merge_asof``
    inside the cogroup (purchases with no prior signup keep NULL). The
    asof_join entries already cover the window-rewrite form; this entry
    pins the COGROUP seam itself — both sides hash-shuffle once, Spark
    feeds each worker two aligned frames (FlatMapCoGroupsInPandas,
    Arrow-batched), per-group state dies with the group. The integer
    micros difference leaves no FP boundary, so DuckDB's ASOF LEFT JOIN
    replays it exactly.

    The cogroup KEY is a 64-way SHARD of the user space, not user_id
    itself: FlatMapCoGroupsInPandas pays one Arrow batch pair + one
    Python call PER GROUP, so thousands of tiny per-user groups drown
    the work in invocation overhead (measured 7.6 s at sf0.1 per-user
    vs 0.4 s sharded); inside a shard the per-user as-of stays exact
    via merge_asof(by='user_id'), vectorized across that shard's users
    in one call. The same knob is the 100 TB answer: shard count scales
    with the cluster, per-shard frames stay bounded, and a hot user
    still lands in exactly one shard (its frame is user-sized, the salt
    ceiling every groupBy shares)."""
    import pandas as pd

    # the two sides are INDEPENDENT reads on purpose: branching one
    # DataFrame gives both cogroup children identical attribute ids
    # (same source lineage), and under count()-style column pruning
    # Spark 4.1 then drops user_id from the RIGHT child's Arrow frame
    # (observed: scols=[__shard, ts]) while collect() keeps it — fresh
    # reads give each side its own exprIds and the pruner keeps both
    shard = F.pmod(F.col("user_id"), F.lit(64)).alias("__shard")
    purchases = (
        _tbl(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(shard, "user_id", "event_id",
                F.col("ts").cast("timestamp").alias("ts"))
    )
    signups = (
        _tbl(spark, sf_dir, "events")
        .filter(F.col("event_type") == "signup")
        .select(shard, "user_id", F.col("ts").cast("timestamp").alias("ts"))
    )

    def merge(p: pd.DataFrame, s: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return pd.DataFrame(
                {"user_id": [], "event_id": [], "micros_since_signup": []}
            )
        p = p.sort_values("ts", kind="mergesort")
        if s.empty:
            micros = pd.array([None] * len(p), dtype="Int64")
        else:
            s2 = pd.DataFrame(
                {"ts": s["ts"], "user_id": s["user_id"], "signup_ts": s["ts"]}
            ).sort_values("ts", kind="mergesort")
            out = pd.merge_asof(p, s2, on="ts", by="user_id", direction="backward")
            micros = pd.array(
                (out["ts"] - out["signup_ts"]) // pd.Timedelta(microseconds=1),
                dtype="Int64",
            )
        return pd.DataFrame(
            {
                "user_id": p["user_id"].to_numpy(),
                "event_id": p["event_id"].to_numpy(),
                "micros_since_signup": micros,
            }
        )

    return (
        purchases.groupBy("__shard")
        .cogroup(signups.groupBy("__shard"))
        .applyInPandas(
            merge, "user_id bigint, event_id bigint, micros_since_signup bigint"
        )
    )


@register(
    "pivot_multi_agg",
    """
    select user_id,
           cast(count(*) filter (where event_type = 'purchase') as bigint)
               as purchase_n,
           cast(coalesce(sum(cast(floor(value * 1000.0) as bigint))
                    filter (where event_type = 'purchase'), 0) as bigint)
               as purchase_millis,
           cast(count(*) filter (where event_type = 'error') as bigint)
               as error_n,
           cast(coalesce(sum(cast(floor(value * 1000.0) as bigint))
                    filter (where event_type = 'error'), 0) as bigint)
               as error_millis
    from events
    group by user_id
    order by user_id
    """,
)
def pivot_multi_agg(spark, sf_dir):
    """Pivot with MULTIPLE aggregations per pivot value (the API face
    o05's take-last pivot doesn't exercise): per user, count AND
    integer-quantized value sum for each of two event types, yielding
    the cross-product columns purchase_n/purchase_millis/error_n/
    error_millis. The pivot values are LISTED explicitly — at 100 TB an
    unlisted pivot costs a distinct-scan job before the real one, and
    an unbounded value set explodes the schema; listing keeps it one
    hash-aggregate pass (Catalyst compiles listed-value pivot to
    conditional aggregates — exactly the oracle's FILTER form). Missing
    combinations are coalesced to 0 so both engines agree on absent
    groups."""
    ev = _tbl(spark, sf_dir, "events")
    piv = (
        ev.groupBy("user_id")
        .pivot("event_type", ["purchase", "error"])
        .agg(
            F.count(F.lit(1)).alias("n"),  # count(*) is rejected inside pivot
            F.sum(F.floor(F.col("value") * 1000.0).cast("bigint")).alias("millis"),
        )
    )
    return piv.select(
        "user_id",
        *[
            F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(c)
            for c in ("purchase_n", "purchase_millis", "error_n", "error_millis")
        ],
    )


_LATERAL_TOPK_SQL = """
    select n.n_name, t.c_custkey, t.c_acctbal
    from nation n, lateral (
        select c.c_custkey, c.c_acctbal
        from customer c
        where c.c_nationkey = n.n_nationkey
        order by c.c_acctbal desc, c.c_custkey
        limit 2
    ) t
    order by n.n_name, t.c_acctbal desc, t.c_custkey
    """


@register("lateral_topk_per_key", _LATERAL_TOPK_SQL)
def lateral_topk_per_key(spark, sf_dir):
    """Correlated LATERAL subquery (SQL:2016 lateral derived table,
    Spark 4): the two highest-balance customers of every nation, written
    as ``from nation, lateral (... where correlated order by ... limit
    2)`` — the per-row-subquery surface that analysts reach for before
    window functions. Catalyst DECORRELATES it: the compiled plan is a
    nation-partitioned rank filter joined back on an equi-key
    (BroadcastHashJoin — asserted cartesian/BNLJ-free by the registry
    lint), i.e. the same physical shape as the window-function rewrite,
    NOT one subquery execution per outer row. DuckDB runs the identical
    SQL text as the oracle. Scale: whatever the outer cardinality, the
    work is one partitioned top-k over customer plus one hash join —
    lateral syntax costs nothing over the hand-written window form."""
    for t in ("nation", "customer"):
        _tbl(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_LATERAL_TOPK_SQL)


@register("python_datasource_stream_sink", _qc_gate_oracle())
def python_datasource_stream_sink(spark, sf_dir):
    """The custom Python connector's STREAMING WRITE face
    (``DataSourceStreamWriter``), completing the connector matrix —
    batch read (r04), stream read (r06), batch write (r07), stream
    write (r09). Documents stream in (availableNow), each is scored by
    the frozen-weight classifier's exact integer decision, and the
    narrow (doc_id, lang, pass) projection appends through
    ``writeStream.format("jsonl_sink")`` — per batch, partitions STAGE
    files and commit(batchId) promotes them under a batch-scoped name,
    the per-batch transactionality a real streaming connector needs
    (sources/custom.py:JsonlSinkStreamWriter). The returned frame
    re-reads the sink and aggregates per language; the batch oracle
    proves the stream-written corpus is exactly the batch answer.
    Scale: the sink is partition-parallel per batch and append-only;
    exactly-once comes from the checkpoint's batch ids + the
    batch-scoped promote names."""
    import tempfile

    from database_extractor_spark.sources.custom import register_jsonl_sink
    from database_extractor_spark.streaming import stream_source

    register_jsonl_sink(spark)
    base = tempfile.mkdtemp(prefix="pyds_stream_sink_")
    out, ckpt = os.path.join(base, "out"), os.path.join(base, "ckpt")
    stream = stream_source(spark, os.path.join(sf_dir, "documents.parquet"))
    toks = T.tokens(F.lower(F.trim(F.col("text"))))
    scored = stream.select(
        "doc_id", "lang", (_qc_wsum(toks) >= 0).alias("pass")
    )
    q = (
        scored.writeStream.format("jsonl_sink")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    # a False return means the drain TIMED OUT with the query still
    # writing — reading the sink then would return a silent undercount,
    # so fail loudly (the run_available_now contract)
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError("python_datasource_stream_sink: drain exceeded 120 s")
    back = spark.read.schema("doc_id bigint, lang string, pass boolean").json(
        os.path.join(out, "part-*.jsonl")
    )
    return back.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_total"),
        F.sum(F.when(F.col("pass"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pass"),
    )


@register(
    "try_funcs",
    """
    select event_id,
           case when user_id % 5 = 0 then null
                else value / cast(user_id % 5 as double) end as safe_ratio,
           try_cast(event_type as integer) as bad_int,
           try_cast(json_extract_string(props, '$.k') as integer) as k_int,
           case when event_id % 1000 = 0 and event_id > 0 then null
                when event_id = 0 then 9223372036854775807
                else event_id end as guarded_add,
           try_cast(event_type as timestamp) as bad_ts
    from events
    order by event_id
    """,
)
def try_funcs(spark, sf_dir):
    """The error-safe ``try_*`` expression family (ANSI-mode companion
    functions): try_divide (NULL on zero divisor), try_cast (NULL on
    malformed input — here both a never-parses column and a JSON field
    that always parses), try_add (NULL on bigint overflow), and
    try_to_timestamp. At 100 TB this family IS the difference between
    a 12-hour job dying at hour 11 on one malformed row and the row
    degrading to NULL for later triage — the ingest-hardening idiom.
    All outputs are deterministic functions of the row, so the oracle
    replays them as guarded CASE expressions / TRY_CAST. Plan: one
    narrow scan, no shuffle, whole-stage codegen."""
    ev = _tbl(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.try_divide(
            F.col("value"), (F.col("user_id") % 5).cast("double")
        ).alias("safe_ratio"),
        F.try_to_number(F.col("event_type"), F.lit("999")).cast("int")
        .alias("bad_int"),
        F.get_json_object("props", "$.k").try_cast("int").alias("k_int"),
        # overflow on ~0.1% of rows, not all of them: try_add's failure
        # arm is a CAUGHT JVM ArithmeticException (~18 us/row measured —
        # 1.8 s over sf0.1 when every row overflowed), so the demo keeps
        # the NULL-on-overflow semantics on a rare slice, which is also
        # the realistic shape (overflow is the exception, not the rule)
        F.try_add(
            F.col("event_id"),
            F.when(
                F.col("event_id") % 1000 == 0, F.lit(9223372036854775807)
            ).otherwise(F.lit(0)),
        ).alias("guarded_add"),
        F.try_to_timestamp(F.col("event_type")).alias("bad_ts"),
    )


@register(
    "collation_ci_group",
    """
    with mixed as (
        select doc_id, lang,
               case when doc_id % 2 = 0 then upper(source) else source end
                   as src
        from documents
    )
    select lower(src) as source_ci, cast(count(*) as bigint) as n_docs,
           cast(count(distinct lang) as bigint) as n_langs
    from mixed
    group by lower(src)
    order by source_ci
    """,
)
def collation_ci_group(spark, sf_dir):
    """Spark 4 COLLATION support: grouping under the ``UTF8_LCASE``
    collation folds case at COMPARISON time — 'SRC3' and 'src3' land in
    one group with no normalizing projection, the engine-level answer
    to case-divergent source labels (the oracle proves equivalence by
    grouping on lower()). The grouped key's representative casing is
    whichever row the engine saw first — nondeterministic by spec — so
    the output re-lowers it; what the entry pins is the GROUPING
    behavior (group count and sizes), which is exactly what collation
    changes. Scale: collation-aware grouping hashes the collation key
    directly — same one-shuffle hash aggregate, no extra pass. Mixed
    casing is synthesized from doc_id parity since the fixture is
    all-lowercase."""
    docs = _tbl(spark, sf_dir, "documents")
    src = F.when(F.col("doc_id") % 2 == 0, F.upper("source")).otherwise(
        F.col("source")
    )
    return (
        docs.select(F.collate(src, "UTF8_LCASE").alias("src"), "lang")
        .groupBy("src")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
        )
        .select(
            F.lower(F.col("src").cast("string")).alias("source_ci"),
            "n_docs",
            "n_langs",
        )
    )


@register(
    "hll_sketch_union_distinct",
    """
    select cast(cast(ts as date) as varchar) as grain,
           count(distinct user_id) as n_users
    from events group by cast(ts as date)
    union all
    select 'ALL', count(distinct user_id) from events
    order by grain
    """,
)
def hll_sketch_union_distinct(spark, sf_dir):
    """MERGEABLE distinct-count sketches (Apache DataSketches HLL,
    Spark 4 ``hll_sketch_agg``/``hll_union_agg``): one sketch per day,
    then the month total from UNIONING the sketches — never re-scanning
    the raw data. This is the two-level shape approx_distinct (HLL++)
    can't express: HLL++ gives per-group estimates, but DataSketches
    sketches are first-class VALUES you can store, ship, and merge —
    at 100 TB the daily sketches are kilobytes persisted with the
    partition, and any date-range distinct is a sketch merge, not a
    scan. Exact-regime oracled (the approx_distinct precedent): at
    fixture cardinality (<=2k users vs lgK=14's ~8k-entry sparse-exact
    regime, pinned in tests/test_fixture_audit.py) estimate == exact
    count, so the compare is hash-exact; the approx-regime error bound
    is what degrades gracefully beyond it."""
    ev = _tbl(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    )
    per_day = daily.select(
        F.col("d").cast("string").alias("grain"),
        F.hll_sketch_estimate("sk").cast("bigint").alias("n_users"),
    )
    total = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk"))
        .cast("bigint")
        .alias("n_users")
    ).select(F.lit("ALL").alias("grain"), "n_users")
    return per_day.unionAll(total)


@register(
    "observed_metrics_extract",
    """
    select cast(count(*) as bigint) as n_rows,
           cast(sum(cast(floor(value * 1000.0) as bigint)) as bigint)
               as value_millis,
           cast(sum(case when event_type = 'error' then 1 else 0 end)
               as bigint) as n_errors
    from events
    where ts >= timestamp '2024-01-02' and ts < timestamp '2024-01-03'
    """,
)
def observed_metrics_extract(spark, sf_dir):
    """In-flight metrics via ``DataFrame.observe`` (the Observation
    API): a day-extract pass carries count / quantized value sum /
    error count as OBSERVED METRICS — computed inside the same job,
    on the same scan, at zero extra cost — and the entry returns them
    as a 1-row frame. This is the reference's timed-execution logging
    (O24, database_extractor.py's "returned table of size R x C in S s")
    upgraded to the engine-native monitoring seam: at 100 TB you cannot
    afford a second aggregate job just to know what a pipeline stage
    did, so data-quality counters ride the extraction action itself
    (the CollectMetrics operator in-plan). Exact integer metrics, so
    the oracle recomputes them directly."""
    from pyspark.sql import Observation

    ev = _tbl(spark, sf_dir, "events").filter(
        (F.col("ts").cast("timestamp") >= F.lit("2024-01-02").cast("timestamp"))
        & (F.col("ts").cast("timestamp") < F.lit("2024-01-03").cast("timestamp"))
    )
    obs = Observation("extract_metrics")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.floor(F.col("value") * 1000.0).cast("bigint"))
        .cast("bigint")
        .alias("value_millis"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("n_errors"),
    )
    # the action the metrics piggyback on — the extraction itself
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["value_millis"], m["n_errors"])],
        "n_rows bigint, value_millis bigint, n_errors bigint",
    )


def _curation_funnel_oracle() -> str:
    return f"""
    with docs as (
        select doc_id, lang, source, lower(trim(text)) as norm
        from documents
    ),
    ws as (
        select doc_id,
               {_qc_wsum_sql()} as wsum
        from (select doc_id,
                     unnest(string_split_regex(norm, '\\s+')) as token
              from docs)
        group by doc_id
    ),
    s1 as (
        select d.doc_id, d.lang, d.source, md5(d.norm) as fp, ws.wsum
        from docs d join ws using (doc_id)
    ),
    q as (select * from s1 where wsum >= 0),
    dd as (
        select * from q
        qualify row_number() over (partition by fp order by doc_id) = 1
    ),
    c as (
        select * from dd
        qualify row_number() over (
            partition by source order by md5(doc_id::VARCHAR), doc_id) <= 20
    ),
    r0 as (select lang, count(*) as n_raw from docs group by lang),
    r1 as (select lang, count(*) as n_quality from q group by lang),
    r2 as (select lang, count(*) as n_dedup from dd group by lang),
    r3 as (select lang, count(*) as n_capped from c group by lang)
    select r0.lang,
           cast(n_raw as bigint) as n_raw,
           cast(coalesce(n_quality, 0) as bigint) as n_quality,
           cast(coalesce(n_dedup, 0) as bigint) as n_dedup,
           cast(coalesce(n_capped, 0) as bigint) as n_capped
    from r0
      left join r1 using (lang)
      left join r2 using (lang)
      left join r3 using (lang)
    order by r0.lang
    """


@register("corpus_curation_funnel", _curation_funnel_oracle())
def corpus_curation_funnel(spark, sf_dir):
    """End-to-end corpus curation as ONE lazy plan — the composition
    story the per-operator entries build toward: raw documents ->
    learned quality filter (the frozen-weight classifier's exact
    integer decision, _qc_wsum >= 0) -> exact-dedup keep-first (md5
    fingerprint of normalized text, min doc_id survives) -> per-SOURCE
    document cap (md5-ranked <= 20, url_domain_cap's balance step) —
    reported as a per-language funnel (n_raw/n_quality/n_dedup/
    n_capped), the accounting a pipeline owner actually watches.
    Spark-first, SINGLE-PASS: rather than filtering per stage and
    left-joining four per-stage count aggregates (which makes Catalyst
    recompute the tokenize+score scan once per branch), every row gets
    STAGE FLAGS in one pass — q from the weight sum, the dedup-keep
    flag from a row_number over (fp, q) (among quality survivors of a
    fingerprint, exactly the oracle's partition-among-q semantics), the
    cap flag from a row_number over (source, kept) — then ONE
    conditional aggregate per language. One token scan, two partitioned
    window shuffles on the natural keys (fingerprint, source), one
    map-side-combinable aggregate. Every decision is on the md5/integer
    lane, so the chained-CTE oracle replays all three gates exactly."""
    docs = _tbl(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.col("text")))
    s1 = docs.select(
        "doc_id",
        "lang",
        "source",
        F.md5(norm).alias("fp"),
        (_qc_wsum(T.tokens(norm)) >= 0).alias("q"),
    )
    # dedup keep-first among quality survivors: partitioning by (fp, q)
    # ranks the q=true rows of a fingerprint among themselves (q=false
    # rows rank in their own never-read partition)
    rn = F.row_number().over(Window.partitionBy("fp", "q").orderBy("doc_id"))
    flagged = s1.withColumn("kept", F.col("q") & (rn == 1))
    rk = F.row_number().over(
        Window.partitionBy("source", "kept").orderBy(
            F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
        )
    )
    flagged = flagged.withColumn("capped", F.col("kept") & (rk <= 20))
    cnt = lambda c: F.sum(F.when(F.col(c), 1).otherwise(0)).cast("bigint")
    return flagged.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_raw"),
        cnt("q").alias("n_quality"),
        cnt("kept").alias("n_dedup"),
        cnt("capped").alias("n_capped"),
    )


# ==========================================================================


# ==========================================================================
# Round 14 (session 3): readability scoring, Heaps-law vocab growth
# ==========================================================================

@register(
    "readability_flesch",
    r"""
    with d as (
        select source,
               cast(len(string_split_regex(trim(text), '\s+')) as bigint)
                   as w,
               greatest(cast(len(regexp_extract_all(text, '[.!?]+'))
                             as bigint), 1) as s,
               greatest(cast(len(regexp_extract_all(lower(text),
                                                    '[aeiouy]+'))
                             as bigint),
                        cast(len(string_split_regex(trim(text), '\s+'))
                             as bigint)) as y
        from documents
        where text is not null and length(trim(text)) > 0
    ),
    scored as (
        select source, w, s, y,
               206.835 - 1.015 * (cast(w as double) / cast(s as double))
                       - 84.6 * (cast(y as double) / cast(w as double))
                   as fre,
               case when 206835 * s * w - 1015 * w * w - 84600 * y * s
                         >= 60000 * s * w
                    then 1 else 0 end as easy
        from d
    )
    select source,
           cast(count(*) as bigint) as n_docs,
           cast(sum(easy) as bigint) as n_easy_docs,
           round(cast(sum(w) as double) / cast(sum(s) as double), 6)
               as words_per_sentence,
           round(cast(sum(cast(fre as decimal(28,12))) as double)
                 / count(*), 6) as mean_fre
    from scored group by source order by source
    """,
)
def readability_flesch(spark, sf_dir):
    """FLESCH READING-EASE per corpus source — the classic readability
    quality signal (206.835 - 1.015 w/s - 84.6 syll/w) over a fully
    deterministic proxy: words = whitespace tokens, sentences =
    [.!?]+ runs (min 1), syllables = vowel-group runs [aeiouy]+
    clamped to >= 1 per word (the standard dictionary-free heuristic —
    every real word has a vowel nucleus). The per-doc score is ONE
    identical IEEE double expression on both engines; the easy-doc
    gate (FRE >= 60, "plain English") is decided in cross-multiplied
    EXACT int64 (206835*s*w - 1015*w^2 - 84600*y*s >= 60000*s*w —
    the gopher_quality_filter discipline: no FP boundary flips), and
    the per-source mean sums decimals before the final divide so it is
    aggregation-order independent. Scale: three regex counters per row,
    all codegen'd JVM-side, then one map-side-combinable aggregate on
    source — no UDFs, no extra shuffle beyond the group-by."""
    d = _tbl(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length(F.trim("text")) > 0)
    )
    w = F.size(T.tokens(F.col("text"))).cast("bigint")
    s = F.greatest(
        F.regexp_count(F.col("text"), F.lit(r"[.!?]+")).cast("bigint"),
        F.lit(1),
    )
    y = F.greatest(
        F.regexp_count(F.lower(F.col("text")), F.lit("[aeiouy]+")).cast(
            "bigint"
        ),
        w,
    )
    base = d.select("source", w.alias("w"), s.alias("s"), y.alias("y"))
    fre = (
        F.lit(206.835)
        - F.lit(1.015)
        * (F.col("w").cast("double") / F.col("s").cast("double"))
        - F.lit(84.6)
        * (F.col("y").cast("double") / F.col("w").cast("double"))
    )
    easy = (
        F.lit(206835) * F.col("s") * F.col("w")
        - F.lit(1015) * F.col("w") * F.col("w")
        - F.lit(84600) * F.col("y") * F.col("s")
        >= F.lit(60000) * F.col("s") * F.col("w")
    ).cast("long")
    scored = base.select("source", "w", "s", fre.alias("fre"), easy.alias("easy"))
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("easy").cast("bigint").alias("n_easy_docs"),
            F.round(
                F.sum("w").cast("double") / F.sum("s").cast("double"), 6
            ).alias("words_per_sentence"),
            F.round(
                F.sum(F.col("fre").cast("decimal(28,12)")).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_fre"),
        )
        .orderBy("source")
    )


@register(
    "vocab_growth_curve",
    r"""
    with mx as (select max(doc_id) as m from documents),
    d as (
        select doc_id,
               least(10, greatest(1,
                   (doc_id * 10 + m.m - 1) // m.m)) as b,
               string_split_regex(lower(trim(text)), '\s+') as t
        from documents, mx m
    ),
    per_doc as (
        select b, cast(1 as bigint) as nd,
               cast(len(t) as bigint) as nt
        from d
    ),
    doc_b as (
        select b, cast(sum(nd) as bigint) as n_docs_b,
               cast(sum(nt) as bigint) as n_tokens_b
        from per_doc group by b
    ),
    first_seen as (
        select word, min(b) as fb
        from (select b, unnest(t) as word from d)
        group by word
    ),
    vocab_b as (
        select fb as b, cast(count(*) as bigint) as n_vocab_b
        from first_seen group by fb
    ),
    doc_cum as (
        select unnest(generate_series(b, 10)) as decile,
               n_docs_b, n_tokens_b
        from doc_b
    ),
    voc_cum as (
        select unnest(generate_series(b, 10)) as decile, n_vocab_b
        from vocab_b
    ),
    dc as (select decile, cast(sum(n_docs_b) as bigint) as n_docs,
                  cast(sum(n_tokens_b) as bigint) as n_tokens
           from doc_cum group by decile),
    vc as (select decile, cast(sum(n_vocab_b) as bigint) as n_vocab
           from voc_cum group by decile)
    select cast(dc.decile as int) as decile, n_docs, n_tokens,
           coalesce(n_vocab, 0) as n_vocab
    from dc left join vc using (decile)
    order by decile
    """,
)
def vocab_growth_curve(spark, sf_dir):
    """HEAPS'-LAW VOCABULARY GROWTH — distinct-vocabulary size vs corpus
    size at ten ingestion checkpoints (does the next 10% of the corpus
    still add new words, or has vocabulary saturated? — the marginal-
    value curve behind "is more of this source worth crawling").
    Checkpoints are doc_id deciles computed in EXACT integer arithmetic
    ((doc_id*10 + max-1) div max — no FP boundary), and the cumulative
    counts avoid both a global window (lint-barred) and a triangular
    self-join: each per-bucket partial EXPLODES to the checkpoints it
    feeds via sequence(b, 10) — a bounded x10 map-side fan-out — and
    one group-by sums them. The vocabulary side needs only each word's
    FIRST doc (min(doc_id); its bucket is bucket(min), legal because
    the bucket is monotone in doc_id): one shuffle on word, output one
    row per word, re-aggregated to <= N rows keyed by first-doc. Both
    lanes UNION before the decile denominator attaches, so the 1-row
    max(doc_id) aggregate rides exactly ONE nested-loop attach (the
    lint-pinned scalar shape). Every output value is an exact bigint —
    no doubles anywhere. Scale: the word-grain shuffle is the same
    exchange every tf-idf/vocab entry pays; everything after the two
    doc_id-grain partials is <= 10 rows per mapper."""
    docs = _tbl(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", T.tokens(F.lower(F.trim(F.col("text")))).alias("t")
    )
    lane_doc = d.select(
        "doc_id",
        F.lit(1).cast("bigint").alias("nd"),
        F.size("t").cast("bigint").alias("nt"),
        F.lit(0).cast("bigint").alias("nv"),
    )
    lane_vocab = (
        d.select("doc_id", F.explode("t").alias("word"))
        .groupBy("word")
        .agg(F.min("doc_id").alias("fd"))
        .groupBy("fd")
        .agg(F.count("*").cast("bigint").alias("nv"))
        .select(
            F.col("fd").alias("doc_id"),
            F.lit(0).cast("bigint").alias("nd"),
            F.lit(0).cast("bigint").alias("nt"),
            "nv",
        )
    )
    mx = docs.agg(F.max("doc_id").alias("m"))
    both = (
        lane_doc.unionByName(lane_vocab)
        .crossJoin(F.broadcast(mx))
        .select(
            F.least(
                F.lit(10),
                F.greatest(F.lit(1), F.expr("(doc_id * 10 + m - 1) div m")),
            ).alias("b"),
            "nd",
            "nt",
            "nv",
        )
    )
    return (
        both.select(
            F.explode(F.sequence(F.col("b"), F.lit(10))).alias("decile"),
            "nd",
            "nt",
            "nv",
        )
        .groupBy("decile")
        .agg(
            F.sum("nd").cast("bigint").alias("n_docs"),
            F.sum("nt").cast("bigint").alias("n_tokens"),
            F.sum("nv").cast("bigint").alias("n_vocab"),
        )
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n_docs",
            "n_tokens",
            "n_vocab",
        )
        .orderBy("decile")
    )


@register(
    "char_entropy_quality",
    """
    with d as (
        select doc_id, text, length(text) as n
        from documents
        where text is not null and length(text) > 0
    ),
    ch as (
        select doc_id, n, unnest([substr(text, i, 1)
                                  for i in range(1, n + 1)]) as c
        from d
    ),
    cc as (
        select doc_id, any_value(n) as n, c,
               cast(count(*) as bigint) as k
        from ch group by doc_id, c
    )
    select doc_id,
           cast(any_value(n) as bigint) as n_chars,
           cast(count(*) as bigint) as n_distinct_chars,
           round(cast(sum(cast(
               -(cast(k as double) / n) * ln(cast(k as double) / n)
               as decimal(18,12))) as double), 6) as char_entropy
    from cc
    group by doc_id
    order by doc_id
    """,
)
def char_entropy_quality(spark, sf_dir):
    """Per-document CHARACTER-level Shannon entropy — the gibberish/
    binary-spill detector (distinct capability vs entropy_profile,
    which profiles the per-day EVENT-TYPE mix, and vs the word-level
    quality lanes — gopher gates, repetition scores, lang-id: a doc of
    base64 noise or one repeated character passes word-count gates but
    sits at the entropy extremes; near-0 = degenerate repetition,
    near-ln(alphabet) = encrypted/compressed spill. This is the
    char-statistics leg of a quality stack, standard in crawl
    cleaning). NULL/empty docs are excluded on both engines (no
    distribution to measure — the quality_score_auc exclusion rule).
    Exactness: the per-char probability and its -p*ln(p) term run the
    identical IEEE sequence on both engines (the entropy_profile
    discipline) and term sums go through decimal(18,12) so summation
    order cannot drift; round 6 displays. Scale: one explode to
    |total chars| rows, one (doc, char) map-side-combinable count,
    one per-doc fold — the corpus-scan shape every text op pays, no
    joins at all."""
    d = (
        _tbl(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.length("text") > 0))
        .select("doc_id", "text", F.length("text").alias("n"))
    )
    ch = d.select(
        "doc_id",
        "n",
        F.explode(
            F.expr("transform(sequence(1, n), i -> substring(text, i, 1))")
        ).alias("c"),
    )
    cc = ch.groupBy("doc_id", "c").agg(
        F.first("n").alias("n"), F.count("*").cast("bigint").alias("k")
    )
    p = F.col("k").cast("double") / F.col("n")
    term = (-p * F.log(p)).cast("decimal(18,12)")
    return (
        cc.groupBy("doc_id")
        .agg(
            F.first("n").cast("bigint").alias("n_chars"),
            F.count("*").cast("bigint").alias("n_distinct_chars"),
            F.round(F.sum(term).cast("double"), 6).alias("char_entropy"),
        )
        .orderBy("doc_id")
    )
