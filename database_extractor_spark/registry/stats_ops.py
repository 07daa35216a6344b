"""Statistical-rigor + subset-selection operators (round 16):
uncertainty quantification, chance-corrected agreement, and submodular
coreset selection over corpus data.

Split rationale: sharding_ops sits near the 4k-line module-split
invariant; this module holds the round-16+ families and registers LAST
so it may compose entries from every earlier module (the sharding_ops
rule). Entry bodies follow the registry conventions documented in
``_base``.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from database_extractor_spark.registry._base import (
    register,
    _tbl,
)
from database_extractor_spark.registry.text_graph_ops import (
    _qc_wsum_sql,
)
from database_extractor_spark.registry.streaming_bpe_ops import (
    _GOPHER_STOP_SQL,
)

# Poisson(1) CDF quantized to integer millionths — the deterministic
# pseudo-Poisson lane both engines share (u = md5 % 1e6; w = #thresholds
# exceeded). Exact Poisson-ness is irrelevant to portability: any fixed
# integer thresholds give identical weights on both engines; these sit
# within 1e-6 of the true CDF so the replicate weights are statistically
# a Poisson(1) bootstrap.
_POIS1_CDF_PPM = (367879, 735759, 919699, 981012, 996340, 999406)
_N_BOOT_REPS = 64


def _pois1_case_sql(u: str) -> str:
    whens = " ".join(
        f"when {u} < {t} then {i}" for i, t in enumerate(_POIS1_CDF_PPM)
    )
    return f"case {whens} else {len(_POIS1_CDF_PPM)} end"


@register(
    "metric_bootstrap_ci",
    f"""
    with r as (select unnest(range({_N_BOOT_REPS})) as b),
    u as (
        select d.n_chars, r.b,
               ('0x' || substr(md5(cast(d.doc_id as varchar) || '-' ||
                                   cast(r.b as varchar)), 1, 8))::bigint
                   % 1000000 as u
        from documents d cross join r
    ),
    wt as (select b, n_chars, {_pois1_case_sql('u')} as w from u),
    est as (
        select b, round(sum(w * n_chars) / cast(sum(w) as double), 6) as est
        from wt group by b having sum(w) > 0
    ),
    s as (
        select cast(count(*) as bigint) as n_replicates,
               round(avg(est), 6) as boot_mean,
               round(quantile_cont(est, 0.025), 6) as ci_lo,
               round(quantile_cont(est, 0.975), 6) as ci_hi
        from est
    ),
    p as (
        select cast(count(*) as bigint) as n_docs,
               round(avg(n_chars), 6) as point_mean
        from documents
    )
    select p.n_docs, p.point_mean, s.n_replicates, s.boot_mean,
           s.ci_lo, s.ci_hi
    from p cross join s
    """,
)
def metric_bootstrap_ci(spark, sf_dir):
    """POISSON-BOOTSTRAP CONFIDENCE INTERVAL for a corpus metric (mean
    document length) — UNCERTAINTY QUANTIFICATION, a capability no
    other entry carries: every existing eval reports a point number;
    this one reports how much that number would move under resampling,
    the error bar a data-quality dashboard needs before calling a
    corpus change significant. Classic index-picking bootstrap is
    unrunnable at 100 TB (each replicate re-samples n rows WITH
    replacement by index); the Poisson bootstrap (Chamandy et al.,
    "Estimating Uncertainty for Massive Data Streams", Google 2012) is
    the standard at-scale substitute: each row independently receives a
    Poisson(1) weight per replicate, so ALL replicates ride ONE scan as
    an explode x 64 with a per-replicate weighted mean — map-side
    combinable, 64 groups, no index structure. Determinism: the weight
    is an inverse-CDF lookup on an integer md5 lane (millionth
    thresholds, _POIS1_CDF_PPM), so both engines draw IDENTICAL
    weights. The CI is the 2.5/97.5 interpolated quantile of the
    replicate means (percentile <-> quantile_cont parity, the
    percentile_agg precedent); replicates with all-zero weight (only
    possible on degenerate few-doc fixtures) drop on both sides via
    the sum(w) > 0 gate. The 1-row replicate summary attaches to the
    1-row point-estimate aggregate — the whitelisted scalar shape."""
    docs = _tbl(spark, sf_dir, "documents").select("doc_id", "n_chars")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "-",
                        F.col("doc_id").cast("string"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 1000000
    )
    w = F.when(u < _POIS1_CDF_PPM[0], 0)
    for i, t in enumerate(_POIS1_CDF_PPM[1:], start=1):
        w = w.when(u < t, i)
    w = w.otherwise(len(_POIS1_CDF_PPM))
    wt = docs.select(
        "n_chars",
        F.explode(F.sequence(F.lit(0), F.lit(_N_BOOT_REPS - 1))).alias("b"),
        "doc_id",
    ).select("b", "n_chars", w.alias("w"))
    est = (
        wt.groupBy("b")
        .agg(
            F.sum(F.col("w") * F.col("n_chars")).alias("__sw"),
            F.sum("w").alias("__tw"),
        )
        .filter(F.col("__tw") > 0)
        .select(
            "b",
            F.round(
                F.col("__sw").cast("double") / F.col("__tw").cast("double"), 6
            ).alias("est"),
        )
    )
    s = est.agg(
        F.count("*").cast("bigint").alias("n_replicates"),
        F.round(F.avg("est"), 6).alias("boot_mean"),
        F.round(F.expr("percentile(est, 0.025)"), 6).alias("ci_lo"),
        F.round(F.expr("percentile(est, 0.975)"), 6).alias("ci_hi"),
    )
    p = docs.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("point_mean"),
    )
    return p.crossJoin(F.broadcast(s)).select(
        "n_docs", "point_mean", "n_replicates", "boot_mean", "ci_lo", "ci_hi"
    )


@register(
    "rater_agreement_kappa",
    rf"""
    with t as (
        select doc_id,
               unnest(string_split_regex(lower(trim(text)), '\s+')) as token
        from documents
    ),
    a as (
        select doc_id,
               cast(count(*) as bigint) as n_words,
               cast(sum(len(token)) as bigint) as sum_len,
               cast(sum(case when token in ({_GOPHER_STOP_SQL})
                        then 1 else 0 end) as bigint) as n_stop,
               cast(sum(case when regexp_matches(token, '[a-z]')
                        then 1 else 0 end) as bigint) as n_alpha,
               {_qc_wsum_sql()} as wsum
        from t group by doc_id
    ),
    r as (
        select doc_id,
               ((n_words >= 20 and n_words <= 100000)
                and (sum_len >= 3 * n_words and sum_len <= 10 * n_words)
                and (50 * n_stop >= 3 * n_words)
                and (5 * n_alpha >= 4 * n_words)) as a_keep,
               wsum >= 0 as b_keep
        from a
    ),
    c as (
        select cast(count(*) as bigint) as n,
               cast(sum(case when a_keep and b_keep then 1 else 0 end)
                    as bigint) as n11,
               cast(sum(case when a_keep and not b_keep then 1 else 0 end)
                    as bigint) as n10,
               cast(sum(case when not a_keep and b_keep then 1 else 0 end)
                    as bigint) as n01,
               cast(sum(case when not a_keep and not b_keep then 1 else 0 end)
                    as bigint) as n00
        from r
    )
    select n as n_docs, n11, n10, n01, n00,
           round((n11 + n00) / cast(n as double), 6) as po,
           round(((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))
                 / cast(n * n as double), 6) as pe,
           case when n * n = (n11 + n10) * (n11 + n01)
                             + (n01 + n00) * (n10 + n00) then null
                else round(
                    (n * (n11 + n00)
                     - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)))
                    / cast(n * n
                           - ((n11 + n10) * (n11 + n01)
                              + (n01 + n00) * (n10 + n00)) as double), 6)
           end as kappa
    from c
    """,
)
def rater_agreement_kappa(spark, sf_dir):
    """COHEN'S KAPPA between two independent quality raters — the
    Gopher rule gate (rater A) and the hashed-feature linear classifier
    (rater B) — i.e. CHANCE-CORRECTED agreement. Distinct capability vs
    dedup_method_agreement, which reports RAW overlap between two dedup
    methods: raw agreement is inflated whenever both raters mostly say
    "keep"; kappa subtracts the agreement their marginal keep-rates
    would produce by chance (po - pe)/(1 - pe), the statistic an
    annotation-pipeline audit actually reads before trusting a cheap
    rater as a stand-in for an expensive one. Exactness discipline:
    both raters' decisions are INTEGER comparisons (the gopher
    cross-multiplication rules; the classifier's integer weight sum
    >= 0), the 2x2 contingency counts are exact bigints, and po/pe/
    kappa are single roundings of integer ratios — kappa's numerator
    and denominator are formed in bigint arithmetic before ONE double
    division. Degenerate guard: when either rater is constant
    (pe = 1), kappa is undefined and NULL on both engines. Plan: ONE
    token explode + ONE per-doc aggregate computes BOTH raters'
    features, then a 1-row contingency reduce — at 100 TB this is one
    shuffle keyed on doc_id, map-side combinable. The one-scan form is
    LOAD-BEARING (r16 sf10 anchor): composing the two registry entries
    and joining their frames read 130.7 s at sf10 — 5x the SUM of the
    entries run alone (26.1 s) — while this formulation reads 4.1 s;
    both raters' decisions come from the shared
    streaming_bpe_ops.quality_rater_decisions helper (one exploded-
    token aggregate computing the gopher counts AND the classifier's
    md5-bucket weight sum — definitions shared with the component
    entries, plans not), the same substrate quality_gate_agreement
    reads."""
    from database_extractor_spark.registry.streaming_bpe_ops import (
        quality_rater_decisions,
    )

    r = quality_rater_decisions(spark, sf_dir).select(
        F.col("gopher_keep").alias("a_keep"),
        F.col("cls_keep").alias("b_keep"),
    )
    c = r.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("a_keep") & F.col("b_keep"), 1).otherwise(0))
        .cast("bigint")
        .alias("n11"),
        F.sum(F.when(F.col("a_keep") & ~F.col("b_keep"), 1).otherwise(0))
        .cast("bigint")
        .alias("n10"),
        F.sum(F.when(~F.col("a_keep") & F.col("b_keep"), 1).otherwise(0))
        .cast("bigint")
        .alias("n01"),
        F.sum(F.when(~F.col("a_keep") & ~F.col("b_keep"), 1).otherwise(0))
        .cast("bigint")
        .alias("n00"),
    )
    pe_num = (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01")) + (
        F.col("n01") + F.col("n00")
    ) * (F.col("n10") + F.col("n00"))
    n2 = F.col("n") * F.col("n")
    k_num = F.col("n") * (F.col("n11") + F.col("n00")) - pe_num
    return c.select(
        F.col("n").alias("n_docs"),
        "n11",
        "n10",
        "n01",
        "n00",
        F.round(
            (F.col("n11") + F.col("n00")).cast("double")
            / F.col("n").cast("double"),
            6,
        ).alias("po"),
        F.round(pe_num.cast("double") / n2.cast("double"), 6).alias("pe"),
        F.when(n2 == pe_num, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                k_num.cast("double") / (n2 - pe_num).cast("double"), 6
            )
        )
        .alias("kappa"),
    )


# ==========================================================================
# Facility-location greedy coreset (round 16)
# ==========================================================================

_FL_POOL = 32
_FL_K = 8
_FL_QUANT = (
    "transform(embedding, x -> cast(round(cast(x as double) * 1000000.0)"
    " as bigint))"
)


def _facility_oracle() -> str:
    """Unrolled-CTE replay of the facility-location greedy (the MMR
    oracle pattern applied to coverage selection): dots are exact
    bigints of 1e6-quantized embeddings, per-step gains are exact
    hugeint sums, ties break on candidate id. Every CTE is MATERIALIZED
    (the MMR lesson: naive inlining expands the chain exponentially).
    cover{i} LEFT-joins the selected candidate's dots with a coalesce
    fallback so a pool exhausted before step K degrades to fewer output
    rows instead of wiping the cover table."""
    parts = [f"""
    with emb as materialized (
        select vec_id,
               [cast(round(cast(x as double) * 1000000.0) as bigint)
                for x in embedding] as e
        from embeddings
    ),
    cand as materialized (
        select vec_id as c_id, e as ce from emb
        where vec_id % 16 = 1 order by vec_id limit {_FL_POOL}
    ),
    d as materialized (
        select emb.vec_id as x_id, cand.c_id,
               cast(list_dot_product(emb.e::DOUBLE[], cand.ce::DOUBLE[])
                    as bigint) as dot
        from emb, cand
    ),
    cover0 as materialized (
        select vec_id as x_id, cast(0 as bigint) as cv from emb
    ),
    sel0 as materialized (
        select cast(null as bigint) as c_id, 0 as rank,
               cast(0 as hugeint) as gain
        where false
    )"""]
    for i in range(1, _FL_K + 1):
        parts.append(f""",
    g{i} as materialized (
        select d.c_id, sum(greatest(c0.cv, d.dot)) as gain
        from d join cover{i - 1} c0 on d.x_id = c0.x_id
        where d.c_id not in (select c_id from sel{i - 1})
        group by d.c_id
    ),
    s{i} as materialized (
        select c_id, {i} as rank, gain from g{i}
        order by gain desc, c_id limit 1
    ),
    sel{i} as materialized (
        select * from sel{i - 1} union all select * from s{i}
    ),
    cover{i} as materialized (
        select c0.x_id, greatest(c0.cv, coalesce(dd.dot, c0.cv)) as cv
        from cover{i - 1} c0
        left join d dd on dd.x_id = c0.x_id
                      and dd.c_id = (select c_id from s{i})
    )""")
    parts.append(f"""
    select cast(rank as int) as rank, c_id as vec_id,
           cast(gain as double) as coverage
    from sel{_FL_K} order by rank""")
    return "".join(parts)


def _facility_dots_plan(
    spark: SparkSession, sf_dir: str, cand_vecs: list
) -> DataFrame:
    """The DISTRIBUTED stage of facility_location_coreset: one
    projection computing, per corpus vector, the array of exact-bigint
    dots against the literal candidate matrix — no join, no explode;
    the candidate matrix is bounded model state (<= 32 x 64 bigints)
    baked in as one expr literal (the _qc_weights / minhash-lane
    discipline: one parsed string, not 2048 Py4J Column round-trips).
    Exposed separately so tests/test_plan_lint.py can assert the lazy
    pre-checkpoint plan."""
    from database_extractor_spark.registry._base import _tbl

    mat = (
        "array("
        + ",".join(
            "array(" + ",".join(f"{int(v)}L" for v in vec) + ")"
            for vec in cand_vecs
        )
        + ")"
    )
    return _tbl(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(
            f"transform({mat}, c -> aggregate(zip_with({_FL_QUANT}, c,"
            " (x, y) -> x * y), 0L, (acc, v) -> acc + v))"
        ).alias("d"),
    )


@register("facility_location_coreset", _facility_oracle())
def facility_location_coreset(spark, sf_dir):
    """FACILITY-LOCATION GREEDY CORESET — pick K=8 vectors from a
    deterministic candidate pool that together best COVER the whole
    corpus: greedy argmax of sum_x max(cover(x), <x, c>), the classic
    monotone-submodular selection (lazy/stochastic greedy is its
    production accelerant) behind "choose a representative subset for
    annotation / eval seeding / distillation". Distinct capability vs
    mmr_diversified_topk: MMR selects for relevance-to-a-QUERY with a
    diversity penalty and its greedy runs driver-side over a 50-row
    pool; facility location has NO query — its objective is coverage
    of the FULL corpus, so the expensive half (corpus-wide marginal
    gains) must stay distributed. Plan: the candidate pool (vec_id %
    16 == 1, first 32) is bounded model state; ONE checkpointed
    projection computes each corpus vector's dot array against the
    literal candidate matrix (no join — the scored table a deployment
    would persist); each greedy step is then a SINGLE map-side-
    combinable global aggregate (32 exact decimal sums of
    greatest(cover, dot) expressions over the SAME array column, cover
    = greatest over the already-selected positions) returning one row.
    Exactness: 1e6-quantized bigint dots (the MMR rule incl. the
    float->double widen), decimal(38)/hugeint gain sums, ties on
    candidate id; coverage is cast to double only at the edge, from
    identical integers on both engines. At 100 TB: K scans of an
    N x pool bigint table; the selection state never exceeds
    pool x dim ints. Early pool exhaustion (degenerate fixtures)
    yields fewer rows on both engines."""
    emb_q = _tbl(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr(_FL_QUANT).alias("e")
    )
    cands = (
        emb_q.filter(F.col("vec_id") % 16 == 1)
        .orderBy("vec_id")
        .limit(_FL_POOL)
        .collect()
    )  # bounded model state: <= 32 x 64 bigints
    if not cands:
        return spark.createDataFrame(
            [], "rank int, vec_id bigint, coverage double"
        )
    cand_ids = [int(r["vec_id"]) for r in cands]
    d = _facility_dots_plan(
        spark, sf_dir, [list(r["e"]) for r in cands]
    ).localCheckpoint(eager=True)

    selected: list[int] = []  # candidate-array indices, insertion order
    out: list[tuple[int, int, float]] = []
    zero = F.lit(0).cast("long")
    while len(out) < _FL_K and len(selected) < len(cand_ids):
        cover = (
            zero
            if not selected
            else F.greatest(
                zero, *[F.element_at("d", j + 1) for j in selected]
            )
        )
        gains_row = d.agg(
            *[
                F.sum(
                    F.greatest(cover, F.element_at("d", j + 1)).cast(
                        "decimal(38,0)"
                    )
                ).alias(f"g{j}")
                for j in range(len(cand_ids))
            ]
        ).collect()[0]
        best = max(
            (
                (int(gains_row[f"g{j}"]), -cand_ids[j], j)
                for j in range(len(cand_ids))
                if j not in selected
            ),
        )
        gain, _, j = best
        selected.append(j)
        out.append((len(out) + 1, cand_ids[j], float(gain)))
    d.unpersist()
    return spark.createDataFrame(out, "rank int, vec_id bigint, coverage double")


# ==========================================================================
# Canary / memorization leak scan (round 16)
# ==========================================================================

_CANARY_SRC_DOCS = (7, 21, 98)
_CANARY_LEN = 24


def _canary_oracle() -> str:
    rows = []
    for i, d in enumerate(_CANARY_SRC_DOCS, start=1):
        needle = (
            f"(select substr(trim(text), 1, {_CANARY_LEN}) "
            f"from documents where doc_id = {d})"
        )
        rows.append(f"""
    select {i} as canary_id, cast({d} as bigint) as src_doc_id,
           cast(coalesce(len({needle}), 0) as int) as needle_len,
           cast(coalesce(sum(case when {needle} is not null
                                   and len({needle}) > 0
                                   and contains(text, {needle})
                              then 1 else 0 end), 0) as bigint) as n_docs_hit,
           cast(coalesce(sum(case when {needle} is not null
                                   and len({needle}) > 0
                                   and contains(text, {needle})
                              then (len(text) - len(replace(text, {needle}, '')))
                                   // len({needle})
                              else 0 end), 0) as bigint) as n_occurrences
    from documents where text is not null""")
    return " union all ".join(rows) + " order by canary_id"


@register("canary_leak_scan", _canary_oracle())
def canary_leak_scan(spark, sf_dir):
    """CANARY / MEMORIZATION LEAK SCAN — exact multi-needle substring
    audit: given a set of known canary strings, count the documents and
    total occurrences of each across the WHOLE corpus. This is the
    memorization-control primitive (the BIG-bench canary-GUID
    discipline): a training pipeline scans every release for its
    planted canaries and for known eval needles, and a nonzero hit
    outside the expected source is a leak. Distinct capability vs
    decontaminate_ngram_overlap (fuzzy n-gram OVERLAP between two
    corpus sides) — this is EXACT needle containment for a small known
    set, the cheap audit that runs on every release. Fixture needles
    are planted deterministically (the first 24 chars of three fixed
    docs), so hits are guaranteed nonzero (the source doc plus the
    fixture's exact duplicates) and the oracle replays the same
    extraction. Plan: the needles are bounded model state (3 short
    strings); the scan is ONE pass with literal contains/replace
    expressions folded into a single global aggregate — no join, no
    shuffle beyond the 1-row reduce; occurrence counts use the
    portable length-difference identity. NULL/short source texts
    degrade to 0-hit rows identically on both engines. At 100 TB: one
    vectorized substring pass; thousands of needles would move to an
    Aho-Corasick mapInPandas stage — documented threshold, not needed
    for the canary-set sizes this audit runs at."""
    docs = _tbl(spark, sf_dir, "documents")
    needles = {}  # bounded model state: 3 needles <= 24 chars
    for d in _CANARY_SRC_DOCS:
        picked = (
            docs.filter(F.col("doc_id") == d)
            .select(
                F.substring(F.trim(F.col("text")), 1, _CANARY_LEN).alias("__n")
            )
            .take(2)
        )
        # ADVICE r16: the oracle's scalar subquery errors loudly on a
        # duplicated doc_id; an unordered head() here would instead pick
        # an arbitrary row and surface as a confusing hash mismatch —
        # fail the same way the oracle does.
        if len(picked) > 1:
            raise ValueError(
                f"canary source doc_id={d} is duplicated in the fixture; "
                "the oracle's scalar subquery would error — fix the fixture"
            )
        needles[d] = picked[0]["__n"] if picked else None
    scan = docs.filter(F.col("text").isNotNull())
    aggs = []
    for i, d in enumerate(_CANARY_SRC_DOCS, start=1):
        nd = needles[d]
        if nd is None or len(nd) == 0:
            aggs.append(F.lit(0).cast("bigint").alias(f"h{i}"))
            aggs.append(F.lit(0).cast("bigint").alias(f"o{i}"))
            continue
        hit = F.col("text").contains(F.lit(nd))
        occ = (
            (F.length("text") - F.length(F.replace(F.col("text"), F.lit(nd))))
            / F.lit(len(nd))
        ).cast("bigint")
        aggs.append(
            F.sum(F.when(hit, 1).otherwise(0)).cast("bigint").alias(f"h{i}")
        )
        aggs.append(
            F.sum(F.when(hit, occ).otherwise(0)).cast("bigint").alias(f"o{i}")
        )
    one = scan.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("canary_id"),
                F.lit(d).cast("bigint").alias("src_doc_id"),
                F.lit(
                    len(needles[d]) if needles[d] is not None else 0
                ).cast("int").alias("needle_len"),
                F.col(f"h{i}").alias("n_docs_hit"),
                F.col(f"o{i}").alias("n_occurrences"),
            )
            for i, d in enumerate(_CANARY_SRC_DOCS, start=1)
        ]
    )
    return (
        one.select(F.explode(structs).alias("c"))
        .select("c.*")
        .orderBy("canary_id")
    )


# ==========================================================================
# IVF index maintenance monitor (round 16)
# ==========================================================================

def _ivf_maint_oracle() -> str:
    from database_extractor_spark.registry.llm_ops import (
        _FIXED_SEED_IDS,
        _cos_guard,
    )

    inc = (
        "('0x' || substr(md5(cast(vec_id as varchar)), 1, 8))::bigint"
        " % 5 = 0"
    )
    return f"""
    with s as (
        select vec_id as sid, list_transform(embedding, x -> x::DOUBLE) as sv
        from embeddings
        where vec_id between {_FIXED_SEED_IDS[0]} and {_FIXED_SEED_IDS[-1]}
    ),
    e as (select vec_id, list_transform(embedding, x -> x::DOUBLE) as v
          from embeddings),
    a as (
        select e.vec_id, s.sid, {_cos_guard("e.v", "s.sv")} as c
        from e cross join s
    ),
    assign as (
        select vec_id, sid as list_id from a
        qualify row_number() over (partition by vec_id
                                   order by c desc, sid) = 1
    ),
    f as (select list_id, {inc} as incoming from assign)
    select cast(list_id as int) as list_id,
           cast(sum(case when incoming then 0 else 1 end) as bigint)
               as n_existing,
           cast(sum(case when incoming then 1 else 0 end) as bigint)
               as n_incoming,
           case when sum(case when incoming then 0 else 1 end) = 0 then null
                else cast(1000000 * sum(case when incoming then 1 else 0 end)
                          // sum(case when incoming then 0 else 1 end)
                          as bigint) end as growth_ppm,
           cast(count(*) as bigint) as n_total
    from f group by list_id order by list_id
    """


@register("ivf_index_maintenance", _ivf_maint_oracle())
def ivf_index_maintenance(spark, sf_dir):
    """IVF INDEX MAINTENANCE MONITOR — per-list growth under
    incremental ingest against the FROZEN production quantizer: split
    the indexed corpus into the existing set and an incoming batch
    (deterministic md5 bucket, 20%), and report per inverted list how
    many vectors each cohort contributes and the growth rate in ppm.
    This is the INDEX LIFECYCLE capability the ANN family lacked:
    sim_recall_eval scores answer quality, ivf_silhouette_eval scores
    partition quality at build time — this one monitors DRIFT of
    arriving data against a quantizer that no longer sees it, the
    number a deployment alarms on to schedule a retrain (a list whose
    growth_ppm is a multiple of its peers means new content the frozen
    centroids cannot spread). Plan: assignments come from the SAME
    persisted index artifact the search entries serve from
    (_cached_ann_index('ivf_fixed_v') — maintenance reads the index,
    it never re-derives it), then one hash aggregate on the 16 list
    ids. Growth is exact integer ppm (1e6-scaled div), NULL for an
    empty existing list rather than a divide-by-zero. At 100 TB the
    monitor costs one scan of the (vec_id, list) index table."""
    from database_extractor_spark.operators import similarity as S
    from database_extractor_spark.registry.llm_ops import (
        _cached_ann_index,
        _fixture_seed_vecs,
    )

    e = _tbl(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    idx = _cached_ann_index(
        "ivf_fixed_v",
        sf_dir,
        spark,
        lambda: S.ivf_assign(e, _fixture_seed_vecs(sf_dir), vec_col="v"),
    ).select("vec_id", F.col("__list").alias("list_id"))
    incoming = (
        F.conv(
            F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 5
        == 0
    )
    agg = idx.groupBy(F.col("list_id").cast("int").alias("list_id")).agg(
        F.sum(F.when(incoming, 0).otherwise(1)).cast("bigint").alias(
            "n_existing"
        ),
        F.sum(F.when(incoming, 1).otherwise(0)).cast("bigint").alias(
            "n_incoming"
        ),
        F.count("*").cast("bigint").alias("n_total"),
    )
    return agg.select(
        "list_id",
        "n_existing",
        "n_incoming",
        F.when(F.col("n_existing") == 0, F.lit(None).cast("bigint"))
        .otherwise(
            F.expr("1000000L * n_incoming div n_existing").cast("bigint")
        )
        .alias("growth_ppm"),
        "n_total",
    ).orderBy("list_id")


# ==========================================================================
# Scale-safe mutual nearest neighbors (round 17, VERDICT r16 item 1)
# ==========================================================================

def _mnn_cells_oracle() -> str:
    from database_extractor_spark.registry.llm_ops import _cos_guard

    return f"""
    with nl as (
        select greatest(1, cast(floor(
            sqrt(count(*) * 256.0 / 2000) + 0.5) as int)) as n
        from embeddings
    ),
    s as (
        select vec_id as sid, list_transform(embedding, x -> x::DOUBLE) as sv
        from embeddings, nl where vec_id >= 1 and vec_id <= nl.n
    ),
    e as (select vec_id, label,
                 list_transform(embedding, x -> x::DOUBLE) as v
          from embeddings),
    a0 as (
        select e.vec_id, s.sid, {_cos_guard("e.v", "s.sv")} as c
        from e cross join s
    ),
    assign as (
        select vec_id, sid as list_id from a0
        qualify row_number() over (partition by vec_id
                                   order by c desc, sid) = 1
    ),
    ea as (
        select e.vec_id, e.label, e.v, assign.list_id
        from e join assign on e.vec_id = assign.vec_id
    ),
    a as (select vec_id as a_id, label, list_id, v as av
          from ea where vec_id % 2 = 0),
    b as (select vec_id as b_id, label, list_id, v as bv
          from ea where vec_id % 2 = 1),
    pairs as (
        select a_id, b_id,
               round({_cos_guard("av", "bv")}, 6) as cos
        from a join b using (label, list_id)
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
    """


@register("mutual_nearest_neighbors_bucketed", _mnn_cells_oracle())
def mutual_nearest_neighbors_bucketed(spark, sf_dir):
    """SCALE-SAFE MUTUAL NEAREST NEIGHBORS — the deployment shape of
    sharding_ops.mutual_nearest_neighbors (VERDICT r16 item 1): the
    fixed-label twin is the oracle-exact reference semantics but
    quadratic per label (its sf10 anchor could not complete, >35 min);
    THIS entry sub-buckets the candidate join by (label, IVF cell)
    using the SAME persisted auto-sized quantizer lane the sim_ivf_*
    family serves from — n_lists = similarity.auto_n_lists(N) grows
    with the corpus (sqrt rule: 160 cells at the 200k-vector sf10
    corpus), so per-bucket sides stay bounded and total pair volume
    stays ~linear in N instead of Sum_label |A_l| x |B_l|. Semantics:
    reciprocal top-1 cosine WITHIN the (label, cell) bucket — the
    standard ANN-shortlist approximation of MNN mining (LASER/CCMatrix
    mine candidates from an index, never brute force); the invariant
    pinned by test: any fixed-label mutual pair whose members share a
    cell is preserved here (restricting a candidate set keeps its max
    when the max is in the set). Plan: assignment is read from the
    persisted content-keyed index artifact (computed ONCE per fixture
    — maintenance/search/mining all read the same table, the
    ivf_index_maintenance discipline); per-side L2 norms hoisted into
    the side projections; the bucket join is an equi-join on
    (label, cell); BOTH sides' top-1 ranks ride the SAME pair frame as
    two sequential partitioned windows with deterministic id tie-break,
    and the mutual filter is one conjunctive predicate — never the
    branch-and-join shape that re-plans the pair pipeline per side
    (measured 329 s vs 9.8 s at sf10, BASELINE.md r17). Artifact-
    consumer plan note (VERDICT r16 item 5):
    the pair join is a self-read of the artifact — both sides scale
    together, so no broadcast pin is needed; either SMJ or
    shuffled-hash is the wanted shape at every SF. Cosines are rounded
    to 6 dp before ranking; every step replays in DuckDB from the
    IEEE-exact auto_n_lists formula, so the oracle follows any corpus
    size with one SQL string."""
    from pyspark.sql import Window

    from database_extractor_spark.operators import similarity as S
    from database_extractor_spark.registry.llm_ops import (
        _auto_seed_vecs,
        _cached_ann_index,
    )

    e = _tbl(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    n = S.auto_n_lists(e.count())
    assigned = _cached_ann_index(
        "ivf_auto_mnn_v",
        sf_dir,
        spark,
        lambda: S.ivf_assign(e, _auto_seed_vecs(sf_dir, n), vec_col="v"),
    )
    a = assigned.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("a_id"),
        "label",
        F.col("__list").alias("cell"),
        F.col("v").alias("av"),
        S.l2_norm(F.col("v")).alias("an"),
    )
    b = assigned.filter(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("b_id"),
        F.col("label").alias("label_b"),
        F.col("__list").alias("cell_b"),
        F.col("v").alias("bv"),
        S.l2_norm(F.col("v")).alias("bn"),
    )
    denom = F.col("an") * F.col("bn")
    cos = F.when(denom == 0, F.lit(0.0)).otherwise(
        S.dot(F.col("av"), F.col("bv")) / denom
    )
    pairs = a.join(
        b,
        (F.col("label") == F.col("label_b"))
        & (F.col("cell") == F.col("cell_b")),
    ).select("a_id", "b_id", F.round(cos, 6).alias("cos"))
    # BOTH ranks ride ONE pair frame as two sequential partitioned
    # windows, then one conjunctive filter — the fixed-label twin's
    # na/nb branch-and-join shape re-plans the bucket join + cos fold
    # once per branch plus a rank-1 equi-join (measured 329 s at sf10);
    # this single-pass shape reads 9.8 s on identical pair volume. The
    # ranks are independent of each other, so filtering ra=1 AND rb=1
    # on the fully-ranked frame is exactly the mutual-top-1 set.
    wa = Window.partitionBy("a_id").orderBy(F.desc("cos"), "b_id")
    wb = Window.partitionBy("b_id").orderBy(F.desc("cos"), "a_id")
    return (
        pairs.withColumn("ra", F.row_number().over(wa))
        .withColumn("rb", F.row_number().over(wb))
        .filter("ra = 1 and rb = 1")
        .select("a_id", "b_id", "cos")
        .orderBy("a_id")
    )


# ==========================================================================
# Split-conformal threshold (round 17)
# ==========================================================================

_CONF_SPLIT_SQL = (
    "('0x' || substr(md5(cast(event_id as varchar)), 1, 8))::bigint % 10"
)


@register(
    "conformal_threshold",
    f"""
    with e as (
        select event_id, event_type, value,
               {_CONF_SPLIT_SQL} < 8 as is_cal
        from events where value is not null
    ),
    pred as (
        select event_type,
               cast(sum(cast(value as decimal(18,6))) as double) / count(*)
                   as mu
        from e where is_cal group by event_type
    ),
    cal as (
        select abs(e.value - p.mu) as score
        from e join pred p using (event_type) where e.is_cal
    ),
    n as (select cast(count(*) as bigint) as n_cal from cal),
    k as (select n_cal, (9 * (n_cal + 1) + 9) // 10 as k from n),
    q as (
        select k.n_cal, k.k, s.score as qhat
        from (select score,
                     row_number() over (order by score) as rn
              from cal) s join k on s.rn = k.k
    ),
    tst as (
        select cast(count(*) as bigint) as n_test,
               cast(sum(case when abs(e.value - p.mu) <= q.qhat
                        then 1 else 0 end) as bigint) as n_covered
        from e join pred p using (event_type) cross join q
        where not e.is_cal
    )
    select q.n_cal, q.k, round(q.qhat, 6) as qhat,
           tst.n_test, tst.n_covered,
           cast(1000000 * tst.n_covered // tst.n_test as bigint)
               as coverage_ppm
    from q cross join tst
    """,
)
def conformal_threshold(spark, sf_dir):
    """SPLIT-CONFORMAL PREDICTION THRESHOLD — distribution-free
    calibrated error bounds, the eval-rigor capability next to
    metric_bootstrap_ci (DISTINCT: the bootstrap quantifies uncertainty
    OF AN AGGREGATE; conformal calibrates a PER-PREDICTION guarantee —
    "90% of future errors fall under qhat" — with the finite-sample
    k = ceil((n+1)(1-alpha)) correction, no distributional assumption;
    Vovk et al., the standard recipe for calibrated thresholds on any
    scorer). Setup: deterministic md5 80/20 calibration/test split of
    events (the split_train_val_test lane); the "model" is the
    per-event-type mean value fitted on calibration ONLY (decimal-exact
    sum/count so mu is bit-identical cross-engine); nonconformity score
    = |value - mu|; qhat = the k-th smallest calibration score as an
    EXACT ORDER STATISTIC (k = (9(n+1)+9) div 10, pure integer); the
    held-out coverage is reported in exact integer ppm — at alpha=0.1
    it lands >= 900000 by the conformal guarantee (pytest-pinned).
    Scale: one aggregate for the model (|event_types| rows, broadcast
    back), the k-th order statistic via per-score counts + the
    two-level distributed prefix-sum over 16-wide score buckets (value
    domain-bounded, no global window, no sort of the corpus), coverage
    one more scan. The qhat pick uses cumulative count >= k on the
    distinct-score lattice — ties collapse, exactly like the SQL
    row_number pick."""
    ev = _tbl(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    bucket10 = (
        F.conv(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 10
    )
    e = ev.select(
        "event_id", "event_type", "value", (bucket10 < 8).alias("is_cal")
    )
    pred = (
        e.filter("is_cal")
        .groupBy("event_type")
        .agg(
            (
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count("*")
            ).alias("mu")
        )
    )
    cal = (
        e.filter("is_cal")
        .join(F.broadcast(pred), "event_type")
        .select(F.abs(F.col("value") - F.col("mu")).alias("score"))
    )
    # distinct-score lattice with counts, then the two-level prefix sum
    sc = cal.groupBy("score").agg(F.count("*").cast("bigint").alias("c"))
    d = sc.withColumn("bk", F.floor(F.col("score") / 16).cast("long"))
    w = (
        Window.partitionBy("bk")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = (
        d.groupBy("bk")
        .agg(F.sum("c").alias("t"))
        .agg(F.sort_array(F.collect_list(F.struct("bk", "t"))).alias("a"))
        .select(
            F.explode(
                F.expr(
                    "transform(a, (s, i) -> struct(s.bk as bk, "
                    "aggregate(slice(a, 1, i), 0L, (acc, t) -> acc + t.t)"
                    " as c0))"
                )
            ).alias("s")
        )
        .select("s.bk", "s.c0")
    )
    cum = (
        d.withColumn("run", F.sum("c").over(w))
        .join(F.broadcast(carry), "bk")
        .select("score", (F.col("run") + F.col("c0")).alias("cum"))
    )
    nk = cal.agg(F.count("*").cast("bigint").alias("n_cal")).select(
        "n_cal",
        F.expr("(9 * (n_cal + 1) + 9) div 10").cast("bigint").alias("k"),
    )
    # TWO chained 1-row scalar attaches, both with global-aggregate
    # build sides (the lint's two-attach tier): k over the calibration
    # count, then qhat (itself reduced to a 1-row global aggregate)
    # over the test scan — a constant-key equi-join dodge was tried and
    # rejected: literal join keys constant-fold and the join degrades
    # to the same nested loop, less visibly
    q = (
        cum.crossJoin(F.broadcast(nk))
        .filter(F.col("cum") >= F.col("k"))
        .agg(
            F.first("n_cal").alias("n_cal"),
            F.first("k").alias("k"),
            F.min("score").alias("qhat"),
        )
    )
    tst = (
        e.filter(~F.col("is_cal"))
        .join(F.broadcast(pred), "event_type")
        .crossJoin(F.broadcast(q))
        .agg(
            F.first("n_cal").alias("n_cal"),
            F.first("k").alias("k"),
            F.first("qhat").alias("__qhat"),
            F.count("*").cast("bigint").alias("n_test"),
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("mu")) <= F.col("qhat"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_covered"),
        )
    )
    return tst.select(
        "n_cal",
        "k",
        F.round(F.col("__qhat"), 6).alias("qhat"),
        "n_test",
        "n_covered",
        F.expr("cast(1000000 * n_covered div n_test as bigint)").alias(
            "coverage_ppm"
        ),
    )
