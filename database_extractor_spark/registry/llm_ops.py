"""LLM-pipeline operators (north star): dedup, decontamination, similarity/ANN, text quality, corpus stats.

Split out of the flat registry.py in round 14; entry bodies are
unchanged — see registry/__init__.py for the aggregation contract.
"""
from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import Window
from pyspark.sql import SparkSession

from database_extractor_spark.operators import dedup as D
from database_extractor_spark.operators import similarity as S
from database_extractor_spark.operators import text as T

from database_extractor_spark.registry._base import (
    register,
    _tbl,
    _fixture_query_vec,
    _parquet_fingerprint,
)

# LLM-pipeline operators (north star)
# ==========================================================================

_NORM = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"

@register(
    "dedup_exact",
    f"select min(doc_id) as doc_id from documents group by md5({_NORM})",
)
def dedup_exact(spark, sf_dir):
    """Exact dedup keyed on normalized-md5; min-id survivor."""
    return D.exact_dedup(_tbl(spark, sf_dir, "documents"))


@register(
    "dedup_fingerprint",
    f"select doc_id, md5({_NORM}) as fingerprint from documents",
)
def dedup_fingerprint(spark, sf_dir):
    """Content-addressed document fingerprints (md5 of normalized text)."""
    return T.with_fingerprint(_tbl(spark, sf_dir, "documents")).select("doc_id", "fingerprint")


@register(
    "dedup_ngram_jaccard",
    r"""
    with words as (
        -- coalesce mirrors the engine's shingles(): a NULL-text doc
        -- gets the single ''-shingle (degenerate audit r15), exactly
        -- like the minhash oracle's words CTE
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
    sizes as (select doc_id, count(*) as n from sh group by doc_id),
    common as (
        select a.doc_id as id_a, b.doc_id as id_b, count(*) as c
        from sh a join sh b on a.s = b.s and a.doc_id < b.doc_id
        group by 1, 2
    )
    select id_a, id_b,
           round(c / (s1.n + s2.n - c), 4) as jaccard
    from common
      join sizes s1 on id_a = s1.doc_id
      join sizes s2 on id_b = s2.doc_id
    where round(c / (s1.n + s2.n - c), 4) >= 0.5
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram-shingle Jaccard >= 0.5 via inverted-index join — the
    SQL-checkable reference semantics that MinHash/LSH approximates.
    Deliberately derives shingles INLINE rather than from the r16
    _cached_shingle3 artifact — measured min-of-5 at sf0.1, the
    artifact costs this entry +0.2 s (1.46 -> 1.70) while saving
    decontaminate 2.4 s and eval_split 4.1 s. The asymmetry: this
    operator already repartitions before the explode, so its derive is
    parallel and cheap, and the artifact can only add scan+cache
    overhead; the winners previously exploded the single-file fixture
    scan SERIALLY (no repartition) and consumed the shingle table
    twice (two differently-filtered branches / the df-cap join-back),
    so materialization removed both a serialization and a duplication.
    BASELINE.md r16 records the rule; this entry doubles as the
    uncached headline control."""
    return D.ngram_jaccard_pairs(_tbl(spark, sf_dir, "documents"), threshold=0.5)


def _minhash_dup_ctes(
    num_hashes: int = 64, bands: int = 16, threshold: float = 0.7,
    max_bucket: int = 1000,
) -> str:
    """Shared DuckDB CTE prefix replaying the MinHash pipeline up to the
    verified duplicate pairs `dup(id_a < id_b)`: shingles -> 32-bit md5
    base -> universal-hash lane mins -> md5 band buckets (same
    max_bucket cap) -> agreeing-lane Jaccard estimate >= threshold.
    Used by the full-corpus components oracle and the incremental
    pairwise oracle."""
    p = D.MINHASH_PRIME
    params = D.minhash_lane_params(num_hashes)
    lanes = ",\n               ".join(
        f"min(({a} * x + {b}) % {p})" for a, b in params
    )
    rpb = num_hashes // bands
    band_structs = ",\n            ".join(
        f"{{'band': {b}, 'bucket': ('0x' || substr(md5(array_to_string("
        f"list_transform(sig[{b * rpb + 1}:{b * rpb + rpb}], e -> e::varchar),"
        f" ',')), 1, 15))::bigint}}"
        for b in range(bands)
    )
    return rf"""
    with recursive words as (
        -- coalesce mirrors the engine (with_minhash): a NULL-text doc gets
        -- an ''-shingle signature instead of vanishing from the compare
        select doc_id, string_split_regex(trim(coalesce(text, '')), '\s+') as ws
        from documents
    ),
    sh as (
        select doc_id, unnest(list_distinct(
            [array_to_string(ws[i:i+2], ' ') for i in range(1, greatest(len(ws) - 2, 1) + 1)]
        )) as s
        from words
    ),
    hx as (select doc_id, ('0x' || substr(md5(s), 1, 8))::bigint % {p} as x from sh),
    sig as (
        select doc_id, [{lanes}] as sig
        from hx group by doc_id
    ),
    banded as (
        select doc_id, unnest([
            {band_structs}
        ]) as bb from sig
    ),
    bb as (
        select doc_id, bb.band as band, bb.bucket as bucket from banded
        qualify count(*) over (partition by band, bucket) <= {max_bucket}
    ),
    pairs as (
        select distinct a.doc_id as id_a, b.doc_id as id_b
        from bb a join bb b on a.band = b.band and a.bucket = b.bucket
                           and a.doc_id < b.doc_id
    ),
    dup as (
        select id_a, id_b
        from pairs
          join sig sa on id_a = sa.doc_id
          join sig sb on id_b = sb.doc_id
        where round(len([i for i in range(1, {num_hashes + 1})
                         if sa.sig[i] = sb.sig[i]]) / {num_hashes}.0, 4)
              >= {threshold}
    )"""


def _jaccard_truth_ctes(threshold: float, with_value: bool = False) -> str:
    """sizes/common/truth CTE block: EXACT shingle-set Jaccard pairs
    >= ``threshold`` off the ``sh`` CTE of :func:`_minhash_dup_ctes` —
    the ground-truth arm shared by the three index-quality oracles
    (LSH eval, SimHash eval, threshold sweep; review r13 deduplicated
    the previously per-oracle pasted block). ``with_value`` keeps the
    rounded jaccard value on each pair (the sweep thresholds on it)."""
    val = ", round(c / (s1.n + s2.n - c), 4) as jaccard" if with_value else ""
    return f""",
    sizes as (select doc_id, count(*) as n from sh group by doc_id),
    common as (
        select a.doc_id as id_a, b.doc_id as id_b, count(*) as c
        from sh a join sh b on a.s = b.s and a.doc_id < b.doc_id
        group by 1, 2
    ),
    truth as (
        select id_a, id_b{val} from common
          join sizes s1 on id_a = s1.doc_id
          join sizes s2 on id_b = s2.doc_id
        where round(c / (s1.n + s2.n - c), 4) >= {threshold}
    )"""


def _minhash_lsh_oracle(
    num_hashes: int = 64, bands: int = 16, threshold: float = 0.7,
    max_bucket: int = 1000,
) -> str:
    """DuckDB oracle for dedup_minhash_lsh (VERDICT r6 item 5): the md5
    base hash and the seeded (a,b) lane constants are portable, so the
    oracle replays the ENTIRE pipeline bit-identically — the shared dup
    CTEs, then recursive-CTE connected components -> min-id survivors."""
    return _minhash_dup_ctes(num_hashes, bands, threshold, max_bucket) + """,
    edges as (select id_a as u, id_b as v from dup union select id_b, id_a from dup),
    reach as (
        select u, v from edges
        union
        select r.u, e.v from reach r join edges e on r.v = e.u where e.v <> r.u
    ),
    comp as (select u as node, least(u, min(v)) as cluster_id from reach group by u)
    select doc_id from documents
    where doc_id not in (select node from comp where node <> cluster_id)
    """


@register("dedup_minhash_lsh", _minhash_lsh_oracle())
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash(64) + LSH(16 bands) near-dedup survivors. FULLY oracled
    since round 7: md5-derived base hash + seeded universal-hash lanes
    (operators/dedup.py module docstring) make signatures, band buckets,
    and the Jaccard estimate DuckDB-replayable; the recursive-CTE closure
    checks the component survivors end-to-end. Recall vs exact jaccard
    additionally pinned in tests/test_llm_ops.py (>= 90%). Signatures
    come from the persisted per-content artifact (r15 — the corpus
    signature table is maintained state, not a per-query derivation)."""
    return D.minhash_dedup(
        _tbl(spark, sf_dir, "documents").select("doc_id", "text"),
        threshold=0.7,
        sigs=_cached_minhash_sigs(spark, sf_dir),
    ).select("doc_id")


_LSH_QUALITY_ORACLE = _minhash_dup_ctes() + _jaccard_truth_ctes(0.7) + """,
    m as (
        select cast((select count(*) from truth) as bigint) as n_true,
               cast((select count(*) from dup) as bigint) as n_pred,
               cast((select count(*) from truth t
                     join dup d on t.id_a = d.id_a and t.id_b = d.id_b)
                    as bigint) as n_hit
    )
    select n_true, n_pred, n_hit,
           round(n_hit / greatest(n_pred, 1), 6) as lsh_precision,
           round(n_hit / greatest(n_true, 1), 6) as lsh_recall
    from m
"""


@register("dedup_lsh_quality_eval", _LSH_QUALITY_ORACLE)
def dedup_lsh_quality_eval(spark, sf_dir):
    """Dedup-index QUALITY EVAL — the MinHash sibling of sim_recall_eval:
    precision/recall of the production LSH pipeline (64-lane signatures,
    16 band buckets, max_bucket cap, agreeing-lane estimate >= 0.7)
    against EXACT shingle-set Jaccard >= 0.7 ground truth over the same
    3-token shingle universe. This is the calibration loop every
    near-dup deployment runs before trusting banding parameters: exact
    Jaccard is affordable on an eval slice (here the whole fixture;
    in production a sampled shard), never on the full corpus. Plan:
    ground truth via the inverted-index equi-join
    (ngram_jaccard_pairs — shuffle on shingle hash, never cartesian),
    prediction via the banded bucket equi-join + signature verify, then
    ONE full-outer join of the two pair sets aggregated to a single
    (n_true, n_pred, n_hit, precision, recall) row — no scalar-attach
    nested loops, no collect. NULL-text docs are coalesced to '' so
    both arms see the minhash universe (a ''-doc pairs exactly with
    other ''-docs in either arm)."""
    docs = _tbl(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    truth = D.ngram_jaccard_pairs(docs, threshold=0.7).select("id_a", "id_b")
    # persisted signature artifact (r15): identical lanes — with_minhash
    # coalesces NULL text to '' itself, so the artifact built over raw
    # text serves the coalesced frame bit-for-bit
    sigs = _cached_minhash_sigs(spark, sf_dir)
    pred = (
        D.estimate_jaccard(D.lsh_candidate_pairs(sigs), sigs)
        .filter(F.col("est_jaccard") >= 0.7)
        .select("id_a", "id_b")
    )
    j = truth.withColumn("t", F.lit(1)).join(
        pred.withColumn("p", F.lit(1)), ["id_a", "id_b"], "full"
    )
    # outer coalesce: on a dup-free corpus the outer join is EMPTY and
    # sum-over-zero-rows is NULL, where the oracle's scalar count(*)
    # subqueries give 0 — the hash must agree on the boundary too
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
        ).alias("lsh_precision"),
        F.round(
            F.col("n_hit") / F.greatest(F.col("n_true"), F.lit(1)), 6
        ).alias("lsh_recall"),
    )


def _incremental_minhash_oracle(cut: int = 250) -> str:
    """Pairwise-rule replay over the shared dup CTEs: a batch doc
    (id >= cut) is dropped iff it appears as id_b of a verified dup pair
    — id_a < id_b always, so id_a is either a corpus doc or a
    lower-id batch doc, exactly the incremental precedence rule."""
    return _minhash_dup_ctes() + f"""
    select doc_id from documents
    where doc_id >= {cut}
      and doc_id not in (select id_b from dup where id_b >= {cut})
    order by doc_id
    """


@register("dedup_incremental_minhash", _incremental_minhash_oracle())
def dedup_incremental_minhash(spark, sf_dir):
    """Incremental NEAR-dup dedup (VERDICT r11 item 6) — the MinHash
    sibling of exact dedup_incremental, the production crawl shape: the
    'existing' corpus (ids < 250) persists only its signature/band-bucket
    table; the incoming batch (ids >= 250) anti-joins its own band
    buckets against it plus its lower-id selves, verifies candidates by
    agreeing-lane Jaccard >= 0.7, and emits surviving batch ids. The
    corpus is never self-paired and never reshuffled — at 100 TB the
    bucket table is bucketed on (band, bucket) and each daily batch's
    equi-join touches only its own buckets (operators/dedup.py::
    incremental_minhash_dedup). The tested equivalence contract: batch 1
    (corpus vs nothing) + batch 2 (batch vs corpus) reproduce a full
    single-run pairwise dedup exactly (tests/test_round12_ops.py)."""
    sigs = _cached_minhash_sigs(spark, sf_dir)
    corpus = sigs.filter(F.col("doc_id") < 250)
    batch = sigs.filter(F.col("doc_id") >= 250)
    return D.incremental_minhash_dedup(corpus, batch).select("doc_id")


#: running emitted-ids ledger per streaming-minhash sink directory —
#: the _FUNNEL_LEDGER discipline applied to the near-dup gate:
#: {out: {batch_id: [doc_id, ...]}}, entries voided on replay, rebuilt
#: from committed part files on a fresh incarnation
_MINHASH_STREAM_LEDGER: dict[str, dict[int, list]] = {}


def _stream_tmpdir(prefix: str) -> str:
    """mkdtemp for a streaming entry's sink+checkpoint base, registered
    for removal at interpreter exit (ADVICE r12: both streaming gates
    are in the bench rotation, and a per-invocation mkdtemp that nobody
    removes accumulates one sink+state directory per benchmark
    repetition in /tmp). Cleanup must be deferred — the entry RETURNS a
    lazy DataFrame over the committed jsonl files, so the directory has
    to outlive the caller's action on that frame; atexit is the
    earliest point the files are provably no longer readable."""
    import atexit
    import shutil
    import tempfile

    base = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    return base


# The ONE committed-file shape for the jsonl sink's batch-scoped commits:
# batch prefix + 16-hex job id + 32-hex task id. Every reader of a sink
# directory (ledger rebuild AND the prior-signature file selection in
# _stream_minhash_batch) must filter with THIS pattern — a looser glob
# admits foreign/partial files the ledger excludes, desynchronizing the
# dedup gate from the exactly-once ledger (ADVICE r15, medium).
_COMMITTED_PART_RE_S = r"part-b(\d+)-[0-9a-f]{16}-[0-9a-f]{32}\.jsonl\Z"


def _committed_parts(out: str) -> "dict[int, list[str]]":
    """Committed part files under ``out`` grouped by batch id — the
    single directory-listing primitive both gates share, so the ledger
    and any file-reading consumer see the identical set by
    construction."""
    import glob as _glob
    import re as _re

    committed = _re.compile(_COMMITTED_PART_RE_S)
    by_bid: dict[int, list[str]] = {}
    for f in _glob.glob(os.path.join(out, "part-b*.jsonl")):
        m = committed.match(os.path.basename(f))
        if m is not None:
            by_bid.setdefault(int(m.group(1)), []).append(f)
    return by_bid


def _ledger_rebuild(store: dict, out: str, batch_id: int, parse_file) -> dict:
    """The shared running-ledger replay discipline for per-sink-directory
    cross-batch state (used by BOTH streaming gates — the curation
    funnel's row ledger and the minhash gate's id ledger): evict oldest
    directories past 32 (committed files rebuild an evicted ledger on
    demand), VOID entries for ids >= batch_id (a replayed batch must not
    anti-join against its own earlier output), then rebuild missing
    EARLIER bids from committed part files — only names matching the
    full committed shape (batch prefix + 16-hex job id + 32-hex task id,
    the sink's structural sweep pattern) participate; a foreign part
    file is not ours to read back (ADVICE r11). Files are driver-local
    and state-bounded, so they are parsed directly via ``parse_file(path)
    -> list`` — no Spark job per read-back. Returns the ledger dict for
    ``out``. One definition so a change to the commit-name shape or the
    replay semantics cannot desynchronize the two gates."""
    ledger = store.setdefault(out, {})
    while len(store) > 32:
        oldest = next(k for k in store if k != out)
        del store[oldest]
    for bid in [b for b in ledger if b >= batch_id]:
        del ledger[bid]
    by_bid = _committed_parts(out)
    for bid, files in by_bid.items():
        if bid < batch_id and bid not in ledger:
            entries: list = []
            for f in sorted(files):
                entries.extend(parse_file(f))
            ledger[bid] = entries
    return ledger


def _prior_emitted_docs(spark, src_path: str, prior_ids: list[int]):
    """Select the source rows for ids EARLIER stream batches emitted —
    as a broadcast LEFT-SEMI join against a DataFrame of the ids
    (VERDICT r12 item 3), never ``isin(prior_ids)``: an IN-list is an
    expression whose size grows with everything the stream has ever
    emitted (unbounded driver-side plan growth, per-row linear
    evaluation), while the semi-join ships the ids as broadcast ROWS —
    constant plan shape, hash-probe evaluation, and the build side
    stays eligible for AQE bloom pushdown into the parquet scan."""
    prior_df = spark.createDataFrame(
        [(int(i),) for i in prior_ids], "doc_id bigint"
    )
    return spark.read.parquet(src_path).join(
        F.broadcast(prior_df), "doc_id", "left_semi"
    )


def _stream_source_sigs(spark, src_path: str):
    """(doc_id, minhash) over the stream's FULL source file, served from
    the persisted per-content signature artifact (r15 sf10 anchor): the
    streaming gate's prior-emitted state used to be RE-DERIVED from
    text every micro-batch — with_minhash over up to the whole emitted
    corpus, a sum over batches that is QUADRATIC in stream length
    (measured 16.4x wall-clock for 10x docs at sf10). A deployment
    maintains the signature table as state; signatures are pure per-row
    functions of the text, so the artifact rows are bit-identical to
    what incremental appends would hold, and the exactly-once ledger
    semantics are untouched (the ledger still decides WHICH ids count
    as prior). For the registry fixture this is the same artifact
    _cached_minhash_sigs serves the batch entries from."""
    d, base = os.path.split(os.path.abspath(src_path))
    table = base[:-8] if base.endswith(".parquet") else base
    return _cached_ann_index(
        f"minhash_sigs_{_SIG_RECIPE}",
        d,
        spark,
        lambda: D.with_minhash(
            spark.read.parquet(src_path).select("doc_id", "text")
        ),
        fp_table=table,
    )


def _stream_minhash_batch(spark, batch, batch_id, corpus_sigs, src_path, out):
    """One micro-batch of the STREAMING near-dup gate — module-level so a
    restart test can drive it directly with a chosen batch id.

    The batch's MinHash signatures are checked (incremental_minhash_dedup
    — band-bucket equi-joins, corpus never self-paired) against the
    persisted corpus signatures UNION the signatures of every id EARLIER
    batches emitted; survivors land through the jsonl connector's
    batch-scoped REPLACE commit (exactly-once across replay, the
    _stream_funnel_batch discipline: the ledger voids entries for
    ids >= batch_id before recomputing, and a fresh incarnation rebuilds
    prior ids from committed files only).

    Prior-batch signatures come from the PERSISTED signature artifact
    (_stream_source_sigs) via a broadcast LEFT-SEMI join on the ledger
    ids — the ledger holds only emitted ids (8 bytes each), signatures
    stay columnar on disk. r15 (sf10 anchor): re-deriving prior
    signatures from text every batch summed to QUADRATIC work over the
    stream's life (16.4x for 10x docs); the artifact read is the
    bucketed-signature-table deployment shape
    dedup_incremental_minhash documents, applied to the entry itself.
    The id selection stays a broadcast semi-join (VERDICT r12 item 3),
    never an ``isin(prior_ids)`` literal — an IN-list grows with every
    id the stream has ever emitted, while the semi-join ships the same
    ids as broadcast ROWS (hash-probe evaluation, AQE bloom-pushdown
    eligible)."""
    import json as _json

    def _parse_ids(path: str) -> list[int]:
        with open(path) as fh:
            return [
                int(_json.loads(line)["doc_id"]) for line in fh if line.strip()
            ]

    ledger = _ledger_rebuild(_MINHASH_STREAM_LEDGER, out, batch_id, _parse_ids)
    prior_ids = sorted(
        {i for bid, ids in ledger.items() if bid < batch_id for i in ids}
    )
    seen_sigs = corpus_sigs
    if prior_ids:
        # prior-emitted SIGNATURES from the persisted artifact via a
        # broadcast semi-join on the ids in the COMMITTED jsonl files
        # (r15, sf10 anchor): re-deriving signatures from text every
        # batch was quadratic over the stream's life (16.4x for 10x
        # docs), and a createDataFrame(prior_ids) literal inlines the
        # whole emitted history into the batch plan as a LocalRelation
        # — at sf1 the multi-MB plan string overflowed the stream
        # thread's stack inside Spark's redaction regex. Reading the
        # sink's own committed files keeps the ids distributed rows,
        # byte-identical to the ledger BY CONSTRUCTION: both sides list
        # the directory through _committed_parts (the strict committed
        # shape — ADVICE r15: a loose part-b* glob admitted foreign /
        # partially-written files the ledger excludes, and a name like
        # part-bx.jsonl crashed the bid parse); bid >= batch_id files
        # are excluded exactly like the ledger's replay-void rule.
        prior_files = [
            f
            for bid, files in _committed_parts(out).items()
            if bid < batch_id
            for f in files
        ]
        prior_df = spark.read.schema("doc_id bigint").json(prior_files)
        prior_sigs = _stream_source_sigs(spark, src_path).join(
            F.broadcast(prior_df), "doc_id", "left_semi"
        )
        seen_sigs = corpus_sigs.unionByName(prior_sigs)
    batch_sigs = D.with_minhash(batch.select("doc_id", "text"))
    survivors = D.incremental_minhash_dedup(seen_sigs, batch_sigs)
    emitted = sorted(int(r["doc_id"]) for r in survivors.collect())
    ledger[batch_id] = emitted
    (
        spark.createDataFrame([(i,) for i in emitted], "doc_id bigint")
        .write.format("jsonl_sink")
        .option("path", out)
        .option("replace_prefix", f"part-b{batch_id}-")
        .mode("append")
        .save()
    )


@register("streaming_minhash_dedup", _incremental_minhash_oracle())
def streaming_minhash_dedup(spark, sf_dir):
    """dedup_incremental_minhash's STREAMING form — the near-dup gate a
    live crawl runs, completing the pair (streaming_curation_funnel
    gates on EXACT fingerprints; this gates on banded MinHash): new
    documents (ids >= 250) stream in; each micro-batch's signatures
    anti-join the persisted corpus signature table plus the
    artifact-served signatures of everything earlier batches emitted
    (state, not per-batch re-derivation — r15), and surviving ids
    land through the connector's batch-scoped REPLACE commit. Under
    availableNow over the single-file fixture the stream is ONE batch,
    so the DuckDB oracle is the incremental pairwise replay
    (_incremental_minhash_oracle); the multi-batch precedence and
    replay-idempotence are pinned by tests/test_round12_ops.py."""
    from database_extractor_spark.sources.custom import register_jsonl_sink
    from database_extractor_spark.streaming import stream_source

    register_jsonl_sink(spark)
    base = _stream_tmpdir("stream_minhash_")
    out, ckpt = os.path.join(base, "out"), os.path.join(base, "ckpt")
    os.makedirs(out, exist_ok=True)
    src_path = os.path.join(sf_dir, "documents.parquet")
    # corpus signature table from the PERSISTED artifact — the same
    # maintained state the per-batch prior-id lookup already reads
    # (_stream_source_sigs), filtered to the corpus ids. r17: the entry
    # re-derived these from text (shingle explode + 64 min-aggregates)
    # every INVOCATION even though the artifact rows are bit-identical
    # by construction; the artifact read is a columnar scan instead.
    # Measured min-of-5 at sf0.1: 7.65 s -> (see OPTIMIZATION_r17.md).
    # The batch side's signatures are still derived from text per
    # micro-batch — that is the honest streaming-ingest cost.
    corpus_sigs = _stream_source_sigs(spark, src_path).filter(
        F.col("doc_id") < 250
    )
    stream = stream_source(spark, src_path).filter(F.col("doc_id") >= 250)
    q = (
        stream.writeStream.foreachBatch(
            lambda b, bid: _stream_minhash_batch(
                spark, b, bid, corpus_sigs, src_path, out
            )
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    # default drain guard sized for the driver's sf0.01/sf0.1 runs; the
    # sf10 scale anchor raises it via env (r15: at 500k docs the honest
    # drain is minutes — a fixed 180 s was the guard firing, not a hang)
    drain_s = int(os.environ.get("SPARK_GRAFT_STREAM_DRAIN_S", "180"))
    if not q.awaitTermination(drain_s):
        q.stop()
        raise TimeoutError(
            f"streaming_minhash_dedup: drain exceeded {drain_s} s"
        )
    back = spark.read.schema("doc_id bigint").json(
        os.path.join(out, "part-*.jsonl")
    )
    return back.select("doc_id").orderBy("doc_id")


def _simhash_pair_ctes(
    max_hamming: int = 6, bands: int = 4, prefix: str = ""
) -> str:
    """CTE block (no leading WITH) replaying the SimHash pipeline up to
    the verified near-pair set ``{prefix}shp(id_a < id_b, hamming)``:
    60-bit md5 token hash -> per-bit votes -> packed simhash -> 15-bit
    pigeonhole band buckets -> bit_count(xor) verify. ``prefix``
    namespaces every CTE so the block composes with the MinHash CTEs
    (which own the names sh/banded/bb) in one oracle."""
    bits = D.SIMHASH_BITS
    width = bits // bands
    q = prefix
    votes = ",\n               ".join(
        f"sum(case when (h >> {i}) & 1 = 1 then 1 else -1 end) as v{i}"
        for i in range(bits)
    )
    packed = "\n             + ".join(
        f"(case when v{i} > 0 then {1 << i} else 0 end)" for i in range(bits)
    )
    band_structs = ", ".join(
        f"{{'band': {b}, 'bucket': (sh >> {b * width}) & {(1 << width) - 1}}}"
        for b in range(bands)
    )
    return rf"""{q}toks as (
        -- coalesce mirrors the engine (simhash_table) for NULL-text docs
        select doc_id, unnest(string_split_regex(trim(coalesce(text, '')), '\s+')) as t
        from documents
    ),
    {q}th as (select doc_id, ('0x' || substr(md5(t), 1, 15))::bigint as h
              from {q}toks),
    {q}v as (
        select doc_id,
               {votes}
        from {q}th group by doc_id
    ),
    {q}s as (
        select doc_id,
               {packed}
               as sh
        from {q}v
    ),
    {q}banded as (select doc_id, sh, unnest([{band_structs}]) as bb
                  from {q}s),
    {q}bb as (select doc_id, sh, bb.band as band, bb.bucket as bucket
              from {q}banded),
    {q}shp as (
        select distinct a.doc_id as id_a, b.doc_id as id_b,
               cast(bit_count(xor(a.sh, b.sh)) as integer) as hamming
        from {q}bb a join {q}bb b on a.band = b.band and a.bucket = b.bucket
                                 and a.doc_id < b.doc_id
        where bit_count(xor(a.sh, b.sh)) <= {max_hamming}
    )"""


def _simhash_oracle(max_hamming: int = 6, bands: int = 4) -> str:
    """DuckDB oracle for dedup_simhash: replays the 60-bit md5 token hash,
    the per-bit +1/-1 votes, the packed simhash, the 15-bit pigeonhole
    band buckets, and the bit_count(xor) verification."""
    return (
        "\n    with "
        + _simhash_pair_ctes(max_hamming, bands)
        + "\n    select id_a, id_b, hamming from shp\n    "
    )


@register("dedup_simhash", _simhash_oracle())
def dedup_simhash(spark, sf_dir):
    """SimHash near-pairs (hamming <= 6) via 15-bit band buckets. FULLY
    oracled since round 7 (60-bit md5 token hash — see operators/dedup.py);
    the no-cartesian plan shape stays asserted in tests. Signatures from
    the persisted per-content artifact (r15)."""
    return D.simhash_near_pairs(
        _tbl(spark, sf_dir, "documents"),
        max_hamming=6,
        sig_df=_cached_simhash_table(spark, sf_dir),
    )


_Q0 = "(select embedding from embeddings where vec_id = 0)"

#: guarded cosine between a candidate row `e` and the query CTE `q` —
#: the oracle twin of S.cosine's zero-norm -> 0.0 contract (degenerate
#: audit r15: DuckDB's /0 is NULL, which silently reorders DESC top-k
#: against the engine's 0.0 whenever a zero vector exists)
def _cos_guard(a: str, b: str) -> str:
    """Guarded cosine SQL between two DOUBLE[] expressions — the oracle
    twin of S.cosine's zero-norm -> 0.0 contract (see _COS_EQ)."""
    na = f"sqrt(list_dot_product({a}, {a}))"
    nb = f"sqrt(list_dot_product({b}, {b}))"
    return (
        f"case when {na} * {nb} = 0 then 0.0"
        f" else list_dot_product({a}, {b}) / ({na} * {nb}) end"
    )


_COS_EQ = (
    "round(case when"
    " sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))"
    " * sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[])) = 0"
    " then 0.0"
    " else list_dot_product(e.embedding::DOUBLE[], q.qv::DOUBLE[])"
    " / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))"
    " * sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))) end, 6)"
    " as cos"
)

@register(
    "sim_bruteforce_topk",
    f"""
    with q as (select embedding as qv from embeddings where vec_id = 0)
    select vec_id, {_COS_EQ}
    from embeddings e, q
    where e.vec_id <> 0
    order by cos desc, vec_id limit 10
    """,
)
def sim_bruteforce_topk(spark, sf_dir):
    """Exact cosine top-10 for the vec_id=0 query vector (double
    precision, deterministic tiebreak)."""
    e = _tbl(spark, sf_dir, "embeddings")
    q, _ = _fixture_query_vec(sf_dir)
    return S.brute_force_topk(e, q, k=10, exclude_ids=[0])


@register(
    "sim_partitioned_topk",
    f"""
    with q as (select embedding as qv, label as ql from embeddings where vec_id = 0)
    select vec_id, {_COS_EQ}
    from embeddings e, q
    where e.label = q.ql and e.vec_id <> 0
    order by cos desc, vec_id limit 5
    """,
)
def sim_partitioned_topk(spark, sf_dir):
    """IVF-style search: prune to the query's coarse partition (label),
    then exact top-k within it."""
    e = _tbl(spark, sf_dir, "embeddings")
    q, q_label = _fixture_query_vec(sf_dir)
    return S.partitioned_topk(e.filter("vec_id <> 0"), q, "label", [q_label], k=5)


@register(
    "sim_filtered_topk",
    f"""
    with q as (select embedding as qv, label as ql
               from embeddings where vec_id = 0)
    select vec_id, {_COS_EQ}
    from embeddings e, q
    where e.vec_id % 3 = 0 and e.label <> q.ql and e.vec_id <> 0
    order by cos desc, vec_id limit 8
    """,
)
def sim_filtered_topk(spark, sf_dir):
    """METADATA-FILTERED vector search — top-k under an arbitrary
    predicate that crosses index-partition boundaries (vec_id % 3 = 0
    AND label <> query's label): the filtered-ANN serving problem.
    Partition pruning (sim_partitioned_topk) only helps when the filter
    IS the partition key; an arbitrary metadata filter needs
    PRE-filtering — apply the predicate BEFORE scoring, so the result
    is exact and k is always filled — rather than POST-filtering an ANN
    candidate list, which under-fills k exactly when the filter is
    selective (the classic filtered-HNSW failure mode). In this plan
    the predicate reaches the parquet scan (vec_id/label are scalar
    columns -> PushedFilters + row-group min/max skipping), so at 100 TB
    the selective filter prunes I/O before a single dot product runs;
    what remains is the exact lane's no-shuffle scan + TakeOrdered(k).
    For low-selectivity filters the right lane is the bucketed ANN
    (sim_ann_lsh / sim_ivf_*) with the predicate applied inside each
    probed bucket — same pre-filter principle, bounded candidates."""
    e = _tbl(spark, sf_dir, "embeddings")
    q, ql = _fixture_query_vec(sf_dir)
    filtered = e.filter(
        (F.col("vec_id") % 3 == 0)
        & (F.col("label") != F.lit(ql))
        & (F.col("vec_id") != 0)
    )
    return S.brute_force_topk(filtered, q, k=8)


_SEED_VEC_CACHE: dict[str, list] = {}

#: the frozen sampled-quantizer seed ids (sim_ivf_fixed / sim_pq_fixed):
#: 16 corpus vectors by a fixed rule — the random-sample init of KMeans,
#: frozen so the quantizer is a pure function of the data
_FIXED_SEED_IDS = list(range(1, 17))


def _fixture_seed_vecs(sf_dir: str) -> list[tuple[int, list[float]]]:
    """(vec_id, embedding) of the frozen quantizer seeds, read driver-side
    via pyarrow and cached per fixture CONTENT fingerprint (a 16-row
    parameter lookup, same pattern as _fixture_query_vec; content-keyed
    since r12 — the seeds become centroid literals in assignment plans,
    so an in-place fixture regeneration must invalidate them)."""
    key = _parquet_fingerprint(sf_dir, "embeddings")
    if key not in _SEED_VEC_CACHE:
        import pyarrow.parquet as pq

        rows = pq.read_table(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
            filters=[("vec_id", "in", _FIXED_SEED_IDS)],
        ).to_pylist()
        rows.sort(key=lambda r: r["vec_id"])
        _SEED_VEC_CACHE[key] = [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in rows
        ]
    return _SEED_VEC_CACHE[key]


_IVF_FIXED_ORACLE = f"""
    with s as (
        select vec_id as sid, list_transform(embedding, x -> x::DOUBLE) as sv
        from embeddings where vec_id between {_FIXED_SEED_IDS[0]} and {_FIXED_SEED_IDS[-1]}
    ),
    e as (select vec_id, list_transform(embedding, x -> x::DOUBLE) as v from embeddings),
    a as (
        select e.vec_id, s.sid, {_cos_guard("e.v", "s.sv")} as c
        from e cross join s
    ),
    assign as (
        select vec_id, sid as list_id from a
        qualify row_number() over (partition by vec_id order by c desc, sid) = 1
    ),
    q as (select v as qv from e where vec_id = 0),
    probes as (
        select s.sid from s, q
        order by {_cos_guard("s.sv", "q.qv")} desc, s.sid
        limit 4
    )
    select e.vec_id,
           round({_cos_guard("e.v", "q.qv")}, 6) as cos
    from e
      join assign on e.vec_id = assign.vec_id, q
    where e.vec_id <> 0 and assign.list_id in (select sid from probes)
    order by cos desc, e.vec_id limit 10
"""


@register("sim_ivf_fixed", _IVF_FIXED_ORACLE)
def sim_ivf_fixed(spark, sf_dir):
    """IVF with the FROZEN sampled-seed coarse quantizer (vec_id 1-16 as
    list centroids — KMeans' random-sample init without the Lloyd rounds):
    the fully-oracled companion to sim_ivf_kmeans (VERDICT r6 item 6).
    Same plan shape (assign -> probe 4 nearest lists -> exact top-10
    within), but every quantity is a deterministic function of the data,
    so DuckDB replays assignment, probe selection, and the ranked result
    hash-identically."""
    e = _tbl(spark, sf_dir, "embeddings")
    q, _ = _fixture_query_vec(sf_dir)
    return S.ivf_fixed_topk(
        e, _fixture_seed_vecs(sf_dir), q, k=10, nprobe=4, exclude_ids=[0]
    )


_AUTO_SEED_CACHE: dict[tuple[str, int], list[tuple[int, list[float]]]] = {}


def _auto_seed_vecs(sf_dir: str, n: int) -> list[tuple[int, list[float]]]:
    """(vec_id, embedding) of the first ``n`` corpus vectors — the
    auto-sized quantizer's frozen sampled-seed init (the
    _fixture_seed_vecs rule generalized from the pinned 16); cached per
    (fixture content fingerprint, n)."""
    key = (_parquet_fingerprint(sf_dir, "embeddings"), int(n))
    if key not in _AUTO_SEED_CACHE:
        import pyarrow.parquet as pq

        rows = pq.read_table(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
            filters=[("vec_id", ">=", 1), ("vec_id", "<=", int(n))],
        ).to_pylist()
        rows.sort(key=lambda r: r["vec_id"])
        _AUTO_SEED_CACHE[key] = [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in rows
        ]
    return _AUTO_SEED_CACHE[key]


#: sim_ivf_auto's oracle: _IVF_FIXED_ORACLE with the seed CTE sized by
#: the SAME IEEE-exact formula auto_n_lists computes driver-side —
#: floor(sqrt(count * 16^2 / 2000) + 0.5) — so the oracle follows the
#: corpus size with no per-sf string edits (every op is an
#: exactly-rounded IEEE core op in both engines; see auto_n_lists).
_IVF_AUTO_ORACLE = f"""
    with nl as (
        select greatest(1, cast(floor(
            sqrt(count(*) * 256.0 / 2000) + 0.5) as int)) as n
        from embeddings
    ),
    s as (
        select vec_id as sid, list_transform(embedding, x -> x::DOUBLE) as sv
        from embeddings, nl where vec_id >= 1 and vec_id <= nl.n
    ),
    e as (select vec_id, list_transform(embedding, x -> x::DOUBLE) as v from embeddings),
    a as (
        select e.vec_id, s.sid, {_cos_guard("e.v", "s.sv")} as c
        from e cross join s
    ),
    assign as (
        select vec_id, sid as list_id from a
        qualify row_number() over (partition by vec_id order by c desc, sid) = 1
    ),
    q as (select v as qv from e where vec_id = 0),
    probes as (
        select s.sid from s, q
        order by {_cos_guard("s.sv", "q.qv")} desc, s.sid
        limit 4
    )
    select e.vec_id,
           round({_cos_guard("e.v", "q.qv")}, 6) as cos
    from e
      join assign on e.vec_id = assign.vec_id, q
    where e.vec_id <> 0 and assign.list_id in (select sid from probes)
    order by cos desc, e.vec_id limit 10
"""


@register("sim_ivf_auto", _IVF_AUTO_ORACLE)
def sim_ivf_auto(spark, sf_dir):
    """sim_ivf_fixed with the quantizer sized by the API DEFAULT rule
    instead of a pinned constant (VERDICT r12 item 7):
    n_lists = similarity.auto_n_lists(corpus rows) — sqrt scaling
    anchored so the 2,000-vector sf0.1 embeddings corpus gets the
    entry-pinned 16 lists and the 200,000-vector sf10 corpus gets the
    MEASURED 160-list deployment point (BASELINE.md r12: 966 -> 156 s on the semdedup
    pair stage). The count() that sizes the quantizer is one bounded
    driver scalar (the Lloyd-collect discipline); everything downstream
    is sim_ivf_fixed's plan — assignment as argmax over seed literals
    (scan+project), probe-4 prune, exact top-10 within probed lists.
    The oracle sizes its seed CTE with the IDENTICAL IEEE-exact
    formula, so one SQL string follows the corpus across SFs."""
    e = _tbl(spark, sf_dir, "embeddings")
    n = S.auto_n_lists(e.count())
    q, _ = _fixture_query_vec(sf_dir)
    return S.ivf_fixed_topk(
        e, _auto_seed_vecs(sf_dir, n), q, k=10, nprobe=4, exclude_ids=[0]
    )


#: the frozen recall-eval query set (vec_id 0 plus the first seven
#: non-seed corpus ids): a SAMPLED query panel, the standard way ANN
#: index quality is measured — exact top-k is affordable for a panel,
#: never for every query
_RECALL_QUERY_IDS = [0, 17, 18, 19, 20, 21, 22, 23]

_RECALL_ORACLE = f"""
    with e as (
        select vec_id, list_transform(embedding, x -> x::DOUBLE) as v
        from embeddings
    ),
    q as (
        select vec_id as qid, v as qv from e
        where vec_id in ({", ".join(str(i) for i in _RECALL_QUERY_IDS)})
    ),
    s as (
        select vec_id as sid, v as sv from e
        where vec_id between {_FIXED_SEED_IDS[0]} and {_FIXED_SEED_IDS[-1]}
    ),
    exact as (
        select q.qid, e.vec_id
        from e join q on e.vec_id <> q.qid
        qualify row_number() over (partition by q.qid order by
            round({_cos_guard("e.v", "q.qv")}, 6) desc,
            e.vec_id) <= 10
    ),
    a as (
        select e.vec_id, s.sid, {_cos_guard("e.v", "s.sv")} as c
        from e cross join s
    ),
    assign as (
        select vec_id, sid as list_id from a
        qualify row_number() over (partition by vec_id order by c desc, sid) = 1
    ),
    probes as (
        select q.qid, s.sid from s cross join q
        qualify row_number() over (partition by q.qid order by
            {_cos_guard("s.sv", "q.qv")} desc,
            s.sid) <= 4
    ),
    ann as (
        select p.qid, e.vec_id
        from e
          join assign on e.vec_id = assign.vec_id
          join probes p on assign.list_id = p.sid
          join q on q.qid = p.qid
        where e.vec_id <> p.qid
        qualify row_number() over (partition by p.qid order by
            round({_cos_guard("e.v", "q.qv")}, 6) desc,
            e.vec_id) <= 10
    )
    select x.qid as query_id,
           cast(sum(case when n.vec_id is not null then 1 else 0 end) as bigint)
               as hits,
           round(sum(case when n.vec_id is not null then 1 else 0 end) / 10.0, 6)
               as recall_at_10
    from exact x left join ann n on x.qid = n.qid and x.vec_id = n.vec_id
    group by x.qid order by query_id
"""


_RECALL_QVEC_CACHE: dict[str, list[tuple[int, list[float]]]] = {}


def _fixture_recall_queries(sf_dir: str) -> list[tuple[int, list[float]]]:
    """(vec_id, embedding) of the frozen recall-eval query panel, read
    driver-side via pyarrow and cached per fixture CONTENT fingerprint
    (an 8-row parameter lookup, same pattern as _fixture_seed_vecs but
    content-keyed — the panel vectors become plan LITERALS, so a
    fixture regenerated in place must invalidate them, the r11-ADVICE
    staleness class)."""
    fp = _parquet_fingerprint(sf_dir, "embeddings")
    if fp not in _RECALL_QVEC_CACHE:
        import pyarrow.parquet as pq

        rows = pq.read_table(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
            filters=[("vec_id", "in", _RECALL_QUERY_IDS)],
        ).to_pylist()
        rows.sort(key=lambda r: r["vec_id"])
        _RECALL_QVEC_CACHE[fp] = [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in rows
        ]
    return _RECALL_QVEC_CACHE[fp]


@register("sim_recall_eval", _RECALL_ORACLE)
def sim_recall_eval(spark, sf_dir):
    """ANN index QUALITY EVAL: recall@10 of the frozen-seed IVF (nprobe=4,
    sim_ivf_fixed's quantizer) against exact brute-force cosine top-10,
    over the frozen 8-query panel — the measurement loop every production
    vector index ships with (recall/QPS curves are measured on a sampled
    query panel exactly like this; exact search is affordable for a
    panel, never per live query). One plan computes both sides: the
    exact arm EXPLODES a literal (qid, cosine) struct array over a
    single corpus scan — the panel vectors are plan literals, so there
    is NO join at all (the row's norm is folded once and shared across
    all 8 queries, see cosine_to_literal); the ANN arm reuses the
    materializable IVF assignment (argmax over 16 seed literals, a
    scan+project) pruned by a broadcast 32-row (query, probe) table —
    scored rows ~= N * nprobe / n_lists per query. Recall is a
    10-row-per-query left join. At 100 TB the exact arm stays ONE full
    scan for the whole panel (corpus never shuffled) and the ANN arm
    scans only probed lists — this is the eval you run once per index
    build, not per query. Both ranked arms round cosines to 6 dp before
    ranking with a vec_id tiebreak, the discipline that keeps the
    DuckDB replay hash-identical (see sim_ivf_fixed)."""
    e = _tbl(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    panel = _fixture_recall_queries(sf_dir)
    rank = Window.partitionBy("qid").orderBy(F.desc("c"), "vec_id")

    # exact arm: one corpus scan, the panel as plan literals — per row,
    # one shared norm fold + 8 dot folds, exploded to (qid, cos) rows
    # r18: panel folds assembled as ONE SQL string (VERDICT r17 item 5
    # — see similarity.panel_cosine_struct_array; bit-identical, ~0.6 s
    # of per-invocation driver expression construction removed)
    ex_structs = S.panel_cosine_struct_array("v", panel, "__vn")
    exact = (
        e.withColumn("__vn", S.l2_norm(F.col("v")))
        .select("vec_id", F.explode(ex_structs).alias("qc"))
        .select("vec_id", F.col("qc.qid").alias("qid"), F.col("qc.c").alias("c"))
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("rn", F.row_number().over(rank))
        .filter(F.col("rn") <= 10)
        .select("qid", "vec_id")
    )

    # ANN arm: IVF assignment (scan+project) pruned to each query's 4
    # nearest lists via a broadcast (qid, sid) probe table; both joins
    # are equi-joins (BroadcastHashJoin), never nested-loop
    q = e.filter(F.col("vec_id").isin(_RECALL_QUERY_IDS)).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    seeds = _fixture_seed_vecs(sf_dir)
    probe_rows = []
    for qid, qv in _fixture_recall_queries(sf_dir):
        ranked = sorted(
            ((S._pycos(qv, vec), int(sid)) for sid, vec in seeds),
            key=lambda t: (-t[0], t[1]),
        )
        probe_rows.extend((qid, sid) for _, sid in ranked[:4])
    probe_df = spark.createDataFrame(probe_rows, "qid int, sid int")

    ann = (
        # assignment served from the persisted index artifact (the
        # sim_ivf_kmeans discipline: recall is evaluated against the
        # STORED assignment the index serves from; bit-exact — parquet
        # round-trips the doubles — and the 16-centroid argmax scan
        # drops out of every warm invocation)
        _cached_ann_index(
            "ivf_fixed_v",
            sf_dir,
            spark,
            lambda: S.ivf_assign(e, seeds, vec_col="v"),
        )
        .join(F.broadcast(probe_df), F.col("__list") == F.col("sid"))
        .join(F.broadcast(q.select("qid", "qv")), "qid")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(S.cosine(F.col("v"), F.col("qv")), 6).alias("c"),
        )
        .withColumn("rn", F.row_number().over(rank))
        .filter(F.col("rn") <= 10)
        .select("qid", F.col("vec_id").alias("ann_id"), F.lit(1).alias("hit"))
    )

    return (
        exact.join(
            ann,
            (exact["qid"] == ann["qid"]) & (exact["vec_id"] == ann["ann_id"]),
            "left",
        )
        .groupBy(exact["qid"])
        .agg(F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias("hits"))
        .select(
            F.col("qid").alias("query_id"),
            "hits",
            F.round(F.col("hits") / F.lit(10.0), 6).alias("recall_at_10"),
        )
        .orderBy("query_id")
    )


def _pq_recall_oracle(m: int = 8, sub: int = 8, rerank: int = 100) -> str:
    """DuckDB replay of the PQ recall eval: the _pq_fixed_oracle encode /
    ADC / shortlist / re-rank machinery generalized with a query (qid)
    dimension over the frozen 8-query panel, then recall@10 against the
    exact squared-L2 top-10 — the ADC sum keeps the explicit
    subspace-order 8-join shape (SQL sum() has no ordering guarantee;
    IEEE addition order must match the engine's j=0..m-1 fold)."""
    qids = ", ".join(str(i) for i in _RECALL_QUERY_IDS)
    code_cols = ",\n               ".join(
        f"max(case when j = {j} then c end) as c{j}" for j in range(m)
    )
    adc_joins = "\n      ".join(
        f"join t t{j} on t{j}.qid = q.qid and t{j}.j = {j} and t{j}.c = cs.c{j}"
        for j in range(m)
    )
    adc_sum = " + ".join(f"t{j}.d" for j in range(m))
    return f"""
    with s as (
        select vec_id - 1 as c, list_transform(embedding, x -> x::DOUBLE) as sv
        from embeddings where vec_id between {_FIXED_SEED_IDS[0]} and {_FIXED_SEED_IDS[-1]}
    ),
    e as (select vec_id, list_transform(embedding, x -> x::DOUBLE) as v from embeddings),
    q as (
        select vec_id as qid, v as qv from e where vec_id in ({qids})
    ),
    cw as (
        select s.c, j.j, list_slice(s.sv, j.j * {sub} + 1, j.j * {sub} + {sub}) as cw
        from s cross join (select unnest(range({m})) as j) j
    ),
    d as (
        select e.vec_id, cw.j, cw.c,
               list_dot_product(list_slice(e.v, cw.j * {sub} + 1, cw.j * {sub} + {sub}),
                                list_slice(e.v, cw.j * {sub} + 1, cw.j * {sub} + {sub}))
               - 2.0 * list_dot_product(
                   list_slice(e.v, cw.j * {sub} + 1, cw.j * {sub} + {sub}), cw.cw)
               + list_dot_product(cw.cw, cw.cw) as d2
        from e cross join cw
    ),
    codes as (
        select vec_id, j, c from d
        qualify row_number() over (partition by vec_id, j order by d2, c) = 1
    ),
    cs as (
        select vec_id,
               {code_cols}
        from codes group by vec_id
    ),
    t as (
        select q.qid, cw.j, cw.c,
               list_dot_product(list_slice(q.qv, cw.j * {sub} + 1, cw.j * {sub} + {sub}),
                                list_slice(q.qv, cw.j * {sub} + 1, cw.j * {sub} + {sub}))
               - 2.0 * list_dot_product(
                   list_slice(q.qv, cw.j * {sub} + 1, cw.j * {sub} + {sub}), cw.cw)
               + list_dot_product(cw.cw, cw.cw) as d
        from cw cross join q
    ),
    approx as (
        select q.qid, cs.vec_id, round({adc_sum}, 6) as ad
        from cs cross join q
      {adc_joins}
    ),
    short as (
        select qid, vec_id from approx
        where vec_id <> qid
        qualify row_number() over (partition by qid order by ad, vec_id)
                <= {rerank}
    ),
    ex as (
        select q.qid, e.vec_id,
               round(list_dot_product(e.v, e.v)
                     - 2.0 * list_dot_product(e.v, q.qv)
                     + list_dot_product(q.qv, q.qv), 6) as d
        from e cross join q
        where e.vec_id <> q.qid
    ),
    exact as (
        select qid, vec_id from ex
        qualify row_number() over (partition by qid order by d, vec_id) <= 10
    ),
    ann as (
        select sh.qid, sh.vec_id
        from short sh join ex on ex.qid = sh.qid and ex.vec_id = sh.vec_id
        qualify row_number() over (partition by sh.qid order by ex.d, sh.vec_id)
                <= 10
    )
    select x.qid as query_id,
           cast(sum(case when n.vec_id is not null then 1 else 0 end) as bigint)
               as hits,
           round(sum(case when n.vec_id is not null then 1 else 0 end) / 10.0, 6)
               as recall_at_10
    from exact x left join ann n on x.qid = n.qid and x.vec_id = n.vec_id
    group by x.qid order by query_id
"""


@register("sim_pq_recall_eval", _pq_recall_oracle())
def sim_pq_recall_eval(spark, sf_dir):
    """PQ index QUALITY EVAL — the compressed-index member of the eval
    trilogy (sim_recall_eval measures IVF, dedup_lsh_quality_eval the
    MinHash bands): recall@10 of the fixed-codebook two-stage search
    (8x8 ADC lookup sum -> top-100 shortlist -> exact re-rank) against
    exact squared-L2 top-10, over the frozen 8-query panel. This is the
    number that justifies serving a ~64x-compressed index: with
    rerank=100 the shortlist must merely CONTAIN the true top-10. One
    plan, no per-query jobs: the corpus is PQ-encoded once
    (scan+project over codeword literals); each query's 8x16 ADC table
    is driver-side floats folded with the engine-identical IEEE
    sequence, and both the approx and exact arms explode literal
    per-query structs over single scans — two scans total at any corpus
    size, then windows and equi-joins. Rounding/tiebreak discipline as
    sim_pq_fixed (round 6 dp, then (dist, vec_id))."""
    m, sub, rerank = 8, 8, 100
    e = _tbl(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    panel = _fixture_recall_queries(sf_dir)
    seeds = _fixture_seed_vecs(sf_dir)

    # exact arm: one scan, per-row |v|^2 folded once and shared across
    # the panel's 8 distance literals
    # r18: distance panel assembled as ONE SQL string (VERDICT r17
    # item 5 — see similarity.panel_l2_struct_array; bit-identical)
    ex_structs = S.panel_l2_struct_array("v", panel, "__dxx")
    dists = (
        e.withColumn("__dxx", S.dot(F.col("v"), F.col("v")))
        .select("vec_id", F.explode(ex_structs).alias("qd"))
        .select("vec_id", F.col("qd.qid").alias("qid"), F.col("qd.d").alias("d"))
        .filter(F.col("vec_id") != F.col("qid"))
    )
    rank_d = Window.partitionBy("qid").orderBy("d", "vec_id")
    exact = (
        dists.withColumn("rn", F.row_number().over(rank_d))
        .filter(F.col("rn") <= 10)
        .select("qid", "vec_id")
    )

    # ADC arm: encode served from the persisted index artifact (the
    # sim_pq_topk discipline — a deployment evals recall against the
    # STORED codes it serves from, not a fresh encode; the artifact is
    # the materialized output of this exact build, parquet round-trips
    # doubles bit-exactly, and the encode expression tree + its codegen
    # drop out of every warm invocation)
    enc = _cached_ann_index(
        "pq_fixed_v", sf_dir, spark, lambda: S.pq_encode(e, seeds, m, vec_col="v")
    )
    books = S.pq_codebooks(seeds, m)
    # r18: the 8-query x m-subspace ADC lookup panel as ONE SQL string
    # (same {x!r}D literal round-trip; element_at/+ shapes unchanged)
    adc_parts = []
    for qid, qv in panel:
        lookups = []
        for j in range(m):
            qj = qv[j * sub:(j + 1) * sub]
            table = [
                S._pydot(qj, qj) - 2.0 * S._pydot(qj, cw) + S._pydot(cw, cw)
                for cw in books[j]
            ]
            arr = "array(" + ",".join(f"{float(x)!r}D" for x in table) + ")"
            lookups.append(f"element_at({arr}, (__code{j} + 1))")
        adc_parts.append(
            f"struct({int(qid)} as qid, round({' + '.join(lookups)}, 6) as ad)"
        )
    adc_structs = F.expr("array(" + ",".join(adc_parts) + ")")
    short = (
        enc.select("vec_id", F.explode(adc_structs).alias("qa"))
        .select("vec_id", F.col("qa.qid").alias("qid"), F.col("qa.ad").alias("ad"))
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("qid").orderBy("ad", "vec_id")),
        )
        .filter(F.col("rn") <= rerank)
        .select("qid", "vec_id")
    )
    ann = (
        short.join(dists, ["qid", "vec_id"])
        .withColumn("rn", F.row_number().over(rank_d))
        .filter(F.col("rn") <= 10)
        .select("qid", F.col("vec_id").alias("ann_id"), F.lit(1).alias("hit"))
    )

    return (
        exact.join(
            ann,
            (exact["qid"] == ann["qid"]) & (exact["vec_id"] == ann["ann_id"]),
            "left",
        )
        .groupBy(exact["qid"])
        .agg(F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias("hits"))
        .select(
            F.col("qid").alias("query_id"),
            "hits",
            F.round(F.col("hits") / F.lit(10.0), 6).alias("recall_at_10"),
        )
        .orderBy("query_id")
    )


def _pq_fixed_oracle(m: int = 8, sub: int = 8, rerank: int = 100) -> str:
    """DuckDB oracle for sim_pq_fixed: replays encode (argmin over the 16
    sampled codewords per subspace, dot-identity distances), the ADC
    lookup sum in subspace order, the shortlist, and the exact re-rank."""
    code_cols = ",\n               ".join(
        f"max(case when j = {j} then c end) as c{j}" for j in range(m)
    )
    adc_joins = "\n      ".join(
        f"join t t{j} on t{j}.j = {j} and t{j}.c = cs.c{j}" for j in range(m)
    )
    adc_sum = " + ".join(f"t{j}.d" for j in range(m))
    return f"""
    with s as (
        select vec_id - 1 as c, list_transform(embedding, x -> x::DOUBLE) as sv
        from embeddings where vec_id between {_FIXED_SEED_IDS[0]} and {_FIXED_SEED_IDS[-1]}
    ),
    e as (select vec_id, list_transform(embedding, x -> x::DOUBLE) as v from embeddings),
    cw as (
        select s.c, j.j, list_slice(s.sv, j.j * {sub} + 1, j.j * {sub} + {sub}) as cw
        from s cross join (select unnest(range({m})) as j) j
    ),
    d as (
        select e.vec_id, cw.j, cw.c,
               list_dot_product(list_slice(e.v, cw.j * {sub} + 1, cw.j * {sub} + {sub}),
                                list_slice(e.v, cw.j * {sub} + 1, cw.j * {sub} + {sub}))
               - 2.0 * list_dot_product(
                   list_slice(e.v, cw.j * {sub} + 1, cw.j * {sub} + {sub}), cw.cw)
               + list_dot_product(cw.cw, cw.cw) as d2
        from e cross join cw
    ),
    codes as (
        select vec_id, j, c from d
        qualify row_number() over (partition by vec_id, j order by d2, c) = 1
    ),
    cs as (
        select vec_id,
               {code_cols}
        from codes group by vec_id
    ),
    q as (select v as qv from e where vec_id = 0),
    t as (
        select cw.j, cw.c,
               list_dot_product(list_slice(q.qv, cw.j * {sub} + 1, cw.j * {sub} + {sub}),
                                list_slice(q.qv, cw.j * {sub} + 1, cw.j * {sub} + {sub}))
               - 2.0 * list_dot_product(
                   list_slice(q.qv, cw.j * {sub} + 1, cw.j * {sub} + {sub}), cw.cw)
               + list_dot_product(cw.cw, cw.cw) as d
        from cw, q
    ),
    approx as (
        select cs.vec_id, round({adc_sum}, 6) as approx_dist
        from cs
      {adc_joins}
    ),
    short as (
        select vec_id from approx where vec_id <> 0
        order by approx_dist, vec_id limit {rerank}
    )
    select e.vec_id,
           round(list_dot_product(e.v, e.v)
                 - 2.0 * list_dot_product(e.v, q.qv)
                 + list_dot_product(q.qv, q.qv), 6) as approx_dist
    from e join short on e.vec_id = short.vec_id, q
    order by approx_dist, e.vec_id limit 10
    """


@register("sim_pq_fixed", _pq_fixed_oracle())
def sim_pq_fixed(spark, sf_dir):
    """Product quantization with FROZEN sampled codebooks (subvectors of
    the vec_id 1-16 seeds): the fully-oracled companion to sim_pq_topk
    (VERDICT r6 item 6). Same two-stage shape — ADC shortlist over the
    compressed codes, exact re-rank of 100 candidates — with squared-L2
    via the dot-product identity so DuckDB replays encode, the ADC sum,
    and the re-ranked top-10 hash-identically."""
    e = _tbl(spark, sf_dir, "embeddings")
    q, _ = _fixture_query_vec(sf_dir)
    seeds = _fixture_seed_vecs(sf_dir)
    # r17: serve the stored codes from the SAME persisted "pq_fixed_v"
    # artifact sim_pq_recall_eval evals against (the sim_pq_topk
    # discipline — a deployment searches the codes it persisted, not a
    # fresh encode). The inline encode built an 8-subspace x 16-codeword
    # argmin expression tree per invocation whose plan build + codegen
    # dominated wall time (7.3 s at sf0.1, FLAT to sf1 — model-state
    # cost, not data cost). The artifact's ``v`` column is the
    # double-cast of the float embedding (exactly representable), so
    # every rounded distance is bit-identical — oracle-verified.
    ev = _tbl(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    enc = _cached_ann_index(
        "pq_fixed_v", sf_dir, spark, lambda: S.pq_encode(ev, seeds, 8, vec_col="v")
    )
    return S.pq_fixed_topk(
        e, seeds, q, m=8, k=10, rerank=100, exclude_ids=[0],
        encoded=enc, vec_col="v",
    )


#: zero-denominator guarded (mirrors cosine_to_literal's 0.0 contract —
#: the r14 self-audit closing the ADVICE-class latent divergence: a
#: zero-norm vector would raw-divide to NaN in DuckDB but 0.0 in Spark)
_LLOYD_COS = (
    "case when sqrt(list_dot_product(e.v, e.v))"
    " * sqrt(list_dot_product(c.c, c.c)) = 0 then 0.0"
    " else list_dot_product(e.v, c.c) / (sqrt(list_dot_product(e.v, e.v))"
    " * sqrt(list_dot_product(c.c, c.c))) end"
)


def _lloyd_cte_prefix(rounds: int = 2, dim: int = 64) -> str:
    """Shared oracle prefix replaying similarity.lloyd_rounds_cosine as
    chained CTEs (frozen seed init, ``rounds`` assignment/mean rounds,
    integer-quantized order-independent means rounded to 6 dp — the
    _canonical_mean lane, ADVICE r8): defines ``e`` (double-cast
    embeddings) and
    ``cent{rounds}`` (the trained centroids) for a consuming tail —
    sim_ivf_kmeans appends probe+top-k, cluster_balanced_sample appends
    assignment+per-cluster sampling."""
    cos = _LLOYD_COS
    parts = [
        f"""
    with e as (select vec_id, list_transform(embedding, x -> x::DOUBLE) as v
               from embeddings),
    cent0 as (
        select vec_id as sid, v as c from e
        where vec_id between {_FIXED_SEED_IDS[0]} and {_FIXED_SEED_IDS[-1]}
    )"""
    ]
    for r in range(1, rounds + 1):
        prev = f"cent{r - 1}"
        parts.append(
            f""",
    a{r} as (
        select e.vec_id, c.sid, {cos} as cs
        from e cross join {prev} c
    ),
    asg{r} as (
        select vec_id, sid from a{r}
        qualify row_number() over (partition by vec_id order by cs desc, sid) = 1
    ),
    cd{r} as (
        select g.sid, i.i,
               round(sum(floor(e.v[i.i] * 1e9 + 0.5)::BIGINT)::BIGINT
                     / count(*) / 1e9, 6) as cv
        from asg{r} g join e using (vec_id)
        cross join range(1, {dim + 1}) i(i)
        group by g.sid, i.i
    ),
    cl{r} as (select sid, list(cv order by i) as c from cd{r} group by sid),
    cent{r} as (
        select p.sid, coalesce(n.c, p.c) as c
        from {prev} p left join cl{r} n using (sid)
    )"""
        )
    return "".join(parts)


def _ivf_kmeans_oracle(rounds: int = 2, nprobe: int = 4, k: int = 10) -> str:
    """DuckDB oracle for sim_ivf_kmeans: the Lloyd training prefix, then
    the trained-quantizer assignment, probe selection, and exact top-k."""
    cos = _LLOYD_COS
    last = f"cent{rounds}"
    return _lloyd_cte_prefix(rounds) + (
        f""",
    fa as (
        select e.vec_id, c.sid, {cos} as cs
        from e cross join {last} c
    ),
    assign as (
        select vec_id, sid as list_id from fa
        qualify row_number() over (partition by vec_id order by cs desc, sid) = 1
    ),
    q as (select v as qv from e where vec_id = 0),
    probes as (
        select c.sid from {last} c, q
        order by {_cos_guard("c.c", "q.qv")} desc, c.sid
        limit {nprobe}
    )
    select e.vec_id,
           round({_cos_guard("e.v", "q.qv")}, 6) as cos
    from e
      join assign on e.vec_id = assign.vec_id, q
    where e.vec_id <> 0 and assign.list_id in (select sid from probes)
    order by cos desc, e.vec_id limit {k}"""
    )


def _cluster_balanced_oracle(rounds: int = 2, cap: int = 10) -> str:
    """Oracle for cluster_balanced_sample: Lloyd prefix -> final
    assignment -> deterministic md5-ranked top-``cap`` per cluster."""
    cos = _LLOYD_COS
    last = f"cent{rounds}"
    return _lloyd_cte_prefix(rounds) + (
        f""",
    fa as (
        select e.vec_id, c.sid, {cos} as cs
        from e cross join {last} c
    ),
    assign as (
        select vec_id, sid from fa
        qualify row_number() over (partition by vec_id order by cs desc, sid) = 1
    ),
    ranked as (
        select cast(assign.sid as int) as cluster_id, d.doc_id, d.lang,
               row_number() over (
                   partition by assign.sid
                   order by md5(cast(d.doc_id as varchar)), d.doc_id) as rk
        from assign join documents d on assign.vec_id = d.doc_id
    )
    select cluster_id, doc_id, lang from ranked
    where rk <= {cap}
    order by cluster_id, doc_id"""
    )


#: trained quantizer state, keyed by fixture CONTENT fingerprint (memory
#: layer over the on-disk JSON artifact — see _trained_model). Plain
#: rounded floats — a pure deterministic function of the data (frozen
#: init, fixed rounds), so entries are safe to reuse across
#: SparkSessions, unlike the cached DataFrame the pre-round-8 ml.KMeans
#: index held.
_TRAINED_IVF_CACHE: dict[str, list] = {}
_TRAINED_PQ_CACHE: dict[str, list] = {}

#: materialized index halves (IVF assignment / PQ codes) — memory layer
#: (per session) over the shared on-disk parquet artifact. An ANN index
#: is persisted state queried many times; without the artifact every
#: query re-pays n_lists x dim (IVF) or m x k x sub (PQ) multiply-adds
#: PER ROW just to rebuild the index — measured 6.5 s vs 0.6 s per PQ
#: search at sf0.1. A cached DataFrame is bound to the session that
#: built it, so lookups session-check and re-READ (not re-build) on
#: mismatch (the r4 lesson, test-pinned; disk reuse since r12 —
#: VERDICT r11 item 7).
_ANN_INDEX_CACHE: dict = {}

#: training-recipe version token baked into every on-disk ANN artifact
#: name. The artifacts are keyed by fixture CONTENT fingerprint, which
#: catches data changes but not CODE changes — without this token, a
#: later round that alters a hyperparameter (Lloyd rounds, PQ m/sub,
#: seed set, mean rounding) would silently keep serving the previous
#: recipe's trained state from a warm /tmp across process restarts,
#: diverging from the updated unrolled-CTE oracle. BUMP THIS STRING
#: whenever the training recipe changes. Current recipe: spherical
#: KMeans seeds vec_id 1-16, 2 Lloyd rounds, 6-dp mean rounding; PQ
#: m=8 subspaces x 8 dims, 16 codewords, per-subspace Lloyd.
_ANN_RECIPE = "r12-lloyd2-seed16-6dp-pq8x8"


def _trained_model(kind: str, sf_dir: str, mem_cache: dict, train) -> list:
    """Trained model state (IVF centroids / PQ codebooks) with the full
    deployment lifecycle (VERDICT r11 item 7): train ONCE per fixture
    CONTENT, persist to a shared JSON artifact (atomic tmp+rename, the
    DPP-lake discipline), and let every later session — bench, pytest,
    driver, each a cold process — load the artifact instead of
    retraining. JSON round-trips doubles exactly (repr shortest-form),
    so loaded state is bit-identical to trained state; keyed by content
    fingerprint so a regenerated fixture retrains instead of serving
    stale centroids."""
    import json

    fp = _parquet_fingerprint(sf_dir, "embeddings")
    hit = mem_cache.get(fp)
    if hit is not None:
        return hit
    path = os.path.join(
        tempfile.gettempdir(), f"ann_model_{kind}_{_ANN_RECIPE}_{fp}.json"
    )
    if os.path.exists(path):
        with open(path) as f:
            model = json.load(f)
    else:
        model = train()
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(model, f)
        os.replace(tmp, path)
    mem_cache[fp] = model
    return model


def _cached_ann_index(
    kind: str, sf_dir: str, spark: SparkSession, build,
    fp_table: str = "embeddings",
):
    """Materialized index half with the same persist-to-disk lifecycle
    as _trained_model: built ONCE per fixture content and written to a
    shared parquet artifact; any session (including a cold one) READS
    the artifact instead of recomputing the assignment/encode scan.
    Atomic staging-dir rename: two racing sessions cannot interleave
    writes — the loser keeps the winner's complete artifact.
    ``fp_table`` names the fixture table whose CONTENT keys the artifact
    (embeddings for ANN state; documents for the r15 dedup-signature
    artifacts)."""
    fp = _parquet_fingerprint(sf_dir, fp_table)
    key = (kind, fp)
    cached = _ANN_INDEX_CACHE.get(key)
    if cached is not None and cached.sparkSession is spark:
        return cached
    path = os.path.join(
        tempfile.gettempdir(), f"ann_index_{kind}_{_ANN_RECIPE}_{fp}", "data"
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        import shutil

        stage_parent = tempfile.mkdtemp(prefix=f"ann_stage_{kind}_{fp}_")
        stage = os.path.join(stage_parent, "data")
        try:
            build().write.mode("overwrite").parquet(stage)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            try:
                os.rename(stage, path)
            except OSError:
                if not os.path.exists(os.path.join(path, "_SUCCESS")):
                    raise
        finally:
            # the staging parent (now empty; still-populated for the
            # losing racer OR when the write/rename raised — ADVICE
            # r12: the re-raise path must not leak staged parquet into
            # the shared temp dir) is removed on every exit path
            shutil.rmtree(stage_parent, ignore_errors=True)
    df = spark.read.parquet(path).persist()
    _ANN_INDEX_CACHE[key] = df
    return df


#: r15 (VERDICT r14 item 7): the 6 heaviest bench entries are MinHash/
#: SimHash EVAL compositions, each re-deriving the same deterministic
#: signature table (64 md5-lane minhash / 60-bit simhash over the full
#: documents fixture) from scratch — a shingle-explode + 64-lane
#: aggregate per entry. Signatures are pure functions of the fixture
#: content, exactly like a trained IVF quantizer, so they get the same
#: persisted-artifact lifecycle: build once per (documents content,
#: recipe), parquet round-trips the bigint lanes exactly, every later
#: session reads instead of recomputing. At 100 TB this IS the standard
#: deployment shape — the signature table is maintained corpus state
#: (incremental_minhash_dedup's contract), not a per-query derivation.
#: BUMP the token when lanes/shingle/bits change.
_SIG_RECIPE = "r15-mh64xsh3-sh60"


def _cached_minhash_sigs(spark: SparkSession, sf_dir: str):
    """(doc_id, minhash array<bigint>) over the FULL documents fixture,
    default recipe (64 lanes, 3-token shingles, NULL text -> '' inside
    with_minhash) — served from the persisted per-content artifact."""
    return _cached_ann_index(
        f"minhash_sigs_{_SIG_RECIPE}",
        sf_dir,
        spark,
        lambda: D.with_minhash(
            _tbl(spark, sf_dir, "documents").select("doc_id", "text")
        ),
        fp_table="documents",
    )


#: r16 (VERDICT r15 item 8): the shingle-lane twin of _SIG_RECIPE —
#: the (doc_id, xxhash64 3-gram shingle) inverted-index substrate is
#: re-derived from text by every exact-overlap entry (ngram Jaccard,
#: decontamination, eval-split purge), and eval_split pays the explode
#: TWICE (df-cap pass + join-back). Like signatures, the shingle table
#: is a pure function of the fixture content and IS the corpus state a
#: production decontamination pipeline maintains, so it gets the same
#: persisted-artifact lifecycle. dedup_containment_capped deliberately
#: KEEPS the from-text derivation as the uncached control (measured
#: deltas in BASELINE.md r16). BUMP when n/tokenizer/hash change.
_SHINGLE_RECIPE = "r16-3gram-xx64"


def _cached_shingle3(spark: SparkSession, sf_dir: str):
    """(doc_id, s bigint) distinct 3-gram xxhash64 shingles over the
    FULL documents fixture — served from the persisted per-content
    artifact. The derivation is byte-identical to the inline form the
    consumer entries previously used (D.shingles word 3-grams, one
    xxhash64 per shingle, repartition before the explode so a
    single-file fixture still parallelizes the tokenize stage)."""
    return _cached_ann_index(
        f"shingle3_{_SHINGLE_RECIPE}",
        sf_dir,
        spark,
        lambda: _tbl(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    D.shingles(F.col("text"), 3), lambda s: F.xxhash64(s)
                )
            ).alias("s"),
        ),
        fp_table="documents",
    )


def _cached_simhash_table(spark: SparkSession, sf_dir: str):
    """(doc_id, sh bigint) 60-bit simhash over the FULL documents
    fixture, default recipe — served from the persisted artifact."""
    return _cached_ann_index(
        f"simhash_tab_{_SIG_RECIPE}",
        sf_dir,
        spark,
        lambda: D.simhash_table(
            _tbl(spark, sf_dir, "documents").select("doc_id", "text")
        ),
        fp_table="documents",
    )


@register("sim_ivf_kmeans", _ivf_kmeans_oracle())
def sim_ivf_kmeans(spark, sf_dir):
    """IVF with a TRAINED coarse quantizer: deterministic spherical
    KMeans — frozen sampled-seed init (vec_id 1-16), two Lloyd
    assignment/mean rounds (similarity.lloyd_rounds_cosine) — then the
    standard probe-4-of-16-lists search. Round 8 closes the last
    rows-only gap (VERDICT r7 item 3): the earlier pyspark.ml fit was
    opaque model state, while this training is a pure function of the
    data, so the oracle unrolls both Lloyd rounds as CTEs and replays
    assignment/probes/top-k hash-identically. Trained centroids are
    cached per fixture dir (an IVF quantizer is persisted state queried
    many times; repeat calls measure SEARCH, not training). Scale:
    training cost is rounds x (one scan + 16-row aggregate); search is
    the ivf_fixed_topk shape — assignment literals prune to
    ~N*nprobe/n_lists scored rows. Recall vs the exact baseline pinned
    in tests/test_llm_ops.py."""
    e = _tbl(spark, sf_dir, "embeddings")
    q, _ = _fixture_query_vec(sf_dir)
    cents = _trained_model(
        "ivf",
        sf_dir,
        _TRAINED_IVF_CACHE,
        lambda: S.lloyd_rounds_cosine(e, _fixture_seed_vecs(sf_dir), rounds=2),
    )
    assigned = _cached_ann_index(
        "ivf", sf_dir, spark, lambda: S.ivf_assign(e, cents)
    )
    return S.ivf_fixed_topk(
        e, cents, q, k=10, nprobe=4, exclude_ids=[0], assigned=assigned
    )


@register("cluster_balanced_sample", _cluster_balanced_oracle())
def cluster_balanced_sample(spark, sf_dir):
    """Semantic corpus balancing (the cluster-balanced sampling step of
    SemDeDup/DoReMi-style pipelines, public): cluster documents by
    embedding with the SAME deterministic-Lloyd quantizer sim_ivf_kmeans
    trains (shared trained-centroid and materialized-assignment caches —
    one index serves both search and balancing, as in a real deployment),
    then draw a deterministic md5-ranked quota of 10 docs per cluster —
    a topic-balanced sample no single topic can dominate. Scale: the
    assignment scan is the cached IVF index; the quota is one
    cluster-partitioned window (parallel across clusters, never global).
    Oracle replays Lloyd training (shared CTE prefix), assignment, and
    the per-cluster rank."""
    e = _tbl(spark, sf_dir, "embeddings")
    cents = _trained_model(
        "ivf",
        sf_dir,
        _TRAINED_IVF_CACHE,
        lambda: S.lloyd_rounds_cosine(e, _fixture_seed_vecs(sf_dir), rounds=2),
    )
    assigned = _cached_ann_index(
        "ivf", sf_dir, spark, lambda: S.ivf_assign(e, cents)
    )
    docs = _tbl(spark, sf_dir, "documents").select("doc_id", "lang")
    ranked = (
        assigned.select(
            F.col("vec_id").alias("doc_id"),
            F.col("__list").cast("int").alias("cluster_id"),
        )
        .join(docs, "doc_id")
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        ranked.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= 10)
        .select("cluster_id", "doc_id", "lang")
    )


def _semdedup_oracle(rounds: int = 2, tau: float = 0.35) -> str:
    """Oracle for semdedup_prune: Lloyd prefix -> assignment -> within-
    cluster pairwise cosine -> keep-first drop decisions."""
    cos = _LLOYD_COS
    last = f"cent{rounds}"
    return _lloyd_cte_prefix(rounds) + (
        f""",
    fa as (
        select e.vec_id, c.sid, {cos} as cs
        from e cross join {last} c
    ),
    assign as (
        select vec_id, sid from fa
        qualify row_number() over (partition by vec_id order by cs desc, sid) = 1
    ),
    av as (
        -- zero-norm guard (degenerate audit r15): a zero vector
        -- normalizes to itself (divide by 1), so it is never similar
        -- to anything; DuckDB's x/0 is NULL, which poisons
        -- list_dot_product, and Spark's ANSI x/0 throws
        select assign.vec_id, assign.sid,
               list_transform(e.v, x -> x / (
                   case when list_dot_product(e.v, e.v) = 0 then 1.0
                        else sqrt(list_dot_product(e.v, e.v)) end)) as vn
        from assign join e using (vec_id)
    ),
    dropped as (
        select distinct b.vec_id
        from av a join av b on a.sid = b.sid and a.vec_id < b.vec_id
        where list_dot_product(a.vn, b.vn) >= {tau}
    )
    select av.vec_id, cast(av.sid as int) as cluster_id,
           dropped.vec_id is null as kept
    from av left join dropped using (vec_id)
    order by av.vec_id"""
    )


@register("semdedup_prune", _semdedup_oracle())
def semdedup_prune(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023, public): semantic deduplication by
    pruning within-cluster high-cosine pairs — cluster the corpus with
    the shared deterministic-Lloyd embedding quantizer (same trained-
    centroid + materialized-assignment caches as sim_ivf_kmeans /
    cluster_balanced_sample), compare pairs ONLY inside each cluster,
    and drop the higher-id member of every pair above the similarity
    threshold (keep-first, the dedup_exact convention). The fixture's
    embeddings are uniform-random (max pairwise cosine 0.51), so the
    0.35 threshold exercises a real, non-degenerate drop set.

    Scale posture is the paper's own argument: clustering bounds the
    quadratic pair comparison to within-cluster buckets (an equi-join on
    cluster id — never cartesian), and n_lists grows with the corpus to
    hold cluster sizes roughly constant, so total cost tracks
    sum(cluster_size^2) = n * avg_cluster_size. The cluster granularity
    knob is exactly the df-cap/banding lever the other dedups use."""
    e = _tbl(spark, sf_dir, "embeddings")
    cents = _trained_model(
        "ivf",
        sf_dir,
        _TRAINED_IVF_CACHE,
        lambda: S.lloyd_rounds_cosine(e, _fixture_seed_vecs(sf_dir), rounds=2),
    )
    assigned = _cached_ann_index(
        "ivf", sf_dir, spark, lambda: S.ivf_assign(e, cents)
    )
    # normalize ONCE per row so each pair costs a single dot fold instead
    # of dot + two norms (3x on the dominant stage); the oracle mirrors
    # the normalize-then-dot formula exactly (a/|a| . b/|b| is a
    # DIFFERENT IEEE sequence than (a.b)/(|a||b|) — both engines must
    # pick the same one)
    # zero-norm guard (degenerate audit r15): divide by 1 so a zero
    # vector normalizes to itself and never crosses tau — ANSI mode
    # makes the unguarded /0 a crash, and the oracle NULL-poisons
    norm = S.l2_norm(F.col("embedding"))
    safe_norm = F.when(norm == F.lit(0.0), F.lit(1.0)).otherwise(norm)
    av = assigned.select(
        "vec_id",
        F.transform(
            F.col("embedding"), lambda x: x.cast("double") / safe_norm
        ).alias("__vn"),
        F.col("__list").cast("int").alias("cluster_id"),
    )
    a, b = av.alias("a"), av.alias("b")
    dropped = (
        a.join(b, "cluster_id")
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .filter(S.dot(F.col("a.__vn"), F.col("b.__vn")) >= 0.35)
        .select(F.col("b.vec_id").alias("vec_id"))
        .distinct()
        .withColumn("__dropped", F.lit(True))
    )
    return av.join(dropped, "vec_id", "left").select(
        "vec_id",
        "cluster_id",
        F.col("__dropped").isNull().alias("kept"),
    )


def _pq_kmeans_oracle(
    rounds: int = 2, m: int = 8, sub: int = 8, rerank: int = 100, k: int = 10
) -> str:
    """DuckDB oracle for sim_pq_topk: unrolls the per-subspace Lloyd
    codebook training (similarity.lloyd_rounds_pq — frozen seed-subvector
    init, squared-L2 via the dot identity, 6-dp mean rounding) as chained
    CTEs, then replays encode, the ADC lookup sum, shortlist, and exact
    re-rank exactly as _pq_fixed_oracle does over frozen codebooks."""
    code_cols = ",\n               ".join(
        f"max(case when j = {j} then code end) as c{j}" for j in range(m)
    )
    adc_joins = "\n      ".join(
        f"join t t{j} on t{j}.j = {j} and t{j}.code = cs.c{j}" for j in range(m)
    )
    adc_sum = " + ".join(f"t{j}.d" for j in range(m))
    d2 = (
        "list_dot_product(x.x, x.x) - 2.0 * list_dot_product(x.x, b.cw)"
        " + list_dot_product(b.cw, b.cw)"
    )
    parts = [
        f"""
    with e as (select vec_id, list_transform(embedding, x -> x::DOUBLE) as v
               from embeddings),
    js as (select unnest(range({m})) as j),
    cb0 as (
        select js.j, s.code, list_slice(s.v, js.j * {sub} + 1, js.j * {sub} + {sub}) as cw
        from (select vec_id - {_FIXED_SEED_IDS[0]} as code, v from e
              where vec_id between {_FIXED_SEED_IDS[0]} and {_FIXED_SEED_IDS[-1]}) s
        cross join js
    ),
    x as (
        select e.vec_id, js.j,
               list_slice(e.v, js.j * {sub} + 1, js.j * {sub} + {sub}) as x
        from e cross join js
    )"""
    ]
    for r in range(1, rounds + 1):
        prev = f"cb{r - 1}"
        parts.append(
            f""",
    a{r} as (
        select x.vec_id, x.j, b.code, {d2} as d
        from x join {prev} b on x.j = b.j
    ),
    asg{r} as (
        select vec_id, j, code from a{r}
        qualify row_number() over (partition by vec_id, j order by d, code) = 1
    ),
    cd{r} as (
        select g.j, g.code, i.i,
               round(sum(floor(x.x[i.i] * 1e9 + 0.5)::BIGINT)::BIGINT
                     / count(*) / 1e9, 6) as cv
        from asg{r} g
          join x on x.vec_id = g.vec_id and x.j = g.j
          cross join range(1, {sub + 1}) i(i)
        group by g.j, g.code, i.i
    ),
    cl{r} as (select j, code, list(cv order by i) as cw from cd{r} group by j, code),
    cb{r} as (
        select p.j, p.code, coalesce(n.cw, p.cw) as cw
        from {prev} p left join cl{r} n using (j, code)
    )"""
        )
    last = f"cb{rounds}"
    parts.append(
        f""",
    d as (
        select x.vec_id, x.j, b.code, {d2} as d2
        from x join {last} b on x.j = b.j
    ),
    codes as (
        select vec_id, j, code from d
        qualify row_number() over (partition by vec_id, j order by d2, code) = 1
    ),
    cs as (
        select vec_id,
               {code_cols}
        from codes group by vec_id
    ),
    q as (select v as qv from e where vec_id = 0),
    qx as (
        select js.j, list_slice(q.qv, js.j * {sub} + 1, js.j * {sub} + {sub}) as qj
        from js, q
    ),
    t as (
        select b.j, b.code,
               list_dot_product(qx.qj, qx.qj) - 2.0 * list_dot_product(qx.qj, b.cw)
               + list_dot_product(b.cw, b.cw) as d
        from {last} b join qx on qx.j = b.j
    ),
    approx as (
        select cs.vec_id, round({adc_sum}, 6) as approx_dist
        from cs
      {adc_joins}
    ),
    short as (
        select vec_id from approx where vec_id <> 0
        order by approx_dist, vec_id limit {rerank}
    )
    select e.vec_id,
           round(list_dot_product(e.v, e.v)
                 - 2.0 * list_dot_product(e.v, q.qv)
                 + list_dot_product(q.qv, q.qv), 6) as approx_dist
    from e join short on e.vec_id = short.vec_id, q
    order by approx_dist, e.vec_id limit {k}"""
    )
    return "".join(parts)


@register("sim_pq_topk", _pq_kmeans_oracle())
def sim_pq_topk(spark, sf_dir):
    """Memory-compressed ANN over TRAINED product-quantization codebooks:
    8 subspaces x 16 codewords (~64x compression), codebooks trained by
    deterministic per-subspace Lloyd rounds (similarity.lloyd_rounds_pq —
    frozen seed-subvector init, 2 rounds), then the two-stage search —
    ADC shortlist (8 literal-array lookups per row, no vector math) and
    exact re-rank of 100 candidates. Round 8 closes the last rows-only
    gap (VERDICT r7 item 3): training is a pure function of the data, so
    the oracle unrolls the Lloyd rounds and replays encode/ADC/re-rank
    hash-identically. Trained codebooks cached per fixture dir (persisted
    index state; repeat calls measure SEARCH, not training). Planted
    near-dup retrieval and exact-L2 recall pinned in tests/test_llm_ops.py."""
    e = _tbl(spark, sf_dir, "embeddings")
    q, _ = _fixture_query_vec(sf_dir)
    books = _trained_model(
        "pq",
        sf_dir,
        _TRAINED_PQ_CACHE,
        lambda: S.lloyd_rounds_pq(e, _fixture_seed_vecs(sf_dir), m=8, rounds=2),
    )
    encoded = _cached_ann_index(
        "pq", sf_dir, spark, lambda: S.pq_encode(e, books, m=8)
    )
    return S.pq_fixed_topk(
        e, books, q, m=8, k=10, rerank=100, exclude_ids=[0], encoded=encoded
    )


def _ann_lsh_oracle(dim: int = 64, n_planes: int = 6, seed: int = 42) -> str:
    """DuckDB oracle for sim_ann_lsh (VERDICT r5 item 4): the hyperplanes
    are seeded driver constants (S.hyperplanes), so the same +/-1 plane
    literals bake into the SQL — the embedding_near_dup /
    hard_negative_mining trick. The query's own bucket is computed in-SQL
    from the vec_id=0 row (the query vector is dataset-relative), and the
    multiprobe set {exact, 1-bit, 2-bit flips} is exactly Hamming<=2 on
    the packed bucket id: bit_count(xor(bucket, qb)) <= 2."""
    planes = S.hyperplanes(dim, n_planes, seed)

    def lit(plane):
        return "[" + ", ".join(f"{v:.1f}" for v in plane) + "]::DOUBLE[]"

    bucket = " + ".join(
        f"{1 << i} * (case when list_dot_product(embedding::DOUBLE[], {lit(p)})"
        " >= 0 then 1 else 0 end)"
        for i, p in enumerate(planes)
    )
    return f"""
    with b as (
        select vec_id, embedding, {bucket} as bucket
        from embeddings
    ),
    q as (select embedding as qv, bucket as qb from b where vec_id = 0)
    select b.vec_id,
           round({_cos_guard("b.embedding::DOUBLE[]", "q.qv::DOUBLE[]")}, 6)
               as cos
    from b, q
    where b.vec_id <> 0 and bit_count(xor(b.bucket, q.qb)) <= 2
    order by cos desc, vec_id limit 10
    """


@register("sim_ann_lsh", _ann_lsh_oracle())
def sim_ann_lsh(spark, sf_dir):
    """Approximate top-10 via random-hyperplane LSH + multiprobe. Recall
    vs the exact baseline is pinned in tests/test_llm_ops.py. Fully
    oracled: seeded planes are driver constants, so buckets and the
    Hamming<=2 probe set are deterministic, not engine-hash state."""
    e = _tbl(spark, sf_dir, "embeddings")
    q, _ = _fixture_query_vec(sf_dir)
    return S.ann_topk_lsh(e, q, k=10, n_planes=6, multiprobe_hamming=2, exclude_ids=[0])


def _lsh_recall_oracle(dim: int = 64, n_planes: int = 6, seed: int = 42) -> str:
    """DuckDB replay of the LSH recall eval: the _ann_lsh_oracle bucket
    literals generalized with a query (qid) dimension over the frozen
    8-query panel, then recall@10 against exact cosine top-10 — the
    _RECALL_ORACLE shape with the IVF probe CTEs swapped for
    bit_count(xor(bucket, qbucket)) <= 2 multiprobe membership."""
    planes = S.hyperplanes(dim, n_planes, seed)

    def lit(plane):
        return "[" + ", ".join(f"{v:.1f}" for v in plane) + "]::DOUBLE[]"

    bucket = " + ".join(
        f"{1 << i} * (case when list_dot_product(embedding::DOUBLE[], {lit(p)})"
        " >= 0 then 1 else 0 end)"
        for i, p in enumerate(planes)
    )
    qids = ", ".join(str(i) for i in _RECALL_QUERY_IDS)
    return f"""
    with b as (
        select vec_id, list_transform(embedding, x -> x::DOUBLE) as v,
               {bucket} as bucket
        from embeddings
    ),
    q as (
        select vec_id as qid, v as qv, bucket as qbucket from b
        where vec_id in ({qids})
    ),
    exact as (
        select q.qid, b.vec_id
        from b join q on b.vec_id <> q.qid
        qualify row_number() over (partition by q.qid order by
            round({_cos_guard("b.v", "q.qv")}, 6) desc,
            b.vec_id) <= 10
    ),
    ann as (
        select q.qid, b.vec_id
        from b join q
          on b.vec_id <> q.qid
         and bit_count(xor(b.bucket, q.qbucket)) <= 2
        qualify row_number() over (partition by q.qid order by
            round({_cos_guard("b.v", "q.qv")}, 6) desc,
            b.vec_id) <= 10
    )
    select x.qid as query_id,
           cast(sum(case when n.vec_id is not null then 1 else 0 end) as bigint)
               as hits,
           round(sum(case when n.vec_id is not null then 1 else 0 end) / 10.0, 6)
               as recall_at_10
    from exact x left join ann n on x.qid = n.qid and x.vec_id = n.vec_id
    group by x.qid order by query_id
"""


@register("sim_lsh_recall_eval", _lsh_recall_oracle())
def sim_lsh_recall_eval(spark, sf_dir):
    """recall@10 of the random-hyperplane LSH index (sim_ann_lsh's
    config: 6 seeded planes, multiprobe Hamming <= 2) against exact
    cosine top-10 over the SAME frozen 8-query panel as
    sim_recall_eval (IVF) and sim_pq_recall_eval (PQ) — closing the
    index-quality trilogy (VERDICT r12 item 8) so all three ANN
    families report comparable recall numbers from one panel.

    Spark-first shape: the exact arm is sim_recall_eval's single-scan
    literal-panel explode (no join); the ANN arm computes the 6-bit
    bucket ONCE per row (scan+project, plane literals) and joins a
    broadcast (qid, bucket) MULTIPROBE table — the query buckets and
    their 1-bit/2-bit flips are driver-side constants (22 probes x 8
    queries = 176 rows), so candidate selection is an equi-join on
    bucket, never a per-row Hamming evaluation against every query. At
    100 TB the bucket is persisted table state (with_lsh_bucket's
    layout note) and the probe join prunes at the scan; the eval runs
    once per index build. Both arms rank round(cos, 6) desc with the
    vec_id tiebreak (the hash-identical-replay discipline)."""
    e = _tbl(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    panel = _fixture_recall_queries(sf_dir)
    dim = len(panel[0][1])
    n_planes, seed = 6, 42
    rank = Window.partitionBy("qid").orderBy(F.desc("c"), "vec_id")

    # exact arm: one corpus scan, panel as plan literals (no join)
    # r18: panel folds assembled as ONE SQL string (VERDICT r17 item 5
    # — see similarity.panel_cosine_struct_array; bit-identical, ~0.6 s
    # of per-invocation driver expression construction removed)
    ex_structs = S.panel_cosine_struct_array("v", panel, "__vn")
    exact = (
        e.withColumn("__vn", S.l2_norm(F.col("v")))
        .select("vec_id", F.explode(ex_structs).alias("qc"))
        .select("vec_id", F.col("qc.qid").alias("qid"), F.col("qc.c").alias("c"))
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("rn", F.row_number().over(rank))
        .filter(F.col("rn") <= 10)
        .select("qid", "vec_id")
    )

    # ANN arm: bucket scan+project + broadcast multiprobe equi-join
    planes = S.hyperplanes(dim, n_planes, seed)
    probe_rows = []
    for qid, qv in panel:
        qb = S._py_bucket(qv, planes)
        probes = {qb}
        probes |= {qb ^ (1 << i) for i in range(n_planes)}
        probes |= {
            qb ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        }
        probe_rows.extend((int(qid), int(p)) for p in sorted(probes))
    probe_df = spark.createDataFrame(probe_rows, "qid int, pbucket int")
    q = spark.createDataFrame(
        [(int(qid), [float(x) for x in qv]) for qid, qv in panel],
        "qid int, qv array<double>",
    )
    ann = (
        S.with_lsh_bucket(e, dim, "v", n_planes, seed)
        .join(F.broadcast(probe_df), F.col("bucket") == F.col("pbucket"))
        .join(F.broadcast(q), "qid")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(S.cosine(F.col("v"), F.col("qv")), 6).alias("c"),
        )
        .withColumn("rn", F.row_number().over(rank))
        .filter(F.col("rn") <= 10)
        .select("qid", F.col("vec_id").alias("ann_id"), F.lit(1).alias("hit"))
    )

    return (
        exact.join(
            ann,
            (exact["qid"] == ann["qid"]) & (exact["vec_id"] == ann["ann_id"]),
            "left",
        )
        .groupBy(exact["qid"])
        .agg(F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias("hits"))
        .select(
            F.col("qid").alias("query_id"),
            "hits",
            F.round(F.col("hits") / F.lit(10.0), 6).alias("recall_at_10"),
        )
        .orderBy("query_id")
    )


@register(
    "text_token_stats",
    r"""
    select doc_id,
           cast(len(string_split_regex(trim(text), '\s+')) as integer) as n_tokens,
           cast(length(text) as integer) as n_chars_calc,
           round(cast(length(regexp_replace(text, '\s+', '', 'g')) as double)
                 / greatest(cast(len(string_split_regex(trim(text), '\s+')) as integer), 1),
                 4) as mean_token_len
    from documents
    """,
)
def text_token_stats(spark, sf_dir):
    return T.with_token_stats(_tbl(spark, sf_dir, "documents")).select(
        "doc_id", "n_tokens", "n_chars_calc", "mean_token_len"
    )


@register(
    "text_quality",
    r"""
    with t as (
        select doc_id, text,
               greatest(length(text), 1) as n_chars,
               string_split_regex(lower(trim(text)), '\s+') as toks
        from documents
    )
    select doc_id,
           round(length(regexp_replace(text, '[^!-/:-@\[-`{-~]', '', 'g')) / n_chars, 4)
             as punct_ratio,
           round(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / n_chars, 4)
             as alpha_ratio,
           round(len(list_filter(toks, w -> list_contains(
                 ['the','and','of','to','in','is','that','it','was','for'], w)))
                 / greatest(len(toks), 1), 4) as stopword_ratio,
           (length(text) >= 20
            and length(regexp_replace(text, '[^!-/:-@\[-`{-~]', '', 'g')) / n_chars <= 0.3
            and length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / n_chars >= 0.5)
             as quality_ok
    from t
    """,
)
def text_quality(spark, sf_dir):
    return T.with_quality_score(_tbl(spark, sf_dir, "documents")).select(
        "doc_id", "punct_ratio", "alpha_ratio", "stopword_ratio", "quality_ok"
    )


def _lang_hits_sql(words: list[str]) -> str:
    arr = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(toks, w -> list_contains([{arr}], w)))"


_LANG_SQL_PARTS = {
    lang: _lang_hits_sql(words) for lang, words in sorted(T.STOPWORDS.items())
}

@register(
    "text_lang_id",
    r"""
    with t as (
        -- coalesce: NULL text scores zero hits -> 'und' on both
        -- engines (degenerate audit r15; NULL hit counts otherwise
        -- fall through every CASE arm into the ELSE 'fr' branch)
        select doc_id,
               string_split_regex(lower(trim(coalesce(text, ''))), '\s+')
                   as toks
        from documents
    ),
    h as (
        select doc_id,
               {de} as h_de, {en} as h_en, {es} as h_es, {fr} as h_fr
        from t
    )
    select doc_id,
           case
             when greatest(h_de, h_en, h_es, h_fr) = 0 then 'und'
             when (cast(h_de = greatest(h_de, h_en, h_es, h_fr) as int)
                 + cast(h_en = greatest(h_de, h_en, h_es, h_fr) as int)
                 + cast(h_es = greatest(h_de, h_en, h_es, h_fr) as int)
                 + cast(h_fr = greatest(h_de, h_en, h_es, h_fr) as int)) > 1 then 'und'
             when h_de = greatest(h_de, h_en, h_es, h_fr) then 'de'
             when h_en = greatest(h_de, h_en, h_es, h_fr) then 'en'
             when h_es = greatest(h_de, h_en, h_es, h_fr) then 'es'
             else 'fr'
           end as lang_pred
    from h
    """.format(**_LANG_SQL_PARTS),
)
def text_lang_id(spark, sf_dir):
    """Stopword-vote language ID (strict winner or 'und'); oracle
    reimplements the identical heuristic in SQL."""
    return _lang_id_frame(spark, sf_dir)


def _lang_id_frame(spark, sf_dir):
    """The text_lang_id plan as a shared helper (r17 composition lint:
    frames are shared through named helpers, never by invoking another
    entry's callable). Consumers: text_lang_id (lang_id_confusion_eval
    reads with_lang_id directly since r18 — its label column lives on
    the same documents row, so the shared doc_id-keyed frame would
    force a self-join it does not need)."""
    return T.with_lang_id(_tbl(spark, sf_dir, "documents")).select("doc_id", "lang_pred")


@register(
    "multimodal_meta",
    """
    select doc_id,
           cast(octet_length(encode(text)) as bigint) as n_bytes,
           md5(text) as content_md5
    from documents
    """,
)
def multimodal_meta(spark, sf_dir):
    """Opaque binary payload + JVM-side typed metadata (length, content
    hash) — the stage relational ops filter/join on."""
    from database_extractor_spark.operators.multimodal import attach_payload, payload_meta

    d = attach_payload(_tbl(spark, sf_dir, "documents"), "text")
    return payload_meta(d).select("doc_id", F.col("n_bytes").cast("long").alias("n_bytes"), "content_md5")


@register(
    "multimodal_decode",
    """
    with b as (select doc_id, octet_length(encode(text)) as n from documents)
    select doc_id,
           cast(n as bigint) as n_bytes,
           -- NULL payload -> all-NULL metadata (degenerate audit r15);
           -- without the guard a NULL n falls into the ELSE branch
           case when n is null then null
                when n % 2 = 0 then 'png' else 'jpeg' end as format,
           cast(16 + n % 624 as integer) as width,
           cast(16 + (n * 7) % 464 as integer) as height
    from b
    """,
)
def multimodal_decode(spark, sf_dir):
    """mapInPandas decode plumbing (Arrow batches in, typed rows out);
    the decoder itself is the documented deterministic fake — the oracle
    mirrors its formulas, proving the batch pipeline end to end."""
    from database_extractor_spark.operators.multimodal import attach_payload, fake_decode_images

    return fake_decode_images(attach_payload(_tbl(spark, sf_dir, "documents"), "text"))


@register(
    "streaming_event_counts",
    """
    select date_trunc('minute', ts) as window_start, event_type, count(*) as n
    from events group by 1, 2
    """,
)
def streaming_event_counts(spark, sf_dir):
    """Structured Streaming analog of the reference's cron mode
    (main.py:36-43): availableNow over the events source, watermarked
    1-minute tumbling counts — must equal the batch aggregation."""
    from database_extractor_spark.streaming import streaming_event_counts as run

    return run(spark, os.path.join(sf_dir, "events.parquet"))


# ==========================================================================

@register(
    "embedding_cosine_histogram",
    """
    with s as (
        select vec_id, label, embedding::DOUBLE[] as v,
               sqrt(list_dot_product(embedding::DOUBLE[],
                                     embedding::DOUBLE[])) as nrm
        from embeddings
        where ('0x' || substr(md5(cast(vec_id as varchar)), 1, 8))::bigint
              % 2 = 0
    )
    select cast(floor(round(
               case when a.nrm * b.nrm = 0 then 0.0
                    else list_dot_product(a.v, b.v) / (a.nrm * b.nrm) end,
               6) * 20) as int) as bin,
           cast(count(*) as bigint) as n
    from s a join s b on a.label = b.label and a.vec_id < b.vec_id
    group by 1
    order by bin
    """,
)
def embedding_cosine_histogram(spark, sf_dir):
    """WITHIN-CELL COSINE HISTOGRAM — the threshold-calibration view
    behind semdedup_prune and embedding_near_dup: before picking "cos >
    0.96 is a near-duplicate", look at the actual distribution of
    pairwise cosines inside cells (0.05-wide bins of round(cos, 6)).
    Pairing follows the mutual_nearest_neighbors discipline: candidate
    pairs come from a LABEL equi-join (at 100 TB the label is the IVF
    cell id, so pair volume is Σ|cell|² — bounded by keeping cells
    small as the corpus grows, never corpus-quadratic) over an
    md5-halved deterministic sample (the bounding knob: sample rate ×
    cell size caps per-cell work; both engines share the md5 lane).
    Per-side L2 norms are computed once in the side projection and
    reused across every pair (one dot fold per pair); cosine doubles
    run the identical IEEE sequence on both engines, so bin edges
    cannot flip. Output is the bounded |bins|-row histogram."""
    e = _tbl(spark, sf_dir, "embeddings")
    keep = (
        F.conv(
            F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 2
        == 0
    )
    s = e.filter(keep).select(
        "vec_id",
        "label",
        F.col("embedding").alias("v"),
        S.l2_norm(F.col("embedding")).alias("nrm"),
    )
    a = s.select(
        F.col("vec_id").alias("a_id"),
        "label",
        F.col("v").alias("av"),
        F.col("nrm").alias("an"),
    )
    b = s.select(
        F.col("vec_id").alias("b_id"),
        "label",
        F.col("v").alias("bv"),
        F.col("nrm").alias("bn"),
    )
    # S.cosine's zero-norm -> 0.0 contract, inlined because the norms
    # are precomputed per side (degenerate zero vector pinned by
    # scripts/degenerate_oracle_audit.py — ANSI mode makes an unguarded
    # /0 a crash, not an inf)
    denom = F.col("an") * F.col("bn")
    cos = F.round(
        F.when(denom == F.lit(0.0), F.lit(0.0)).otherwise(
            S.dot(F.col("av"), F.col("bv")) / denom
        ),
        6,
    )
    return (
        a.join(b, "label")
        .filter(F.col("a_id") < F.col("b_id"))
        .select(F.floor(cos * 20).cast("int").alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy("bin")
    )

@register(
    "embedding_dim_stats",
    """
    with x as (
        select unnest(range(len(embedding))) as dim,
               cast(unnest(embedding) as double) as x
        from embeddings
    ),
    q as (
        select dim, x,
               cast(round(x * 1000000.0) as bigint) as xi
        from x
    ),
    s as (
        select cast(dim as int) as dim,
               cast(count(*) as bigint) as n,
               cast(sum(xi) as bigint) as sum_micro,
               cast(sum(xi * xi) as bigint) as sumsq_micro,
               min(x) as min_x, max(x) as max_x
        from q group by 1
    )
    select dim, n,
           cast(sum_micro as double) / (1000000.0 * n) as mean,
           sqrt((cast(sumsq_micro as double)
                 - cast(sum_micro as double) * cast(sum_micro as double)
                   / cast(n as double)) / cast(n as double)) / 1000000.0
               as std,
           min_x, max_x
    from s
    order by dim
    """,
)
def embedding_dim_stats(spark, sf_dir):
    """PER-DIMENSION EMBEDDING HEALTH STATS — the audit that catches
    dead dimensions (std ~ 0), scale drift between model versions, and
    saturated dims before they poison cosine retrieval: explode vectors
    positionally and aggregate count/mean/std/min/max per dimension.
    Exactness discipline: doubles never sum directly (hash-order FP
    drift) — each value is quantized to exact integer MICRO-units
    (round(x·1e6) on identical doubles → identical bigints), so the
    first and second moments are exact int64 sums on both engines
    (headroom: |x|≤1 ⇒ xi²≤1e12, safe to ~9e6 rows/dim; shard or lift
    to decimal beyond); mean and std derive from those integers through
    one identical double expression. min/max compare raw doubles —
    order-free, no quantization needed. Scale: posexplode widens 64x
    but map-side partial aggregation collapses to 64 rows per mapper
    before the ONE tiny exchange; output is |dims| rows."""
    e = _tbl(spark, sf_dir, "embeddings")
    x = e.select(
        F.posexplode("embedding").alias("dim", "xf")
    ).select("dim", F.col("xf").cast("double").alias("x"))
    q = x.withColumn(
        "xi", F.round(F.col("x") * 1000000.0, 0).cast("bigint")
    )
    s = q.groupBy(F.col("dim").cast("int").alias("dim")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("xi").cast("bigint").alias("sum_micro"),
        F.sum(F.col("xi") * F.col("xi")).cast("bigint").alias("sumsq_micro"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
    )
    mean = F.col("sum_micro").cast("double") / (1000000.0 * F.col("n"))
    std = (
        F.sqrt(
            (
                F.col("sumsq_micro").cast("double")
                - F.col("sum_micro").cast("double")
                * F.col("sum_micro").cast("double")
                / F.col("n").cast("double")
            )
            / F.col("n").cast("double")
        )
        / 1000000.0
    )
    return s.select(
        "dim",
        "n",
        mean.alias("mean"),
        std.alias("std"),
        "min_x",
        "max_x",
    ).orderBy("dim")


def _ivf_silhouette_oracle(rounds: int = 2) -> str:
    """Oracle for ivf_silhouette_eval: Lloyd prefix -> all (vec,
    centroid) cosines -> rank-1 (own) and rank-2 (nearest other)
    -> simplified silhouette -> per-cluster mean."""
    cos = _LLOYD_COS
    last = f"cent{rounds}"
    return _lloyd_cte_prefix(rounds) + (
        f""",
    fa as (
        select e.vec_id, c.sid, {cos} as cs
        from e cross join {last} c
    ),
    ranked as (
        select vec_id, sid, cs,
               row_number() over (
                   partition by vec_id order by cs desc, sid) as rn
        from fa
    ),
    ab as (
        select a.vec_id, cast(a.sid as int) as cluster_id,
               1.0 - a.cs as a_dist, 1.0 - b.cs as b_dist
        from (select * from ranked where rn = 1) a
        join (select * from ranked where rn = 2) b using (vec_id)
    ),
    s as (
        select cluster_id,
               case when greatest(a_dist, b_dist) > 0.0
                    then (b_dist - a_dist) / greatest(a_dist, b_dist)
                    else 0.0 end as sil
        from ab
    )
    select cluster_id, cast(count(*) as bigint) as n_vecs,
           round(cast(sum(cast(sil as decimal(28,12))) as double)
                 / count(*), 6) as mean_silhouette
    from s group by cluster_id order by cluster_id"""
    )


@register("ivf_silhouette_eval", _ivf_silhouette_oracle())
def ivf_silhouette_eval(spark, sf_dir):
    """SIMPLIFIED-SILHOUETTE quality evaluation of the trained IVF
    quantizer — the third leg of the index-eval stool (the recall
    evals ask "does probe-pruned search find the true neighbors?";
    this asks "are the lists themselves coherent?" — a low-silhouette
    cluster is a candidate for re-training or splitting, and the
    per-cluster breakdown localizes WHICH lists are muddy). Per
    vector: a = cosine distance to its OWN centroid, b = distance to
    the nearest OTHER centroid, s = (b - a) / max(a, b) in [-1, 1]
    (the centroid-based simplified silhouette — the full pairwise
    form is quadratic in cluster size and adds nothing for centroid
    indexes). Shares the deterministic-Lloyd trained-centroid cache
    with sim_ivf_kmeans (one index, many evals), so the oracle
    replays training as CTEs and every cosine is the SAME IEEE
    sequence on both engines (cosine_to_literal contract); the
    rank-1/rank-2 centroid pick is the sorted-struct form of the
    oracle's row_number tiebreak (cs desc, sid asc). Scale: one scan
    computes all n_lists cosines per row with ONE shared row-norm
    fold — map-only; the rollup is a 16-group aggregate."""
    e = _tbl(spark, sf_dir, "embeddings")
    cents = _trained_model(
        "ivf",
        sf_dir,
        _TRAINED_IVF_CACHE,
        lambda: S.lloyd_rounds_cosine(e, _fixture_seed_vecs(sf_dir), rounds=2),
    )
    vnorm = S.l2_norm(F.col("embedding"))
    # r18: the 16-centroid fold set assembled as ONE SQL string (see
    # similarity.neg_cosine_struct_array — bit-identical, ~1 s of
    # per-invocation driver expression construction removed)
    structs = S.neg_cosine_struct_array("embedding", cents, "__vnorm")
    ranked = (
        e.withColumn("__vnorm", vnorm)
        .withColumn("__arr", F.array_sort(structs))
        .select(
            F.element_at("__arr", 1).getField("sid").cast("int").alias(
                "cluster_id"
            ),
            (F.lit(1.0) + F.element_at("__arr", 1).getField("nc")).alias(
                "a_dist"
            ),
            (F.lit(1.0) + F.element_at("__arr", 2).getField("nc")).alias(
                "b_dist"
            ),
        )
    )
    sil = F.when(
        F.greatest("a_dist", "b_dist") > 0.0,
        (F.col("b_dist") - F.col("a_dist"))
        / F.greatest("a_dist", "b_dist"),
    ).otherwise(F.lit(0.0))
    return (
        ranked.select("cluster_id", sil.alias("sil"))
        .groupBy("cluster_id")
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.round(
                F.sum(F.col("sil").cast("decimal(28,12)")).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_silhouette"),
        )
        .orderBy("cluster_id")
    )


def _matryoshka_oracle() -> str:
    ids = ", ".join(str(i) for i in _RECALL_QUERY_IDS)
    dims = [8, 16, 32]
    trunc_arms = "\n        union all\n".join(
        f"""        select {d} as dim, q.qid, e.vec_id,
               round(case when sqrt(list_dot_product(e.v[1:{d}], e.v[1:{d}]))
                               * sqrt(list_dot_product(q.qv[1:{d}],
                                                       q.qv[1:{d}])) = 0
                          then 0.0
                          else list_dot_product(e.v[1:{d}], q.qv[1:{d}])
                     / (sqrt(list_dot_product(e.v[1:{d}], e.v[1:{d}]))
                        * sqrt(list_dot_product(q.qv[1:{d}], q.qv[1:{d}])))
                     end, 6) as c
        from e cross join q where e.vec_id <> q.qid"""
        for d in dims
    )
    return f"""
    with e as (select vec_id,
                      list_transform(embedding, x -> x::DOUBLE) as v
               from embeddings),
    q as (select vec_id as qid, v as qv from e
          where vec_id in ({ids})),
    exact as (
        select q.qid, e.vec_id,
               round(case when sqrt(list_dot_product(e.v, e.v))
                               * sqrt(list_dot_product(q.qv, q.qv)) = 0
                          then 0.0
                          else list_dot_product(e.v, q.qv)
                     / (sqrt(list_dot_product(e.v, e.v))
                        * sqrt(list_dot_product(q.qv, q.qv))) end, 6) as c
        from e cross join q where e.vec_id <> q.qid
        qualify row_number() over (
            partition by q.qid order by c desc, e.vec_id) <= 10
    ),
    trunc as (
{trunc_arms}
    ),
    trunc_top as (
        select dim, qid, vec_id from trunc
        qualify row_number() over (
            partition by dim, qid order by c desc, vec_id) <= 10
    )
    select t.dim as dim, x.qid as query_id,
           cast(sum(case when t2.vec_id is not null then 1 else 0 end)
                as bigint) as hits,
           round(sum(case when t2.vec_id is not null then 1 else 0 end)
                 / 10.0, 6) as recall_at_10
    from exact x
    cross join (select distinct dim from trunc_top) t
    left join trunc_top t2
      on t2.dim = t.dim and t2.qid = x.qid and t2.vec_id = x.vec_id
    group by t.dim, x.qid
    order by t.dim, query_id
    """


@register("matryoshka_recall_eval", _matryoshka_oracle())
def matryoshka_recall_eval(spark, sf_dir):
    """MATRYOSHKA / DIMENSION-TRUNCATION recall eval — recall@10 of
    prefix-truncated embeddings (dims 8/16/32) against the full-64-dim
    exact top-10, over the frozen 8-query panel. Completes the
    index-COMPRESSION eval family: PQ quantizes subspaces, int8
    quantizes values, THIS truncates trailing dimensions (the MRL
    deployment pattern — retrieve with a cheap prefix, rerank with
    the full vector — and the recall curve here tells you how many dims
    the retrieval tier can drop). One corpus scan per arm, and the
    panel rides a 32-row LOCAL RELATION broadcast-joined to the scan
    (r18, VERDICT r17 item 5: the former 8-query x 4-arm literal-panel
    struct explode built a 43k-char plan and spent ~2 s PER INVOCATION
    in driver-side expression construction — flat across SF, the
    sim_pq_fixed disease; the join keeps the same 24 dot folds per row
    but the plan is generic in the panel, 12k chars, DF-build+noop
    3.25 -> 1.75 s min, bit-identical 24 rows). Query norms stay
    precomputed driver-side in the panel rows (the cosine_to_literal
    FP contract: python fold == engine fold), each prefix norm is
    still folded once per (row, dim) and shared across its 8 queries.
    Rankings round to 6 dp with a vec_id tiebreak before the
    top-10 window (the sim_recall_eval discipline that keeps the
    DuckDB replay hash-identical). Scale: the corpus is never
    shuffled — both arms are scan + per-query TakeOrdered-shaped
    windows over panel-bounded groups; this is the once-per-index
    eval, not the serving path."""
    import math

    from database_extractor_spark.operators.similarity import _pydot

    e = _tbl(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    panel = _fixture_recall_queries(sf_dir)
    dims = [8, 16, 32]

    rows = []
    for qid, qv in panel:
        rows.append((64, int(qid), qv, math.sqrt(_pydot(qv, qv))))
        for d in dims:
            pref = qv[:d]
            rows.append((d, int(qid), pref, math.sqrt(_pydot(pref, pref))))
    pdf = spark.createDataFrame(
        rows, "dim int, qid int, qv array<double>, qn double"
    )

    # same guarded cosine as cosine_to_literal, with the query norm a
    # panel COLUMN instead of a folded literal (denominator keeps the
    # |v| * |q| multiplication order)
    c = F.round(
        F.when(F.col("__vn") * F.col("qn") == 0, F.lit(0.0)).otherwise(
            S.dot(F.col("pv"), F.col("qv")) / (F.col("__vn") * F.col("qn"))
        ),
        6,
    )

    # exact arm (full 64 dims): one shared row norm, 8-row panel cross
    rank = Window.partitionBy("qid").orderBy(F.desc("c"), "vec_id")
    exact = (
        e.withColumn("pv", F.col("v"))
        .withColumn("__vn", S.l2_norm(F.col("pv")))
        .join(F.broadcast(pdf.filter(F.col("dim") == 64)))
        .withColumn("c", c)
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("rn", F.row_number().over(rank))
        .filter(F.col("rn") <= 10)
        .select("qid", "vec_id")
    )

    # truncated arms: explode the 3 prefixes once per row (norm folded
    # once per (row, dim), shared across the 8 queries), join on dim
    slices = F.array(
        *[
            F.struct(F.lit(d).alias("dim"), F.slice("v", 1, d).alias("pv"))
            for d in dims
        ]
    )
    rank_d = Window.partitionBy("dim", "qid").orderBy(F.desc("c"), "vec_id")
    trunc_top = (
        e.select("vec_id", F.explode(slices).alias("sl"))
        .select(
            "vec_id", F.col("sl.dim").alias("dim"), F.col("sl.pv").alias("pv")
        )
        .withColumn("__vn", S.l2_norm(F.col("pv")))
        .join(F.broadcast(pdf.filter(F.col("dim") != 64)), "dim")
        .withColumn("c", c)
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("rn", F.row_number().over(rank_d))
        .filter(F.col("rn") <= 10)
        .select(
            F.col("dim").alias("t_dim"),
            F.col("qid").alias("t_qid"),
            F.col("vec_id").alias("t_id"),
        )
    )

    return (
        exact.select(
            "qid",
            "vec_id",
            F.explode(F.array(*[F.lit(d) for d in dims])).alias("dim"),
        )
        .join(
            F.broadcast(trunc_top),
            (F.col("t_dim") == F.col("dim"))
            & (F.col("t_qid") == F.col("qid"))
            & (F.col("t_id") == F.col("vec_id")),
            "left",
        )
        .groupBy("dim", F.col("qid").alias("query_id"))
        .agg(
            F.sum(F.when(F.col("t_id").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("hits"),
            F.round(
                F.sum(F.when(F.col("t_id").isNotNull(), 1).otherwise(0))
                / F.lit(10.0),
                6,
            ).alias("recall_at_10"),
        )
        .orderBy("dim", "query_id")
    )


def _knn_label_oracle(k: int = 5) -> str:
    ids = ", ".join(str(i) for i in _RECALL_QUERY_IDS)
    return f"""
    with e as (select vec_id,
                      list_transform(embedding, x -> x::DOUBLE) as v,
                      label
               from embeddings),
    q as (select vec_id as qid, v as qv, label as true_label from e
          where vec_id in ({ids})),
    nn as (
        select q.qid, q.true_label, e.label
        from e cross join q
        where e.vec_id <> q.qid
        qualify row_number() over (
            partition by q.qid order by
            round(case when sqrt(list_dot_product(e.v, e.v))
                            * sqrt(list_dot_product(q.qv, q.qv)) = 0
                       then 0.0
                       else list_dot_product(e.v, q.qv)
                  / (sqrt(list_dot_product(e.v, e.v))
                     * sqrt(list_dot_product(q.qv, q.qv))) end, 6) desc,
            e.vec_id) <= {k}
    ),
    votes as (
        select qid, true_label, label as pred_label,
               cast(count(*) as bigint) as n_votes
        from nn group by qid, true_label, label
    )
    select qid as query_id, true_label, pred_label, n_votes,
           pred_label = true_label as correct
    from votes
    qualify row_number() over (
        partition by qid order by n_votes desc, pred_label) = 1
    order by query_id
    """


@register("knn_label_accuracy", _knn_label_oracle())
def knn_label_accuracy(spark, sf_dir):
    """kNN LABEL-ACCURACY eval (k=5, majority vote) over the frozen
    query panel — the EMBEDDING-SPACE quality probe the recall evals
    can't give: recall@10 says the index finds the true neighbors;
    THIS says whether proximity in the space predicts the LABEL at
    all (a space where nearest neighbors are label-random is useless
    for classification-by-retrieval no matter how good the ANN index
    is). Exact top-5 per panel query from one literal-panel corpus
    scan (shared row-norm fold, 6-dp rounding + vec_id tiebreak — the
    sim_recall_eval ranking discipline), neighbor labels ride the
    same scan (no label join), majority vote resolves ties toward the
    smaller label on both engines. Scale: one scan, panel-bounded
    windows, <= 40 vote rows — the once-per-embedding-build eval."""
    e = _tbl(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        "label",
    )
    panel = _fixture_recall_queries(sf_dir)
    # r18 (VERDICT r17 item 5, the matryoshka treatment): the 8-query
    # literal-panel struct explode spent ~1.1 s per invocation building
    # driver-side expressions, plus an EAGER collect for the true
    # labels; the panel (with its python-folded query norms — the
    # cosine_to_literal FP contract) now rides an 8-row local relation
    # broadcast-crossed to the scan, and the labels attach LAZILY to
    # the 8 picked rows at the end (cast to keep the r17 schema). Same
    # folds per row, same 6-dp + vec_id ranking discipline.
    import math

    from database_extractor_spark.operators.similarity import _pydot

    pdf = spark.createDataFrame(
        [(int(qid), qv, math.sqrt(_pydot(qv, qv))) for qid, qv in panel],
        "qid int, qv array<double>, qn double",
    )
    c = F.round(
        F.when(F.col("__vn") * F.col("qn") == 0, F.lit(0.0)).otherwise(
            S.dot(F.col("v"), F.col("qv")) / (F.col("__vn") * F.col("qn"))
        ),
        6,
    )
    rank = Window.partitionBy("qid").orderBy(F.desc("c"), "vec_id")
    nn = (
        e.withColumn("__vn", S.l2_norm(F.col("v")))
        .join(F.broadcast(pdf))
        .withColumn("c", c)
        .select("vec_id", "label", "qid", "c")
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("rn", F.row_number().over(rank))
        .filter(F.col("rn") <= 5)
    )
    votes = nn.groupBy("qid", F.col("label").alias("pred_label")).agg(
        F.count("*").cast("bigint").alias("n_votes")
    )
    true_lbl = (
        _tbl(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id").isin(_RECALL_QUERY_IDS))
        .select(
            F.col("vec_id").cast("int").alias("qid"),
            F.col("label").cast("int").alias("true_label"),
        )
    )
    pick = Window.partitionBy("qid").orderBy(F.desc("n_votes"), "pred_label")
    return (
        votes.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .join(F.broadcast(true_lbl), "qid")
        .select(
            F.col("qid").alias("query_id"),
            "true_label",
            "pred_label",
            "n_votes",
            (F.col("pred_label") == F.col("true_label")).alias("correct"),
        )
        .orderBy("query_id")
    )


@register(
    "embedding_centroid_drift",
    """
    with mx as (select max(vec_id) as m from embeddings),
    b as (
        select least(10, greatest(1,
                   (vec_id * 10 + m.m - 1) // m.m)) as decile,
               list_transform(embedding, x -> x::DOUBLE) as v
        from embeddings, mx m
    ),
    cd as (
        select decile, i.i,
               round(sum(floor(v[i.i] * 1e9 + 0.5)::BIGINT)::BIGINT
                     / count(*) / 1e9, 6) as cv
        from b cross join range(1, 65) i(i)
        group by decile, i.i
    ),
    cent as (
        select decile, list(cv order by i) as c from cd group by decile
    )
    select a.decile as decile_from, bb.decile as decile_to,
           round(case when sqrt(list_dot_product(a.c, a.c))
                           * sqrt(list_dot_product(bb.c, bb.c)) = 0
                      then 0.0
                      else list_dot_product(a.c, bb.c)
                           / (sqrt(list_dot_product(a.c, a.c))
                              * sqrt(list_dot_product(bb.c, bb.c))) end,
                 6) as centroid_cosine
    from cent a join cent bb on bb.decile = a.decile + 1
    order by decile_from
    """,
)
def embedding_centroid_drift(spark, sf_dir):
    """EMBEDDING-DISTRIBUTION DRIFT across ingestion order — the
    cosine between consecutive vec_id-decile CENTROIDS (is the corpus
    the crawler is appending still the same distribution it started
    with? a falling tail-cosine says the newest tranche moved, which
    invalidates IVF centroids and quality-classifier calibration
    alike — THE trigger for retraining both). Deciles reuse the exact
    integer bucketing of vocab_growth_curve; per-decile centroids use
    the _canonical_mean lane (1e-9-quantized integer sums, order
    independent, 6-dp rounded — the Lloyd-training discipline, so
    both engines produce IDENTICAL centroid literals); consecutive
    pairs assemble by a role fan-out + group-by over the 10-row
    centroid frame (each centroid feeds pair d as "from" and pair
    d-1 as "to" — no self-join, so the single 1-row max attach is
    not replayed), and the
    cosine is the usual identical IEEE fold. Scale: one corpus scan
    into a 10 x dim map-side-combinable aggregate; everything after
    is 10 rows."""
    e = _tbl(spark, sf_dir, "embeddings")
    mx = e.agg(F.max("vec_id").alias("m"))
    b = e.crossJoin(F.broadcast(mx)).select(
        F.least(
            F.lit(10),
            F.greatest(F.lit(1), F.expr("(vec_id * 10 + m - 1) div m")),
        ).alias("decile"),
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    cd = (
        b.select(
            "decile",
            F.posexplode(
                F.expr("transform(v, x -> cast(floor(x * 1e9 + 0.5) as bigint))")
            ).alias("i0", "q"),
        )
        .groupBy("decile", (F.col("i0") + 1).alias("i"))
        .agg(
            F.round(
                F.sum("q").cast("bigint") / F.count("*") / F.lit(1e9), 6
            ).alias("cv")
        )
    )
    cent = cd.groupBy("decile").agg(
        F.expr("array_sort(collect_list(struct(i, cv)))").alias("a")
    ).select(
        "decile", F.expr("transform(a, s -> s.cv)").alias("c")
    )
    # pair consecutive deciles WITHOUT consuming `cent` twice (a
    # self-join would replay the 1-row max attach once per branch —
    # the vocab_growth_curve lesson): each centroid row fans out to
    # its two pair roles ("from" of pair d, "to" of pair d-1) and one
    # group-by reassembles the pairs; arrays compare fine under max()
    roles = cent.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("a").alias("role"),
                    F.col("decile").alias("pid"),
                    F.col("c").alias("c"),
                ),
                F.struct(
                    F.lit("b").alias("role"),
                    (F.col("decile") - 1).alias("pid"),
                    F.col("c").alias("c"),
                ),
            )
        ).alias("r")
    ).select("r.role", "r.pid", "r.c")
    pairs = (
        roles.groupBy("pid")
        .agg(
            F.max(F.when(F.col("role") == "a", F.col("c"))).alias("ca"),
            F.max(F.when(F.col("role") == "b", F.col("c"))).alias("cb"),
        )
        .filter(F.col("ca").isNotNull() & F.col("cb").isNotNull())
    )
    dot = lambda x, y: F.aggregate(
        F.zip_with(F.col(x), F.col(y), lambda p, q: p * q),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )
    # zero-norm guard (degenerate audit r15): an all-zero decile
    # centroid yields cosine 0.0 on both engines, not ANSI-crash/NULL
    drift_denom = F.sqrt(dot("ca", "ca")) * F.sqrt(dot("cb", "cb"))
    return pairs.select(
        F.col("pid").alias("decile_from"),
        (F.col("pid") + 1).alias("decile_to"),
        F.round(
            F.when(drift_denom == F.lit(0.0), F.lit(0.0)).otherwise(
                dot("ca", "cb") / drift_denom
            ),
            6,
        ).alias("centroid_cosine"),
    ).orderBy("decile_from")


def _dedup_agreement_oracle() -> str:
    """Compose the MinHash-LSH dup CTEs and the prefix-namespaced
    SimHash pair CTEs into one oracle: pair-set overlap statistics."""
    return (
        _minhash_dup_ctes()
        + ",\n    "
        + _simhash_pair_ctes(prefix="sx_")
        + """,
    mh as (select id_a, id_b from dup),
    sp as (select id_a, id_b from sx_shp),
    u as (
        select coalesce(m.id_a, s.id_a) as id_a,
               coalesce(m.id_b, s.id_b) as id_b,
               case when m.id_a is not null then 1 else 0 end as in_mh,
               case when s.id_a is not null then 1 else 0 end as in_sh
        from mh m full outer join sp s
          on m.id_a = s.id_a and m.id_b = s.id_b
    )
    select cast(sum(in_mh) as bigint) as n_minhash,
           cast(sum(in_sh) as bigint) as n_simhash,
           cast(sum(in_mh * in_sh) as bigint) as n_both,
           round(cast(sum(in_mh * in_sh) as double)
                 / cast(count(*) as double), 6) as pair_jaccard
    from u
    """
    )


@register("dedup_method_agreement", _dedup_agreement_oracle())
def dedup_method_agreement(spark, sf_dir):
    """DEDUP-METHOD AGREEMENT — pair-set overlap between the two
    production near-dup detectors: banded MinHash-LSH (64 lanes, 16
    bands, agreeing-lane estimate >= 0.7) vs SimHash (60-bit, hamming
    <= 6). The calibration evals (dedup_lsh_quality_eval /
    simhash_quality_eval) each score ONE method against exact-Jaccard
    truth; THIS entry answers the deployment question those leave
    open — do the cheap and the thorough detector flag the SAME
    pairs, i.e. can the pipeline run SimHash-only on low-value
    slices? Low pair-Jaccard localizes where the methods disagree
    (SimHash's token-frequency weighting vs MinHash's set semantics).
    Plan: both pair pipelines are the registry's existing banded
    equi-join shapes (never cartesian); the agreement rollup is ONE
    full-outer join of two pair sets into a single row — the
    quality-eval shape. Oracle: the two pipelines' shared CTE
    builders compose (SimHash CTEs prefix-namespaced), so the replay
    is bit-identical to both standalone entries."""
    docs = _tbl(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    # both detectors read their persisted signature artifacts (r15)
    sigs = _cached_minhash_sigs(spark, sf_dir)
    mh = (
        D.estimate_jaccard(D.lsh_candidate_pairs(sigs), sigs)
        .filter(F.col("est_jaccard") >= 0.7)
        .select("id_a", "id_b")
    )
    sp = D.simhash_near_pairs(
        docs, max_hamming=6, sig_df=_cached_simhash_table(spark, sf_dir)
    ).select("id_a", "id_b")
    u = mh.withColumn("in_mh", F.lit(1)).join(
        sp.withColumn("in_sh", F.lit(1)),
        ["id_a", "id_b"],
        "full_outer",
    )
    in_mh = F.coalesce("in_mh", F.lit(0))
    in_sh = F.coalesce("in_sh", F.lit(0))
    return u.agg(
        F.sum(in_mh).cast("bigint").alias("n_minhash"),
        F.sum(in_sh).cast("bigint").alias("n_simhash"),
        F.sum(in_mh * in_sh).cast("bigint").alias("n_both"),
        F.round(
            F.sum(in_mh * in_sh).cast("double") / F.count("*"), 6
        ).alias("pair_jaccard"),
    )


_NPROBE_CURVE_VALUES = [1, 2, 4, 8, 16]

_NPROBE_CURVE_ORACLE = f"""
    with e as (
        select vec_id, list_transform(embedding, x -> x::DOUBLE) as v
        from embeddings
    ),
    q as (
        select vec_id as qid, v as qv from e
        where vec_id in ({", ".join(str(i) for i in _RECALL_QUERY_IDS)})
    ),
    s as (
        select vec_id as sid, v as sv from e
        where vec_id between {_FIXED_SEED_IDS[0]} and {_FIXED_SEED_IDS[-1]}
    ),
    a as (
        select e.vec_id, s.sid, {{cos_es}} as c
        from e cross join s
    ),
    assign as (
        select vec_id, sid as list_id from a
        qualify row_number() over (partition by vec_id order by c desc, sid) = 1
    ),
    pranks as (
        select q.qid, s.sid,
               row_number() over (partition by q.qid
                                  order by {{cos_sq}} desc, s.sid)
                   as prank
        from s cross join q
    ),
    exact as (
        select q.qid, e.vec_id
        from e join q on e.vec_id <> q.qid
        qualify row_number() over (partition by q.qid order by
            round({{cos_eq}}, 6) desc, e.vec_id) <= 10
    ),
    cand as (
        select p.qid, e.vec_id, p.prank,
               round({{cos_eq}}, 6) as c
        from e
          join assign on e.vec_id = assign.vec_id
          join pranks p on assign.list_id = p.sid
          join q on q.qid = p.qid
        where e.vec_id <> p.qid
    ),
    nv as (select unnest([{", ".join(str(n) for n in _NPROBE_CURVE_VALUES)}])
                  as nprobe),
    ann as (
        select nv.nprobe, cand.qid, cand.vec_id
        from cand join nv on cand.prank <= nv.nprobe
        qualify row_number() over (partition by nv.nprobe, cand.qid
                                   order by cand.c desc, cand.vec_id) <= 10
    )
    select nv.nprobe,
           cast(coalesce(sum(case when ann.vec_id is not null
                                  then 1 else 0 end), 0) as bigint)
               as total_hits,
           round(coalesce(sum(case when ann.vec_id is not null
                                   then 1 else 0 end), 0)
                 / cast((select count(*) from exact) as double), 6)
               as mean_recall_at_10
    from nv
      left join exact x on true
      left join ann on ann.nprobe = nv.nprobe and ann.qid = x.qid
                   and ann.vec_id = x.vec_id
    group by nv.nprobe
    order by nv.nprobe
""".format(
    cos_es=_cos_guard("e.v", "s.sv"),
    cos_sq=_cos_guard("s.sv", "q.qv"),
    cos_eq=_cos_guard("e.v", "q.qv"),
)


@register("ivf_nprobe_recall_curve", _NPROBE_CURVE_ORACLE)
def ivf_nprobe_recall_curve(spark, sf_dir):
    """IVF RECALL-vs-NPROBE CURVE — the index TUNING knob measured as a
    curve (distinct capability vs sim_recall_eval, which reports one
    operating point at nprobe=4, and vs dedup_threshold_sweep, which
    sweeps a dedup threshold: this sweeps the ANN latency/recall
    trade-off itself, the number every deployment reads to pick its
    nprobe). One scored candidate pass serves every curve point: all
    16 lists get a per-query PROBE RANK (cosine of seed vs query, the
    sim_recall_eval probe rule), every (query, candidate) in ANY list
    is scored ONCE, and the five nprobe values {1,2,4,8,16} ride an
    explode over that scored set — re-running the eval per nprobe (the
    naive loop) would re-pay the assignment join five times, the
    dedup_threshold_sweep lesson applied to ANN. Exact ground truth is
    the one-scan panel-literal arm shared with sim_recall_eval. Output:
    5 rows of (nprobe, total_hits, mean recall@10 over the 8-query
    panel); recall at nprobe=16 is 1.0 by construction (all lists
    probed = exact search), pinning the curve's right endpoint. Scale:
    the candidate set is the nprobe=16 super-set — at production list
    counts the curve is measured on nprobe << n_lists and the scored
    rows stay ~= N * max_nprobe / n_lists per query."""
    e = _tbl(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    panel = _fixture_recall_queries(sf_dir)
    seeds = _fixture_seed_vecs(sf_dir)

    # exact arm — identical shape to sim_recall_eval
    rank = Window.partitionBy("qid").orderBy(F.desc("c"), "vec_id")
    # r18: panel folds assembled as ONE SQL string (VERDICT r17 item 5
    # — see similarity.panel_cosine_struct_array; bit-identical, ~0.6 s
    # of per-invocation driver expression construction removed)
    ex_structs = S.panel_cosine_struct_array("v", panel, "__vn")
    exact = (
        e.withColumn("__vn", S.l2_norm(F.col("v")))
        .select("vec_id", F.explode(ex_structs).alias("qc"))
        .select("vec_id", F.col("qc.qid").alias("qid"), F.col("qc.c").alias("c"))
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("rn", F.row_number().over(rank))
        .filter(F.col("rn") <= 10)
        .select("qid", "vec_id")
    )

    # probe RANKS (1..16 per query) as a broadcast literal table — the
    # sim_recall_eval probe rule without the top-4 cut
    probe_rows = []
    for qid, qv in panel:
        ranked = sorted(
            ((S._pycos(qv, vec), int(sid)) for sid, vec in seeds),
            key=lambda t: (-t[0], t[1]),
        )
        probe_rows.extend(
            (qid, sid, i + 1) for i, (_, sid) in enumerate(ranked)
        )
    probe_df = spark.createDataFrame(probe_rows, "qid int, sid int, prank int")

    q = e.filter(F.col("vec_id").isin(_RECALL_QUERY_IDS)).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    cand = (
        _cached_ann_index(
            "ivf_fixed_v",
            sf_dir,
            spark,
            lambda: S.ivf_assign(e, seeds, vec_col="v"),
        )
        .join(F.broadcast(probe_df), F.col("__list") == F.col("sid"))
        .join(F.broadcast(q), "qid")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            "prank",
            F.round(S.cosine(F.col("v"), F.col("qv")), 6).alias("c"),
        )
    )
    nrank = Window.partitionBy("nprobe", "qid").orderBy(
        F.desc("c"), "vec_id"
    )
    ann = (
        cand.withColumn(
            "nprobe",
            F.explode(
                F.array(*[F.lit(n) for n in _NPROBE_CURVE_VALUES])
            ),
        )
        .filter(F.col("prank") <= F.col("nprobe"))
        .withColumn("rn", F.row_number().over(nrank))
        .filter(F.col("rn") <= 10)
        .select(
            "nprobe", "qid", F.col("vec_id").alias("ann_id"),
            F.lit(1).alias("hit"),
        )
    )
    # fan exact rows out to the 5 curve points via explode — a literal
    # nv-frame cross join would plan a (bounded but lint-barred)
    # BroadcastNestedLoopJoin for the same rows
    ex = exact.withColumn(
        "nprobe",
        F.explode(F.array(*[F.lit(n) for n in _NPROBE_CURVE_VALUES])),
    )
    return (
        ex.join(
            ann,
            (ex["nprobe"] == ann["nprobe"])
            & (ex["qid"] == ann["qid"])
            & (ex["vec_id"] == ann["ann_id"]),
            "left",
        )
        .groupBy(ex["nprobe"])
        .agg(
            F.sum(F.coalesce("hit", F.lit(0)))
            .cast("bigint")
            .alias("total_hits"),
            # denominator from the exact frame itself (each exact row
            # appears once per nprobe group: the left join matches at
            # most one ann row per (nprobe, qid, vec_id)) — NOT the
            # 10*|panel| assumption, which diverges from the oracle's
            # count(*) when a query has < 10 non-self candidates
            # (ADVICE r15, low)
            F.count("*").cast("double").alias("__n_exact"),
        )
        .select(
            "nprobe",
            "total_hits",
            F.round(
                F.col("total_hits") / F.col("__n_exact"), 6
            ).alias("mean_recall_at_10"),
        )
        .orderBy("nprobe")
    )
