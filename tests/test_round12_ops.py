"""Round-12 additions: skew conf profiles, batched BPE training,
integer-lane perplexity buckets, persisted index caches, incremental
near-dup dedup."""

from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get(
    "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
)
SF_MID = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    from database_extractor_spark.session import get_spark

    spark = get_spark(app_name="tests-r12", master="local[4]", shuffle_partitions=4)
    yield spark


def test_skew_profile_applies_measured_confs(spark):
    """get_spark(skew_profile="aqe-tuned") must set exactly the confs the
    measured playbook recorded as the winner (BASELINE.md round-11 skew
    table: threshold 8m / advisory 4m beat hand-salting 1.86x vs 1.73x),
    and unknown profile names must fail loudly."""
    from database_extractor_spark.session import SKEW_PROFILES, get_spark

    keys = [
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    ]
    saved = {k: spark.conf.get(k, None) for k in keys}
    try:
        s = get_spark(app_name="tests-r12", skew_profile="aqe-tuned")
        assert s is spark  # getOrCreate reuses; confs applied to it
        assert s.conf.get(keys[1]) == "8m"
        assert s.conf.get(keys[2]) == "4m"
        assert s.conf.get(keys[0]) == "true"
        # extra_conf layers OVER the profile
        s = get_spark(
            app_name="tests-r12",
            skew_profile="aqe-tuned",
            extra_conf={keys[2]: "16m"},
        )
        assert s.conf.get(keys[2]) == "16m"
        with pytest.raises(ValueError, match="unknown skew_profile"):
            get_spark(skew_profile="nope")
        assert set(SKEW_PROFILES) == {"aqe-tuned", "aqe-default"}
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_lnq_micro_matches_pure_python_spec(spark):
    """The integer fixed-point log lane is a SPEC (bit-length + frozen
    table + interpolation, all integer/IEEE-exact ops); Spark must
    reproduce the pure-Python replay bit-for-bit — including the awkward
    spots: powers of two, 2^k - 1, and values > 2^32."""
    import math

    from pyspark.sql import functions as F

    from database_extractor_spark.registry import _LN_MICRO_TABLE, _lnq_micro

    A = _LN_MICRO_TABLE

    def py_lnq(m):
        k = m.bit_length() - 1
        z = int(math.floor(m / (1 << k) * 16777216.0))
        idx = (z >> 16) - 256
        frac = z & 65535
        return k * 693147 + A[idx] + (A[idx + 1] - A[idx]) * frac // 65536

    ms = (
        list(range(1, 300))
        + [2**k for k in range(1, 53)]
        + [2**k - 1 for k in range(2, 53)]
        + [999_983, 10**9 + 7, 2**52 + 12345]
    )
    df = _lnq_micro(
        spark.createDataFrame([(m,) for m in ms], "m bigint"), "m", "lnq"
    )
    got = {r["m"]: r["lnq"] for r in df.collect()}
    assert got == {m: py_lnq(m) for m in ms}
    # accuracy of the spec itself (not cross-engine): within 10 micro-nats
    assert all(abs(py_lnq(m) - 1e6 * math.log(m)) < 10.5 for m in ms)


def _python_bpe_batched_replay(word_counts, rounds=4, cand=16, passes=4):
    """Reference implementation of bpe_train_merges_batched's documented
    semantics: per round, rank pairs by (count desc, a, b), take the top
    `cand`, accept every candidate whose footprint {a, b, ab} is
    disjoint from ALL higher-ranked candidates, apply the whole batch as
    `passes` rounds of non-overlapping str.replace per merge in rank
    order (commutes — footprints are disjoint)."""
    vocab = {
        " " + " ".join(w) + " ": c for w, c in word_counts.items() if len(w) >= 2
    }
    out, mr = [], 0
    for rnd in range(1, rounds + 1):
        counts = {}
        for s, c in vocab.items():
            sym = s.split()
            for i in range(len(sym) - 1):
                counts[(sym[i], sym[i + 1])] = (
                    counts.get((sym[i], sym[i + 1]), 0) + c
                )
        ranked = sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[:cand]
        acc = []
        for i, ((a, b), cnt) in enumerate(ranked):
            tf = {a, b, a + b}
            if any(
                tf & {u[0][0], u[0][1], u[0][0] + u[0][1]}
                for u in ranked[:i]
            ):
                continue
            acc.append((a, b, cnt))
        if not acc:
            break
        for a, b, cnt in acc:
            mr += 1
            out.append((mr, rnd, a, b, a + b, cnt))
        nv = {}
        for s, c in vocab.items():
            for a, b, _ in acc:
                pat, rep = f" {a} {b} ", f" {a}{b} "
                for _ in range(passes):
                    s = s.replace(pat, rep)
            nv[s] = nv.get(s, 0) + c
        vocab = nv
    return out


def test_bpe_batched_matches_python_replay(spark):
    import re as _re
    from collections import Counter

    import pyarrow.parquet as pq

    from database_extractor_spark import registry as R

    texts = (
        pq.read_table(
            os.path.join(SF_DIR, "documents.parquet"), columns=["text"]
        )
        .column("text")
        .to_pylist()
    )
    wc = Counter(
        w for t in texts for w in _re.split(r"\s+", t.lower().strip()) if w
    )
    expected = _python_bpe_batched_replay(wc)

    R._TRAINED_BPE_BATCHED_CACHE.pop(
        R._parquet_fingerprint(SF_DIR, "documents"), None
    )
    got = [
        (r.merge_rank, r.round, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in R.bpe_train_merges_batched(spark, SF_DIR).collect()
    ]
    assert got == expected
    assert len(got) >= 4  # sf0.001 yields a real multi-merge batch


def test_bpe_batched_defers_footprint_conflicts(spark, tmp_path):
    """The within-batch conflict that makes batched BPE order-dependent
    — pair 2 consuming the token pair 1 mints — must be DEFERRED to the
    next round, not co-accepted: a corpus of only 'xyz' words has tied
    pairs (x,y) and (y,z); (y,z)'s footprint shares 'y', so round 1
    merges only (x,y) and round 2 merges (xy,z)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from database_extractor_spark import registry as R

    fx = tmp_path / "sf"
    fx.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": [1, 2],
                "text": ["xyz xyz xyz", "xyz xyz"],
                "lang": ["en", "en"],
                "source": ["s", "s"],
                "n_chars": [11, 7],
            }
        ),
        fx / "documents.parquet",
    )
    got = [
        (r.merge_rank, r.round, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in R.bpe_train_merges_batched(spark, str(fx)).collect()
    ]
    # both words are 'xyz' (wc: distinct words {xyz:1} x2 docs -> the
    # vocab is DISTINCT words weighted by count: 'xyz' appears 5 times
    assert got == [(1, 1, "x", "y", "xy", 5), (2, 2, "xy", "z", "xyz", 5)]


def test_incremental_minhash_equals_full_pairwise_run(spark):
    """VERDICT r11 item 6's 'done' condition: processing the corpus as
    batch 1 (against an empty corpus) and the new docs as batch 2
    (against the corpus signature table) must reproduce EXACTLY the
    survivors of one full-corpus pairwise-rule MinHash dedup
    (minhash_dedup exact_groups=False)."""
    from pyspark.sql import functions as F

    from database_extractor_spark.operators import dedup as D
    from database_extractor_spark.registry import _tbl

    docs = _tbl(spark, SF_DIR, "documents").select("doc_id", "text")
    sigs = D.with_minhash(docs).persist()
    try:
        corpus = sigs.filter(F.col("doc_id") < 250)
        batch = sigs.filter(F.col("doc_id") >= 250)
        phase1 = {
            r["doc_id"]
            for r in D.incremental_minhash_dedup(corpus.limit(0), corpus).collect()
        }
        phase2 = {
            r["doc_id"]
            for r in D.incremental_minhash_dedup(corpus, batch).collect()
        }
        full = {
            r["doc_id"]
            for r in D.minhash_dedup(docs, exact_groups=False).select(
                "doc_id"
            ).collect()
        }
    finally:
        sigs.unpersist(blocking=False)
    assert phase1 | phase2 == full
    assert phase1 and phase2  # both phases really kept something
    # and the phases partition cleanly at the corpus/batch boundary
    assert all(i < 250 for i in phase1) and all(i >= 250 for i in phase2)


def test_fresh_session_reuses_on_disk_ann_index(spark):
    """VERDICT r11 item 7's 'done' condition: after one session trains
    and persists the IVF/PQ model + index artifacts, a FRESH session
    (new SparkSession, empty in-memory caches) must serve the entries by
    LOADING the artifacts — any call into a trainer or index builder is
    a failure — and produce identical results."""
    import database_extractor_spark.registry as R
    from database_extractor_spark.operators import similarity as S

    r1 = {
        n: [tuple(r) for r in R.QUERIES[n](spark, SF_DIR).collect()]
        for n in ("sim_ivf_kmeans", "sim_pq_topk")
    }
    # artifacts must now exist on disk
    import tempfile

    fp = R._parquet_fingerprint(SF_DIR, "embeddings")
    rcp = R._ANN_RECIPE  # artifact names carry the recipe tag (r13)
    for art in (
        f"ann_model_ivf_{rcp}_{fp}.json",
        f"ann_model_pq_{rcp}_{fp}.json",
    ):
        assert os.path.exists(os.path.join(tempfile.gettempdir(), art)), art
    for kind in ("ivf", "pq"):
        assert os.path.exists(
            os.path.join(
                tempfile.gettempdir(),
                f"ann_index_{kind}_{rcp}_{fp}",
                "data",
                "_SUCCESS",
            )
        )

    R._TRAINED_IVF_CACHE.clear()
    R._TRAINED_PQ_CACHE.clear()
    R._ANN_INDEX_CACHE.clear()

    def boom(name):
        def _raise(*a, **k):
            raise AssertionError(f"{name} retrained in a fresh session")

        return _raise

    saved = {
        n: getattr(S, n)
        for n in ("lloyd_rounds_cosine", "lloyd_rounds_pq", "ivf_assign", "pq_encode")
    }
    fresh = spark.newSession()
    try:
        for n in saved:
            setattr(S, n, boom(n))
        r2 = {
            n: [tuple(r) for r in R.QUERIES[n](fresh, SF_DIR).collect()]
            for n in ("sim_ivf_kmeans", "sim_pq_topk")
        }
    finally:
        for n, fn in saved.items():
            setattr(S, n, fn)
        R._ANN_INDEX_CACHE.clear()  # drop frames bound to the throwaway session
    assert r1 == r2


def test_funnel_ledger_replaces_part_file_rereads(spark, tmp_path):
    """VERDICT r11 item 9: the funnel's cross-batch state now lives in a
    running ledger; committed part files are only a restart fallback.
    Proof: after batches 0 and 1 commit, HIDE batch 0's part files —
    batch 2 must still honor batch 0's dedup set and quota usage (state
    served from the ledger, no per-batch re-read of all prior files)."""
    import glob
    import json
    import shutil

    from pyspark.sql import functions as F

    import database_extractor_spark.registry as R
    from database_extractor_spark.sources.custom import register_jsonl_sink

    register_jsonl_sink(spark)
    out = str(tmp_path / "out")
    os.makedirs(out)
    docs = R._tbl(spark, SF_DIR, "documents").filter(F.col("doc_id") >= 250)
    corpus = R._funnel_corpus_fp(spark, SF_DIR)

    b0 = docs.filter("doc_id < 300")
    b1 = docs.filter("doc_id >= 300 and doc_id < 350")
    # batch 2 re-sends batch 0's docs plus some fresh ones: the resend
    # must be suppressed by batch 0's fingerprints
    b2 = b0.unionByName(docs.filter("doc_id >= 350 and doc_id < 400"))

    R._stream_funnel_batch(spark, b0, 0, corpus, out)
    R._stream_funnel_batch(spark, b1, 1, corpus, out)
    emitted01 = {
        json.loads(line)["fp"]
        for f in glob.glob(os.path.join(out, "part-b*.jsonl"))
        for line in open(f)
        if line.strip()
    }
    hidden = str(tmp_path / "hidden")
    os.makedirs(hidden)
    for f in glob.glob(os.path.join(out, "part-b0-*.jsonl")):
        shutil.move(f, hidden)

    R._stream_funnel_batch(spark, b2, 2, corpus, out)
    b2_rows = [
        json.loads(line)
        for f in glob.glob(os.path.join(out, "part-b2-*.jsonl"))
        for line in open(f)
        if line.strip()
    ]
    assert b2_rows, "batch 2 emitted nothing"
    # no fingerprint emitted by batches 0/1 re-entered via batch 2
    assert not ({r["fp"] for r in b2_rows} & emitted01)
    # every batch-0 doc resent in batch 2 was suppressed by LEDGER state
    b0_ids = {r[0] for r in b0.select("doc_id").collect()}
    assert not ({r["doc_id"] for r in b2_rows} & b0_ids)
    R._FUNNEL_LEDGER.pop(out, None)


def test_ccnet_plan_contains_no_log_call(spark):
    """VERDICT r11 item 4's 'done' condition, plan-pinned: the ccnet
    scoring plan must contain NO logarithm evaluation — the former
    floor(ln·1e6) lane assumed JVM Math.log ≡ DuckDB libm ln to 1 ulp."""
    import re

    import __spark_entry__ as E

    df = E.queries()["ccnet_perplexity_buckets"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"\bLOG\(|\bln\(", plan, re.IGNORECASE), plan[:2000]


def _round6_half_up(x: float) -> float:
    """Spark/DuckDB ROUND (BigDecimal HALF_UP, away from zero) — Python's
    round() is half-even, which would diverge on exact .5 boundaries."""
    import math

    return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6


def test_bpe_encode_tokens_matches_python_replay(spark):
    """Train-then-encode replay: Python trains the 3 merges (same
    argmax/tiebreak/4-pass-replace contract as the round-11 replay),
    encodes EVERY nonempty word (single-char words = 1 token, unlike the
    len>=2 training vocab), and sums per doc."""
    import re as _re
    from collections import Counter

    import pyarrow.parquet as pq

    from database_extractor_spark import registry as R

    tbl = pq.read_table(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pylist()
    wc = Counter(
        w
        for r in tbl
        for w in _re.split(r"\s+", (r["text"] or "").lower().strip())
        if w
    )

    # train (the entry's documented semantics, len>=2 vocab)
    vocab = {
        " " + " ".join(w) + " ": c for w, c in wc.items() if len(w) >= 2
    }
    merges = []
    for _ in range(3):
        counts: dict[tuple[str, str], int] = {}
        for s, c in vocab.items():
            sym = s.split()
            for i in range(len(sym) - 1):
                counts[(sym[i], sym[i + 1])] = (
                    counts.get((sym[i], sym[i + 1]), 0) + c
                )
        if not counts:
            break
        (a, b), _cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((a, b))
        nv: dict[str, int] = {}
        for s, c in vocab.items():
            for _ in range(4):
                s = s.replace(f" {a} {b} ", f" {a}{b} ")
            nv[s] = nv.get(s, 0) + c
        vocab = nv

    # encode every nonempty word with the trained merges
    def tok(word: str) -> int:
        s = " " + " ".join(word) + " "
        for a, b in merges:
            for _ in range(4):
                s = s.replace(f" {a} {b} ", f" {a}{b} ")
        return len(s.split())

    expected: dict[int, tuple[int, int]] = {}
    for r in tbl:
        words = [w for w in _re.split(r"\s+", (r["text"] or "").lower().strip()) if w]
        if not words:
            continue
        expected[r["doc_id"]] = (len(words), sum(tok(w) for w in words))

    # force a real training run (cache is keyed by content fingerprint)
    R._TRAINED_BPE_CACHE.pop(R._parquet_fingerprint(SF_DIR, "documents"), None)
    got = {
        r.doc_id: (r.n_words, r.n_tokens)
        for r in R.bpe_encode_tokens(spark, SF_DIR).collect()
    }
    assert got == expected


def test_sim_recall_eval_matches_python_replay(spark):
    """Full independent replay of the recall eval: exact top-10 and the
    frozen-seed IVF(nprobe=4) top-10 per panel query in pure Python
    (same 6-dp round-then-rank, vec_id tiebreak), hits intersected."""
    import math

    import pyarrow.parquet as pq

    from database_extractor_spark import registry as R

    rows = pq.read_table(
        os.path.join(SF_DIR, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    ).to_pylist()
    vecs = {int(r["vec_id"]): [float(x) for x in r["embedding"]] for r in rows}

    def cos(a, b):
        d = na = nb = 0.0
        for x, y in zip(a, b):
            d += x * y
        for x in a:
            na += x * x
        for y in b:
            nb += y * y
        den = math.sqrt(na) * math.sqrt(nb)
        return 0.0 if den == 0 else d / den

    seeds = {sid: vecs[sid] for sid in range(1, 17)}
    assign = {
        vid: min(
            ((-cos(v, sv), sid) for sid, sv in seeds.items())
        )[1]
        for vid, v in vecs.items()
    }
    expected = {}
    for qid in R._RECALL_QUERY_IDS:
        qv = vecs[qid]
        ranked = sorted(
            ((-_round6_half_up(cos(v, qv)), vid) for vid, v in vecs.items() if vid != qid)
        )
        exact = {vid for _, vid in ranked[:10]}
        probes = {sid for _, sid in sorted((-cos(sv, qv), sid) for sid, sv in seeds.items())[:4]}
        cand = sorted(
            (-_round6_half_up(cos(v, qv)), vid)
            for vid, v in vecs.items()
            if vid != qid and assign[vid] in probes
        )
        ann = {vid for _, vid in cand[:10]}
        hits = len(exact & ann)
        expected[qid] = (hits, _round6_half_up(hits / 10.0))

    got = {
        r.query_id: (r.hits, r.recall_at_10)
        for r in R.sim_recall_eval(spark, SF_DIR).collect()
    }
    assert got == expected
    # the panel is useful only if the eval can DETECT imperfection and
    # the index is useful only if recall is high — sanity-bound both
    vals = [h for h, _ in got.values()]
    assert all(0 <= h <= 10 for h in vals)
    assert sum(vals) >= 40  # mean recall at least 0.5 on the fixture


def test_lsh_quality_eval_counts_are_consistent(spark):
    """The eval's three counters must be internally consistent and agree
    with the standalone arms it composes (truth = ngram_jaccard_pairs at
    0.7 over the coalesced corpus; hits bounded by both arms)."""
    from pyspark.sql import functions as F

    from database_extractor_spark import registry as R
    from database_extractor_spark.operators import dedup as D

    row = R.dedup_lsh_quality_eval(spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    assert 0 <= r.n_hit <= min(r.n_true, r.n_pred)
    assert r.lsh_precision == round(r.n_hit / max(r.n_pred, 1), 6)
    assert r.lsh_recall == round(r.n_hit / max(r.n_true, 1), 6)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", F.coalesce("text", F.lit("")).alias("text")
    )
    assert r.n_true == D.ngram_jaccard_pairs(docs, threshold=0.7).count()
    # the banding parameters were chosen to be GOOD at 0.7 — if the eval
    # can't see that, the eval is wrong
    assert r.lsh_recall >= 0.9


def test_streaming_minhash_batch_precedence_and_replay(spark, tmp_path):
    """Multi-batch semantics of the streaming near-dup gate: (1) an
    earlier batch's emitted doc outranks a later batch's LOWER-id
    near-dup (arrival order wins, corpus-side precedence — unlike a
    single-run pairwise dedup where the smaller id would win); (2) a
    replayed batch REPLACES its earlier contribution instead of
    anti-joining against its own output."""
    import json

    from pyspark.sql import functions as F

    from database_extractor_spark import registry as R
    from database_extractor_spark.operators import dedup as D
    from database_extractor_spark.sources.custom import register_jsonl_sink

    register_jsonl_sink(spark)
    out = str(tmp_path / "out")
    import os as _os

    _os.makedirs(out, exist_ok=True)
    src = str(tmp_path / "docs.parquet")
    # 300 and 260 are near-identical (share all shingles); 400 is unique
    rows = [
        (300, "alpha beta gamma delta epsilon zeta eta theta"),
        (260, "alpha beta gamma delta epsilon zeta eta theta"),
        (400, "completely different words in this one entirely"),
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(src)
    docs = spark.read.parquet(src)
    corpus_sigs = D.with_minhash(
        docs.filter("doc_id < 0").select("doc_id", "text")
    )  # empty corpus

    def emitted_ids():
        files = sorted((tmp_path / "out").glob("part-b*.jsonl"))
        ids = []
        for f in files:
            with open(f) as fh:
                ids.extend(json.loads(ln)["doc_id"] for ln in fh if ln.strip())
        return sorted(ids)

    # batch 0 carries 300; batch 1 carries 260 (lower id, arrives later)
    b0 = docs.filter(F.col("doc_id") == 300)
    b1 = docs.filter(F.col("doc_id").isin([260, 400]))
    R._stream_minhash_batch(spark, b0, 0, corpus_sigs, src, out)
    R._stream_minhash_batch(spark, b1, 1, corpus_sigs, src, out)
    # 300 was there first -> 260 drops despite being the smaller id
    assert emitted_ids() == [300, 400]

    # replay batch 1 from a FRESH incarnation (ledger wiped): must
    # rebuild prior state from committed files, void its own earlier
    # output, and land an identical copy
    R._MINHASH_STREAM_LEDGER.pop(out, None)
    R._stream_minhash_batch(spark, b1, 1, corpus_sigs, src, out)
    assert emitted_ids() == [300, 400]
    R._MINHASH_STREAM_LEDGER.pop(out, None)

    # foreign / partially-written files in the sink dir (ADVICE r15,
    # medium): names outside the strict committed shape must be invisible
    # to BOTH the ledger and the prior-signature file selection — the
    # old loose part-b* glob included them in the semi-join (and a
    # non-numeric batch token crashed the bid parse), desynchronizing
    # the dedup gate from the ledger. Re-replaying batch 1 with the
    # foreign files present must neither crash nor change the output.
    for foreign in ("part-b1-tmp.jsonl", "part-bx.jsonl"):
        with open(_os.path.join(out, foreign), "w") as fh:
            fh.write('{"doc_id": 999}\n')
    assert set(R._committed_parts(out)) == {0, 1}
    R._MINHASH_STREAM_LEDGER.pop(out, None)
    R._stream_minhash_batch(spark, b1, 1, corpus_sigs, src, out)
    committed = sorted(
        i
        for files in R._committed_parts(out).values()
        for f in files
        for i in (
            json.loads(ln)["doc_id"] for ln in open(f) if ln.strip()
        )
    )
    assert committed == [300, 400]
    R._MINHASH_STREAM_LEDGER.pop(out, None)


def test_pq_recall_eval_matches_python_replay(spark):
    """Full independent replay of the PQ recall eval in pure Python:
    fixed-codebook encode (argmin squared-L2, smallest code on ties),
    ADC lookup sum in subspace order, top-100 shortlist, exact re-rank,
    recall vs exact squared-L2 top-10 — same 6-dp round-then-rank and
    (dist, vec_id) tiebreaks."""
    import pyarrow.parquet as pq

    from database_extractor_spark import registry as R

    rows = pq.read_table(
        os.path.join(SF_DIR, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    ).to_pylist()
    vecs = {int(r["vec_id"]): [float(x) for x in r["embedding"]] for r in rows}
    m = 8
    dim = len(next(iter(vecs.values())))
    sub = dim // m

    def pdot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    books = [
        [vecs[sid][j * sub:(j + 1) * sub] for sid in range(1, 17)]
        for j in range(m)
    ]
    codes = {}
    for vid, v in vecs.items():
        cs = []
        for j in range(m):
            xj = v[j * sub:(j + 1) * sub]
            dxx = pdot(xj, xj)
            best = min(
                (dxx - 2.0 * pdot(xj, cw) + pdot(cw, cw), c)
                for c, cw in enumerate(books[j])
            )
            cs.append(best[1])
        codes[vid] = cs

    expected = {}
    for qid in R._RECALL_QUERY_IDS:
        qv = vecs[qid]
        exact_d = {
            vid: _round6_half_up(
                pdot(v, v) - 2.0 * pdot(v, qv) + pdot(qv, qv)
            )
            for vid, v in vecs.items()
            if vid != qid
        }
        exact = {
            vid
            for _, vid in sorted((d, vid) for vid, d in exact_d.items())[:10]
        }
        tables = []
        for j in range(m):
            qj = qv[j * sub:(j + 1) * sub]
            tables.append(
                [
                    pdot(qj, qj) - 2.0 * pdot(qj, cw) + pdot(cw, cw)
                    for cw in books[j]
                ]
            )
        ad = {}
        for vid in vecs:
            if vid == qid:
                continue
            total = tables[0][codes[vid][0]]
            for j in range(1, m):
                total = total + tables[j][codes[vid][j]]
            ad[vid] = _round6_half_up(total)
        short = [vid for _, vid in sorted((d, vid) for vid, d in ad.items())[:100]]
        ann = {
            vid
            for _, vid in sorted((exact_d[vid], vid) for vid in short)[:10]
        }
        hits = len(exact & ann)
        expected[qid] = (hits, _round6_half_up(hits / 10.0))

    got = {
        r.query_id: (r.hits, r.recall_at_10)
        for r in R.sim_pq_recall_eval(spark, SF_DIR).collect()
    }
    assert got == expected
    # the eval is only useful if it can DETECT imperfection: on this
    # fixture's 16 sampled codewords over random vectors the measured
    # mean recall is ~0.72 (58/80) — assert a loose floor plus the
    # imperfection itself (if every query were 10/10 the eval would be
    # degenerate here and a rerank regression would be invisible)
    total_hits = sum(h for h, _ in got.values())
    assert 40 <= total_hits < 80


def test_seasonal_anomaly_plan_broadcasts_profile(spark):
    """ts_seasonal_anomaly's scale posture: the (event_type, hour)
    profile must come back as a BROADCAST hash join onto the events
    scan (never a shuffle of the fact side), and the top-50 must plan
    as TakeOrderedAndProject, not a global sort."""
    import __spark_entry__ as E

    df = E.queries()["ts_seasonal_anomaly"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan
