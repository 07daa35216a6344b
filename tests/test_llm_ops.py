"""LLM-pipeline operator tests: dedup (exact/minhash/simhash/jaccard),
similarity search, text analysis, multimodal plumbing — over the
documents/embeddings fixtures. Includes the scale-posture assertions:
no cartesian products in any LSH plan."""

import pytest
from pyspark.sql import functions as F

from database_extractor_spark.operators import (
    ann_topk_lsh,
    brute_force_topk,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_dedup,
    ngram_jaccard_pairs,
    pairwise_similar_lsh,
    simhash_near_pairs,
    with_fingerprint,
    with_lang_id,
    with_minhash,
    with_quality_score,
    with_token_stats,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    from database_extractor_spark.sources import read_source

    return read_source(spark, f"{SF_DIR}/embeddings.parquet")


def _no_cartesian(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    return plan


# --------------------------- dedup ---------------------------------------

def test_exact_dedup_with_planted_duplicate(spark, docs):
    dup = docs.limit(1).withColumn("doc_id", F.lit(999999))
    with_dup = docs.unionByName(dup)
    survivors = exact_dedup(with_dup)
    assert survivors.count() == docs.count()  # planted dup collapsed
    assert survivors.filter("doc_id = 999999").count() == 0  # min-id survivor kept


def test_minhash_lsh_recall_vs_exact_jaccard(docs):
    """Candidates from banding must cover every truly-similar pair (recall
    at jaccard>=0.5 should be ~1 with 16 bands of 4)."""
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert exact, "fixture should contain near-duplicate pairs"
    sigs = with_minhash(docs.select("doc_id", "text"))
    cand = lsh_candidate_pairs(sigs)
    _no_cartesian(cand)
    got = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    missed = exact - got
    assert len(missed) <= max(1, len(exact) // 10)  # >=90% recall


def test_minhash_dedup_drops_planted_near_dup(spark, docs):
    base = docs.select("doc_id", "text").limit(1).first()
    near = spark.createDataFrame(
        [(888888, base["text"] + " extra tail token")], "doc_id long, text string"
    )
    with_near = docs.select("doc_id", "text").unionByName(near)
    survivors = minhash_dedup(with_near, threshold=0.6)
    ids = {r["doc_id"] for r in survivors.select("doc_id").collect()}
    assert 888888 not in ids      # near-dup (larger id) dropped
    assert base["doc_id"] in ids  # original kept


def test_simhash_near_pairs_no_cartesian(docs):
    pairs = simhash_near_pairs(docs, max_hamming=6)
    _no_cartesian(pairs)
    assert pairs.count() > 0
    assert pairs.filter("id_a >= id_b").count() == 0


# --------------------------- similarity ----------------------------------

def test_brute_force_topk_matches_numpy(emb):
    import numpy as np

    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    q = vecs[0]
    cos = {
        i: float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        for i, v in vecs.items() if i != 0
    }
    want = sorted(cos, key=lambda i: (-round(cos[i], 6), i))[:5]
    got = [r["vec_id"] for r in brute_force_topk(emb, [float(x) for x in q], 5, exclude_ids=[0]).collect()]
    assert got == want


def test_ann_lsh_recall_and_plan(emb):
    q = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    exact = {r["vec_id"] for r in brute_force_topk(emb, q, 10, exclude_ids=[0]).collect()}
    ann = ann_topk_lsh(emb, q, k=10, n_planes=6, multiprobe_hamming=2)
    _no_cartesian(ann)
    got = {r["vec_id"] for r in ann.filter("vec_id <> 0").collect()}
    assert len(exact & got) >= 5  # >=50% recall with multiprobe on random data


def test_ivf_kmeans_recall(emb):
    """Deterministic-Lloyd IVF (round 8): training from the frozen seed
    sample must actually MOVE the centroids, and probing half the lists
    must keep >=50% recall vs the exact baseline."""
    from database_extractor_spark.operators.similarity import (
        ivf_fixed_topk,
        lloyd_rounds_cosine,
    )

    rows = emb.filter("vec_id between 1 and 8").collect()
    seeds = sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in rows
    )
    q = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    exact = {r["vec_id"] for r in brute_force_topk(emb, q, 10, exclude_ids=[0]).collect()}
    cents = lloyd_rounds_cosine(emb, seeds, rounds=2)
    assert len(cents) == 8 and len(cents[0][1]) == 64
    assert [s for s, _ in cents] == [s for s, _ in seeds]
    moved = sum(1 for (_, a), (_, b) in zip(seeds, cents) if a != b)
    assert moved >= 6, "Lloyd rounds did not update centroids"
    got = {
        r["vec_id"]
        for r in ivf_fixed_topk(emb, cents, q, k=10, nprobe=4, exclude_ids=[0]).collect()
    }
    assert len(exact & got) >= 5  # >=50% recall probing half the lists


def test_lloyd_rounds_are_deterministic(emb):
    """Two independent training runs over the same data and seeds must
    produce IDENTICAL centroids (the property the SQL oracle depends on:
    no ml-internal randomness, rounding pins FP summation drift)."""
    from database_extractor_spark.operators.similarity import lloyd_rounds_cosine

    rows = emb.filter("vec_id between 1 and 8").collect()
    seeds = sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in rows
    )
    a = lloyd_rounds_cosine(emb, seeds, rounds=2)
    b = lloyd_rounds_cosine(emb.repartition(7), seeds, rounds=2)
    assert a == b


def test_pairwise_similar_lsh_no_cartesian(emb):
    pairs = pairwise_similar_lsh(emb, threshold=0.3, n_planes=6)
    _no_cartesian(pairs)
    pairs.count()  # executes


# --------------------------- text ----------------------------------------

def test_token_stats_and_quality(docs):
    out = with_token_stats(docs).select("doc_id", "n_tokens", "n_chars_calc", "mean_token_len")
    r = out.first()
    assert r["n_tokens"] > 0 and r["mean_token_len"] > 0
    q = with_quality_score(docs)
    assert q.filter("quality_ok").count() > 0
    bad = q.filter("punct_ratio < 0 or punct_ratio > 1 or alpha_ratio > 1").count()
    assert bad == 0


def test_lang_id_deterministic_and_sane(docs):
    out = with_lang_id(docs).groupBy("lang_pred").count().collect()
    langs = {r["lang_pred"] for r in out}
    assert langs <= {"en", "es", "fr", "de", "und"}
    # texts are English-ish word salads: 'en' must be the plurality class
    counts = {r["lang_pred"]: r["count"] for r in out}
    assert counts.get("en", 0) > counts.get("und", 0) / 4


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "different")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["fingerprint"] for r in with_fingerprint(df).collect()}
    assert out[1] == out[2] != out[3]


# --------------------------- multimodal ----------------------------------

def test_multimodal_payload_and_fake_decode(docs):
    from database_extractor_spark.operators.multimodal import (
        attach_payload,
        fake_decode_images,
        payload_meta,
    )

    p = payload_meta(attach_payload(docs, "text"))
    r = p.select("doc_id", "n_bytes", "content_md5").first()
    assert r["n_bytes"] > 0 and len(r["content_md5"]) == 32

    decoded = fake_decode_images(attach_payload(docs, "text"))
    assert decoded.schema.simpleString() == (
        "struct<doc_id:bigint,n_bytes:bigint,format:string,width:int,height:int>"
    )
    rows = decoded.limit(5).collect()
    assert all(16 <= r["width"] < 640 and r["format"] in ("png", "jpeg") for r in rows)
    assert decoded.count() == docs.count()


def test_real_decode_is_explicit_stub():
    import pandas as pd

    from database_extractor_spark.operators.multimodal import decode_image_batch

    with pytest.raises(NotImplementedError):
        decode_image_batch(pd.DataFrame({"payload": [b"x"]}))


def test_frame_sample_plan(spark):
    from database_extractor_spark.operators.multimodal import frame_sample_plan

    clips = spark.createDataFrame([(1, 25), (2, 5)], "doc_id long, n_frames int")
    out = frame_sample_plan(clips, every_n=10)
    got = {(r["doc_id"], r["frame_idx"]) for r in out.collect()}
    assert got == {(1, 0), (1, 10), (1, 20), (2, 0)}


@pytest.mark.parametrize("driver_max_edges", [2_000_000, 0])
def test_connected_components_chain_clique_pair(spark, driver_max_edges):
    """Both hybrid paths (driver union-find at the default gate; forced
    distributed min-label propagation at gate=0) find exact components on
    a 12-node chain (worst-case diameter), a 3-clique, and an isolated
    pair."""
    from database_extractor_spark.operators.dedup import connected_components

    chain = [(i, i + 1) for i in range(1, 12)]          # 1-2-...-12
    clique = [(100, 101), (100, 102), (101, 102)]
    pair = [(200, 201)]
    pairs = spark.createDataFrame(chain + clique + pair, "id_a long, id_b long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(
            pairs, driver_max_edges=driver_max_edges
        ).collect()
    }
    assert {n: got[n] for n in range(1, 13)} == {n: 1 for n in range(1, 13)}
    assert {got[100], got[101], got[102]} == {100}
    assert {got[200], got[201]} == {200}


def test_decode_dispatch_falls_back_without_libs(docs):
    """decode_images/decode_audio are live optional-import dispatchers:
    with no PIL/soundfile in this container they must produce exactly the
    deterministic fake (with the libs installed they decode for real —
    same plan shape either way)."""
    from database_extractor_spark.operators.multimodal import (
        attach_payload,
        decode_audio,
        decode_images,
        fake_decode_audio,
        fake_decode_images,
    )

    p = attach_payload(docs.limit(20).select("doc_id", "text"), "text")
    img_got = {tuple(r) for r in decode_images(p).collect()}
    img_want = {tuple(r) for r in fake_decode_images(p).collect()}
    assert img_got == img_want and img_got
    aud_got = {tuple(r) for r in decode_audio(p).collect()}
    aud_want = {tuple(r) for r in fake_decode_audio(p).collect()}
    assert aud_got == aud_want and aud_got


def test_pack_sequences_semantics(spark, docs):
    """Packing invariants per (shard): pack_seq starts at 0, is
    nondecreasing in doc_id order, and a new bin opens exactly when the
    running fill would pass the 512-token budget (docs are never split, so
    a bin can exceed 512 only via its final doc's overflow)."""
    import __spark_entry__ as E
    from tests.conftest import SF_DIR

    rows = (
        E.queries()["pack_sequences"](spark, SF_DIR)
        .orderBy("shard", "doc_id")
        .collect()
    )
    assert rows
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, docs_in in by_shard.items():
        cum = 0
        prev_seq = 0
        for r in docs_in:
            assert r["pack_seq"] == cum // 512, (shard, r)
            assert r["pack_seq"] >= prev_seq
            prev_seq = r["pack_seq"]
            cum += r["n_tokens"]


def test_pq_adc_finds_planted_near_vector(spark, emb):
    """PQ sanity over TRAINED codebooks (deterministic Lloyd, round 8): a
    barely-perturbed copy of the query quantizes to the query's own cell
    in every subspace, so the two-stage search ranks it first; and the
    top-10 overlaps the exact-L2 top-10 (random data is PQ's worst case,
    so the bound is loose)."""
    import numpy as np

    from database_extractor_spark.operators.similarity import (
        lloyd_rounds_pq,
        pq_fixed_topk,
    )

    rows = emb.select("vec_id", "embedding", "label").collect()
    q = [float(x) for x in next(r for r in rows if r["vec_id"] == 0)["embedding"]]
    planted = spark.createDataFrame(
        [(777777, [v + 1e-4 for v in q], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    corpus = emb.select("vec_id", "embedding", "label").unionByName(planted)
    seeds = sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in rows
        if 1 <= r["vec_id"] <= 16
    )
    books = lloyd_rounds_pq(corpus, seeds, m=8, rounds=2)
    assert len(books) == 16 and all(len(v) == 64 for _, v in books)
    top = pq_fixed_topk(corpus, books, q, m=8, k=10, rerank=100, exclude_ids=[0]).collect()
    assert top[0]["vec_id"] == 777777, top[:3]
    assert all(a["approx_dist"] <= b["approx_dist"] for a, b in zip(top, top[1:]))

    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    exact = sorted(
        (i for i in vecs if i != 0),
        key=lambda i: (float(np.sum((vecs[i] - np.array(q)) ** 2)), i),
    )[:10]
    got = {r["vec_id"] for r in top if r["vec_id"] != 777777}
    # two-stage shape: quantization error only costs recall via shortlist
    # misses; trained codebooks must do no worse than the frozen-seed pin
    assert len(set(exact) & got) >= 5
