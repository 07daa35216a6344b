"""Round-11 hardening tests (VERDICT r10 items 6-7 + ADVICE r10).

- ``_stream_funnel_batch`` skips foreign ``part-*.jsonl`` files whose
  names don't match the batch-scoped pattern instead of crashing on a
  failed regex match;
- ``_funnel_corpus_fp`` is materialized (localCheckpoint) so the
  streaming funnel's per-micro-batch anti-join cannot re-scan the
  corpus parquet — the plan is an in-memory scan with no file relation;
- the jsonl connector rejects a ``replace_prefix`` ending in a digit
  ('part-b1' would glob-sweep 'part-b10-*' at commit time);
- ``vector_dim`` on a zero-row list column returns 0 instead of raising
  numpy's opaque zero-size-reduction error (empty Arrow batches are
  normal in mapInArrow).
"""

import glob
import json
import os

import pytest

from tests.conftest import SF_DIR


# ---------------------------------------------------------------------------
# 1. foreign part-file in the funnel sink dir (VERDICT r10 item 6)
# ---------------------------------------------------------------------------

def test_stream_funnel_batch_skips_foreign_part_files(spark, tmp_path):
    """A part-file whose name starts 'part-b' but is NOT batch-scoped
    (e.g. a default-prefix append whose 16-hex job id starts with 'b')
    must be ignored by the read-back, not crash .group(1) on None —
    and must not poison the dedup/quota state."""
    from pyspark.sql import functions as F

    from database_extractor_spark.registry import (
        _funnel_corpus_fp,
        _stream_funnel_batch,
    )

    out = str(tmp_path / "out")
    os.makedirs(out)
    # a foreign file: matches part-b*.jsonl glob, not part-b(\d+)-
    with open(os.path.join(out, "part-beef1234cafe5678-0.jsonl"), "w") as f:
        f.write(json.dumps({"doc_id": 1, "lang": "en", "source": "x",
                            "fp": "00"}) + "\n")

    from database_extractor_spark.sources.custom import register_jsonl_sink

    register_jsonl_sink(spark)
    corpus_fp = _funnel_corpus_fp(spark, SF_DIR)
    batch = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).filter(
        F.col("doc_id") >= 250
    )
    _stream_funnel_batch(spark, batch, 0, corpus_fp, out)

    committed = glob.glob(os.path.join(out, "part-b0-*.jsonl"))
    assert committed, "batch 0 must commit despite the foreign file"
    # the foreign file survives untouched (it is not ours to replace)
    assert os.path.exists(os.path.join(out, "part-beef1234cafe5678-0.jsonl"))


# ---------------------------------------------------------------------------
# 2. corpus fingerprints materialized once (VERDICT r10 item 7)
# ---------------------------------------------------------------------------

def test_funnel_corpus_fp_is_materialized(spark):
    """After _funnel_corpus_fp the plan must be an in-memory/RDD scan —
    no file relation left — so foreachBatch anti-joins cannot re-run
    the corpus parquet scan per micro-batch."""
    from database_extractor_spark.registry import _funnel_corpus_fp

    fp = _funnel_corpus_fp(spark, SF_DIR)
    plan = fp._jdf.queryExecution().optimizedPlan().toString()
    assert "parquet" not in plan.lower(), plan
    assert "LogicalRDD" in plan or "ExistingRDD" in plan, plan
    # and it still holds the corpus set (sanity: non-empty, distinct fps)
    n = fp.count()
    assert n > 0 and fp.distinct().count() == n


# ---------------------------------------------------------------------------
# 3. replace_prefix must be self-terminating (ADVICE r10 medium)
# ---------------------------------------------------------------------------

def test_replace_prefix_rejects_digit_terminated_prefix(tmp_path):
    from database_extractor_spark.sources.custom import JsonlSinkWriter

    class Opts(dict):
        pass

    good = Opts(path=str(tmp_path), replace_prefix="part-b1-")
    JsonlSinkWriter(good)  # self-terminating: accepted

    bad = Opts(path=str(tmp_path), replace_prefix="part-b1")
    with pytest.raises(ValueError, match="non-digit"):
        JsonlSinkWriter(bad)


def test_replace_prefix_sweep_is_structural(spark, tmp_path):
    """The commit-time sweep matches the full committed-file shape
    (prefix + 16-hex job id + '-' + 32-hex task id + '.jsonl'), so (a)
    glob metacharacters in a prefix are matched literally, not
    interpreted, and (b) a prefix that properly extends another valid
    prefix is out of reach of the shorter one's sweep."""
    from database_extractor_spark.sources.custom import register_jsonl_sink

    register_jsonl_sink(spark)
    out = str(tmp_path / "out")
    os.makedirs(out)
    job, task = "0" * 16, "1" * 32
    survivors = [
        f"part-b-{job}-{task}.jsonl",       # would die to glob 'part-[b1]-*'
        f"part-b1-x-{job}-{task}.jsonl",    # longer valid sibling prefix
        "part-b1-not-a-committed-file.jsonl",  # reader-visible foreign file
    ]
    victim = f"part-b1-{job}-{task}.jsonl"
    for name in survivors + [victim]:
        with open(os.path.join(out, name), "w") as f:
            f.write(json.dumps({"doc_id": 0}) + "\n")

    (
        spark.range(1).selectExpr("id as doc_id")
        .write.format("jsonl_sink")
        .option("path", out)
        .option("replace_prefix", "part-b1-")
        .mode("append")
        .save()
    )
    for name in survivors:
        assert os.path.exists(os.path.join(out, name)), name
    assert not os.path.exists(os.path.join(out, victim)), (
        "the prefix's own committed file must be replaced"
    )
    assert glob.glob(os.path.join(out, "part-b1-*.jsonl"))


def test_bpe_training_stops_when_no_pairs_remain(spark, tmp_path):
    """A corpus whose only multi-char word fuses in round 1 must yield a
    one-row result (training stops), not crash round 2's argmax — and
    must match the oracle's empty-later-CTE shape."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from database_extractor_spark import registry as R

    fx = tmp_path / "sf"
    fx.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": [1, 2],
            "text": ["ab ab ab", "ab c d"],
            "lang": ["en", "en"],
            "source": ["s", "s"],
            "n_chars": [8, 6],
        }),
        fx / "documents.parquet",
    )
    R._TRAINED_BPE_CACHE.pop(
        R._parquet_fingerprint(str(fx), "documents"), None
    )
    rows = R.bpe_train_merges(spark, str(fx)).collect()
    assert [(r.merge_rank, r.merged, r.pair_count) for r in rows] == [
        (1, "ab", 4)
    ]


def test_replace_prefix_sweep_cannot_cross_batches(spark, tmp_path):
    """Committing batch 1 with its (valid) 'part-b1-' prefix must leave
    batch 10's committed files alone — the regression the validation
    exists to prevent is only reachable with the rejected bare form, so
    prove the valid form is precise."""
    from database_extractor_spark.sources.custom import register_jsonl_sink

    register_jsonl_sink(spark)
    out = str(tmp_path / "out")
    os.makedirs(out)
    b10 = os.path.join(out, "part-b10-cafebabe.jsonl")
    with open(b10, "w") as f:
        f.write(json.dumps({"doc_id": 99}) + "\n")

    (
        spark.range(3).selectExpr("id as doc_id")
        .write.format("jsonl_sink")
        .option("path", out)
        .option("replace_prefix", "part-b1-")
        .mode("append")
        .save()
    )
    assert os.path.exists(b10), "sibling batch files must survive"
    assert glob.glob(os.path.join(out, "part-b1-*.jsonl"))


# ---------------------------------------------------------------------------
# 4. bpe_train_merges: the trained loop matches a pure-Python replay
# ---------------------------------------------------------------------------

def _python_bpe_replay(word_counts, rounds=3, passes=4):
    """Reference implementation of the entry's documented semantics:
    spaced-symbol words, per-round weighted pair-count argmax with
    (count desc, a, b) tiebreak, merge applied as `passes` rounds of
    Python str.replace (left-to-right non-overlapping — the same
    contract Spark's and DuckDB's replace() give)."""
    vocab = {" " + " ".join(w) + " ": c for w, c in word_counts.items()
             if len(w) >= 2}
    out = []
    for r in range(1, rounds + 1):
        counts = {}
        for s, c in vocab.items():
            sym = s.split()
            for i in range(len(sym) - 1):
                counts[(sym[i], sym[i + 1])] = (
                    counts.get((sym[i], sym[i + 1]), 0) + c
                )
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((r, a, b, a + b, cnt))
        pat, rep = f" {a} {b} ", f" {a}{b} "
        nv = {}
        for s, c in vocab.items():
            for _ in range(passes):
                s = s.replace(pat, rep)
            nv[s] = nv.get(s, 0) + c
        vocab = nv
    return out


def test_bpe_train_merges_matches_python_replay(spark):
    import re as _re
    from collections import Counter

    import pyarrow.parquet as pq

    from database_extractor_spark import registry as R

    texts = pq.read_table(
        os.path.join(SF_DIR, "documents.parquet"), columns=["text"]
    ).column("text").to_pylist()
    wc = Counter(
        w for t in texts for w in _re.split(r"\s+", t.lower().strip()) if w
    )
    expected = _python_bpe_replay(wc)

    # force a real training run (cache is keyed by content fingerprint)
    R._TRAINED_BPE_CACHE.pop(R._parquet_fingerprint(SF_DIR, "documents"), None)
    got = [
        (r.merge_rank, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in R.bpe_train_merges(spark, SF_DIR).collect()
    ]
    assert got == expected


def test_bpe_apply_merge_closes_boundary_chains(spark):
    """4-pass replace must fully merge alternating chains whose
    occurrences share boundary spaces (one pass provably can't), and
    must reproduce Python's replace semantics on odd same-symbol runs."""
    from pyspark.sql import functions as F

    from database_extractor_spark.registry import _bpe_apply_merge

    rows = [(" a b a b a b a b ", 1), (" a a a a a ", 1), (" x a b y ", 1)]
    df = spark.createDataFrame(rows, "s string, wc int")
    got = {
        r.s for r in _bpe_apply_merge(
            df, "a", "b").collect()
    }
    assert " ab ab ab ab " in got
    assert " a a a a a " in got  # (a,b) merge leaves pure-a runs alone
    assert " x ab y " in got

    got_aa = {r.s for r in _bpe_apply_merge(df, "a", "a").collect()}
    # same multipass result as 4x Python str.replace on the odd run
    s = " a a a a a "
    for _ in range(4):
        s = s.replace(" a a ", " aa ")
    assert s in got_aa


def test_bpe_training_loop_matches_replay_on_adversarial_vocab(spark):
    """Three full training rounds over a seeded random vocab heavy in
    same-symbol runs and boundary-sharing chains (the shapes where
    naive replace semantics diverge) must match the Python replay
    exactly — counts, argmax picks, and the rewritten vocab state."""
    import random

    from pyspark.sql import functions as F

    from database_extractor_spark.registry import (
        _bpe_adjacent_counts,
        _bpe_apply_merge,
    )

    rng = random.Random(11)
    words = {}
    for _ in range(200):
        w = "".join(rng.choice("aab") for _ in range(rng.randint(2, 9)))
        words[w] = words.get(w, 0) + rng.randint(1, 5)
    expected = _python_bpe_replay(words)

    df = spark.createDataFrame(
        [(" " + " ".join(w) + " ", c) for w, c in words.items()],
        "s string, wc int",
    )
    got = []
    for r in range(1, 4):
        best = (
            _bpe_adjacent_counts(df)
            .orderBy(F.desc("pair_count"), "a", "b")
            .first()
        )
        got.append((r, best["a"], best["b"], best["a"] + best["b"],
                    best["pair_count"]))
        df = _bpe_apply_merge(df, best["a"], best["b"])
    assert got == expected
    # the final vocab state must match the replay's too (merge
    # application, not just the argmax lane)
    final_vocab = {}
    for row in df.collect():
        final_vocab[row.s] = final_vocab.get(row.s, 0) + row.wc
    replay_vocab = {" " + " ".join(w) + " ": c for w, c in words.items()}
    for _, a, b, _, _ in expected:
        pat, rep = f" {a} {b} ", f" {a}{b} "
        nv = {}
        for s, c in replay_vocab.items():
            for _ in range(4):
                s2 = s.replace(pat, rep)
                s = s2
            nv[s] = nv.get(s, 0) + c
        replay_vocab = nv
    assert final_vocab == replay_vocab


def test_bpe_counts_skip_fully_fused_words(spark):
    """A word fully fused into one merge token contributes no pairs and
    must not crash the next round: Spark's sequence(1, 0) is the
    DESCENDING [1, 0], so without the size guard element_at(sym, 0)
    throws — exactly the state the word 'in' reaches after an (i, n)
    merge."""
    from database_extractor_spark.registry import (
        _bpe_adjacent_counts,
        _bpe_apply_merge,
    )

    df = spark.createDataFrame(
        [(" i n ", 5), (" w i n ", 2)], "s string, wc int"
    )
    merged = _bpe_apply_merge(df, "i", "n")
    rows = {(r.a, r.b): r.pair_count
            for r in _bpe_adjacent_counts(merged).collect()}
    assert rows == {("w", "in"): 2}


# ---------------------------------------------------------------------------
# 5. vector_dim on an empty batch (ADVICE r10 low)
# ---------------------------------------------------------------------------

def test_vector_dim_empty_list_column_returns_zero():
    import pyarrow as pa

    from database_extractor_spark.operators.arrow_ext import vector_dim

    empty = pa.array([], type=pa.list_(pa.float64()))
    assert vector_dim(empty, "embedding") == 0
    empty_large = pa.array([], type=pa.large_list(pa.float32()))
    assert vector_dim(empty_large, "embedding") == 0
    # non-empty unchanged
    v = pa.array([[1.0, 2.0], [3.0, 4.0]], type=pa.list_(pa.float64()))
    assert vector_dim(v, "embedding") == 2
