"""Round-10 hardening tests.

- the INCREMENTAL streaming curation funnel: two-incarnation restart
  recovery over a growing multi-file source, direct batch-replay
  idempotence, and the cross-batch invariants (no duplicate survivors,
  running per-source quota never exceeded);
- the jsonl connector's batch-scoped ``replace_prefix`` commit and its
  general-type JSON serialization (timestamp/date/decimal/binary);
- the Arrow seam's vector-layout guard (fixed_size_list accepted, ragged
  and non-list layouts rejected loudly);
- the REAL multimodal decode branches behind importorskip, so the code
  path executes on any box that ships PIL/soundfile (here they skip).
"""

import glob
import json
import os
import re
import shutil

import pytest

from tests.conftest import SF_DIR

CAP = 20


def _corpus_fp(spark):
    from pyspark.sql import functions as F

    from database_extractor_spark.operators import text as T

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    return (
        T.with_fingerprint(docs, "text", "fp")
        .filter(F.col("doc_id") < 250)
        .select("fp")
        .distinct()
    )


def _incoming(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).filter(
        "doc_id >= 250"
    )


def _sink_rows(out):
    rows = []
    for f in sorted(glob.glob(os.path.join(out, "part-*.jsonl"))):
        with open(f) as fh:
            for line in fh:
                rows.append(json.loads(line))
    return rows


def _write_one_file(df, src_dir, name):
    """Land df as a single parquet file with a stable name inside the
    stream-monitored directory (arrival order drives batch order)."""
    import tempfile

    stage = tempfile.mkdtemp(prefix="funnel_src_stage_")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    os.makedirs(src_dir, exist_ok=True)
    shutil.move(part, os.path.join(src_dir, name))
    shutil.rmtree(stage, ignore_errors=True)


def test_streaming_funnel_two_incarnation_restart(spark, tmp_path):
    """Incarnation 1 drains two source files (two batches under
    maxFilesPerTrigger=1); a third file arrives; incarnation 2 resumes
    from the SAME checkpoint and processes exactly the new file as the
    next batch id. Across all three batches: no duplicate doc_ids, no
    duplicate fingerprints, nothing colliding with the corpus, per-source
    totals never exceed the running quota, and a THIRD incarnation with
    no new data changes nothing (byte-stable sink)."""
    from database_extractor_spark.registry import _stream_funnel_batch
    from database_extractor_spark.sources.custom import register_jsonl_sink

    register_jsonl_sink(spark)
    inc = _incoming(spark)
    corpus = _corpus_fp(spark)
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(out)

    def incarnation():
        stream = (
            spark.readStream.schema(inc.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda b, bid: _stream_funnel_batch(spark, b, bid, corpus, out)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180), "funnel drain timed out"

    _write_one_file(inc.filter("doc_id < 330"), src, "f0.parquet")
    _write_one_file(inc.filter("doc_id >= 330 and doc_id < 410"), src, "f1.parquet")
    incarnation()
    batches1 = {
        re.match(r"part-b(\d+)-", os.path.basename(f)).group(1)
        for f in glob.glob(os.path.join(out, "part-b*.jsonl"))
    }
    assert batches1 == {"0", "1"}, batches1
    rows1 = _sink_rows(out)

    _write_one_file(inc.filter("doc_id >= 410"), src, "f2.parquet")
    incarnation()  # incarnation 2: resumes the checkpoint, batch id continues
    batches2 = {
        re.match(r"part-b(\d+)-", os.path.basename(f)).group(1)
        for f in glob.glob(os.path.join(out, "part-b*.jsonl"))
    }
    assert batches2 == {"0", "1", "2"}, batches2
    rows2 = _sink_rows(out)
    # incarnation 2 only APPENDED batch 2 — earlier batches untouched
    key = lambda r: (r["doc_id"], r["fp"])
    assert {key(r) for r in rows1} <= {key(r) for r in rows2}

    # cross-batch invariants
    ids = [r["doc_id"] for r in rows2]
    assert len(ids) == len(set(ids)), "duplicate doc_id across batches"
    fps = [r["fp"] for r in rows2]
    assert len(fps) == len(set(fps)), "duplicate fingerprint across batches"
    corpus_set = {r["fp"] for r in corpus.collect()}
    assert not (set(fps) & corpus_set), "corpus fingerprint re-admitted"
    by_source = {}
    for r in rows2:
        by_source[r["source"]] = by_source.get(r["source"], 0) + 1
    assert max(by_source.values()) <= CAP, by_source

    # incarnation 3: no new data -> zero new batches, byte-stable sink
    before = {
        f: open(f).read() for f in glob.glob(os.path.join(out, "part-*.jsonl"))
    }
    incarnation()
    after = {
        f: open(f).read() for f in glob.glob(os.path.join(out, "part-*.jsonl"))
    }
    assert after == before


def test_stream_funnel_batch_replay_is_idempotent(spark, tmp_path):
    """Spark replays a foreachBatch batch whose commit raced a driver
    crash. Driving _stream_funnel_batch twice with the SAME batch id must
    REPLACE the first copy (replace_prefix commit), yielding the same
    sorted content and no leftover first-incarnation files."""
    from database_extractor_spark.registry import _stream_funnel_batch

    out = str(tmp_path / "out")
    os.makedirs(out)
    batch = _incoming(spark).filter("doc_id < 340")
    corpus = _corpus_fp(spark)
    _stream_funnel_batch(spark, batch, 0, corpus, out)
    files1 = set(glob.glob(os.path.join(out, "part-b0-*.jsonl")))
    lines1 = sorted(json.dumps(r, sort_keys=True) for r in _sink_rows(out))
    assert files1 and lines1
    _stream_funnel_batch(spark, batch, 0, corpus, out)  # replay
    files2 = set(glob.glob(os.path.join(out, "part-b0-*.jsonl")))
    lines2 = sorted(json.dumps(r, sort_keys=True) for r in _sink_rows(out))
    assert lines2 == lines1, "replay changed the batch's content"
    assert not (files1 & files2), "replay left first-incarnation files"


def test_stream_funnel_growing_corpus_blocks_cross_batch_dupes(spark, tmp_path):
    """A document emitted by batch 0 must be anti-joined away when its
    duplicate arrives in batch 1 — the growing-corpus read-back."""
    from pyspark.sql import functions as F

    from database_extractor_spark.registry import _stream_funnel_batch

    out = str(tmp_path / "out")
    os.makedirs(out)
    corpus = _corpus_fp(spark)
    b0 = _incoming(spark).filter("doc_id < 300")
    _stream_funnel_batch(spark, b0, 0, corpus, out)
    emitted0 = _sink_rows(out)
    assert emitted0
    # batch 1 re-sends batch 0's documents under shifted ids (same text
    # -> same fingerprint) plus nothing new
    b1 = b0.withColumn("doc_id", F.col("doc_id") + 10_000)
    _stream_funnel_batch(spark, b1, 1, corpus, out)
    rows = _sink_rows(out)
    assert len(rows) == len(emitted0), "cross-batch duplicate slipped through"
    b1_lines = sum(
        1
        for f in glob.glob(os.path.join(out, "part-b1-*.jsonl"))
        for _ in open(f)
    )
    assert b1_lines == 0


def test_jsonl_replace_prefix_rejects_escapes(spark, tmp_path):
    """replace_prefix outside the reader contract (not part-*, path
    separators, staging namespace) must be rejected at write time."""
    from database_extractor_spark.sources.custom import register_jsonl_sink

    register_jsonl_sink(spark)
    df = spark.range(3).selectExpr("id as doc_id")
    for bad in ("batch-", "part-/x", "part-_staged-x"):
        with pytest.raises(Exception, match="replace_prefix"):
            (
                df.write.format("jsonl_sink")
                .option("path", str(tmp_path / "out"))
                .option("replace_prefix", bad)
                .mode("append")
                .save()
            )


def test_jsonl_sink_serializes_general_types(spark, tmp_path):
    """The sink is a general connector face (ADVICE r9): timestamp, date,
    decimal, and binary columns must serialize deterministically instead
    of crashing every task with TypeError."""
    from database_extractor_spark.sources.custom import register_jsonl_sink

    register_jsonl_sink(spark)
    out = str(tmp_path / "out")
    df = spark.sql(
        """
        select timestamp '2024-03-01 12:34:56.789' as ts,
               date '2024-03-01' as d,
               cast(1.50 as decimal(10,2)) as dec,
               cast('ab' as binary) as bin,
               1 as n
        """
    )
    df.write.format("jsonl_sink").option("path", out).mode("append").save()
    rows = _sink_rows(out)
    assert len(rows) == 1
    r = rows[0]
    assert r["ts"].startswith("2024-03-01T12:34:56.789")
    assert r["d"] == "2024-03-01"
    assert r["dec"] == "1.50"
    assert r["bin"] == b"ab".hex()
    assert r["n"] == 1


def test_vector_dim_layouts():
    """fixed_size_list is accepted (rectangular by construction); ragged
    lists and non-list layouts fail with self-describing ValueErrors."""
    import pyarrow as pa

    from database_extractor_spark.operators.arrow_ext import vector_dim

    fixed = pa.array(
        [[1.0, 2.0], [3.0, 4.0]], type=pa.list_(pa.float64(), 2)
    )
    assert vector_dim(fixed, "v") == 2
    ok = pa.array([[1.0, 2.0], [3.0, 4.0]], type=pa.list_(pa.float64()))
    assert vector_dim(ok, "v") == 2
    ragged = pa.array([[1.0], [2.0, 3.0]], type=pa.list_(pa.float64()))
    with pytest.raises(ValueError, match="ragged"):
        vector_dim(ragged, "v")
    with pytest.raises(ValueError, match="fixed_size_list"):
        vector_dim(pa.array([1.0, 2.0]), "v")


def test_ccnet_score_is_order_independent_integer_lane(spark):
    """The ntile sort key must come off the quantized-integer lane
    (ADVICE r9): recomputing each doc's score from per-token integer
    contributions in ANY summation order reproduces the entry's
    avg_logprob exactly."""
    import duckdb

    import __spark_entry__ as E

    got = {
        r["doc_id"]: r["avg_logprob"]
        for r in E.queries()["ccnet_perplexity_buckets"](spark, SF_DIR).collect()
    }
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{os.path.join(SF_DIR, 'documents.parquet')}')"
    )
    # reversed-order integer summation — same result iff the lane is
    # genuinely order-independent. Replays the r12 integer fixed-point
    # log lane (no libm at all) via the registry's own lane builder.
    from database_extractor_spark.registry import _lnq_lane_sql

    ref = con.execute(
        rf"""
        with toks as (
            select doc_id,
                   unnest(string_split_regex(lower(trim(text)), '\s+')) as token
            from documents
        ),
        freq as (select token, count(*) as c from toks group by 1),
        total as (select count(*) as total from toks),
        lq_c as {_lnq_lane_sql("freq", "c", "token")},
        lq_t as {_lnq_lane_sql("total", "total", "total")},
        per_tok as (
            select t.doc_id, lc.lnq - lt.lnq as lpq
            from toks t join lq_c lc on t.token = lc.token cross join lq_t lt
            order by lpq desc
        )
        select doc_id,
               round(cast(sum(lpq) as double) / 1000000.0 / count(*), 4)
        from per_tok group by doc_id
        """
    ).fetchall()
    assert {d: v for d, v in ref} == got


def test_real_pil_decode_when_available(spark):
    """Runs decode_images through the ACTUAL Spark plan with the REAL
    PIL branch — skipped where PIL is absent (this container), live on
    any box that ships it (VERDICT r9 item 7)."""
    pytest.importorskip("PIL")
    import struct
    import zlib

    from database_extractor_spark.operators import multimodal as mm

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    # a genuine minimal 1x1 grayscale PNG
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    idat = zlib.compress(b"\x00\x00")
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )
    df = spark.createDataFrame([(1, png)], "doc_id bigint, payload binary")
    rows = mm.decode_images(df).collect()
    assert len(rows) == 1
    assert rows[0]["format"] == "png"
    assert rows[0]["width"] == 1 and rows[0]["height"] == 1


def test_real_soundfile_decode_when_available(spark):
    """Same for the audio branch: a genuine 16-bit PCM WAV through the
    real soundfile decode — skipped where soundfile is absent."""
    pytest.importorskip("soundfile")
    import struct

    from database_extractor_spark.operators import multimodal as mm

    n, sr = 8, 16000
    pcm = struct.pack("<8h", *([0] * n))
    wav = (
        b"RIFF"
        + struct.pack("<I", 36 + len(pcm))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )
    df = spark.createDataFrame([(1, wav)], "doc_id bigint, payload binary")
    rows = mm.decode_audio(df).collect()
    assert len(rows) == 1
    assert rows[0]["sample_rate"] == sr
