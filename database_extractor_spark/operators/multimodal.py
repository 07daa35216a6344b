"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with decode/feature steps as Arrow-batched Pandas functions.

North-star LLM-pipeline operator (not in the reference). The container has
no image/audio libraries, so the actual byte decoding is STUBBED — each
stub either raises NotImplementedError (real decode) or produces a
deterministic fake (testable plumbing). Everything Spark-side is real and
tested: the binary schema, metadata extraction, the mapInPandas batch
shape, and partitioning posture.

Scale rules:
- payloads stay opaque ``binary``; only metadata (length, hash, parsed
  JSON fields) flows through relational operators, so shuffles never ship
  image bytes unless a stage genuinely transforms them;
- decode runs in ``mapInPandas`` (Arrow batches, one Python worker per
  partition) — the only sanctioned Python hop in the engine;
- batch memory is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  (set it small for large payloads).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # optional dependency: real image decode path (absent in this container)
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover - exercised when PIL is installed
    _PILImage = None

try:  # optional dependency: real audio decode path (absent in this container)
    import soundfile as _soundfile
except ImportError:  # pragma: no cover - exercised when soundfile is installed
    _soundfile = None


#: schema of a decoded-image feature row (what a real decoder would emit)
IMAGE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def attach_payload(df: DataFrame, src_col: str, payload_col: str = "payload") -> DataFrame:
    """Materialize an opaque binary payload column (here: UTF-8 bytes of a
    string column — in production the bytes come off object storage or an
    upstream parquet binary column; the engine treats both identically)."""
    return df.withColumn(payload_col, F.encode(F.col(src_col), "UTF-8"))


def payload_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata over opaque bytes — JVM-side only: byte length and a
    content hash (md5). This is the stage relational ops filter/join on;
    the bytes themselves are never shuffled by it."""
    return df.withColumn("n_bytes", F.length(F.col(payload_col)).cast("long")).withColumn(
        "content_md5", F.md5(F.col(payload_col))
    )


def decode_image_batch(
    batch: pd.DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> pd.DataFrame:
    """REAL image decode via PIL (optional import — the container here has
    no image library, in which case this raises and callers fall back to
    the deterministic fake; with PIL installed it decodes for real)."""
    if _PILImage is None:
        raise NotImplementedError(
            "image decoding requires an image library (PIL) not present "
            "in this environment; use fake_decode_images / decode_images "
            "(which falls back automatically) for plumbing tests"
        )
    import io

    out = {"doc_id": [], "n_bytes": [], "format": [], "width": [], "height": []}
    for doc_id, payload in zip(batch[id_col], batch[payload_col]):
        raw = bytes(payload)
        img = _PILImage.open(io.BytesIO(raw))
        out["doc_id"].append(int(doc_id))
        out["n_bytes"].append(len(raw))
        out["format"].append((img.format or "unknown").lower())
        out["width"].append(int(img.width))
        out["height"].append(int(img.height))
    return pd.DataFrame(out).astype(
        {"doc_id": "int64", "n_bytes": "int64", "width": "int32", "height": "int32"}
    )


def decode_images(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Image decode with live optional-import dispatch: PIL when importable
    (real bytes -> real format/width/height), deterministic fake otherwise.
    Either way the Spark plan is identical — one Arrow-batched mapInPandas
    stage emitting IMAGE_META_SCHEMA rows."""
    if _PILImage is None:
        return fake_decode_images(df, id_col, payload_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield decode_image_batch(b, id_col, payload_col)

    return df.select(id_col, payload_col).mapInPandas(run, IMAGE_META_SCHEMA)


def fake_decode_images(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Deterministic FAKE decode standing in for decode_image_batch: derives
    (format, width, height) from the payload bytes alone, so the full
    mapInPandas pipeline — Arrow batch in, typed rows out — runs and is
    assertable without an image library.

    fake semantics (documented so the oracle can mirror them):
      format = 'png' if n_bytes % 2 == 0 else 'jpeg'
      width  = 16 + n_bytes % 624
      height = 16 + (n_bytes * 7) % 464
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            n = b[payload_col].map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": b[id_col].astype("int64"),
                    "n_bytes": n,
                    "format": (n % 2).map({0: "png", 1: "jpeg"}),
                    "width": (16 + n % 624).astype("int32"),
                    "height": (16 + (n * 7) % 464).astype("int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, IMAGE_META_SCHEMA)


def frame_sample_plan(
    df: DataFrame,
    every_n: int = 10,
    id_col: str = "doc_id",
    n_frames_col: str = "n_frames",
) -> DataFrame:
    """Video frame-sampling *plan*: expand each clip row into the frame
    indices a decoder would extract (every ``every_n``-th frame). The
    decode of each sampled frame is the stubbed step; the expansion is
    real Spark (explode of a sequence — no UDF).
    """
    return df.withColumn(
        "frame_idx",
        F.explode(F.sequence(F.lit(0), F.greatest(F.col(n_frames_col) - 1, F.lit(0)), F.lit(every_n))),
    )


AUDIO_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", DoubleType()),
    ]
)


def decode_audio_batch(
    batch: pd.DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> pd.DataFrame:
    """REAL audio decode via soundfile (optional import — absent here, in
    which case this raises and callers fall back to the deterministic
    fake; with soundfile installed it decodes for real)."""
    if _soundfile is None:
        raise NotImplementedError(
            "audio decoding requires an audio library (soundfile) not "
            "present in this environment; use fake_decode_audio / "
            "decode_audio (which falls back automatically) for plumbing tests"
        )
    import io

    out = {"doc_id": [], "sample_rate": [], "n_samples": [], "duration_ms": []}
    for doc_id, payload in zip(batch[id_col], batch[payload_col]):
        data, sr = _soundfile.read(io.BytesIO(bytes(payload)))
        n = int(data.shape[0])
        out["doc_id"].append(int(doc_id))
        out["sample_rate"].append(int(sr))
        out["n_samples"].append(n)
        out["duration_ms"].append(round(n * 1000.0 / sr, 4))
    return pd.DataFrame(out).astype(
        {"doc_id": "int64", "sample_rate": "int32", "n_samples": "int64"}
    )


def decode_audio(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Audio decode with live optional-import dispatch: soundfile when
    importable, deterministic fake otherwise (same plan shape)."""
    if _soundfile is None:
        return fake_decode_audio(df, id_col, payload_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield decode_audio_batch(b, id_col, payload_col)

    return df.select(id_col, payload_col).mapInPandas(run, AUDIO_META_SCHEMA)


def fake_decode_audio(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Deterministic FAKE audio decode standing in for decode_audio_batch:
    derives (sample_rate, n_samples, duration_ms) from the payload length
    alone so the mapInPandas pipeline runs without an audio library.

    fake semantics (documented so the oracle can mirror them):
      sample_rate = [8000, 16000, 44100][n_bytes % 3]
      n_samples   = n_bytes * 4
      duration_ms = round(n_samples * 1000.0 / sample_rate, 4)
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            n = b[payload_col].map(len).astype("int64")
            sr = (n % 3).map({0: 8000, 1: 16000, 2: 44100}).astype("int32")
            ns = n * 4
            yield pd.DataFrame(
                {
                    "doc_id": b[id_col].astype("int64"),
                    "sample_rate": sr,
                    "n_samples": ns,
                    "duration_ms": (ns * 1000.0 / sr).round(4),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, AUDIO_META_SCHEMA)
