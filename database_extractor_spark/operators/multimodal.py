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


def _payload_len(batch: pd.DataFrame, payload_col: str):
    """(lengths int64, non-null mask) for a payload column that may hold
    NULLs (a NULL source column means no payload — degenerate audit r15).
    Null rows get a placeholder 0 length; callers MUST null out every
    derived column via the mask (see _null_masked) so the integer-exact
    formula path for real payloads stays byte-identical."""
    raw = batch[payload_col]
    mask = raw.notna()
    n = pd.Series(0, index=batch.index, dtype="int64")
    if mask.any():
        n[mask] = raw[mask].map(len)
    return n, mask


def _null_masked(out: pd.DataFrame, mask, id_col: str = "doc_id") -> pd.DataFrame:
    """Convert derived columns to nullable dtypes and NA the rows whose
    payload was NULL — the all-NULL-metadata contract for NULL payloads
    (the oracle mirrors it with `case when n is null` guards)."""
    if mask.all():
        return out
    for c in out.columns:
        if c == id_col:
            continue
        dt = str(out[c].dtype)
        if dt.startswith("int"):
            out[c] = out[c].astype("I" + dt[1:])
        elif dt.startswith("float"):
            out[c] = out[c].astype("Float64")
        out.loc[~mask, c] = None
    return out


def fake_decode_images(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Deterministic FAKE decode standing in for decode_image_batch: derives
    (format, width, height) from the payload bytes alone, so the full
    mapInPandas pipeline — Arrow batch in, typed rows out — runs and is
    assertable without an image library.

    fake semantics (documented so the oracle can mirror them):
      format = 'png' if n_bytes % 2 == 0 else 'jpeg'
      width  = 16 + n_bytes % 624
      height = 16 + (n_bytes * 7) % 464
      NULL payload -> every derived column NULL
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            n, mask = _payload_len(b, payload_col)
            out = pd.DataFrame(
                {
                    "doc_id": b[id_col].astype("int64"),
                    "n_bytes": n,
                    "format": (n % 2).map({0: "png", 1: "jpeg"}),
                    "width": (16 + n % 624).astype("int32"),
                    "height": (16 + (n * 7) % 464).astype("int32"),
                }
            )
            yield _null_masked(out, mask, id_col)

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
            n, mask = _payload_len(b, payload_col)
            sr = (n % 3).map({0: 8000, 1: 16000, 2: 44100}).astype("int32")
            ns = n * 4
            out = pd.DataFrame(
                {
                    "doc_id": b[id_col].astype("int64"),
                    "sample_rate": sr,
                    "n_samples": ns,
                    "duration_ms": (ns * 1000.0 / sr).round(4),
                }
            )
            yield _null_masked(out, mask, id_col)

    return df.select(id_col, payload_col).mapInPandas(run, AUDIO_META_SCHEMA)


#: schema of a resized-image row (what a real resize stage would emit)
RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("src_width", IntegerType()),
        StructField("src_height", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes_out", LongType()),
    ]
)


def _fit_box(sw, sh, tw, th):
    """Aspect-preserving fit of (sw, sh) into a (tw, th) box, never
    upscaling: scale = min(tw/sw, th/sh, 1.0), floor dims, minimum 1 px.
    Pure double arithmetic — the oracle repeats the identical expression
    sequence, so results are bit-identical cross-engine."""
    scale = min(tw / sw, th / sh, 1.0)
    return max(1, int(sw * scale)), max(1, int(sh * scale))


def resize_image_batch(
    batch: pd.DataFrame,
    target: tuple[int, int] = (64, 64),
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> pd.DataFrame:
    """REAL image resize via PIL (optional import — absent in this
    container, covered by the sys.modules monkeypatch test): decode,
    aspect-fit into the target box (never upscale), re-encode PNG, report
    output byte size."""
    if _PILImage is None:
        raise NotImplementedError(
            "real image resize requires Pillow; this container has no image "
            "libraries — fake_resize_images covers the plumbing"
        )
    import io

    tw, th = target
    out = {k: [] for k in ("doc_id", "src_width", "src_height", "width", "height", "n_bytes_out")}
    for doc_id, payload in zip(batch[id_col], batch[payload_col]):
        img = _PILImage.open(io.BytesIO(bytes(payload)))
        w, h = _fit_box(img.width, img.height, tw, th)
        resized = img.resize((w, h))
        buf = io.BytesIO()
        resized.save(buf, format="PNG")
        out["doc_id"].append(int(doc_id))
        out["src_width"].append(int(img.width))
        out["src_height"].append(int(img.height))
        out["width"].append(w)
        out["height"].append(h)
        out["n_bytes_out"].append(len(buf.getvalue()))
    return pd.DataFrame(out).astype(
        {"doc_id": "int64", "src_width": "int32", "src_height": "int32",
         "width": "int32", "height": "int32", "n_bytes_out": "int64"}
    )


def resize_images(
    df: DataFrame,
    target: tuple[int, int] = (64, 64),
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Image resize with live optional-import dispatch (the decode_images
    pattern): PIL when importable, deterministic fake otherwise — the
    Spark plan is one Arrow-batched mapInPandas stage either way."""
    if _PILImage is None:
        return fake_resize_images(df, target, id_col, payload_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield resize_image_batch(b, target, id_col, payload_col)

    return df.select(id_col, payload_col).mapInPandas(run, RESIZE_SCHEMA)


def fake_resize_images(
    df: DataFrame,
    target: tuple[int, int] = (64, 64),
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Deterministic FAKE resize: source dims from the fake_decode_images
    formulas, aspect-fit via _fit_box, fake output bytes = w*h*3 (raw
    RGB). Documented so the oracle mirrors every formula:

      src_width  = 16 + n_bytes % 624
      src_height = 16 + (n_bytes * 7) % 464
      scale      = least(tw/sw, th/sh, 1.0)   -- double division
      width      = greatest(1, floor(sw * scale))
      height     = greatest(1, floor(sh * scale))
      n_bytes_out = width * height * 3
    """
    tw, th = target

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            n, mask = _payload_len(b, payload_col)
            sw = (16 + n % 624).astype("int64")
            sh = (16 + (n * 7) % 464).astype("int64")
            scale = (tw / sw).combine(th / sh, min).combine(1.0, min)
            w = (sw * scale).astype("int64").clip(lower=1)
            h = (sh * scale).astype("int64").clip(lower=1)
            out = pd.DataFrame(
                {
                    "doc_id": b[id_col].astype("int64"),
                    "src_width": sw.astype("int32"),
                    "src_height": sh.astype("int32"),
                    "width": w.astype("int32"),
                    "height": h.astype("int32"),
                    "n_bytes_out": (w * h * 3).astype("int64"),
                }
            )
            yield _null_masked(out, mask, id_col)

    return df.select(id_col, payload_col).mapInPandas(run, RESIZE_SCHEMA)
