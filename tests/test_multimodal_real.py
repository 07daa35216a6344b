"""Real-decoder branch coverage for multimodal operators.

The container has no PIL/soundfile, so the real branches
(decode_image_batch / decode_audio_batch bodies and the decode_images /
decode_audio dispatch) would otherwise never execute. These tests inject
stub library modules via monkeypatch so the REAL code path runs — the
batch functions driver-side (they are plain pandas-in/pandas-out, which
is exactly what the Arrow worker calls), and the dispatch functions up to
plan construction (executing the plan would need the stub inside the
separate Python worker process, which a driver monkeypatch cannot reach).
"""


import numpy as np
import pandas as pd
import pytest

from database_extractor_spark.operators import multimodal as mm


class _FakeImg:
    def __init__(self, raw: bytes):
        self.format = "PNG" if len(raw) % 2 == 0 else None
        self.width = 10 + len(raw)
        self.height = 5 + len(raw)


class _FakePILImage:
    """Stub for PIL.Image: open(fp) -> object with format/width/height."""

    last_opened: list = []

    @classmethod
    def open(cls, fp):
        raw = fp.read()
        cls.last_opened.append(raw)
        return _FakeImg(raw)


class _FakeSoundfile:
    """Stub for soundfile: read(fp) -> (ndarray, samplerate)."""

    @staticmethod
    def read(fp):
        raw = fp.read()
        return np.zeros(len(raw) * 2), 16000


def test_decode_image_batch_real_branch(monkeypatch):
    monkeypatch.setattr(mm, "_PILImage", _FakePILImage)
    _FakePILImage.last_opened.clear()
    batch = pd.DataFrame({"doc_id": [1, 2], "payload": [b"abcd", b"xyz"]})
    out = mm.decode_image_batch(batch)
    # the stub really received the payload bytes through BytesIO
    assert _FakePILImage.last_opened == [b"abcd", b"xyz"]
    assert out["doc_id"].tolist() == [1, 2]
    assert out["n_bytes"].tolist() == [4, 3]
    # even-length -> stub reports PNG; odd-length stub has format=None,
    # which the real branch maps to "unknown"
    assert out["format"].tolist() == ["png", "unknown"]
    assert out["width"].tolist() == [14, 13]
    assert out["height"].tolist() == [9, 8]
    # dtypes must match IMAGE_META_SCHEMA (what the Arrow worker asserts)
    assert out["doc_id"].dtype == "int64"
    assert out["width"].dtype == "int32"
    assert out["height"].dtype == "int32"


def test_decode_image_batch_raises_without_library(monkeypatch):
    monkeypatch.setattr(mm, "_PILImage", None)
    with pytest.raises(NotImplementedError):
        mm.decode_image_batch(pd.DataFrame({"doc_id": [1], "payload": [b"x"]}))


def test_decode_audio_batch_real_branch(monkeypatch):
    monkeypatch.setattr(mm, "_soundfile", _FakeSoundfile)
    batch = pd.DataFrame({"doc_id": [7], "payload": [b"\x00" * 80]})
    out = mm.decode_audio_batch(batch)
    assert out["doc_id"].tolist() == [7]
    assert out["sample_rate"].tolist() == [16000]
    assert out["n_samples"].tolist() == [160]
    assert out["duration_ms"].tolist() == [round(160 * 1000.0 / 16000, 4)]
    assert out["sample_rate"].dtype == "int32"
    assert out["n_samples"].dtype == "int64"


def test_decode_audio_batch_raises_without_library(monkeypatch):
    monkeypatch.setattr(mm, "_soundfile", None)
    with pytest.raises(NotImplementedError):
        mm.decode_audio_batch(pd.DataFrame({"doc_id": [1], "payload": [b"x"]}))


def test_decode_images_dispatches_to_real_branch(monkeypatch, spark):
    """With the library present, decode_images must build the REAL
    mapInPandas plan and never touch the fake."""
    monkeypatch.setattr(mm, "_PILImage", _FakePILImage)

    def _boom(*a, **k):  # fake path must not be taken
        raise AssertionError("fake_decode_images called despite library present")

    monkeypatch.setattr(mm, "fake_decode_images", _boom)
    df = spark.createDataFrame([(1, b"abcd")], "doc_id long, payload binary")
    out = mm.decode_images(df)
    assert out.schema == mm.IMAGE_META_SCHEMA
    assert "MapInPandas" in out._jdf.queryExecution().analyzed().toString()


def test_decode_audio_dispatches_to_real_branch(monkeypatch, spark):
    monkeypatch.setattr(mm, "_soundfile", _FakeSoundfile)

    def _boom(*a, **k):
        raise AssertionError("fake_decode_audio called despite library present")

    monkeypatch.setattr(mm, "fake_decode_audio", _boom)
    df = spark.createDataFrame([(1, b"abcd")], "doc_id long, payload binary")
    out = mm.decode_audio(df)
    assert out.schema == mm.AUDIO_META_SCHEMA
    assert "MapInPandas" in out._jdf.queryExecution().analyzed().toString()


class _FakeResizableImg:
    def __init__(self, raw: bytes):
        self.width = 10 + len(raw)
        self.height = 5 + len(raw)

    def resize(self, wh):
        self._wh = wh
        return self

    def save(self, buf, format=None):
        # fake encoder: 2 bytes per pixel
        buf.write(b"\x00" * (self._wh[0] * self._wh[1] * 2))


class _FakeResizePIL:
    @classmethod
    def open(cls, fp):
        return _FakeResizableImg(fp.read())


def test_resize_image_batch_real_branch(monkeypatch):
    monkeypatch.setattr(mm, "_PILImage", _FakeResizePIL)
    # src 14x9 (payload len 4): fits under 64 box -> unchanged (no upscale)
    # src 110x105 (payload len 100): scale = min(64/110, 64/105, 1) = 64/110
    batch = pd.DataFrame({"doc_id": [1, 2], "payload": [b"abcd", b"x" * 100]})
    out = mm.resize_image_batch(batch, target=(64, 64))
    assert out["src_width"].tolist() == [14, 110]
    assert out["src_height"].tolist() == [9, 105]
    assert out["width"].tolist() == [14, 64]
    assert out["height"].tolist() == [9, int(105 * (64 / 110))]
    assert out["n_bytes_out"].tolist() == [
        14 * 9 * 2,
        64 * int(105 * (64 / 110)) * 2,
    ]
    assert out["width"].dtype == "int32"
    assert out["n_bytes_out"].dtype == "int64"


def test_resize_image_batch_raises_without_library(monkeypatch):
    monkeypatch.setattr(mm, "_PILImage", None)
    with pytest.raises(NotImplementedError):
        mm.resize_image_batch(pd.DataFrame({"doc_id": [1], "payload": [b"x"]}))


def test_resize_dispatch_uses_real_branch_in_plan(monkeypatch, spark):
    monkeypatch.setattr(mm, "_PILImage", _FakeResizePIL)
    df = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    plan_df = mm.resize_images(mm.attach_payload(df, "text"))
    # dispatch chose the real mapInPandas path (plan construction only —
    # executing would need the stub inside the Python worker)
    assert plan_df.schema == mm.RESIZE_SCHEMA


# --------------------------------------------------------------------------
# TRUE end-to-end real-library coverage (VERDICT r13 item 7): when PIL is
# actually importable — not stub-injected — drive decode_images and
# resize_images through the REAL Spark Python worker on REAL encoded
# bytes, so the only remaining NotImplementedError surface is codecs the
# environment truly lacks. Skips (environment-conditional, not a stub)
# where PIL is absent; the stub-injection tests above keep the branch
# logic covered everywhere.
# --------------------------------------------------------------------------


def _real_pil():
    return pytest.importorskip("PIL.Image", reason="PIL not installed")


def test_decode_images_end_to_end_with_real_pil(spark):
    PILImage = _real_pil()
    import io

    assert mm._PILImage is not None  # live import dispatch saw it too
    bufs = []
    for w, h in ((12, 7), (30, 30)):
        img = PILImage.new("RGB", (w, h))
        b = io.BytesIO()
        img.save(b, format="PNG")
        bufs.append(b.getvalue())
    df = spark.createDataFrame(
        [(1, bufs[0]), (2, bufs[1])], "doc_id long, payload binary"
    )
    rows = {r["doc_id"]: r for r in mm.decode_images(df).collect()}
    assert rows[1]["format"] == "png" and rows[2]["format"] == "png"
    assert (rows[1]["width"], rows[1]["height"]) == (12, 7)
    assert (rows[2]["width"], rows[2]["height"]) == (30, 30)
    assert rows[1]["n_bytes"] == len(bufs[0])


def test_resize_images_end_to_end_with_real_pil(spark):
    PILImage = _real_pil()
    import io

    img = PILImage.new("RGB", (200, 100))
    b = io.BytesIO()
    img.save(b, format="PNG")
    df = spark.createDataFrame([(1, b.getvalue())], "doc_id long, payload binary")
    out = mm.resize_images(df, target=(64, 64)).collect()[0]
    # aspect-preserving downscale: scale = 64/200
    assert (out["src_width"], out["src_height"]) == (200, 100)
    assert (out["width"], out["height"]) == (64, 32)
    assert out["n_bytes_out"] > 0
