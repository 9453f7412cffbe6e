"""Multimodal: real BMP/PPM/WAV/Y4M codecs + Spark plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from centrality_gpu_spark.functions import media_codecs as mc
from centrality_gpu_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_media,
    extract_frames,
    resize_images,
    sample_frames,
    synthetic_media,
)


# ------------------------------------------------------------ pure codecs


def test_bmp_roundtrip():
    rng = np.random.default_rng(7)
    for w, h in [(1, 1), (5, 3), (33, 17), (64, 64)]:  # odd widths hit row padding
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(mc.decode_image(mc.encode_bmp(img)), img)


def test_ppm_roundtrip_and_comments():
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, size=(9, 13, 3), dtype=np.uint8)
    assert np.array_equal(mc.decode_image(mc.encode_ppm(img)), img)
    with_comment = b"P6\n# a comment\n13 9\n255\n" + img.tobytes()
    assert np.array_equal(mc.decode_image(with_comment), img)


def test_wav_roundtrip():
    rng = np.random.default_rng(9)
    mono = rng.integers(-30000, 30000, size=1000).astype(np.int16)
    out, rate = mc.decode_wav(mc.encode_wav(mono, 8000))
    assert rate == 8000
    assert np.array_equal(out[:, 0], mono)
    stereo = rng.integers(-30000, 30000, size=(500, 2)).astype(np.int16)
    out2, _ = mc.decode_wav(mc.encode_wav(stereo, 44100))
    assert np.array_equal(out2, stereo)


def test_y4m_roundtrip_and_sampling():
    rng = np.random.default_rng(10)
    frames = rng.integers(0, 256, size=(11, 24, 32), dtype=np.uint8)
    payload = mc.encode_y4m(frames)
    assert mc.count_y4m_frames(payload) == 11
    decoded = dict(mc.decode_y4m(payload))
    assert set(decoded) == set(range(11))
    for i in range(11):
        assert np.array_equal(decoded[i], frames[i])
    sampled = dict(mc.decode_y4m(payload, frame_indices=[0, 5, 10]))
    assert set(sampled) == {0, 5, 10}
    assert np.array_equal(sampled[5], frames[5])


def test_sniff_rejects_compressed(monkeypatch):
    # pin the probes to "absent" so this test documents the no-Pillow
    # path even if the container ever grows the optional libraries
    monkeypatch.setattr(mc, "_optional_pillow", lambda: None)
    monkeypatch.setattr(mc, "_optional_av", lambda: None)
    with pytest.raises(NotImplementedError, match="Pillow"):
        mc.sniff_kind(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(NotImplementedError, match="PyAV"):
        mc.sniff_kind(b"\x00\x00\x00\x18ftypmp42....")
    with pytest.raises(ValueError, match="unrecognized"):
        mc.sniff_kind(b"\x01\x02\x03\x04 random junk")


class _FakePillowImage:
    """Stand-in for PIL.Image.open()'s result: context manager with a
    convert('RGB') that yields an array-like."""

    _ARR = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)

    def convert(self, mode):
        assert mode == "RGB"
        return self._ARR

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class _FakePillowModule:
    opened: list = []

    @classmethod
    def open(cls, buf):
        cls.opened.append(buf.read()[:8])
        return _FakePillowImage()


def test_sniff_and_decode_with_pillow_present(monkeypatch):
    """When Pillow is importable, PNG/JPEG sniff through and
    decode_image routes to it (mocked import — Pillow isn't in this
    container)."""
    monkeypatch.setattr(mc, "_optional_pillow", lambda: _FakePillowModule)
    png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 16
    jpg = b"\xff\xd8\xff\xe0" + b"\x00" * 16
    assert mc.sniff_kind(png) == "png"
    assert mc.sniff_kind(jpg) == "jpeg"
    out = mc.decode_image(png)
    assert out.shape == (4, 5, 3) and out.dtype == np.uint8
    assert np.array_equal(out, _FakePillowImage._ARR)
    assert _FakePillowModule.opened[-1] == png[:8]


def test_sniff_mp4_with_av_present(monkeypatch):
    monkeypatch.setattr(mc, "_optional_av", lambda: object())
    assert mc.sniff_kind(b"\x00\x00\x00\x18ftypmp42....") == "mp4"
    assert mc.sniff_kind(b"\x1a\x45\xdf\xa3....") == "mkv"


def test_resize_nearest_identity_and_shape():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(20, 30, 3), dtype=np.uint8)
    assert np.array_equal(mc.resize_nearest(img, 30, 20), img)
    small = mc.resize_nearest(img, 7, 5)
    assert small.shape == (5, 7, 3)


# ------------------------------------------------------------ Spark plumbing


@pytest.fixture(scope="module")
def media(spark):
    df = synthetic_media(spark, n=30).persist()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def real_media(spark):
    df = synthetic_media(spark, n=30, real=True).persist()
    df.count()
    yield df
    df.unpersist()


def test_decode_fake_deterministic(spark, media):
    a = {r.media_id: r.features for r in decode_media(media, fake=True).collect()}
    b = {r.media_id: r.features
         for r in decode_media(media.repartition(7), fake=True).collect()}
    assert set(a) == set(b)
    for k in a:
        assert len(a[k]) == FEATURE_DIM
        assert a[k] == b[k]  # partition-invariant


def test_decode_real_media(spark, real_media):
    rows = decode_media(real_media, fake=False).collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r.features) == FEATURE_DIM
        assert all(np.isfinite(r.features))
    # image features are luma means in [0, 1]
    img_rows = [r for r in rows if r.kind == "image"]
    assert img_rows and all(0.0 <= f <= 1.0 for r in img_rows for f in r.features)


def test_decode_real_path_rejects_junk(spark, media):
    # random-byte payloads have no magic: the real path must error, not
    # silently fabricate features
    with pytest.raises(Exception) as ei:
        decode_media(media, fake=False).collect()
    assert "unrecognized" in str(ei.value) or "ValueError" in str(ei.value)


def test_resize_real_images(spark, real_media):
    resized = resize_images(real_media, 16, 12, fake=False).collect()
    n_img = real_media.where(F.col("kind") == "image").count()
    assert len(resized) == n_img
    for r in resized:
        img = mc.decode_image(bytes(r.payload))
        assert img.shape == (12, 16, 3)


def test_extract_frames_real(spark, real_media):
    feats = extract_frames(real_media, every_n=5).collect()
    metas = {
        r.media_id: r.nf
        for r in real_media.where(F.col("kind") == "video")
        .select("media_id", F.col("meta.n_frames").alias("nf")).collect()
    }
    by_media: dict[int, list[int]] = {}
    for r in feats:
        by_media.setdefault(r.media_id, []).append(r.frame_idx)
        assert len(r.features) == FEATURE_DIM
    assert set(by_media) == set(metas)
    for mid, idxs in by_media.items():
        assert sorted(idxs) == list(range(0, metas[mid], 5))


def test_sample_frames_plan_only(spark, media):
    frames = sample_frames(media, every_n=10)
    row = frames.groupBy("media_id").agg(F.count("*").alias("n")).first()
    assert row is not None and row["n"] >= 1


def test_features_feed_ann(spark, real_media):
    # decoded features plug into the similarity operators unchanged
    from centrality_gpu_spark.operators.similarity import cosine_topk_sql

    emb = decode_media(real_media, fake=False).select(
        F.col("media_id").alias("vec_id"), F.col("features").alias("embedding")
    )
    top = cosine_topk_sql(emb, k=3)
    assert top.groupBy("query_id").count().agg(F.max("count")).collect()[0][0] <= 3


class _FakeAvFrame:
    def __init__(self, idx):
        self.idx = idx

    def to_ndarray(self, format):
        assert format == "rgb24"
        return np.full((6, 8, 3), self.idx, dtype=np.uint8)


class _FakeAvStream:
    frames = 5


class _FakeAvContainer:
    def __init__(self):
        class _S:
            video = [_FakeAvStream()]

        self.streams = _S()

    def decode(self, stream):
        for i in range(_FakeAvStream.frames):
            yield _FakeAvFrame(i)

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _FakeAvModule:
    @staticmethod
    def open(fh):
        return _FakeAvContainer()


def test_decode_video_frame_with_av_present(monkeypatch):
    """With PyAV importable, sniffed mp4/mkv payloads have a REAL
    decode path: middle frame (metadata-targeted) as rgb24."""
    monkeypatch.setattr(mc, "_optional_av", lambda: _FakeAvModule)
    out = mc.decode_video_frame(b"\x00\x00\x00\x18ftypmp42....")
    # 5 frames, position 0.5 -> frame index 2
    assert out.shape == (6, 8, 3) and out[0, 0, 0] == 2
    first = mc.decode_video_frame(b"\x1a\x45\xdf\xa3....", position=0.0)
    assert first[0, 0, 0] == 0


def test_decode_video_frame_without_av(monkeypatch):
    monkeypatch.setattr(mc, "_optional_av", lambda: None)
    with pytest.raises(NotImplementedError, match="PyAV"):
        mc.decode_video_frame(b"\x00\x00\x00\x18ftypmp42....")


def test_real_features_routes_mp4_through_av(monkeypatch):
    """_real_features must not fall through to the y4m branch for
    sniffed video payloads (it used to, crashing on garbage parse)."""
    from centrality_gpu_spark.operators.multimodal import _real_features

    monkeypatch.setattr(mc, "_optional_av", lambda: _FakeAvModule)
    feats = _real_features(b"\x00\x00\x00\x18ftypmp42....", 32)
    exp = mc.image_features(np.full((6, 8, 3), 2, dtype=np.uint8), 32)
    assert feats.shape == (32,)
    assert np.allclose(feats, exp)
