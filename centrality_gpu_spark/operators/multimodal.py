"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, decoded and featurized via ``mapInPandas``.

Decoding is REAL for the uncompressed public formats a stdlib+numpy
container can parse (functions/media_codecs.py): BMP and binary-PPM
images, PCM WAV audio, and YUV4MPEG2 video. Compressed formats
(PNG/JPEG/MP4...) are sniffed and rejected with a NotImplementedError
naming the library that would decode them — the honest boundary in this
environment. ``fake=True`` keeps the hash-seeded deterministic stub for
arbitrary payloads (plumbing tests, synthetic corpora of random bytes).

Schema convention::

    media(media_id:long, kind:string, payload:binary,
          meta:struct<width:int, height:int, sample_rate:int,
                      n_frames:int, mime:string>)

Feature extraction emits fixed-width float vectors (array<float>) —
the same shape the similarity operators consume, so decoded media
plugs straight into the ANN/near-dup pipeline.

At scale the pattern is: partition on media_id (payloads are opaque —
no shuffle ever touches pixel data), Arrow-batch into the UDF, and keep
per-batch memory bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
(payloads can be MBs each, so a smaller batch cap than the 10k default
is the right production setting).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from centrality_gpu_spark.functions import media_codecs as mc

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, mime:string>"
)

FEATURE_DIM = 32


def synthetic_media(
    spark: SparkSession, n: int = 64, seed: int = 42, real: bool = False
) -> DataFrame:
    """Deterministic media table. ``real=False``: payload = seeded raw
    bytes (plumbing tests). ``real=True``: payloads are real encoded
    BMP / WAV-PCM / Y4M files the decoders can round-trip."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        rng = np.random.default_rng([seed, i])
        kind = kinds[i % 3]
        if real:
            if kind == "image":
                w, h = int(rng.integers(16, 96)), int(rng.integers(16, 96))
                img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                payload = mc.encode_bmp(img) if i % 2 else mc.encode_ppm(img)
                meta = {"width": w, "height": h, "sample_rate": None,
                        "n_frames": None,
                        "mime": "image/bmp" if i % 2 else "image/x-portable-pixmap"}
            elif kind == "audio":
                n_samp = int(rng.integers(800, 4000))
                samp = rng.integers(-20000, 20000, size=n_samp, dtype=np.int64)
                payload = mc.encode_wav(samp.astype(np.int16), 16000)
                meta = {"width": None, "height": None, "sample_rate": 16000,
                        "n_frames": None, "mime": "audio/wav"}
            else:
                nf = int(rng.integers(4, 24))
                w, h = 32, 24
                frames = rng.integers(0, 256, size=(nf, h, w), dtype=np.uint8)
                payload = mc.encode_y4m(frames)
                meta = {"width": w, "height": h, "sample_rate": None,
                        "n_frames": nf, "mime": "video/x-yuv4mpeg"}
        else:
            payload = rng.bytes(128 + int(rng.integers(0, 128)))
            meta = {
                "width": int(rng.integers(16, 512)) if kind != "audio" else None,
                "height": int(rng.integers(16, 512)) if kind != "audio" else None,
                "sample_rate": 16000 if kind == "audio" else None,
                "n_frames": int(rng.integers(1, 100)) if kind == "video" else None,
                "mime": {"image": "image/png", "audio": "audio/wav",
                         "video": "video/mp4"}[kind],
            }
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in used by ``fake=True``: features are a pure
    function of the payload bytes (sha256-seeded), so tests are stable
    across partitionings and runs."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def _real_features(payload: bytes, dim: int) -> np.ndarray:
    kind = mc.sniff_kind(payload)
    if kind in ("bmp", "ppm", "png", "jpeg", "gif"):
        # png/jpeg/gif only sniff through when Pillow is importable
        return mc.image_features(mc.decode_image(payload), dim)
    if kind == "wav":
        samples, _rate = mc.decode_wav(payload)
        return mc.audio_features(samples, dim)
    if kind in ("mp4", "mkv"):
        # mp4/mkv only sniff through when PyAV is importable
        return mc.image_features(mc.decode_video_frame(payload), dim)
    # y4m: features of the middle frame (cheap single-frame decode)
    mid = mc.count_y4m_frames(payload) // 2
    for _idx, luma in mc.decode_y4m(payload, frame_indices=[mid]):
        return mc.image_features(luma, dim)
    return np.zeros(dim, dtype=np.float32)


def decode_media(
    media: DataFrame, feature_dim: int = FEATURE_DIM, fake: bool = False
) -> DataFrame:
    """(media_id, kind, features: array<float>) via mapInPandas.

    Real path: magic-sniffed BMP/PPM/WAV/Y4M decode + grid features
    (media_codecs). Compressed payloads raise NotImplementedError
    naming the missing library; unknown bytes raise ValueError.
    """

    def decode(batches):
        fn = (lambda p: _fake_decode(p, feature_dim)) if fake else (
            lambda p: _real_features(p, feature_dim)
        )
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = [fn(bytes(p)).tolist() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        decode, "media_id long, kind string, features array<float>"
    )


def resize_images(
    media: DataFrame, width: int, height: int, fake: bool = False
) -> DataFrame:
    """(media_id, payload) — images decoded, nearest-neighbor resized,
    re-encoded as BMP. ``fake=True`` keeps the hash stub for random-byte
    payloads."""

    def resize(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if fake:
                out = [
                    hashlib.sha256(bytes(p) + f"{width}x{height}".encode()).digest()
                    for p in pdf["payload"]
                ]
            else:
                out = [
                    mc.encode_bmp(
                        mc.resize_nearest(mc.decode_image(bytes(p)), width, height)
                    )
                    for p in pdf["payload"]
                ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": out})

    return (
        media.where(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(resize, "media_id long, payload binary")
    )


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """(media_id, frame_idx) — frame-sampling plan for videos, derived
    from metadata only (no decode needed): JVM-side sequence/explode."""
    return (
        media.where((F.col("kind") == "video") & F.col("meta.n_frames").isNotNull())
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )


def extract_frames(
    media: DataFrame, every_n: int = 10, feature_dim: int = FEATURE_DIM
) -> DataFrame:
    """(media_id, frame_idx, features) — REAL Y4M frame extraction:
    every ``every_n``-th frame's luma plane is decoded (unsampled frames
    are skipped by offset arithmetic, not decoded) and grid-featurized.
    One output row per sampled frame — video search/dedup feed."""

    def extract(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, idxs, feats = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(p)
                n_frames = mc.count_y4m_frames(payload)
                wanted = range(0, n_frames, every_n)
                for fi, luma in mc.decode_y4m(payload, frame_indices=wanted):
                    ids.append(mid)
                    idxs.append(fi)
                    feats.append(mc.image_features(luma, feature_dim).tolist())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "features": feats}
            )

    return (
        media.where(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(extract, "media_id long, frame_idx int, features array<float>")
    )
