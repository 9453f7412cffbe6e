"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via ``mapInPandas``.

The decode step is STUBBED (image/audio libraries are not in this
container): ``decode_media`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder (hash-seeded
numpy) stands in so the Spark-side plumbing — schema, partitioning,
Arrow batch shape, UDF signature — is real and tested end-to-end.

Schema convention::

    media(media_id:long, kind:string, payload:binary,
          meta:struct<width:int, height:int, sample_rate:int,
                      n_frames:int, mime:string>)

Feature extraction emits fixed-width float vectors (array<float>) —
the same shape the similarity operators consume, so decoded media
plugs straight into the ANN/dedup pipeline.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, mime:string>"
)

FEATURE_DIM = 32


def synthetic_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        rng = np.random.default_rng([seed, i])
        kind = kinds[i % 3]
        payload = rng.bytes(128 + int(rng.integers(0, 128)))
        meta = {
            "width": int(rng.integers(16, 512)) if kind != "audio" else None,
            "height": int(rng.integers(16, 512)) if kind != "audio" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_frames": int(rng.integers(1, 100)) if kind == "video" else None,
            "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
        }
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: features are a pure
    function of the payload bytes (sha256-seeded), so tests are stable
    across partitionings and runs."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def decode_media(
    media: DataFrame, feature_dim: int = FEATURE_DIM, fake: bool = False
) -> DataFrame:
    """(media_id, kind, features: array<float>) via mapInPandas.

    With ``fake=False`` this raises NotImplementedError at execution
    time — replace ``_fake_decode`` with a real decoder (PIL/librosa/
    pyav) when the libraries are available. The Spark plumbing is
    identical either way.
    """

    def decode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if not fake:
                raise NotImplementedError(
                    "real media decoding requires image/audio libs not in "
                    "this container; pass fake=True for the deterministic stub"
                )
            feats = [
                _fake_decode(bytes(p), feature_dim).tolist() for p in pdf["payload"]
            ]
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


def resize_images(media: DataFrame, width: int, height: int, fake: bool = False) -> DataFrame:
    """(media_id, payload) images resized — stubbed like decode_media;
    the fake path re-hashes payload + target dims deterministically."""

    def resize(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if not fake:
                raise NotImplementedError("image resize requires PIL; pass fake=True")
            out = [
                hashlib.sha256(bytes(p) + f"{width}x{height}".encode()).digest()
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
