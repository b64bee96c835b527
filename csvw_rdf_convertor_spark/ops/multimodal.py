"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed in Arrow-batched pandas UDFs.

The decode step is STUBBED (image/audio libraries are not in this container):
``decode_image_batch`` raises ``NotImplementedError`` unless
``deterministic_fake=True``, which substitutes a hash-derived fake decoder so
the Spark-side plumbing — schema, partitioning, UDF signature, Arrow batch
shape — is real and tested end-to-end.

Production swap-in: replace ``_fake_decode`` with PIL/torchvision/ffmpeg
calls; nothing else changes (the mapInPandas contract is the seam).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_DIM = 16
FEATURES_SCHEMA = f"media_id bigint, kind string, feature array<float>, n_bytes int"


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (binary payload = seeded bytes)."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int")).alias("kind"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.pmod(F.xxhash64("id"), F.lit(1024)) + 32).cast("int").alias("width"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(768)) + 32).cast("int").alias("height"),
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(60000))).cast("int").alias("duration_ms"),
    )
    return df


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: FEATURE_DIM floats derived
    from the payload digest."""
    d = hashlib.sha256(payload or b"").digest()
    arr = np.frombuffer(d[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
    return arr / 65535.0


def extract_features(media: DataFrame, *, deterministic_fake: bool = False,
                     batch_note: str = "mapInPandas/Arrow") -> DataFrame:
    """media table → (media_id, kind, feature[FEATURE_DIM], n_bytes).

    Real decode is NOT implemented in this environment; pass
    ``deterministic_fake=True`` to exercise the full distributed path with
    the hash-derived decoder.
    """

    fake = deterministic_fake

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode needs PIL/ffmpeg — not available in this "
                    "container; use deterministic_fake=True for plumbing tests")
            feats = pdf["payload"].map(lambda b: _fake_decode(bytes(b)).tolist())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feature": feats,
                "n_bytes": pdf["payload"].map(lambda b: len(b or b"")),
            })

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per frame timestamp (pure column
    expressions; the decode of each frame would run in extract_features).
    Demonstrates the explode-based fan-out shape used for video at scale."""
    return (media.where(F.col("kind") == "video")
            .select("media_id",
                    F.explode(F.sequence(
                        F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                        F.lit(every_ms))).alias("frame_ts_ms")))
