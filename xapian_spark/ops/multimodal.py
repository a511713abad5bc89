"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas stages.

The decode step is STUBBED (codec libraries are not available in this
container): ``decode="fake"`` produces a deterministic feature vector from
the bytes (sha256-seeded), so the Spark-side plumbing — schema, batching,
partitioning, UDF signatures — is real and tested end-to-end, while
``decode="real"`` raises NotImplementedError at the exact point a codec
(PIL/ffmpeg/soundfile) would plug in.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (binary payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 7)
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + i % 512 if kind != "audio" else None,
                48 + i % 256 if kind != "audio" else None,
                1000 * (1 + i % 30) if kind != "image" else None,
                payload,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_feature(payload: bytes, dim: int = 16) -> list[float]:
    """Deterministic stand-in for a real decoder+encoder: bytes -> R^dim.

    feature[j] = byte_j(sha256(hex(payload))) / 255 * 2 - 1 — chosen to be
    reproducible in ANSI SQL (DuckDB sha256 is VARCHAR-only, hence the hex
    round-trip), so the driver's oracle can hash-check the full mapInPandas
    pipeline, not just row counts.  dim <= 32.
    """
    h = hashlib.sha256(payload.hex().encode()).digest()
    return [h[j] / 255.0 * 2.0 - 1.0 for j in range(dim)]


def extract_features(
    media: DataFrame, decode: str = "fake", dim: int = 16, batch_hint: int = 256
) -> DataFrame:
    """mapInPandas feature extraction: the real scale plumbing.

    Each Arrow batch is a pandas DataFrame of media rows; a real decoder
    would release the GIL in C (PIL/ffmpeg).  Partitioning: upstream should
    repartition by size class so batches have uniform decode cost.
    """
    if decode not in ("fake", "real"):
        raise ValueError(decode)

    def _extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decode == "real":
                raise NotImplementedError(
                    "real decode requires PIL/ffmpeg/soundfile; plug in here"
                )
            feats = [
                _fake_feature(bytes(p), dim) for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: (media_id, frame_ts_ms) rows — the shuffle
    shape of frame extraction without the codec.  Pure column expressions."""
    vids = media.where(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
