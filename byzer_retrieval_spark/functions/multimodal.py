"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side machinery is real and tested — schema, partition-safe
``mapInPandas`` batch shape, Arrow transfer of binary columns, typed
metadata structs. The actual media decode is STUBBED (no image/audio
libraries in this container): ``decode_image_features`` raises
NotImplementedError unless ``fake=True``, in which case it produces a
deterministic hash-derived feature vector so the pipeline (and its
tests) exercise the exact code path a real decoder would.

At 100 TB: binary payloads dominate row size, so these ops must be
single-pass, projection-pruned (never read the binary column unless the
op needs it), and emit fixed-size features — all true of this layout.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("payload", StructType().add("data", "binary").add("codec", "string"), True),
    ]
)

FEATURE_DIM = 32

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("features", ArrayType(FloatType()), False),
    ]
)


def synth_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        data = hashlib.sha256(f"media{i}".encode()).digest() * (4 + i % 5)
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                "width": 64 + i if kind != "audio" else None,
                "height": 48 + i if kind != "audio" else None,
                "duration_ms": 1000 + i if kind != "image" else None,
                "payload": {"data": data, "codec": "raw"},
            }
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_features(data: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: sha256-seeded floats."""
    h = hashlib.sha256(data).digest()
    seed = int.from_bytes(h[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(FEATURE_DIM).astype(np.float32)


def decode_image_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode → feature-extract over binary payloads via mapInPandas.

    Real decode is NOT implemented in this container (no PIL/cv2) —
    ``fake=False`` raises at task time, by design. The batch shape,
    Arrow binary transfer, and output schema are the production path.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            if not fake:
                raise NotImplementedError(
                    "media decoding requires an image/audio library not "
                    "present in this environment; pass fake=True for the "
                    "deterministic stub"
                )
            feats = [_fake_features(p["data"]) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(np.int64),
                    "kind": pdf["kind"].to_numpy(object),
                    "n_bytes": [len(p["data"]) for p in pdf["payload"]],
                    "features": [f.tolist() for f in feats],
                }
            )

    # projection: only the columns the decoder needs cross into Python
    return df.select("media_id", "kind", "payload").mapInPandas(
        gen, schema=FEATURES_SCHEMA
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling PLAN: computes per-row frame timestamps as a
    JVM-side expression (the decode of each frame would be a second
    mapInPandas over (media_id, ts) — stubbed like decode above)."""
    n_frames = (F.col("duration_ms") / F.lit(every_ms)).cast("int")
    return (
        df.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.when(
                n_frames > 0, F.transform(F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms)
            ).otherwise(F.expr("array()").cast("array<int>")),
        )
        .select("media_id", "duration_ms", "frame_ts_ms")
    )
