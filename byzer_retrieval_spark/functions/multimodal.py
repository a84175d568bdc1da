"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side machinery is real and tested — schema, partition-safe
``mapInPandas`` batch shape, Arrow transfer of binary columns, typed
metadata structs. The media decode itself is pluggable: if Pillow is
importable, ``decode_image_features(fake=False)`` REALLY decodes image
payloads (luminance-histogram features); otherwise it raises
NotImplementedError unless ``fake=True``, in which case it produces a
deterministic hash-derived feature vector so the pipeline (and its
tests) exercise the exact code path a real decoder would. Audio/video
decode stays stubbed either way (no codec libraries).

At 100 TB: binary payloads dominate row size, so these ops must be
single-pass, projection-pruned (never read the binary column unless the
op needs it), and emit fixed-size features — all true of this layout.
"""

from __future__ import annotations

import hashlib
import io
from typing import Iterator, Optional

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

# Optional real decoder: Pillow, if the environment provides it. Resolved
# at import time ON THE DRIVER and captured in the UDF closure as a plain
# bool; on a real cluster the executors must also have Pillow installed
# (ship it via --archives / a conda env) or task-time import fails fast.
try:  # pragma: no cover - exercised only where Pillow exists
    from PIL import Image as _PILImage  # type: ignore

    HAS_PIL = True
except Exception:  # ImportError, or a broken install
    _PILImage = None
    HAS_PIL = False

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


def _pil_image_features(data: bytes) -> Optional[np.ndarray]:
    """Real image decode (Pillow): grayscale 16x16 resize → 32-bin
    L1-normalized luminance histogram. Deterministic for a given payload.
    Returns None when the payload is not a decodable image."""
    try:
        with _PILImage.open(io.BytesIO(data)) as im:
            px = np.asarray(im.convert("L").resize((16, 16)), dtype=np.float32)
    except Exception:
        return None
    hist, _ = np.histogram(px.ravel(), bins=FEATURE_DIM, range=(0.0, 256.0))
    total = float(hist.sum()) or 1.0
    return (hist / total).astype(np.float32)


def decode_image_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode → feature-extract over binary payloads via mapInPandas.

    Three modes, resolved on the driver:

    - ``fake=True``: deterministic sha256-seeded stand-in features for
      every row (any kind) — the test/oracle path in this container.
    - ``fake=False`` with Pillow available: REAL decode for
      ``kind == 'image'`` rows (luminance-histogram features); rows whose
      payload Pillow cannot decode raise with the offending media_id.
      Audio/video decode remains unimplemented (no codec libs) and raises.
    - ``fake=False`` without Pillow: raises NotImplementedError at task
      time, by design.

    The batch shape, Arrow binary transfer, projection pruning, and
    output schema are the production path in all three modes.
    """
    use_pil = HAS_PIL and not fake  # resolved driver-side, captured below

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            if not fake and not use_pil:
                raise NotImplementedError(
                    "media decoding requires an image/audio library not "
                    "present in this environment; pass fake=True for the "
                    "deterministic stub"
                )
            feats = []
            for mid, kind, p in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if fake:
                    feats.append(_fake_features(p["data"]))
                    continue
                if kind != "image":
                    raise NotImplementedError(
                        f"media_id={mid}: real decode implemented for images "
                        "only (no audio/video codec libraries)"
                    )
                f = _pil_image_features(p["data"])
                if f is None:
                    raise ValueError(
                        f"media_id={mid}: payload is not a decodable image"
                    )
                feats.append(f)
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


def synth_png_media_df(spark, n: int = 16) -> DataFrame:
    """Deterministic table of REAL PNG payloads (requires Pillow).

    Each payload is an 8x8 RGB gradient seeded by the media_id, encoded
    to PNG bytes — decodable by any image library, so the real-decode
    path can be exercised end-to-end where Pillow exists."""
    if not HAS_PIL:  # pragma: no cover
        raise NotImplementedError("synth_png_media_df requires Pillow")
    rows = []
    for i in range(n):
        arr = np.zeros((8, 8, 3), dtype=np.uint8)
        arr[..., 0] = (np.arange(8)[:, None] * (i + 1)) % 256
        arr[..., 1] = (np.arange(8)[None, :] * (i + 3)) % 256
        arr[..., 2] = i % 256
        buf = io.BytesIO()
        _PILImage.fromarray(arr, "RGB").save(buf, format="PNG")
        rows.append(
            {
                "media_id": i,
                "kind": "image",
                "mime": "image/png",
                "width": 8,
                "height": 8,
                "duration_ms": None,
                "payload": {"data": buf.getvalue(), "codec": "png"},
            }
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


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
