"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side machinery is real and tested — schema, partition-safe
``mapInPandas`` batch shape, Arrow transfer of binary columns, typed
metadata structs. The media decode itself is pluggable: if Pillow is
importable, ``decode_image_features(fake=False)`` REALLY decodes image
payloads (luminance-histogram features); otherwise it raises
NotImplementedError unless ``fake=True``, in which case it produces a
deterministic hash-derived feature vector so the pipeline (and its
tests) exercise the exact code path a real decoder would. Audio WAV/PCM
payloads are REALLY decoded via the stdlib ``wave`` module (round 5 —
no external dependency): amplitude-histogram + spectral-band features.
Video payloads in the uncompressed YUV4MPEG2 (.y4m) container are
REALLY decoded with pure numpy (round 5): luma histogram + temporal
mean-luma profile, and real per-frame sampling via
``sample_video_frames``. Only COMPRESSED video codecs (mp4/h264/vp9…)
remain stubbed — those genuinely need codec libraries absent here.

At 100 TB: binary payloads dominate row size, so these ops must be
single-pass, projection-pruned (never read the binary column unless the
op needs it), and emit fixed-size features — all true of this layout.
"""

from __future__ import annotations

import hashlib
import io
import wave
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


def _wav_audio_features(data: bytes) -> Optional[np.ndarray]:
    """Real audio decode (stdlib ``wave``, PCM WAV): 16-bin L1-normalized
    amplitude histogram over [-1, 1] concatenated with 16 L1-normalized
    equal-width spectral band energies (|rfft|^2). Deterministic for a
    given payload. Returns None when the payload is not decodable PCM
    WAV."""
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            sw = w.getsampwidth()
            nch = w.getnchannels()
            raw = w.readframes(w.getnframes())
    except Exception:
        return None
    if sw == 1:  # unsigned 8-bit
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 3:  # packed 24-bit little-endian, sign-extended
        b = np.frombuffer(raw, dtype=np.uint8)
        b = b[: (b.size // 3) * 3].reshape(-1, 3).astype(np.int32)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        x = (v - ((v >> 23) & 1) * (1 << 24)).astype(np.float32) / 8388608.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        return None
    if x.size == 0:
        return None
    if nch > 1:
        x = x[: (x.size // nch) * nch].reshape(-1, nch).mean(axis=1)
    half = FEATURE_DIM // 2
    ah, _ = np.histogram(x, bins=half, range=(-1.0, 1.0))
    ah = ah / (float(ah.sum()) or 1.0)
    spec = np.abs(np.fft.rfft(x.astype(np.float64))) ** 2
    be = np.array([b.sum() for b in np.array_split(spec, half)], dtype=np.float64)
    be = be / (float(be.sum()) or 1.0)
    return np.concatenate([ah, be]).astype(np.float32)


def _y4m_parse(data: bytes):
    """Parse an uncompressed YUV4MPEG2 stream with pure numpy.

    Returns ``(width, height, fps, [luma_plane, ...])`` where each luma
    plane is a ``(h, w) uint8`` array (chroma is skipped — every feature
    here is luminance-based), or None when the payload is not Y4M.
    Supports the C420*, C422, C444 and Cmono colorspaces. The format is
    public and textual-header + raw-planes, so no codec library is
    needed (https://wiki.multimedia.cx/index.php/YUV4MPEG2)."""
    if not data.startswith(b"YUV4MPEG2"):
        return None
    nl = data.find(b"\n")
    if nl < 0:
        return None
    w = h = 0
    fps = 0.0
    chroma = "420"
    for tok in data[9:nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        try:
            if tag == b"W":
                w = int(val)
            elif tag == b"H":
                h = int(val)
            elif tag == b"F":
                num, den = val.split(b":")
                fps = int(num) / int(den)
            elif tag == b"C":
                chroma = val.decode("ascii", "replace")
        except ValueError:
            return None
    if w <= 0 or h <= 0:
        return None
    luma = w * h
    if chroma.startswith("420"):
        frame_bytes = luma + 2 * ((w // 2) * (h // 2))
    elif chroma.startswith("422"):
        frame_bytes = luma + 2 * ((w // 2) * h)
    elif chroma.startswith("444"):
        frame_bytes = 3 * luma
    elif chroma.startswith("mono"):
        frame_bytes = luma
    else:
        return None
    frames = []
    pos = nl + 1
    while pos < len(data):
        if data[pos : pos + 5] != b"FRAME":
            return None  # corrupt stream
        fnl = data.find(b"\n", pos)
        if fnl < 0 or fnl + 1 + frame_bytes > len(data):
            return None  # truncated frame
        y = np.frombuffer(data, dtype=np.uint8, count=luma, offset=fnl + 1)
        frames.append(y.reshape(h, w))
        pos = fnl + 1 + frame_bytes
    if not frames:
        return None
    return w, h, fps, frames


def _y4m_video_features(data: bytes) -> Optional[np.ndarray]:
    """Real video decode (YUV4MPEG2): 16-bin L1-normalized luma histogram
    pooled over all frames, concatenated with a 16-point temporal
    profile of per-frame mean luma (/255, linearly resampled over
    normalized time so any frame count yields a fixed-size, gap-free
    profile) — the histogram captures appearance, the profile captures
    motion. Deterministic for a given payload; None when the payload is
    not Y4M."""
    parsed = _y4m_parse(data)
    if parsed is None:
        return None
    _, _, _, frames = parsed
    half = FEATURE_DIM // 2
    stack = np.stack(frames)  # (n_frames, h, w) uint8
    hist, _ = np.histogram(stack.ravel(), bins=half, range=(0.0, 256.0))
    hist = hist / (float(hist.sum()) or 1.0)
    means = stack.reshape(len(frames), -1).mean(axis=1) / 255.0
    prof = np.interp(
        np.linspace(0.0, means.size - 1.0, half), np.arange(means.size), means
    )
    return np.concatenate([hist, prof]).astype(np.float32)


def decode_image_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode → feature-extract over binary payloads via mapInPandas.

    Three modes, resolved on the driver:

    - ``fake=True``: deterministic sha256-seeded stand-in features for
      every row (any kind) — the test/oracle path in this container.
    - ``fake=False``: REAL decode per kind — ``audio`` rows decode PCM
      WAV via the stdlib ``wave`` module (always available);
      ``image`` rows decode via Pillow when it is installed (raise
      NotImplementedError otherwise); ``video`` rows decode the
      uncompressed YUV4MPEG2 container with pure numpy — compressed
      codecs (mp4/h264/…) raise NotImplementedError (the one remaining
      stub; they genuinely need codec libraries absent here). Rows
      whose payload cannot be decoded raise with the offending
      media_id.

    The batch shape, Arrow binary transfer, projection pruning, and
    output schema are the production path in all three modes.
    """
    use_pil = HAS_PIL and not fake  # resolved driver-side, captured below

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            feats = []
            for mid, kind, p in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if fake:
                    feats.append(_fake_features(p["data"]))
                    continue
                if kind == "image":
                    if not use_pil:
                        raise NotImplementedError(
                            f"media_id={mid}: real image decode requires "
                            "Pillow, not present in this environment; pass "
                            "fake=True for the deterministic stub"
                        )
                    f = _pil_image_features(p["data"])
                elif kind == "audio":
                    f = _wav_audio_features(p["data"])
                else:
                    f = _y4m_video_features(p["data"])
                    if f is None:
                        raise NotImplementedError(
                            f"media_id={mid}: only uncompressed YUV4MPEG2 "
                            "video decodes here; compressed codecs "
                            "(mp4/h264/vp9/…) are stubbed — no codec "
                            "libraries in this environment"
                        )
                if f is None:
                    raise ValueError(
                        f"media_id={mid}: payload is not a decodable {kind}"
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


def synth_wav_media_df(spark, n: int = 12, framerate: int = 8000) -> DataFrame:
    """Deterministic table of REAL PCM WAV payloads (stdlib ``wave``).

    Each payload is 0.25 s of a two-harmonic sine seeded by the
    media_id, encoded as 16-bit mono WAV — decodable by any audio
    library, so the real audio-decode path runs end-to-end with no
    external dependency."""
    rows = []
    for i in range(n):
        t = np.arange(framerate // 4, dtype=np.float64) / framerate
        freq = 200.0 + 37.0 * i
        x = 0.6 * np.sin(2 * np.pi * freq * t) + 0.3 * np.sin(
            2 * np.pi * 2.5 * freq * t
        )
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(framerate)
            w.writeframes((x * 32767.0).astype("<i2").tobytes())
        rows.append(
            {
                "media_id": i,
                "kind": "audio",
                "mime": "audio/wav",
                "width": None,
                "height": None,
                "duration_ms": 250,
                "payload": {"data": buf.getvalue(), "codec": "pcm_s16le"},
            }
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synth_y4m_media_df(
    spark, n: int = 10, w: int = 16, h: int = 12, n_frames: int = 8
) -> DataFrame:
    """Deterministic table of REAL uncompressed YUV4MPEG2 payloads.

    Each video is ``n_frames`` frames of a gradient whose brightness
    ramps with the frame index (seeded by media_id), C420, 4 fps —
    decodable by any Y4M reader, so the real video-decode path runs
    end-to-end with no external dependency."""
    rows = []
    chroma_bytes = 2 * ((w // 2) * (h // 2))
    for i in range(n):
        buf = io.BytesIO()
        buf.write(f"YUV4MPEG2 W{w} H{h} F4:1 Ip A1:1 C420jpeg\n".encode())
        for fidx in range(n_frames):
            buf.write(b"FRAME\n")
            # strictly brighter per frame, distinct per media, never
            # wrapping: max = 59 + 18*7 + gradient 55 = 240 < 256
            base = (13 * i) % 60 + 18 * fidx
            y = (
                base
                + np.add.outer(np.arange(h), np.arange(w)) % 56
            ).astype(np.uint8)
            buf.write(y.tobytes())
            buf.write(bytes([128]) * chroma_bytes)  # neutral chroma
        rows.append(
            {
                "media_id": i,
                "kind": "video",
                "mime": "video/x-yuv4mpeg",
                "width": w,
                "height": h,
                "duration_ms": int(1000 * n_frames / 4),
                "payload": {"data": buf.getvalue(), "codec": "y4m"},
            }
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("ts_ms", IntegerType(), False),
        StructField("luma_mean", FloatType(), False),
        StructField("luma_hist", ArrayType(FloatType()), False),
    ]
)


def sample_video_frames(df: DataFrame, every_ms: int = 500) -> DataFrame:
    """REAL per-frame sampling over Y4M payloads: one output row per
    sampled frame (nearest decoded frame at each ``every_ms`` tick) with
    its mean luma and a 16-bin luma histogram.

    mapInPandas over the projection-pruned (media_id, payload) columns —
    each binary payload crosses into Python exactly once and frames
    explode JVM-side-free, so at 100 TB the cost is one Arrow pass over
    the video rows. Non-Y4M payloads raise (compressed codecs are the
    disclosed stub)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [],
                "frame_idx": [],
                "ts_ms": [],
                "luma_mean": [],
                "luma_hist": [],
            }
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                parsed = _y4m_parse(p["data"])
                if parsed is None:
                    raise NotImplementedError(
                        f"media_id={mid}: only uncompressed YUV4MPEG2 video "
                        "decodes here; compressed codecs are stubbed"
                    )
                _, _, fps, frames = parsed
                dur_ms = 1000.0 * len(frames) / (fps or 1.0)
                ticks = range(max(1, int(dur_ms // every_ms) + 1))
                seen = set()
                for t in ticks:
                    ts = t * every_ms
                    fidx = min(int(round(ts * (fps or 1.0) / 1000.0)), len(frames) - 1)
                    if fidx in seen or ts >= dur_ms:
                        continue
                    seen.add(fidx)
                    y = frames[fidx]
                    hist, _ = np.histogram(
                        y.ravel(), bins=FEATURE_DIM // 2, range=(0.0, 256.0)
                    )
                    hist = hist / (float(hist.sum()) or 1.0)
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(fidx)
                    out["ts_ms"].append(int(ts))
                    out["luma_mean"].append(float(y.mean()))
                    out["luma_hist"].append(hist.astype(np.float32).tolist())
            if out["media_id"]:
                yield pd.DataFrame(out)

    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(gen, schema=FRAME_SCHEMA)
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling PLAN: computes per-row frame timestamps as a
    JVM-side expression; ``sample_video_frames`` is the real decode of
    those ticks for Y4M payloads (compressed codecs remain stubbed)."""
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
