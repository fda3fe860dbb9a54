"""Multimodal payload plumbing — binary columns with typed metadata.

Image/audio/video payloads ride as opaque ``binary`` columns + a typed meta
struct; decode / feature-extract / resize / frame-sample are Arrow-batched
``mapInPandas`` stages.  The container ships no imaging/audio libraries, so
the decode kernels are STUBS behind ``decode_backend``:

  * ``"real"``  -> raises NotImplementedError at the call site (clearly
                   marked; swap in PIL/libsndfile/ffmpeg on a real cluster);
  * ``"fake"``  -> deterministic hash-derived features, so the Spark-side
    plumbing — schema, batch shape, UDF signature, partitioning — is real and
    tested end-to-end even here.

Reference analogue: the data-visitor passes that open payload bytes and emit
derived artifacts — preview JPEG rendering (preview_augmentation.py:1020-1036,
deliberately dropped per SURVEY §7.2) and the HDF5 wavelength-vector reduction
(espadons_energy_augmentation.py:139-153): payload-in, small-feature-out,
never blocking the metadata path.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),          # image|audio|video
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]), True),
])

FEATURE_DIM = 16

_FEATURES_FIELDS = [
    T.StructField("payload_sha256", T.StringType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
]


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic pseudo-embedding: FEATURE_DIM floats in [-1, 1) derived
    from the sha256 of the bytes.  Stands in for a CNN/codec feature head."""
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer((digest * ((FEATURE_DIM * 4) // len(digest) + 1))[: FEATURE_DIM * 4],
                        dtype=np.uint32).astype(np.float64)
    return ((raw / 2**31) - 1.0).astype(np.float32)


def _decode_real(payload: bytes, kind: str) -> np.ndarray:
    raise NotImplementedError(
        "real decode requires PIL/soundfile/ffmpeg — not in this container; "
        "install on the cluster and switch decode_backend='real'"
    )


def extract_features(df: DataFrame, decode_backend: str = "fake",
                     payload_col: str = "payload") -> DataFrame:
    """Append payload_sha256 + a FEATURE_DIM feature vector, one Arrow pass.

    The batch shape (Iterator[pd.DataFrame] -> Iterator[pd.DataFrame]) and the
    output schema are identical for fake and real backends — only the kernel
    differs, so tests written against the fake backend validate the plumbing
    a real decoder will use.
    """
    schema = T.StructType(list(df.schema.fields) + _FEATURES_FIELDS)
    kernel = _fake_features if decode_backend == "fake" else None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, hashes = [], []
            for payload, kind in zip(pdf[payload_col], pdf["kind"]):
                if payload is None or len(payload) == 0:
                    feats.append(None)
                    hashes.append(None)
                    continue
                hashes.append(hashlib.sha256(payload).hexdigest())
                vec = kernel(payload) if kernel else _decode_real(payload, kind)
                feats.append(vec.tolist())
            out = pdf.copy()
            out["payload_sha256"] = hashes
            out["feature"] = feats
            yield out

    return df.mapInPandas(run, schema=schema)


def _fake_pixels(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic grayscale pixel grid derived from the payload bytes —
    the fake decode half of the resize stage (a real backend replaces ONLY
    this with PIL/ffmpeg; the resample math below is the real kernel)."""
    digest = hashlib.sha256(payload).digest()
    n = width * height
    raw = (digest * (n // len(digest) + 1))[:n]
    return np.frombuffer(raw, dtype=np.uint8).reshape(height, width)


def _bilinear_resize(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Vectorized bilinear resample (align-corners) — pure numpy."""
    in_h, in_w = px.shape
    ys = np.linspace(0, in_h - 1, out_h)
    xs = np.linspace(0, in_w - 1, out_w)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, in_h - 1)
    x1 = np.minimum(x0 + 1, in_w - 1)
    wy = (ys - y0)[:, None]
    wx = (xs - x0)[None, :]
    p = px.astype(np.float64)
    top = p[y0][:, x0] * (1 - wx) + p[y0][:, x1] * wx
    bot = p[y1][:, x0] * (1 - wx) + p[y1][:, x1] * wx
    return np.clip(top * (1 - wy) + bot * wy, 0, 255).astype(np.uint8)


def resize_images(df: DataFrame, width: int, height: int,
                  decode_backend: str = "fake",
                  payload_col: str = "payload") -> DataFrame:
    """Resize stage (decode -> bilinear resample -> re-encode), one Arrow
    pass.  Output rows keep the input schema with ``payload`` replaced by the
    resized raw bytes and ``meta.width/height`` updated; non-image rows and
    empty payloads pass through unchanged.  Fake backend: hash-derived pixel
    grid + REAL numpy bilinear resample, so batch shape, schema evolution and
    the resample kernel are all tested; real backend raises at decode."""
    schema = df.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for payload, kind, meta in zip(pdf[payload_col], pdf["kind"],
                                           pdf["meta"]):
                if (kind != "image" or payload is None or len(payload) == 0
                        or meta is None or not meta.get("width")
                        or not meta.get("height")):
                    payloads.append(payload)
                    metas.append(meta)
                    continue
                if decode_backend == "fake":
                    px = _fake_pixels(bytes(payload), meta["width"], meta["height"])
                else:
                    px = _decode_real(bytes(payload), kind)
                resized = _bilinear_resize(px, width, height)
                payloads.append(resized.tobytes())
                metas.append({**meta, "width": width, "height": height})
            out = pdf.copy()
            out[payload_col] = payloads
            out["meta"] = metas
            yield out

    return df.mapInPandas(run, schema=schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per sampled frame timestamp,
    derived from meta.duration_ms — pure exploded projection; the actual
    frame decode is the stubbed kernel above."""
    from pyspark.sql import functions as F

    frames = F.sequence(
        F.lit(0),
        F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return (
        df.filter((F.col("kind") == "video")
                  & (F.coalesce(F.col("meta.duration_ms"), F.lit(0)) > 0))
        .withColumn("frame_ts_ms", F.explode(frames))
        .select("media_id", "frame_ts_ms", "payload")
    )
