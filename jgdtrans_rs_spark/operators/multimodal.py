"""Multimodal (binary) column operators.

Treats image/audio/video/html payloads as opaque ``binary`` columns
with typed metadata, per the training-data-pipeline requirements:

* ``binary_meta`` — pure Column metadata (byte length, magic prefix,
  modality guess): JVM-side, codegen, pushes down.
* ``byte_histogram_features`` — deterministic feature extraction from
  raw bytes (16-bucket normalized histogram) as a vectorized Arrow
  kernel: the real Spark-side plumbing (schema, batching, UDF
  signature) for a decode->featurize stage.
* ``sample_offsets`` — deterministic "frame sampling": n evenly
  spaced byte offsets per payload (the video-frame-sampling shape
  without a video decoder).
* ``decode_image`` — the genuine decode step; the sandbox has no
  image/audio libraries, so it is stubbed behind an import guard and
  raises ``NotImplementedError`` with the real signature in place.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType

N_BUCKETS = 16


def binary_meta(df: DataFrame, col: str = "html") -> DataFrame:
    """Adds n_bytes / magic / modality columns (pure Column ops)."""
    b = F.col(col)
    # ISO-8859-1 maps every byte, so arbitrary binary never throws
    # (ANSI decode errors on invalid UTF-8)
    magic = F.decode(F.substring(b, 1, 6), "ISO-8859-1")
    modality = (
        F.when(magic.startswith("<html"), "html")
        .when(magic.startswith("\x89PNG"), "image/png")
        .when(magic.startswith("\xff\xd8"), "image/jpeg")
        .when(magic.startswith("RIFF"), "audio/wav")
        .otherwise("unknown")
    )
    return df.withColumn("n_bytes", F.length(b).cast("long")) \
             .withColumn("magic", magic) \
             .withColumn("modality", modality)


def byte_histogram_features(df: DataFrame, col: str = "html",
                            out: str = "features") -> DataFrame:
    """16-bucket normalized byte histogram per payload — a
    deterministic stand-in for an embedding/feature extractor, with
    the production batch shape (Arrow in, float64 array out)."""

    @F.pandas_udf(ArrayType(DoubleType()))
    def feats(data: pd.Series) -> pd.Series:
        outs = []
        for payload in data:
            if payload is None:
                outs.append(np.zeros(N_BUCKETS))
                continue
            arr = np.frombuffer(bytes(payload), dtype=np.uint8)
            if arr.size == 0:
                outs.append(np.zeros(N_BUCKETS))
                continue
            hist = np.bincount(arr >> 4, minlength=N_BUCKETS).astype(np.float64)
            outs.append(hist / arr.size)
        return pd.Series(outs)

    return df.withColumn(out, feats(F.col(col)))


def sample_offsets(df: DataFrame, col: str = "html", n: int = 4,
                   out: str = "frame_offsets") -> DataFrame:
    """n evenly spaced byte offsets per payload (video frame-sample
    shape; integer output)."""

    @F.pandas_udf(ArrayType(LongType()))
    def offsets(data: pd.Series) -> pd.Series:
        outs = []
        for payload in data:
            ln = 0 if payload is None else len(payload)
            if ln == 0:
                outs.append(np.zeros(0, dtype=np.int64))
            else:
                outs.append((np.arange(n, dtype=np.int64) * ln) // n)
        return pd.Series(outs)

    return df.withColumn(out, offsets(F.col(col)))


def decode_image(df: DataFrame, col: str = "html", out: str = "pixels") -> DataFrame:
    """Real image decode — requires an imaging library that is not in
    this container.  The Spark-side plumbing (schema, batch shape) is
    identical to byte_histogram_features; swap the kernel when PIL or
    cv2 is available."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires PIL/cv2 (absent in this sandbox); "
            "use byte_histogram_features for the deterministic stand-in"
        ) from exc
    raise NotImplementedError("wire PIL decode kernel here")


def resize_bytes(df: DataFrame, col: str = "html", k: int = 32,
                 out: str = "resized") -> DataFrame:
    """Deterministic "resize" to a fixed-size representation: the
    payload's bytes are block-averaged into exactly ``k`` values
    (area-interpolation shape — the image-resize batch plumbing with a
    byte-stream kernel; swap in a real interpolation kernel when an
    imaging library is available).  Empty/NULL payloads resize to
    zeros, so the output column is always a length-``k`` float array.
    """

    @F.pandas_udf(ArrayType(DoubleType()))
    def resize(data: pd.Series) -> pd.Series:
        outs = []
        for payload in data:
            if payload is None or len(payload) == 0:
                outs.append(np.zeros(k))
                continue
            arr = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.float64)
            # block boundaries: pixel i covers [i*n/k, (i+1)*n/k)
            bounds = (np.arange(k + 1, dtype=np.int64) * arr.size) // k
            sums = np.add.reduceat(arr, bounds[:-1])
            widths = np.maximum(np.diff(bounds), 1)
            outs.append(sums / widths)
        return pd.Series(outs)

    return df.withColumn(out, resize(F.col(col)))
