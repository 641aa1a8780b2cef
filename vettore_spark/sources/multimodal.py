"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (BASELINE.json north star: LLM-data-pipeline operators).

The decode kernels themselves are STUBS behind import guards (no
image/audio libraries in this environment — see `decode_image`), but the
Spark-side plumbing is real and tested:

- the media schema (binary payload + mime + typed metadata)
- Arrow batch shape through mapInPandas (bytes in, float features out)
- deterministic fake decoders so pipelines and partitioning are testable
- feature extraction into an embeddings column compatible with every
  search operator in this package
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def decode_image(payload: bytes) -> np.ndarray:
    """Real image decode — requires an imaging library that is not available
    in this environment. The Spark plumbing calls `decode_fn`-shaped
    callables; swap this in where PIL/libvips exists."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "image decoding requires PIL/pillow; use fake_decode_image for "
            "pipeline testing"
        ) from e
    raise NotImplementedError("wire Image.open(BytesIO(payload)) here")


def fake_decode_image(payload: bytes, *, h: int = 8, w: int = 8) -> np.ndarray:
    """Deterministic stand-in decoder: expands the sha256 of the payload into
    an (h, w, 3) uint8 array. Lets partitioning/batching/feature plumbing be
    tested without an imaging library."""
    seed = int.from_bytes(hashlib.sha256(payload or b"").digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def image_features(
    df: DataFrame,
    *,
    decode_fn: Callable[[bytes], np.ndarray] = fake_decode_image,
    id_col: str = "media_id",
    payload_col: str = "payload",
    feature_dim: int = 12,
    parallelism: int | None = None,
) -> DataFrame:
    """Decode + featurize media payloads per Arrow batch: per-channel mean/
    std/min/max pooled over pixels -> a dense feature vector usable by every
    search/dedup operator. The decode runs inside mapInPandas so payloads
    never leave the executor, and batches bound peak memory.

    Decode is the CPU-heavy stage, so the input is spread across at least
    `parallelism` partitions first (default: the cluster's default
    parallelism; pass 0 to keep the input partitioning). A small file that
    Spark reads as one partition would otherwise serialize every decode
    through a single Python worker — the round-robin repartition costs one
    cheap shuffle of (id, payload) rows and buys cores-wide decode."""
    if parallelism is None:
        parallelism = df.sparkSession.sparkContext.defaultParallelism
    src = df.select(id_col, payload_col)
    if parallelism and src.rdd.getNumPartitions() < parallelism:
        src = src.repartition(parallelism)
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, feats = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                img = decode_fn(bytes(payload) if payload is not None else b"")
                px = img.reshape(-1, img.shape[-1]).astype(np.float64)
                f = np.concatenate(
                    [px.mean(0), px.std(0), px.min(0), px.max(0)]
                )[:feature_dim]
                ids.append(mid)
                feats.append(f.astype(np.float32))
            yield pd.DataFrame({id_col: ids, "features": feats})

    return src.mapInPandas(run, out_schema)


def frame_sample(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    n_frames: int = 4,
    frame_bytes: int = 64,
) -> DataFrame:
    """Deterministic frame sampling stub for video payloads: slices the
    payload into n_frames evenly spaced windows (stand-in for ffmpeg
    keyframe extraction; the exploded (media_id, frame_idx, frame) shape is
    the real contract downstream feature extractors consume)."""
    frames = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: F.struct(
            i.alias("frame_idx"),
            F.substring(
                F.col(payload_col),
                (i * F.greatest(
                    (F.length(payload_col) / n_frames).cast("int"), F.lit(1)
                ) + 1).cast("int"),
                frame_bytes,
            ).alias("frame"),
        ),
    )
    return df.select(id_col, F.explode(frames).alias("f")).select(
        id_col, F.col("f.frame_idx").alias("frame_idx"), F.col("f.frame").alias("frame")
    )
