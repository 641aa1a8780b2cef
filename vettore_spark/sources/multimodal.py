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
    """Real image decode, env-gated on PIL (not shipped in this
    container — the same gating as the reference's fastembed e2e,
    test/ex_fastembed_integration_test.exs:9-60): payload bytes ->
    (h, w, 3) uint8 RGB array. `decode_fn`-shaped, so it drops into
    image_features/image_resize wherever pillow exists;
    tests/test_extensions.py carries the e2e that runs when it does.
    fake_decode_image remains the deterministic oracle path."""
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "image decoding requires PIL/pillow; use fake_decode_image for "
            "pipeline testing"
        ) from e
    from io import BytesIO

    img = Image.open(BytesIO(payload))
    return np.asarray(img.convert("RGB"), dtype=np.uint8)


def fake_decode_image(payload: bytes, *, h: int = 8, w: int = 8) -> np.ndarray:
    """Deterministic stand-in decoder: expands counter-suffixed sha256
    digests of the payload directly into an (h, w, 3) uint8 array —
    pixel bytes ARE digest bytes (no PRNG), so any engine with a sha256
    can reproduce the pixels (the DuckDB oracles recompute them from hex).
    Lets partitioning/batching/feature plumbing be tested without an
    imaging library."""
    need = h * w * 3
    buf = bytearray()
    k = 0
    while len(buf) < need:
        buf += hashlib.sha256((payload or b"") + b":" + str(k).encode()).digest()
        k += 1
    return np.frombuffer(bytes(buf[:need]), dtype=np.uint8).reshape(h, w, 3)


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
    src = _spread(df, [id_col, payload_col], parallelism)
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


def fake_decode_audio(payload: bytes) -> np.ndarray:
    """Deterministic stand-in audio decode: interpret the raw payload bytes
    as unsigned 8-bit PCM samples (center 128). Real decoders (ffmpeg /
    soundfile) are not in this environment; swap one in via `decode_fn` —
    the Spark-side plumbing is identical for any `bytes -> 1-D sample
    array` callable."""
    return np.frombuffer(payload or b"", dtype=np.uint8)


def _spread(df: DataFrame, cols: list[str], parallelism: int | None) -> DataFrame:
    """Repartition a narrow (id, payload) projection so the CPU-heavy
    Python decode stage uses every core. parallelism=None delegates to the
    shared plans/spread.spread_narrow (shuffle-partition target — ONE
    spreading policy across the text and media operators); an explicit
    value overrides the target; 0 keeps the input partitioning (required
    for streaming inputs, where .rdd cannot be inspected)."""
    if parallelism == 0:
        return df.select(*cols)
    if parallelism is None:
        from vettore_spark.plans.spread import spread_narrow

        return spread_narrow(df, cols)
    src = df.select(*cols)
    if src.rdd.getNumPartitions() < parallelism:
        src = src.repartition(parallelism)
    return src


def audio_features(
    df: DataFrame,
    *,
    decode_fn: Callable[[bytes], np.ndarray] = fake_decode_audio,
    id_col: str = "media_id",
    payload_col: str = "payload",
    frame_bytes: int = 256,
    center: float = 128.0,
    parallelism: int | None = None,
) -> DataFrame:
    """Windowed audio featurization: decode each payload to 8-bit PCM
    samples, split into non-overlapping frames of `frame_bytes` samples
    (trailing partial frame dropped), and emit per-frame RMS amplitude
    (samples centered at `center` — 128 for true unsigned PCM; pick a
    mid-corpus level for other byte streams) and zero-crossing count
    (adjacent samples on opposite sides of the center). The classic cheap
    audio fingerprint — enough to
    segment silence/speech/music — and every arithmetic step is exact in
    f64 (integer squares summed), so the result is engine-reproducible.

    Decode+featurize runs inside mapInPandas (Arrow batches, payloads never
    leave the executor); the input is spread across the cluster first like
    `image_features`."""
    src = _spread(df, [id_col, payload_col], parallelism)
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("frame_idx", T.LongType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("zcr", T.LongType()),
        ]
    )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, rmss, zcrs = [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                s = decode_fn(bytes(payload) if payload is not None else b"")
                n = len(s) // frame_bytes
                if n == 0:
                    continue
                m = np.asarray(s[: n * frame_bytes], dtype=np.float64).reshape(
                    n, frame_bytes
                )
                c = m - float(center)
                rms = np.sqrt((c * c).sum(axis=1) / frame_bytes)
                hi = m >= float(center)
                zcr = (hi[:, 1:] != hi[:, :-1]).sum(axis=1)
                ids.extend([mid] * n)
                idxs.extend(range(n))
                rmss.extend(rms.tolist())
                zcrs.extend(int(z) for z in zcr)
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "rms": rmss, "zcr": zcrs}
            )

    return src.mapInPandas(run, out_schema)


def image_resize(
    df: DataFrame,
    *,
    decode_fn: Callable[[bytes], np.ndarray] = fake_decode_image,
    id_col: str = "media_id",
    payload_col: str = "payload",
    out_h: int = 4,
    out_w: int = 4,
    parallelism: int | None = None,
) -> DataFrame:
    """Block-mean (area) resize of decoded images to (out_h, out_w):
    pixel rows/columns are split into out_h × out_w near-equal blocks and
    averaged per channel — the deterministic downsample used for thumbnail
    pyramids and perceptual-hash preprocessing. Output is the flattened
    float32 pixel array (out_h*out_w*channels) plus the output dims, ready
    for the embedding/dedup operators. Runs in mapInPandas like the other
    decode stages."""
    src = _spread(df, [id_col, payload_col], parallelism)
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("height", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("pixels", T.ArrayType(T.FloatType())),
        ]
    )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, pix = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                img = decode_fn(bytes(payload) if payload is not None else b"")
                h, w = img.shape[0], img.shape[1]
                ys = (np.arange(out_h + 1) * h) // out_h
                xs = (np.arange(out_w + 1) * w) // out_w
                out = np.empty((out_h, out_w, img.shape[2]), dtype=np.float64)
                for i in range(out_h):
                    for j in range(out_w):
                        block = img[ys[i] : ys[i + 1], xs[j] : xs[j + 1]]
                        out[i, j] = block.reshape(-1, img.shape[2]).mean(axis=0)
                ids.append(mid)
                pix.append(out.astype(np.float32).ravel())
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "height": [out_h] * len(ids),
                    "width": [out_w] * len(ids),
                    "pixels": pix,
                }
            )

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


def image_ahash(
    df: DataFrame,
    *,
    decode_fn: Callable[[bytes], np.ndarray] = fake_decode_image,
    id_col: str = "media_id",
    payload_col: str = "payload",
    parallelism: int | None = None,
) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint: block-mean resize to
    4x4, grayscale per block, one bit per block = (gray > image mean) — a
    16-bit signature that survives re-encoding and small edits, the
    standard cheap perceptual-dedup fingerprint. All arithmetic after the
    decode is plain column expressions (exact f64 left folds), so the
    DuckDB oracle recomputes the hash bit-for-bit from the sha256 pixels.

    Returns (id, ahash long)."""
    rz = image_resize(
        df, decode_fn=decode_fn, id_col=id_col, payload_col=payload_col,
        out_h=4, out_w=4, parallelism=parallelism,
    )
    px = F.col("pixels")
    gray = F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda i: (
            F.element_at(px, i * 3 + 1).cast("double")
            + F.element_at(px, i * 3 + 2).cast("double")
            + F.element_at(px, i * 3 + 3).cast("double")
        )
        / 3.0,
    )
    g = rz.select(F.col(id_col), gray.alias("_gray"))
    mean = (
        F.aggregate(F.col("_gray"), F.lit(0.0), lambda a, x: a + x) / 16.0
    )
    weights = F.array(*[F.lit(1 << i).cast("long") for i in range(16)])
    bits = F.aggregate(
        F.zip_with(
            F.col("_gray"),
            weights,
            lambda x, w: F.when(x > mean, w).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return g.select(F.col(id_col), bits.alias("ahash"))


def ahash_pairs(
    hashes: DataFrame,
    *,
    max_hamming: int = 3,
    id_col: str = "media_id",
    hash_col: str = "ahash",
    max_bucket: int = 4096,
) -> DataFrame:
    """Near-duplicate media pairs by perceptual-hash Hamming distance with
    pigeonhole blocking over the 16-bit aHash:

    - max_hamming <= 1: block on nibble PAIRS — 6 blocks of 8 bits each
      (keyspace 6*256). One flipped bit touches one nibble, leaving >= 3
      intact nibbles and therefore >= 3 intact pairs: EXACT.
    - max_hamming <= 3: block on single nibbles — 4 blocks of 4 bits
      (keyspace 4*16). Three flips leave >= 1 intact nibble: EXACT, but
      the tiny keyspace saturates quickly (avg bucket size N/16).

    Candidates from the bucket join are verified with the FULL Hamming
    distance (the simhash_pairs technique), so an all-pairs oracle returns
    the identical set while blocking keeps the join keyed. SIZE LIMITS: a
    16-bit signature is a small/medium-corpus fingerprint — beyond ~10^4
    items random collisions dominate and the bucket keyspace saturates;
    at corpus scale use a longer perceptual hash (e.g. 64-bit pHash) with
    this same pair machinery and proportionally more blocks. `max_bucket`
    caps degenerate buckets (e.g. a constant corpus) before pair emission
    — dropped buckets make the result approximate and are the reason the
    cap is sized above the saturation point of the intended corpus size.

    Returns (id_a, id_b, hamming) with id_a < id_b."""
    from vettore_spark.operators.dedup import _bucket_pairs
    from vettore_spark.plans.cache import cached_persist

    # the (id, hash) table feeds THREE consumers (bucket build + both
    # hydration sides of the verify join); without a persisted cut the
    # upstream fingerprint computation (decode mapInPandas + block-mean
    # fold) runs three times
    hashes = cached_persist(
        hashes, ("ahash_pairs_input", id_col, hash_col), lambda s: s
    )

    if max_hamming > 3:
        # 4 flips can touch all 4 nibbles, so a true pair may land in no
        # shared bucket: single-nibble blocking is only exact up to 3 —
        # refuse rather than silently return an incomplete pair set
        raise ValueError(
            "ahash_pairs is exact only for max_hamming <= 3 (single-nibble "
            "pigeonhole over a 16-bit hash); use a longer perceptual hash "
            "with more blocks for larger radii"
        )
    h = F.col(hash_col)
    if max_hamming <= 1:
        pairs_idx = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        nibs = F.array(
            *[
                F.struct(
                    F.lit(k).alias("k"),
                    (
                        F.shiftright(h, 4 * a).bitwiseAND(F.lit(15)) * 16
                        + F.shiftright(h, 4 * b).bitwiseAND(F.lit(15))
                    ).alias("nib"),
                )
                for k, (a, b) in enumerate(pairs_idx)
            ]
        )
    else:
        nibs = F.array(
            *[
                F.struct(
                    F.lit(k).alias("k"),
                    F.shiftright(h, 4 * k).bitwiseAND(F.lit(15)).alias("nib"),
                )
                for k in range(4)
            ]
        )
    buckets = (
        hashes.select(F.col(id_col).alias("_id"), F.explode(nibs).alias("_b"))
        .groupBy("_b.k", "_b.nib")
        .agg(F.array_sort(F.collect_list("_id")).alias("_ids"))
        .filter((F.size("_ids") > 1) & (F.size("_ids") <= max_bucket))
    )
    cand = _bucket_pairs(buckets).distinct()
    ha = hashes.select(F.col(id_col).alias("doc_a"), h.alias("_ha"))
    hb = hashes.select(F.col(id_col).alias("doc_b"), h.alias("_hb"))
    return (
        cand.join(ha, "doc_a")
        .join(hb, "doc_b")
        .withColumn(
            "hamming", F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))).cast("long")
        )
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b"), "hamming"
        )
    )
