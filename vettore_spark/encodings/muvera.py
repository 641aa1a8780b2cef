"""MUVERA fixed-dimensional encoding (FDE) of multi-vector sets.

Semantics ported from the reference implementation
(/root/reference/native/vettore/src/muvera.rs, validation
lib/vettore/encoding/muvera.ex:83-208):

- deterministic SimHash partition assignment per repetition
  (muvera.rs:109-129), seeded weights in [-1, 1] (muvera.rs:203-207)
- per-partition accumulation: identity coordinates when
  projection_dimension == dimension, else Rademacher-sign random projection
  with seed+17 (muvera.rs:132-162)
- query mode SUMS, document mode keeps an ONLINE MEAN
  `acc + (v - acc) / n` (muvera.rs:164-177)
- optional count-sketch compression to final_projection_dimension
  (muvera.rs:180-200)
- the exact `hash4` splitmix-style mixer (muvera.rs:219-225)
- f32 slot storage with overflow errors; intermediate math in f64

The per-document encoding is embarrassingly parallel, so the Spark surface
is an Arrow-batched pandas UDF over the `vectors` column — ideal batch work
(SURVEY §2.9 E1). Intended retrieval flow (README.md:327-334): encode docs +
query, inner-product search over FDEs, exact MaxSim rerank.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_U64 = np.uint64
_MAX_OUTPUT_DIMENSIONS = 16_777_216
_F32_MAX = np.float64(np.finfo(np.float32).max)


@dataclass(frozen=True)
class MuveraConfig:
    """Config keys + defaults per muvera.ex:84-105."""

    dimension: int
    num_repetitions: int = 1
    num_simhash_projections: int = 0
    seed: int = 1
    projection_dimension: int | None = None  # None -> dimension
    final_projection_dimension: int | None = None

    def proj_dim(self) -> int:
        return self.projection_dimension if self.projection_dimension is not None else self.dimension

    def validate(self) -> None:
        if self.dimension <= 0:
            raise ValueError("dimension must be positive")
        if self.num_repetitions <= 0:
            raise ValueError("num_repetitions must be positive")
        if not (0 <= self.num_simhash_projections < 31):
            raise ValueError("num_simhash_projections must be < 31")
        if self.proj_dim() <= 0:
            raise ValueError("projection_dimension must be positive")
        if self.final_projection_dimension is not None and self.final_projection_dimension <= 0:
            raise ValueError("final_projection_dimension must be positive")
        partitions = 1 << self.num_simhash_projections
        output = self.num_repetitions * partitions * self.proj_dim()
        final = self.final_projection_dimension or output
        if output > _MAX_OUTPUT_DIMENSIONS or final > _MAX_OUTPUT_DIMENSIONS:
            raise ValueError("fde dimension exceeds safety limit")


def _rotl(x: np.ndarray, k: int) -> np.ndarray:
    return (x << _U64(k)) | (x >> _U64(64 - k))


def hash4(a, b, c, d) -> np.ndarray:
    """The reference's 4-coordinate splitmix-style mixer (muvera.rs:219-225),
    vectorized over uint64 numpy arrays."""
    with np.errstate(over="ignore"):
        a = np.asarray(a, dtype=_U64)
        b = np.asarray(b, dtype=_U64)
        c = np.asarray(c, dtype=_U64)
        d = np.asarray(d, dtype=_U64)
        x = a ^ _rotl(b, 17) ^ _rotl(c, 31) ^ _rotl(d, 47)
        x = x + _U64(0x9E37_79B9_7F4A_7C15)
        x = (x ^ (x >> _U64(30))) * _U64(0xBF58_476D_1CE4_E5B9)
        x = (x ^ (x >> _U64(27))) * _U64(0x94D0_49BB_1331_11EB)
        return x ^ (x >> _U64(31))


def _random_weights(seed: int, repetition: int, projections: int, dims: int) -> np.ndarray:
    """Weight matrix (projections x dims) in [-1, 1] (muvera.rs:203-207):
    unit = f32(hash / u64::MAX); weight = unit * 2 - 1 in f32."""
    proj, dim = np.meshgrid(
        np.arange(projections, dtype=_U64), np.arange(dims, dtype=_U64), indexing="ij"
    )
    h = hash4(_U64(seed), _U64(repetition), proj, dim)
    unit = (h.astype(np.float64) / float(np.iinfo(np.uint64).max)).astype(np.float32)
    return unit * np.float32(2.0) - np.float32(1.0)


def _random_signs(seed: int, repetition: int, projections: int, dims: int) -> np.ndarray:
    """Rademacher signs (muvera.rs:210-216): +1 if low bit of hash clear."""
    proj, dim = np.meshgrid(
        np.arange(projections, dtype=_U64), np.arange(dims, dtype=_U64), indexing="ij"
    )
    h = hash4(_U64(seed), _U64(repetition), proj, dim)
    return np.where((h & _U64(1)) == 0, np.float32(1.0), np.float32(-1.0))


def _check_slot(next_val: float) -> None:
    if not np.isfinite(next_val) or next_val < -_F32_MAX or next_val > _F32_MAX:
        raise ValueError("encoding overflow")


def encode(
    vectors, config: MuveraConfig, mode: str = "document"
) -> np.ndarray:
    """Encode one multi-vector set into its FDE (muvera.rs:26-74).

    mode: 'query' (per-partition sum) or 'document' (per-partition online
    mean). Returns float32 array."""
    if mode not in ("query", "document"):
        raise ValueError(f"unknown mode: {mode!r}")
    config.validate()
    vs = np.asarray(vectors, dtype=np.float32)
    if vs.ndim != 2 or vs.shape[0] == 0:
        raise ValueError("empty vectors")
    if vs.shape[1] != config.dimension:
        raise ValueError("dimension mismatch")
    if not np.all(np.isfinite(vs)):
        raise ValueError("vector contains a non-finite value")

    partitions = 1 << config.num_simhash_projections
    pd_ = config.proj_dim()
    repetition_size = partitions * pd_
    out = np.zeros(config.num_repetitions * repetition_size, dtype=np.float32)
    counts = np.zeros(config.num_repetitions * partitions, dtype=np.int64)

    for rep in range(config.num_repetitions):
        # partition assignment: SimHash bits MSB-first (muvera.rs:109-129)
        if config.num_simhash_projections == 0:
            parts = np.zeros(len(vs), dtype=np.int64)
        else:
            w = _random_weights(
                config.seed, rep, config.num_simhash_projections, config.dimension
            )
            dots = vs.astype(np.float64) @ w.astype(np.float64).T  # (n, projs)
            bits = (dots >= 0.0).astype(np.int64)
            parts = np.zeros(len(vs), dtype=np.int64)
            for j in range(config.num_simhash_projections):
                parts = (parts << 1) + bits[:, j]

        if pd_ == config.dimension:
            projected = vs.astype(np.float64)
        else:
            signs = _random_signs(config.seed + 17, rep, pd_, config.dimension)
            projected = vs.astype(np.float64) @ signs.astype(np.float64).T

        for i, p in enumerate(parts):
            ci = rep * partitions + int(p)
            counts[ci] += 1
            base = rep * repetition_size + int(p) * pd_
            cur = out[base : base + pd_].astype(np.float64)
            val = projected[i]
            if mode == "query":
                nxt = cur + val
            else:
                nxt = cur + (val - cur) / counts[ci]
            bad = ~np.isfinite(nxt) | (nxt < -_F32_MAX) | (nxt > _F32_MAX)
            if bad.any():
                raise ValueError("encoding overflow")
            out[base : base + pd_] = nxt.astype(np.float32)

    if config.final_projection_dimension is None:
        return out
    return _count_sketch(out, config.final_projection_dimension, config.seed)


def _count_sketch(inp: np.ndarray, final_dim: int, seed: int) -> np.ndarray:
    """Signed-hash compression (muvera.rs:180-200)."""
    idx = np.arange(len(inp), dtype=_U64)
    slots = (hash4(_U64(seed), _U64(0x9E37_79B9_7F4A_7C15), idx, _U64(0)) % _U64(final_dim)).astype(np.int64)
    signs_h = hash4(
        _U64(seed), _U64(0xD1B5_4A32_D192_ED03), idx, slots.astype(_U64)
    )
    signs = np.where((signs_h & _U64(1)) == 0, 1.0, -1.0)
    out = np.zeros(final_dim, dtype=np.float32)
    # sequential accumulation with per-step f32 rounding (reference parity)
    vals = signs * inp.astype(np.float64)
    for s, v in zip(slots, vals):
        nxt = np.float64(out[s]) + v
        _check_slot(nxt)
        out[s] = np.float32(nxt)
    return out


def encode_query(vectors, config: MuveraConfig) -> np.ndarray:
    """lib/vettore/encoding/muvera.ex:28-39."""
    return encode(vectors, config, mode="query")


def encode_document(vectors, config: MuveraConfig) -> np.ndarray:
    """lib/vettore/encoding/muvera.ex:41-51."""
    return encode(vectors, config, mode="document")


def encode_column(config: MuveraConfig, mode: str = "document"):
    """Arrow-batched pandas UDF encoding a `array<array<float>>` column of
    multi-vectors into `array<float>` FDEs — per-row independent, scales
    linearly across partitions with zero shuffle."""

    @F.pandas_udf("array<float>")
    def fde(vectors: pd.Series) -> pd.Series:
        return pd.Series(
            [
                encode([np.asarray(v, dtype=np.float32) for v in vs], config, mode)
                for vs in vectors
            ]
        )

    return fde


def fde_column(vectors_col: Column | str, config: MuveraConfig, mode: str = "document") -> Column:
    c = F.col(vectors_col) if isinstance(vectors_col, str) else vectors_col
    return encode_column(config, mode)(c)


def default_candidates(k: int, n_docs: int | None = None) -> int:
    """Default stage-1 candidate depth for FDE two-stage retrieval
    (FDE top-C by inner product -> exact MaxSim rerank of C docs).

    C = max(100, 20*k), capped at the corpus size when known. Rationale
    (measured, SCALE.md/BENCH muvera blocks): on an unstructured corpus
    the FDE inner product is a coarse proxy — recall@5 was 0.6 at C=20
    and 1.0 at C=100 — so the floor is an ABSOLUTE 100, not a multiple
    of k alone; past the floor the 20x multiplier keeps deep-k queries
    covered. The rerank stage is O(C * avg_vectors^2) work on C docs
    only, so the default trades a bounded constant rerank cost for
    >= 0.9 recall; callers with a structured corpus (clustered, high
    FDE fidelity) can pass a smaller explicit C.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    c = max(100, 20 * k)
    if n_docs is not None:
        c = min(c, n_docs)
    return c
