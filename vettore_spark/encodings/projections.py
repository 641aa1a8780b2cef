"""Deterministic random-projection (Johnson-Lindenstrauss) compression.

Compresses an embedding column `d_in -> d_out` with a Rademacher (+-1) sign
matrix: `y_k = sum_j S[k][j] * x_j / sqrt(d_out)`. Distance preservation is
the JL lemma with sign matrices (Achlioptas 2003, "Database-friendly random
projections"): pairwise inner products are preserved in expectation with
variance O(1/d_out), so a compressed prefilter stage can rank candidates
cheaply before an exact rerank on full vectors (the same two-stage shape as
`quantized_search`, reference collection.ex:263-295, with JL instead of
sign-bit compression — this keeps MAGNITUDE information the 1-bit code
drops).

The sign matrix is a pure function of (d_in, d_out, seed) via md5 — no RNG
state, so every executor, every retry, and a SQL oracle reproduce the same
matrix; the literal +-1 arrays are embedded in the plan (a d_out x d_in
int array — 16x64 = 1k literals — is codegen-friendly and avoids any
per-row hash work).

Scale: map-only (no shuffle); the projection is d_out fused
multiply-adds per row inside whole-stage codegen.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rademacher_signs(d_in: int, d_out: int, *, seed: int = 0) -> list[list[int]]:
    """The deterministic +-1 matrix, row k = output dim: sign is the parity
    of md5(seed:k:j) — reproducible in any engine/language."""
    return [
        [
            1
            if int(hashlib.md5(f"{seed}:{k}:{j}".encode()).hexdigest(), 16) % 2 == 0
            else -1
            for j in range(d_in)
        ]
        for k in range(d_out)
    ]


def project_column(vector_col: str | Column, signs: list[list[int]]) -> Column:
    """`array<double>` of len(signs) JL components for one vector column:
    each component is one zip_with/aggregate dot product against a literal
    sign row, scaled by 1/sqrt(d_out)."""
    v = F.col(vector_col) if isinstance(vector_col, str) else vector_col
    scale = 1.0 / math.sqrt(len(signs))
    comps = []
    for row in signs:
        srow = F.array(*[F.lit(float(s)) for s in row])
        comps.append(
            F.aggregate(
                F.zip_with(v, srow, lambda x, s: x * s),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            * scale
        )
    return F.array(*comps)


def jl_project(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    d_in: int = 64,
    d_out: int = 16,
    seed: int = 0,
) -> DataFrame:
    """(id, projected array<double>) — the compressed table a prefilter
    stage scans instead of the full vectors (d_out/d_in of the bytes)."""
    signs = rademacher_signs(d_in, d_out, seed=seed)
    return df.select(
        F.col(id_col), project_column(vector_col, signs).alias("projected")
    )
