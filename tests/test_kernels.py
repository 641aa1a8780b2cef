"""Kernel correctness vs independent NumPy f64 oracles.

Mirrors the reference's test strategy (SURVEY.md §5.2): SIMD kernels vs scalar
oracles across many lengths, packing masks at dims 1..129, and the literal
result_values fixtures from the reference doctests."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from vettore_spark.functions import kernels as K

RNG = np.random.default_rng(42)


def np_metric(metric, a, b):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if metric == "l2":
        return float(np.sqrt(np.sum((a - b) ** 2)))
    if metric == "l2_squared":
        return float(np.sum((a - b) ** 2))
    if metric == "cosine_true":
        na, nb = np.sqrt(a @ a), np.sqrt(b @ b)
        if na * nb == 0:
            return 0.0
        return float(np.clip((a @ b) / (na * nb), -1.0, 1.0))
    if metric == "cosine":  # collection path: plain dot
        return float(a @ b)
    if metric == "inner_product":
        return float(a @ b)
    if metric == "negative_inner_product":
        return float(-(a @ b))
    if metric == "manhattan":
        return float(np.sum(np.abs(a - b)))
    if metric == "chebyshev":
        return float(np.max(np.abs(a - b))) if len(a) else 0.0
    if metric == "hamming":
        return float(np.sum((a != 0) != (b != 0)))
    if metric == "jaccard":
        inter = np.sum((a != 0) & (b != 0))
        union = np.sum((a != 0) | (b != 0))
        return 0.0 if union == 0 else float(1.0 - inter / union)
    raise AssertionError(metric)


def np_pack(v):
    v = np.asarray(v)
    words = [0] * ((len(v) + 63) // 64)
    for i, x in enumerate(v):
        if x >= 0.0:
            words[i // 64] |= 1 << (i % 64)
    # to signed two's complement
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def _eval(spark, data, col):
    """Evaluate one Column over rows [(a, b), ...] of double arrays."""
    df = spark.createDataFrame(data, "a: array<double>, b: array<double>")
    return [r[0] for r in df.select(col.alias("v")).collect()]


@pytest.mark.parametrize(
    "metric",
    [
        "l2",
        "l2_squared",
        "inner_product",
        "negative_inner_product",
        "manhattan",
        "chebyshev",
        "hamming",
        "jaccard",
    ],
)
def test_metrics_vs_numpy(spark, metric):
    data = []
    for n in [1, 2, 3, 7, 8, 9, 16, 40, 64]:
        a = (RNG.standard_normal(n) * 3).round(3)
        b = (RNG.standard_normal(n) * 3).round(3)
        a[RNG.random(n) < 0.3] = 0.0
        b[RNG.random(n) < 0.3] = 0.0
        data.append((a.tolist(), b.tolist()))
    data.append(([0.0, 0.0], [0.0, 0.0]))
    got = _eval(spark, data, K.raw_metric(metric, "a", "b"))
    want = [np_metric(metric, a, b) for a, b in data]
    assert got == pytest.approx(want, rel=1e-12, abs=1e-12)


def test_cosine_true_vs_numpy(spark):
    data = [
        ([1.0, 0.0], [1.0, 0.0]),
        ([1.0, 0.0], [0.0, 1.0]),
        ([1.0, 0.0], [-1.0, 0.0]),
        ([0.0, 0.0], [1.0, 2.0]),  # zero vector -> 0.0
        (RNG.standard_normal(64).tolist(), RNG.standard_normal(64).tolist()),
    ]
    got = _eval(spark, data, K.cosine("a", "b"))
    want = [np_metric("cosine_true", a, b) for a, b in data]
    assert got == pytest.approx(want, rel=1e-12, abs=1e-12)
    # collection-path cosine is a plain dot product (distances.rs:47-51)
    got_dot = _eval(spark, data, K.raw_metric("cosine", "a", "b"))
    want_dot = [np_metric("inner_product", a, b) for a, b in data]
    assert got_dot == pytest.approx(want_dot, rel=1e-12, abs=1e-12)


def test_metric_aliases():
    assert K.canonical_metric("euclidean") == "l2"
    assert K.canonical_metric("dot") == "inner_product"
    assert K.canonical_metric("dot_product") == "inner_product"
    assert K.canonical_metric("binary") == "hamming"
    with pytest.raises(ValueError):
        K.canonical_metric("nope")


def test_result_values_reference_fixtures(spark):
    """Literal fixtures from reference doctests
    (vettore_distance.ex:98-118, test/vector_distance_test.exs:111-118)."""
    df = spark.range(1)
    cases = [
        # (metric, raw, mode, score, distance)
        ("l2", 5.0, "raw", -5.0, 5.0),
        ("cosine", 0.25, "raw", 0.25, 0.75),
        ("l2", 5.0, "similarity", 1 / 6, 5.0),
        ("cosine", 0.5, "similarity", 0.75, 0.5),
        ("inner_product", 2.0, "raw", 2.0, -2.0),
        ("inner_product", 2.0, "similarity", 2.0, -2.0),
        ("negative_inner_product", 3.0, "raw", -3.0, 3.0),
        ("negative_inner_product", 3.0, "similarity", -3.0, 3.0),
        ("manhattan", 4.0, "similarity", 0.2, 4.0),
    ]
    for metric, raw, mode, score, dist in cases:
        s, d = K.result_values(metric, F.lit(raw), mode)
        got = df.select(s.alias("s"), d.alias("d")).first()
        assert got["s"] == pytest.approx(score), (metric, mode)
        assert got["d"] == pytest.approx(dist), (metric, mode)


def test_rank_and_similarity_value(spark):
    df = spark.range(1)
    r = df.select(
        K.rank_value("cosine", F.lit(0.25)).alias("rc"),
        K.rank_value("inner_product", F.lit(2.0)).alias("ri"),
        K.rank_value("l2", F.lit(5.0)).alias("rl"),
        K.similarity_value("cosine", F.lit(0.25)).alias("sc"),
        K.similarity_value("negative_inner_product", F.lit(2.0)).alias("sn"),
        K.similarity_value("manhattan", F.lit(3.0)).alias("sm"),
    ).first()
    assert r["rc"] == 0.75 and r["ri"] == -2.0 and r["rl"] == 5.0
    assert r["sc"] == 0.25 and r["sn"] == -2.0 and r["sm"] == 0.25


def test_normalizations_vs_numpy(spark):
    vecs = [
        [3.0, 4.0],
        [0.0, 0.0],          # zero stays zero (l2) / zeros (zscore, minmax)
        [5.0, 5.0, 5.0],     # constant -> zeros (zscore, minmax)
        RNG.standard_normal(33).round(3).tolist(),
    ]
    df = spark.createDataFrame([(v,) for v in vecs], "a: array<double>")
    got = df.select(
        K.normalize_l2("a").alias("l2"),
        K.normalize_zscore("a").alias("z"),
        K.normalize_minmax("a").alias("m"),
    ).collect()
    for v, row in zip(vecs, got):
        a = np.asarray(v)
        n = math.sqrt(float(a @ a))
        w_l2 = a / n if n else a
        mu, sig = a.mean(), a.std()
        w_z = (a - mu) / sig if sig else np.zeros_like(a)
        lo, hi = a.min(), a.max()
        w_m = (a - lo) / (hi - lo) if hi != lo else np.zeros_like(a)
        assert row["l2"] == pytest.approx(w_l2.tolist(), abs=1e-12)
        # zscore uses a single-pass E[x^2]-mu^2 accumulator; ~1e-12 noise
        assert row["z"] == pytest.approx(w_z.tolist(), abs=1e-9)
        assert row["m"] == pytest.approx(w_m.tolist(), abs=1e-12)


@pytest.mark.parametrize("dims", [1, 7, 31, 32, 33, 63, 64, 65, 127, 128, 129])
def test_sign_bit_packing_vs_numpy(spark, dims):
    """Packing boundary sweep mirroring distances.rs:676-707."""
    vecs = [((RNG.standard_normal(dims)).round(2)).tolist() for _ in range(8)]
    vecs.append([0.0] * dims)   # 0.0 counts as >= 0 -> bit set
    vecs.append([-1.0] * dims)
    df = spark.createDataFrame([(v,) for v in vecs], "a: array<double>")
    got = [r[0] for r in df.select(K.compress_sign_bits("a", dims).alias("p")).collect()]
    want = [np_pack(v) for v in vecs]
    assert got == want


@pytest.mark.parametrize("dims", [1, 63, 64, 65, 128, 129])
def test_packed_hamming_jaccard_vs_numpy(spark, dims):
    pairs = []
    for _ in range(6):
        a = RNG.standard_normal(dims).round(2)
        b = RNG.standard_normal(dims).round(2)
        pairs.append((a, b))
    rows = [(np_pack(a), np_pack(b)) for a, b in pairs]
    df = spark.createDataFrame(rows, "a: array<long>, b: array<long>")
    got_h = [r[0] for r in df.select(K.packed_hamming("a", "b", dims).alias("v")).collect()]
    got_j = [r[0] for r in df.select(K.packed_jaccard("a", "b", dims).alias("v")).collect()]
    for (a, b), h, j in zip(pairs, got_h, got_j):
        sa, sb = a >= 0, b >= 0
        want_h = float(np.sum(sa != sb))
        inter = int(np.sum(sa & sb))
        union = int(np.sum(sa | sb))
        want_j = 0.0 if union == 0 else 1.0 - inter / union
        assert h == want_h
        assert j == pytest.approx(want_j, abs=1e-12)


def test_packed_padding_bits_ignored(spark):
    """Garbage in the padding bits of the last word must not affect results
    (word_mask, distances.rs:471-481)."""
    dims = 70  # 2 words, 6 live bits in word 1
    a = np_pack([1.0] * dims)
    b = np_pack([-1.0] * dims)
    dirty_b = [b[0], b[1] | (0xFF << 6)]  # junk above bit 5
    dirty_b = [w - (1 << 64) if w >= (1 << 63) else w for w in dirty_b]
    df = spark.createDataFrame([(a, dirty_b)], "a: array<long>, b: array<long>")
    h = df.select(K.packed_hamming("a", "b", dims).alias("v")).first()["v"]
    assert h == float(dims)


def test_is_valid_vector(spark):
    df = spark.createDataFrame(
        [
            ([1.0, 2.0],),
            ([1.0],),                      # wrong dims
            ([float("nan"), 1.0],),        # non-finite
            ([float("inf"), 1.0],),
            ([float("-inf"), 1.0],),       # caught only by the array_min branch
            ([1e39, 1.0],),                # beyond f32::MAX
            ([-1e39, 1.0],),               # beyond -f32::MAX (array_min branch)
            ([None, 1.0],),  # NULL element: array_min/max skip nulls — only
            #                  the exists() guard can reject this row
            (None,),                       # null array
        ],
        "a: array<double>",
    )
    got = [r[0] for r in df.select(K.is_valid_vector("a", 2).alias("ok")).collect()]
    assert got == [True, False, False, False, False, False, False, False, False]


def test_mean_vector(spark):
    """Mean-of-multivectors derivation (collection.ex:1008-1017;
    asserted test/vector_db_test.exs:202-204)."""
    df = spark.createDataFrame(
        [([[1.0, 2.0], [3.0, 4.0]],), ([[5.0, 5.0]],)],
        "vs: array<array<double>>",
    )
    got = [r[0] for r in df.select(K.mean_vector("vs", 2).alias("m")).collect()]
    assert got[0] == pytest.approx([2.0, 3.0])
    assert got[1] == pytest.approx([5.0, 5.0])
