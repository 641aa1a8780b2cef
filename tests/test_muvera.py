"""MUVERA encoding tests mirroring the reference suite:
- config boundary validation (muvera.rs:296-335, muvera.ex:83-208)
- permutation invariance of query encodings (muvera.rs:360-378)
- retrieval recall: FDE inner-product candidates must contain the exact
  MaxSim top-2 (test/vector_integration_test.exs:49-98, SURVEY §5.7)
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vettore_spark.encodings import muvera as MU

RNG = np.random.default_rng(20260721)


def _cfg(**kw):
    base = dict(dimension=8, num_repetitions=2, num_simhash_projections=3, seed=42)
    base.update(kw)
    return MU.MuveraConfig(**base)


def test_config_validation():
    with pytest.raises(ValueError):
        MU.encode([[1.0] * 8], _cfg(dimension=0))
    with pytest.raises(ValueError):
        MU.encode([[1.0] * 8], _cfg(num_repetitions=0))
    with pytest.raises(ValueError):
        MU.encode([[1.0] * 8], _cfg(num_simhash_projections=31))
    with pytest.raises(ValueError):
        MU.encode([[1.0] * 8], _cfg(projection_dimension=0))
    with pytest.raises(ValueError):
        MU.encode([[1.0] * 8], _cfg(final_projection_dimension=0))
    with pytest.raises(ValueError, match="empty"):
        MU.encode([], _cfg())
    with pytest.raises(ValueError, match="dimension mismatch"):
        MU.encode([[1.0] * 7], _cfg())
    with pytest.raises(ValueError, match="non-finite"):
        MU.encode([[float("nan")] * 8], _cfg())


def test_output_shapes():
    vs = RNG.standard_normal((5, 8)).astype(np.float32)
    out = MU.encode(vs, _cfg())
    assert out.shape == (2 * 8 * 8,)  # reps * 2^simhash * dim
    out2 = MU.encode(vs, _cfg(projection_dimension=4))
    assert out2.shape == (2 * 8 * 4,)
    out3 = MU.encode(vs, _cfg(final_projection_dimension=16))
    assert out3.shape == (16,)


def test_determinism_and_mode_difference():
    base = RNG.standard_normal(8).astype(np.float32)
    # identical vectors land in the same partition: sum = 3v, mean = v
    vs = np.stack([base, base, base])
    q1 = MU.encode_query(vs, _cfg())
    q2 = MU.encode_query(vs, _cfg())
    d1 = MU.encode_document(vs, _cfg())
    assert np.array_equal(q1, q2)
    assert not np.array_equal(q1, d1)  # sum vs online mean
    assert q1 == pytest.approx(3 * d1, rel=1e-6)
    # single vector: sum == mean
    one = vs[:1]
    assert np.array_equal(MU.encode_query(one, _cfg()), MU.encode_document(one, _cfg()))


def test_query_permutation_invariance():
    """Query encodings sum per partition -> permuting input vectors changes
    the result only by f32 rounding (muvera.rs:360-378)."""
    vs = RNG.standard_normal((6, 8)).astype(np.float32)
    cfg = _cfg()
    a = MU.encode_query(vs, cfg)
    b = MU.encode_query(vs[::-1].copy(), cfg)
    assert a == pytest.approx(b, abs=1e-4)


def test_document_mean_semantics():
    """With no simhash partitions and identity projection, a document FDE of
    one repetition is the running mean of the vectors = arithmetic mean."""
    cfg = MU.MuveraConfig(dimension=4, num_repetitions=1, num_simhash_projections=0, seed=7)
    vs = np.array([[1, 2, 3, 4], [3, 4, 5, 6]], dtype=np.float32)
    out = MU.encode_document(vs, cfg)
    assert out == pytest.approx([2.0, 3.0, 4.0, 5.0], abs=1e-6)
    outq = MU.encode_query(vs, cfg)
    assert outq == pytest.approx([4.0, 6.0, 8.0, 10.0], abs=1e-6)


def test_overflow_error():
    cfg = MU.MuveraConfig(dimension=2, num_repetitions=1, num_simhash_projections=0)
    big = [[3e38, 3e38], [3e38, 3e38]]
    with pytest.raises(ValueError, match="overflow"):
        MU.encode_query(big, cfg)


def _maxsim(qvs, dvs):
    qn = qvs / np.linalg.norm(qvs, axis=1, keepdims=True)
    dn = dvs / np.linalg.norm(dvs, axis=1, keepdims=True)
    return float((qn @ dn.T).max(axis=1).sum())


def test_fde_recall_contains_exact_top2():
    """FDE inner-product top-4 must contain the exact MaxSim top-2 over 8
    synthetic docs (SURVEY §5.7 / vector_integration_test.exs:49-98)."""
    dim = 16
    cfg = MU.MuveraConfig(
        dimension=dim, num_repetitions=4, num_simhash_projections=3, seed=42
    )
    qvs = RNG.standard_normal((3, dim)).astype(np.float32)
    docs = []
    for i in range(8):
        if i < 2:
            # near-duplicates of the query tokens -> exact top docs
            noise = RNG.standard_normal((3, dim)).astype(np.float32) * 0.05
            docs.append(qvs + noise)
        else:
            docs.append(RNG.standard_normal((4, dim)).astype(np.float32))
    exact = sorted(range(8), key=lambda i: -_maxsim(qvs, docs[i]))[:2]
    qf = MU.encode_query(qvs, cfg)
    dfs = [MU.encode_document(d, cfg) for d in docs]
    fde_scores = [float(qf.astype(np.float64) @ d.astype(np.float64)) for d in dfs]
    fde_top4 = sorted(range(8), key=lambda i: -fde_scores[i])[:4]
    assert set(exact) <= set(fde_top4)


def test_encode_column_udf(spark):
    """Arrow UDF path equals the local encoder."""
    cfg = _cfg()
    vs1 = RNG.standard_normal((3, 8)).astype(np.float32)
    vs2 = RNG.standard_normal((5, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(1, [list(map(float, v)) for v in vs1]), (2, [list(map(float, v)) for v in vs2])],
        "id: int, vectors: array<array<float>>",
    )
    got = {
        r["id"]: np.array(r["fde"], dtype=np.float32)
        for r in df.select("id", MU.fde_column("vectors", cfg).alias("fde")).collect()
    }
    assert np.array_equal(got[1], MU.encode_document(vs1, cfg))
    assert np.array_equal(got[2], MU.encode_document(vs2, cfg))
