"""Product quantization: deterministic training, exact NumPy oracles for
encode/ADC, and overlap@k vs the exact brute-force baseline (the
reference's approximate-mode validation pattern, SURVEY §5.4)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vettore_spark.operators import ann as ANN
from vettore_spark.operators import pq as PQ


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


@pytest.fixture(scope="module")
def mat(emb):
    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows])
    m = np.array([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    return ids, m


def test_train_deterministic(mat):
    _, m = mat
    b1 = PQ.pq_train_kmeans(m, m=4, n_codes=16, iters=5)
    b2 = PQ.pq_train_kmeans(m, m=4, n_codes=16, iters=5)
    assert np.array_equal(b1, b2)
    assert b1.shape == (4, 16, 16)


def test_train_reduces_distortion(mat):
    _, m = mat
    def distortion(books):
        codes = PQ._encode_batch(m, books)
        dsub = books.shape[2]
        err = 0.0
        for s in range(books.shape[0]):
            rec = books[s][codes[:, s]]
            err += ((m[:, s * dsub : (s + 1) * dsub] - rec) ** 2).sum()
        return err

    b0 = PQ.pq_train_kmeans(m, m=4, n_codes=16, iters=0)
    b5 = PQ.pq_train_kmeans(m, m=4, n_codes=16, iters=5)
    assert distortion(b5) < distortion(b0)


def test_encode_matches_numpy_oracle(spark, emb, mat):
    ids, m = mat
    books = PQ.pq_train_kmeans(m, m=4, n_codes=16, iters=3)
    got = {
        r["vec_id"]: list(r["codes"])
        for r in PQ.pq_encode(emb, books).collect()
    }
    want = PQ._encode_batch(m, books)
    for i, vid in enumerate(ids):
        assert got[vid] == list(want[i])


def test_adc_matches_numpy_oracle(spark, emb, mat):
    ids, m = mat
    books = PQ.pq_train_kmeans(m, m=4, n_codes=16, iters=3)
    codes = PQ._encode_batch(m, books)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vector")
    )
    codes_df = PQ.pq_encode(emb, books)
    got = PQ.pq_adc_topk(codes_df, queries, books, k=5).collect()
    qmat = m[np.searchsorted(ids, [0, 1, 2])]
    dsub = books.shape[2]
    for j, qid in enumerate([0, 1, 2]):
        lut = ((qmat[j].reshape(4, 1, dsub) - books) ** 2).sum(axis=2)
        d = np.sqrt(lut[np.arange(4)[None, :], codes].sum(axis=1))
        order = np.lexsort((ids, np.round(d, 5)))[:5]
        mine = sorted(
            [r for r in got if r["query_id"] == qid], key=lambda r: r["rank"]
        )
        assert [r["vec_id"] for r in mine] == list(ids[order])
        for r, i in zip(mine, order):
            assert abs(r["distance"] - d[i]) < 1e-9


def test_pq_search_overlap_vs_exact(spark, emb, mat):
    ids, m = mat
    books = PQ.pq_train_kmeans(m, m=8, n_codes=32, iters=8)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vector")
    )
    exact = ANN.brute_force_topk(
        emb, queries, k=10, metric="l2", id_col="vec_id", vector_col="embedding"
    ).collect()
    approx = PQ.pq_search(
        emb, queries, books, candidates=100, k=10, metric="l2",
        id_col="vec_id", vector_col="embedding",
    ).collect()
    overlaps = []
    for qid in range(8):
        e = {r["vec_id"] for r in exact if r["query_id"] == qid}
        a = {r["vec_id"] for r in approx if r["query_id"] == qid}
        overlaps.append(len(e & a) / 10)
    assert sum(overlaps) / len(overlaps) >= 0.8, overlaps


def test_pq_search_full_candidates_equals_exact(spark, emb, mat):
    ids, m = mat
    books = PQ.pq_train_kmeans(m, m=4, n_codes=16, iters=2)
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vector")
    )
    n = emb.count()
    exact = ANN.brute_force_topk(
        emb, queries, k=10, metric="l2", id_col="vec_id", vector_col="embedding"
    ).collect()
    full = PQ.pq_search(
        emb, queries, books, candidates=n, k=10, metric="l2",
        id_col="vec_id", vector_col="embedding",
    ).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert [
        (r["query_id"], r["vec_id"], r["rank"]) for r in sorted(full, key=key)
    ] == [
        (r["query_id"], r["vec_id"], r["rank"]) for r in sorted(exact, key=key)
    ]
