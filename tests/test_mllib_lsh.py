"""MLlib BRP-LSH ANN: exhaustive-config agreement with exact flat search
(the HNSW high-ef invariant, hnsw.rs:659-687) + realistic-parameter recall
via overlap@k (bench/search_modes_bench.exs:193-238 pattern)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vettore_spark.operators import search as S
from vettore_spark.operators.mllib_lsh import brp_lsh_topk


@pytest.fixture(scope="module")
def coll(spark):
    rng = np.random.default_rng(11)
    rows = [
        (i, rng.standard_normal(16).astype(float).tolist()) for i in range(300)
    ]
    return spark.createDataFrame(rows, "vec_id: long, vector: array<double>").cache()


@pytest.fixture(scope="module")
def queries(spark, coll):
    return coll.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("vector").alias("query_vector")
    )


def _exact_ids(coll, qv, k):
    out = S.flat_topk(coll, qv, metric="l2", k=k, id_col="vec_id", vector_col="vector")
    return [r["vec_id"] for r in out.collect()]


def test_exhaustive_config_equals_exact(coll, queries):
    got = brp_lsh_topk(
        coll, queries, k=5, bucket_length=1e9, num_hash_tables=24, seed=7,
        id_col="vec_id", vector_col="vector",
    ).collect()
    by_q: dict = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    qvs = {r["query_id"]: list(r["query_vector"]) for r in queries.collect()}
    for qid, ids in by_q.items():
        assert ids == _exact_ids(coll, qvs[qid], 5), f"query {qid} diverged"


def test_realistic_params_overlap(coll, queries):
    """Narrow buckets + OR-amplification: recall must stay high on gaussian
    data (overlap@5 >= 0.6 averaged over queries — approximate mode)."""
    got = brp_lsh_topk(
        coll, queries, k=5, bucket_length=2.0, num_hash_tables=6, seed=7,
        id_col="vec_id", vector_col="vector",
    ).collect()
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    qvs = {r["query_id"]: list(r["query_vector"]) for r in queries.collect()}
    overlaps = [
        len(by_q.get(qid, set()) & set(_exact_ids(coll, qv, 5))) / 5.0
        for qid, qv in qvs.items()
    ]
    assert sum(overlaps) / len(overlaps) >= 0.6, overlaps


def test_distance_is_exact_within_candidates(coll, queries):
    """LSH prunes candidates but never approximates the distance itself."""
    got = brp_lsh_topk(
        coll, queries, k=3, bucket_length=1e9, num_hash_tables=24, seed=7,
        id_col="vec_id", vector_col="vector",
    ).collect()
    vecs = {r["vec_id"]: np.array(r["vector"]) for r in coll.collect()}
    qvs = {r["query_id"]: np.array(r["query_vector"]) for r in queries.collect()}
    for r in got:
        want = float(np.linalg.norm(vecs[r["vec_id"]] - qvs[r["query_id"]]))
        assert r["distance"] == pytest.approx(want, rel=1e-9)


def test_kmeans_centroids_ivf_recall(spark):
    """MLlib-trained IVF centroids: cells must cover the data (every vector
    assigned) and IVF search over them must reach high overlap@10 vs exact
    at generous n_probe."""
    from pyspark.sql import functions as F

    from vettore_spark.operators import ann as ANN
    from vettore_spark.operators.mllib_lsh import kmeans_centroids

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = kmeans_centroids(emb, k=8, vector_col="embedding")
    assert cents.count() == 8
    queries = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vector")
    )
    exact = ANN.brute_force_topk(
        emb, queries, k=10, metric="cosine", id_col="vec_id", vector_col="embedding"
    ).collect()
    approx = ANN.ivf_topk(
        emb, queries, centroids=cents, n_probe=6, k=10,
        id_col="vec_id", vector_col="embedding",
    ).collect()
    overlaps = []
    for qid in range(6):
        e = {r["vec_id"] for r in exact if r["query_id"] == qid}
        a = {r["vec_id"] for r in approx if r["query_id"] == qid}
        overlaps.append(len(e & a) / 10)
    assert sum(overlaps) / len(overlaps) >= 0.8, overlaps
