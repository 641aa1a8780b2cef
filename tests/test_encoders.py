"""Pluggable text-encoder inference stage: Arrow-batch plumbing,
deterministic fake, env-gated real path."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from vettore_spark.encodings import encoders as EN


def test_fake_encoder_deterministic_and_normalized():
    s = pd.Series(["hello world", "hello world", "other text", ""])
    m = EN.fake_encode_texts(s, dim=16)
    assert m.shape == (4, 16)
    assert np.array_equal(m[0], m[1])          # same text, same embedding
    assert not np.array_equal(m[0], m[2])
    for row in m:
        assert abs(float(np.sqrt((row * row).sum())) - 1.0) < 1e-9


def test_encode_texts_batches_whole_series(spark):
    """The encoder must be called per Arrow batch, never per row — models
    amortize over batches."""
    def spy(texts: pd.Series) -> np.ndarray:
        # stamp the batch size into element 0 of every row — the spy runs
        # in executor workers, so a driver-side counter would never see it
        m = EN.fake_encode_texts(texts, dim=8)
        m[:, 0] = float(len(texts))
        return m

    df = spark.createDataFrame(
        [(i, f"document number {i}") for i in range(64)],
        "doc_id long, text string",
    )
    out = EN.encode_texts(df, encode_fn=spy, dim=8).collect()
    assert len(out) == 64
    assert all(len(r["embedding"]) == 8 for r in out)
    batch_sizes = [r["embedding"][0] for r in out]
    assert sum(1 for _ in batch_sizes) == 64
    assert max(batch_sizes) > 1  # batched, not row-at-a-time


def test_encode_texts_feeds_search_operators(spark):
    """The embedding column is directly consumable by the search stack."""
    from vettore_spark.operators import ann as ANN

    df = spark.createDataFrame(
        [(i, f"text body {i % 4}") for i in range(20)],
        "doc_id long, text string",
    )
    emb = EN.encode_texts(df, dim=16)
    q = emb.limit(2).select(
        emb.doc_id.alias("query_id"), emb.embedding.alias("query_vector")
    )
    hits = ANN.brute_force_topk(
        emb, q, k=3, metric="cosine", id_col="doc_id", vector_col="embedding"
    ).collect()
    assert len(hits) == 6
    # identical texts (i % 4 collisions) embed identically -> top hit score 1
    by_q = {}
    for r in hits:
        by_q.setdefault(r["query_id"], []).append(r)
    for rs in by_q.values():
        assert max(x["score"] for x in rs) == pytest.approx(1.0, abs=1e-6)


def test_real_encoder_is_env_gated(monkeypatch):
    monkeypatch.delenv("SPARK_VETTORE_EMBED_MODEL", raising=False)
    with pytest.raises(NotImplementedError):
        EN.load_real_encoder()
    with pytest.raises(NotImplementedError):
        # model named but sentence-transformers absent in this container
        EN.load_real_encoder("all-MiniLM-L6-v2")


def test_rerank_with_model_pluggable_and_bounded(spark):
    """The reranker sees only the candidate set and honors a pluggable
    scorer; ranks order by (score desc, id)."""
    qdf = spark.createDataFrame(
        [(0, "alpha query"), (1, "beta query")], "query_id long, query_text string"
    )
    docs = spark.createDataFrame(
        [(i, f"doc body {i}") for i in range(6)], "doc_id long, text string"
    )
    cand = qdf.crossJoin(docs)

    def scorer(q: pd.Series, d: pd.Series) -> np.ndarray:
        # higher doc id -> higher score, query-independent
        return np.array([float(int(x.split()[-1])) / 10 for x in d])

    out = EN.rerank_with_model(cand, score_fn=scorer, k=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"]))
    for qid, rows in by_q.items():
        assert sorted(rows) == [(1, 5), (2, 4), (3, 3)]


def test_rerank_default_scorer_deterministic(spark):
    qdf = spark.createDataFrame([(0, "q")], "query_id long, query_text string")
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(8)], "doc_id long, text string"
    )
    cand = qdf.crossJoin(docs)
    a = EN.rerank_with_model(cand, k=4).collect()
    b = EN.rerank_with_model(cand, k=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert all(0.0 <= r["model_score"] < 1.0 for r in a)


def test_encode_and_put_text_to_searchable_collection(spark):
    """One call from raw text to a searchable collection: identical texts
    embed identically, so searching with a known text's embedding returns
    that doc at score ~1."""
    from vettore_spark import Collection

    docs = spark.createDataFrame(
        [(i, f"document body number {i % 7}") for i in range(21)],
        "doc_id long, text string",
    )
    c = Collection.create(spark, "text_coll", 16, metric="cosine")
    c.encode_and_put(docs)
    assert c.count() == 21
    q = EN.fake_encode_texts(pd.Series(["document body number 3"]), dim=16)[0]
    hits = c.search(list(map(float, q)), limit=3).collect()
    assert hits[0]["value"] == "document body number 3"
    assert hits[0]["score"] == pytest.approx(1.0, abs=1e-6)


def test_get_many_and_search_many_empty_inputs(spark):
    from vettore_spark import Collection

    c = Collection.create(spark, "empt", 4, metric="cosine")
    c.put_many([{"id": "a", "vector": [1.0, 0.0, 0.0, 0.0]}])
    assert c.get_many([]).count() == 0
    assert c.search_many([], limit=3).count() == 0
    assert c.search_many({}, limit=3).count() == 0
