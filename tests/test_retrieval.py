"""BM25 + reciprocal-rank-fusion tests against a pure-Python oracle."""

from __future__ import annotations

import math

import pytest

from vettore_spark.operators import retrieval as RT

DOCS = [
    (0, "spark join window spark table"),
    (1, "table scan filter sort merge"),
    (2, "join join join window"),
    (3, "spark"),
    (4, "window window window window window window"),
    (5, "group agg sort"),
]
TERMS = ["spark", "join", "window"]
K1, B = 1.2, 0.75


def _py_bm25() -> dict[int, float]:
    toks = {i: t.split() for i, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfreq = {t: sum(1 for v in toks.values() if t in v) for t in TERMS}
    out = {}
    for i, v in toks.items():
        s = 0.0
        for t in TERMS:
            tf = v.count(t)
            idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * len(v) / avgdl))
        if any(t in v for t in TERMS):
            out[i] = s
    return out


def test_bm25_scores_match_python_oracle(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["bm25"]
        for r in RT.bm25_scores(df, TERMS, k1=K1, b=B).collect()
    }
    want = _py_bm25()
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], rel=1e-12)


def test_bm25_topk_order_and_rank(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rows = RT.bm25_topk(df, TERMS, k=3, k1=K1, b=B).collect()
    want = sorted(_py_bm25().items(), key=lambda kv: (-round(kv[1], 5), kv[0]))[:3]
    assert [r["doc_id"] for r in rows] == [i for i, _ in want]
    assert [r["rank"] for r in rows] == [1, 2, 3]
    # doc 5 matches no term -> absent even at large k
    all_rows = RT.bm25_topk(df, TERMS, k=10, k1=K1, b=B).collect()
    assert 5 not in {r["doc_id"] for r in all_rows}


def test_rrf_fuse_combines_and_orders(spark):
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], ["doc_id", "rank"])
    b = spark.createDataFrame([(3, 1), (1, 2), (9, 3)], ["doc_id", "rank"])
    rows = RT.rrf_fuse([a, b], k=60).collect()
    got = {r["doc_id"]: (r["rrf"], r["n_lists"]) for r in rows}
    assert got[1] == (round(1 / 61 + 1 / 62, 6), 2)
    assert got[3] == (round(1 / 63 + 1 / 61, 6), 2)
    assert got[2] == (round(1 / 62, 6), 1)
    assert got[9] == (round(1 / 63, 6), 1)
    # ordering: rrf desc, then id
    rrfs = [(r["rrf"], r["doc_id"]) for r in rows]
    assert rrfs == sorted(rrfs, key=lambda x: (-x[0], x[1]))


def test_rrf_topk_truncates(spark):
    a = spark.createDataFrame([(i, i + 1) for i in range(5)], ["doc_id", "rank"])
    rows = RT.rrf_fuse([a], k=60, topk=2).collect()
    assert [r["doc_id"] for r in rows] == [0, 1]


def test_charlm_trigram_scores_match_python(spark):
    """Laplace-smoothed trigram LM vs a pure-Python oracle; repeated common
    trigrams must outscore a one-off oddball document."""
    import math

    from vettore_spark.operators import text as TX

    docs = [(0, "abcabcabc"), (1, "abcabc"), (2, "zzqqxx")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_trigrams"], r["trigram_logprob"])
        for r in TX.charlm_trigram_scores(df).collect()
    }
    tris = {i: [t[j : j + 3] for j in range(len(t) - 2)] for i, t in docs}
    from collections import Counter

    model = Counter(x for v in tris.values() for x in v)
    n3, v = sum(model.values()), len(model)
    for i, ts in tris.items():
        lp = sum(math.log((model[t] + 1.0) / (n3 + 1.0 * v)) for t in ts) / len(ts)
        assert got[i][0] == len(ts)
        assert got[i][1] == pytest.approx(round(lp, 5), abs=1e-5)
    # the common-trigram docs score above the oddball
    assert got[0][1] > got[2][1] and got[1][1] > got[2][1]


def test_bm25_batch_matches_single_query_path(spark):
    """The inverted-index batch path and the literal-terms single path
    produce identical (rounded) scores and rankings for the same query."""
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    single = {
        r["doc_id"]: (r["bm25"], r["rank"])
        for r in RT.bm25_topk(docs, TERMS, k=6, k1=K1, b=B).collect()
    }
    queries = spark.createDataFrame([(7, TERMS)], ["query_id", "terms"])
    batch = {
        r["doc_id"]: (r["bm25"], r["rank"])
        for r in RT.bm25_batch_topk(docs, queries, k=6, k1=K1, b=B).collect()
    }
    assert batch == single


def test_bm25_batch_isolates_queries(spark):
    """Each query scores against its own terms only; a doc matching no term
    of a query is absent from that query's ranking."""
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    queries = spark.createDataFrame(
        [(0, ["spam_nonexistent_term"]), (1, ["window"])], ["query_id", "terms"]
    )
    rows = RT.bm25_batch_topk(docs, queries, k=10).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(r["doc_id"])
    assert 0 not in by_q  # no doc matches the nonsense term
    assert by_q[1] == {i for i, t in DOCS if "window" in t.split()}


def test_bm25_batch_duplicate_terms_match_single_path(spark):
    """A term repeated in the query contributes per occurrence in BOTH
    paths (the batch path must not dedup query terms)."""
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    dup_terms = ["spark", "spark", "join"]
    single = {
        r["doc_id"]: (r["bm25"], r["n_matched_terms"])
        for r in RT.bm25_topk(docs, dup_terms, k=6, k1=K1, b=B).collect()
    }
    queries = spark.createDataFrame([(1, dup_terms)], ["query_id", "terms"])
    batch = {
        r["doc_id"]: (r["bm25"], r["n_matched_terms"])
        for r in RT.bm25_batch_topk(docs, queries, k=6, k1=K1, b=B).collect()
    }
    assert batch == single


def test_rrf_and_bm25_input_validation(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    with pytest.raises(ValueError, match="non-empty"):
        RT.bm25_scores(docs, [])
    with pytest.raises(ValueError, match="non-empty"):
        RT.rrf_fuse([])
    a = spark.createDataFrame([(1, 1)], ["doc_id", "rank"])
    assert RT.rrf_fuse([a], topk=0).count() == 0  # 0 means zero, not "all"
