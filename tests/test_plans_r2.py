"""Physical-plan assertions for the round-2 operators (BM25/RRF, corpus
prep, SQ8): the scale shapes — no unnecessary shuffle, broadcast small
sides, bounded top-k — must be visible in the executed plans."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vettore_spark.operators import pipeline as PL
from vettore_spark.operators import retrieval as RT
from vettore_spark.operators import sq as SQ


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(40)))
        for i in range(100)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"]).cache()


def _executed(df) -> str:
    from tests.conftest import strip_cached_plans

    return strip_cached_plans(
        df._jdf.queryExecution().executedPlan().toString()
    )


def test_bm25_topk_is_take_ordered_no_explode(docs):
    """BM25 over literal terms: TakeOrderedAndProject on top, no Generate
    (explode) anywhere — per-doc tf comes from array filters."""
    plan = _executed(RT.bm25_topk(docs, ["w1", "w2"], k=5))
    assert "TakeOrderedAndProject" in plan
    assert "Generate" not in plan


def test_bm25_stats_join_is_broadcast(docs):
    """The 1-row corpus-stats join must be a broadcast nested loop / hash
    join, never a shuffle (SortMergeJoin)."""
    plan = _executed(RT.bm25_scores(docs, ["w1", "w2"]))
    assert "SortMergeJoin" not in plan
    assert "Broadcast" in plan


def test_chunking_has_no_shuffle(docs):
    """Chunk explode is narrow: no Exchange in the plan."""
    plan = _executed(PL.chunk_documents(docs, chunk_tokens=8, stride=6))
    assert "Exchange" not in plan
    assert "Generate" in plan  # the explode itself


def test_repetition_stats_has_no_shuffle_no_explode(docs):
    """Repetition signals are pure array expressions — map-only plan."""
    plan = _executed(PL.repetition_stats(docs))
    assert "Exchange" not in plan
    assert "Generate" not in plan


def test_decontaminate_benchmark_side_is_broadcast(docs, spark):
    """The benchmark shingle set must broadcast; the corpus side must not
    be shuffled for the join itself (one shuffle only for the per-doc
    hit-count aggregate)."""
    bench = docs.filter(F.col("doc_id") < 5)
    corpus = docs.filter(F.col("doc_id") >= 5)
    plan = _executed(PL.decontaminate(corpus, bench, n=3))
    # the corpus-shingles × benchmark-set join is the scale-critical one
    assert "BroadcastHashJoin" in plan
    # the corpus shingle table is persisted and both consumers read the
    # materialized column: the hit-side explode must be over the column
    # reference (Generate explode(_sh...)), never an inlined re-computation
    assert "Generate explode(_sh" in plan
    # persistence proof: consumers read the materialized shingle cache
    # (the InMemoryRelation block itself is stripped by _executed)
    assert "InMemoryTableScan [_sh" in plan


def test_sq_candidates_take_ordered_and_rerank_broadcast(spark):
    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(150)]
    coll = spark.createDataFrame(rows, ["id", "vector"])
    mins, maxs = SQ.sq_train(coll)
    plan = _executed(
        SQ.sq_topk(coll, rows[0][1], mins, maxs, k=5, candidates=30)
    )
    assert "TakeOrderedAndProject" in plan
    assert "Broadcast" in plan  # candidate hydration semi-join
    assert "SortMergeJoin" not in plan


def test_bm25_batch_window_group_limit(docs, spark):
    """Batched BM25 per-query top-k must compile to WindowGroupLimit
    (partial per-partition top-k before the exchange), and the query-terms
    join must broadcast."""
    queries = spark.createDataFrame(
        [(0, ["w1", "w2"]), (1, ["w3"])], ["query_id", "terms"]
    )
    plan = _executed(RT.bm25_batch_topk(docs, queries, k=3))
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan


def test_fuzzy_value_pairs_no_cartesian(docs, spark):
    """Length-band blocking must be an equi-join on the exploded band key —
    never a cartesian/broadcast-nested-loop over the dictionary."""
    from vettore_spark.operators.dedup import fuzzy_value_pairs

    df = docs.selectExpr("doc_id", "substring(text, 1, 12) as name")
    plan = _executed(fuzzy_value_pairs(df, value_col="name", max_distance=2))
    assert "CartesianProduct" not in plan
    # the join key is the exploded length band
    assert "Generate explode" in plan


def test_dsir_model_join_is_broadcast(spark):
    """The per-bucket log-ratio model must broadcast back over the corpus —
    an exchange-based join here would shuffle the full token stream twice."""
    from vettore_spark.operators import selection as SEL
    from vettore_spark.plans import checks as PC

    df = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 5} common", "en" if i % 2 == 0 else "de")
         for i in range(50)],
        "doc_id long, text string, lang string",
    )
    out = SEL.dsir_logratio_weights(df, F.col("lang") == "en", n_buckets=64)
    assert PC.broadcast_join_count(out) >= 1
    assert not PC.has_cartesian(out)


def test_mixture_sample_is_broadcast_filter(spark):
    """The per-domain fraction table joins by broadcast; the md5 draw is a
    per-row filter — no shuffle of the corpus itself."""
    from vettore_spark.operators import selection as SEL
    from vettore_spark.plans import checks as PC

    df = spark.createDataFrame(
        [(i, f"text {i}", f"src{i % 3}") for i in range(60)],
        "doc_id long, text string, source string",
    )
    out = SEL.mixture_sample(df, {"src0": 0.5, "src1": 0.3, "src2": 0.2})
    assert PC.broadcast_join_count(out) >= 1
    plan = PC.executed_plan(out)
    # corpus side reaches the join without an Exchange above its scan
    assert "CartesianProduct" not in plan


def test_semdedup_centroids_broadcast_and_cluster_local(spark):
    """Centroid join broadcasts; the pairwise pass joins on the cluster key
    (hash/broadcast join, never a cartesian product)."""
    from vettore_spark.functions import kernels as K
    from vettore_spark.operators import selection as SEL
    from vettore_spark.plans import checks as PC

    emb = spark.createDataFrame(
        [(i, [float(i % 5), float(i % 3), 1.0], f"c{i % 4}") for i in range(40)],
        "vec_id long, embedding array<double>, label string",
    )
    cents = emb.groupBy("label").agg(
        K.mean_vector(F.collect_list("embedding"), 3).alias("mean")
    )
    out = SEL.semdedup_prune(emb, cents, threshold=0.9)
    assert PC.broadcast_join_count(out) >= 1
    assert not PC.has_cartesian(out)


def test_substring_pairs_single_aggregate_no_join(spark):
    """The posting-list plan: explode → count-first cap → posting
    aggregate → pair emission. No self-join of the DOCUMENT table, no
    cartesian product; the only join allowed is the cap's LEFT SEMI of
    exploded rows against the count-filtered key set (the r8
    bounded-memory shape — a hot gram is dropped before its posting list
    ever materializes)."""
    from vettore_spark.operators.dedup import substring_gram_pairs
    from vettore_spark.plans import checks as PC

    df = spark.createDataFrame(
        [(i, "some shared prefix text that goes on for quite a while " * 2)
         for i in range(10)],
        "doc_id long, text string",
    )
    out = substring_gram_pairs(df, k=40)
    plan = PC.executed_plan(out)
    assert not PC.has_cartesian(out)
    for line in plan.splitlines():
        if "Join" in line:
            assert "LeftSemi" in line, line


def test_trailing_features_single_shuffle(spark):
    """All three windows share one partitioning on user_id: exactly one
    Exchange in the plan."""
    from vettore_spark.operators.temporal import trailing_user_features
    from vettore_spark.plans import checks as PC

    ev = spark.createDataFrame(
        [(i, i % 5, i * 100, float(i)) for i in range(50)],
        "event_id long, user_id long, t long, value double",
    ).select("event_id", "user_id",
             F.timestamp_seconds(F.col("t")).alias("ts"), "value")
    out = trailing_user_features(ev)
    assert PC.shuffle_count(out) == 1
