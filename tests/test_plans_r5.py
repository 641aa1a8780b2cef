"""Round-5 physical-plan pins: the de-quadratized semantic_dedup_pairs
gate query (banded candidates, no full-corpus cogroup GEMM)."""

from __future__ import annotations

import pytest

from vettore_spark.queries import queries


@pytest.fixture(scope="module")
def qs():
    return queries()


SF = "/root/testdata/sf0.001"


def _executed(df) -> str:
    from tests.conftest import strip_cached_plans

    return strip_cached_plans(
        df._jdf.queryExecution().executedPlan().toString()
    )


def test_semantic_dedup_pairs_no_full_corpus_gemm(spark, qs):
    """semantic_dedup_pairs must generate candidates with the banded
    sign-prefix blocker (explode -> capped (band,key) equi-self-join),
    NOT the exact all-pairs block-grid cogroup: the grid spreads O(n^2)
    GEMM work without removing it, so at 100x corpus it is 10,000x the
    cost. The cogroup stage surfaces as FlatMapCoGroupsInPandas in the
    executed plan — its absence IS the de-quadratization."""
    # Built FRESH (cleared persist registry + prepared-query memo): the
    # banded candidate table is a cached_persist derived index, and a plan
    # built after another test materialized it reads InMemoryRelation —
    # strip_cached_plans would then hide the very subtree this pin
    # inspects.
    from vettore_spark import queries as Q
    from vettore_spark.plans import cache as PC

    PC.clear()
    Q._DF_CACHE.clear()
    plan = _executed(Q.q_semantic_dedup_pairs(spark, SF))
    assert "FlatMapCoGroupsInPandas" not in plan, "all-pairs cogroup GEMM"
    assert "Generate" in plan, "band explode missing"
    assert "_pop" in plan, "block-population cap missing"
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bloom_probe_is_map_side_no_shuffle_no_join(spark):
    """The bloom membership probe must be pure scan-stage arithmetic:
    filtering a table through bloom_might_contain adds NO exchange and
    NO join to the plan — the property that makes it a runtime filter
    rather than a semi-join."""
    from pyspark.sql import functions as F

    from vettore_spark.plans import bloom as B

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey"
    )
    words = B.bloom_words(
        B.bloom_build(urgent, "o_orderkey", m_bits=1 << 12), m_bits=1 << 12
    )
    plan = _executed(
        li.filter(B.bloom_might_contain("l_orderkey", words))
    )
    assert "Exchange" not in plan, "bloom probe must not shuffle"
    assert "Join" not in plan, "bloom probe must not join"
    assert "Scan parquet" in plan or "FileScan" in plan
