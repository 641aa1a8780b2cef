"""Round-8 physical-plan pins: the persisted mutual-kNN edge build and
the blocked tier's no-window / one-window contracts."""

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


def test_mutual_knn_edge_build_executes_once(spark, qs):
    """The O(n*k) block-grid GEMM must appear ONLY inside the one-time
    cache fill: after stripping cached subtrees, the query's own plan has
    zero FlatMapCoGroupsInPandas and zero Windows — both semi-join sides
    read the materialized edge table (the r7 double-build defect, fixed
    by cached_persist)."""
    df = qs["mutual_knn_pairs"](spark, SF)
    df.collect()
    plan = _executed(df)
    assert plan.count("FlatMapCoGroupsInPandas") == 0, plan
    assert plan.count("Window") == 0, plan
    assert "InMemoryTableScan" in plan


def test_blocked_knn_single_band_has_no_window(spark):
    """n_bands=1: each query's rank is final inside its block — no merge
    window, no extra exchange beyond the blocking groupBy."""
    from vettore_spark.operators.ann import blocked_knn_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    df = blocked_knn_topk(emb, k=3, n_bits=4)
    df.collect()
    plan = _executed(df)
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan


def test_blocked_knn_multiband_merges_with_one_window(spark):
    """n_bands>1: the band union re-ranks with exactly ONE window
    (partitioned by query), nothing corpus-global."""
    from vettore_spark.operators.ann import blocked_knn_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    df = blocked_knn_topk(emb, k=3, n_bits=3, n_bands=2)
    df.collect()
    plan = _executed(df)
    # "Window [" is the Window node itself; WindowGroupLimit entries are
    # the rank-cut pushdown (wanted, not counted)
    assert plan.count("Window [") == 1, plan
    assert "Exchange SinglePartition" not in plan
