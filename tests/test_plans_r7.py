"""Round-7 physical-plan pins: the new eval/pairing/whitening queries and
the Z-order Q6 scan."""

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


def test_q6_zorder_predicates_reach_the_clustered_scan(spark, qs):
    """Both Q6 filter dims must be pushed to the z-ordered parquet scan —
    pushdown is the mechanism that converts the clustered layout into
    skipped row groups. The plan reads only Q6's columns (no _zday/_zdisc
    helper columns the writer left in the files)."""
    df = qs["tpch_q6_zorder"](spark, SF)
    df.collect()
    plan = _executed(df)
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "l_shipdate" in pushed and "l_discount" in pushed, pushed
    read = plan.split("ReadSchema: ", 1)[1].split("\n", 1)[0]
    assert "_zday" not in read and "_zdisc" not in read, read


def _single_partition_exchanges_are_scalar_aggs(plan: str) -> bool:
    """True when every `Exchange SinglePartition` in the plan feeds a
    scalar aggregate (HashAggregate with keys=[] — one row per upstream
    partition merged to one total row, e.g. BM25's corpus count/sum-dl
    stats). That shape is O(partitions) rows and benign at any scale;
    what the pins must ban is SinglePartition under a Sort/Window of
    CORPUS rows, which serializes the dataset through one task."""
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        # the exchange's child is the next operator line (possibly behind
        # AQE ShuffleQueryStage wrappers); it must be a scalar aggregate
        child_ok = False
        for nxt in lines[i + 1 : i + 4]:
            if "HashAggregate" in nxt or "SortAggregate" in nxt:
                child_ok = "keys=[]" in nxt
                break
            if "ShuffleQueryStage" in nxt or "InputAdapter" in nxt:
                continue
            break
        if not child_ok:
            return False
    return True


def test_retrieval_eval_no_global_window_no_cartesian(spark, qs):
    """No corpus-row serialization: the only SinglePartition exchange
    allowed is the BM25 corpus-stats scalar aggregate (partial per
    partition -> one merged row)."""
    plan = _executed(qs["retrieval_eval"](spark, SF))
    assert _single_partition_exchanges_are_scalar_aggs(plan), plan
    assert "CartesianProduct" not in plan


def test_score_agreement_windows_partition_by_group(spark, qs):
    """Both rank windows must partition by lang — an unpartitioned window
    would serialize the corpus through one task."""
    plan = _executed(qs["score_agreement"](spark, SF))
    assert "Exchange SinglePartition" not in plan
    assert "Window" in plan


def test_mutual_knn_mutuality_is_join_not_window(spark, qs):
    """The reciprocal filter is an equi-join of the edge table with its
    reversed projection — no extra window beyond the knn build's own
    rank merge, no cartesian."""
    df = qs["mutual_knn_pairs"](spark, SF)
    df.collect()
    plan = _executed(df)
    assert "CartesianProduct" not in plan
    # knn build has exactly one rank-merge window; mutuality adds none
    assert plan.count("Window") <= 1, plan.count("Window")


def test_zca_whiten_projection_is_jvm_side(spark, qs):
    """The whitening transform is literal zip_with/aggregate arithmetic —
    no Python worker anywhere in the plan (the map-only contract that
    makes it free at 100 TB)."""
    plan = _executed(qs["zca_whiten_stats"](spark, SF))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                   "FlatMapGroupsInPandas"):
        assert marker not in plan, marker
    assert "Exchange SinglePartition" not in plan
