"""Round-3 physical-plan pins: the new TPC-H shapes, the aggregate-only
paragraph dedup, and the anti-join cross-corpus dedup."""

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


def test_tpch_q3_is_take_ordered(spark, qs):
    """Top-10 over the grouped aggregate must be TakeOrderedAndProject —
    never a global sort of the aggregate output."""
    plan = _executed(qs["tpch_q3_topk"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan  # customer dim broadcast


def test_tpch_q19_single_broadcast_join(spark, qs):
    """The disjunctive band filter must ride ONE broadcast hash join of
    lineitem against the part dim — no shuffle of the fact side."""
    plan = _executed(qs["tpch_q19_bands"](spark, SF))
    assert plan.count("BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in plan


def test_paragraph_dedup_has_no_window_sort(spark, qs):
    """The keeper computation is an aggregate (map-side partial combine),
    NOT a row_number window: no Window operator, and partial_min must
    appear below the digest exchange."""
    plan = _executed(qs["paragraph_dedup"](spark, SF))
    assert "Window" not in plan
    assert "partial_min" in plan


def test_cross_corpus_dedup_is_anti_join(spark, qs):
    plan = _executed(qs["cross_corpus_dedup"](spark, SF))
    assert "LeftAnti" in plan


def test_blocklist_filter_is_map_only_on_parquet(spark, qs):
    plan = _executed(qs["blocklist_filter"](spark, SF))
    assert "Exchange" not in plan


def test_tpch_q4_exists_is_left_semi(spark, qs):
    """EXISTS must compile to a left-semi join — no row multiplication
    from multi-line orders, no subquery re-execution per row."""
    plan = _executed(qs["tpch_q4_exists"](spark, SF))
    assert "LeftSemi" in plan


def test_salted_rollup_is_two_phase(spark, qs):
    """The salted aggregate must show TWO HashAggregate pairs (per-salt
    partial phase, then the merge) with the second keyed only on the hot
    key — the skew-splitting shape."""
    plan = _executed(qs["salted_event_rollup"](spark, SF))
    assert plan.count("HashAggregate") >= 4  # partial+final x two phases


def test_minhash_dedup_against_no_cartesian(spark, qs):
    """Cross-corpus near-dup must stay keyed on (band, bh) — never a
    batch x corpus product."""
    plan = _executed(qs["minhash_dedup_against"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
