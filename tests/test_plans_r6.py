"""Round-6 physical-plan pins: the table_profile_sketch plan fix (the
r5 verdict's only perf_weak query — a double-executed 7x-wide explode
scan plus an exploded exact-distinct shuffle) and the fact-table cache
parallelism normalization in queries._t."""

from __future__ import annotations

import pytest

from vettore_spark import queries as Q
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


def test_table_profile_sketch_single_explode_subtree(spark, qs):
    """The exact rail (null counts + calibration count_distinct) must come
    from ONE non-exploded multi-distinct aggregate over the base table
    (Catalyst's Expand rewrite — exactly q_table_profile's shape), and
    the 7x-wide unpivoted string scan must feed ONLY the KMV subtree, so
    it executes once per action. The r5 version referenced the exploded
    scan from two subtrees (nulls + sketch) with no persist, running the
    explode+md5 scan twice; its nulls branch had no Expand at all."""
    plan = _executed(qs["table_profile_sketch"](spark, SF))
    # exact rail is the one-pass Expand multi-distinct, not an exploded
    # groupBy-distinct
    assert plan.count("Expand") == 1, "exact rail must be one Expand agg"
    # one Generate unpivots for the sketch; one trivial Generate unpacks
    # the single-row stats struct — the explode subtree is not duplicated
    assert plan.count("Generate") <= 2, "unpivot subtree duplicated"
    # tiny 7-row join between the two rails stays broadcast
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_fact_table_cache_partitioning_matches_parallelism(spark):
    """queries._t must normalize WIDE fact tables' cached partitioning to
    the session's defaultParallelism: the synthetic testdata is one row
    group per file, so without it every map-heavy stage over the cached
    relation runs on 1-3 cores regardless of local[N] — a local artifact
    a real cluster (thousands of splits) does not have. Dimension tables
    stay as-read."""
    li = Q._t(spark, SF, "lineitem")
    target = spark.sparkContext.defaultParallelism
    assert li.rdd.getNumPartitions() >= min(
        target, 4
    ), "fact table cache must not be split-starved"
    region = Q._t(spark, SF, "region")
    assert region.rdd.getNumPartitions() <= target


def test_tpch_q17_bloom_probe_adds_no_join_no_shuffle(spark, qs):
    """The bloom prefilter must change Q17's plan ONLY by a map-side
    filter on the fact scan plus one tiny bitmap-build aggregate executed
    at plan-build time: the probed plan has no additional join and no
    additional exchange versus plain Q17 (the runtime-filter property —
    pruning happens in the scan stage, not via a semi-join)."""
    pb = _executed(qs["tpch_q17_bloom"](spark, SF))
    pp = _executed(qs["tpch_q17_smallqty"](spark, SF))
    assert pb.count("Exchange") <= pp.count("Exchange"), "bloom added a shuffle"
    assert pb.count("BroadcastHashJoin") == pp.count("BroadcastHashJoin")
    for op in ("SortMergeJoin", "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert op not in pb
