"""Round-4 physical-plan pins: the replicate-salt join and the banded
sign-prefix near-dup gate query."""

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


def test_salted_user_join_spreads_key_over_salts(spark, qs):
    """The join must be keyed on (user_id, _salt) with the dimension
    replicated via explode — the shape that spreads a hot user over
    n_salt reducers; never a plain single-key join (which AQE cannot
    split for one hot group) and never a cartesian."""
    plan = _executed(qs["salted_user_join"](spark, SF))
    assert "_salt" in plan, "salt key missing from the join"
    assert "Generate" in plan, "dimension replication (explode) missing"
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_salt_join_equals_plain_join(spark):
    """Unit-level oracle: the replicate-salt join returns exactly the
    plain join's rows, including hot-key multiplicity."""
    from pyspark.sql import functions as F

    from vettore_spark.plans.skew import salt_join

    big = spark.createDataFrame(
        [(k, i) for i in range(200) for k in ([1] * 3 + [2])],
        "k: long, payload: long",
    )
    small = spark.createDataFrame(
        [(1, "hot"), (2, "cold"), (3, "unmatched")], "k: long, tag: string"
    )
    got = (
        salt_join(big, small, "k", salt_col="payload", n_salt=4)
        .groupBy("k", "tag")
        .agg(F.count("*").alias("n"), F.sum("payload").alias("s"))
    )
    want = (
        big.join(small, "k")
        .groupBy("k", "tag")
        .agg(F.count("*").alias("n"), F.sum("payload").alias("s"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_embedding_neardup_blocked_gate_query_plan(spark, qs):
    """The 8-bit x 4-band gate query: equi-join on (band, key) only —
    no cartesian, population cap present."""
    plan = _executed(qs["embedding_neardup_blocked"](spark, SF))
    assert "_pop" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tpch_q5_broadcasts_all_dims(spark, qs):
    """The 6-way star join: every dimension (customer, supplier, nation,
    region) rides a broadcast hash join — the fact side is never shuffled
    for a dim."""
    plan = _executed(qs["tpch_q5_local"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan


def test_tpch_q17_decorrelated_no_subquery_reexec(spark, qs):
    """The per-part average must be a pre-aggregate joined back (scan the
    fact twice, aggregate once) — no nested-loop re-execution and an
    aggregate with partial_sum below the join."""
    plan = _executed(qs["tpch_q17_smallqty"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "partial_sum" in plan


def test_event_funnel_no_global_window(spark, qs):
    """Funnel stages are min-aggregates + user_id equi-joins — never a
    window sort over the whole stream."""
    plan = _executed(qs["event_funnel"](spark, SF))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_tpch_q15_max_is_broadcast_not_window(spark, qs):
    """The 'suppliers at the max' scalar subquery must be an aggregate +
    single-row broadcast + filter — not a rank window over all suppliers."""
    plan = _executed(qs["tpch_q15_topsupp"](spark, SF))
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_tpch_q22_is_anti_join(spark, qs):
    plan = _executed(qs["tpch_q22_noorders"](spark, SF))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_jl_prefilter_candidate_stage_is_take_ordered(spark, qs):
    """Stage 1's top-100 in projected space must be TakeOrderedAndProject
    (per-partition heads + merge), never a global sort; the rerank semi-join
    stays an equi-join."""
    plan = _executed(qs["jl_prefilter_topk"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_tpch_q13_left_outer_preserves_zero_count_customers(spark, qs):
    """The priority predicate must ride the JOIN (customers with only
    urgent orders count 0, not vanish); the plan shows a LeftOuter join
    and a two-level aggregate."""
    plan = _executed(qs["tpch_q13_custdist"](spark, SF))
    assert "LeftOuter" in plan
    assert plan.count("HashAggregate") >= 4  # per-customer + histogram


def test_table_profile_single_aggregate_scan(spark, qs):
    """All columns' null/distinct stats ride ONE aggregate over one scan;
    the per-column output rows come from a literal explode, not one job
    per column (expand-based multi-distinct is the expected shape)."""
    plan = _executed(qs["table_profile"](spark, SF))
    assert plan.count("Scan parquet") <= 1
    assert "Generate" in plan


def test_tpch_q21_exists_pair_is_semi_plus_anti(spark, qs):
    """The EXISTS / NOT EXISTS pair must compile to a left-semi and a
    left-anti join on orderkey (suppkey inequality as residual) — never a
    cartesian or nested-loop re-execution per outer row."""
    plan = _executed(qs["tpch_q21_waiting"](spark, SF))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tpch_q11_threshold_is_broadcast_scalar(spark, qs):
    """The global-total threshold joins back as a single-row broadcast —
    the aggregate never leaves the cluster and the value table is scanned
    (grouped) once per side, not re-executed per row."""
    plan = _executed(qs["tpch_q11_important"](spark, SF))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_tpch_q2_min_per_part_is_window_not_rejoin(spark, qs):
    """The correlated min-subquery runs as a window min over p_partkey on
    the dim-filtered eligible set — one shuffle, no self-join of the
    part-supplier aggregate against itself."""
    plan = _executed(qs["tpch_q2_mincost"](spark, SF))
    assert "Window" in plan
    assert "CartesianProduct" not in plan
    # dims ride broadcast joins; the only sort-merge-scale join keys are
    # the window exchange over p_partkey
    assert plan.count("BroadcastHashJoin") >= 3


def test_tpch_q20_nested_in_is_semi_chain(spark, qs):
    """Both IN-subqueries narrow via semi-join/distinct — supplier is
    probed with a left-semi, and no stage widens the fact table."""
    plan = _executed(qs["tpch_q20_excess"](spark, SF))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
