"""PageRank / TextRank: fixed-point iteration matches an exact Python
reference (bit-for-bit — the determinism the oracle gate relies on),
higher-degree nodes outrank leaves, and the iteration plan stays
join+aggregate (no cartesian)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vettore_spark.operators.graph import (
    SCALE,
    pagerank,
    textrank_keywords,
    token_adjacency,
)


def _py_pagerank(edges, iters=10, dn=85):
    """Exact fixed-point reference: same floor-division update."""
    ow = {}
    for s, d, w in edges:
        ow[s] = ow.get(s, 0) + w
    nodes = sorted(ow)
    base = (100 - dn) * (SCALE // 100)
    r = {n: SCALE for n in nodes}
    for _ in range(iters):
        m = {}
        for s, d, w in edges:
            m[d] = m.get(d, 0) + (r[s] * w) // ow[s]
        r = {n: base + (dn * m.get(n, 0)) // 100 for n in nodes}
    return r


STAR_EDGES = [
    # hub <-> 4 spokes, undirected (both directions), plus a spoke chain
    *[("hub", f"s{i}", 2) for i in range(4)],
    *[(f"s{i}", "hub", 2) for i in range(4)],
    ("s0", "s1", 1),
    ("s1", "s0", 1),
]


def test_pagerank_matches_exact_fixed_point_reference(spark):
    """BOTH execution tiers (driver-side small-graph loop and the
    distributed join+aggregate iteration) must equal the exact reference —
    and therefore each other — bit for bit."""
    df = spark.createDataFrame(STAR_EDGES, ["src", "dst", "w"])
    want = _py_pagerank(STAR_EDGES, iters=10)
    got_driver = {
        r["node"]: r["rank_scaled"]
        for r in pagerank(df, weight_col="w", iters=10).collect()
    }
    got_dist = {
        r["node"]: r["rank_scaled"]
        for r in pagerank(
            df, weight_col="w", iters=10, driver_max_edges=0
        ).collect()
    }
    assert got_driver == want
    assert got_dist == want


def test_pagerank_hub_outranks_spokes(spark):
    df = spark.createDataFrame(STAR_EDGES, ["src", "dst", "w"])
    got = {
        r["node"]: r["rank_scaled"]
        for r in pagerank(df, weight_col="w", iters=10).collect()
    }
    assert got["hub"] == max(got.values())
    assert got["s3"] < got["s0"]  # chain members collect extra mass


def test_pagerank_unweighted_uniform_cycle(spark):
    """A directed cycle is rank-uniform: every node keeps exactly
    rank 1.0 (SCALE) under the fixed-point update."""
    cyc = [(i, (i + 1) % 5) for i in range(5)]
    df = spark.createDataFrame(cyc, ["src", "dst"])
    got = {r["node"]: r["rank_scaled"] for r in pagerank(df, iters=7).collect()}
    assert set(got.values()) == {SCALE}


def test_pagerank_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with pytest.raises(ValueError, match="iters"):
        pagerank(df, iters=0)
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=0.0)


def test_token_adjacency_symmetric_weighted(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "b a")], ["doc_id", "text"]
    )
    got = {
        (r["src"], r["dst"]): r["w"] for r in token_adjacency(docs).collect()
    }
    # pairs: (a,b)x2 + (b,a)x1 from doc1, (b,a)x1 from doc2 -> total 4 per direction
    assert got == {("a", "b"): 4, ("b", "a"): 4}


def test_textrank_deterministic_and_ordered(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = [(r["token"], r["rank_scaled"]) for r in textrank_keywords(docs, k=10).collect()]
    b = [(r["token"], r["rank_scaled"]) for r in textrank_keywords(docs, k=10).collect()]
    assert a == b
    ranks = [x[1] for x in a]
    assert ranks == sorted(ranks, reverse=True)


def test_pagerank_iteration_plan_no_cartesian(spark):
    # driver_max_edges=0 forces the DISTRIBUTED tier so this keeps
    # pinning the iteration plan (the default would take the driver tier
    # on a 10-edge graph and the assertion would be vacuous)
    df = spark.createDataFrame(STAR_EDGES, ["src", "dst", "w"])
    plan = (
        pagerank(df, weight_col="w", iters=3, cut_every=0, driver_max_edges=0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pagerank_broadcast_tier_exact_and_fewer_exchanges(spark):
    """r15: below `broadcast_max_edges` the distributed loop joins the
    persisted edge table against a BROADCAST of the contribution vector
    (guide §3.1) — bit-identical ranks (integer sums are order-free) with
    strictly fewer shuffle exchanges per iteration than the shuffled
    formulation, which stays available via broadcast_max_edges=0."""
    df = spark.createDataFrame(STAR_EDGES, ["src", "dst", "w"])
    want = _py_pagerank(STAR_EDGES, iters=10)
    # disable the SIZE-ESTIMATE auto-broadcast: on a toy graph Catalyst
    # would broadcast the contribution aggregate in BOTH variants (its
    # estimate sits under the 10MB threshold), hiding the hint — at
    # bench scale the post-aggregate estimate is far PAST the threshold
    # (the r14 plans show ShuffledHashJoin iterations), which is exactly
    # why the explicit tiered hint exists.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bc = pagerank(df, weight_col="w", iters=10, driver_max_edges=0)
        shuf = pagerank(
            df, weight_col="w", iters=10, driver_max_edges=0,
            broadcast_max_edges=0,
        )
        assert {r["node"]: r["rank_scaled"] for r in bc.collect()} == want
        assert {r["node"]: r["rank_scaled"] for r in shuf.collect()} == want
        plan_bc = bc._jdf.queryExecution().executedPlan().toString()
        plan_shuf = shuf._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan_bc
        n_bc = plan_bc.count("Exchange hashpartitioning")
        n_shuf = plan_shuf.count("Exchange hashpartitioning")
        assert n_bc < n_shuf, (n_bc, n_shuf)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_pagerank_tiers_agree_on_degenerate_weights(spark):
    """Zero out-weight (all-zero weights for a source), NULL weights, and
    negative weights must neither crash the driver tier nor diverge from
    the distributed tier: Spark's sum() skips the NULL contributions a
    zero/NULL divisor produces, and its integral `div` truncates toward
    zero where Python // floors."""
    edges = [
        ("a", "b", 2), ("b", "a", 2),
        ("z", "a", 0), ("z", "b", 0),      # z's out-weight sums to 0
        ("n", "a", None), ("n", "b", 3),   # NULL weight row
        ("m", "a", -1), ("m", "b", 4),     # negative weight: div vs //
    ]
    df = spark.createDataFrame(edges, "src string, dst string, w int")
    got_driver = {
        r["node"]: r["rank_scaled"]
        for r in pagerank(df, weight_col="w", iters=6).collect()
    }
    got_dist = {
        r["node"]: r["rank_scaled"]
        for r in pagerank(
            df, weight_col="w", iters=6, driver_max_edges=0
        ).collect()
    }
    assert got_driver == got_dist
    assert set(got_driver) == {"a", "b", "z", "n", "m"}


def test_pagerank_tiers_agree_on_null_source(spark):
    """NULL source ids are not nodes: before r10 the distributed tier's
    node set (e.distinct()) emitted a base-rank row for NULL while the
    driver tier (node set from the collected post-out-weight-join edges,
    an inner equi-join NULL can never match) did not — same graph,
    different rows depending on driver_max_edges. Both tiers must now
    drop NULL-src edges up front and agree exactly."""
    edges = [
        ("a", "b", 1), ("b", "a", 1),
        (None, "a", 5), (None, "b", 5),  # NULL src: not a node, no mass
    ]
    df = spark.createDataFrame(edges, "src string, dst string, w int")
    got_driver = {
        r["node"]: r["rank_scaled"]
        for r in pagerank(df, weight_col="w", iters=4).collect()
    }
    got_dist = {
        r["node"]: r["rank_scaled"]
        for r in pagerank(
            df, weight_col="w", iters=4, driver_max_edges=0
        ).collect()
    }
    assert got_driver == got_dist
    assert set(got_driver) == {"a", "b"}
    # and NULL-src edges contribute no mass: ranks equal the 2-cycle's
    ref = _py_pagerank([("a", "b", 1), ("b", "a", 1)], iters=4)
    assert got_driver == ref
