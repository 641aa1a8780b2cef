"""Connected-components clustering for near-dup dedup.

Oracle: a plain Python union-find over the same edge list (exact, any
graph). Mirrors the reference's oracle pattern (exact computation as ground
truth, SURVEY §5.2/§5.4).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from vettore_spark.operators import dedup as D


def _union_find(edges):
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    out = {}
    for x in parent:
        r = find(x)
        # find() path-compresses to the root, which by construction is the
        # component minimum (we always attach max under min)
        out[x] = r
    return out


def _check(spark, edges):
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        (r["id"], r["component"])
        for r in D.connected_components(
            pairs, src="doc_a", dst="doc_b", id_out="id"
        ).collect()
    }
    want = set(_union_find(edges).items())
    assert got == want


def test_cc_simple_shapes(spark):
    # path, star, two components, self-contained triangle, self-loop-only
    # node (must appear as its own singleton component)
    _check(
        spark,
        [(1, 2), (2, 3), (3, 4), (10, 11), (12, 11), (20, 21), (21, 20), (30, 30)],
    )


def test_cc_chain_long(spark):
    # a 60-node path exercises multi-round convergence (diameter >> 1)
    edges = [(i, i + 1) for i in range(60)]
    random.Random(7).shuffle(edges)
    _check(spark, edges)


def test_cc_random_graphs(spark):
    # 2 trials (r14 trim): each trial is a full large-star/small-star
    # fixed-point run (~5 s); two independent 120-node graphs already
    # exercise multi-component + chain + cycle shapes
    rng = random.Random(20260813)
    for trial in range(2):
        n = 120
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(150)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        _check(spark, edges)


def test_cc_empty(spark):
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert D.connected_components(pairs).count() == 0


def test_cc_string_ids(spark):
    edges = [("b", "a"), ("c", "b"), ("x", "y")]
    pairs = spark.createDataFrame(edges, "doc_a string, doc_b string")
    got = {
        (r["id"], r["component"])
        for r in D.connected_components(pairs, id_out="id").collect()
    }
    assert got == {
        ("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x"),
    }


def test_neardup_clusters_and_keep_canonical(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(10)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 5), (7, 8)], "doc_a long, doc_b long"
    )
    clusters = D.neardup_clusters(pairs, id_out="doc_id").collect()
    by_id = {r["doc_id"]: (r["component"], r["cluster_size"]) for r in clusters}
    assert by_id == {
        1: (1, 3), 2: (1, 3), 5: (1, 3), 7: (7, 2), 8: (7, 2),
    }
    kept = sorted(
        r["doc_id"]
        for r in D.dedup_keep_canonical(docs, pairs, id_col="doc_id").collect()
    )
    # 2, 5, 8 dropped (non-canonical members); everything else kept
    assert kept == [0, 1, 3, 4, 6, 7, 9]


def test_cc_idempotent_on_own_output(spark):
    """Running connected_components on its own (id, component) assignment
    pairs returns the same assignment — the fixed point of the clustering."""
    edges = [(1, 2), (2, 3), (9, 8), (7, 8)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    first = D.connected_components(pairs, id_out="id")
    again = D.connected_components(
        first.select(F.col("id").alias("doc_a"), F.col("component").alias("doc_b"))
    )
    assert {
        (r["id"], r["component"]) for r in again.collect()
    } == {(r["id"], r["component"]) for r in first.collect()}


def test_fuzzy_value_pairs_finds_near_values(spark):
    """Edit-distance dictionary matching: 1-2 edit pairs found regardless of
    where the edit falls (complete length-band blocking), exact matches
    excluded, counts carried."""
    from vettore_spark.operators.dedup import fuzzy_value_pairs

    df = spark.createDataFrame(
        [(1, "red rod"), (2, "red rod"), (3, "new rod"), (4, "red ring"),
         (5, "anvil"), (6, "xanvil")],
        ["id", "name"],
    )
    rows = fuzzy_value_pairs(df, value_col="name", max_distance=2).collect()
    got = {(r["val_a"], r["val_b"]): (r["dist"], r["n_a"], r["n_b"]) for r in rows}
    # first-char edit found (would be lost under first-char blocking)
    assert got[("new rod", "red rod")] == (2, 1, 2)
    assert got[("anvil", "xanvil")] == (1, 1, 1)
    # exact duplicates are NOT pairs (that's exact dedup's job)
    assert all(a != b for a, b in got)
    # distance > max excluded
    assert ("anvil", "red rod") not in got
