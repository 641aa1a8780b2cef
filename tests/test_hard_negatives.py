"""Hard-negative mining tests: exclusion correctness vs a NumPy oracle."""

from __future__ import annotations

import numpy as np
import pytest

from vettore_spark.operators import pipeline as PL


@pytest.fixture(scope="module")
def setup(spark):
    rng = np.random.default_rng(11)
    base = rng.normal(size=(30, 6))
    # make ids 1 and 2 near-duplicates of id 0 (tiny perturbations)
    base[1] = base[0] + rng.normal(scale=1e-3, size=6)
    base[2] = base[0] + rng.normal(scale=1e-3, size=6)
    coll = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(base)],
        ["vec_id", "embedding"],
    ).cache()
    queries = spark.createDataFrame(
        [(0, [float(x) for x in base[0]])], ["query_id", "query_vector"]
    )
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2)], ["id_a", "id_b"]
    )
    return coll, queries, pairs, base


def test_excludes_self_and_neardups(setup):
    coll, queries, pairs, base = setup
    rows = PL.hard_negative_mining(
        coll, queries, pairs, k=5, candidates=10, metric="cosine"
    ).collect()
    ids = [r["vec_id"] for r in rows]
    assert 0 not in ids and 1 not in ids and 2 not in ids
    assert len(ids) == 5
    assert [r["neg_rank"] for r in sorted(rows, key=lambda r: r["neg_rank"])] == [
        1, 2, 3, 4, 5,
    ]


def test_negatives_are_nearest_non_excluded(setup):
    coll, queries, pairs, base = setup
    rows = PL.hard_negative_mining(
        coll, queries, pairs, k=3, candidates=15, metric="cosine"
    ).collect()
    got = [r["vec_id"] for r in sorted(rows, key=lambda r: r["neg_rank"])]
    m = base / np.linalg.norm(base, axis=1, keepdims=True)
    sims = m @ m[0]
    order = [
        i
        for i in np.lexsort((np.arange(len(sims)), 1.0 - sims))
        if i not in (0, 1, 2)
    ]
    assert got == order[:3]


def test_symmetric_pair_exclusion(setup):
    """Exclusion applies regardless of pair orientation (id_a/id_b order)."""
    coll, queries, _, base = setup
    spark = coll.sparkSession
    flipped = spark.createDataFrame([(1, 0), (2, 0)], ["id_a", "id_b"])
    rows = PL.hard_negative_mining(
        coll, queries, flipped, k=5, candidates=10, metric="cosine"
    ).collect()
    ids = {r["vec_id"] for r in rows}
    assert ids.isdisjoint({0, 1, 2})
