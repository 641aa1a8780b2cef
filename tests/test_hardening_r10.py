"""Round-10 hardening: the r9 advice items — cached_persist entries
built over an EMPTY source directory must stay evictable (a frozenset()
leaf fingerprint permanently escaped rule-2 eviction), and the scratch
lock claim must be re-verified after every acquisition path (the
3-process reclaim race)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def test_empty_dir_build_stays_evictable(spark, tmp_path):
    """r9 advice (plans/cache.py): an entry built while the recorded
    source's inputFiles() was empty (store dir before its first append)
    used to record frozenset() and permanently escape leaf-overlap
    eviction — a derived table cached over an empty collection kept
    serving zero rows after a store append. The _ANY_LEAF sentinel must
    make that entry match the post-append invalidation."""
    from vettore_spark.plans import cache as PC

    PC.clear()
    d = str(tmp_path / "emptystore")
    os.makedirs(d)
    src = spark.read.schema("id long").parquet(d)
    first = PC.cached_persist(src, ("r10-ids",), lambda s: s.select("id"))
    assert first.count() == 0

    spark.range(4).select("id").write.mode("append").parquet(d)
    src2 = spark.read.schema("id long").parquet(d)
    assert PC.invalidate_source(src2) >= 1, (
        "empty-at-build entry escaped leaf-overlap eviction"
    )
    fresh = PC.cached_persist(src2, ("r10-ids",), lambda s: s.select("id"))
    assert fresh.count() == 4
    PC.clear()


def test_inmemory_build_still_pins_as_never_stale(spark, tmp_path):
    """The other side of the sentinel: a genuinely in-memory plan
    (createDataFrame -> LogicalRDD, zero input files FOREVER) must keep
    its empty fingerprint — a path mutation elsewhere must NOT evict it,
    or every store append would thrash unrelated resident tables."""
    from vettore_spark.plans import cache as PC

    PC.clear()
    mem = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    built = PC.cached_persist(mem, ("r10-mem",), lambda s: s.select("id"))
    assert built.count() == 2

    # the OTHER in-memory leaf shape: an inline VALUES table analyzes to
    # LocalRelation — whose toString CONTAINS the substring "Relation ["
    # that marks file relations; the classifier must not be fooled
    vals = spark.sql("SELECT * FROM VALUES (1, 'a'), (2, 'b') AS t(id, v)")
    built2 = PC.cached_persist(vals, ("r10-values",), lambda s: s.select("id"))
    assert built2.count() == 2

    d = str(tmp_path / "otherstore")
    spark.range(3).select("id").write.parquet(d)
    other = spark.read.parquet(d)
    assert PC.invalidate_source(other) == 0, (
        "in-memory entry evicted by an unrelated path mutation"
    )
    PC.clear()
