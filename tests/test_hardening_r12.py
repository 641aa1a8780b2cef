"""Round-12 hardening pins.

1. The multi-micro-batch stream source (r11 verdict #5): the splitter
   must produce n contiguous ascending key-range files with strictly
   ascending mtimes — the ordering contract the first-wins dedup gate's
   oracle equality depends on (FileStreamSource admits oldest-first).
2. The reworked streaming gates must actually replay MULTIPLE
   micro-batches (an ignored maxFilesPerTrigger would silently degrade
   the gates back to single-batch replay while still passing oracles).
3. The moment gate's final-emission projection (max_by on n) must equal
   the batch fixed-point twin bit-for-bit.
4. compact_store recompute (r11 verdict #7): after compaction deletes
   the pre-compaction parquet files, forcing eviction of every cached
   artifact must leave searches able to lazily REBUILD from the
   compacted rows — the r11 fix is pinned on the invalidation call;
   this pins the recovery path it enables.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_multibatch_stream_source_split_and_ordered(spark):
    from vettore_spark import queries as Q

    path = Q._streaming_table_dir_multi(spark, SF, "documents", "doc_id")
    files = sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
    assert len(files) == 4, files
    mtimes = [os.path.getmtime(os.path.join(path, f)) for f in files]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == 4, (
        "mtimes must be strictly ascending — FileStreamSource's "
        "oldest-first admission is the batch-order contract"
    )
    # contiguous ascending doc_id ranges: file i's max < file i+1's min
    prev_max = None
    n_total = 0
    for f in files:
        lo, hi, n = (
            spark.read.parquet(os.path.join(path, f))
            .agg(F.min("doc_id"), F.max("doc_id"), F.count("*"))
            .first()
        )
        n_total += n
        if n == 0:
            continue
        if prev_max is not None:
            assert lo > prev_max, (files, lo, prev_max)
        prev_max = hi
    want = spark.read.parquet(os.path.join(SF, "documents.parquet")).count()
    assert n_total == want, "split lost or duplicated rows"


def test_kmv_gate_replays_multiple_microbatches(spark):
    from vettore_spark import queries as Q

    Q.q_streaming_kmv_distinct(spark, SF).count()
    raw = spark.table("streaming_kmv_distinct_sink")
    groups = raw.select("event_type").distinct().count()
    emissions = raw.count()
    assert groups > 0
    assert emissions > groups, (
        f"{emissions} emissions over {groups} groups — update mode emits "
        "once per (group, micro-batch); equality means the replay "
        "collapsed to a single batch (maxFilesPerTrigger ignored)"
    )


def test_moment_gate_final_projection_matches_batch(spark):
    from vettore_spark import queries as Q
    from vettore_spark.encodings import moments as M

    got = {
        r["label"]: (r["n"], r["mean_norm"], r["var_trace"])
        for r in Q.q_streaming_moment_stats(spark, SF).collect()
    }
    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet")).select(
        "label", "embedding"
    )
    want = {
        r["label"]: (r["n"], round(r["mean_norm"], 5), round(r["var_trace"], 5))
        for r in M.moment_stats_fixed(
            emb, group_col="label", vector_col="embedding", dim=64
        ).collect()
    }
    assert got == want
    # and the projection really had multiple emissions per group to choose
    raw = spark.table("streaming_moment_stats_sink")
    assert raw.count() > raw.select("label").distinct().count()


def test_compact_store_recompute_after_eviction(spark, tmp_path):
    """compact_store deletes the pre-compaction parquet files; resident
    index state and plan-cache persists held lineage over those paths
    (r11 fix: invalidate at compact). Force total cache eviction after
    compaction and prove the exact AND index paths lazily rebuild from
    the compacted rows — no FileNotFoundException, tombstoned id gone."""
    from vettore_spark.collection import Collection
    from vettore_spark.sources.store import ParquetStore

    def _persisted_ids():
        m = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in m.keySet().toArray()}

    before = _persisted_ids()
    c = Collection.create(spark, "r12compact", 4, metric="cosine")
    c.attach_store(ParquetStore(str(tmp_path / "st")))
    rows = [
        {"id": f"v{i}", "vector": [1.0 + 0.01 * i, float(i % 3), 0.5, 0.25]}
        for i in range(32)
    ]
    c.put_many(rows)
    target = [1.0, 0.0, 0.5, 0.25]
    # build a resident IVF over the PRE-compaction files
    pre = {r["id"] for r in c.ivf_search(target, limit=5, n_cells=2).collect()}
    assert pre
    c.delete("v0")
    c.compact_store()
    # simulate LRU eviction / executor loss for THIS collection's blocks:
    # unpersist every RDD persisted since the test began (the collection's
    # ingest caches and IVF assignment persists), so any surviving lineage
    # over the deleted files MUST recompute. Scoped to new RDD ids — a
    # global clearCache would nuke the shared session's memoized source
    # tables and break unrelated plan-shape pins in the same session.
    m = spark.sparkContext._jsc.getPersistentRDDs()
    for k in m.keySet().toArray():
        if int(k) not in before:
            m.get(k).unpersist()
    got = {r["id"] for r in c.search(target, limit=5).collect()}
    assert got and "v0" not in got
    got_ivf = {
        r["id"] for r in c.ivf_search(target, limit=5, n_cells=2).collect()
    }
    assert got_ivf and "v0" not in got_ivf
    assert c.count() == 31
