"""Round-6 hardening: the r5 advisor's store-lifecycle findings.

1. (high) delete-then-reinsert into a store-attached collection must not
   silently lose the acknowledged write behind the tombstone overlay.
2. (medium) compact_store must never hold less than one complete on-disk
   copy of the canonical rows (ParquetStore.replace sibling-dir swap).
3. (low) attaching a conforming Store WITHOUT exists() must adopt it as
   fresh, not crash on its empty-read.
"""

from __future__ import annotations

import os

import pytest

from vettore_spark.collection import Collection
from vettore_spark.sources.store import MemoryStore, ParquetStore


def _vec(seed: int, dims: int = 8) -> list[float]:
    return [((seed * 31 + i * 7) % 13) - 6.0 or 1.0 for i in range(dims)]


def test_reinsert_of_tombstoned_id_refused_then_ok_after_compact(
    spark, tmp_path
):
    """Re-inserting a deleted id before compaction must RAISE (the append
    would be permanently hidden by the overlay anti-filter and then
    discarded by compaction — silent data loss); after compact_store()
    the same insert must succeed and be visible."""
    c = Collection.create(spark, "tomb", 8, metric="l2")
    c.attach_store(str(tmp_path / "canon"))
    c.put_many([{"id": f"d{i}", "vector": _vec(i)} for i in range(6)])
    c.delete("d3")
    assert c.get("d3") is None

    with pytest.raises(ValueError, match="tombstoned.*compact_store"):
        c.put_many([{"id": "d3", "vector": _vec(99)}])
    # the refused batch must leave storage untouched
    assert c.count() == 5
    assert c.get("d3") is None

    c.compact_store()
    c.put_many([{"id": "d3", "vector": _vec(99)}])
    got = c.get("d3")
    assert got is not None
    assert got["vector"] == pytest.approx(_vec(99))
    assert c.count() == 6
    # and the row survives a further compaction cycle
    c.delete("d5")
    c.compact_store()
    assert c.get("d3") is not None
    assert c.count() == 5


def test_parquet_store_replace_is_sibling_dir_swap(spark, tmp_path):
    """replace() must commit the full new copy to a sibling directory
    before touching the live one, leave no scratch dirs behind, and
    produce exactly the new contents — even when the new DataFrame's
    lineage reads the store's own path (the compaction shape)."""
    path = str(tmp_path / "store")
    st = ParquetStore(path)
    df = spark.createDataFrame([(i, i * 2) for i in range(10)], "id int, v int")
    st.overwrite(df)

    from pyspark.sql import functions as F

    st.replace(st.read(spark).filter(F.col("id") < 5))
    assert sorted(r["id"] for r in st.read(spark).collect()) == list(range(5))
    assert not os.path.isdir(st._tmp)
    assert not os.path.isdir(st._old)


def test_parquet_store_recovers_from_interrupted_replace(spark, tmp_path):
    """Crash between the two renames (live dir gone, retired copy
    present): constructing the store again must restore the retired
    copy — the last committed state."""
    path = str(tmp_path / "store")
    st = ParquetStore(path)
    df = spark.createDataFrame([(i,) for i in range(7)], "id int")
    st.overwrite(df)
    # simulate the crash window: live dir renamed away, new copy lost
    os.rename(path, st._old)
    assert not os.path.isdir(path)

    st2 = ParquetStore(path)
    assert st2.exists()
    assert st2.read(spark).count() == 7
    assert not os.path.isdir(st2._old)


def test_compact_store_leaves_single_complete_copy(spark, tmp_path):
    """compact_store on a ParquetStore routes through replace(): after
    it, storage holds exactly the surviving rows and no scratch dirs."""
    c = Collection.create(spark, "compacted", 8, metric="l2")
    path = str(tmp_path / "canon")
    c.attach_store(path)
    c.put_many([{"id": f"x{i}", "vector": _vec(i)} for i in range(8)])
    c.delete("x1")
    c.delete("x2")
    c.compact_store()
    assert c.count() == 6
    # storage itself (not just the overlay view) holds 6 rows
    assert spark.read.parquet(path).count() == 6
    st = c._store
    assert not os.path.isdir(st._tmp)
    assert not os.path.isdir(st._old)


def test_attach_fresh_memory_store_without_exists(spark):
    """A conforming Store implementation has no exists(); attaching a
    brand-new one must adopt it as EMPTY (and route subsequent ingest
    through it), not surface its empty-read error."""
    c = Collection.create(spark, "memstore", 8, metric="l2")
    st = MemoryStore()
    c.attach_store(st)
    c.put_many([{"id": "a", "vector": _vec(1)}])
    assert c.count() == 1
    assert st.read(spark).count() == 1  # ingest landed in the store

    # attaching a POPULATED exists()-less store adopts its rows
    c2 = Collection.create(spark, "memstore2", 8, metric="l2")
    c2.attach_store(MemoryStore(st.read(spark)))
    assert c2.count() == 1
