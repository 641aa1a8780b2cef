"""Keyed persist-with-reuse for derived index tables.

The reference's residency model builds derived index state once at insert
time and serves every subsequent search from it (HNSW graph inserts at
native/vettore/src/hnsw.rs:152-245, flat mirror at flat.rs:59-66; the store
is the single canonical copy and the index is derived — SURVEY §4 P12).
The Spark analogue is a persisted derived DataFrame (shingle tables, HNSW
graph shards, IVF cell assignments, MUVERA FDEs) reused across operator
invocations over the same source.

A bare `.persist()` per invocation cannot provide that reuse when the
derived plan contains a non-deterministic expression (e.g. the `_pin`
column that blocks collapsing a projection into an unsplittable scan):
Spark's CacheManager canonicalizes plans, but two invocations produce two
distinct non-deterministic expression ids, so every call would LEAK a new
copy into storage memory. This registry instead keys the persisted result
by the SOURCE plan's `semanticHash()` plus the operator parameters:
repeated invocations over a semantically-equal source share one
materialized table, and LRU-evicted entries are explicitly unpersisted.

Scale note: on a long-lived cluster this is exactly the "resident index"
pattern — the persisted table lives in executor storage memory (spilling
to disk per StorageLevel), and rebuilds happen only when the canonical
source plan changes.
"""

from __future__ import annotations

from collections import OrderedDict
from collections.abc import Callable

from pyspark.sql import DataFrame

_PERSIST_CACHE: OrderedDict = OrderedDict()
# Sized for the full headline workload: every derived-index family (shingle
# base/postings, minhash signatures, LSH buckets, simhash words, IVF/PQ
# assignments, HNSW shards, MUVERA FDEs) keeps its entry resident without
# evicting another family's. Entries are small relative to executor storage
# (derived tables, not raw corpus); StorageLevel spills under pressure, so a
# larger registry trades disk for rebuild compute — the right trade at scale.
# 64: the round-2 additions (charlm trigrams, curation survivor set, gram
# postings) pushed the full headline workload past 32 distinct entries,
# and LRU eviction mid-bench silently re-derives an evicted family.
_PERSIST_CACHE_MAX = 64


def cached_persist(
    src: DataFrame, key_params: tuple, build: Callable[[DataFrame], DataFrame]
) -> DataFrame:
    """Return `build(src).persist()`, reusing the previously persisted result
    when an entry with the same (src.semanticHash(), *key_params) key exists
    and its recorded source is semantically equal to `src`.

    `key_params` must capture every parameter that changes `build`'s output
    (operator name, column names, sizes, seeds) — the source hash alone only
    identifies the input plan.
    """
    key = None
    try:
        key = (src.semanticHash(), *key_params)
        hit = _PERSIST_CACHE.get(key)
        if hit is not None and hit[0].sameSemantics(src):
            _PERSIST_CACHE.move_to_end(key)
            return hit[1]
    except Exception:  # stopped session / unanalyzable plan -> no caching
        key = None
    out = build(src).persist()
    if key is not None:
        _PERSIST_CACHE[key] = (src, out)
        while len(_PERSIST_CACHE) > _PERSIST_CACHE_MAX:
            _, (_, old) = _PERSIST_CACHE.popitem(last=False)
            try:
                old.unpersist()
            except Exception:  # noqa: BLE001 — session already gone
                pass
    return out


def invalidate_source(src: DataFrame) -> int:
    """Unpersist and drop every entry whose RECORDED source is semantically
    equal to `src`; returns how many were dropped.

    The semantic-hash keying has one blind spot this hook exists for:
    appending files to a parquet path does NOT change the plan — a re-read
    of the same path after an append is sameSemantics-equal to the
    pre-append read, so a derived table persisted from the old rows would
    silently keep serving them. Mutation owners (Collection.put_many /
    delete rebind the canonical rows over the SAME store path) must call
    this with the post-mutation DataFrame; the semantic equality that
    causes the staleness is exactly what lets this call find and evict the
    stale entries."""
    try:
        h = src.semanticHash()
    except Exception:  # noqa: BLE001 — src unanalyzable: nothing to match
        return 0
    n = 0
    stale = []
    # keys carry the recorded source's semanticHash as element 0, so one
    # hash call prefilters the scan — the per-mutation cost is O(1) py4j
    # round trips, not one sameSemantics per entry
    for key, (recorded, out) in _PERSIST_CACHE.items():
        if key[0] != h:
            continue
        try:
            if recorded.sameSemantics(src):
                stale.append((key, out))
        except Exception:  # noqa: BLE001 — dead session entry: evict
            stale.append((key, out))
    for key, out in stale:
        _PERSIST_CACHE.pop(key, None)
        try:
            out.unpersist()
        except Exception:  # noqa: BLE001
            pass
        n += 1
    return n


def clear() -> None:
    """Unpersist and drop every cached entry (test isolation helper)."""
    while _PERSIST_CACHE:
        _, (_, old) = _PERSIST_CACHE.popitem(last=False)
        try:
            old.unpersist()
        except Exception:  # noqa: BLE001
            pass
