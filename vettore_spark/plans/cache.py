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


# Sentinel leaf fingerprint for plans whose file set could not be pinned
# down at build time: a path-backed scan whose directory was EMPTY when
# the entry was built (a store dir before its first append), or a plan
# inputFiles() could not analyze. A literal frozenset() there would
# PERMANENTLY escape rule-2 eviction — a derived table cached over an
# empty collection would keep serving zero rows after a store append —
# so these entries instead match EVERY leaf-overlap invalidation.
_ANY_LEAF = "<unpinned-leaves>"


def _leaf_dirs(src: DataFrame) -> frozenset[str]:
    """Normalized parent directories of every file the plan reads — the
    leaf-scan fingerprint used for mutation eviction. Empty ONLY for
    genuinely in-memory (createDataFrame / LogicalRDD) plans, which cannot
    go stale through a path append; a file-relation plan that currently
    reads zero files (empty source dir at build time) gets the _ANY_LEAF
    sentinel instead, so it stays evictable."""
    try:
        files = src.inputFiles()
    except Exception:  # noqa: BLE001 — streaming/unanalyzable plan
        return frozenset({_ANY_LEAF})
    if not files:
        # zero files is ambiguous: LocalRelation/LogicalRDD (safe to pin
        # as never-stale) vs a file relation over a dir that was empty at
        # build time (MUST stay evictable). Polarity matters: pin as
        # never-stale ONLY when every analyzed-plan leaf is a KNOWN
        # in-memory node; any other zero-file plan — v1 `Relation`, DSv2
        # `RelationV2`, `HiveTableRelation`, whatever a future source
        # prints as — defaults to the evict-always sentinel. A false
        # sentinel merely costs a rebuild; a false pin would reopen the
        # serve-stale-rows-after-append hole silently for every non-v1
        # read path added later.
        _INMEM_LEAVES = {"LocalRelation", "LogicalRDD", "OneRowRelation", "Range"}
        try:
            leaves = src._jdf.queryExecution().analyzed().collectLeaves()
            for i in range(leaves.size()):
                if leaves.apply(i).nodeName() not in _INMEM_LEAVES:
                    return frozenset({_ANY_LEAF})
        except Exception:  # noqa: BLE001 — can't tell: stay evictable
            return frozenset({_ANY_LEAF})
        return frozenset()
    dirs = set()
    for f in files:
        d = f.rsplit("/", 1)[0] if "/" in f else f
        if d.startswith("file://"):
            d = d[len("file://"):] or "/"
        elif d.startswith("file:"):
            d = d[len("file:"):] or "/"
        dirs.add(d)
    return frozenset(dirs)


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
        # miss path only: one inputFiles() listing per BUILD (not per hit)
        # records which directories the source plan reads, so a mutation of
        # any of them can find this entry even though the recorded plan is
        # a derived projection, not the mutated collection's df itself
        _PERSIST_CACHE[key] = (src, out, _leaf_dirs(src))
        while len(_PERSIST_CACHE) > _PERSIST_CACHE_MAX:
            _, (_, old, _) = _PERSIST_CACHE.popitem(last=False)
            try:
                old.unpersist()
            except Exception:  # noqa: BLE001 — session already gone
                pass
    return out


def invalidate_source(src: DataFrame, *, leaf_overlap: bool = True) -> int:
    """Unpersist and drop every entry that could serve pre-mutation rows
    after `src`'s backing files changed; returns how many were dropped.

    The semantic-hash keying has one blind spot this hook exists for:
    appending files to a parquet path does NOT change the plan — a re-read
    of the same path after an append is sameSemantics-equal to the
    pre-append read, so a derived table persisted from the old rows would
    silently keep serving them. Mutation owners (Collection.put_many /
    delete rebind the canonical rows over the SAME store path) must call
    this with the post-mutation DataFrame.

    Two match rules, both required:
    1. recorded source sameSemantics-equal to `src` (hash-prefiltered, so
       the common case costs O(1) py4j round trips) — catches entries
       keyed directly on the collection's df;
    2. recorded source READS any directory `src` reads (leaf-dir overlap,
       pure-Python set math against the dirs snapshotted at build time) —
       catches entries whose recorded plan is a DERIVED projection /
       repartition of the df (shingle tables, kNN edge persists): those
       plans stay sameSemantics-equal across the append without ever
       being equal to the df itself, the staleness class rule 1 alone
       misses.

    Pass `leaf_overlap=False` when the mutation REBINDS the plan instead
    of changing files under a stable path (in-memory collections): there
    rule 2's staleness class cannot occur — old derived entries become
    unreachable misses, not stale hits — and evicting every entry that
    shares a read-only source parquet would thrash unrelated operators'
    resident tables."""
    try:
        h = src.semanticHash()
    except Exception:  # noqa: BLE001 — src unanalyzable: nothing to match
        return 0
    src_dirs = _leaf_dirs(src) if leaf_overlap else frozenset()
    n = 0
    stale = []
    for key, (recorded, out, dirs) in _PERSIST_CACHE.items():
        if src_dirs and (_ANY_LEAF in dirs or not src_dirs.isdisjoint(dirs)):
            # _ANY_LEAF: the entry's file set was unpinnable at build time
            # (empty source dir / unanalyzable plan) — conservatively treat
            # it as overlapping every path mutation rather than never
            stale.append((key, out))
            continue
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
        _, (_, old, _) = _PERSIST_CACHE.popitem(last=False)
        try:
            old.unpersist()
        except Exception:  # noqa: BLE001
            pass
