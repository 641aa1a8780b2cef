"""HNSW approximate nearest-neighbor search, Spark-partition-parallel.

Re-implements the reference's HNSW semantics (native/vettore/src/hnsw.rs) in
NumPy/Python and distributes it per-partition:

- params + bounds: m<=1024, m0 in [m, 2048], ef_construction in [m, 1e6],
  ef_search <= 1e6, max_level <= 64; defaults m=16 m0=32 ef_c=100 ef_s=64
  max_level=12 (lib/vettore/index/hnsw.ex:13-26, hnsw.rs:23-50)
- DETERMINISTIC level from an FNV-1a hash of the external id — two low bits
  zero -> climb a level (hnsw.rs:473-481, 490-497). No RNG, so rebuilds are
  reproducible across partitions (SURVEY §4 P9).
- insert: greedy descent through upper layers, ef_construction beam per
  layer, (dist, id)-sorted truncation to m/m0, reciprocal linking + pruning
  (hnsw.rs:152-245, prune :437-465)
- search: greedy descent to layer 1, layer-0 beam with max(ef_search, k),
  order by (rank_dist, external_id), raw metric recomputed for output
  (hnsw.rs:292-333); metrics l2/cosine/inner_product only

Distribution model (SURVEY §2.7 Q6 option b): the collection is
hash-partitioned by id; each partition builds an independent graph and
answers every query locally; a global (rank, id) top-k merge follows. Recall
differs from a single graph and is validated against the exact oracle via
overlap@k — the reference's own pattern for approximate modes
(bench/search_modes_bench.exs:193-238).

Scale: graph build is O(n log n)-ish per partition and embarrassingly
parallel; queries are broadcast once per batch, so the shuffle is only
O(num_queries * k). For repeated query batches against a static collection,
persist the partitioned collection DataFrame so partition membership (and
thus the graphs) stay stable.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_HNSW_METRICS = ("l2", "cosine", "inner_product")


@dataclass(frozen=True)
class HnswParams:
    m: int = 16
    m0: int = 32
    ef_construction: int = 100
    ef_search: int = 64
    max_level: int = 12

    def __post_init__(self):
        if not (0 < self.m <= 1024):
            raise ValueError("m must be in (0, 1024]")
        if not (self.m <= self.m0 <= 2048):
            raise ValueError("m0 must be in [m, 2048]")
        if not (self.m <= self.ef_construction <= 1_000_000):
            raise ValueError("ef_construction must be in [m, 1e6]")
        if not (0 < self.ef_search <= 1_000_000):
            raise ValueError("ef_search must be in (0, 1e6]")
        if not (0 <= self.max_level <= 64):
            raise ValueError("max_level must be in [0, 64]")


def fnv1a64(data: bytes) -> int:
    """FNV-1a 64-bit (public algorithm; used for level assignment parity
    with hnsw.rs:490-497)."""
    h = 0xCBF29CE484222325
    for b in data:
        h ^= b
        h = (h * 0x00000100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def level_for(external_id: str, max_level: int) -> int:
    """Deterministic layer: consume two bits per level while both are zero
    (hnsw.rs:473-481)."""
    h = fnv1a64(str(external_id).encode())
    level = 0
    while level < max_level and (h & 0b11) == 0:
        level += 1
        h >>= 2
    return level


class HnswGraph:
    """Single-machine HNSW graph (one Spark partition's shard)."""

    def __init__(self, metric: str = "cosine", params: HnswParams | None = None):
        if metric not in _HNSW_METRICS:
            raise ValueError(f"hnsw supports {_HNSW_METRICS}, got {metric!r}")
        self.metric = metric
        self.params = params or HnswParams()
        self.vectors: list[np.ndarray] = []
        self.ext_ids: list = []
        self.levels: list[int] = []
        self.connections: list[list[list[int]]] = []  # node -> layer -> ids
        self.entry: int | None = None
        self.deleted: set[int] = set()  # tombstoned internal ids

    # -- distances ----------------------------------------------------------

    def _raw(self, a: np.ndarray, b: np.ndarray) -> float:
        if self.metric == "l2":
            d = a - b
            return float(np.sqrt(d @ d))
        return float(a @ b)  # cosine (pre-normalized) and inner_product: dot

    def _rank(self, a: np.ndarray, b: np.ndarray) -> float:
        raw = self._raw(a, b)
        if self.metric == "cosine":
            return 1.0 - raw
        if self.metric == "inner_product":
            return -raw
        return raw

    # -- build --------------------------------------------------------------

    def insert(self, external_id, vector) -> None:
        v = np.asarray(vector, dtype=np.float64)
        nid = len(self.vectors)
        lvl = level_for(external_id, self.params.max_level)
        self.vectors.append(v)
        self.ext_ids.append(external_id)
        self.levels.append(lvl)
        self.connections.append([[] for _ in range(lvl + 1)])

        if self.entry is None:
            self.entry = nid
            return

        entry = self.entry
        top = self.levels[entry]
        for layer in range(top, lvl, -1):
            entry = self._greedy_closest(entry, v, layer)

        for layer in range(min(lvl, top), -1, -1):
            cands = self._search_layer(entry, v, layer, self.params.ef_construction)
            cands.sort(key=lambda t: (t[0], t[1]))
            limit = self.params.m0 if layer == 0 else self.params.m
            cands = cands[:limit]
            self.connections[nid][layer] = [cid for _, cid in cands]
            if cands:
                entry = cands[0][1]

        # reciprocal links + prune (new node exists before pruning)
        for layer, neighbors in enumerate(self.connections[nid]):
            for nb in neighbors:
                if layer < len(self.connections[nb]) and nid not in self.connections[nb][layer]:
                    self.connections[nb][layer].append(nid)
                self._prune(nb, layer)

        if lvl > self.levels[self.entry]:
            self.entry = nid

    def _prune(self, nid: int, layer: int) -> None:
        limit = self.params.m0 if layer == 0 else self.params.m
        if layer >= len(self.connections[nid]):
            return
        conns = self.connections[nid][layer]
        if len(conns) <= limit:
            return
        v = self.vectors[nid]
        scored = sorted(
            ((self._rank(v, self.vectors[c]), c) for c in conns),
            key=lambda t: (t[0], t[1]),
        )
        self.connections[nid][layer] = [c for _, c in scored[:limit]]

    def _greedy_closest(self, start: int, q: np.ndarray, layer: int) -> int:
        best = start
        best_d = self._rank(q, self.vectors[start])
        improved = True
        while improved:
            improved = False
            for nb in self.connections[best][layer] if layer < len(self.connections[best]) else []:
                d = self._rank(q, self.vectors[nb])
                if d < best_d or (d == best_d and nb < best):
                    best, best_d, improved = nb, d, True
        return best

    def _search_layer(
        self, entry: int, q: np.ndarray, layer: int, ef: int
    ) -> list[tuple[float, int]]:
        """Beam search on one layer; returns [(rank_dist, node_id)]."""
        d0 = self._rank(q, self.vectors[entry])
        visited = {entry}
        candidates = [(d0, entry)]  # min-heap
        results = [(-d0, entry)]  # max-heap (bounded by ef)
        while candidates:
            d, node = heapq.heappop(candidates)
            if d > -results[0][0]:
                break
            for nb in (
                self.connections[node][layer]
                if layer < len(self.connections[node])
                else []
            ):
                if nb in visited:
                    continue
                visited.add(nb)
                nd = self._rank(q, self.vectors[nb])
                if len(results) < ef or nd < -results[0][0]:
                    heapq.heappush(candidates, (nd, nb))
                    heapq.heappush(results, (-nd, nb))
                    if len(results) > ef:
                        heapq.heappop(results)
        return [(-nd, node) for nd, node in results]

    def delete(self, external_id) -> bool:
        """Delete with entry replacement (hnsw.rs:263-289): tombstone the
        node, strip every incoming edge (making it unreachable), and if it
        was the entry point promote the highest-layer surviving node
        (smallest external id on ties). Returns False when the id is not
        present. O(edges) — the incremental maintenance path; no rebuild."""
        dead = getattr(self, "deleted", None)
        if dead is None:
            dead = self.deleted = set()
        nid = next(
            (
                i
                for i, e in enumerate(self.ext_ids)
                if e == external_id and i not in dead
            ),
            None,
        )
        if nid is None:
            return False
        dead.add(nid)
        self.connections[nid] = [[] for _ in self.connections[nid]]
        for other, layers in enumerate(self.connections):
            if other in dead:
                continue
            for layer in range(len(layers)):
                layers[layer] = [c for c in layers[layer] if c != nid]
        if self.entry == nid:
            alive = [i for i in range(len(self.vectors)) if i not in dead]
            self.entry = (
                min(alive, key=lambda i: (-self.levels[i], str(self.ext_ids[i])))
                if alive
                else None
            )
        return True

    # -- query --------------------------------------------------------------

    def search(self, query, limit: int) -> list[tuple[object, float]]:
        """Returns [(external_id, raw_metric)] ordered by (rank, external_id)
        (hnsw.rs:292-333)."""
        if limit == 0 or self.entry is None:
            return []
        q = np.asarray(query, dtype=np.float64)
        entry = self.entry
        for layer in range(self.levels[entry], 0, -1):
            entry = self._greedy_closest(entry, q, layer)
        best = self._search_layer(
            entry, q, 0, max(self.params.ef_search, limit)
        )
        # tie-break by the NATIVE id, matching the global shard-merge
        # window's ordering (search_graph_shards sorts by the id column's
        # own type): a str() key here would cut numeric-id ties at the
        # shard-local limit in a different order than the merge expects
        # (str '10' < '9'), returning the wrong tie member. One graph
        # holds one id type, so native comparison is always defined.
        best.sort(key=lambda t: (t[0], self.ext_ids[t[1]]))
        out = []
        for _, nid in best[:limit]:
            out.append((self.ext_ids[nid], self._raw(q, self.vectors[nid])))
        return out


def build_graph_shards(
    coll: DataFrame,
    *,
    metric: str = "cosine",
    params: HnswParams | None = None,
    id_col: str = "id",
    vector_col: str = "vector",
    num_partitions: int | None = None,
) -> DataFrame:
    """Build the persisted HNSW index table: one row per shard holding the
    pickled graph for that shard's rows (hash-partitioned by id, inserted in
    sorted-id order, deterministic FNV-1a levels — so the table is a pure
    function of the collection, rebuildable like the reference's
    load_snapshot index rebuild, collection.ex:426-433).

    Built ONCE per (collection, params) via the keyed persist cache and
    reused by every subsequent `hnsw_search` — the reference's residency
    model, where `put` maintains the graph incrementally (hnsw.rs:152-245)
    and `search` only reads it. At scale the shard blob is O(rows_per_shard
    * (dims*8 + m*16)) and stays executor-resident; a search shuffles only
    O(num_queries * k) rows."""
    import pickle

    from vettore_spark.functions import kernels as K
    from vettore_spark.plans.cache import cached_persist

    p = params or HnswParams()
    m = K.canonical_metric(metric)
    src = coll.select(id_col, vector_col)

    def build(s: DataFrame) -> DataFrame:
        part = s
        if num_partitions is not None:
            part = part.repartition(num_partitions, F.col(id_col))

        def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from pyspark import TaskContext

            rows_id: list = []
            rows_vec: list = []
            for pdf in it:
                rows_id.extend(pdf[id_col].tolist())
                rows_vec.extend(
                    np.asarray(v, dtype=np.float64) for v in pdf[vector_col]
                )
            if not rows_id:
                return
            order = sorted(range(len(rows_id)), key=lambda i: str(rows_id[i]))
            g = HnswGraph(metric=m, params=p)
            for i in order:
                g.insert(rows_id[i], rows_vec[i])
            # shard_id = physical partition id: the stable routing key for
            # incremental maintenance (insert_into_graph_shards)
            pid = TaskContext.get().partitionId()
            yield pd.DataFrame({"shard_id": [pid], "shard": [pickle.dumps(g)]})

        return part.mapInPandas(run, "shard_id long, shard binary")

    return cached_persist(
        src,
        # EVERY params field is in the key (the cached_persist contract):
        # the pickled graphs embed ef_search as the search-time default,
        # so omitting it would silently serve a cache hit built with the
        # FIRST caller's beam width to a caller who asked for a wider one
        ("hnsw_shards", m, p.m, p.m0, p.ef_construction, p.ef_search,
         p.max_level, id_col, vector_col, num_partitions),
        build,
    )


def delete_from_graph_shards(shards: DataFrame, external_id) -> DataFrame:
    """Incremental index maintenance: patch the ONE shard holding
    `external_id` (tombstone + edge strip + entry replacement,
    HnswGraph.delete / hnsw.rs:263-289) and pass every other shard through
    untouched — no rebuild of any graph. Returns the patched shard table;
    at scale this is one narrow map over O(shards) rows instead of an
    O(n log n) per-shard reconstruction."""
    import pickle

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for blob in pdf["shard"]:
                g: HnswGraph = pickle.loads(bytes(blob))
                out.append(pickle.dumps(g) if g.delete(external_id) else blob)
            yield pd.DataFrame({"shard_id": pdf["shard_id"], "shard": out})

    return shards.mapInPandas(run, "shard_id long, shard binary")


def insert_into_graph_shards(
    shards: DataFrame, external_id, vector, *,
    shard_ids: list[int] | None = None, verify_target: bool = False,
) -> DataFrame:
    """Incremental index maintenance for put: insert the new vector into
    exactly ONE shard's graph (HnswGraph.insert — the reference's
    insert-time graph maintenance, hnsw.rs:152-245) and pass every other
    shard through untouched. The target shard is chosen deterministically
    by FNV-1a(external_id) over the existing shard ids, so repeated
    maintenance streams spread inserts uniformly without a global view.

    Search correctness does not depend on the routing (search scans every
    shard and merges by (rank, id)); routing only balances growth. Caller
    contract: `external_id` must not already exist in the index (Collection
    rejects duplicate ids at put time).

    Pass `shard_ids` (the known shard-id list, e.g. collected once at
    build time) to avoid the routing collect — without it every insert
    launches a Spark job, which on a lazily-checkpointed patch chain
    forces materialization before the put returns; with shard_ids omitted
    the list comes from the CURRENT table, so the routed target is
    present by construction. When you DO pass it, it MUST be the current
    table's exact shard-id set: the lazy patch cannot verify membership
    without the job this parameter exists to avoid, so an id routed to a
    shard absent from the table is silently LOST (note build_graph_shards
    emits no row for an empty partition — range(num_partitions) is NOT a
    valid list; the batched insert_many_into_graph_shards and the
    DataFrame variant both verify and raise on stale lists). Callers who
    hold a long-lived list and prefer safety over laziness pass
    `verify_target=True` to run the siblings' amortized presence check —
    one tiny filtered distinct-collect — before the lazy patch is built."""
    import pickle

    sids = (
        sorted(shard_ids)
        if shard_ids is not None
        else sorted(r["shard_id"] for r in shards.select("shard_id").collect())
    )
    if not sids:
        raise ValueError("cannot insert into an empty shard table")
    target = sids[fnv1a64(str(external_id).encode()) % len(sids)]
    if verify_target and shard_ids is not None:
        present = (
            shards.filter(F.col("shard_id") == int(target))
            .select("shard_id")
            .limit(1)
            .collect()
        )
        if not present:
            raise ValueError(
                f"shard_ids is stale: routed target shard {target} is not "
                "in the shard table — collect the id list from the CURRENT "
                "table (build_graph_shards emits no row for an empty "
                "partition, so range(num_partitions) is NOT a valid list)"
            )
    vec = np.asarray(vector, dtype=np.float64)

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for sid, blob in zip(pdf["shard_id"], pdf["shard"]):
                if int(sid) == target:
                    g: HnswGraph = pickle.loads(bytes(blob))
                    g.insert(external_id, vec)
                    out.append(pickle.dumps(g))
                else:
                    out.append(blob)
            yield pd.DataFrame({"shard_id": pdf["shard_id"], "shard": out})

    return shards.mapInPandas(run, "shard_id long, shard binary")


def insert_many_into_graph_shards(
    shards: DataFrame,
    rows: list[tuple[object, list[float]]],
    *,
    shard_ids: list[int] | None = None,
) -> DataFrame:
    """Batched incremental insert: route every (id, vector) to its
    deterministic target shard (same FNV-1a rule as the single-row
    `insert_into_graph_shards`) and patch ALL touched shards in ONE
    mapInPandas pass — a B-row ingest batch costs one job, not B. Rows
    are inserted per shard in sorted-id order (the build path's
    determinism rule), so the patched table is a pure function of
    (previous table, batch). Caller contract as the single-row path: ids
    must be new. Bounded-batch maintenance: the caller caps B
    (Collection.put_many patches only driver-small batches; a corpus-
    sized DataFrame ingest rebuilds instead — routing it would mean a
    driver collect, the scale failure mode)."""
    import pickle

    sids = (
        sorted(shard_ids)
        if shard_ids is not None
        else sorted(r["shard_id"] for r in shards.select("shard_id").collect())
    )
    if not sids:
        raise ValueError("cannot insert into an empty shard table")
    by_shard: dict[int, list[tuple[object, np.ndarray]]] = {}
    for rid, vec in rows:
        t = sids[fnv1a64(str(rid).encode()) % len(sids)]
        by_shard.setdefault(t, []).append(
            (rid, np.asarray(vec, dtype=np.float64))
        )
    for members in by_shard.values():
        members.sort(key=lambda m: str(m[0]))
    # routed batch rides in the task closure (like the single-row path's
    # captured vector), NOT a SparkContext.broadcast: a broadcast per
    # ingest batch is never destroyed and accumulates dead blocks on the
    # driver and every executor for the application lifetime — the closure
    # is bounded by the caller's batch cap and is GC'd with the plan
    routed = by_shard
    if not routed:
        return shards

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for sid, blob in zip(pdf["shard_id"], pdf["shard"]):
                members = routed.get(int(sid))
                if members:
                    g: HnswGraph = pickle.loads(bytes(blob))
                    for rid, vec in members:
                        g.insert(rid, vec)
                    out.append(pickle.dumps(g))
                else:
                    out.append(blob)
            yield pd.DataFrame({"shard_id": pdf["shard_id"], "shard": out})

    # only the TOUCHED shards make the JVM->Python->JVM round trip; the
    # rest pass through as a plain JVM-side filter. A typical ingest batch
    # touches a handful of a large shard table's rows, and shard blobs are
    # the big payload — shipping untouched ones through Arrow per batch is
    # pure waste (and was ~40% of the r6 hnsw_batch_insert_search cost).
    # Routing targets are known driver-side here (by_shard keys), so the
    # split is two isin filters over the persisted table, no extra job.
    touched = sorted(routed)
    # stale-shard_ids guard (the DF variant raises on this; the list path
    # must too): a routed target absent from the TABLE — e.g. a caller
    # passing range(num_partitions) while the build emitted no row for an
    # empty partition — would otherwise patch nothing and silently LOSE
    # the insert. One tiny distinct-collect over <= len(touched) rows of
    # the persisted table, amortized across the whole batch.
    present = {
        r["shard_id"]
        for r in shards.filter(F.col("shard_id").isin(touched))
        .select("shard_id")
        .distinct()
        .collect()
    }
    missing = [t for t in touched if t not in present]
    if missing:
        raise ValueError(
            f"shard_ids is stale: routed target shards {missing[:5]} are "
            "not in the shard table — collect the id list from the "
            "CURRENT table (build_graph_shards emits no row for an empty "
            "partition, so range(num_partitions) is NOT a valid list)"
        )
    patched = shards.filter(F.col("shard_id").isin(touched)).mapInPandas(
        run, "shard_id long, shard binary"
    )
    untouched = shards.filter(~F.col("shard_id").isin(touched))
    return patched.unionByName(untouched)


def insert_df_into_graph_shards(
    shards: DataFrame,
    new_rows: DataFrame,
    *,
    shard_ids: list[int],
    id_col: str = "id",
    vector_col: str = "vector",
) -> DataFrame:
    """DataFrame-sized incremental insert with NO driver collect: tag each
    new row with its deterministic FNV-1a target shard (the same routing
    rule as the list-batch paths, computed executor-side in an Arrow
    batch), cogroup (shards x routed rows) on shard_id, and insert each
    shard's members in sorted-id order (the build path's determinism
    rule). One cogroup job patches every touched shard and passes the
    rest through untouched — a corpus-sized ingest batch no longer forces
    a full O(n log n) shard rebuild, and the batch never rides the task
    closure or the driver.

    `shard_ids` is required (driver-small, known at build time): routing
    must see the COMPLETE shard-id list, and deriving it from `shards`
    here would mean the collect this function exists to avoid. Caller
    contract as the list paths: ids must be new to the index."""
    import pickle

    sids = sorted(shard_ids)
    if not sids:
        raise ValueError("cannot insert into an empty shard table")
    n_sids = len(sids)
    sid_np = np.asarray(sids, dtype=np.int64)

    @F.pandas_udf("long")
    def _route(ids: pd.Series) -> pd.Series:
        # Vectorized FNV-1a over the Arrow batch: view the fixed-width
        # unicode block as a codepoint matrix and fold column-by-column
        # with uint64 wraparound arithmetic — max_len iterations of
        # whole-column ops instead of a Python lambda per id. For ASCII
        # ids (every id the numeric/uuid paths produce) codepoints ==
        # utf-8 bytes, so the hash is bit-identical to fnv1a64(); any
        # non-ASCII or NUL-bearing batch falls back to the scalar rule
        # to preserve routing parity with the build path.
        s = ids.to_numpy(dtype="U")
        n = len(s)
        if n == 0:
            return pd.Series(np.empty(0, dtype=np.int64))
        width = s.dtype.itemsize // 4
        h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
        prime = np.uint64(0x00000100000001B3)
        # true pre-conversion lengths: numpy's fixed-width U conversion
        # silently DROPS trailing '\x00' characters (they read as
        # padding), so the converted block alone cannot tell "a" from
        # "a\x00" — compare against the original Series' lengths and
        # send any mismatch down the scalar path over the ORIGINAL
        # values, where the bytes are intact.
        orig_lens = ids.astype(str).str.len().to_numpy(dtype=np.int64)
        if width:
            codes = np.ascontiguousarray(s).view(np.uint32).reshape(n, width)
            lens = np.char.str_len(s)
            ascii_ok = int(codes.max()) < 128 and bool(
                (lens == (codes != 0).sum(axis=1)).all()
                and (lens == orig_lens).all()
            )
        else:
            codes = None
            # zero-width block: only truly-empty ids hash to the offset
            # basis; a "\x00" id (orig len 1) must take the scalar path
            ascii_ok = bool((orig_lens == 0).all())
        if ascii_ok:
            for j in range(width):
                c = codes[:, j].astype(np.uint64)
                m = c != 0
                if not m.any():
                    break
                h[m] = (h[m] ^ c[m]) * prime
        else:
            h = np.fromiter(
                (fnv1a64(str(x).encode("utf-8")) for x in ids),
                dtype=np.uint64,
                count=n,
            )
        return pd.Series(sid_np[(h % np.uint64(n_sids)).astype(np.int64)])

    # _nid keeps the column's ORIGINAL type (the graph's external ids and
    # the search output column must stay type-consistent with the build
    # path); only the routing hash reads the string rendering.
    routed = new_rows.select(
        F.col(id_col).alias("_nid"),
        F.col(vector_col).cast("array<double>").alias("_nvec"),
        _route(F.col(id_col).cast("string")).alias("shard_id"),
    )

    def patch(key, shard_pdf: pd.DataFrame, rows_pdf: pd.DataFrame) -> pd.DataFrame:
        if shard_pdf.empty:
            # routing only targets existing shard ids, so a rows-only key
            # means the caller passed a stale/incomplete shard_ids list
            raise ValueError(
                f"rows routed to unknown shard {key[0]}: shard_ids is stale"
            )
        if rows_pdf.empty:
            return shard_pdf
        out = []
        members = sorted(
            zip(rows_pdf["_nid"], rows_pdf["_nvec"]), key=lambda m: str(m[0])
        )
        for blob in shard_pdf["shard"]:
            g: HnswGraph = pickle.loads(bytes(blob))
            for rid, vec in members:
                g.insert(rid, np.asarray(vec, dtype=np.float64))
            out.append(pickle.dumps(g))
        return pd.DataFrame({"shard_id": shard_pdf["shard_id"], "shard": out})

    # only TOUCHED shards enter the cogroup: the cogroup shuffles its
    # inputs and round-trips every blob through Arrow/Python, so feeding
    # it shards with no incoming rows ships the big payload for nothing
    # (at scale a batch touches a sliver of the shard table). The target
    # set is computed ONCE per call with a distinct+collect — bounded by
    # the shard count (same scale as the shard_ids argument, NOT the
    # batch; the no-batch-collect contract stands), one extra map+agg
    # pass over the batch per ingest call, zero extra work per downstream
    # action. A broadcast-join split was measured instead and rejected:
    # its two join subqueries re-execute the Python routing stage on
    # every action (3 Python round trips/action vs 1 here). Rows routed
    # to a shard id absent from `shards` still surface as a rows-only
    # cogroup key and raise (the stale-shard_ids guard above).
    targets = sorted(
        r["shard_id"] for r in routed.select("shard_id").distinct().collect()
    )
    if not targets:
        return shards
    touched = shards.filter(F.col("shard_id").isin(targets))
    untouched = shards.filter(~F.col("shard_id").isin(targets))
    patched = (
        touched.groupby("shard_id")
        .cogroup(routed.groupby("shard_id"))
        .applyInPandas(patch, "shard_id long, shard binary")
    )
    return patched.unionByName(untouched)


def search_graph_shards(
    shards: DataFrame,
    queries: list[tuple[object, list[float]]],
    *,
    metric: str,
    k: int = 10,
    ef_search: int | None = None,
    id_col: str = "id",
    id_type: T.DataType | None = None,
    score_mode: str = "raw",
) -> DataFrame:
    """Batch search over an existing graph-shard table (built by
    `build_graph_shards`, possibly patched by `delete_from_graph_shards`):
    answer every query against each shard, merge with a global per-query
    (rank, id) top-k window. `ef_search` overrides the build-time beam.

    `id_type` declares the emitted id column's Spark type and should match
    the collection's native id type (Collection passes its own schema
    type). When omitted the declared type is StringType and the graphs'
    external ids are COERCED to str on emission — without the coercion a
    graph built over long ids would hit an Arrow type error mid-job
    ('Expected bytes, got int') under the string default. Callers joining
    the results back against a non-string id column must pass the real
    type."""
    import pickle

    from vettore_spark.functions import kernels as K
    from vettore_spark.operators.search import score_columns

    m = K.canonical_metric(metric)
    stringify = id_type is None
    out_schema = T.StructType(
        [
            T.StructField("query_id", T.StringType()),
            T.StructField(id_col, id_type or T.StringType()),
            T.StructField("_raw", T.DoubleType()),
        ]
    )
    qlist = [(str(qid), np.asarray(qv, dtype=np.float64)) for qid, qv in queries]
    ef = ef_search

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for blob in pdf["shard"]:
                g: HnswGraph = pickle.loads(bytes(blob))
                if ef is not None:
                    g.params = HnswParams(
                        m=g.params.m, m0=g.params.m0,
                        ef_construction=g.params.ef_construction,
                        ef_search=ef, max_level=g.params.max_level,
                    )
                out_q, out_i, out_r = [], [], []
                for qid, qv in qlist:
                    for eid, raw in g.search(qv, k):
                        out_q.append(qid)
                        out_i.append(str(eid) if stringify else eid)
                        out_r.append(raw)
                yield pd.DataFrame(
                    {"query_id": out_q, id_col: out_i, "_raw": out_r}
                )

    local = shards.mapInPandas(run, out_schema)
    rank, score, dist = score_columns(m, F.col("_raw"), score_mode)
    scored = local.select(
        "query_id",
        id_col,
        rank.alias("_rank"),
        score.alias("score"),
        dist.alias("distance"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("_rank").asc(), F.col(id_col).asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .withColumnRenamed("_rn", "rank")
        .drop("_rank")
    )


def hnsw_search(
    coll: DataFrame,
    queries: list[tuple[object, list[float]]],
    *,
    metric: str = "cosine",
    k: int = 10,
    params: HnswParams | None = None,
    id_col: str = "id",
    vector_col: str = "vector",
    num_partitions: int | None = None,
    score_mode: str = "raw",
) -> DataFrame:
    """Partition-parallel HNSW batch search over the persisted graph-shard
    table (built on first use by `build_graph_shards`): answer every query
    against each shard, merge shards with a global per-query (rank, id)
    top-k. `ef_search` is the only parameter consumed at search time; all
    build-time parameters key the shared shard table."""
    from vettore_spark.functions import kernels as K

    p = params or HnswParams()
    m = K.canonical_metric(metric)
    shards = build_graph_shards(
        coll, metric=m, params=p, id_col=id_col, vector_col=vector_col,
        num_partitions=num_partitions,
    )
    return search_graph_shards(
        shards, queries, metric=m, k=k, ef_search=p.ef_search,
        id_col=id_col, id_type=coll.schema[id_col].dataType,
        score_mode=score_mode,
    )
