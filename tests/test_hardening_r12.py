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


def test_simhash_atcap_vectorized_matches_sequential_semantics(spark, tmp_path):
    """r12: the at-cap hot-bucket path was a Python double loop (O(rows x
    cap) interpreter work per hot bucket — the replay-scaling bottleneck);
    it is now vectorized in closed form (residents x arrivals +
    added-prefix x strictly-later arrivals). The emitted (doc_a, doc_b,
    hamming, block) multiset must equal an independent Python reference
    implementing the ORIGINAL sequential rule verbatim — arrival j
    verifies against the current resident list, then joins it only while
    the bucket is under max_bucket — across micro-batches that land
    under-cap, straddling the cap (partial add), and at-cap (no add)."""
    from vettore_spark.operators.dedup import simhash64, tokens
    from vettore_spark.streaming.stateful import streaming_simhash_candidates

    words = [f"tok{i}" for i in range(40)]

    def doc(i: int, change: int) -> tuple[int, str]:
        return (i, " ".join(
            w if j != change else f"CHANGED{i}" for j, w in enumerate(words)
        ))

    # a DUPLICATE FAMILY (identical text, the realistic hot-bucket shape:
    # every member lands in the same bucket in all 4 blocks) plus a few
    # near variants. batch 1: 4 docs (under cap 5) / batch 2: 5 docs
    # (4+5 > 5: partial add, add_n=1) / batch 3: 3 docs (cap full,
    # add_n=0 — arrivals verify against frozen residents, never join)
    batches = [
        [doc(i, -1) for i in range(4)],
        [doc(i, -1) for i in range(4, 8)] + [doc(8, 3)],
        [doc(9, -1), doc(10, 5), doc(11, -1)],
    ]
    schema = "doc_id long, text string"
    src = tmp_path / "cap"
    import time as _t

    base_t = _t.time() - 600
    for bi, rows in enumerate(batches):
        d = src / f"b{bi}"
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(d))
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (base_t + 10 * bi, base_t + 10 * bi))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(str(src) + "/*")
    )
    MAXB, MAXH = 5, 8
    q = (
        streaming_simhash_candidates(stream, max_hamming=MAXH, max_bucket=MAXB)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("shcap")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError("streaming query did not finish in 120s")
    got = sorted(
        (r["doc_a"], r["doc_b"], r["hamming"], r["block"])
        for r in spark.sql("select * from shcap").collect()
    )

    # independent reference: same sigs (batch kernel), sequential rule
    all_rows = [r for b in batches for r in b]
    sig = {
        r["doc_id"]: r["sig"]
        for r in spark.createDataFrame(all_rows, schema)
        .select("doc_id", simhash64(tokens("text")).alias("sig"))
        .collect()
    }
    want = []
    # buckets are (blk, bval): process per bucket in batch order
    ref_state: dict = {}
    for rows in batches:
        per_bucket: dict = {}
        for i, _ in rows:
            for blk in range(4):
                bval = (sig[i] >> (blk * 16)) & 0xFFFF
                per_bucket.setdefault((blk, bval), []).append((i, sig[i]))
        for key, brows in per_bucket.items():
            ids_, sigs_ = ref_state.setdefault(key, ([], []))
            for rid, rsig in sorted(brows):
                for mid, msig in zip(ids_, sigs_):
                    if mid == rid:
                        continue
                    h = bin((rsig ^ msig) & ((1 << 64) - 1)).count("1")
                    if h <= MAXH:
                        a, b = (rid, mid) if rid < mid else (mid, rid)
                        want.append((a, b, h, key[0]))
                if len(ids_) < MAXB:
                    ids_.append(rid)
                    sigs_.append(rsig)
    assert got == sorted(want)
    assert any(len(v[0]) == MAXB for v in ref_state.values()), (
        "fixture never drove a bucket to its cap — the at-cap path was "
        "not exercised"
    )


def test_histogram_quantiles_ignore_nonfinite(spark, tmp_path):
    """r12 review: histogram_quantiles had no finiteness guard — a NULL
    value floored to a NULL bucket that sorts FIRST under the cumulative
    window (shifting every estimate), a NaN cast to long landed in bucket
    0, and the STREAMING twin crashed outright (math.floor(nan) raises).
    Both now ignore non-finite values; estimates over a poisoned column
    equal those over the clean column, batch and stream."""
    import math

    from vettore_spark.operators import sketch as SK
    from vettore_spark.streaming.stateful import streaming_histogram_quantiles

    clean = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 10.0), ("b", 5.0)]
    dirty = clean + [
        ("a", None), ("a", float("nan")), ("a", float("inf")),
        ("b", float("-inf")), ("b", None),
    ]
    schema = "g string, v double"
    want = {
        (r["g"], r["q"]): r["est"]
        for r in SK.histogram_quantiles(
            spark.createDataFrame(clean, schema), "v", [0.5, 0.9],
            bucket_width=1.0, group_by=["g"],
        ).collect()
    }
    got = {
        (r["g"], r["q"]): r["est"]
        for r in SK.histogram_quantiles(
            spark.createDataFrame(dirty, schema), "v", [0.5, 0.9],
            bucket_width=1.0, group_by=["g"],
        ).collect()
    }
    assert got == want and want

    # streaming twin: poisoned rows must not kill the query, and the
    # final emission must match the clean batch estimates
    src = tmp_path / "hq"
    spark.createDataFrame(dirty, schema).coalesce(1).write.parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        streaming_histogram_quantiles(
            stream, quantiles=[0.5, 0.9], bucket_width=1.0,
            group_col="g", value_col="v",
        )
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("hq_stream")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError("streaming query did not finish in 120s")
    got_s = {
        (r["g"], r["q"]): r["est"]
        for r in spark.sql("select * from hq_stream").collect()
    }
    assert {k: round(v, 4) for k, v in got_s.items()} == {
        k: round(v, 4) for k, v in want.items()
    }
    assert all(math.isfinite(v) for v in got_s.values())


def test_nan_weight_rows_lose_not_win(spark):
    """r12 review: Spark orders NaN GREATER than every double, so (a)
    weighted_sample's `w > 0` filter PASSED a NaN weight and its NaN
    ranking key sorted FIRST under desc — guaranteed selection for a
    malformed row; (b) select_token_budget's NaN weight group ranked
    first and absorbed the budget. Both now exclude NaN like NULL (the
    malformed-rows-lose contract from the r11 search rank-key fix)."""
    import math

    from vettore_spark.operators.sampling import weighted_sample
    from vettore_spark.operators.selection import select_token_budget

    rows = [
        ("a", 5.0), ("b", 1.0), ("c", float("nan")), ("d", None), ("e", 2.0),
    ]
    df = spark.createDataFrame(rows, "id string, w double")
    got = {r["id"] for r in weighted_sample(df, 2, weight_col="w", key_col="id").collect()}
    assert "c" not in got and "d" not in got
    assert len(got) == 2 and got <= {"a", "b", "e"}

    wrows = [
        ("a", 2.0, 10), ("b", 1.0, 10), ("c", float("nan"), 10**6), ("d", None, 5),
    ]
    wdf = spark.createDataFrame(wrows, "doc_id string, dsir_per_token double, n_tokens long")
    sel = {
        r["doc_id"]: r["selected"]
        for r in select_token_budget(
            wdf, 15, weight_col="dsir_per_token", tokens_col="n_tokens"
        ).collect()
    }
    # NaN (million tokens) must not absorb the budget; a then b fit in 15
    assert sel == {"a": True, "b": False, "c": False, "d": False} or sel == {
        "a": True, "b": True, "c": False, "d": False
    }
    # exact: a (10) fits, b would make 20 > 15 -> False
    assert sel["a"] is True and sel["b"] is False
    assert sel["c"] is False and sel["d"] is False


def test_hashed_features_multibyte_ok_and_zero_norm_safe(spark):
    """r12 review found hashed_token_features counted CHARACTERS for its
    reduceat segmentation while hashing BYTES — one multi-byte glyph
    desynchronized every later token's hash silently, and r12 made it
    fail loudly. r13 fixes it properly: segments are BYTE lengths, so
    multi-byte text hashes correctly (full parity pinned in
    test_hardening_r13.py). Here: multi-byte input is accepted and
    produces finite weights. And a document whose every hit slot cancels
    to 0.0 normalized 0/0 into NaN weights — the zero vector now stays
    zero (the K15 rule)."""
    from vettore_spark.operators.text import hashed_token_features

    multibyte = spark.createDataFrame(
        [(1, "hello wörld")], "doc_id long, text string"
    )
    rows = hashed_token_features(multibyte, dim=8).collect()
    assert rows and all(r["w"] == r["w"] for r in rows)  # no NaN

    ok = spark.createDataFrame(
        [(1, "plain ascii text")], "doc_id long, text string"
    )
    rows = hashed_token_features(ok, dim=8).collect()
    assert rows and all(r["w"] == r["w"] for r in rows)  # no NaN


def test_keep_best_per_cluster_nan_quality_loses(spark):
    """r12 review: a NaN quality member won the canonical slot (Spark
    sorts NaN greater than every double under desc). NaN now sorts with
    NULL — after every real score."""
    from vettore_spark.operators.pipeline import keep_best_per_cluster

    clusters = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10)], "doc_id long, component long"
    )
    quality = spark.createDataFrame(
        [(1, 0.5), (2, float("nan")), (3, None)], "doc_id long, quality double"
    )
    [row] = keep_best_per_cluster(clusters, quality).collect()
    assert row["keep_doc_id"] == 1 and row["quality"] == 0.5
