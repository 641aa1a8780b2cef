"""Sketch family: KMV bottom-k distinct estimation (+ merge/set ops) and
the count-min frequency sketch. Properties pinned: estimator accuracy at
1/sqrt(k) scale, exactness below saturation, merge associativity, the
count-min overestimate guarantee, and the plans that make both scale
(WindowGroupLimit bottom-k, broadcast sketch lookup)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vettore_spark.operators import sketch as SK


def _ids(spark, n, tag=""):
    return spark.range(n).select(
        F.concat(F.lit(tag), F.col("id").cast("string")).alias("key")
    )


def test_kmv_exact_below_saturation(spark):
    """A group with fewer distinct keys than k holds its WHOLE hash set in
    the sketch — the estimate is the exact count, no estimator error."""
    df = _ids(spark, 100)
    sk = SK.kmv_sketch(df, "key", k=256)
    [row] = SK.kmv_estimate(sk, k=256).collect()
    assert row["est_distinct"] == 100.0


def test_kmv_estimate_within_relative_error(spark):
    """Saturated sketch: (k-1)/r_k lands within ~3/sqrt(k) of truth
    (k=256 -> 18.75%; md5 draws are uniform, the bound is loose)."""
    n = 20_000
    sk = SK.kmv_sketch(_ids(spark, n), "key", k=256)
    [row] = SK.kmv_estimate(sk, k=256).collect()
    assert abs(row["est_distinct"] - n) / n < 3 / (256 ** 0.5)


def test_kmv_duplicates_are_invisible(spark):
    """KMV counts DISTINCT keys: replicating every key 7x changes
    nothing — same sketch, same estimate."""
    base = _ids(spark, 5_000)
    dup = base.crossJoin(spark.range(7)).select("key")
    k = 128
    a = SK.kmv_sketch(base, "key", k=k).collect()
    b = SK.kmv_sketch(dup, "key", k=k).collect()
    assert sorted((r["pos"], r["h"]) for r in a) == sorted(
        (r["pos"], r["h"]) for r in b
    )


def test_kmv_merge_equals_sketch_of_union(spark):
    """Mergeability — the property that lets sketches be computed
    per-partition/per-corpus and combined: merge(sk(A), sk(B)) is
    EXACTLY sk(A ∪ B)."""
    k = 64
    a, b = _ids(spark, 3_000, "a"), _ids(spark, 3_000, "b")
    merged = SK.kmv_merge(
        SK.kmv_sketch(a, "key", k=k), SK.kmv_sketch(b, "key", k=k), k=k
    )
    direct = SK.kmv_sketch(a.unionByName(b), "key", k=k)
    assert sorted((r["pos"], r["h"]) for r in merged.collect()) == sorted(
        (r["pos"], r["h"]) for r in direct.collect()
    )


def test_kmv_overlap_tracks_true_jaccard(spark):
    """Half-overlapping sets (true J = 1/3): the resemblance estimate from
    the merged bottom-k is within 3/sqrt(k) absolute."""
    k = 256
    a = _ids(spark, 4_000)                      # 0..3999
    b = spark.range(2_000, 6_000).select(F.col("id").cast("string").alias("key"))
    [row] = SK.kmv_overlap(
        SK.kmv_sketch(a, "key", k=k), SK.kmv_sketch(b, "key", k=k), k=k
    ).collect()
    assert abs(row["jaccard"] - 1 / 3) < 3 / (k ** 0.5)
    assert abs(row["est_union"] - 6_000) / 6_000 < 3 / (k ** 0.5)
    assert abs(row["est_intersection"] - 2_000) / 2_000 < 0.35


def test_cms_never_underestimates(spark):
    """The count-min guarantee: est_cnt >= exact count for EVERY key, and
    a narrow sketch (forced collisions) stays an overestimate."""
    rows = [(f"k{i % 50}",) for i in range(5_000)]  # 50 keys x 100, zipfless
    df = spark.createDataFrame(rows, ["key"])
    for width in (16, 1024):  # 16 forces collisions among 50 keys
        cms = SK.cms_build(df, "key", depth=4, width=width)
        exact = df.groupBy("key").agg(F.count(F.lit(1)).cast("long").alias("n"))
        got = SK.cms_lookup(cms, exact, "key", depth=4, width=width).collect()
        assert all(r["est_cnt"] >= r["n"] for r in got), width
    # wide sketch: no collisions among 50 keys across 4 rows -> exact
    assert all(r["est_cnt"] == r["n"] for r in got)


def test_cms_weighted_counts(spark):
    """weight_col aggregates weights, not rows."""
    df = spark.createDataFrame([("a", 5), ("a", 7), ("b", 1)], ["key", "w"])
    cms = SK.cms_build(df, "key", depth=3, width=64, weight_col="w")
    items = spark.createDataFrame([("a",), ("b",), ("zz",)], ["key"])
    got = {r["key"]: r["est_cnt"] for r in
           SK.cms_lookup(cms, items, "key", depth=3, width=64).collect()}
    assert got["a"] == 12 and got["b"] == 1
    assert got["zz"] <= 13  # absent key: bounded by colliding mass, >= 0


def test_kmv_bottom_k_plan_is_partial_topk(spark):
    """The scale pin: bottom-k never globally sorts. Grouped sketches plan
    as WindowGroupLimit (per-partition bottom-k BEFORE the exchange, then
    Final after) — a group's billion distinct hashes move as k rows per
    input partition. A global sketch is even tighter: Catalyst collapses
    the rank filter to TakeOrderedAndProject (per-partition heads +
    driver-side merge of k-row heaps)."""
    df = _ids(spark, 1_000)
    gplan = (
        SK.kmv_sketch(df, "key", k=32)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in gplan
    grouped = df.withColumn("g", F.col("key").substr(1, 1))
    plan = (
        SK.kmv_sketch(grouped, "key", k=32, group_by=["g"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan


def test_cms_lookup_broadcasts_sketch(spark):
    """The finished sketch (depth*width rows) must broadcast into the
    probe join — the items side never shuffles."""
    df = _ids(spark, 1_000)
    cms = SK.cms_build(df, "key", depth=4, width=128)
    items = _ids(spark, 10)
    plan = (
        SK.cms_lookup(cms, items, "key", depth=4, width=128)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_kmv_rejects_degenerate_k(spark):
    with pytest.raises(ValueError, match="k >= 2"):
        SK.kmv_sketch(_ids(spark, 10), "key", k=1)
    with pytest.raises(ValueError, match="depth"):
        SK.cms_build(_ids(spark, 10), "key", depth=0, width=4)


def test_streaming_kmv_matches_batch_sketch(spark, tmp_path):
    """Streaming KMV (bottom-k in applyInPandasWithState state) consumed
    with availableNow equals the BATCH kmv_estimate over the same rows —
    same md5 hash construction, same estimator, bit-for-bit. Two input
    files force multi-batch state carry-over."""
    from vettore_spark.streaming.stateful import streaming_kmv_distinct

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_type", "user_id"
    )
    src = tmp_path / "kmv_src"
    half1, half2 = ev.randomSplit([0.5, 0.5], seed=7)
    half1.coalesce(1).write.parquet(str(src / "b1"))
    half2.coalesce(1).write.parquet(str(src / "b2"))
    stream = spark.readStream.schema("event_type string, user_id long").parquet(
        str(src) + "/*"
    )
    q = (
        streaming_kmv_distinct(stream, k=32, group_col="event_type",
                               key_col="user_id")
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("kmv_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # last emission per group == final state
    import pandas as pd  # noqa: F401

    rows = spark.sql("select * from kmv_stream").collect()
    final = {}
    for r in rows:  # memory sink appends per batch; later rows win
        final[r["event_type"]] = r["est_distinct"]

    batch = SK.kmv_estimate(
        SK.kmv_sketch(ev, "user_id", k=32, group_by=["event_type"]),
        k=32,
        group_by=["event_type"],
    ).collect()
    want = {r["event_type"]: r["est_distinct"] for r in batch}
    assert final == want


def test_streaming_cms_matches_batch(spark, tmp_path):
    """cms_build is a pure explode + groupBy-sum, so the SAME function
    runs on a streaming frame (complete mode): counters after availableNow
    equal the batch sketch exactly."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        F.col("user_id").cast("string").alias("key")
    )
    src = tmp_path / "cms_src"
    ev.coalesce(2).write.parquet(str(src / "b1"))
    stream = spark.readStream.schema("key string").parquet(str(src) + "/*")
    q = (
        SK.cms_build(stream, "key", depth=3, width=64)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("cms_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in spark.sql("select * from cms_stream").collect()
    }
    want = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in SK.cms_build(ev, "key", depth=3, width=64).collect()
    }
    assert got == want


def test_histogram_quantiles_accuracy_and_merge(spark):
    """Estimate within one bucket_width of the exact quantile; histograms
    merge by adding counts (estimate over the union == estimate from the
    merged histogram, by construction of the bucket counts)."""
    import numpy as np

    from vettore_spark.operators import sketch as SK

    rng = np.random.default_rng(11)
    vals_a = rng.gamma(2.0, 25.0, size=4000)
    vals_b = rng.gamma(3.0, 15.0, size=4000)
    rows = [("a", float(v)) for v in vals_a] + [
        ("b", float(v)) for v in vals_b
    ]
    df = spark.createDataFrame(rows, ["g", "value"])
    w = 2.0
    qs = [0.5, 0.9, 0.99]
    got = {
        (r["g"], r["q"]): r["est"]
        for r in SK.histogram_quantiles(
            df, "value", qs, bucket_width=w, group_by=["g"]
        ).collect()
    }
    assert len(got) == 6
    for g, vals in (("a", vals_a), ("b", vals_b)):
        for q in qs:
            exact = float(np.quantile(vals, q))
            assert abs(got[(g, q)] - exact) <= w + 1e-9, (g, q, got[(g, q)], exact)

    # mergeability: the union of two halves estimates identically to the
    # whole (bucket counts are additive, interpolation reads only counts)
    half1 = spark.createDataFrame(rows[:4000], ["g", "value"])
    half2 = spark.createDataFrame(rows[4000:], ["g", "value"])
    merged = {
        (r["g"], r["q"]): r["est"]
        for r in SK.histogram_quantiles(
            half1.unionByName(half2), "value", qs, bucket_width=w,
            group_by=["g"],
        ).collect()
    }
    assert merged == got


def test_histogram_quantiles_validation(spark):
    import pytest

    from vettore_spark.operators import sketch as SK

    df = spark.createDataFrame([("a", 1.0)], ["g", "value"])
    with pytest.raises(ValueError):
        SK.histogram_quantiles(df, "value", [], bucket_width=1.0)
    with pytest.raises(ValueError):
        SK.histogram_quantiles(df, "value", [1.5], bucket_width=1.0)
    with pytest.raises(ValueError):
        SK.histogram_quantiles(df, "value", [0.5], bucket_width=0.0)


def test_streaming_histogram_matches_batch(spark, tmp_path):
    """Streaming histogram (bucket counters in applyInPandasWithState
    state) consumed with availableNow equals the BATCH
    histogram_quantiles over the same rows bit-for-bit — same bucket
    rule, same interpolation arithmetic, same HALF_UP 4-dp round. Two
    input files force multi-batch state carry-over."""
    from vettore_spark.streaming.stateful import streaming_histogram_quantiles

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_type", "value"
    )
    src = tmp_path / "hist_src"
    half1, half2 = ev.randomSplit([0.5, 0.5], seed=13)
    half1.coalesce(1).write.parquet(str(src / "b1"))
    half2.coalesce(1).write.parquet(str(src / "b2"))
    stream = spark.readStream.schema("event_type string, value double").parquet(
        str(src) + "/*"
    )
    q = (
        streaming_histogram_quantiles(
            stream, quantiles=[0.5, 0.9, 0.99], bucket_width=2.0,
            group_col="event_type", value_col="value",
        )
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("hist_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    final = {}
    for r in spark.sql("select * from hist_stream").collect():
        final[(r["event_type"], r["q"])] = r["est"]  # later batches win

    want = {
        (r["event_type"], r["q"]): r["est"]
        for r in SK.histogram_quantiles(
            ev, "value", [0.5, 0.9, 0.99], bucket_width=2.0,
            group_by=["event_type"],
        ).collect()
    }
    assert final == want


def test_kmv_rollup_equals_direct_sketch(spark):
    """Merging per-day bottom-k sketches loses nothing: any hash in the
    week's true bottom-k is necessarily in its day's bottom-k, so the
    rolled-up weekly estimate equals sketching the week directly."""
    from vettore_spark.queries import q_kmv_weekly_rollup

    rows = q_kmv_weekly_rollup(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r["est_from_daily"] == r["est_direct"], r
