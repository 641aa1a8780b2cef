"""Deterministic sampling / splitting / sharding.

Oracle: Python hashlib md5 re-derivation of every decision (exact), plus
distribution sanity checks.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from vettore_spark.operators import sampling as SMP


def _draw(key, salt=""):
    return hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:8]


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(3000)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_sample_matches_hash_oracle(docs):
    got = {
        r["doc_id"]
        for r in SMP.deterministic_sample(
            docs, 0.3, key_col="doc_id", salt="x"
        ).collect()
    }
    thr = SMP._threshold_hex(0.3)
    want = {i for i in range(3000) if _draw(i, "x") < thr}
    assert got == want
    # ~30% within statistical slack
    assert 0.25 < len(got) / 3000 < 0.35


def test_sample_stable_under_growth(docs):
    small = docs.filter(F.col("doc_id") < 1000)
    s_small = {
        r["doc_id"]
        for r in SMP.deterministic_sample(small, 0.5, key_col="doc_id").collect()
    }
    s_full = {
        r["doc_id"]
        for r in SMP.deterministic_sample(docs, 0.5, key_col="doc_id").collect()
    }
    assert s_small == {i for i in s_full if i < 1000}


def test_stratified_fractions(docs):
    out = SMP.stratified_sample(
        docs,
        {"en": 1.0, "de": 0.2},
        strata_col="lang",
        key_col="doc_id",
        default_fraction=0.0,
    )
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts.get("fr") is None  # default 0.0
    assert counts["en"] == 1000  # fraction 1.0 keeps everything
    assert 120 < counts["de"] < 280


def test_train_test_split_partition_invariant(docs):
    a = SMP.train_test_split(docs, key_col="doc_id", test_fraction=0.2)
    b = SMP.train_test_split(
        docs.repartition(7), key_col="doc_id", test_fraction=0.2
    )
    ga = {(r["doc_id"], r["split"]) for r in a.collect()}
    gb = {(r["doc_id"], r["split"]) for r in b.collect()}
    assert ga == gb
    n_test = sum(1 for _, s in ga if s == "test")
    assert 0.15 < n_test / 3000 < 0.25


def test_shard_assign_balance_and_oracle(docs):
    out = SMP.shard_assign(docs, 16, key_col="doc_id").collect()
    for r in out:
        assert r["shard"] == int(_draw(r["doc_id"]), 16) % 16
    sizes = {}
    for r in out:
        sizes[r["shard"]] = sizes.get(r["shard"], 0) + 1
    assert len(sizes) == 16
    assert max(sizes.values()) < 2 * min(sizes.values())


def test_write_shards_roundtrip(docs, tmp_path):
    path = str(tmp_path / "shards")
    SMP.write_shards(docs, path, 4, key_col="doc_id")
    spark = docs.sparkSession
    back = spark.read.parquet(path)
    assert back.count() == 3000
    assert {r["shard"] for r in back.select("shard").distinct().collect()} == {0, 1, 2, 3}
    # a single shard is readable alone (partition pruning) and matches
    one = spark.read.parquet(path).filter(F.col("shard") == 2)
    want = {i for i in range(3000) if int(_draw(i), 16) % 4 == 2}
    assert {r["doc_id"] for r in one.collect()} == want


def test_sample_monotone_in_fraction(docs):
    """p1 <= p2 => sample(p1) is a subset of sample(p2) — the property that
    makes digest-threshold sampling safely tunable: raising the rate only
    ADDS rows, so downstream incremental jobs never lose previously
    sampled data."""
    prev: set = set()
    for frac in (0.1, 0.3, 0.6, 1.0):
        cur = {
            r["doc_id"]
            for r in SMP.deterministic_sample(
                docs, frac, key_col="doc_id", salt="mono"
            ).collect()
        }
        assert prev <= cur
        prev = cur
    assert len(prev) == 3000  # fraction 1.0 keeps everything


def test_write_shards_order_deterministic(docs, tmp_path):
    """Within-shard row order is the digest permutation — identical across
    writes (retry/rerun idempotence), not dependent on input partitioning."""
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    SMP.write_shards(docs, p1, 4, key_col="doc_id")
    SMP.write_shards(docs.repartition(13), p2, 4, key_col="doc_id")
    spark = docs.sparkSession
    import glob

    def shard_orders(path):
        out = {}
        for d in sorted(glob.glob(path + "/shard=*")):
            rows = spark.read.parquet(d).select("doc_id").collect()
            out[d.rsplit("=", 1)[1]] = [r["doc_id"] for r in rows]
        return out

    o1, o2 = shard_orders(p1), shard_orders(p2)
    assert o1.keys() == o2.keys()
    for s in o1:
        assert o1[s] == o2[s], f"shard {s} order differs"
        # order is the digest permutation, not id order
        assert o1[s] != sorted(o1[s])


def test_leakage_safe_split_keeps_families_together(spark):
    """Every near-dup pair lands in one split; singletons keep the plain
    per-id draw (so the split is growth-stable and backward compatible
    with train_test_split for unpaired docs)."""
    from vettore_spark.operators.sampling import (
        leakage_safe_split,
        sample_predicate,
    )

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(50)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (20, 21)], ["doc_a", "doc_b"]
    )
    out = leakage_safe_split(docs, pairs, test_fraction=0.3, salt="s").collect()
    split = {r["doc_id"]: r["split"] for r in out}
    assert len(split) == 50
    # families share a split
    assert split[0] == split[1] == split[2]
    assert split[10] == split[11]
    assert split[20] == split[21]
    # unpaired docs match the per-id draw exactly
    plain = docs.filter(
        sample_predicate(F.col("doc_id"), 0.3, salt="s")
    ).collect()
    test_ids = {r["doc_id"] for r in plain}
    for i in set(range(50)) - {0, 1, 2, 10, 11, 20, 21}:
        assert (split[i] == "test") == (i in test_ids)
    # both splits non-empty at this fraction
    assert {"train", "test"} == set(split.values())


def test_weighted_sample_favors_heavy_rows(spark):
    """A-ES inclusion tracks weight: with a 10:1 weight ratio and k = 20%
    of the population, the heavy group wins the large majority of slots
    (expected ~95% of heavy rows in-sample vs ~10% of light)."""
    from vettore_spark.operators.sampling import weighted_sample

    rows = [(f"h{i}", 10.0) for i in range(1000)] + [
        (f"l{i}", 1.0) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, ["key", "w"])
    got = weighted_sample(df, 400, weight_col="w", key_col="key").collect()
    heavy = sum(1 for r in got if r["key"].startswith("h"))
    assert len(got) == 400
    assert heavy > 2 * (400 - heavy), f"heavy={heavy}"


def test_weighted_sample_deterministic_and_salted(spark):
    from vettore_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(f"k{i}", float(1 + i % 7)) for i in range(500)], ["key", "w"]
    )
    a = [r["key"] for r in weighted_sample(df, 50, weight_col="w", key_col="key").collect()]
    b = [r["key"] for r in weighted_sample(df, 50, weight_col="w", key_col="key").collect()]
    c = [r["key"] for r in weighted_sample(df, 50, weight_col="w", key_col="key", salt="x").collect()]
    assert a == b
    assert a != c  # a different salt draws a different sample


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from vettore_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [("a", 1.0), ("b", 0.0), ("c", -3.0), ("d", None)], ["key", "w"]
    )
    got = {r["key"] for r in weighted_sample(df, 10, weight_col="w", key_col="key").collect()}
    assert got == {"a"}


def test_weighted_sample_plan_is_take_ordered(spark):
    """Scale pin: the top-k is TakeOrderedAndProject (per-partition heaps
    + driver merge of k rows) — no global sort, no window, no shuffle."""
    from vettore_spark.operators.sampling import weighted_sample

    df = spark.range(1000).select(
        F.col("id").cast("string").alias("key"), F.lit(2.0).alias("w")
    )
    plan = (
        weighted_sample(df, 25, weight_col="w", key_col="key")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_mod_sample_is_consistent_per_key(spark):
    """Congruential sampling draws KEYS: every row of a sampled key is
    kept, every row of an unsampled key dropped — no partial users."""
    rows = [(u, e) for u in range(400) for e in range(3)]
    df = spark.createDataFrame(rows, "user_id long, event long")
    kept = SMP.deterministic_sample  # noqa: F841 (naming parity)
    s = df.filter(SMP.mod_sample_predicate("user_id", 7)).collect()
    per_user = {}
    for r in s:
        per_user.setdefault(r["user_id"], set()).add(r["event"])
    assert per_user, "1-in-7 over 400 keys cannot be empty"
    assert all(evts == {0, 1, 2} for evts in per_user.values())
    # and the draw is the documented md5 construction
    for u in per_user:
        h = int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
        assert h % 7 == 0


def test_approx_rollup_estimates_within_sampling_error(spark):
    """1-in-10 keyed sample over 5000 uniform keys: every estimate lands
    within 5 relative standard errors of the truth (binomial key draw:
    rse ~ sqrt((1-p)/(p*n_keys_per_group)))."""
    import math

    rows = [(u, ["a", "b"][u % 2], float(u % 100)) for u in range(5000)
            for _ in range(2)]
    df = spark.createDataFrame(rows, "user_id long, g string, value double")
    est = {
        r["g"]: r
        for r in SMP.approx_rollup(
            df, key_col="user_id", one_in=10, group_by=["g"],
            sum_cols=["value"],
        ).collect()
    }
    exact = {
        r["g"]: r
        for r in df.groupBy("g").agg(
            F.count(F.lit(1)).alias("rows"),
            F.count_distinct("user_id").alias("keys"),
            F.sum("value").alias("sum_value"),
        ).collect()
    }
    tol = 5.0 * math.sqrt(0.9 / (0.1 * 2500))  # ~0.30
    for g in ("a", "b"):
        for est_k, ex_k in (("est_rows", "rows"), ("est_keys", "keys"),
                            ("est_sum_value", "sum_value")):
            rel = abs(est[g][est_k] - exact[g][ex_k]) / exact[g][ex_k]
            assert rel < tol, (g, est_k, est[g][est_k], exact[g][ex_k])


def test_mod_sample_validation(spark):
    df = spark.createDataFrame([(1,)], "user_id long")
    with pytest.raises(ValueError):
        SMP.mod_sample_predicate("user_id", 0)
