"""Salting utilities: results must equal the unsalted plans; the salted
phase must actually spread a hot key over multiple salts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vettore_spark.plans.skew import _salt, salt_join, salted_agg


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (user 0 has 900 rows), many cold keys
    rows = [(0, i, float(i % 7)) for i in range(900)]
    rows += [(u, 1000 + u, 1.0) for u in range(1, 51)]
    return spark.createDataFrame(rows, "user_id: long, event_id: long, value: double")


def test_salted_agg_matches_plain(spark, skewed):
    got = {
        r["user_id"]: (r["sum_value"], r["count_event_id"])
        for r in salted_agg(
            skewed,
            ["user_id"],
            {"value": "sum", "event_id": "count"},
            salt_col="event_id",
            n_salt=8,
        ).collect()
    }
    want = {
        r["user_id"]: (r["s"], r["c"])
        for r in skewed.groupBy("user_id")
        .agg(F.sum("value").alias("s"), F.count("event_id").alias("c"))
        .collect()
    }
    for u, (s, c) in want.items():
        gs, gc = got[u]
        assert abs(gs - s) < 1e-9 and gc == c


def test_salt_actually_spreads_hot_key(spark, skewed):
    n = (
        skewed.filter(F.col("user_id") == 0)
        .withColumn("_salt", _salt(F.col("event_id"), 8))
        .select("_salt")
        .distinct()
        .count()
    )
    assert n == 8  # 900 rows spread across all salts


def test_salt_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [(u, f"u{u}") for u in range(0, 51)], "user_id: long, name: string"
    )
    got = sorted(
        (r["event_id"], r["name"])
        for r in salt_join(skewed, dim, "user_id", salt_col="event_id", n_salt=4).collect()
    )
    want = sorted(
        (r["event_id"], r["name"]) for r in skewed.join(dim, "user_id").collect()
    )
    assert got == want


def test_salted_agg_rejects_avg(skewed):
    with pytest.raises(ValueError, match="non-reaggregatable"):
        salted_agg(skewed, ["user_id"], {"value": "avg"}, salt_col="event_id")


def test_skew_report_identifies_hot_key(spark):
    from pyspark.sql import functions as F

    from vettore_spark.plans.skew import skew_report

    rows = [("hot", i) for i in range(90)] + [(f"k{i}", i) for i in range(10)]
    df = spark.createDataFrame(rows, "k: string, v: long")
    got = skew_report(df, "k", top_k=3).collect()
    assert got[0]["k"] == "hot"
    assert got[0]["n_rows"] == 90
    assert abs(got[0]["share"] - 0.9) < 1e-9
    # 11 distinct keys, uniform would be 100/11 rows: ratio 90/(100/11)=9.9
    assert abs(got[0]["skew_ratio"] - 9.9) < 1e-6
    plan = (
        skew_report(df, "k", top_k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
