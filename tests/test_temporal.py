"""Tests for the temporal operators: as-of join and sessionization."""

from __future__ import annotations

from pyspark.sql import functions as F

from vettore_spark.operators.temporal import asof_join, session_stats, sessionize


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id: long, user_id: long, ts_s: string, value: double"
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")


def test_asof_join_basic(spark):
    left = _events(spark, [
        (10, 1, "2024-01-01 10:00:00", 5.0),
        (11, 1, "2024-01-01 12:00:00", 6.0),
        (12, 2, "2024-01-01 10:30:00", 7.0),
    ])
    right = _events(spark, [
        (1, 1, "2024-01-01 09:00:00", 1.0),
        (2, 1, "2024-01-01 11:00:00", 2.0),
        (3, 1, "2024-01-01 13:00:00", 3.0),   # after every left row -> unused
        (4, 3, "2024-01-01 09:00:00", 9.0),   # other user
    ])
    out = {
        r["event_id"]: r["r_value"]
        for r in asof_join(left, right).collect()
    }
    assert out == {10: 1.0, 11: 2.0, 12: None}


def test_asof_join_ties(spark):
    # same-ts right row is visible; among same-ts right rows max event_id wins
    left = _events(spark, [(10, 1, "2024-01-01 10:00:00", 0.0)])
    right = _events(spark, [
        (1, 1, "2024-01-01 10:00:00", 1.0),
        (2, 1, "2024-01-01 10:00:00", 2.0),
    ])
    [row] = asof_join(left, right).collect()
    assert row["r_value"] == 2.0


def test_sessionize_gap(spark):
    ev = _events(spark, [
        (1, 1, "2024-01-01 10:00:00", 1.0),
        (2, 1, "2024-01-01 10:20:00", 1.0),   # 20m gap -> same session
        (3, 1, "2024-01-01 10:50:00", 1.0),   # exactly 30m -> same (strict >)
        (4, 1, "2024-01-01 11:30:00", 1.0),   # 40m -> new session
        (5, 2, "2024-01-01 10:00:00", 1.0),
    ])
    got = {
        r["event_id"]: r["session_id"]
        for r in sessionize(ev, gap="30 minutes").collect()
    }
    assert got == {1: 0, 2: 0, 3: 0, 4: 1, 5: 0}

    stats = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["duration_s"])
        for r in session_stats(ev, gap="30 minutes").collect()
    }
    assert stats[(1, 0)] == (3, 3000.0)
    assert stats[(1, 1)] == (1, 0.0)
    assert stats[(2, 0)] == (1, 0.0)


def test_asof_join_single_shuffle(spark):
    """The as-of plan must not contain a cross/range join — only exchanges on
    the key plus a window."""
    left = _events(spark, [(10, 1, "2024-01-01 10:00:00", 5.0)])
    right = _events(spark, [(1, 1, "2024-01-01 09:00:00", 1.0)])
    plan = asof_join(left, right)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_banded(spark):
    """Banded equi-join must equal the naive theta join, including pairs
    that straddle a bucket boundary (the adjacent-band explode)."""
    from vettore_spark.operators.temporal import range_join

    left = _events(spark, [
        (10, 1, "2024-01-01 10:00:00", 0.0),
        (11, 1, "2024-01-01 12:00:00", 0.0),
        (12, 2, "2024-01-01 10:00:00", 0.0),
    ])
    right = _events(spark, [
        (1, 1, "2024-01-01 09:56:00", 0.0),   # -4m: inside
        (2, 1, "2024-01-01 10:04:59", 0.0),   # +4m59s: inside
        (3, 1, "2024-01-01 10:05:01", 0.0),   # +5m01s: outside
        (4, 1, "2024-01-01 11:55:30", 0.0),   # -4m30s of 12:00: inside
        (5, 2, "2024-01-01 10:04:00", 0.0),   # same ts other user: inside for 12 only
    ])
    got = {
        (r["event_id"], r["r_event_id"])
        for r in range_join(
            left, right, key_col="user_id", ts_col="ts", radius_s=300.0,
            right_cols=("event_id",),
        ).collect()
    }
    assert got == {(10, 1), (10, 2), (11, 4), (12, 5)}

    # oracle: naive theta join on the same inputs
    naive = left.alias("l").join(
        right.alias("r"),
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.abs(F.unix_micros("l.ts") - F.unix_micros("r.ts")) <= 300_000_000),
    ).select(F.col("l.event_id").alias("a"), F.col("r.event_id").alias("b"))
    assert got == {(r["a"], r["b"]) for r in naive.collect()}


def test_trailing_user_features_window_and_gap(spark):
    from pyspark.sql import functions as F
    from vettore_spark.operators.temporal import trailing_user_features

    rows = [
        (1, 10, 0, 1.0),
        (2, 10, 1800, 2.0),
        (3, 10, 3600, 4.0),    # 1h after event 1: still inside its range
        (4, 10, 7201, 8.0),    # everything else expired
        (5, 20, 100, 1.5),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, t long, value double"
    ).select("event_id", "user_id",
             F.timestamp_seconds(F.col("t")).alias("ts"), "value")
    out = {r["event_id"]: r for r in
           trailing_user_features(ev, window_s=3600).collect()}
    assert out[1]["n_1h"] == 1 and out[1]["sum_1h"] == 1.0
    assert out[2]["n_1h"] == 2 and out[2]["sum_1h"] == 3.0
    assert out[3]["n_1h"] == 3 and out[3]["sum_1h"] == 7.0  # range inclusive
    assert out[4]["n_1h"] == 1 and out[4]["sum_1h"] == 8.0
    assert out[5]["n_1h"] == 1
    assert out[1]["gap_us"] == -1          # first event per user
    assert out[2]["gap_us"] == 1800_000_000
    assert out[5]["gap_us"] == -1
