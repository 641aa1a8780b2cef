"""Temporal relational operators over event streams: as-of (point-in-time)
join and gap-based sessionization.

The reference has no temporal operators (SURVEY §2.3/§2.12 — its only
join-like ops are candidate hydration/union); these are Spark-native
extensions for the training-data-pipeline surface (event logs at 100 TB).

Scale design:
- `asof_join` uses the union-tag trick: tag left/right rows, union, one
  window over (key) ordered by (ts, tag, seq) carrying the last right row
  forward with `last(..., ignorenulls=True)`. ONE shuffle on the key — no
  range cross-join, no per-key driver loop, no broadcast of the big side.
  Skew in the key column is handled by AQE; the window state per key is a
  single row (the running "latest right"), so memory is O(1) per key.
- `sessionize` is lag + running sum over (key, ts) — also one shuffle, and
  the session aggregation reuses the same partitioning (no second
  exchange before the groupBy on (key, session_id) because the window
  already partitioned by key — Catalyst reuses the exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    right_cols: tuple[str, ...] = ("ts", "value"),
    right_prefix: str = "r_",
    seq_col: str = "event_id",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    `right.ts <= left.ts` for the same key (point-in-time correctness — no
    lookahead). Ties at identical ts: the right row IS visible to the left
    row, and among multiple same-ts right rows the one with the largest
    `seq_col` wins (deterministic).

    Implementation: union-tag + window, not a range join — see module
    docstring for why this is the 100 TB-safe plan.
    """
    # deterministic: one right row per (key, ts) — greatest seq wins
    w_dedup = Window.partitionBy(key_col, ts_col).orderBy(F.col(seq_col).desc())
    r = (
        right.withColumn("_rn", F.row_number().over(w_dedup))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    lcols = left.columns
    tagged_left = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(right_prefix + c) for c in right_cols],
    )
    tagged_right = r.select(
        *[
            F.col(c).alias(c) if c in (key_col, ts_col) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(right_prefix + c) for c in right_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)

    # right rows (tag 0) sort before left rows (tag 1) at equal ts, so a
    # same-ts right row is visible to the left row.
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols,
        F.col("_side"),
        *[
            F.last(right_prefix + c, ignorenulls=True).over(w).alias(right_prefix + c)
            for c in right_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).drop("_side")


def sessionize(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    gap: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since the
    key's previous event is strictly greater than `gap`. Returns the input
    plus a `session_id` column (0-based per key, ordered by ts then seq)."""
    gap_expr = F.expr(f"INTERVAL {gap}")
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(seq_col))
    prev_ts = F.lag(ts_col).over(w)
    new_session = F.when(
        prev_ts.isNull() | (F.col(ts_col) > prev_ts + gap_expr), 1
    ).otherwise(0)
    return events.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    radius_s: float = 300.0,
    right_cols: tuple[str, ...] = ("event_id", "ts"),
    right_prefix: str = "r_",
) -> DataFrame:
    """Band/interval join: every right row whose timestamp lies within
    `radius_s` seconds of a left row's, same key. The naive formulation is a
    theta join (`abs(l.ts - r.ts) <= r`) which Spark can only execute as a
    per-key cross product; this is the 100 TB-safe *banded equi-join*:

    - bucket both sides by `floor(unix_micros(ts) / radius_us)`;
    - a right row within the radius lives in the left row's bucket or an
      adjacent one, so the left side explodes to 3 bucket keys — a constant
      3x, independent of data size;
    - equi-join on (key, bucket) — an ordinary shuffle hash join that AQE
      can re-plan and skew-split — then filter the exact |delta| <= radius.

    Bucket width = radius keeps per-bucket population proportional to event
    rate x radius; the exchange carries hash keys, never a range predicate,
    so join selection stays Catalyst-native. Returns every left column plus
    `right_prefix`-prefixed `right_cols` (inner join: left rows with no
    neighbor drop out; wrap with a left join downstream if needed).
    """
    radius_us = int(radius_s * 1_000_000)
    l_b = F.floor(F.unix_micros(F.col(ts_col)) / F.lit(radius_us))
    lcols = left.columns
    lx = left.select(
        *lcols,
        F.explode(F.array(l_b - 1, l_b, l_b + 1)).alias("_bucket"),
    )
    rx = right.select(
        F.col(key_col).alias("_rkey"),
        F.floor(F.unix_micros(F.col(ts_col)) / F.lit(radius_us)).alias("_bucket"),
        F.col(ts_col).alias("_rts"),
        *[F.col(c).alias(right_prefix + c) for c in right_cols],
    )
    return (
        lx.join(rx, (F.col(key_col) == F.col("_rkey")) & (lx["_bucket"] == rx["_bucket"]))
        .filter(
            F.abs(F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("_rts")))
            <= F.lit(radius_us)
        )
        .drop("_bucket", "_rkey", "_rts")
    )


def session_stats(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    gap: str = "30 minutes",
) -> DataFrame:
    """Per-session aggregates: event count, duration in seconds, total value.
    The groupBy reuses the sessionize window's hash partitioning on key_col
    (no extra shuffle: groupBy keys are a superset including key_col)."""
    s = sessionize(events, key_col=key_col, ts_col=ts_col, seq_col=seq_col, gap=gap)
    return s.groupBy(key_col, "session_id").agg(
        F.count("*").alias("n_events"),
        F.round(
            (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col)))
            / 1_000_000.0,
            6,
        ).alias("duration_s"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def trailing_user_features(
    events: DataFrame,
    *,
    id_col: str = "event_id",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_s: int = 3600,
) -> DataFrame:
    """Per-event trailing-window features — the point-in-time feature
    generation of a training pipeline (each example sees only its past,
    so no label leakage): count and value-sum over the trailing
    `window_s` seconds per user, plus the gap to the previous event.

    One shuffle on user_id serves all three windows. The RANGE frame is
    ordered by epoch microseconds (peers at the same timestamp are all
    included — identical semantics in Spark and DuckDB); the lag frame
    breaks timestamp ties by event id, so the gap is deterministic under
    any partitioning. At 100 TB this is the standard windowed-feature
    shape: partition by entity, order by time, bounded frame — Spark
    keeps only the frame's rows in memory per key."""
    ts_us = F.unix_micros(F.col(ts_col))
    span = int(window_s) * 1_000_000
    w_range = (
        Window.partitionBy(user_col).orderBy(ts_us).rangeBetween(-span, 0)
    )
    w_row = Window.partitionBy(user_col).orderBy(ts_us, F.col(id_col))
    return events.select(
        F.col(id_col),
        F.col(user_col),
        ts_us.cast("long").alias("ts_us"),
        F.count(F.lit(1)).over(w_range).cast("long").alias("n_1h"),
        F.round(F.sum(value_col).over(w_range), 4).alias("sum_1h"),
        # -1 (not NULL) for a user's first event: a nullable integer column
        # surfaces as float64 through pandas/Arrow and breaks exact
        # cross-engine comparison; -1 keeps the column int64 end-to-end
        F.coalesce(ts_us - F.lag(ts_us).over(w_row), F.lit(-1))
        .cast("long")
        .alias("gap_us"),
    )
