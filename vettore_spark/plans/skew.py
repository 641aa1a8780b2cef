"""Skew-handling primitives: salting for hot keys.

AQE's skew-join splitting handles most cases at runtime
(`spark.sql.adaptive.skewJoin.enabled`), but two shapes still need manual
salting at 100 TB:

1. **Skewed aggregation** — a groupBy where one key holds a large fraction
   of all rows (a boilerplate dedup bucket, a bot user_id in events). AQE
   cannot split a single group. `salted_agg` runs the classic two-phase
   partial: groupBy (key, salt) first (map-side combinable, the hot key
   spreads over `n_salt` reducers), then re-aggregate by key.

2. **Skewed broadcast-side-too-big join** — `salt_join` replicates the
   small side `n_salt` times and salts the big side's key, spreading a hot
   join key over n_salt partitions. Only needed when the small side is too
   big to broadcast AND the key is skewed; otherwise prefer broadcast.

Salts are deterministic (hash of a stable column, not rand()) so retries
and speculative tasks agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(col: Column, n_salt: int) -> Column:
    """Deterministic salt in [0, n_salt): hash of the row's stable column.
    Using a second column (not the skewed key itself!) spreads the hot key's
    rows; hashing the key would put them all in one salt again."""
    return F.pmod(F.xxhash64(col), F.lit(n_salt))


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, str],
    *,
    salt_col: str,
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation. `aggs` maps column -> one of
    sum/count/min/max (the re-aggregatable functions; avg is derived as
    sum+count by the caller). `salt_col` must be a column whose values vary
    within the hot key (an id, a timestamp)."""
    _MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for fn in aggs.values():
        if fn not in _MERGE:
            raise ValueError(f"non-reaggregatable function: {fn!r}")

    phase1_aggs = []
    for c, fn in aggs.items():
        out_name = f"{fn}_{c}"
        col = F.count(c) if fn == "count" else getattr(F, fn)(c)
        phase1_aggs.append(col.alias(out_name))

    salted = df.withColumn("_salt", _salt(F.col(salt_col), n_salt))
    partial = salted.groupBy(*key_cols, "_salt").agg(*phase1_aggs)

    phase2_aggs = [
        _MERGE[fn](f"{fn}_{c}").alias(f"{fn}_{c}") for c, fn in aggs.items()
    ]
    return partial.groupBy(*key_cols).agg(*phase2_aggs)


def salt_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    salt_col: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side deterministically, replicate
    the small side across all salts, join on (key, salt). The hot key's rows
    land in n_salt different partitions instead of one."""
    b = big.withColumn("_salt", _salt(F.col(salt_col), n_salt))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    return b.join(s, on=[on, "_salt"], how=how).drop("_salt")


def skew_report(
    df: DataFrame,
    key_col: str,
    *,
    top_k: int = 5,
) -> DataFrame:
    """The diagnostic run BEFORE reaching for `salted_agg`/`salt_join`:
    the `top_k` heaviest keys with their row share and the ratio to a
    perfectly uniform key (share * n_distinct_keys). A ratio >> 1 on the
    head key is the signature of the single hot group AQE cannot split.

    One aggregation (map-side combinable counts) + a single-row totals
    broadcast + TakeOrderedAndProject for the head — scale-free."""
    counts = df.groupBy(key_col).agg(F.count("*").alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("_total"),
        F.count("*").alias("_n_keys"),
    )
    return (
        counts.join(F.broadcast(totals))
        .select(
            key_col,
            F.col("n_rows").cast("long").alias("n_rows"),
            F.round(F.col("n_rows") / F.col("_total"), 5).alias("share"),
            F.round(
                F.col("n_rows") * F.col("_n_keys") / F.col("_total"), 3
            ).alias("skew_ratio"),
        )
        .orderBy(F.desc("n_rows"), key_col)
        .limit(top_k)
    )
