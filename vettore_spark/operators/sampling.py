"""Deterministic sampling / splitting / sharding for training-data pipelines.

Everything here derives its randomness from `md5(salt || key)` — a pure
per-row expression, so:

- results are identical across runs, engines, partitionings, retries, and
  speculative task attempts (unlike `df.sample`, whose output depends on
  partition layout and the per-partition RNG stream);
- any SQL engine can reproduce the decision (the hex digest compares
  lexicographically), so the DuckDB oracle verifies bit-for-bit;
- adding/removing rows never flips the decision for unrelated rows —
  samples are stable under corpus growth (critical when resampling a
  100 TB corpus incrementally).

No shuffle is introduced by sampling or splitting (row-local predicates).
`shard_assign` + `write_shards` is the global-shuffle primitive: the hash
ensures shard sizes concentrate tightly around n/num_shards regardless of
input order or skew in the key distribution's *values* (only key
*duplicates* skew a shard, which ids don't have).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_DIGITS = 8  # 32 bits of the digest: resolution 1/2^32 ~ 2.3e-10


def _bucket_hex(key: Column, salt: str) -> Column:
    """First 8 hex chars of md5(salt || key) — the row's uniform draw in
    [0, 16^8), encoded as lowercase hex (lexicographic order == numeric)."""
    return F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, _HEX_DIGITS)


def _threshold_hex(fraction: float) -> str:
    f = min(max(float(fraction), 0.0), 1.0)
    v = int(round(f * (16**_HEX_DIGITS)))
    if v >= 16**_HEX_DIGITS:
        # fraction 1.0: any string sorting after every hex digest ('g' > 'f')
        return "g"
    return format(v, f"0{_HEX_DIGITS}x")


def sample_predicate(key: Column | str, fraction: float, *, salt: str = "") -> Column:
    """Boolean column: does this row fall in a deterministic `fraction`
    sample keyed on `key`? SQL twin:
    `substr(md5(salt || key), 1, 8) < '<threshold_hex>'`."""
    c = F.col(key) if isinstance(key, str) else key
    return _bucket_hex(c, salt) < F.lit(_threshold_hex(fraction))


def deterministic_sample(
    df: DataFrame, fraction: float, *, key_col: str, salt: str = ""
) -> DataFrame:
    """Keep a deterministic, engine-reproducible `fraction` of rows."""
    return df.filter(sample_predicate(key_col, fraction, salt=salt))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    *,
    strata_col: str,
    key_col: str,
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample dominant
    languages, keep all of rare ones). `fractions` maps stratum value ->
    keep fraction; strata not listed keep `default_fraction`."""
    thr = F.lit(_threshold_hex(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == F.lit(value), F.lit(_threshold_hex(frac))
        ).otherwise(thr)
    return df.filter(_bucket_hex(F.col(key_col), salt) < thr)


def train_test_split(
    df: DataFrame, *, key_col: str, test_fraction: float = 0.1, salt: str = "split"
) -> DataFrame:
    """Adds a `split` column ('train'/'test') — stable under corpus growth:
    a row's split never changes when other rows come or go."""
    return df.withColumn(
        "split",
        F.when(
            sample_predicate(key_col, test_fraction, salt=salt), F.lit("test")
        ).otherwise(F.lit("train")),
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    test_fraction: float = 0.1,
    salt: str = "split",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Train/test split that can never leak near-duplicates across the
    boundary: the split draw is keyed on the near-dup CLUSTER representative
    (connected-components min id over `pairs`), so every member of a
    duplicate family lands in the same split; docs in no pair draw on their
    own id (singleton clusters). Same md5-draw determinism as
    train_test_split — growth-stable and engine-reproducible.

    This is the split every contrastive / eval-honest pipeline needs: a
    plain per-doc split puts one copy of a near-dup pair in train and its
    twin in test, silently inflating eval scores.

    Plan: one CC run over the sparse pair graph (O(log n) keyed shuffles,
    see connected_components), a left join of the assignment (bounded by
    docs-in-pairs, usually ≪ corpus — AQE broadcasts when small), then the
    digest predicate. Returns df + `split` column.
    """
    from vettore_spark.operators.dedup import connected_components

    cc = connected_components(pairs, src=src, dst=dst, id_out=id_col)
    j = df.join(cc, id_col, "left")
    group = F.coalesce(F.col("component"), F.col(id_col))
    return j.withColumn(
        "split",
        F.when(
            sample_predicate(group, test_fraction, salt=salt), F.lit("test")
        ).otherwise(F.lit("train")),
    ).drop("component")


def shard_column(key: Column | str, num_shards: int, *, salt: str = "") -> Column:
    """Deterministic shard in [0, num_shards): the 32-bit digest prefix
    mod num_shards. Reproducible in SQL by folding the 8 hex chars."""
    c = F.col(key) if isinstance(key, str) else key
    return (F.conv(_bucket_hex(c, salt), 16, 10).cast("long") % num_shards).cast(
        "int"
    )


def shard_assign(
    df: DataFrame, num_shards: int, *, key_col: str, salt: str = ""
) -> DataFrame:
    return df.withColumn("shard", shard_column(key_col, num_shards, salt=salt))


def write_shards(
    df: DataFrame,
    path: str,
    num_shards: int,
    *,
    key_col: str,
    salt: str = "",
    format: str = "parquet",
) -> None:
    """Globally-shuffled training shards: one exchange hash-partitioned on
    the shard id, rows ordered within a shard by their digest (a uniform
    deterministic permutation — the 'global shuffle' a trainer wants,
    without a random sort key that breaks retry idempotence). Written
    partitioned by shard so a loader can read any subset of shards with
    partition pruning."""
    keyed = df.withColumn(
        "shard", shard_column(key_col, num_shards, salt=salt)
    ).withColumn("_ord", _bucket_hex(F.col(key_col), salt + "#ord"))
    # sort key is (shard, _ord), not _ord alone: the partitioned file writer
    # requires ordering by the partition column and would insert its own
    # Sort[shard] — letting EliminateSorts drop a bare Sort[_ord] entirely.
    # The composite sort satisfies the writer's requirement as a prefix, so
    # the digest permutation survives into the files.
    (
        keyed.repartition(num_shards, "shard")
        .sortWithinPartitions("shard", "_ord")
        .drop("_ord")
        .write.format(format)
        .partitionBy("shard")
        .mode("overwrite")
        .save(path)
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    *,
    weight_col: str,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, A-ES): every row draws u = uniform(0,1] from
    md5(salt || key) and ranks by u^(1/w) — equivalently ln(u)/w, the
    monotone form used here — and the k largest keys win. Inclusion
    probability is proportional-to-size without replacement; the heavy
    rows' advantage is exactly the exponential-clocks construction
    (ln(u)/w ~ -Exp(rate w)).

    Spark shape: a row-local expression then ONE TakeOrderedAndProject
    (per-partition k-heaps merged on the driver) — no shuffle, no window,
    no RNG state; identical across runs, partitionings, and retries, and
    reproducible in ANSI SQL (the oracle covers it).

    Rows with weight <= 0, NULL, or NaN never qualify. Output: the input
    columns plus `sample_key` (the ranking key, 8 dp).

    The NaN guard is load-bearing (r12): Spark orders NaN GREATER than
    every number, so `NaN > 0` passes the filter and log(u)/NaN = NaN
    then sorts FIRST under desc — a NaN-weight row would be GUARANTEED
    selection instead of excluded (the malformed-rows-win class the r11
    rank-key fix closed for search)."""
    if k < 1:
        raise ValueError("weighted_sample needs k >= 1")
    from vettore_spark.operators.sketch import hash60, _DOMAIN

    w = F.col(weight_col).cast("double")
    u = (hash60(key_col, salt=salt).cast("double") + F.lit(0.5)) / F.lit(_DOMAIN)
    key = F.log(u) / w
    return (
        df.filter((w > 0) & ~F.isnan(w))
        .withColumn("sample_key", F.round(key, 8))
        .orderBy(F.col("sample_key").desc(), F.col(key_col).asc())
        .limit(k)
    )


def mod_sample_predicate(key: Column | str, one_in: int, *, salt: str = "") -> Column:
    """Boolean column: does this KEY fall in the deterministic 1-in-N
    systematic hash sample? hash60(key) % one_in == 0 — every row of a
    sampled key qualifies (consistent / congruential sampling: per-key
    statistics stay unbiased because keys, not rows, are drawn). SQL
    twin: `('0x' || substr(md5(key), 1, 15))::BIGINT % one_in = 0`."""
    if one_in < 1:
        raise ValueError("one_in must be >= 1")
    from vettore_spark.operators.sketch import hash60

    return hash60(key, salt=salt) % F.lit(one_in) == F.lit(0)


def approx_rollup(
    df: DataFrame,
    *,
    key_col: str,
    one_in: int,
    group_by: list[str],
    sum_cols: list[str] | None = None,
    salt: str = "",
    precision: int = 2,
) -> DataFrame:
    """Approximate per-group rollup from a 1-in-N deterministic hash
    sample of KEYS — the 100 TB answer when the rollup is run constantly
    (dashboards, data-quality monitors) and a ~1/sqrt(n_sampled_keys)
    relative error is acceptable: the scan reads 1/N of the rows (the
    sample predicate is a pushable deterministic filter — at scale the
    sample lives as its own materialized 1-in-N table and the rollup
    never touches the full fact table at all).

    Estimates scale by the EXACT integer N (no float scale factor):
      est_rows     = count(*) * N                     (long, exact arith)
      est_keys     = count(distinct key) * N          (long)
      est_sum_<c>  = round(sum(decimal(c)) * N, p)    (decimal -> double;
                     decimal sums are order-free, so the engines agree)
    Deterministic end to end — same md5 key draw as every sampler here —
    so a SQL engine reproduces each estimate bit-for-bit and the
    correctness gate covers it like an exact query. Measured error vs the
    exact rollup is in SCALE.md.
    """
    scols = list(sum_cols or [])
    sampled = df.filter(mod_sample_predicate(key_col, one_in, salt=salt))
    aggs = [
        (F.count(F.lit(1)) * F.lit(one_in)).cast("long").alias("est_rows"),
        (F.count_distinct(F.col(key_col)) * F.lit(one_in))
        .cast("long")
        .alias("est_keys"),
    ]
    for c in scols:
        aggs.append(
            F.round(
                F.sum(F.col(c).cast("decimal(18,6)")) * F.lit(one_in),
                precision,
            )
            .cast("double")
            .alias(f"est_sum_{c}")
        )
    return sampled.groupBy(*group_by).agg(*aggs)
