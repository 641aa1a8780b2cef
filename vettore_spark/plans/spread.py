"""Input spreading for expensive per-row map stages.

A parquet file with one row group is ONE partition — Spark cannot split
below row-group granularity — so any expensive projection or explode that
evaluates inside the scan task runs on a single core no matter how many the
session has. Operators whose map side dominates (per-position hashing,
token explosion, Python inference) repartition a NARROW projection of the
input first; at real scale the input is already wider than the session's
parallelism and the branch is a no-op.

Two caveats carried from hard-won bugs (see also dedup._shingle_base):
- repartition the RAW columns, not the derived ones — shuffling raw text is
  usually fewer bytes than shuffling shingle/gram arrays;
- when the expensive work is a Project (not a Generate), ColumnPruning can
  push it BELOW the new exchange, un-parallelizing it again; callers guard
  with a non-deterministic pin column in the same projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_narrow(df: DataFrame, cols: list[str]) -> DataFrame:
    """`df.select(cols)`, round-robin repartitioned to the session's shuffle
    parallelism when the input has fewer partitions."""
    spark = df.sparkSession
    target = int(spark.conf.get("spark.sql.shuffle.partitions", "32") or 32)
    src = df.select(*cols)
    if src.rdd.getNumPartitions() < target:
        src = src.repartition(target)
    return src
