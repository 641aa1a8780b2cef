"""Durability-aware lineage truncation.

Iterative operators (connected components) and long-lived unions
(Collection ingest) must cut lineage periodically or every downstream
action pays Catalyst re-analysis over an ever-growing plan tree. HOW the
cut is taken decides what an executor loss costs on a real cluster:

- ``checkpoint()`` writes the rows to the reliable checkpoint directory
  (HDFS/S3): blocks survive any executor loss. The right cut whenever the
  session has one configured (``sc.setCheckpointDir``).
- ``localCheckpoint()`` stores blocks in executor memory/disk only. On a
  ``local[*]`` master that is as durable as the driver itself, but on a
  cluster ONE lost executor permanently loses blocks and fails the job —
  there is no lineage left to recompute from.

This ladder is the policy ``Collection.put_many`` applies to the canonical
row store (collection.py); ``durable_cut`` shares it with every other
lineage-cut site so an iterative job does not silently downgrade
durability on a cluster.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame

_warned = False


def durable_cut(df: DataFrame, *, eager: bool = False) -> DataFrame:
    """Truncate `df`'s lineage with the most durable mechanism available.

    Reliable ``checkpoint()`` when the session has a checkpoint dir;
    ``localCheckpoint()`` on local masters (single-JVM: executor loss ==
    driver loss, so local blocks are as durable as the process). On a
    cluster WITHOUT a checkpoint dir the only remaining cut is a local
    checkpoint — taken, but with a one-time warning, because a lost
    executor then fails the job mid-iteration (the caller should
    ``sc.setCheckpointDir(...)`` in production).
    """
    global _warned
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    if sc.master.startswith("local"):
        return df.localCheckpoint(eager=eager)
    if not _warned:
        warnings.warn(
            "lineage cut on a cluster without a checkpoint directory: "
            "falling back to localCheckpoint — an executor loss will fail "
            "the job. Call spark.sparkContext.setCheckpointDir(...) for a "
            "fault-tolerant cut.",
            stacklevel=2,
        )
        _warned = True
    return df.localCheckpoint(eager=eager)
