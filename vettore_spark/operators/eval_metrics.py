"""Retrieval-evaluation metrics over ranked runs + relevance labels.

The eval side of a retrieval/curation pipeline: given a RUN (per-query
ranked candidates, the output shape of bm25_batch_topk / multi_query_topk /
rrf_fuse) and QRELS (graded relevance labels), compute the standard IR
metrics per query — precision@k, recall@k, reciprocal rank, nDCG@k
(Järvelin-Kekäläinen gain 2^rel − 1, log2 discount).

No reference counterpart (the reference is a vector store without an eval
surface); this is part of the Spark superset a training-data pipeline
needs: retrieval quality is what selection/curation operators are tuned
against, and an engine that computes candidates at 100 TB should score
them in the same plan rather than exporting to a driver-side tool.

Scale shape: one equi-join runs⋈qrels on (query, doc) + three per-query
aggregates; the only window runs over QRELS PARTITIONED BY QUERY (the
ideal-DCG ranking — each partition is one query's labeled set, never the
corpus). Everything shuffles on query_id once; metric rows out are
O(n_queries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def retrieval_metrics(
    runs: DataFrame,
    qrels: DataFrame,
    *,
    k: int,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    round_digits: int = 5,
) -> DataFrame:
    """Per-query IR metrics from a ranked run and graded relevance.

    `runs`: (query_id, doc_id, rank) with rank 1-based; rows past `k` are
    ignored. `qrels`: (query_id, doc_id, rel) with graded rel >= 0; a
    (query, doc) pair absent from qrels counts as rel 0. Queries present
    in `runs` but with NO positive qrel row get recall/RR/nDCG 0.0 (not
    null) — a run over an unlabeled query is measurably useless, not
    unmeasurable. Likewise a query whose run rows ALL sit past rank `k`
    still gets its row, with every metric 0 (zero-filled from the run's
    distinct query set) — one output row per run query, always.

    Returns one row per run query: (query_id, hits, precision_at_k,
    recall_at_k, rr, ndcg_at_k), metrics rounded to `round_digits` so the
    values are hash-stable across engines.
    """
    q, d, r = query_id_col, id_col, rank_col
    run_k = runs.filter(F.col(r) <= k).select(q, d, r)
    # NaN stance (NANPOLICY.md): a non-finite relevance label is IGNORED
    # (treated as unlabeled), never scored — Spark's total ordering would
    # otherwise let `NaN > 0` pass the positive filter, rank the NaN row
    # FIRST in the ideal-DCG desc window (2^NaN poisons the whole query's
    # nDCG to NaN), and under ANSI mode the long cast on a NaN double
    # ABORTS the job outright: one malformed label row killing a 100 TB
    # eval run.
    rel = F.col(rel_col).cast("double")
    qrels = qrels.filter(
        rel.isNull() | (~F.isnan(rel) & (F.abs(rel) != float("inf")))
    )
    labeled = run_k.join(
        qrels.select(q, d, F.col(rel_col).cast("long").alias("_rel")),
        [q, d],
        "left",
    ).withColumn("_rel", F.coalesce(F.col("_rel"), F.lit(0)))

    gain = F.pow(F.lit(2.0), F.col("_rel").cast("double")) - F.lit(1.0)
    disc = F.log2(F.col(r).cast("double") + F.lit(1.0))
    per_run = labeled.groupBy(q).agg(
        F.sum(F.when(F.col("_rel") > 0, 1).otherwise(0))
        .cast("long")
        .alias("hits"),
        F.max(
            F.when(F.col("_rel") > 0, F.lit(1.0) / F.col(r).cast("double"))
        ).alias("_rr"),
        F.sum(gain / disc).alias("_dcg"),
    )

    pos = qrels.filter(F.col(rel_col) > 0)
    totals = pos.groupBy(q).agg(F.count("*").cast("long").alias("_npos"))
    # ideal DCG: the query's OWN labels ranked by rel desc (doc tie-break
    # is for rank stability only — equal rels contribute identical gains
    # at the same positions regardless of which doc holds them)
    w = Window.partitionBy(q).orderBy(
        F.col(rel_col).desc(), F.col(d).asc()
    )
    ideal = (
        pos.withColumn("_irank", F.row_number().over(w))
        .filter(F.col("_irank") <= k)
        .groupBy(q)
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col(rel_col).cast("double")) - F.lit(1.0))
                / F.log2(F.col("_irank").cast("double") + F.lit(1.0))
            ).alias("_idcg")
        )
    )

    # zero-fill: every run query gets a row even when all its run rows sit
    # past rank k (per_run would drop it — the rank<=k filter removed every
    # input row for that query)
    run_queries = runs.select(q).distinct()
    per_run = run_queries.join(per_run, q, "left").select(
        F.col(q),
        F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
        F.col("_rr"),
        F.coalesce(F.col("_dcg"), F.lit(0.0)).alias("_dcg"),
    )

    out = (
        per_run.join(totals, q, "left")
        .join(ideal, q, "left")
        .select(
            F.col(q),
            F.col("hits"),
            F.round(F.col("hits").cast("double") / F.lit(float(k)), round_digits)
            .alias("precision_at_k"),
            F.round(
                F.when(
                    F.col("_npos").isNotNull() & (F.col("_npos") > 0),
                    F.col("hits").cast("double") / F.col("_npos").cast("double"),
                ).otherwise(F.lit(0.0)),
                round_digits,
            ).alias("recall_at_k"),
            F.round(F.coalesce(F.col("_rr"), F.lit(0.0)), round_digits).alias(
                "rr"
            ),
            F.round(
                F.when(
                    F.col("_idcg").isNotNull() & (F.col("_idcg") > 0),
                    F.col("_dcg") / F.col("_idcg"),
                ).otherwise(F.lit(0.0)),
                round_digits,
            ).alias("ndcg_at_k"),
        )
    )
    return out
