"""Cross-run agreement statistics.

When two scorers rank the same corpus (an old vs new quality model, a
heuristic vs a learned filter, BM25 vs a dense retriever), the question
"did the ranking actually change?" is a rank-correlation question.
`spearman_by_group` computes Spearman's rho per group with proper
tie handling (average ranks, Pearson-over-ranks), entirely in exact
arithmetic until the final division: average ranks are half-integers, so
every sum in the Pearson formula is exact in doubles for any realistic
group size — the correlation is bit-reproducible across engines, which
is what lets the gate hold it to a DuckDB oracle.

No reference counterpart (vector store, no eval surface) — Spark superset
for pipeline monitoring, like the drift/covariance family.

Scale shape: two rank windows PARTITIONED BY GROUP (each partition is one
group's rows — never a global window), one tie-size aggregate per value,
one final per-group aggregate. Everything shuffles on the group key;
output is O(n_groups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _avg_rank(group_col: str, value_col: str) -> F.Column:
    """Average (fractional) rank of value_col within group_col: ties get
    the mean of the positions they occupy — rank() gives the first
    position, rank() + count(ties) - 1 the last, and the average is their
    midpoint. Exact half-integer arithmetic."""
    w = Window.partitionBy(group_col).orderBy(F.col(value_col).asc())
    ties = Window.partitionBy(group_col, value_col)
    first = F.rank().over(w).cast("double")
    n_tie = F.count(F.lit(1)).over(ties).cast("double")
    return first + (n_tie - F.lit(1.0)) / F.lit(2.0)


def spearman_by_group(
    df: DataFrame,
    *,
    group_col: str,
    x_col: str,
    y_col: str,
    round_digits: int = 5,
) -> DataFrame:
    """Per-group Spearman rank correlation between two score columns.

    Returns (group, n, spearman): rho = Pearson correlation of the
    tie-averaged ranks, computed via the explicit sums formula
    (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2)) so both
    engines evaluate the identical expression over exact half-integer
    rank sums. Groups where either column is constant (zero rank
    variance) return NULL — correlation is undefined there, and NULL says
    so louder than a sentinel 0.0.

    Rows where x_col or y_col is NULL are EXCLUDED before ranking (and
    from n): a NULL score carries no rank information, and engines
    disagree on NULL sort order (Spark asc sorts NULLs first, DuckDB
    last), so ranking them would silently skew rho differently per
    engine. A group whose every row is NULL-scored still gets its output
    row — (group, n=0, spearman NULL) — the same undefined-is-NULL
    contract as zero-variance groups, never a silently missing group."""
    groups = df.select(F.col(group_col)).distinct()
    df = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    ranked = df.select(
        F.col(group_col),
        _avg_rank(group_col, x_col).alias("_rx"),
        _avg_rank(group_col, y_col).alias("_ry"),
    )
    agg = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum("_rx").alias("_sx"),
        F.sum("_ry").alias("_sy"),
        F.sum(F.col("_rx") * F.col("_rx")).alias("_sxx"),
        F.sum(F.col("_ry") * F.col("_ry")).alias("_syy"),
        F.sum(F.col("_rx") * F.col("_ry")).alias("_sxy"),
    )
    num = F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    vx = F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    vy = F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy")
    out = agg.select(
        F.col(group_col),
        F.col("_n").cast("long").alias("n"),
        F.round(
            F.when(
                (vx > 0) & (vy > 0), num / F.sqrt(vx * vy)
            ),
            round_digits,
        ).alias("spearman"),
    )
    # re-attach groups the NULL filter emptied: (group, 0, NULL)
    return groups.join(out, group_col, "left").select(
        F.col(group_col),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        F.col("spearman"),
    )
