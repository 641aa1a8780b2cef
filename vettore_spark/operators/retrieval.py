"""Lexical retrieval and rank fusion for hybrid (text + vector) search.

The reference's hybrid_search fuses two VECTOR stages (binary prefilter +
exact rerank, search.rs hybrid path); a training-data/RAG pipeline also
needs the text side: BM25 lexical scoring and reciprocal-rank fusion of
heterogeneous rankings (BM25 + dense cosine) — the standard hybrid-retrieval
composition. Both are built as pure DataFrame plans.

Scale design (100 TB):
- BM25 over a *literal query term list* is one narrow map pass: per-doc term
  frequencies come from `F.filter` over the token array (no doc×term explode,
  no shuffle), corpus statistics (N, avgdl, per-term df) are a single scalar
  aggregate broadcast back via a 1-row cross join. The only wide exchange is
  the final top-k, which compiles to TakeOrderedAndProject (bounded
  per-partition heaps). Cost: one corpus scan + one scalar reduce.
- For *ad-hoc* query sets the same shape holds per query; a query BATCH
  (many queries at once) would explode query terms and inverted-index join —
  that variant is `bm25_batch` territory and intentionally out of scope here
  (the gate exercises the literal-terms path the reference's API shape
  implies: one query per call).
- RRF is rank-domain: each input ranking is already top-N (driver-bounded,
  N ≤ 10^3); the union + groupBy(id) shuffle carries ≤ Σ N rows. Fusing in
  rank domain sidesteps score-scale mismatches between BM25 and cosine.

Determinism: ranks are assigned over ROUNDED scores (5 dp) with id
tie-breaks, so f64 noise below the rounding grain cannot flip a rank in
either engine (the DuckDB oracle ranks the same rounded values).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vettore_spark.operators.dedup import tokens
from vettore_spark.plans.spread import spread_narrow


def _term_tf(toks: Column, term: str) -> Column:
    """Occurrences of `term` in the token array (case-insensitive)."""
    t = term.lower()
    return F.size(F.filter(toks, lambda x: F.lower(x) == t)).cast("long")


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-document BM25 score for a literal query term list.

    idf(t) = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))   (Lucene/Robertson)
    score  = Σ_t idf_t · tf_t·(k1+1) / (tf_t + k1·(1 − b + b·dl/avgdl))

    Physical plan: one corpus scan computing (dl, tf_t...) per row, one
    scalar aggregate for (N, Σdl, df_t...), broadcast 1-row cross join,
    then the score expression. Docs matching no term are dropped.
    The per-term products are summed in query_terms order in BOTH engines,
    so double addition order is fixed.
    """
    from vettore_spark.plans.cache import cached_persist

    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    toks = tokens(text_col)
    # (id, dl, tf...) is consumed twice (corpus stats + scoring) and reused
    # across repeated queries with the same term set — persist the narrow
    # projection so the tokenizing scan runs once (resident term-stats
    # table, the BM25 analog of the reference's derived-index residency).
    base = cached_persist(
        df,
        ("bm25_base", id_col, text_col, tuple(terms)),
        lambda s: spread_narrow(s, [id_col, text_col]).select(
            F.col(id_col),
            F.size(toks).cast("long").alias("_dl"),
            *[_term_tf(toks, t).alias(f"_tf{i}") for i, t in enumerate(terms)],
            F.monotonically_increasing_id().alias("_pin"),
        ).drop("_pin"),
    )
    stats = base.agg(
        F.count("*").cast("long").alias("_n"),
        F.sum("_dl").cast("long").alias("_sdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    joined = base.crossJoin(F.broadcast(stats))
    # Degenerate-corpus rail (NANPOLICY.md): every row that can survive
    # the n_matched_terms filter has tf >= 1, hence _sdl >= 1 — but
    # whether the filter is evaluated BELOW this projection is a plan
    # choice, and under Spark 4 ANSI a dl/avgdl with avgdl == 0 (all
    # documents empty) would abort the job. NULL-guard avgdl so the
    # score expression is total: NULL propagates (never aborts, never
    # ranks) and no surviving row's value changes.
    avgdl = F.when(
        F.col("_sdl") > 0,
        F.col("_sdl").cast("double") / F.col("_n").cast("double"),
    )
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("_dl").cast("double") / avgdl
    )
    parts = []
    for i in range(len(terms)):
        tf = F.col(f"_tf{i}").cast("double")
        dfi = F.col(f"_df{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n").cast("double") - dfi + F.lit(0.5)) / (dfi + F.lit(0.5))
        )
        parts.append(idf * tf * F.lit(k1 + 1.0) / (tf + norm))
    score = parts[0]
    for p in parts[1:]:
        score = score + p
    matched = sum(
        (F.col(f"_tf{i}") > 0).cast("int") for i in range(len(terms))
    )
    return (
        joined.select(
            F.col(id_col),
            score.alias("bm25"),
            matched.cast("long").alias("n_matched_terms"),
        )
        .filter(F.col("n_matched_terms") > 0)
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k BM25 (rounded-score ordering, id tie-break) with a dense rank.

    The sort key is the 5-dp-rounded score so the oracle's ranking over the
    same rounded values is identical; TakeOrderedAndProject keeps the
    exchange at k·partitions rows.
    """
    scored = bm25_scores(
        df, query_terms, id_col=id_col, text_col=text_col, k1=k1, b=b
    ).withColumn("bm25", F.round(F.col("bm25"), 5))
    out = scored.orderBy(F.col("bm25").desc(), F.col(id_col).asc()).limit(k)
    # rank within the collected top-k (k is driver-small by contract)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("bm25").desc(), F.col(id_col).asc())
    return out.withColumn("rank", F.row_number().over(w).cast("long"))


def bm25_batch_topk(
    df: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_terms_col: str = "terms",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Batched BM25: many queries at once via the inverted-index join — the
    scale shape the single-query literal-terms path (bm25_scores) trades
    away. Queries arrive as (query_id, terms array<string>).

    Physical plan: explode corpus tokens → tf per (doc, term) (one shuffle,
    map-side combined) → df per term → join the exploded query-term table
    on term (query side broadcast — query batches are driver-bounded) →
    per-(query, doc) score sum → windowed top-k with WindowGroupLimit
    pushdown. Corpus-side work is shared across ALL queries: the tf/df
    tables are built once per corpus, not per query.

    Returns (query_id, id, bm25, n_matched_terms, rank ≤ k) with the same
    scoring formula and rounded-rank determinism as bm25_topk.
    """
    from pyspark.sql import Window

    from vettore_spark.plans.cache import cached_persist

    toks = tokens(text_col)
    tf = cached_persist(
        df,
        ("bm25_tf", id_col, text_col),
        lambda s: spread_narrow(s, [id_col, text_col])
        .select(
            F.col(id_col), F.explode(F.transform(toks, F.lower)).alias("_term")
        )
        .groupBy(id_col, "_term")
        .agg(F.count("*").cast("long").alias("_tf")),
    )
    dl = cached_persist(
        df,
        ("bm25_dl", id_col, text_col),
        lambda s: s.select(
            F.col(id_col), F.size(toks).cast("long").alias("_dl")
        ),
    )
    # document frequency is corpus state, not query state: without its own
    # persist every execution re-aggregates the full tf table (vocab-wide
    # shuffle) just to look up the handful of query terms — measured ~0.6 s
    # of bm25_batch's ~1.0 s per run at sf0.1. Keyed on the same source df
    # as tf, so the mutation-eviction rules cover it identically.
    dfreq = cached_persist(
        df,
        ("bm25_df", id_col, text_col),
        lambda s: tf.groupBy("_term").agg(
            F.count("*").cast("long").alias("_df")
        ),
    )
    stats = dl.agg(
        F.count("*").cast("long").alias("_n"),
        F.sum("_dl").cast("long").alias("_sdl"),
    )
    # NOT distinct: a term repeated in the query contributes once per
    # occurrence, matching bm25_scores' per-term summation exactly
    qterms = queries.select(
        F.col(query_id_col),
        F.explode(
            F.transform(F.col(query_terms_col), F.lower)
        ).alias("_term"),
    )
    j = (
        tf.join(F.broadcast(qterms), "_term")
        .join(dfreq, "_term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
    )
    n_d = F.col("_n").cast("double")
    # Same degenerate-corpus rail as bm25_scores: joined rows imply
    # _sdl >= 1, but guard anyway so the expression is ANSI-total.
    avgdl = F.when(F.col("_sdl") > 0, F.col("_sdl").cast("double") / n_d)
    dfi = F.col("_df").cast("double")
    tf_d = F.col("_tf").cast("double")
    idf = F.log(F.lit(1.0) + (n_d - dfi + F.lit(0.5)) / (dfi + F.lit(0.5)))
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("_dl").cast("double") / avgdl
    )
    contrib = idf * tf_d * F.lit(k1 + 1.0) / (tf_d + norm)
    scored = (
        j.groupBy(query_id_col, id_col)
        .agg(
            F.round(F.sum(contrib), 5).alias("bm25"),
            F.count("*").cast("long").alias("n_matched_terms"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("bm25").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    *,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    topk: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion: score(id) = Σ_r 1/(k + rank_r(id)).

    Each input is a (id, rank) DataFrame (top-N, rank 1-based). Union +
    groupBy(id) — one shuffle bounded by Σ N rows. Ties broken by id.
    Returns (id, rrf, n_lists) ordered by (rrf desc, id), rrf rounded 6 dp.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    parts = [
        r.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col).cast("double"))).alias(
                "_c"
            ),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = (
        u.groupBy(id_col)
        .agg(
            F.round(F.sum("_c"), 6).alias("rrf"),
            F.count("*").cast("long").alias("n_lists"),
        )
        .orderBy(F.col("rrf").desc(), F.col(id_col).asc())
    )
    return fused.limit(topk) if topk is not None else fused
