"""Iterative graph centrality: weighted PageRank (power iteration) and
TextRank keyword extraction over the token-adjacency graph.

The second iterative-dataflow family next to connected components
(operators/dedup.py::connected_components): each iteration is ONE
shuffle — an equi-join of the current rank vector against the edge list
plus a grouped sum — and the rank vector (O(nodes), far smaller than
edges) is the only state carried between iterations. Lineage is cut every
`cut_every` rounds through plans/checkpoint.py::durable_cut, the same
ladder the CC loop uses, so a 10-iteration run on a cluster neither
re-executes the whole chain per action nor dies with a lost executor.

Determinism contract (what makes these ORACLE-GATED, not rows-only, even
though power iteration is nominally a floating-point algorithm): the
iteration runs in FIXED-POINT INTEGER arithmetic. Ranks are scaled by
10^9 and held as longs; per-edge contributions are floor integer
divisions; the damped update is integer multiply + floor division. No
float touches the loop, so there is nothing to differ by an ulp between
engines — Spark and the DuckDB oracle produce bit-identical ranks by
construction. (A first implementation used 9-dp rounded doubles with
decimal sums; it died on a half-boundary where Spark's HALF_UP round and
DuckDB's float round disagreed by one ulp. Integers have no boundaries.)
The quantization error per iteration is < 1e-9 per edge — far below the
estimator's own convergence tolerance at 10 iterations.

TextRank: Mihalcea & Tarau, EMNLP 2004 (keyword variant: undirected
co-occurrence graph of adjacent tokens, edge weight = co-occurrence
count). PageRank: Page et al. 1999; the dangling-mass simplification
(dropped, not redistributed) matches the TextRank paper's formulation
where every node keeps the (1-d) floor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vettore_spark.plans.checkpoint import durable_cut, release_cut

# rank scale: ranks live in [0, nodes]; scaled by 1e9 they fit longs with
# room for the (rank * weight) product up to weights ~1e8 on graphs of
# ~1e10 total rank mass. Callers with heavier weights should pre-divide.
SCALE = 1_000_000_000


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
    damping: float = 0.85,
    iters: int = 10,
    cut_every: int = 6,
    driver_max_edges: int = 100_000,
    broadcast_max_edges: int = 2_000_000,
) -> DataFrame:
    """Weighted PageRank by fixed-point power iteration over an edge list.

    R_0(v) = 10^9 (rank 1.0 scaled); per iteration
      S_v   = sum over in-edges (u,v) of (R(u) * w_uv) div outweight_u
      R'(v) = (100 - D) * 10^7 + (D * S_v) div 100
    with D = round(damping*100) — all in long integer arithmetic (div =
    floor division), exact and engine-independent. Nodes are the distinct
    SOURCES (an undirected graph lists both directions, so every node is
    a source; pure sinks in a directed graph contribute but do not
    appear — orient your edges accordingly).

    Returns (node, rank_scaled, rank): the exact fixed-point rank (long,
    scaled 1e9) and its double rendering for humans. Cross-engine
    comparisons should use rank_scaled.

    Tiered execution: when the (persisted) weighted edge table holds at
    most `driver_max_edges` rows, the fixed-point loop runs DRIVER-SIDE
    over the collected edges in exact Python integer arithmetic —
    bit-identical to the distributed update (same floor divisions, and
    integer addition is order-free), pinned by tests against both paths.
    The distributed loop's per-iteration join+aggregate is the right plan
    when the graph is large, but on a small derived graph (a corpus
    vocabulary) 10 iterations of 32-reducer shuffles are pure scheduling
    overhead — ~1 s to iterate a 31-node graph (measured, sf0.1 token
    adjacency). GraphX/Pregel local mode is the same tier split. Set
    driver_max_edges=0 to force the distributed path; 100k edge rows is
    a few MB on the driver. One documented tier asymmetry: the
    distributed product (r * w) is LONG arithmetic — past the module
    weight bound (see SCALE above) ANSI mode raises ARITHMETIC_OVERFLOW
    loudly, while the driver tier's Python integers are unbounded; stay
    inside the bound (or pre-divide weights) for tier-independent runs.

    Broadcast sub-tier of the distributed loop (guide §3.1): the
    contribution table carried between iterations has at most one row
    per node — never more rows than the edge table (every node is a
    source of >= 1 edge) — so when the persisted edge table holds at
    most `broadcast_max_edges` rows, each iteration joins it against a
    BROADCAST of the contribution vector instead of shuffling both
    sides. That removes both join exchanges per iteration (the grouped
    sum's exchange remains — the one fundamentally required shuffle),
    and integer addition is order-free, so the emitted ranks are
    bit-identical to the shuffled formulation. 2M rows of
    (node, long) is tens of MB framed — far inside the 8 GB / 512M-row
    broadcast cap; above the bound the loop falls back to the shuffled
    join unchanged. Set broadcast_max_edges=0 to force the shuffle
    formulation. The single bound-probe count is shared with the
    driver-tier probe (one LIMIT-capped count per call, not two)."""
    if iters < 1:
        raise ValueError("pagerank needs iters >= 1")
    dn = int(round(damping * 100))
    if not 0 < dn < 100:
        raise ValueError("damping must be in (0, 1) at 2-dp resolution")
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    # NULL source ids are not nodes: the out-weight join below is an
    # inner equi-join on _src, so NULL-src edges can never contribute
    # mass in EITHER tier — but before this filter the distributed
    # tier's `nodes = e.distinct()` still emitted a base-rank row for
    # the NULL node while the driver tier (whose node set comes from
    # the collected post-join edges) did not. Dropping them up front
    # makes the two tiers agree on the node set by construction.
    e = edges.select(
        F.col(src).alias("_src"), F.col(dst).alias("_dst"), w.alias("_w")
    ).filter(F.col("_src").isNotNull())
    ow = e.groupBy("_src").agg(F.sum("_w").alias("_ow"))
    # The weighted edge list is read by EVERY iteration (the canonical
    # PageRank persist, cf. the links table in Spark's own examples):
    # persist it once through the keyed registry, so 10 iterations scan a
    # resident table instead of re-deriving the upstream (token explode,
    # co-occurrence aggregation) 10 times — and repeated pagerank calls
    # over the same source reuse the same materialization.
    from vettore_spark.plans.cache import cached_persist

    ej = cached_persist(
        e, ("pagerank_edges", src, dst, weight_col), lambda d: d.join(ow, "_src")
    )
    base = (100 - dn) * (SCALE // 100)
    # one LIMIT-capped probe count decides BOTH tier splits: the cap is
    # the larger of the two bounds, so n_probe is exact wherever either
    # decision needs it and the probe short-circuits past the cap
    probe_cap = max(driver_max_edges, broadcast_max_edges)
    n_probe = ej.limit(probe_cap + 1).count() if probe_cap else None
    if driver_max_edges and n_probe <= driver_max_edges:
        return _pagerank_driver(
            edges.sparkSession,
            ej.collect(),
            node_type=ej.schema["_src"].dataType,
            dn=dn,
            base=base,
            iters=iters,
        )
    bcast = bool(broadcast_max_edges) and n_probe <= broadcast_max_edges
    nodes = e.select(F.col("_src").alias("node")).distinct()
    # Only the CONTRIBUTION table (_n, _m — nodes with in-mass) carries
    # between iterations; a node's rank is always base + (dn*S) div 100
    # with S = 0 when absent, so reconstructing r inline in the next
    # iteration's join saves a nodes-left-join per round (half the
    # shuffle stages of the naive rank-table formulation).
    r_expr = f"({base}L + ({dn} * coalesce(_m, 0L)) div 100)"
    contrib = None
    prev_cut = None
    for i in range(1, iters + 1):
        if contrib is None:
            joined = ej.withColumn("r", F.lit(SCALE).cast("long"))
        else:
            joined = ej.join(
                F.broadcast(contrib) if bcast else contrib,
                F.col("_src") == F.col("_n"),
                "left",
            ).withColumn("r", F.expr(r_expr))
        contrib = joined.groupBy(F.col("_dst").alias("_n")).agg(
            # _ow = 0 (a source whose weights sum to zero) must contribute
            # NULL — which sum() skips — not raise: Spark 4's ANSI mode
            # turns a bare `div 0` into DIVIDE_BY_ZERO mid-aggregation.
            # The driver tier skips the same rows for the same reason.
            F.sum(
                F.expr("CASE WHEN _ow = 0 THEN NULL ELSE (r * _w) div _ow END")
            ).alias("_m")
        )
        if cut_every and i % cut_every == 0 and i < iters:
            # EAGER: a lazy localCheckpoint barrier re-materializes at
            # every downstream action and stacks extra passes (measured
            # 7.2 s lazy vs 2.5 s eager vs 0.8 s uncut for 10 iterations
            # on the sf0.01 token graph); eager pays the cut once and
            # every later iteration reads materialized blocks. Sparse
            # cadence (6): one cut in a default 10-iteration run — enough
            # to bound lineage depth, cheap enough to keep.
            contrib = durable_cut(contrib, eager=True)
            # the new cut is materialized (eager): the previous cut's
            # reliable-checkpoint files are unreachable now — delete them
            # so a long run does not leak O(iters/cut_every) copies of
            # the contribution table on HDFS/S3 (no-op on local masters).
            # The FINAL cut intentionally survives: the returned plan
            # still reads it; its files are released when the application
            # exits (or by the caller via plans.checkpoint.release_cut
            # once the rank action has run and the result is persisted).
            release_cut(prev_cut)
            prev_cut = contrib
    rank = nodes.join(
        F.broadcast(contrib) if bcast else contrib,
        F.col("node") == F.col("_n"),
        "left",
    ).select("node", F.expr(r_expr).alias("r"))
    return rank.select(
        "node",
        F.col("r").alias("rank_scaled"),
        F.round(F.col("r").cast("double") / F.lit(float(SCALE)), 9).alias(
            "rank"
        ),
    )


def _pagerank_driver(
    spark, rows, *, node_type, dn: int, base: int, iters: int
) -> DataFrame:
    """Driver-tier fixed-point loop over collected (_src, _dst, _w, _ow)
    edge rows — the exact update of the distributed path in Python ints
    (arbitrary precision, so no silent long overflow either). The `rank`
    double is rendered by the SAME Spark round expression as the
    distributed tail, so the two tiers are bit-identical end to end."""
    import pyspark.sql.types as T

    def _div(a: int, b: int) -> int:
        # Spark's integral `div` truncates toward ZERO; Python // floors.
        # Positive operands agree, but a negative weight (or the negative
        # mass it propagates into ranks) must not diverge between tiers.
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    nodes = {r["_src"] for r in rows}
    m: dict | None = None
    for _ in range(iters):
        if m is None:
            r = {u: SCALE for u in nodes}
        else:
            r = {u: base + _div(dn * m.get(u, 0), 100) for u in nodes}
        m2: dict = {}
        for row in rows:
            # NULL weight -> NULL product, zero out-weight -> NULL
            # division: the distributed sum() SKIPS both, so the driver
            # tier must too (not crash on them)
            if row["_w"] is None or not row["_ow"]:
                continue
            m2[row["_dst"]] = (
                m2.get(row["_dst"], 0)
                + _div(r[row["_src"]] * row["_w"], row["_ow"])
            )
        m = m2
    final = [
        (u, base + _div(dn * (m or {}).get(u, 0), 100))
        for u in sorted(nodes, key=str)
    ]
    out = spark.createDataFrame(
        final,
        T.StructType(
            [
                T.StructField("node", node_type),
                T.StructField("rank_scaled", T.LongType()),
            ]
        ),
    )
    return out.select(
        "node",
        "rank_scaled",
        F.round(
            F.col("rank_scaled").cast("double") / F.lit(float(SCALE)), 9
        ).alias("rank"),
    )


def token_adjacency(
    docs: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """Undirected token co-occurrence edges (window = adjacent tokens):
    (src, dst, w) with both directions listed and w = total co-occurrence
    count. Self-loops and empty tokens excluded. One explode + two
    groupBys — no joins."""
    from vettore_spark.operators.dedup import tokens

    t = tokens(F.coalesce(F.col(text_col), F.lit("")))
    pairs = (
        docs.select(
            F.explode(
                F.when(
                    F.size(t) >= 2,
                    F.arrays_zip(
                        F.slice(t, 1, F.size(t) - 1).alias("a"),
                        F.slice(t, 2, F.size(t) - 1).alias("b"),
                    ),
                ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
            ).alias("p")
        )
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .filter(
            (F.col("a") != F.col("b")) & (F.col("a") != "") & (F.col("b") != "")
        )
    )
    und = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("w"))
    both = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"), "w")
    )
    return both.groupBy(F.col("a").alias("src"), F.col("b").alias("dst")).agg(
        F.sum("w").cast("long").alias("w")
    )


def textrank_keywords(
    docs: DataFrame,
    *,
    text_col: str = "text",
    k: int = 20,
    damping: float = 0.85,
    iters: int = 10,
    driver_max_edges: int = 100_000,
) -> DataFrame:
    """Top-k corpus keywords by TextRank: weighted PageRank over the
    token-adjacency graph. The fixed-point rank (long) plus a token
    tie-break make the top-k boundary engine-independent.
    `driver_max_edges` passes through to pagerank's tier split (0 forces
    the distributed iteration — the `textrank_distributed` gate query
    keeps that path oracle-verified now that the default tier for small
    corpora is the driver loop)."""
    ranks = pagerank(
        token_adjacency(docs, text_col=text_col),
        weight_col="w",
        damping=damping,
        iters=iters,
        driver_max_edges=driver_max_edges,
    )
    return (
        ranks.select(F.col("node").alias("token"), "rank_scaled", "rank")
        .orderBy(F.desc("rank_scaled"), F.asc("token"))
        .limit(k)
    )
