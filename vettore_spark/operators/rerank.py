"""Reranking operators.

- MMR (Maximal Marginal Relevance) — lib/vettore_distance.ex:325-436.
  Inherently sequential greedy selection over <= N candidates, so it runs
  driver-side in NumPy over a collected top-N (SURVEY §2.10 R2). The
  distributed part — producing the candidate top-N — is any search operator.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame



def _pair_similarity(metric: str, a: np.ndarray, b: np.ndarray) -> float:
    """Pairwise similarity per metric (vettore_distance.ex:489-519):
    cosine -> true cosine; inner_product -> dot; negative_inner_product ->
    -(-dot) = dot; distance metrics -> 1/(1+d)."""
    if metric == "cosine":
        na, nb = float(np.sqrt(a @ a)), float(np.sqrt(b @ b))
        if na * nb == 0.0:
            return 0.0
        return float(np.clip((a @ b) / (na * nb), -1.0, 1.0))
    if metric in ("inner_product", "negative_inner_product"):
        return float(a @ b)
    if metric == "l2":
        d = float(np.sqrt(np.sum((a - b) ** 2)))
    elif metric == "l2_squared":
        d = float(np.sum((a - b) ** 2))
    elif metric == "manhattan":
        d = float(np.sum(np.abs(a - b)))
    elif metric == "chebyshev":
        d = float(np.max(np.abs(a - b))) if len(a) else 0.0
    elif metric == "hamming":
        d = float(np.sum((a != 0) != (b != 0)))
    elif metric == "jaccard":
        union = int(np.sum((a != 0) | (b != 0)))
        inter = int(np.sum((a != 0) & (b != 0)))
        d = 0.0 if union == 0 else 1.0 - inter / union
    else:
        raise ValueError(f"unknown metric: {metric!r}")
    return 1.0 / (1.0 + d)


def mmr_rerank_rows(
    initial: list[tuple[str, float]],
    id_vectors: dict[str, list[float]],
    *,
    metric: str = "cosine",
    alpha: float = 0.5,
    k: int = 10,
) -> list[tuple[str, float]]:
    """Greedy MMR (vettore_distance.ex:325-436): repeatedly pick the candidate
    maximizing alpha*query_score - (1-alpha)*max_sim_to_selected. Returns
    [(id, mmr_score)] in selection order."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha must be in [0, 1]")
    vecs = {i: np.asarray(v, dtype=np.float64) for i, v in id_vectors.items()}
    remaining = [(i, s) for i, s in initial if i in vecs]
    selected: list[tuple[str, float]] = []
    while remaining and len(selected) < k:
        best_idx, best_val = 0, -np.inf
        for idx, (cid, cscore) in enumerate(remaining):
            if selected:
                max_sim = max(
                    _pair_similarity(metric, vecs[cid], vecs[sid])
                    for sid, _ in selected
                )
            else:
                max_sim = 0.0
            val = alpha * cscore - (1.0 - alpha) * max_sim
            if val > best_val:
                best_idx, best_val = idx, val
        cid, _ = remaining.pop(best_idx)
        selected.append((cid, float(best_val)))
    return selected


def mmr_rerank(
    results: DataFrame,
    coll: DataFrame,
    *,
    metric: str = "cosine",
    alpha: float = 0.5,
    k: int = 10,
    id_col: str = "id",
    vector_col: str = "vector",
    score_col: str = "score",
    max_rows: int | None = None,
) -> list[tuple[str, float]]:
    """DataFrame wrapper: collect the (small) candidate set + vectors to the
    driver and run the greedy loop. `max_rows` is a fail-fast cap on the
    collected pool (ids + full vectors per row): callers whose candidate
    set is not already bounded (the compat whole-collection facade) pass
    it so an oversized pool raises instead of silently OOMing the driver.
    The cap is checked on the SAME collect that builds the pool — a
    single snapshot, no separate count() TOCTOU."""
    cand = results.select(id_col, score_col)
    hydrated = cand.join(
        coll.select(id_col, vector_col), on=id_col, how="inner"
    ).collect()
    if max_rows is not None and len(hydrated) > max_rows:
        raise ValueError(
            f"mmr_rerank pool exceeds max_rows={max_rows} (ids + full "
            "vectors collected to the driver); bound the candidate set "
            "first or raise max_rows explicitly"
        )
    # Non-finite rail (NANPOLICY.md): in the greedy loop a NaN score at
    # index 0 WINS slot 1 (`NaN > -inf` is False, so best_idx never
    # moves off 0), a NULL score crashes float(), +inf holds slot 1
    # unconditionally, and a non-finite VECTOR poisons max_sim for every
    # later round. Candidates with a non-finite score or vector are
    # dropped here at the DataFrame boundary — same stance as the K13
    # mappers and the IVF assignment rail.
    def _clean(r) -> bool:
        s = r[score_col]
        if s is None or not math.isfinite(s):
            return False
        v = r[vector_col]
        return v is not None and np.isfinite(
            np.asarray(v, dtype=np.float64)
        ).all()

    kept = [r for r in hydrated if _clean(r)]
    initial = [(r[id_col], float(r[score_col])) for r in kept]
    initial.sort(key=lambda t: -t[1])
    id_vectors = {r[id_col]: list(r[vector_col]) for r in kept}
    return mmr_rerank_rows(
        initial, id_vectors, metric=metric, alpha=alpha, k=k
    )
