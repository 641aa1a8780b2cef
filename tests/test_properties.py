"""Hypothesis property tests for the pure-Python kernels (no Spark session):
HNSW graph invariants + exact-agreement, MMR greedy optimality, MUVERA FDE
algebraic properties. These widen the seeded-fixture coverage with
adversarially-shrunk random inputs — the reference's own invariants
(hnsw.rs:659-750, multi_vector tests, muvera.rs:296-378) hold for EVERY
input, not just the fixtures.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from vettore_spark.encodings import muvera as MU
from vettore_spark.operators.hnsw import HnswGraph, HnswParams
from vettore_spark.operators.rerank import mmr_rerank_rows


def _vectors(n, dims, seed):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, dims)).round(3)


# ---------------------------------------------------------------------------
# HNSW graph invariants (hnsw.rs:708-750) on random corpora
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=60),
    dims=st.integers(min_value=1, max_value=8),
    seed=st.integers(min_value=0, max_value=2**16),
)
def test_hnsw_invariants_random(n, dims, seed):
    vs = _vectors(n, dims, seed)
    g = HnswGraph(metric="l2", params=HnswParams(m=4, m0=8, ef_construction=16))
    for i in range(n):
        g.insert(f"n{i:03d}", vs[i])
    for nid, layers in enumerate(g.connections):
        for layer, nbrs in enumerate(layers):
            limit = g.params.m0 if layer == 0 else g.params.m
            assert len(nbrs) <= limit, "degree bound violated"
            assert nid not in nbrs, "self edge"
            assert len(set(nbrs)) == len(nbrs), "duplicate edge"
            for nb in nbrs:
                assert 0 <= nb < len(g.vectors), "dangling edge"
                assert g.levels[nb] >= layer, "edge to node missing this layer"
    # NOTE deliberately NOT asserted: global layer-0 reachability. The
    # keep-nearest prune (identical to hnsw.rs:437-465) can disconnect a
    # node at tiny m on adversarial data; the reference only observes full
    # reachability at its default density (m=16/m0=32 over a smooth curve,
    # hnsw.rs:708-750) — mirrored in tests/test_hnsw.py. The search
    # contract under disconnection is pinned below.


@settings(max_examples=10, deadline=None)
@given(
    n=st.integers(min_value=2, max_value=40),
    seed=st.integers(min_value=0, max_value=2**16),
)
def test_hnsw_high_ef_equals_exact_on_reachable(n, seed):
    """With ef covering the corpus, graph search == exact scan over the
    layer-0 component reachable from the entry, ordered by (distance, id) —
    the reference's agreement invariant (hnsw.rs:659-687) stated for the
    set the beam can actually visit."""
    dims = 4
    vs = _vectors(n, dims, seed)
    g = HnswGraph(metric="l2", params=HnswParams(ef_search=1_000_000))
    ids = [f"n{i:03d}" for i in range(n)]
    for i in range(n):
        g.insert(ids[i], vs[i])
    q = _vectors(1, dims, seed + 1)[0]
    # replicate the descent to find the layer-0 beam start, then BFS its
    # component = the set an unbounded beam can visit
    start = g.entry
    for layer in range(g.levels[start], 0, -1):
        start = g._greedy_closest(start, q, layer)
    seen, stack = {start}, [start]
    while stack:
        cur = stack.pop()
        for nb in g.connections[cur][0]:
            if nb not in seen:
                seen.add(nb)
                stack.append(nb)
    k = min(5, n)
    got = [eid for eid, _ in g.search(q, k)]
    d = np.linalg.norm(vs - q, axis=1)
    reach = sorted(seen, key=lambda i: (d[i], ids[i]))
    want = [ids[i] for i in reach[:k]]
    assert got == want


# ---------------------------------------------------------------------------
# MMR greedy optimality (vettore_distance.ex:325-436)
# ---------------------------------------------------------------------------


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=12),
    alpha=st.floats(min_value=0.0, max_value=1.0),
    seed=st.integers(min_value=0, max_value=2**16),
)
def test_mmr_each_pick_is_argmax(n, alpha, seed):
    rng = np.random.default_rng(seed)
    ids = [f"c{i}" for i in range(n)]
    vecs = {i: rng.standard_normal(4).round(3).tolist() for i in ids}
    initial = [(i, float(rng.uniform(-1, 1))) for i in ids]
    out = mmr_rerank_rows(initial, vecs, metric="cosine", alpha=alpha, k=n)
    assert [i for i, _ in out] != [] or n == 0
    assert len(out) == n and len({i for i, _ in out}) == n, "must permute"

    def cos(a, b):
        a, b = np.asarray(a), np.asarray(b)
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0 or nb == 0:
            return 0.0
        return float(np.clip(a @ b / (na * nb), -1.0, 1.0))

    score = dict(initial)
    picked: list[str] = []
    for cid, val in out:
        objective = {
            c: alpha * score[c]
            - (1 - alpha) * max((cos(vecs[c], vecs[p]) for p in picked), default=0.0)
            for c in ids
            if c not in picked
        }
        best = max(objective.values())
        assert objective[cid] == pytest.approx(best, abs=1e-9), (
            f"pick {cid} not argmax at step {len(picked)}"
        )
        assert val == pytest.approx(objective[cid], abs=1e-9)
        picked.append(cid)


# ---------------------------------------------------------------------------
# MUVERA FDE algebra (muvera.rs:26-74, 164-177)
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(
    nv=st.integers(min_value=1, max_value=6),
    reps=st.integers(min_value=1, max_value=3),
    proj=st.integers(min_value=1, max_value=5),
    seed=st.integers(min_value=0, max_value=2**16),
)
def test_muvera_query_additivity_doc_mean(nv, reps, proj, seed):
    """Query FDE accumulates a SUM over vectors and document FDE an online
    MEAN — so query(all) == sum(query(each)) and doc(all) == mean-weighted
    combination, for any config."""
    dims = 6
    cfg = MU.MuveraConfig(
        dimension=dims, num_repetitions=reps, num_simhash_projections=proj,
        seed=seed % 97 + 1, projection_dimension=4,
    )
    vs = _vectors(nv, dims, seed).astype(np.float32)
    q_all = MU.encode_query(vs, cfg)
    q_sum = np.sum([MU.encode_query(vs[i : i + 1], cfg) for i in range(nv)], axis=0)
    assert np.allclose(q_all, q_sum, atol=1e-4)

    d_all = MU.encode_document(vs, cfg)
    # online mean == arithmetic mean of per-vector (partition-routed) sums:
    # reconstruct via single-vector documents weighted by routing counts is
    # non-trivial; instead check the repetition-duplication identity —
    # duplicating every vector leaves the document mean unchanged
    d_dup = MU.encode_document(np.concatenate([vs, vs]), cfg)
    assert np.allclose(d_all, d_dup, atol=1e-4)



@settings(max_examples=5, deadline=None)  # several Spark jobs/example (r14 trim)
@given(
    budget=st.integers(min_value=0, max_value=2000),
    n=st.integers(min_value=1, max_value=25),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_token_budget_selection_properties(spark, budget, n, seed):
    """Budgeted selection: (a) total selected tokens <= budget, (b) the
    selected set is a prefix of the (weight desc, id) order, (c) growing
    the budget never drops a previously selected doc."""
    import random

    from vettore_spark.operators import selection as SEL

    rng = random.Random(seed)
    rows = [
        (i, rng.randint(1, 200), round(rng.uniform(-1, 1), 5))
        for i in range(n)
    ]
    w = spark.createDataFrame(rows, "doc_id long, n_tokens long, wpt double")

    def sel(b):
        out = SEL.select_token_budget(
            w, b, weight_col="wpt", tokens_col="n_tokens"
        ).collect()
        return out

    out = sel(budget)
    chosen = {r["doc_id"] for r in out if r["selected"]}
    total = sum(r["n_tokens"] for r in out if r["selected"])
    assert total <= budget
    order = sorted(out, key=lambda r: (-r["wpt"], r["doc_id"]))
    flags = [r["selected"] for r in order]
    assert flags == sorted(flags, reverse=True)  # prefix-closed
    bigger = {r["doc_id"] for r in sel(budget + 500) if r["selected"]}
    assert chosen <= bigger  # monotone in budget


@settings(max_examples=8, deadline=None)
@given(
    n=st.integers(min_value=4, max_value=30),
    seed=st.integers(min_value=0, max_value=10_000),
    s0=st.floats(min_value=0.05, max_value=0.9),
)
def test_mixture_fractions_hit_shares(spark, n, seed, s0):
    """Rebalance correctness: expected kept sizes (fraction * count) are
    proportional to the target shares, and the binding domain keeps 1.0."""
    import random

    from vettore_spark.operators import selection as SEL

    rng = random.Random(seed)
    rows = [(i, f"d{rng.randint(0, 2)}") for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    present = sorted({r[1] for r in rows})
    rest = (1.0 - s0) / max(len(present) - 1, 1)
    shares = {d: (s0 if j == 0 else rest) for j, d in enumerate(present)}
    fr = {r["domain"]: r for r in
          SEL.mixture_keep_fractions(df, shares, domain_col="source").collect()}
    assert any(abs(r["keep_fraction"] - 1.0) < 1e-9 for r in fr.values())
    expected = {d: fr[d]["keep_fraction"] * fr[d]["n_docs"] for d in fr}
    ratios = {d: expected[d] / shares[d] for d in fr}
    vals = list(ratios.values())
    for v in vals:
        assert abs(v - vals[0]) < 1e-6  # proportional to shares


@settings(max_examples=6, deadline=None)  # several Spark jobs/example (r14 trim)
@given(
    n=st.integers(min_value=1, max_value=12),
    window=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_paragraph_dedup_invariants_random(spark, n, window, seed):
    """Unit-level dedup invariants over random small-vocab corpora (small
    vocab forces heavy unit collisions): (a) kept units across the corpus
    are exactly the DISTINCT units of the input, (b) sum(n_dropped) =
    total units - distinct units, (c) every doc's kept text is a
    subsequence of its original unit sequence, (d) doc-scope never drops
    more than global scope."""
    import random

    from vettore_spark.operators.dedup import paragraph_dedup

    rng = random.Random(seed)
    vocab = ["a", "b", "c"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 10))))
        for i in range(n)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def units_of(text):
        toks = text.split(" ")
        k = max(1, -(-len(toks) // window))
        return [" ".join(toks[i * window:(i + 1) * window]) for i in range(k)]

    out = paragraph_dedup(docs, window=window).collect()
    all_units = [u for _, t in rows for u in units_of(t)]
    kept_units = [
        u for r in out if r["text"] != "" for u in units_of(r["text"])
    ]
    assert sorted(set(all_units)) == sorted(kept_units)  # (a) + no dup kept
    assert sum(r["n_dropped"] for r in out) == len(all_units) - len(
        set(all_units)
    )  # (b)
    orig = dict(rows)
    for r in out:  # (c) subsequence per doc
        if r["text"] == "":
            continue
        seq = units_of(orig[r["doc_id"]])
        it = iter(seq)
        assert all(u in it for u in units_of(r["text"]))
    doc_scope = {
        r["doc_id"]: r["n_dropped"]
        for r in paragraph_dedup(docs, window=window, scope="doc").collect()
    }
    for r in out:  # (d)
        assert doc_scope[r["doc_id"]] <= r["n_dropped"]


# ---------------------------------------------------------------------------
# JL projection algebra + banded near-dup soundness (round 4)
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=20),
    d_out=st.integers(min_value=1, max_value=16),
    seed=st.integers(min_value=0, max_value=2**16),
)
def test_jl_projection_is_linear_and_deterministic(n, d_out, seed):
    """P(ax + by) == aP(x) + bP(y) for the Rademacher projection, and the
    matrix is a pure function of (d_in, d_out, seed)."""
    from vettore_spark.encodings.projections import rademacher_signs

    rng = np.random.default_rng(seed)
    S = np.array(rademacher_signs(16, d_out, seed=0), dtype=np.float64)
    S2 = np.array(rademacher_signs(16, d_out, seed=0), dtype=np.float64)
    assert np.array_equal(S, S2)
    assert set(np.unique(S)) <= {-1.0, 1.0}
    x, y = rng.normal(size=16), rng.normal(size=16)
    a, b = float(rng.normal()), float(rng.normal())
    lhs = S @ (a * x + b * y)
    rhs = a * (S @ x) + b * (S @ y)
    assert np.allclose(lhs, rhs, atol=1e-9)


@settings(max_examples=6, deadline=None)  # several Spark jobs/example (r14 trim)
@given(
    n=st.integers(min_value=2, max_value=25),
    n_bits=st.integers(min_value=1, max_value=4),
    n_bands=st.integers(min_value=1, max_value=3),
    seed=st.integers(min_value=0, max_value=2**16),
)
def test_banded_neardup_is_sound_subset(spark, n, n_bits, n_bands, seed):
    """For ANY (n_bits, n_bands): every emitted pair is a TRUE pair of the
    exact all-pairs set (sim >= threshold, id_a < id_b, no duplicates) —
    blocking may lose recall but can never fabricate a pair."""
    from vettore_spark.operators.dedup import embedding_neardup_banded

    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, 12))
    df = spark.createDataFrame(
        [(f"d{i:02d}", [float(x) for x in v]) for i, v in enumerate(mat)],
        "vec_id: string, embedding: array<double>",
    )
    rows = embedding_neardup_banded(
        df, n_bits=n_bits, n_bands=n_bands, threshold=0.3, max_block_size=None
    ).collect()
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    idx = {f"d{i:02d}": i for i in range(n)}
    seen = set()
    for r in rows:
        assert r["id_a"] < r["id_b"]
        assert (r["id_a"], r["id_b"]) not in seen
        seen.add((r["id_a"], r["id_b"]))
        true_sim = float(norm[idx[r["id_a"]]] @ norm[idx[r["id_b"]]])
        assert true_sim >= 0.3 - 1e-9
        assert abs(r["sim"] - true_sim) < 1e-6
