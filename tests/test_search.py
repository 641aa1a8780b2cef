"""Search operator tests: hand-computed micro-fixtures + the 64x4 agreement
dataset (FIXTURES.md §2-3, mirroring test/vector_adversarial_test.exs:376-421
and test/vector_db_test.exs)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vettore_spark.collection import Collection
from vettore_spark.operators import search as S
from vettore_spark.operators import multivector as MV
from vettore_spark.operators.rerank import mmr_rerank_rows


@pytest.fixture(scope="module")
def agreement_coll(spark):
    """Deterministic 64-record, 4-dim dataset (FIXTURES.md §2)."""
    rows = []
    for i in range(64):
        rows.append(
            {
                "id": f"id-{i:02d}",
                "vector": [i / 10, (i * 7 % 17) / 5, (i * 11 % 19) / 7, (i % 3) / 1],
            }
        )
    c = Collection.create(spark, "agree", 4, metric="l2")
    c.put_many(rows)
    c._df = c._df.cache()
    return c


QUERY = [2.25, 1.5, 0.75, 1.0]


def test_l2_near_far(spark):
    """L2 fixture (test/vector_db_test.exs:7-24)."""
    c = Collection.create(spark, "l2c", 2, metric="l2")
    c.put_many([
        {"id": "near", "vector": [0.0, 0.0]},
        {"id": "far", "vector": [10.0, 10.0]},
    ])
    got = c.search([1.0, 1.0], limit=2).collect()
    assert [r["id"] for r in got] == ["near", "far"]
    assert got[0]["distance"] == pytest.approx(np.sqrt(2))
    assert got[0]["score"] == pytest.approx(-np.sqrt(2))


def test_cosine_axes(spark):
    """Cosine fixture (test/vector_db_test.exs:26-53): collection normalizes
    to unit length, so dot == cosine; query [1,0] -> right scores 1.0,
    distance 0.0."""
    c = Collection.create(spark, "cosc", 2, metric="cosine")
    c.put_many([
        {"id": "right", "vector": [1.0, 0.0]},
        {"id": "up", "vector": [0.0, 1.0]},
        {"id": "left", "vector": [-1.0, 0.0]},
    ])
    got = c.search([1.0, 0.0], limit=3).collect()
    assert [r["id"] for r in got] == ["right", "up", "left"]
    assert got[0]["score"] == pytest.approx(1.0)
    assert got[0]["distance"] == pytest.approx(0.0)
    assert got[2]["score"] == pytest.approx(-1.0)
    assert got[2]["distance"] == pytest.approx(2.0)


def test_funnel_prefix_trap(spark):
    """Funnel trap (test/vector_db_test.exs:135-152): stage [1] keeps both
    prefix-matching docs, full rerank puts `exact` first."""
    c = Collection.create(spark, "fun", 3, metric="l2")
    c.put_many([
        {"id": "exact", "vector": [1.0, 0.0, 0.0]},
        {"id": "prefix", "vector": [1.0, 5.0, 0.0]},
        {"id": "far", "vector": [-1.0, 0.0, 0.0]},
    ])
    got = c.funnel_search([1.0, 0.0, 0.0], stages=[1], limit=2, candidates=2).collect()
    assert [r["id"] for r in got] == ["exact", "prefix"]


def test_quantized_sign_trap(spark):
    """Quantized trap (test/vector_db_test.exs:154-174): same-sign-bits far
    vector survives stage 1, exact rerank fixes the order."""
    c = Collection.create(spark, "quant", 2, metric="l2")
    c.put_many([
        {"id": "exact", "vector": [1.0, 1.0]},
        {"id": "same_bits_far", "vector": [100.0, 100.0]},
        {"id": "opposite", "vector": [-1.0, -1.0]},
    ])
    row = c.df.filter(F.col("id") == "exact").first()
    assert row["binary_vector"] == [3]
    got = c.quantized_search([1.0, 1.0], limit=2, candidates=2).collect()
    assert [r["id"] for r in got] == ["exact", "same_bits_far"]


def test_agreement_all_modes(agreement_coll):
    """At full candidates, funnel, quantized and hybrid return exactly the
    exact-flat ids (test/vector_adversarial_test.exs:376-421)."""
    exact = [r["id"] for r in agreement_coll.search(QUERY, limit=10).collect()]
    funnel = [
        r["id"]
        for r in agreement_coll.funnel_search(
            QUERY, stages=[2, 4], limit=10, candidates=64
        ).collect()
    ]
    quant = [
        r["id"]
        for r in agreement_coll.quantized_search(QUERY, limit=10, candidates=64).collect()
    ]
    hybrid = [
        r["id"]
        for r in agreement_coll.hybrid_search(QUERY, limit=10, candidates=64).collect()
    ]
    assert funnel == exact
    assert quant == exact
    assert hybrid == exact


def test_exact_topk_vs_numpy(agreement_coll):
    rows = agreement_coll.df.select("id", "vector").collect()
    ids = [r["id"] for r in rows]
    mat = np.array([r["vector"] for r in rows], dtype=np.float64)
    d = np.sqrt(((mat - np.array(QUERY)) ** 2).sum(axis=1))
    order = sorted(range(len(ids)), key=lambda i: (d[i], ids[i]))[:10]
    want = [ids[i] for i in order]
    got = [r["id"] for r in agreement_coll.search(QUERY, limit=10).collect()]
    assert got == want


def test_multi_query_topk(spark, agreement_coll):
    queries = spark.createDataFrame(
        [(0, QUERY), (1, [0.0, 0.0, 0.0, 0.0]), (2, [6.0, 3.0, 2.0, 1.0])],
        "query_id: int, query_vector: array<double>",
    )
    got = S.multi_query_topk(
        queries, agreement_coll.df, metric="l2", k=5
    ).collect()
    assert len(got) == 15
    rows = agreement_coll.df.select("id", "vector").collect()
    ids = [r["id"] for r in rows]
    mat = np.array([r["vector"] for r in rows], dtype=np.float64)
    for qid, q in [(0, QUERY), (1, [0, 0, 0, 0]), (2, [6, 3, 2, 1])]:
        d = np.sqrt(((mat - np.array(q, dtype=np.float64)) ** 2).sum(axis=1))
        order = sorted(range(len(ids)), key=lambda i: (d[i], ids[i]))[:5]
        want = [ids[i] for i in order]
        sub = sorted(
            [r for r in got if r["query_id"] == qid], key=lambda r: r["rank"]
        )
        assert [r["id"] for r in sub] == want


def test_maxsim_fixture(spark):
    """Multi-vector score 2.0 fixture (test/vector_db_test.exs:176-218):
    doc tokens match the two query tokens exactly -> cosine MaxSim = 2.0."""
    c = Collection.create(spark, "mv", 2, metric="cosine")
    c.put_many([
        {"id": "doc", "vectors": [[1.0, 0.0], [0.0, 1.0]]},
        {"id": "other", "vectors": [[-1.0, 0.0], [0.0, -1.0]]},
    ])
    got = c.multi_vector_search([[1.0, 0.0], [0.0, 1.0]], limit=2).collect()
    assert got[0]["id"] == "doc"
    assert got[0]["score"] == pytest.approx(2.0)
    assert got[0]["distance"] is None
    # each query token's best match in `other` is the orthogonal token -> 0
    assert got[1]["score"] == pytest.approx(0.0)
    # mean-vector derivation: primary vector = normalized mean of tokens
    row = c.df.filter(F.col("id") == "doc").first()
    mean = np.array([0.5, 0.5])
    want = (mean / np.linalg.norm(mean)).astype(np.float32)
    assert row["vector"] == pytest.approx(want.tolist(), abs=1e-6)


def test_maxsim_empty_doc_side(spark):
    df = spark.createDataFrame(
        [("a", [[1.0, 0.0]]), ("b", None)],
        "id: string, vectors: array<array<double>>",
    )
    got = MV.maxsim_topk(df, [[1.0, 0.0]], metric="cosine", k=2, vector_col=None).collect()
    by_id = {r["id"]: r["score"] for r in got}
    assert by_id["a"] == pytest.approx(1.0)
    assert by_id["b"] == 0.0


def test_mmr_rerank():
    """MMR: alpha=1 keeps relevance order; alpha=0.5 diversifies away the
    near-duplicate (vettore_distance.ex:325-436)."""
    initial = [("a", 1.0), ("a2", 0.99), ("b", 0.5)]
    vecs = {"a": [1.0, 0.0], "a2": [1.0, 0.01], "b": [0.0, 1.0]}
    ids_rel = [i for i, _ in mmr_rerank_rows(initial, vecs, alpha=1.0, k=3)]
    assert ids_rel == ["a", "a2", "b"]
    ids_div = [i for i, _ in mmr_rerank_rows(initial, vecs, alpha=0.5, k=2)]
    assert ids_div == ["a", "b"]


def test_put_many_validation(spark):
    c = Collection.create(spark, "val", 2, metric="l2")
    with pytest.raises(ValueError, match="invalid vector"):
        c.put_many([{"id": "x", "vector": [1.0]}])
    with pytest.raises(ValueError, match="invalid vector"):
        c.put_many([{"id": "x", "vector": [float("nan"), 1.0]}])
    with pytest.raises(ValueError, match="duplicate id within batch"):
        c.put_many([
            {"id": "x", "vector": [1.0, 2.0]},
            {"id": "x", "vector": [3.0, 4.0]},
        ])
    c.put_many([{"id": "x", "vector": [1.0, 2.0]}])
    with pytest.raises(ValueError, match="already exists"):
        c.put_many([{"id": "x", "vector": [3.0, 4.0]}])
    # duplicate vectors allowed (test/vector_db_test.exs:55-66)
    c.put_many([{"id": "y", "vector": [1.0, 2.0]}])
    assert c.count() == 2
    # value <-> id fallback (collection.ex:1069-1075)
    c.put_many([{"value": "justval", "vector": [0.0, 1.0]}])
    row = c.get("justval")
    assert row is not None and row["value"] == "justval"


def test_put_fold_prepare_query(spark):
    """Singular put (collection.ex:167-172), fold (store/ets.ex:151-179) and
    the public prepare_query (vettore.ex:314)."""
    c = Collection.create(spark, "pfp", 2, metric="cosine")
    c.put({"id": "a", "vector": [3.0, 4.0]})
    with pytest.raises(ValueError, match="already exists"):
        c.put({"id": "a", "vector": [1.0, 0.0]})
    c.put({"id": "b", "vector": [0.0, 2.0]})
    assert c.fold(F.count("*"))[0] == 2
    # cosine collections default to l2 normalize: prepare_query unit-norms
    q = c.prepare_query([3.0, 4.0])
    assert q == pytest.approx([0.6, 0.8])
    with pytest.raises(ValueError, match="dimension mismatch"):
        c.prepare_query([1.0])


def test_snapshot_roundtrip(spark, tmp_path):
    """Snapshot round-trip + override rules (collection.ex:146-164,
    1159-1203; test/vector_db_test.exs:309-411)."""
    c = Collection.create(spark, "snap", 2, metric="cosine")
    c.put_many([
        {"id": "a", "vector": [1.0, 0.0], "metadata": {"k": "v"}},
        {"id": "b", "vector": [0.0, 1.0]},
    ])
    path = str(tmp_path / "snap")
    c.snapshot(path)
    c2 = Collection.load_snapshot(spark, path, name="snap2")
    assert c2.config.name == "snap2"
    assert c2.config.metric == "cosine"
    assert c2.count() == 2
    got = c2.search([1.0, 0.0], limit=1).collect()
    assert got[0]["id"] == "a"
    assert c2.get("a")["metadata"] == {"k": "v"}
    with pytest.raises(ValueError, match="structural override"):
        Collection.load_snapshot(spark, path, dimensions=3)
    with pytest.raises(ValueError, match="unknown override"):
        Collection.load_snapshot(spark, path, bogus=1)


def test_snapshot_integrity_check(spark, tmp_path):
    """A tampered snapshot data dir fails the count/checksum verification at
    load time, not at query time (reference: extended_info verified on
    file2tab, store/ets.ex:29-58; corruption tests
    vector_adversarial_test.exs:294-331)."""
    import glob
    import os

    c = Collection.create(spark, "snapi", 2, metric="l2")
    c.put_many([
        {"id": "a", "vector": [1.0, 0.0]},
        {"id": "b", "vector": [0.0, 1.0]},
        {"id": "c", "vector": [1.0, 1.0]},
    ])
    path = str(tmp_path / "snapi")
    c.snapshot(path)
    # clean load passes
    assert Collection.load_snapshot(spark, path).count() == 3
    # drop the largest data file (small partitions may be empty) -> row
    # count / checksum mismatch
    parts = glob.glob(os.path.join(path, "data", "part-*"))
    assert parts
    os.remove(max(parts, key=os.path.getsize))
    with pytest.raises(ValueError, match="integrity"):
        Collection.load_snapshot(spark, path)


@pytest.mark.parametrize("fmt", ["json", "csv"])
def test_snapshot_interchange_formats(spark, tmp_path, fmt):
    """JSON/CSV snapshot round-trips (Spark writer family — the reference
    has only :ets.tab2file). CSV JSON-encodes nested columns per cell."""
    c = Collection.create(spark, "snapx", 2, metric="l2")
    c.put_many([
        {"id": "a", "vector": [1.0, 2.0], "metadata": {"k": "v"}},
        {"id": "b", "vector": [3.0, 4.0]},
    ])
    path = str(tmp_path / f"snap_{fmt}")
    c.snapshot(path, format=fmt)
    c2 = Collection.load_snapshot(spark, path)
    assert c2.count() == 2
    row = c2.get("a")
    assert list(row["vector"]) == [1.0, 2.0]
    assert row["metadata"] == {"k": "v"}
    assert c2.search([1.0, 2.0], limit=1).collect()[0]["id"] == "a"
    with pytest.raises(ValueError, match="snapshot format"):
        c.snapshot(path, format="orc-nope")


def test_closed_collection(spark):
    c = Collection.create(spark, "closing", 2)
    c.close()
    c.close()  # idempotent
    with pytest.raises(RuntimeError, match="closed"):
        c.search([1.0, 0.0])


def test_search_where_predicate_restricts_candidates(spark):
    from vettore_spark import Collection

    c = Collection.create(spark, "whr", 4, metric="cosine")
    c.put_many(
        [
            {
                "id": f"v{i}",
                "vector": [1.0, float(i % 3), float(i), 0.25],
                "metadata": {"group": "a" if i % 2 == 0 else "b"},
            }
            for i in range(10)
        ]
    )
    q = [1.0, 0.0, 0.0, 0.25]
    # Column predicate over the metadata map
    hits = c.search(q, limit=10, where=F.col("metadata")["group"] == "a").collect()
    assert hits and all(int(r["id"][1:]) % 2 == 0 for r in hits)
    # SQL-string predicate form
    hits_b = c.search(q, limit=10, where="metadata['group'] = 'b'").collect()
    assert hits_b and all(int(r["id"][1:]) % 2 == 1 for r in hits_b)
    # two-stage searches apply the same restriction to BOTH stages
    qh = c.quantized_search(q, limit=5, candidates=8,
                            where="metadata['group'] = 'a'").collect()
    assert qh and all(int(r["id"][1:]) % 2 == 0 for r in qh)
    # no predicate -> unrestricted
    assert len(c.search(q, limit=10).collect()) == 10


def test_snapshot_integrity_detects_tampered_data(spark, tmp_path):
    """The config sidecar carries row count + an order-insensitive id
    checksum; a truncated/hand-edited data dir must fail at LOAD, not at
    query time."""
    import glob
    import os

    from vettore_spark import Collection

    c = Collection.create(spark, "integ", 4, metric="cosine")
    c.put_many(
        [{"id": f"r{i}", "vector": [1.0, 0.0, float(i), 0.5]} for i in range(40)]
    )
    path = str(tmp_path / "snap_integ")
    c.snapshot(path)
    # tamper: delete one data part file (simulates partial copy/truncation)
    parts = sorted(glob.glob(os.path.join(path, "data", "part-*")))
    assert parts, "no part files written"
    # remove the largest part (a random small one may hold zero rows)
    os.remove(max(parts, key=os.path.getsize))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="integrity"):
        Collection.load_snapshot(spark, path)


def test_get_many_batched_lookup(spark):
    from vettore_spark import Collection

    c = Collection.create(spark, "gm", 4, metric="cosine")
    c.put_many([{"id": f"k{i}", "vector": [1.0, 0.0, float(i), 0.5]}
                for i in range(20)])
    got = c.get_many(["k3", "k7", "nope"]).collect()
    assert sorted(r["id"] for r in got) == ["k3", "k7"]


def test_search_many_batched(spark):
    from vettore_spark import Collection

    c = Collection.create(spark, "sm", 4, metric="cosine")
    c.put_many([{"id": f"v{i}", "vector": [1.0, float(i % 3), float(i), 0.5]}
                for i in range(12)])
    out = c.search_many(
        {"a": [1.0, 0.0, 0.0, 0.5], "b": [1.0, 2.0, 11.0, 0.5]}, limit=3
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {"a", "b"}
    assert all(len(v) == 3 for v in by_q.values())
    # each query's rank-1 hit equals the single-query facade's top hit
    for qid, vec in (("a", [1.0, 0.0, 0.0, 0.5]), ("b", [1.0, 2.0, 11.0, 0.5])):
        single = c.search(vec, limit=1).collect()[0]["id"]
        best = min(by_q[qid], key=lambda r: r["rank"])["id"]
        assert best == single
    # where-predicate applies to the batch too
    filtered = c.search_many([[1.0, 0.0, 0.0, 0.5]], limit=12,
                             where="id != 'v0'").collect()
    assert all(r["id"] != "v0" for r in filtered)


def test_range_search_matches_topk_within_radius(agreement_coll):
    """flat_range == the rows of flat_topk whose distance clears the
    threshold, in the same (rank, id) order; and every returned distance
    respects the radius."""
    c = agreement_coll
    full = c.search(QUERY, limit=64).collect()
    thr = full[9]["distance"]  # radius that admits exactly the top 10
    got = c.range_search(QUERY, max_distance=thr).collect()
    assert [r["id"] for r in got] == [r["id"] for r in full[:10]]
    assert all(r["distance"] <= thr for r in got)
    # min_score form: same rows via the score threshold (l2 score = -d)
    got2 = c.range_search(QUERY, min_score=-thr).collect()
    assert [r["id"] for r in got2] == [r["id"] for r in got]
    # limit caps the ordered result
    got3 = c.range_search(QUERY, max_distance=thr, limit=3).collect()
    assert [r["id"] for r in got3] == [r["id"] for r in got[:3]]


def test_range_search_where_composes(agreement_coll):
    c = agreement_coll
    thr = c.search(QUERY, limit=64).collect()[20]["distance"]
    got = c.range_search(
        QUERY, max_distance=thr, where=F.col("id") > "id-31"
    ).collect()
    assert got, "some of the top-21 ids sort after id-31"
    assert all(r["id"] > "id-31" and r["distance"] <= thr for r in got)


def test_range_search_validation(agreement_coll):
    with pytest.raises(ValueError, match="exactly one"):
        agreement_coll.range_search(QUERY)
    with pytest.raises(ValueError, match="exactly one"):
        agreement_coll.range_search(QUERY, max_distance=1.0, min_score=0.0)


def test_range_search_many_matches_single_query_range(agreement_coll):
    """Batched radius == per-query flat_range row sets; and the plan has
    no window and no exchange (scan -> filter only)."""
    c = agreement_coll
    thr = 2.0
    out = c.range_search_many([QUERY, [0.0, 0.0, 0.0, 0.0]],
                              max_distance=thr)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # queries broadcast is fine; the collection must not shuffle
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], set()).add(r["id"])
    want0 = {r["id"] for r in c.range_search(QUERY, max_distance=thr).collect()}
    want1 = {
        r["id"]
        for r in c.range_search([0.0] * 4, max_distance=thr).collect()
    }
    assert got.get("q0", set()) == want0
    assert got.get("q1", set()) == want1
    with pytest.raises(ValueError, match="exactly one"):
        c.range_search_many([QUERY])
