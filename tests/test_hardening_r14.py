"""Round-14 hardening pins.

1. Tokenizer parity (ADVICE r13): hashed_token_features splits on the
   UNICODE whitespace set (pandas str.split = Python str.split); the
   DuckDB oracle's explicit RE2 class names the same set (RE2's \\s is
   ASCII-only). Pinned exhaustively over the BMP prefix that contains
   every Python whitespace char, and end-to-end on a corpus carrying
   NBSP / IDEOGRAPHIC SPACE / NEL / FS-GS-RS-US separators.
2. rerank_with_model non-finite rail (ADVICE r13): +inf (overflowed
   logit) must rank LAST, not first — r13 guarded only NaN.
3. MaxSim staged-raw plan shape (ADVICE r13): the per-pair kernel fold
   appears ONCE per query vector in the optimized plan (was 3x: the K13
   value mapper's three references to `raw` re-inlined the whole
   CodegenFallback fold), and a malformed doc token still never wins.
4. IVF finiteness rail (r13 verdict #4a): non-finite vectors quarantine
   to _cell = NULL (never probed, never returned), ivf_health surfaces
   them as a NULL-cell row, ivf_insert fail-fasts.
5. BM25 degenerate-corpus rail (r13 verdict #4b): an all-empty corpus
   returns empty (never NaN scores, never an ANSI divide abort).
6. bench3 --extend provenance (ADVICE r13): a commitless prior record
   is refused instead of silently blended.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# 1. tokenizer parity: Python whitespace == the oracle's RE2 class
# ---------------------------------------------------------------------------


def test_py_ws_class_matches_python_isspace_exhaustively():
    """The oracle's explicit RE2 whitespace class matches str.isspace for
    EVERY codepoint up to U+3100 (the range containing all 29 Python
    whitespace chars) plus astral samples — so pandas str.split() and the
    DuckDB split agree on any input, not just the chars we thought of."""
    import duckdb

    from vettore_spark.queries import _PY_WS_CLASS

    chars = [chr(cp) for cp in range(1, 0x3101)]
    chars += [chr(0x10000), chr(0x1F600), chr(0x10FFFF)]
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS c", [chars])
    got = dict(
        con.execute(
            f"SELECT c, regexp_matches(c, '{_PY_WS_CLASS}') FROM t"
        ).fetchall()
    )
    mismatches = [
        hex(ord(c)) for c in chars if got[c] != c.isspace()
    ]
    assert mismatches == []


def test_hashed_embedding_gate_parity_on_unicode_whitespace_corpus(
    spark, tmp_path
):
    """Driver-gate contract in miniature, on the corpus the r13 parity test
    had to EXCLUDE (exotic whitespace): NBSP, IDEOGRAPHIC SPACE, NEL,
    THIN SPACE, and the \\x1c-\\x1f separators — all token boundaries for
    pandas str.split, now also for the oracle's explicit class."""
    import duckdb

    from vettore_spark import queries as Q

    docs = [
        (0, "edge nbsp token"),
        (1, "日本　語 split"),
        (2, "nel\x85sep and thin"),
        (3, "fs\x1cgs\x1drs\x1eus\x1f end"),
        (4, " leading and trailing　"),
        (5, "wörld 🎉 mixed widths"),
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(
        1
    ).write.parquet(f"{sf_dir}/documents.parquet")

    got = {
        (r["doc_id"], r["idx"]): r["w"]
        for r in Q.q_hashed_embedding(spark, sf_dir).collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    want = {
        (r[0], r[1]): r[2]
        for r in con.execute(Q.SQL_HASHED_EMBEDDING).fetchall()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k


def test_java_ws_split_class_matches_spark_split(spark):
    """The F.split-based tokenizers (dedup/text/retrieval) split with
    Java's \\s = [ \\t\\n\\x0B\\f\\r]; RE2's \\s omits \\x0B, so every
    oracle now names Java's class explicitly. Pin engine equality on
    strings carrying the divergent chars (VT splits, NEL/NBSP/IDEOGRAPHIC
    SPACE do NOT — Java and RE2 agree those are not \\s)."""
    import duckdb

    from pyspark.sql import functions as F

    cases = [
        "a\x0bb c",              # VT: Java splits, bare RE2 \s would not
        "a\x85b \xa0c",          # NEL/NBSP: neither engine splits
        "日本　語 split",          # ideographic space: neither splits
        "  lead trail  ",
        "one\ttab\nnl\fff\rcr",
    ]
    got = spark.createDataFrame([(t,) for t in cases], "t string").select(
        F.split(F.trim(F.col("t")), r"\s+").alias("s")
    ).collect()
    con = duckdb.connect()
    for row, t in zip(got, cases):
        want = con.execute(
            r"SELECT regexp_split_to_array(trim(?), '[ \t\n\x0B\f\r]+')",
            [t],
        ).fetchone()[0]
        assert list(row["s"]) == list(want), repr(t)


def test_no_bare_re2_s_left_in_oracle_sql():
    """Regression guard: a new oracle written with bare '\\s+' would
    silently reintroduce the Java-vs-RE2 \\x0B divergence."""
    from vettore_spark import queries as Q

    offenders = [
        n
        for n, sql in Q.oracle_sql().items()
        if sql and (r"'\s+'" in sql or r"\s]" in sql)
    ]
    assert offenders == []


def test_temporal_oracle_parity_under_hostile_session_tz(spark):
    """Session timezone is read at EXECUTION time: a driver running with a
    non-UTC session tz would bucket date_trunc/date_format in local time
    while the DuckDB oracles' naive timestamps are effectively UTC. The
    registry dispatch pins UTC on every call, so parity must hold even
    when the caller set a hostile tz just before invoking."""
    import duckdb

    from vettore_spark import queries as Q

    sf_dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        got = sorted(
            tuple(r) for r in Q.queries()["events_hourly"](spark, sf_dir).collect()
        )
        # the dispatch must have re-pinned UTC before execution
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        # the raw q_* path (no _prepared dispatch) with a WARM table
        # cache must pin too: _t rides every call, not just cache
        # misses (r14 review — the loader's "covers every consumer"
        # claim was false for warm-cache direct callers)
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        raw = sorted(
            tuple(r)
            for r in Q._REGISTRY["events_hourly"][0](spark, sf_dir).collect()
        )
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        assert raw == got
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(Q.oracle_sql()["events_hourly"]).fetchall())
    assert got == want


# ---------------------------------------------------------------------------
# 2. rerank_with_model: ±inf ranks last (not just NaN)
# ---------------------------------------------------------------------------


def test_rerank_model_inf_score_ranks_last(spark):
    """An overflowed logit produces +inf, not NaN: under desc it outranked
    every real score in r13. The shared kernel rail NULLs it (ranks last);
    the emitted model_score keeps the raw non-finite value."""
    from vettore_spark.encodings.encoders import rerank_with_model

    docs = [
        ("q1", "q", 1, "a"),
        ("q1", "q", 2, "b"),
        ("q1", "q", 3, "c"),
        ("q1", "q", 4, "d"),
    ]
    cand = spark.createDataFrame(
        docs, "query_id string, query_text string, doc_id long, text string"
    )
    scores = {1: float("inf"), 2: 0.7, 3: float("nan"), 4: float("-inf")}

    def fn(q: pd.Series, t: pd.Series) -> np.ndarray:
        return np.array([scores[i] for i in range(1, len(q) + 1)])

    # the fake scorer above keys on POSITION; pin one batch so position
    # == doc_id order
    rows = rerank_with_model(
        cand.coalesce(1).sortWithinPartitions("doc_id"),
        score_fn=fn,
        k=4,
    ).collect()
    by_rank = {r["rank"]: r for r in sorted(rows, key=lambda r: r["rank"])}
    # the single finite score wins; non-finite (inf, nan, -inf) follow
    # in id order (NULL sort key -> id tiebreak)
    assert by_rank[1]["doc_id"] == 2
    assert [by_rank[i]["doc_id"] for i in (2, 3, 4)] == [1, 3, 4]
    # the failure stays visible: +inf survives the Arrow boundary as-is;
    # NaN crosses it as NULL (pandas NaN == Arrow null) — either way the
    # caller can distinguish a failed score from a real one
    assert math.isinf(by_rank[2]["model_score"])
    assert by_rank[3]["model_score"] is None or math.isnan(
        by_rank[3]["model_score"]
    )


# ---------------------------------------------------------------------------
# 3. MaxSim: staged raw fold (plan pin) + malformed token never wins
# ---------------------------------------------------------------------------


def test_maxsim_fold_staged_once_in_optimized_plan(spark):
    """The per-pair kernel fold must appear exactly once per query vector
    in the optimized plan: the K13 mapper's 3 references to `raw` used to
    re-inline the whole CodegenFallback aggregate (the r13 cosine class)."""
    import re

    from vettore_spark.operators import multivector as MV

    df = spark.createDataFrame(
        [(1, [[0.1] * 8, [0.2] * 8])],
        "id long, vectors array<array<double>>",
    )
    qvs = [[0.1] * 8, [0.5] * 8]
    for metric in ("l2", "cosine"):
        out = df.select(
            MV.maxsim_score(
                F.col("vectors").cast("array<array<double>>"),
                qvs,
                metric=metric,
            ).alias("s")
        )
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        n_folds = len(re.findall(r"aggregate\(", plan))
        assert n_folds == len(qvs), (metric, n_folds)


@pytest.mark.parametrize("bad", [float("nan"), float("inf")])
def test_maxsim_malformed_doc_token_never_wins(spark, bad):
    """A malformed token vector inside a doc's token list must not lift the
    doc's MaxSim score: its per-pair similarity rails to NULL and
    array_max skips NULLs (an all-malformed doc totals NULL, never top)."""
    from vettore_spark.operators import multivector as MV

    good = [0.9] * 4
    rows = [
        (1, [[0.9] * 4, [0.5] * 4]),           # clean doc, near-perfect
        (2, [[bad] + [0.9] * 3, [0.1] * 4]),    # poisoned first token
        (3, [[bad] * 4]),                        # all tokens malformed
    ]
    df = spark.createDataFrame(rows, "id long, vectors array<array<double>>")
    out = {
        r["id"]: r["s"]
        for r in df.select(
            "id",
            MV.maxsim_score(
                F.col("vectors").cast("array<array<double>>"),
                [good],
                metric="cosine",
            ).alias("s"),
        ).collect()
    }
    assert out[1] == pytest.approx(1.0, abs=1e-9)
    # poisoned doc falls back to its best CLEAN token, never the NaN pair
    assert out[2] == pytest.approx(
        np.dot(good, [0.1] * 4)
        / (np.linalg.norm(good) * np.linalg.norm([0.1] * 4)),
        abs=1e-9,
    )
    assert out[3] is None


# ---------------------------------------------------------------------------
# 4. IVF finiteness rail
# ---------------------------------------------------------------------------


@pytest.fixture()
def ivf_fixture(spark):
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((4, 8)) * 4.0
    rows = []
    for i in range(80):
        v = centers[i % 4] + rng.standard_normal(8) * 0.2
        rows.append((i, v.astype(float).tolist()))
    rows.append((900, [float("nan")] + [1.0] * 7))
    rows.append((901, [float("inf")] + [1.0] * 7))
    coll = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(j, centers[j].astype(float).tolist()) for j in range(4)],
        "centroid_id long, centroid array<double>",
    )
    return coll, cents


def test_ivf_assign_quarantines_nonfinite_vectors(spark, ivf_fixture):
    """numpy argmin propagates NaN (first NaN wins the cell): a non-finite
    vector must get _cell = NULL, never a real cell."""
    from vettore_spark.operators import ann as ANN

    coll, cents = ivf_fixture
    assigned = ANN.ivf_assign(
        coll, centroids=cents, id_col="vec_id", vector_col="embedding"
    )
    cells = {r["vec_id"]: r["_cell"] for r in assigned.collect()}
    assert cells[900] is None
    assert cells[901] is None
    assert all(
        c is not None for i, c in cells.items() if i not in (900, 901)
    )


def test_ivf_topk_never_returns_quarantined_rows(spark, ivf_fixture):
    """The probe equi-join never matches a NULL cell, so a malformed row
    can never appear in any search result."""
    from vettore_spark.operators import ann as ANN

    coll, cents = ivf_fixture
    qs = coll.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vector"),
    )
    out = ANN.ivf_topk(
        coll, qs, centroids=cents, n_probe=4, k=80,
        id_col="vec_id", vector_col="embedding",
    ).collect()
    returned = {r["vec_id"] for r in out}
    assert 900 not in returned and 901 not in returned
    assert len(out) > 0


def test_ivf_health_surfaces_quarantined_rows(spark, ivf_fixture):
    """Quarantined rows stay VISIBLE: the health report carries a NULL-cell
    row with the quarantine count and NULL distance stats, and clean-cell
    populations still sum with it to the corpus."""
    from vettore_spark.operators import ann as ANN

    coll, cents = ivf_fixture
    rows = ANN.ivf_health(
        coll, centroids=cents, id_col="vec_id", vector_col="embedding"
    ).collect()
    null_rows = [r for r in rows if r["cell"] is None]
    assert len(null_rows) == 1
    assert null_rows[0]["n_rows"] == 2
    assert null_rows[0]["mean_dist"] is None
    assert null_rows[0]["max_dist"] is None
    assert sum(r["n_rows"] for r in rows) == coll.count()
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-9


def test_ivf_insert_failfasts_on_nonfinite_vector(spark, ivf_fixture):
    from vettore_spark.operators import ann as ANN

    coll, cents = ivf_fixture
    assigned = ANN.ivf_assign(
        coll, centroids=cents, id_col="vec_id", vector_col="embedding"
    )
    with pytest.raises(ValueError, match="non-finite"):
        ANN.ivf_insert(
            assigned, 999, [float("nan")] + [1.0] * 7, centroids=cents,
            id_col="vec_id", vector_col="embedding",
        )


@pytest.mark.parametrize("bad", [float("nan"), float("inf"), None])
def test_mmr_malformed_candidate_never_selected(spark, bad):
    """MMR rail: a candidate with a non-finite/NULL score (or a poisoned
    vector) must be dropped, never selected — a NaN score at remaining[0]
    previously WON slot 1 (`NaN > -inf` is False, best_idx never moved),
    a NULL score crashed float(), and +inf held slot 1 unconditionally.
    The malformed id sorts FIRST here ('_bad' < 'a') to hit the
    index-0 path."""
    from vettore_spark.operators.rerank import mmr_rerank

    results = spark.createDataFrame(
        [("_bad", bad), ("a", 1.0), ("b", 0.5)],
        "id string, score double",
    )
    coll = spark.createDataFrame(
        [
            ("_bad", [1.0, 0.0]),
            ("a", [1.0, 0.0]),
            ("b", [0.0, 1.0]),
        ],
        "id string, vector array<double>",
    )
    got = [i for i, _ in mmr_rerank(results, coll, alpha=0.5, k=3)]
    assert got == ["a", "b"]

    # poisoned VECTOR with a clean score: also dropped (it would NaN
    # max_sim for every later round)
    coll2 = spark.createDataFrame(
        [
            ("_bad", [float("nan"), 0.0]),
            ("a", [1.0, 0.0]),
            ("b", [0.0, 1.0]),
        ],
        "id string, vector array<double>",
    )
    results2 = spark.createDataFrame(
        [("_bad", 2.0), ("a", 1.0), ("b", 0.5)], "id string, score double"
    )
    got2 = [i for i, _ in mmr_rerank(results2, coll2, alpha=0.5, k=3)]
    assert got2 == ["a", "b"]


# ---------------------------------------------------------------------------
# 5. BM25 degenerate corpus
# ---------------------------------------------------------------------------


def test_bm25_degenerate_corpora_return_empty_not_abort(spark):
    """Degenerate corpora (all-empty text, all-NULL text) must return
    empty — never NaN scores, never an ANSI divide abort — regardless of
    whether the matched-terms filter is pushed below the score
    projection (the NULL-guarded avgdl makes the expression total)."""
    from vettore_spark.operators import retrieval as R

    for texts in (["", "", ""], [None, None, None], ["", None, ""]):
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        assert R.bm25_topk(df, ["hello", "world"], k=3).collect() == []

        qs = spark.createDataFrame(
            [("q1", ["hello"])], "query_id string, terms array<string>"
        )
        assert (
            R.bm25_batch_topk(df, qs, query_terms_col="terms", k=3).collect()
            == []
        )


def test_bm25_values_unchanged_by_avgdl_guard(spark):
    """The rail must not move any surviving row's score: mixed corpus
    scores match the hand-computed Robertson/Lucene formula."""
    from vettore_spark.operators import retrieval as R

    df = spark.createDataFrame(
        [(0, "hello world"), (1, ""), (2, "hello hello")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["bm25"] for r in R.bm25_topk(df, ["hello"], k=3).collect()}
    # N=3, df=2; the tokenizer yields [""] for empty text so the empty
    # doc's dl is 1 -> avgdl = (2+1+2)/3 = 5/3 over the full corpus
    idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    k1, b = 1.2, 0.75

    def score(tf, dl):
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / (5 / 3)))

    assert rows[0] == pytest.approx(round(score(1, 2), 5), abs=1e-9)
    assert rows[2] == pytest.approx(round(score(2, 2), 5), abs=1e-9)
    assert 1 not in rows


# ---------------------------------------------------------------------------
# 6. bench3 --extend provenance
# ---------------------------------------------------------------------------


def test_bench3_extend_refuses_commitless_record(tmp_path, monkeypatch):
    """A prior record with no commit field has unknown provenance — the
    protocol must refuse to blend it with new same-tree runs."""
    import importlib.util
    import json
    import os
    import sys

    spec = importlib.util.spec_from_file_location(
        "bench3_under_test",
        os.path.join(os.path.dirname(__file__), "..", "tools", "bench3.py"),
    )
    bench3 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench3)

    rec = {
        "sf": 0.1,
        "runs": [{"source": "run1", "value": 50.0, "host_load": {}}],
    }
    (tmp_path / "bench_best_of_3.json").write_text(json.dumps(rec))
    monkeypatch.setattr(bench3, "ROOT", str(tmp_path))
    monkeypatch.setattr(sys, "argv", ["bench3.py", "--extend", "1"])
    with pytest.raises(SystemExit, match="no commit"):
        bench3.main()


def test_bench3_record_retains_min_runs_per_query_map(tmp_path, monkeypatch):
    """The protocol record must carry the SELECTED run's full per-query and
    per-gate replay maps (r13 verdict #2: the minimum run had no per-query
    rows, so a 2.4x single-query headline jump could not be audited)."""
    import importlib.util
    import json
    import os
    import sys

    spec = importlib.util.spec_from_file_location(
        "bench3_under_test2",
        os.path.join(os.path.dirname(__file__), "..", "tools", "bench3.py"),
    )
    bench3 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench3)

    def fake_stdout(value, q):
        return json.dumps(
            {
                "metric": "headline_queries_full",
                "value": value,
                "queries": q,
                "streaming_replay_sec": {"g1": value / 10},
                "ingest": {"put_many_rps": value * 1000},
                "host_load": {"stalled_samples": 0, "verdict": "quiet"},
                "sf": 0.1,
                "n_failed": 0,
            }
        )

    f1 = tmp_path / "out1"
    f2 = tmp_path / "out2"
    f1.write_text(fake_stdout(60.0, {"qa": 30.0, "qb": 30.0}))
    f2.write_text(fake_stdout(50.0, {"qa": 25.0, "qb": 25.0}))
    monkeypatch.setattr(bench3, "ROOT", str(tmp_path))
    monkeypatch.setattr(sys, "argv", ["bench3.py", str(f1), str(f2)])
    assert bench3.main() == 0
    rec = json.loads((tmp_path / "bench_best_of_3.json").read_text())
    assert rec["summary"]["min_value"] == 50.0
    assert rec["summary"]["min_queries"] == {"qa": 25.0, "qb": 25.0}
    assert rec["summary"]["min_streaming_replay_sec"] == {"g1": 5.0}
    assert rec["summary"]["min_ingest"] == {"put_many_rps": 50000.0}
    # the per-run array stays lean (no per-query maps per run)
    assert all("queries" not in r for r in rec["runs"])


# ---------------------------------------------------------------------------
# 7. streaming simhash: one scan, one fold, optional exactly-once emission
# ---------------------------------------------------------------------------


def test_simhash64_blocks_folds_appear_once_in_optimized_plan(spark):
    """simhash64_blocks binds the signature word in the final aggregate's
    finish lambda and derives the block slices there, so the optimized
    plan carries exactly TWO folds (token votes + word OR-fold) no matter
    how many slices come out. The pre-r14 streaming shape — a per-block
    union of re-projections — printed the pair of folds once PER BLOCK
    (8 copies at 16-bit slices) and re-scanned the source per branch;
    HOFs get no codegen subexpression elimination, so every printed copy
    runs."""
    from vettore_spark.operators.dedup import simhash64_blocks, tokens

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    out = df.select(
        "doc_id", F.explode(simhash64_blocks(tokens("text"))).alias("b")
    ).select("doc_id", "b._sig", "b._blk", "b._bval")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("aggregate(") == 2, plan


def test_simhash64_blocks_matches_simhash64_and_slicing(spark):
    """The fused signature+blocks expression is bit-for-bit the plain
    simhash64 word plus its shifted 16-bit slices, for both hash_fns."""
    from vettore_spark.operators import text as TX
    from vettore_spark.operators.dedup import simhash64, simhash64_blocks, tokens

    df = spark.createDataFrame(
        [(i, f"tok{i % 5} alpha beta gamma delta w{i}") for i in range(20)],
        "doc_id long, text string",
    )
    for hf in (None, TX.poly_hash62):
        want = {
            r.doc_id: r.sig
            for r in df.select(
                "doc_id", simhash64(tokens("text"), hash_fn=hf).alias("sig")
            ).collect()
        }
        rows = df.select(
            "doc_id",
            F.explode(
                simhash64_blocks(tokens("text"), hash_fn=hf)
            ).alias("b"),
        ).select("doc_id", "b._sig", "b._blk", "b._bval").collect()
        per = {}
        for r in rows:
            per.setdefault(r.doc_id, []).append(r)
        for did, rs in per.items():
            assert len(rs) == 4
            u = want[did] & 0xFFFFFFFFFFFFFFFF  # two's-complement view
            for r in rs:
                assert r._sig == want[did]
                assert r._bval == (u >> (r._blk * 16)) & 0xFFFF
