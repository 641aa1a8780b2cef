"""Round-13 hardening pins.

1. hashed_token_features is UTF-8-correct: segments are byte lengths, the
   polynomial hash consumes UTF-8 bytes, and the result matches a pure
   pure-Python reference on mixed ASCII / 2-byte / 3-byte / 4-byte text
   (the r12 fail-fast is gone; the r12 silent-desync bug stays dead).
2. The DuckDB oracle's arithmetic codepoint->UTF-8-byte expansion is
   byte-equal to Python's str.encode("utf-8") across every encoding-width
   boundary (0x7F/0x80, 0x7FF/0x800, 0xFFFF/0x10000, astral max).
3. The full Spark pipeline agrees with the DuckDB byte-wise oracle on a
   multi-byte corpus (the driver-gate contract, in miniature).
"""

from __future__ import annotations

import math

import pytest


P = 2147483647


def _ref_hashed_features(docs: list[tuple[int, str]], dim: int):
    """Independent pure-Python reference for the hashing trick over UTF-8
    bytes: poly-31 hash of each token's bytes mod 2^31-1, slot h % dim,
    sign (h // dim) % 2, per-doc signed sum, L2 normalize (zero stays
    zero), round half-up at 5 like Spark's F.round."""
    from decimal import ROUND_HALF_UP, Decimal

    out = {}
    for doc_id, text in docs:
        acc = [0.0] * dim
        hit = [False] * dim
        for tok in text.split():
            h = 0
            for b in tok.encode("utf-8"):
                h = (h * 31 + b) % P
            idx = h % dim
            acc[idx] += 1.0 if (h // dim) % 2 == 0 else -1.0
            hit[idx] = True
        norm = math.sqrt(sum(v * v for v in acc)) or 1.0
        for i in range(dim):
            if hit[i]:
                w = acc[i] / norm
                out[(doc_id, i)] = float(
                    Decimal(repr(w)).quantize(Decimal("0.00001"), ROUND_HALF_UP)
                )
    return out


MIXED_DOCS = [
    (1, "plain ascii text"),
    (2, "hello wörld café"),          # 2-byte glyphs mid-token
    (3, "日本語テスト と ascii mix"),    # 3-byte CJK + ASCII
    (4, "🎉party 🚀🚀 emoji"),          # 4-byte astral, repeated
    (5, "Grüße señal naïve résumé"),
    # NOTE: no exotic whitespace here: MIXED_DOCS also feeds the DuckDB
    # parity test, and RE2's \s+ (oracle tokenizer) is ASCII-only while
    # Python's str.split() is Unicode-aware. U+00A0 is exercised in
    # test_hashed_features_unicode_whitespace (Spark vs reference, which
    # share str.split semantics).
    (6, "edge case token"),
    (7, "ασπίδα ελληνικά"),            # Greek, all 2-byte
]


def test_hashed_features_utf8_matches_reference(spark):
    """The Spark mapInPandas path reproduces the byte-level reference on
    mixed-width UTF-8 input — the r12 char/byte desync class is closed by
    construction (byte segments), not by rejection."""
    from vettore_spark.operators.text import hashed_token_features

    df = spark.createDataFrame(MIXED_DOCS, "doc_id long, text string")
    got = {
        (r["doc_id"], r["idx"]): r["w"]
        for r in hashed_token_features(df, dim=16).collect()
    }
    want = _ref_hashed_features(MIXED_DOCS, 16)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k


def test_hashed_features_unicode_whitespace(spark):
    """Unicode whitespace (U+00A0 nbsp, U+3000 ideographic space) is a
    token SEPARATOR on the Spark path (pandas str.split = Python
    str.split), matching the reference — not folded into token bytes."""
    from vettore_spark.operators.text import hashed_token_features

    docs = [(1, "edge nbsp token"), (2, "日本　語 split")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_id"], r["idx"]): r["w"]
        for r in hashed_token_features(df, dim=16).collect()
    }
    want = _ref_hashed_features(docs, 16)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k


def test_duckdb_utf8_byte_expansion_matches_python_encode():
    """The oracle's arithmetic codepoint->byte expansion is byte-equal to
    Python's UTF-8 encoder at every width boundary."""
    import duckdb

    from vettore_spark.queries import _UTF8_BYTES_OF_TOK

    toks = [
        "a",
        "\x7f",            # last 1-byte
        "\x80",            # first 2-byte
        "߿",          # last 2-byte
        "ࠀ",          # first 3-byte
        "￿",          # last 3-byte
        "\U00010000",      # first 4-byte
        "\U0010ffff",      # last codepoint
        "wörld",
        "日本語テスト",
        "🎉emoji🚀",
    ]
    con = duckdb.connect()
    for tok in toks:
        got = con.execute(
            f"SELECT {_UTF8_BYTES_OF_TOK} FROM (SELECT ? AS tok)", [tok]
        ).fetchone()[0]
        assert list(got) == list(tok.encode("utf-8")), tok


SF = "/root/testdata/sf0.001"


def test_events_ts_split_contiguous_ordered_and_distinct_from_userid_split(
    spark,
):
    """The funnel/topk gates split events by TS (the funnel's order-
    freedom argument needs ts-ascending batches); the split must be 4
    contiguous ascending ts-range files with strictly ascending mtimes,
    and must NOT share a scratch dir with the kmv gate's user_id split
    of the same table (the r12-advice cache-identity fix)."""
    import os

    from pyspark.sql import functions as F

    from vettore_spark import queries as Q

    ts_path = Q._streaming_table_dir_multi(spark, SF, "events", "ts")
    uid_path = Q._streaming_table_dir_multi(spark, SF, "events", "user_id")
    assert ts_path != uid_path

    files = sorted(f for f in os.listdir(ts_path) if f.endswith(".parquet"))
    assert len(files) == 4, files
    mtimes = [os.path.getmtime(os.path.join(ts_path, f)) for f in files]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == 4
    prev_max = None
    n_total = 0
    for f in files:
        lo, hi, n = (
            spark.read.parquet(os.path.join(ts_path, f))
            .agg(F.min("ts"), F.max("ts"), F.count("*"))
            .first()
        )
        n_total += n
        if n == 0:
            continue
        if prev_max is not None:
            assert lo >= prev_max, (f, lo, prev_max)
        prev_max = hi
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    want = spark.read.parquet(os.path.join(SF, "events.parquet")).count()
    assert n_total == want, "split lost or duplicated rows"


def test_funnel_gate_replays_multiple_microbatches(spark):
    """Append mode emits one row per (user, touching batch): more sink
    rows than users proves the replay really ran multiple micro-batches
    (equality would mean maxFilesPerTrigger was ignored and the gate
    silently degraded to single-batch replay)."""
    from vettore_spark import queries as Q

    Q.q_streaming_funnel_stage(spark, SF).count()
    raw = spark.table("streaming_funnel_stage_sink")
    users = raw.select("user_id").distinct().count()
    assert users > 0
    assert raw.count() > users, (
        "one emission per user — replay collapsed to a single batch"
    )


def test_topk_gate_replays_multiple_microbatches_and_projection(spark):
    """Update mode re-emits each touched user's leaderboard per batch:
    more sink rows than final (user, rank) slots proves multi-batch
    replay; and the max_by(struct(value, -id)) projection must equal the
    plain batch top-k (the slot-monotonicity argument, checked
    directly)."""
    from pyspark.sql import functions as F

    from vettore_spark import queries as Q

    got = Q.q_streaming_topk_per_key(spark, SF)
    final_rows = got.count()
    raw = spark.table("streaming_topk_per_key_sink")
    assert raw.count() > final_rows, (
        "one emission per slot — replay collapsed to a single batch"
    )
    # projection equals the batch window top-k on the same (converted) ts
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    want = (
        ev.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("user_id", "rank", "event_id", "value")
    )
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in want.collect()
    }


def test_horizon_gate_crossbatch_suppression(spark):
    """Gate-level invariant at sf0.001: exactly one keeper per distinct
    digest under the 4-batch doc_id-range replay (the 9999-hour horizon
    dominates the synthesized ts span, so no state can expire
    mid-replay)."""
    from pyspark.sql import functions as F

    from vettore_spark import queries as Q

    got = Q.q_streaming_horizon_dedup(spark, SF)
    n_keepers = got.count()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_digests = docs.select(F.md5("text")).distinct().count()
    assert n_keepers == n_digests


def test_horizon_dedup_crossbatch_duplicate_suppressed_4_batches(
    spark, tmp_path
):
    """Synthetic 4-file mtime-spaced source with a duplicate text in
    batch 0 and batch 2 (sf0.001 documents are all-distinct, so the
    corpus cannot exercise this): with a horizon dominating the ts span,
    the batch-2 duplicate MUST be suppressed through the state store —
    and the query must really have run 4 micro-batches
    (maxFilesPerTrigger honored)."""
    import os
    import time as _t

    from pyspark.sql import functions as F

    from vettore_spark.streaming.stateful import streaming_horizon_dedup

    src = tmp_path / "hsrc"
    os.makedirs(src)
    batches = [
        [(0, "alpha text"), (1, "beta text")],
        [(2, "gamma text")],
        [(3, "alpha text"), (4, "delta text")],  # dup of batch-0 doc 0
        [(5, "epsilon text")],
    ]
    base_t = _t.time() - 600
    for bi, rows in enumerate(batches):
        build = tmp_path / f"b{bi}"
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).coalesce(1).write.parquet(str(build))
        part = next(
            f for f in os.listdir(build)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        dst = src / f"{bi:03d}.parquet"
        os.rename(build / part, dst)
        os.utime(dst, (base_t + 2.0 * bi, base_t + 2.0 * bi))

    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withColumn(
            "ts", F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id"))
        )
    )
    out = streaming_horizon_dedup(stream, horizon="9999 hours")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("r13_horizon_sink")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError("streaming query did not finish in 120s")
    data_batches = [
        p for p in q.recentProgress if (p["numInputRows"] or 0) > 0
    ]
    assert len(data_batches) == 4, (
        f"{len(data_batches)} data micro-batches — maxFilesPerTrigger ignored"
    )
    keepers = spark.sql(
        "select doc_id, digest from r13_horizon_sink"
    ).collect()
    ids = sorted(r["doc_id"] for r in keepers)
    # doc 3 (the cross-batch duplicate) must NOT be a keeper
    assert ids == [0, 1, 2, 4, 5], ids


BAD = [float("nan"), float("inf"), float("-inf"), None]
BAD_IDS = ["nan", "inf", "-inf", "null"]


@pytest.mark.parametrize("bad", BAD, ids=BAD_IDS)
def test_nanpolicy_flat_topk_malformed_vector_never_wins(spark, bad):
    """NANPOLICY: a vector with a non-finite/NULL element must never take
    a top-k slot ahead of a real vector, for similarity AND distance
    metrics. (Before r13, Spark's least/greatest NaN-largest ordering
    made K.cosine CLAMP a NaN ratio to a perfect 1.0 — the malformed row
    won rank 1.)"""
    from vettore_spark.operators.search import flat_topk

    rows = [(i, [1.0 - 0.01 * i, 0.1 * i, 0.5, 0.25]) for i in range(8)]
    rows.append((99, [bad, 1.0, 1.0, 1.0]))
    emb = spark.createDataFrame(rows, "vec_id long, vector array<double>")
    q = [1.0, 0.0, 0.5, 0.25]
    for metric, pre in [("cosine", False), ("dot", True), ("l2", True)]:
        top = flat_topk(
            emb, q, metric=metric, k=5, id_col="vec_id",
            vector_col="vector", pre_normalized=pre,
        ).collect()
        ids = [r["vec_id"] for r in top]
        assert 99 not in ids, (metric, bad, ids)
        assert len(ids) == 5, (metric, bad)


@pytest.mark.parametrize("bad", BAD[:3], ids=BAD_IDS[:3])
def test_nanpolicy_cosine_kernel_nulls_nonfinite(spark, bad):
    """K.cosine yields NULL (not a clamped score) for non-finite input,
    and stays exact for clean input."""
    from pyspark.sql import functions as F

    from vettore_spark.functions import kernels as K

    df = spark.createDataFrame(
        [(1, [bad, 0.0]), (2, [3.0, 4.0]), (3, [0.0, 0.0])],
        "id long, v array<double>",
    )
    got = {
        r["id"]: r["c"]
        for r in df.select(
            "id",
            K.cosine(F.col("v"), F.array(F.lit(3.0), F.lit(4.0))).alias("c"),
        ).collect()
    }
    assert got[1] is None, (bad, got[1])
    assert got[2] == pytest.approx(1.0)
    assert got[3] == 0.0  # zero vector rule unchanged


@pytest.mark.parametrize("bad", BAD, ids=BAD_IDS)
def test_nanpolicy_retrieval_metrics_ignore_malformed_rel(spark, bad):
    """NANPOLICY: a non-finite relevance label is ignored — it must not
    crash the ANSI long cast, poison the query's nDCG to NaN, or rank
    first in the ideal-DCG window."""
    from vettore_spark.operators.eval_metrics import retrieval_metrics

    runs = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, doc_id long, rank long",
    )
    qrels = spark.createDataFrame(
        [(1, 10, 2.0), (1, 11, 1.0), (1, 12, bad)],
        "query_id long, doc_id long, rel double",
    )
    clean = spark.createDataFrame(
        [(1, 10, 2.0), (1, 11, 1.0)],
        "query_id long, doc_id long, rel double",
    )
    got = retrieval_metrics(runs, qrels, k=3).collect()
    want = retrieval_metrics(runs, clean, k=3).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want], bad
    for r in got:
        for v in r:
            assert v is None or v == v, (bad, r)  # no NaN in output


@pytest.mark.parametrize("bad", BAD, ids=BAD_IDS)
def test_nanpolicy_streaming_topk_drops_malformed_values(spark, tmp_path, bad):
    """NANPOLICY: a non-finite leaderboard value is dropped on arrival —
    it must not hold rank 1 forever (inf), scramble the Python sort
    (NaN), or crash the state encoder (NULL)."""
    import os

    from vettore_spark.streaming.stateful import streaming_topk_per_key

    src = tmp_path / "src"
    spark.createDataFrame(
        [(1, 100, 5.0), (1, 101, bad), (1, 102, 7.0), (1, 103, 6.0)],
        "user_id long, event_id long, value double",
    ).coalesce(1).write.parquet(str(src))
    schema = spark.read.parquet(str(src)).schema
    stream = spark.readStream.schema(schema).parquet(str(src))
    out = streaming_topk_per_key(stream, k=2)
    tag = "null" if bad is None else ("nan" if bad != bad else
                                      ("inf" if bad > 0 else "ninf"))
    name = f"r13_topk_sink_{tag}"
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError("streaming query did not finish in 120s")
    got = sorted(
        (r["rank"], r["event_id"], r["value"])
        for r in spark.sql(f"select * from {name}").collect()
    )
    assert got == [(1, 102, 7.0), (2, 103, 6.0)], (bad, got)


def test_nanpolicy_streaming_zscore_survives_poison_value(spark, tmp_path):
    """NANPOLICY: a NaN value must not permanently NaN the key's Welford
    state (which would silently disable anomaly detection for the key's
    entire future)."""
    from vettore_spark.streaming.stateful import streaming_zscore_anomaly

    rows = []
    # 15 calm events, then a NaN, then a wild outlier that MUST still flag
    for i in range(15):
        rows.append(("a", i, 1700000000 + i, 10.0 + 0.1 * (i % 3)))
    rows.append(("a", 50, 1700000050, float("nan")))
    rows.append(("a", 60, 1700000060, 1000.0))
    src = tmp_path / "src"
    spark.createDataFrame(
        rows, "event_type string, event_id long, ts long, value double"
    ).coalesce(1).write.parquet(str(src))
    schema = spark.read.parquet(str(src)).schema
    stream = spark.readStream.schema(schema).parquet(str(src))
    out = streaming_zscore_anomaly(stream, threshold=2.5, min_history=10)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("r13_zscore_sink")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError("streaming query did not finish in 120s")
    got = {
        r["event_id"]: (r["z"], r["is_anomaly"])
        for r in spark.sql("select * from r13_zscore_sink").collect()
    }
    z_nan, flag_nan = got[50]
    assert z_nan == 0.0 and flag_nan is False  # malformed row never flags
    z_out, flag_out = got[60]
    assert flag_out is True and z_out == z_out, (
        "outlier AFTER the poison row must still be detected"
    )


@pytest.mark.parametrize("bad", BAD[:3], ids=BAD_IDS[:3])
def test_nanpolicy_semdedup_malformed_never_prunes(spark, bad):
    """NANPOLICY: a malformed vector must never be scored similar to
    anything (its cosine is NULL) — it cannot prune real rows and ranks
    last in its cluster."""
    from vettore_spark.operators.selection import semdedup_prune

    emb = spark.createDataFrame(
        [
            (1, 0, [1.0, 0.0]),
            (2, 0, [0.99, 0.141]),   # near-dup of 1 -> pruned
            (3, 0, [bad, 0.0]),      # malformed
        ],
        "id long, cluster long, vector array<double>",
    )
    cent = spark.createDataFrame(
        [(0, [1.0, 0.0])], "cluster long, centroid array<double>"
    )
    out = {
        r["id"]: (r["kept"], r["cos_centroid"])
        for r in semdedup_prune(
            emb, cent, threshold=0.95, id_col="id", vector_col="vector",
            cluster_col="cluster", centroid_col="centroid",
        ).collect()
    }
    assert out[1][0] is True
    assert out[2][0] is False  # the real near-dup is pruned by row 1
    kept3, cos3 = out[3]
    assert cos3 is None, (bad, cos3)
    assert kept3 is True  # malformed is not a near-dup of anything


def test_nanpolicy_cross_encoder_nan_score_ranks_last(spark):
    """NANPOLICY: a NaN model score ranks LAST in the rerank window (desc
    NULLS LAST via the nan->null sort key), not first."""
    import pandas as pd

    from vettore_spark.encodings.encoders import rerank_with_model

    cands = spark.createDataFrame(
        [(1, "q", 10, "good"), (1, "q", 11, "bad"), (1, "q", 12, "ok")],
        "query_id long, query_text string, doc_id long, text string",
    )

    def fake(qs: pd.Series, ds: pd.Series) -> pd.Series:
        return pd.Series(
            [float("nan") if d == "bad" else (1.0 if d == "good" else 0.5)
             for d in ds]
        )

    got = rerank_with_model(cands, score_fn=fake, k=3).orderBy(
        "rank"
    ).collect()
    assert [r["doc_id"] for r in got] == [10, 12, 11]


@pytest.mark.parametrize("bad", BAD[:3], ids=BAD_IDS[:3])
def test_nanpolicy_token_budget_nonfinite_counts_dont_abort(spark, bad):
    """ANSI-cast abort class (found via the eval_metrics rel-cast crash):
    a NaN/±inf token COUNT previously rode the group sum into a long
    cast, which under ANSI mode aborts the whole job. Non-finite counts
    now contribute 0 tokens; selection for the rest proceeds."""
    from vettore_spark.operators.selection import select_token_budget

    wdf = spark.createDataFrame(
        [(1, 0.9, 10.0), (2, 0.8, bad), (3, 0.7, 5.0)],
        "doc_id long, w double, n_tokens double",
    )
    sel = {
        r["doc_id"]: r["selected"]
        for r in select_token_budget(
            wdf, 15, weight_col="w", tokens_col="n_tokens"
        ).collect()
    }
    # doc1 (10) fits; doc2 counts 0 tokens (selected rides its position);
    # doc3 (5) still fits within 15
    assert sel[1] is True and sel[3] is True


def test_quality_score_empty_text_does_not_abort(spark):
    """ANSI divide-by-zero class: Spark 4 default ANSI mode aborts EVERY
    division by zero (doubles included — 1.0/0.0 RAISES, it is not IEEE
    infinity), so an empty document's punct/chars ratio previously
    killed the whole quality-scoring job. Empty text now yields a NULL
    punct_ratio and finite remaining signals."""
    from vettore_spark.operators.text import quality_score

    df = spark.createDataFrame(
        [(1, ""), (2, "real text with several words here ok fine yes")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in quality_score(df).collect()}
    assert got[1]["punct_ratio"] is None
    assert got[2]["punct_ratio"] is not None
    for k, v in got[2].items():
        if isinstance(v, float):
            assert v == v, (k, v)  # no NaN on the real doc


def test_empty_input_operators_return_empty_not_crash(spark):
    """Degenerate-input sweep: representative operators over EMPTY frames
    return empty/zero results instead of crashing (the one crasher found
    — quality_score — is pinned above)."""
    from vettore_spark.operators import dedup as D
    from vettore_spark.operators import search as S
    from vettore_spark.operators import text as TX

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    empty_emb = spark.createDataFrame(
        [], "vec_id long, embedding array<double>, label string"
    )
    assert (
        S.flat_topk(
            empty_emb, [1.0, 0.0], metric="cosine", k=5, id_col="vec_id",
            vector_col="embedding", pre_normalized=False,
        ).count()
        == 0
    )
    assert TX.hashed_token_features(empty_docs, dim=8).count() == 0
    assert (
        TX.hashed_token_features(
            spark.createDataFrame([(1, None)], "doc_id long, text string"),
            dim=8,
        ).count()
        == 0
    )
    assert D.minhash_lsh_pairs(empty_docs).count() == 0
    assert D.simhash_pairs(empty_docs).count() == 0


def test_cosine_fold_appears_once_in_optimized_plan(spark):
    """The r13 cosine rework computes ratio/clamp in the aggregate's
    FINISH lambda, so the CodegenFallback fold appears exactly once in
    the optimized plan. The old shape referenced the folded struct from
    outside the aggregate (~4x after CollapseProject inlining — shown by
    the contrast expression below), and HOFs get no codegen
    subexpression elimination, so every printed copy runs."""
    from pyspark.sql import functions as F

    from vettore_spark.functions import kernels as K

    df = spark.createDataFrame([(1, [1.0, 2.0])], "id long, v array<double>")
    q = F.array(F.lit(1.0), F.lit(0.0))

    out = df.select(K.cosine(F.col("v"), q).alias("c"))
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("aggregate(") == 1, plan

    # contrast: the pre-r13 shape (acc referenced from outside) inlines
    # the fold once per reference — this is the regression this test
    # guards against
    pairs = F.zip_with(
        F.col("v"), q, lambda x, y: F.struct(x.alias("x"), y.alias("y"))
    )
    init = F.struct(
        F.lit(0.0).alias("d"), F.lit(0.0).alias("na"), F.lit(0.0).alias("nb")
    )
    acc = F.aggregate(
        pairs,
        init,
        lambda s, p: F.struct(
            (s["d"] + p["x"] * p["y"]).alias("d"),
            (s["na"] + p["x"] * p["x"]).alias("na"),
            (s["nb"] + p["y"] * p["y"]).alias("nb"),
        ),
    )
    denom = F.sqrt(acc["na"]) * F.sqrt(acc["nb"])
    old = df.select(
        F.when(denom == 0.0, F.lit(0.0))
        .otherwise(F.least(F.lit(1.0), F.greatest(F.lit(-1.0), acc["d"] / denom)))
        .alias("c")
    )
    old_plan = old._jdf.queryExecution().optimizedPlan().toString()
    assert old_plan.count("aggregate(") > 1, old_plan


def test_bench_compact_line_preserves_pergate_replay_map():
    """r12 verdict #3: the committed BENCH_r12 record collapsed the
    per-gate streaming_replay_sec map to {"total": ...} because the old
    trim cascade's last resort sacrificed it. The cascade must now keep
    ALL per-gate entries at every stage while still fitting the driver's
    capture window — pinned against a deliberately bloated record that
    forces every trim stage to fire."""
    import json

    from bench import compact_bench_line

    gates = {
        f"streaming_{name}": round(2.0 + i, 3)
        for i, name in enumerate(
            "events_hourly dedup_keepers horizon_dedup funnel_stage "
            "topk_per_key session_counts histogram_quantiles unit_dedup "
            "moment_stats kmv_distinct zscore_flag_counts simhash_pairs"
            .split()
        )
    }
    slowest = {f"some_very_long_query_name_number_{i:03d}": 9.999 - i * 0.01
               for i in range(20)}
    # the full timings map feeds the scaling-probe rows (r14 verdict #7:
    # same query names must reach the line at every core count)
    from bench import SCALING_PROBE

    timings = dict(slowest)
    timings.update({name: 1.234 for name in SCALING_PROBE})
    spread = {f"spread_query_name_number_{i:03d}": [0.5, 9.5]
              for i in range(12)}
    overlap = {f"overlap_tier_name_{i}": 0.9 for i in range(8)}
    muvera = {"default_candidates": 20, "recall_at_5_default": 1.0,
              "sweep": {f"c{i}": 0.9 for i in range(20)}}
    compact = {
        "metric": "headline_queries_total",
        "value": 55.5,
        "unit": "sec",
        "queries": dict(slowest),
        "n_queries": 191,
        "n_headline": 30,
        "full_registry_rest_sec": 30.1,
        "n_failed": 0,
        "streaming_replay_sec": dict(gates),
        "spread": dict(spread),
        "overlap_at_10_vs_exact": dict(overlap),
        "mutual_pair_recall": {f"recall_tier_{i}": 0.95 for i in range(8)},
        "muvera": dict(muvera),
        # REAL ingest-block keys (r14: the old fixture used a
        # "rows_per_sec" key the bench never emits, which hid that
        # stage 5 emptied the whole block)
        "ingest": {"put_many_rps": 99000.0, "lookup_rps": 22000.0,
                   "put_raw_ratio": 1.05, "put_many_spread": [1.0, 1.1, 1.2],
                   "detail": "x" * 200},
        "host_load": {"start": [0.2, 0.3, 0.4], "end": [0.5, 0.6, 0.7],
                      "verdict": "solo", "stalled_samples": 0,
                      "n_samples": 590},
        "best_of_3": {"min_value": 51.074, "min_source": "run3",
                      "min_stalled_samples": 0, "min_host_verdict": "solo",
                      "all_values": [51.0, 61.8, 90.3], "valid": True,
                      # audit maps (r14): must never reach the line
                      "min_queries": {f"q{i}": 1.0 for i in range(50)},
                      "min_streaming_replay_sec": {"g": 9.0},
                      "min_ingest": {"put_many_rps": 1.0,
                                     "put_many_spread": [1, 2, 3]}},
        "sf": 0.1,
    }
    line = compact_bench_line(
        compact, slowest=slowest, timings=timings, spread=spread,
        overlap=overlap, muvera=muvera,
    )
    assert len(line) <= 1800, len(line)
    parsed = json.loads(line)
    assert parsed["streaming_replay_sec"] == gates, (
        "per-gate replay map must survive the full trim cascade"
    )
    # every scaling-probe row survives the full cascade — the driver's
    # low-core ratios are computed by intersecting query names across runs
    assert all(parsed["queries"].get(n) == 1.234 for n in SCALING_PROBE), (
        "scaling-probe rows must survive every trim stage"
    )
    # and the headline value + host verdict survive too
    assert parsed["value"] == 55.5
    assert parsed["host_load"]["stalled_samples"] == 0
    # the ingest verdict keys must survive the stage-5 reduction (r14:
    # the old key filter matched nothing and emptied the block)
    assert parsed["ingest"] == {"put_many_rps": 99000.0,
                                "lookup_rps": 22000.0}
    # the best_of_3 audit maps are stripped before the cascade even
    # starts — they can never crowd out driver-visible signal
    assert not set(parsed.get("best_of_3", {})) & {
        "min_queries", "min_streaming_replay_sec", "min_ingest"
    }


def test_hashed_embedding_gate_parity_on_multibyte_corpus(spark, tmp_path):
    """Driver-gate contract in miniature: q_hashed_embedding (Spark) vs
    SQL_HASHED_EMBEDDING (DuckDB) agree row-for-row on a corpus whose every
    augmented doc carries multi-byte tokens."""
    import duckdb

    from vettore_spark import queries as Q

    docs = [(i, t) for i, (_, t) in enumerate(MIXED_DOCS)]
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
