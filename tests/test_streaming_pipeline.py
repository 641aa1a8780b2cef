"""Streaming parity for the corpus-prep map operators: the same pipeline
functions (redact_pii, repetition_stats, quality filters) compose onto a
readStream source unchanged — map-only expressions are streamable by
construction — and the streamed output equals the batch output."""

from __future__ import annotations

from pyspark.sql import functions as F

from vettore_spark.operators import pipeline as PL
from vettore_spark.operators import text as TX

ROWS = [
    (0, "mail a.b@x.io now ip 10.0.0.1 spam spam spam spam spam spam"),
    (1, "a b c d e f g h i j k tel +1-555-0042"),
    (2, "clean words only in this one truly"),
    (3, "c@d.org c@d.org 192.168.1.1 192.168.1.1"),
]
SCHEMA = "doc_id long, text string"


def _stream(spark, tmp_path, name):
    src = tmp_path / name
    spark.createDataFrame(ROWS[:2], SCHEMA).write.parquet(str(src / "b1"))
    spark.createDataFrame(ROWS[2:], SCHEMA).write.parquet(str(src / "b2"))
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*")
    )


def _run(stream_df, spark, qname):
    q = (
        stream_df.writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {qname}").collect()


def test_streaming_pii_redact_matches_batch(spark, tmp_path):
    batch_df = spark.createDataFrame(ROWS, SCHEMA)
    want = {r["doc_id"]: r.asDict() for r in PL.redact_pii(batch_df).collect()}
    got_rows = _run(PL.redact_pii(_stream(spark, tmp_path, "pii")), spark, "pii_out")
    got = {r["doc_id"]: r.asDict() for r in got_rows}
    assert got == want
    assert got[0]["n_emails"] == 1 and got[3]["n_ips"] == 2


def test_streaming_repetition_stats_matches_batch(spark, tmp_path):
    batch_df = spark.createDataFrame(ROWS, SCHEMA)
    want = {r["doc_id"]: r.asDict() for r in PL.repetition_stats(batch_df).collect()}
    got_rows = _run(
        PL.repetition_stats(_stream(spark, tmp_path, "rep")), spark, "rep_out"
    )
    got = {r["doc_id"]: r.asDict() for r in got_rows}
    assert got == want
    assert got[0]["keep"] is False  # the spam doc


def test_streaming_quality_filter_chain(spark, tmp_path):
    """A quality-gate chain (token stats + keep predicate) composes onto the
    stream: only docs passing the filter reach the sink."""
    stream = _stream(spark, tmp_path, "qf")
    gated = PL.repetition_stats(stream).filter(F.col("keep"))
    got = {r["doc_id"] for r in _run(gated, spark, "qf_out")}
    batch = PL.repetition_stats(spark.createDataFrame(ROWS, SCHEMA))
    want = {r["doc_id"] for r in batch.filter(F.col("keep")).collect()}
    assert got == want and 0 not in got


def test_streaming_text_embed_matches_batch(spark, tmp_path):
    """Model inference composes onto a stream unchanged: encode_texts is
    mapInPandas (map-only), so the streamed embeddings equal the batch
    embeddings row for row. parallelism=0 keeps the stream's partitioning —
    the repartition spread is a batch-only optimization (an exchange is
    fine on streams, but the unsplittable-file rationale doesn't apply)."""
    from vettore_spark.encodings import encoders as EN

    batch_df = spark.createDataFrame(ROWS, SCHEMA)
    want = {
        r["doc_id"]: r["embedding"]
        for r in EN.encode_texts(batch_df, dim=8, parallelism=0).collect()
    }
    got_rows = _run(
        EN.encode_texts(_stream(spark, tmp_path, "emb"), dim=8, parallelism=0),
        spark,
        "emb_out",
    )
    got = {r["doc_id"]: r["embedding"] for r in got_rows}
    assert got == want
    assert all(len(v) == 8 for v in got.values())


def test_streaming_mlm_masking_matches_batch(spark, tmp_path):
    """MLM masking is a pure per-row expression — it composes onto
    readStream unchanged and the masked pairs match batch output."""
    from vettore_spark.operators.text import mlm_mask_tokens

    batch_df = spark.createDataFrame(ROWS, SCHEMA)
    want = {r["doc_id"]: r.asDict()
            for r in mlm_mask_tokens(batch_df, mask_rate=0.3).collect()}
    got_rows = _run(
        mlm_mask_tokens(_stream(spark, tmp_path, "mlm"), mask_rate=0.3),
        spark, "mlm_out",
    )
    got = {r["doc_id"]: r.asDict() for r in got_rows}
    assert got == want


def test_normalize_and_blocklist_stream_parity(spark, tmp_path):
    """Round-3 map-only text operators compose onto readStream unchanged:
    normalize_text -> blocklist_filter streamed == batched."""
    stream = _stream(spark, tmp_path, "r3maps")
    out = TX.blocklist_filter(
        TX.normalize_text(stream).select("doc_id", "text"), ["spam"],
        max_fraction=0.1,
    )
    got = _run(out, spark, "r3maps_q")
    batch = TX.blocklist_filter(
        TX.normalize_text(
            spark.createDataFrame(ROWS, SCHEMA)
        ).select("doc_id", "text"),
        ["spam"],
        max_fraction=0.1,
    ).collect()
    want = {tuple(r) for r in batch}
    assert {tuple(r) for r in got} == want
    assert any(not r["passed"] for r in batch)  # the spam doc fails


def test_stream_incremental_dedup_into_corpus(spark, tmp_path):
    """Continuous corpus building: each micro-batch dedupes against the
    corpus-so-far — exact digests first, then MinHash near-dup — and only
    genuinely-new documents are absorbed. foreachBatch + the incremental
    dedup operators compose without any new machinery."""
    from vettore_spark.operators import dedup as D

    base_a = "the quick brown fox jumps over the lazy dog and then runs far away home"
    base_b = "spark builds declarative plans that catalyst optimizes into narrow scans"
    src = tmp_path / "inc"
    schema = "doc_id: long, text: string"
    spark.createDataFrame(
        [(1, base_a), (2, base_b)], schema
    ).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(
        [
            (10, base_a),             # exact dup of corpus doc 1
            (11, base_b + " today"),  # near-dup of corpus doc 2
            (12, "entirely novel content about batched vector search"),
        ],
        schema,
    ).coalesce(1).write.parquet(str(src / "b2"))

    from pyspark.sql import types as T

    empty_schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    state = {"corpus": spark.createDataFrame([], empty_schema)}

    def absorb(batch_df, _batch_id):
        fresh = D.dedup_against(batch_df, state["corpus"])
        near = D.minhash_dedup_against(
            fresh, state["corpus"], threshold=0.5
        ).select("doc_id").distinct()
        fresh = fresh.join(near, "doc_id", "left_anti")
        # lineage cut per batch: the corpus-so-far must not accrete a
        # per-batch plan tree (same policy as Collection.put_many)
        state["corpus"] = (
            state["corpus"].unionByName(fresh.select("doc_id", "text"))
            .localCheckpoint(eager=True)
        )

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*")
        .writeStream.foreachBatch(absorb)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["doc_id"] for r in state["corpus"].collect())
    assert got == [1, 2, 12]  # 10 (exact) and 11 (near) were absorbed away
