"""Corpus-preparation operator tests (chunking, decontamination, PII,
repetition, keep-best) against hand-computed oracles."""

from __future__ import annotations

import pytest

from vettore_spark.operators import pipeline as PL


def test_chunk_documents_windows(spark):
    df = spark.createDataFrame(
        [(0, " ".join(f"w{i}" for i in range(10))), (1, "a b"), (2, "x")],
        ["doc_id", "text"],
    )
    rows = PL.chunk_documents(df, chunk_tokens=4, stride=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: 10 tokens, starts 0,3,6,9 -> 4 chunks
    c0 = sorted(by_doc[0], key=lambda r: r["chunk_id"])
    assert [r["chunk_id"] for r in c0] == [0, 1, 2, 3]
    assert c0[0]["chunk_text"] == "w0 w1 w2 w3"
    assert c0[3]["chunk_text"] == "w9"
    assert c0[3]["n_chunk_tokens"] == 1
    # every token index appears in some chunk (no boundary loss)
    covered = set()
    for r in c0:
        covered.update(r["chunk_text"].split())
    assert covered == {f"w{i}" for i in range(10)}
    assert len(by_doc[1]) == 1 and by_doc[1][0]["chunk_text"] == "a b"
    assert len(by_doc[2]) == 1


def test_decontaminate_flags_verbatim_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [
            # contains the benchmark 8-gram span verbatim
            (0, "x alpha beta gamma delta epsilon zeta eta theta y"),
            (1, "completely different words in this document here now ok"),
        ],
        ["doc_id", "text"],
    )
    rows = PL.decontaminate(corpus, bench, n=8, min_hits=1).collect()
    assert [r["doc_id"] for r in rows] == [0]
    assert rows[0]["n_contaminated"] == 1
    assert rows[0]["n_shingles"] == 3  # 10 tokens -> 3 distinct 8-grams


def test_redact_pii_counts_and_scrubs(spark):
    df = spark.createDataFrame(
        [(0, "mail a.b@x.io and c@y.org ip 10.0.0.1 tel +1-555-0042 done")],
        ["doc_id", "text"],
    )
    r = PL.redact_pii(df).collect()[0]
    assert (r["n_emails"], r["n_phones"], r["n_ips"]) == (2, 1, 1)
    assert (
        r["redacted"]
        == "mail <EMAIL> and <EMAIL> ip <IP> tel <PHONE> done"
    )


def test_repetition_stats_flags_repeats(spark):
    df = spark.createDataFrame(
        [
            (0, "a b c d e f g h i j k l m n o p"),  # all distinct
            (1, "spam spam spam spam spam spam"),  # one token repeated
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in PL.repetition_stats(df, n=3).collect()}
    assert got[0]["dup_ngram_frac"] == 0.0
    assert got[0]["keep"] is True
    # doc 1: 4 identical 3-grams -> dup frac 3/4; top token frac 1.0
    assert got[1]["dup_ngram_frac"] == pytest.approx(0.75)
    assert got[1]["top_token_frac"] == 1.0
    assert got[1]["keep"] is False


def test_keep_best_per_cluster_picks_highest_quality(spark):
    clusters = spark.createDataFrame(
        [(1, 100, 2), (2, 100, 2), (3, 300, 1)],
        ["doc_id", "component", "cluster_size"],
    )
    quality = spark.createDataFrame(
        [(1, 0.4), (2, 0.9), (3, 0.5)], ["doc_id", "quality"]
    )
    rows = sorted(
        PL.keep_best_per_cluster(clusters, quality).collect(),
        key=lambda r: r["component"],
    )
    assert [(r["component"], r["keep_doc_id"], r["quality"]) for r in rows] == [
        (100, 2, 0.9),
        (300, 3, 0.5),
    ]


def test_keep_best_tie_breaks_by_id(spark):
    clusters = spark.createDataFrame(
        [(5, 7, 2), (6, 7, 2)], ["doc_id", "component", "cluster_size"]
    )
    quality = spark.createDataFrame([(5, 0.5), (6, 0.5)], ["doc_id", "quality"])
    rows = PL.keep_best_per_cluster(clusters, quality).collect()
    assert len(rows) == 1 and rows[0]["keep_doc_id"] == 5


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=4), min_size=1, max_size=40
    ),
    st.integers(min_value=2, max_value=8),
    st.integers(min_value=1, max_value=8),
)
@settings(max_examples=10, deadline=None)
def test_chunking_covers_every_token_in_order(spark, token_list, chunk, stride):
    """Property: overlapping chunks cover every token; stitching chunk
    strides back together reproduces the document."""
    stride = min(stride, chunk)  # stride > chunk would skip tokens
    text = " ".join(token_list)
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    rows = sorted(
        PL.chunk_documents(df, chunk_tokens=chunk, stride=stride).collect(),
        key=lambda r: r["chunk_id"],
    )
    stitched: list = []
    for r in rows:
        toks = r["chunk_text"].split(" ")
        start = r["chunk_id"] * stride
        stitched[start : start + len(toks)] = toks
    assert stitched == token_list


@given(st.text(alphabet="ab@. 0-9+xyz", max_size=60))
@settings(max_examples=8, deadline=None)  # 2 Spark jobs per example (r14 trim)
def test_pii_redaction_is_idempotent(spark, text):
    """Property: redacting already-redacted text changes nothing (the
    replacement tokens contain no redactable patterns)."""
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    once = PL.redact_pii(df).collect()[0]["redacted"]
    twice = PL.redact_pii(
        spark.createDataFrame([(0, once)], ["doc_id", "text"])
    ).collect()[0]["redacted"]
    assert twice == once


def test_sequence_packing_conserves_tokens(spark):
    """Packing property: sequence token counts partition the chunk tokens
    exactly, seq_ids are contiguous from 0, and every sequence except the
    last starts before the 512-token boundary it overshoots."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [(i, " ".join(f"w{j}" for j in range(5 + (i * 7) % 40))) for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    chunks = PL.chunk_documents(df, chunk_tokens=16, stride=12)
    total = chunks.agg(F.sum("n_chunk_tokens")).first()[0]
    w = Window.orderBy("doc_id", "chunk_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    seq = F.floor(
        (F.sum("n_chunk_tokens").over(w) - F.col("n_chunk_tokens")) / F.lit(64)
    ).cast("long")
    packed = (
        chunks.withColumn("seq_id", seq)
        .groupBy("seq_id")
        .agg(F.sum("n_chunk_tokens").alias("n_tokens"))
        .orderBy("seq_id")
        .collect()
    )
    assert sum(r["n_tokens"] for r in packed) == total
    assert [r["seq_id"] for r in packed] == list(range(len(packed)))
    # non-last sequences span at least 64 - (chunk_len - 1) tokens: a
    # boundary-straddling chunk belongs to the sequence where it STARTS,
    # so the overshoot is borrowed from the next sequence's budget
    for r in packed[:-1]:
        assert r["n_tokens"] >= 64 - 15


def test_mlm_masking_deterministic_and_consistent(spark):
    from vettore_spark.operators.text import mlm_mask_tokens

    df = spark.createDataFrame(
        [(1, "one two three four five six seven eight nine ten " * 5),
         (2, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    a = {r["doc_id"]: r for r in mlm_mask_tokens(df, mask_rate=0.3).collect()}
    b = {r["doc_id"]: r for r in mlm_mask_tokens(df, mask_rate=0.3).collect()}
    for i in a:
        assert a[i]["input_text"] == b[i]["input_text"]  # deterministic
        toks_in = a[i]["input_text"].split(" ")
        n_masked = sum(1 for t in toks_in if t == "<mask>")
        assert n_masked == a[i]["n_masked"]
        if n_masked:
            assert len(a[i]["target_text"].split(" ")) == n_masked
        # reconstruction: substituting targets back yields the original
        tgt = a[i]["target_text"].split(" ") if n_masked else []
        it = iter(tgt)
        rebuilt = " ".join(next(it) if t == "<mask>" else t for t in toks_in)
        orig = {1: ("one two three four five six seven eight nine ten " * 5).strip(),
                2: "alpha beta gamma delta"}[i]
        assert rebuilt == orig
    # rate sanity on the long doc: within a loose band of 30%
    frac = a[1]["n_masked"] / 50
    assert 0.1 < frac < 0.5


def test_mlm_masking_rate_extremes(spark):
    from vettore_spark.operators.text import mlm_mask_tokens

    df = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id long, text string"
    )
    none = mlm_mask_tokens(df, mask_rate=0.0).collect()[0]
    assert none["n_masked"] == 0 and none["input_text"] == "a b c d e f g h"
    assert none["target_text"] == ""
    everything = mlm_mask_tokens(df, mask_rate=1.0).collect()[0]
    assert everything["n_masked"] == 8
    assert everything["input_text"] == " ".join(["<mask>"] * 8)
    assert everything["target_text"] == "a b c d e f g h"


def test_distinct_ngram_diversity_detects_repetition(spark):
    from vettore_spark.operators.text import distinct_ngram_diversity

    rows = [(i, "rep", "same same same same same same") for i in range(5)]
    rows += [(100 + i, "div", f"unique{i}a unique{i}b unique{i}c unique{i}d")
             for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {(r["lang"], r["n"]): r for r in
           distinct_ngram_diversity(df, group_col="lang").collect()}
    # repetitive corpus: 30 unigram instances, 1 unique
    assert out[("rep", 1)]["total"] == 30 and out[("rep", 1)]["uniq"] == 1
    # diverse corpus: all unigrams unique
    assert out[("div", 1)]["distinct_ratio"] == 1.0
    assert out[("rep", 3)]["uniq"] == 1
    assert out[("div", 2)]["distinct_ratio"] == 1.0


def test_mlm_masking_null_text_dropped(spark):
    from vettore_spark.operators.text import mlm_mask_tokens

    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, None)], "doc_id long, text string"
    )
    out = mlm_mask_tokens(df, mask_rate=0.5).collect()
    # the NULL-text doc is absent (matching the SQL twin), never a
    # nonsense n_masked=-1 row
    assert [r["doc_id"] for r in out] == [1]
