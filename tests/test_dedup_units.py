"""Unit-level (paragraph) dedup, incremental cross-corpus dedup, and text
normalization — round-3 operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from vettore_spark.operators import dedup as D
from vettore_spark.operators import text as TX


def test_paragraph_dedup_delimiter_mode(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta\n\nshared passage here\n\ngamma"),
            (2, "shared passage here\n\ndelta"),
            (3, "unique only"),
        ],
        "doc_id: long, text: string",
    )
    out = {
        r["doc_id"]: r
        for r in D.paragraph_dedup(
            docs, delimiter=r"\n\n", joiner="\n\n"
        ).collect()
    }
    # doc 1 keeps everything (first occurrence of the shared passage)
    assert out[1]["text"] == "alpha beta\n\nshared passage here\n\ngamma"
    assert out[1]["n_dropped"] == 0 and out[1]["n_units"] == 3
    # doc 2 loses the passage doc 1 already claimed
    assert out[2]["text"] == "delta"
    assert out[2]["n_dropped"] == 1 and out[2]["n_units"] == 2
    assert out[3]["text"] == "unique only"


def test_paragraph_dedup_window_mode(spark):
    # 2-token windows; doc 20 repeats doc 10's first window
    docs = spark.createDataFrame(
        [(10, "a b c d"), (20, "a b x y"), (30, "")],
        "doc_id: long, text: string",
    )
    out = {
        r["doc_id"]: r for r in D.paragraph_dedup(docs, window=2).collect()
    }
    assert out[10]["text"] == "a b c d" and out[10]["n_units"] == 2
    assert out[20]["text"] == "x y" and out[20]["n_dropped"] == 1
    # empty text still comes back as one (empty) unit, never dropped rows
    assert out[30]["n_units"] == 1


def test_paragraph_dedup_fully_duplicate_doc_empties(spark):
    docs = spark.createDataFrame(
        [(1, "p q r s"), (2, "p q r s")], "doc_id: long, text: string"
    )
    out = {r["doc_id"]: r for r in D.paragraph_dedup(docs, window=2).collect()}
    assert out[1]["text"] == "p q r s"
    assert out[2]["text"] == "" and out[2]["n_dropped"] == 2


def test_dedup_against_drops_only_corpus_matches(spark):
    corpus = spark.createDataFrame(
        [(1, "seen before"), (2, "also seen")], "doc_id: long, text: string"
    )
    new = spark.createDataFrame(
        [(10, "seen before"), (11, "brand new"), (12, "brand new")],
        "doc_id: long, text: string",
    )
    got = sorted(r["doc_id"] for r in D.dedup_against(new, corpus).collect())
    # 10 dropped (in corpus); 11 and 12 both kept (intra-batch dups stay)
    assert got == [11, 12]


def test_normalize_text_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "Hello\tWorld  twice "),
            (2, "already clean"),
        ],
        "doc_id: long, text: string",
    )
    out = {r["doc_id"]: r for r in TX.normalize_text(docs).collect()}
    assert out[1]["text"] == "hello world twice"
    assert out[1]["changed"] is True
    assert out[1]["n_chars_before"] == len("Hello\tWorld  twice ")
    assert out[1]["n_chars_after"] == len("hello world twice")
    assert out[2]["text"] == "already clean" and out[2]["changed"] is False


def test_normalize_text_is_map_only(spark):
    docs = spark.createDataFrame([(1, "A  b")], "doc_id: long, text: string")
    plan = (
        TX.normalize_text(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # pure per-row projection, no shuffle


def test_paragraph_dedup_doc_scope_keeps_cross_doc_repeats(spark):
    """scope='doc' removes only WITHIN-document repeats; the same unit in
    a different document survives."""
    docs = spark.createDataFrame(
        [(1, "p q p q"), (2, "p q z z")], "doc_id: long, text: string"
    )
    out = {
        r["doc_id"]: r
        for r in D.paragraph_dedup(docs, window=2, scope="doc").collect()
    }
    # doc 1: second "p q" window dropped within the doc
    assert out[1]["text"] == "p q" and out[1]["n_dropped"] == 1
    # doc 2 keeps its own "p q" (cross-doc repeat allowed) and "z z"
    assert out[2]["text"] == "p q z z" and out[2]["n_dropped"] == 0


def test_blocklist_filter_semantics(spark):
    docs = spark.createDataFrame(
        [(1, "clean words only"), (2, "one BAD token here"), (3, "bad bad bad")],
        "doc_id: long, text: string",
    )
    out = {
        r["doc_id"]: r
        for r in TX.blocklist_filter(docs, ["bad"], max_fraction=0.3).collect()
    }
    assert out[1]["passed"] and out[1]["n_blocked"] == 0
    # case-insensitive match; 1/4 tokens > 0.3 fails? 0.25 <= 0.3 passes
    assert out[2]["n_blocked"] == 1 and out[2]["passed"]
    assert out[3]["n_blocked"] == 3 and not out[3]["passed"]


def test_blocklist_filter_rejects_empty_list(spark):
    import pytest as _pytest

    docs = spark.createDataFrame([(1, "x")], "doc_id: long, text: string")
    with _pytest.raises(ValueError):
        TX.blocklist_filter(docs, [])


def test_blocklist_filter_is_map_only(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id: long, text: string")
    plan = (
        TX.blocklist_filter(docs, ["a"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_normalize_text_idempotent(spark):
    """normalize(normalize(x)) == normalize(x) — the canonical form is a
    fixed point, so re-running the cleanup pass can never churn bytes."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["  A\tB  ", "x\x01y", "already clean", "", "MiXeD  CaSe"]
        )],
        "doc_id: long, text: string",
    )
    once = TX.normalize_text(docs).select("doc_id", "text")
    twice = TX.normalize_text(once).collect()
    assert all(r["changed"] is False for r in twice)


def test_paragraph_dedup_idempotent_on_own_output(spark):
    """Global unit dedup is a projection: running it again on its own
    (non-empty) output drops nothing."""
    docs = spark.createDataFrame(
        [(1, "a b c d a b"), (2, "a b x y"), (3, "c d c d")],
        "doc_id: long, text: string",
    )
    once = (
        D.paragraph_dedup(docs, window=2)
        .filter(F.col("text") != "")
        .select("doc_id", "text")
    )
    again = D.paragraph_dedup(once, window=2).collect()
    assert all(r["n_dropped"] == 0 for r in again)


def test_minhash_dedup_against_flags_cross_corpus_neardups(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    corpus = spark.createDataFrame(
        [(1, base), (2, "completely different text about spark query engines")],
        "doc_id: long, text: string",
    )
    new = spark.createDataFrame(
        [
            (10, base + " extra"),          # near-dup of corpus doc 1
            (11, "novel content with no counterpart in the corpus at all"),
        ],
        "doc_id: long, text: string",
    )
    got = D.minhash_dedup_against(new, corpus, threshold=0.5).collect()
    assert {(r["doc_id"], r["corpus_id"]) for r in got} == {(10, 1)}
    assert all(r["jac"] >= 0.5 for r in got)
    # intra-batch and intra-corpus pairs are never emitted
    assert all(r["doc_id"] in (10, 11) and r["corpus_id"] in (1, 2) for r in got)


def test_minhash_dedup_against_consistent_with_union_pairs(spark):
    """Cross-corpus near-dup detection must agree with running the same-
    params LSH pair operator over the UNION corpus and keeping only the
    cross-source pairs (at a threshold where banding recall is ~1)."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    corpus = spark.createDataFrame(
        [(1, base), (2, "unrelated content that matches nothing else here")],
        "doc_id: long, text: string",
    )
    new = spark.createDataFrame(
        [(10, base), (11, base + " nu"), (12, "fresh novel words only")],
        "doc_id: long, text: string",
    )
    got = {
        (r["doc_id"], r["corpus_id"])
        for r in D.minhash_dedup_against(new, corpus, threshold=0.8).collect()
    }
    union_pairs = D.minhash_lsh_pairs(
        corpus.unionByName(new), threshold=0.8
    ).collect()
    cross = {
        (max(r["doc_a"], r["doc_b"]), min(r["doc_a"], r["doc_b"]))
        for r in union_pairs
        if (r["doc_a"] < 10) != (r["doc_b"] < 10)  # one side in each corpus
    }
    assert got == cross and (10, 1) in got


def test_paragraph_dedup_null_text_keeps_doc_row(spark):
    """A NULL-text document must still appear in the output (zero units,
    empty text), preserving the one-row-per-input-doc contract — the r4
    advice fix for the posexplode NULL drop."""
    df = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, "")],
        "doc_id: long, text: string",
    )
    for scope in ("global", "doc"):
        rows = {
            r["doc_id"]: r
            for r in D.paragraph_dedup(df, window=2, scope=scope).collect()
        }
        assert set(rows) == {1, 2, 3}
        assert rows[2]["text"] == "" and rows[2]["n_units"] == 0
        assert rows[2]["n_dropped"] == 0
        assert rows[1]["n_units"] == 2 and rows[1]["n_dropped"] == 0


def test_c4_line_filter_semantics(spark):
    """Terminal-punctuation AND min-words rules per line; all-dropped docs
    keep their row (empty text); NULL text -> one empty line, dropped."""
    from vettore_spark.operators.text import c4_line_filter

    df = spark.createDataFrame(
        [
            (1, "this line has enough words here.\nshort one.\nno terminal line with words\nanother good line of text here!"),
            (2, "everything here fails"),
            (3, None),
        ],
        "doc_id: long, text: string",
    )
    rows = {r["doc_id"]: r for r in c4_line_filter(df, min_words=5).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["n_lines"] == 4 and rows[1]["n_kept"] == 2
    assert rows[1]["text"] == (
        "this line has enough words here.\nanother good line of text here!"
    )
    assert rows[2]["n_kept"] == 0 and rows[2]["text"] == ""
    assert rows[3]["n_lines"] == 1 and rows[3]["n_kept"] == 0


def test_c4_line_filter_is_map_only(spark):
    from vettore_spark.operators.text import c4_line_filter

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        c4_line_filter(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
