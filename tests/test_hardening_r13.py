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
