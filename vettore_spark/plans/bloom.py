"""Deterministic Bloom-filter runtime join filtering.

The 100 TB join-pruning pattern made explicit at KEY level: when a big
fact table joins a selective dimension subset, shuffling the whole fact
side to discover that most rows have no partner wastes the dominant cost
of the join. Spark's own runtime filters (dynamic partition pruning,
`spark.sql.optimizer.runtime.bloomFilter.enabled`) apply the same idea
opportunistically; this module is the declarative version a pipeline can
pin: build an m-bit Bloom bitmap of the dimension keys (ONE tiny
aggregate — at most m/64 OR-ed words), embed it as a literal word array,
and prefilter the fact scan with a pure map-side expression BEFORE any
shuffle. The filter is a SUPERSET contract: every true partner passes
(no false negatives); a bounded fraction of non-partners leak through
(false positives) and are eliminated by the real join afterwards.

The bitmap collect is bounded by construction (m/64 longs — 1024 for the
default 2^16 bits — independent of both table sizes), the same bounded-
collect class as centroid codebooks; the probe is whole-stage-codegen
arithmetic over a literal array, no join, no shuffle, no Python.

Everything is deterministic md5 arithmetic (operators/sketch.py::hash60),
so a SQL oracle reproduces the exact bitmap and the exact surviving row
set — false positives included — bit for bit.

False-positive rate: (1 - e^(-k*n/m))^k; defaults m=2^16 bits, k=3 give
~0.5% at n=5k keys. Size m with the dimension-subset cardinality
(~10-16 bits per key); the word array stays m/64 longs regardless of
fact-table size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vettore_spark.operators.sketch import hash60


def _positions(key: Column, *, m_bits: int, k_hashes: int, salt: str) -> list[Column]:
    """The k deterministic bit positions for a key from ONE md5 draw,
    via Kirsch-Mitzenmacher double hashing (pos_i = h1 + i*h2 mod m —
    asymptotically the same false-positive rate as k independent
    hashes; Kirsch & Mitzenmacher 2006): the probe costs one md5+conv
    per row instead of k, which matters because the probe rides the
    full fact scan. h1 = low 30 bits, h2 = high 30 bits forced odd.
    SQL twin, with h = ('0x' || substr(md5('{salt}:' || key), 1, 15))::BIGINT:
    ((h % 1073741824) + i * ((h // 1073741824) | 1)) % m_bits."""
    base = hash60(key, salt=f"{salt}:")
    h1 = F.pmod(base, F.lit(1 << 30))
    h2 = F.call_function("shiftright", base, F.lit(30)).bitwiseOR(F.lit(1))
    return [
        F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)).cast("long")
        for i in range(k_hashes)
    ]


def bloom_build(
    df: DataFrame,
    key_col: str,
    *,
    m_bits: int = 1 << 16,
    k_hashes: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Aggregate the key set into a Bloom bitmap: rows of (word_idx, word)
    where word = bit_or of 1<<(pos%64) over every key hashing into that
    64-bit word. At most m_bits/64 rows; the groupBy is map-side combined
    (bit_or is associative), so the shuffle moves at most m/64 words per
    input partition however large the key table is."""
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError("m_bits must be a positive multiple of 64")
    if k_hashes < 1:
        raise ValueError("k_hashes must be >= 1")
    key = F.col(key_col).cast("string")
    pos = F.explode(
        F.array(*_positions(key, m_bits=m_bits, k_hashes=k_hashes, salt=salt))
    ).alias("_pos")
    return (
        df.select(pos)
        .select(
            (F.col("_pos") / 64).cast("long").alias("word_idx"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                F.pmod(F.col("_pos"), F.lit(64)).cast("int"),
            ).alias("_bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_bit").alias("word"))
    )


def bloom_words(bloom: DataFrame, *, m_bits: int = 1 << 16) -> list[int]:
    """Densify the bitmap into the m/64-long word list the probe embeds
    as a literal. BOUNDED collect: at most m/64 rows by construction
    (bloom_build's group key is word_idx < m/64), regardless of data."""
    words = [0] * (m_bits // 64)
    for r in bloom.collect():
        words[int(r["word_idx"])] = int(r["word"])
    return words


def bloom_might_contain(
    key: Column | str,
    words: list[int],
    *,
    k_hashes: int = 3,
    salt: str = "bloom",
) -> Column:
    """Map-side membership test: AND over the k probed bits, each read
    from the literal word array with element_at + bitwise AND — pure
    whole-stage-codegen arithmetic, no join, no shuffle. True means
    "might be in the set" (run the real join on survivors); False is
    definitive absence."""
    m_bits = len(words) * 64
    key_c = (F.col(key) if isinstance(key, str) else key).cast("string")
    words_lit = F.array(*[F.lit(w).cast("long") for w in words])
    cond = F.lit(True)
    for pos in _positions(key_c, m_bits=m_bits, k_hashes=k_hashes, salt=salt):
        widx = (pos / 64).cast("long")
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), F.pmod(pos, F.lit(64)).cast("int")
        )
        cond = cond & (
            F.element_at(words_lit, (widx + 1).cast("int")).bitwiseAND(mask)
            == mask
        )
    return cond
