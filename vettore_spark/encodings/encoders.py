"""Pluggable text-encoder inference stage — the model-in-the-loop analog of
the reference's env-gated fastembed integration
(test/ex_fastembed_integration_test.exs:9-60: real ONNX embeddings feed
`put_many` only when the model is present; everything else runs without it).

The Spark-side plumbing is real and tested: texts stream through
`mapInPandas` in Arrow batches, the encoder is a pluggable
`pd.Series -> np.ndarray` callable, and the output lands as a dense
embedding column ready for every search/dedup operator. What stands in for
the model in this environment is `fake_encode_texts`: sha256-byte expansion
(pixel-bytes-are-digest-bytes, like sources/multimodal.fake_decode_image),
centered and L2-normalized with LEFT-FOLD arithmetic so any SQL engine can
recompute the exact floats (see queries.SQL_TEXT_EMBED).

A real model loads via `load_real_encoder` behind an import-try
(sentence-transformers is not in this container): swap it in through
`encode_fn` and nothing else changes — batching, partition spreading, and
schema are identical.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from vettore_spark.sources.multimodal import _spread


def fake_encode_texts(texts: pd.Series, *, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in encoder: embedding bytes ARE sha256 digest
    bytes of the text (counter-suffixed for dim > 32), centered to
    (b - 127.5)/127.5 and L2-normalized. The norm is accumulated LEFT TO
    RIGHT in f64 — matching DuckDB's list_reduce fold exactly, where
    numpy's BLAS dot could differ in the last ulp."""
    out = np.empty((len(texts), dim), dtype=np.float64)
    for j, t in enumerate(texts):
        raw = (t or "").encode()
        buf = b""
        k = 0
        while len(buf) < dim:
            buf += hashlib.sha256(raw + b":" + str(k).encode()).digest()
            k += 1
        v = [(b - 127.5) / 127.5 for b in buf[:dim]]
        sq = 0.0
        for x in v:
            sq += x * x
        nrm = sq**0.5
        out[j] = [x / nrm for x in v]
    return out


def load_real_encoder(
    model_name: str | None = None,
) -> Callable[[pd.Series], np.ndarray]:
    """Real sentence-encoder factory, env-gated like the reference's
    fastembed test: requires sentence-transformers (not in this container)
    and `SPARK_VETTORE_EMBED_MODEL` (or an explicit model_name)."""
    name = model_name or os.environ.get("SPARK_VETTORE_EMBED_MODEL")
    if not name:
        raise NotImplementedError(
            "no embedding model configured; set SPARK_VETTORE_EMBED_MODEL "
            "or pass model_name (and install sentence-transformers)"
        )
    try:
        from sentence_transformers import SentenceTransformer
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "sentence-transformers is not installed in this environment; "
            "use fake_encode_texts for pipeline testing"
        ) from e
    model = SentenceTransformer(name)  # pragma: no cover

    def encode(texts: pd.Series) -> np.ndarray:  # pragma: no cover
        return np.asarray(model.encode(list(texts), normalize_embeddings=True))

    return encode  # pragma: no cover


def encode_texts(
    df: DataFrame,
    *,
    encode_fn: Callable[[pd.Series], np.ndarray] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 16,
    parallelism: int | None = None,
) -> DataFrame:
    """Model-inference stage: (id, text) -> (id, embedding array<double>).

    Arrow batches flow through mapInPandas; `encode_fn` sees a whole
    pd.Series per batch (models amortize over batches — never call a model
    per row). The narrow (id, text) projection is spread across at least
    the default parallelism first, so an unsplittable single-row-group
    parquet file cannot serialize all inference through one Python worker
    (same rationale as multimodal._spread). At scale this is the GPU/CPU
    inference pattern: one model instance per executor python worker,
    batch-size-bounded memory."""
    if encode_fn is None:
        fn = lambda s: fake_encode_texts(s, dim=dim)  # noqa: E731
    else:
        fn = encode_fn
    src = _spread(df, [id_col, text_col], parallelism)
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mat = fn(pdf[text_col])
            yield pd.DataFrame(
                {id_col: pdf[id_col], "embedding": list(map(list, mat))}
            )

    return src.mapInPandas(run, out_schema)
