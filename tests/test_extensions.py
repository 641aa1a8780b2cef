"""Tests for the compat facade, pluggable stores/indexes, streaming ingest,
and multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vettore_spark.compat import Vettore
from vettore_spark.sources.store import FlatIndex, LshIndex, MemoryStore, ParquetStore
from vettore_spark.sources import multimodal as MM
from vettore_spark.streaming.ingest import (
    stream_into_collection,
    validate_batch,
    windowed_event_counts,
)


# -- compat facade (vettore.ex:317-642) -------------------------------------


def test_compat_lifecycle(spark):
    db = Vettore.new(spark)
    db.create_collection("c", 2, metric="euclidean")  # alias -> l2
    db.insert("c", {"id": "a", "vector": [0.0, 0.0], "metadata": {"k": "1"}})
    db.batch("c", [
        {"id": "b", "vector": [1.0, 1.0]},
        {"id": "d", "vector": [5.0, 5.0]},
    ])
    assert db.get_by_value("c", "a")["id"] == "a"
    assert db.get_by_vector("c", [1.0, 1.0])["id"] == "b"
    all_rows = db.get_all("c")
    assert {t[0] for t in all_rows} == {"a", "b", "d"}
    assert all(len(t) == 3 for t in all_rows)
    pairs = db.similarity_search("c", [0.9, 0.9], limit=2)
    assert [p[0] for p in pairs] == ["b", "a"]
    reranked = db.rerank("c", [0.9, 0.9], alpha=0.5, limit=2)
    assert reranked[0][0] == "b"
    db.delete("c", "a")
    assert db.get_by_value("c", "a") is None
    db.delete_collection("c")
    assert db.collections() == []
    with pytest.raises(KeyError):
        db.insert("c", {"id": "x", "vector": [0.0, 0.0]})


def test_compat_get_all_cap(spark):
    """get_all is a driver collect by legacy contract — past the cap it
    must fail fast naming the DataFrame path, not OOM the driver."""
    db = Vettore.new(spark)
    db.create_collection("cap", 2, metric="l2")
    db.batch("cap", [{"id": str(i), "vector": [float(i), 0.0]} for i in range(5)])
    with pytest.raises(ValueError, match="Collection.all"):
        db.get_all("cap", max_rows=3)
    assert len(db.get_all("cap", max_rows=5)) == 5
    # rerank collects ids + FULL VECTORS for the whole collection — the
    # same legacy-collect class, so the same fail-fast cap (r9 verdict #4)
    with pytest.raises(ValueError, match="mmr_rerank"):
        db.rerank("cap", [1.0, 0.0], limit=2, max_rows=3)
    assert len(db.rerank("cap", [1.0, 0.0], limit=2, max_rows=5)) == 2
    # get_by_vector must not collect the collection: it returns the one
    # matching row through a JVM-side filter (normalized-vector compare)
    assert db.get_by_vector("cap", [3.0, 0.0])["id"] == "3"
    assert db.get_by_vector("cap", [99.0, 1.0]) is None


def test_compat_hnsw_metric_inference(spark):
    db = Vettore.new(spark)
    db.create_collection("h", 2, metric="hnsw")
    c = db._coll("h")
    assert c.config.metric == "l2"
    assert c.config.index == "hnsw"


# -- pluggable store/index (store.ex:15-29, index.ex:12-18) ------------------


def test_memory_and_parquet_store(spark, tmp_path):
    df = spark.createDataFrame([("a", 1)], "id: string, x: int")
    mem = MemoryStore()
    mem.append(df)
    mem.append(df)
    assert mem.read(spark).count() == 2

    pq = ParquetStore(str(tmp_path / "store"))
    assert not pq.exists()
    pq.overwrite(df)
    pq.append(df)
    assert pq.exists()
    assert pq.read(spark).count() == 2


def test_lsh_index_candidates(spark):
    from vettore_spark.collection import Collection

    rng = np.random.default_rng(3)
    rows = [
        {"id": f"v{i:02d}", "vector": rng.standard_normal(8).tolist()}
        for i in range(40)
    ]
    c = Collection.create(spark, "lsh", 8, metric="l2")
    c.put_many(rows)
    q = rows[0]["vector"]
    flat = FlatIndex().candidates(c.df, q, 5)
    assert flat.count() == 40
    lsh = LshIndex(dims=8, candidates_factor=2)
    cand = lsh.candidates(c.df, q, 5)
    n = cand.count()
    assert 0 < n <= 40
    # the query's own row must be in its LSH candidate set (identical bits)
    assert cand.filter(F.col("id") == "v00").count() == 1


# -- streaming ---------------------------------------------------------------


def test_validate_batch_matches_put_many(spark):
    raw = spark.createDataFrame(
        [
            ("a", None, [1.0, 2.0]),
            (None, "bval", [0.0, 1.0]),   # id falls back to value
            ("bad", None, [1.0]),          # wrong dims -> dropped
            ("a", None, [9.0, 9.0]),       # duplicate id -> deduped
        ],
        "id: string, value: string, vector: array<double>",
    )
    out = validate_batch(raw, dims=2, normalize="none")
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == {"a", "bval"}
    assert rows["bval"]["value"] == "bval"
    assert rows["a"]["binary_vector"] is not None


def test_stream_into_collection_and_windows(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    spark.createDataFrame(
        [("a", "a", [1.0, 0.0]), ("b", "b", [0.0, 1.0])],
        "id: string, value: string, vector: array<double>",
    ).write.parquet(str(src / "batch0"))
    stream = spark.readStream.schema(
        "id string, value string, vector array<double>"
    ).parquet(str(src) + "/*")
    q = stream_into_collection(
        stream,
        sink_path=str(tmp_path / "sink"),
        checkpoint_path=str(tmp_path / "ckpt"),
        dims=2,
    )
    q.awaitTermination(60)
    got = spark.read.parquet(str(tmp_path / "sink"))
    assert got.count() == 2
    assert set(got.columns) == {"id", "value", "vector", "binary_vector"}

    # windowed agg: streaming plan over a file source == batch plan result
    ev = spark.createDataFrame(
        [("click", "2024-01-01 00:10:00", 1.0), ("click", "2024-01-01 00:50:00", 2.0),
         ("view", "2024-01-01 01:10:00", 3.0)],
        "event_type: string, ts_s: string, value: double",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    batch_out = {
        (r["event_type"], r["window_start"]): (r["n"], r["sum_value"])
        for r in windowed_event_counts(ev, window="1 hour").collect()
    }
    assert batch_out[("click", "2024-01-01 00:00:00")] == (2, 3.0)
    assert batch_out[("view", "2024-01-01 01:00:00")] == (1, 3.0)

    evdir = tmp_path / "events"
    ev.write.parquet(str(evdir / "b0"))
    sev = spark.readStream.schema(ev.schema).parquet(str(evdir) + "/*")
    sq = (
        windowed_event_counts(sev, window="1 hour", watermark="2 hours")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("winagg")
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination(60)
    stream_out = {
        (r["event_type"], r["window_start"]): (r["n"], r["sum_value"])
        for r in spark.sql("select * from winagg").collect()
    }
    assert stream_out == batch_out


# -- multimodal --------------------------------------------------------------


def test_multimodal_features_deterministic(spark):
    rows = [
        ("m1", b"\x01\x02\x03", "image/png", {"w": "8"}),
        ("m2", b"\x04\x05", "image/png", None),
        ("m3", None, None, None),
    ]
    df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    out1 = {r["media_id"]: list(r["features"]) for r in MM.image_features(df).collect()}
    out2 = {r["media_id"]: list(r["features"]) for r in MM.image_features(df).collect()}
    assert out1 == out2  # deterministic fake decode
    assert len(out1) == 3
    assert all(len(v) == 12 for v in out1.values())
    # different payloads -> different features
    assert out1["m1"] != out1["m2"]
    # feature column feeds the search operators
    from vettore_spark.operators.search import flat_topk

    feat_df = MM.image_features(df).withColumnRenamed("features", "vector")
    top = flat_topk(
        feat_df, out1["m1"], metric="l2", k=1, id_col="media_id"
    ).collect()
    assert top[0]["media_id"] == "m1"


def test_real_decoder_is_gated():
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            MM.decode_image(b"not-an-image")
    else:
        # with pillow present the gate opens and bad bytes fail in PIL
        with pytest.raises(Exception):
            MM.decode_image(b"not-an-image")


def test_real_image_decode_e2e(spark):
    """Runs only where pillow exists (reference parity with its env-gated
    fastembed e2e): a real PNG flows payload -> decode_image ->
    image_features through the SAME mapInPandas plumbing the fake
    decoder exercises, and the per-channel features match a local numpy
    computation of the same pixels."""
    PIL = pytest.importorskip("PIL")
    from io import BytesIO

    from PIL import Image

    rng = np.random.default_rng(7)
    rows = []
    pixels = {}
    for i in range(4):
        arr = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
        buf = BytesIO()
        Image.fromarray(arr, "RGB").save(buf, format="PNG")
        rows.append((f"img{i}", buf.getvalue(), "image/png", None))
        pixels[f"img{i}"] = arr
    df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    out = {
        r["media_id"]: r["features"]
        for r in MM.image_features(
            df, decode_fn=MM.decode_image, feature_dim=12
        ).collect()
    }
    assert set(out) == set(pixels)
    for mid, arr in pixels.items():
        px = arr.reshape(-1, 3).astype(np.float64)
        want = np.concatenate(
            [px.mean(0), px.std(0), px.min(0), px.max(0)]
        )[:12]
        assert np.allclose(np.array(out[mid], dtype=np.float64), want, atol=1e-3)


def test_real_text_encoder_e2e(spark):
    """Runs only where sentence-transformers AND a configured model
    exist: real embeddings flow through the same Arrow encode stage as
    the deterministic fake, normalized and dimension-consistent."""
    pytest.importorskip("sentence_transformers")
    import os

    if not os.environ.get("SPARK_VETTORE_EMBED_MODEL"):
        pytest.skip("SPARK_VETTORE_EMBED_MODEL not configured")
    from vettore_spark.encodings import encoders as E

    enc = E.load_real_encoder()
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "goodbye world")], ["doc_id", "text"]
    )
    probe = enc(__import__("pandas").Series(["hello world"]))
    out = E.encode_texts(
        df, encode_fn=enc, dim=int(probe.shape[1])
    ).collect()
    assert len(out) == 2
    for r in out:
        v = np.array(r["embedding"], dtype=np.float64)
        assert np.isfinite(v).all()
        assert abs(np.linalg.norm(v) - 1.0) < 1e-3  # normalized


def test_frame_sample(spark):
    df = spark.createDataFrame(
        [("v1", bytes(range(200)), "video/mp4", None)], MM.MEDIA_SCHEMA
    )
    frames = MM.frame_sample(df, n_frames=4, frame_bytes=16).collect()
    assert len(frames) == 4
    assert [f["frame_idx"] for f in frames] == [0, 1, 2, 3]
    assert all(len(f["frame"]) == 16 for f in frames)
    # frames are evenly spaced slices
    assert frames[0]["frame"][0] == 0
    assert frames[1]["frame"][0] == 50


def test_audio_features_numpy_oracle(spark):
    payload = bytes((i * 37 + 11) % 256 for i in range(300))
    df = spark.createDataFrame(
        [("a1", payload, "audio/wav", None), ("short", b"\x01\x02", None, None)],
        MM.MEDIA_SCHEMA,
    )
    got = {
        (r["media_id"], r["frame_idx"]): (r["rms"], r["zcr"])
        for r in MM.audio_features(df, frame_bytes=64).collect()
    }
    # trailing partial frame dropped; sub-frame payloads produce no rows
    assert set(got) == {("a1", 0), ("a1", 1), ("a1", 2), ("a1", 3)}
    s = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    for i in range(4):
        fr = s[i * 64 : (i + 1) * 64]
        rms = float(np.sqrt(((fr - 128.0) ** 2).sum() / 64))
        hi = fr >= 128.0
        zcr = int((hi[1:] != hi[:-1]).sum())
        assert got[("a1", i)] == (pytest.approx(rms), zcr)


def test_image_resize_block_mean(spark):
    df = spark.createDataFrame([("m1", b"\x09", "image/png", None)], MM.MEDIA_SCHEMA)
    row = MM.image_resize(df, out_h=4, out_w=4).collect()[0]
    assert (row["height"], row["width"], len(row["pixels"])) == (4, 4, 48)
    img = MM.fake_decode_image(b"\x09").astype(np.float64)  # 8x8x3
    # 4x4 output over an 8x8 image = mean of each 2x2 block
    expect = img.reshape(4, 2, 4, 2, 3).mean(axis=(1, 3)).astype(np.float32)
    assert np.allclose(np.array(row["pixels"]).reshape(4, 4, 3), expect)


# -- text -> embedding pipeline ----------------------------------------------


def test_hashed_embedding_dense_form(spark):
    from vettore_spark.operators.text import hashed_embedding, hashed_token_features

    df = spark.createDataFrame(
        [(1, "spark scan spark join"), (2, "scan join scan"), (3, "totally different words here")],
        "doc_id: long, text: string",
    )
    dense = {r["doc_id"]: list(r["vector"]) for r in hashed_embedding(df, dim=16).collect()}
    assert all(len(v) == 16 for v in dense.values())
    # unit norm
    for v in dense.values():
        assert abs(sum(x * x for x in v) - 1.0) < 1e-5
    # sparse and dense forms agree
    sparse = hashed_token_features(df, dim=16).collect()
    for r in sparse:
        assert abs(dense[r["doc_id"]][r["idx"]] - r["w"]) < 1e-4
    # similar docs get similar embeddings, dissimilar docs do not
    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))
    assert cos(dense[1], dense[2]) > cos(dense[1], dense[3])

    # the dense form feeds the search operators
    from vettore_spark.operators.search import flat_topk

    emb_df = hashed_embedding(df, dim=16)
    top = flat_topk(emb_df, dense[1], metric="cosine", k=1, id_col="doc_id").collect()
    assert top[0]["doc_id"] == 1


def test_pq_index_backend(spark):
    import numpy as np

    from vettore_spark.collection import Collection
    from vettore_spark.sources.store import PqIndex

    rng = np.random.default_rng(11)
    rows = [
        {"id": f"v{i:02d}", "vector": rng.standard_normal(8).tolist()}
        for i in range(60)
    ]
    c = Collection.create(spark, "pqix", 8, metric="l2")
    c.put_many(rows)
    q = rows[0]["vector"]
    idx = PqIndex(m=2, n_codes=8, iters=3, candidates_factor=4).build(c.df)
    cand = idx.candidates(c.df, q, 5)
    n = cand.count()
    assert 0 < n <= 60
    # candidate schema matches the collection (semi-join, rerank-ready)
    assert set(cand.columns) == set(c.df.columns)
    # the query's own row reconstructs with zero residual in its own cells
    # and must rank in the ADC top candidates
    assert cand.filter(F.col("id") == "v00").count() == 1


def test_pq_search_sees_mutations(spark):
    """put/delete invalidate the cached PQ index: a vector inserted after
    the first pq_search must be findable, and a deleted id must vanish
    (reference semantics: indexes maintained in the insert/delete path,
    hnsw.rs:263-289)."""
    import numpy as np

    from vettore_spark.collection import Collection

    rng = np.random.default_rng(7)
    rows = [
        {"id": f"v{i:02d}", "vector": rng.standard_normal(8).tolist()}
        for i in range(40)
    ]
    c = Collection.create(spark, "pqmut", 8, metric="l2")
    c.put_many(rows)
    q = [3.0] * 8  # far corner: no stored vector is close
    c.pq_search(q, limit=3, m=2, n_codes=8).collect()  # warm the index cache
    c.put({"id": "vnew", "vector": [2.9] * 8})
    hits = [r["id"] for r in c.pq_search(q, limit=3, m=2, n_codes=8).collect()]
    assert "vnew" in hits
    c.delete("vnew")
    hits = [r["id"] for r in c.pq_search(q, limit=3, m=2, n_codes=8).collect()]
    assert "vnew" not in hits


def test_pq_index_tiny_collection(spark):
    """Fewer rows than n_codes: codebook clamps instead of raising; an
    empty collection degrades to the exact scan."""
    import numpy as np

    from vettore_spark.collection import Collection
    from vettore_spark.sources.store import PqIndex

    rng = np.random.default_rng(13)
    rows = [
        {"id": f"t{i}", "vector": rng.standard_normal(8).tolist()}
        for i in range(3)
    ]
    c = Collection.create(spark, "pqtiny", 8, metric="l2")
    c.put_many(rows)
    idx = PqIndex(m=2, n_codes=16, iters=2, candidates_factor=4).build(c.df)
    assert idx.candidates(c.df, rows[0]["vector"], 2).count() > 0

    empty = Collection.create(spark, "pqempty", 8, metric="l2")
    idx2 = PqIndex(m=2, n_codes=16, iters=2).build(empty.df)
    assert idx2.candidates(empty.df, [0.0] * 8, 2).count() == 0


def test_image_ahash_pairs_detect_identical_payloads(spark):
    """aHash is a content fingerprint: identical payloads share a hash
    (hamming 0); the nibble-blocked pair join finds them."""
    from pyspark.sql import functions as F
    from vettore_spark.sources import multimodal as MM

    rows = [(1, b"same payload bytes"), (2, b"same payload bytes"),
            (3, b"completely different content here"),
            (4, b"yet another unrelated payload")]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    h = MM.image_ahash(df)
    hm = {r["media_id"]: r["ahash"] for r in h.collect()}
    assert hm[1] == hm[2]
    assert 0 <= hm[1] < (1 << 16)
    pairs = MM.ahash_pairs(h, max_hamming=0).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} >= {(1, 2)}
    for r in pairs:
        assert r["hamming"] == 0


def test_ahash_pigeonhole_blocking_matches_allpairs(spark):
    """At hamming <= 3 the 4-nibble pigeonhole is exact: blocked pairs ==
    brute-force all-pairs."""
    from itertools import combinations
    from vettore_spark.sources import multimodal as MM

    rows = [(i, f"payload number {i}".encode()) for i in range(30)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    h = MM.image_ahash(df)
    hm = {r["media_id"]: r["ahash"] for r in h.collect()}
    want = {
        (a, b)
        for a, b in combinations(sorted(hm), 2)
        if bin(hm[a] ^ hm[b]).count("1") <= 3
    }
    got = {(r["id_a"], r["id_b"])
           for r in MM.ahash_pairs(h, max_hamming=3).collect()}
    assert got == want
