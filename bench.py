"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with per-query wall-clock seconds.

Mirrors the reference's bench shape (bench/search_modes_bench.exs): exact
flat search is the baseline; every approximate mode runs over the same data.
Timing methodology also mirrors the reference (Benchee `warmup: 2` at
bench/vettore_bench.exs / bench/performance.md:9-35): each scenario runs
once untimed before the timed run, so one-time costs — Catalyst codegen
compilation (janino), JIT warmup of interpreted higher-order-function
paths, Python worker spin-up — land in the warmup, and the timed number is
steady-state throughput. On a long-lived cluster that is the number that
matters; the one-time compile is amortized over every subsequent run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


HEADLINE = [
    "flat_topk_l2",
    "flat_topk_cosine",
    "filtered_topk",
    "multi_query_topk",
    "knn_graph",
    "quantized_topk",
    "funnel_topk",
    "hybrid_topk",
    "hnsw_topk",
    "sq_int8_topk",
    "ann_ivf_topk",
    "ann_brp_lsh_topk",
    "muvera_fde_retrieval",
    "maxsim_label_topk",
    "mean_vector_by_label",
    "normalize_stats",
    "pq_adc_topk",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "dedup_keep_best",
    "hard_negatives",
    "charlm_quality",
    "ivf_delete_search",
    "simhash_pairs",
    "embedding_neardup",
    "neardup_clusters",
    "text_stats",
    "doc_fingerprint",
    "tfidf_top_terms",
    "bm25_topk",
    "bm25_batch",
    "rrf_fusion",
    "corpus_stats",
    "label_dispersion",
    "semantic_dedup_pairs",
    "fuzzy_value_pairs",
    "leakage_safe_split",
    "hnsw_insert_search",
    "doc_chunks",
    "decontaminate",
    "pii_redact",
    "repetition_filter",
    "stratified_sample",
    "train_shards",
    "training_pipeline",
    "media_frame_sample",
    "media_image_features",
    "media_audio_features",
    "events_hourly",
    "events_asof_join",
    "events_range_join",
    "events_time_rollup",
    "events_anomaly",
    "user_sessions",
    "hashed_embedding",
    "dsir_weights",
    "domain_mixture",
    "substring_dedup",
    "semdedup_prune",
    "user_event_features",
    "bpe_pair_stats",
    "text_embed",
    "curation_pipeline",
    "token_budget_select",
    "calibrated_quality",
    "media_ahash_pairs",
    "retrieval_pipeline",
    "mlm_masking",
    "multi_query_quantized",
    "tpch_q1_pricing",
    "tpch_q6_revenue",
    "tpch_q14_promo",
    "supplier_nation_revenue",
    "lineitem_rollup",
    "shipmode_priority",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("vettore-spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        # methods over the JIT's 8000-bytecode limit never get compiled and
        # run JVM-interpreted; falling back to Spark's interpreted expression
        # path for those stages is strictly faster (big HOF expression trees)
        .config("spark.sql.codegen.hugeMethodLimit", "8000")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from vettore_spark import queries as Q

    qs = Q.queries()
    # untimed warmup: JVM/codegen/Python-worker spin-up and parquet footer
    # reads land here, not in the first timed query. events.ts is parquet
    # TIMESTAMP(NANOS), which Spark rejects unless read as long nanos.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        qs["flat_topk_cosine"](spark, sf_dir).count()
        for t in ("documents", "lineitem", "events"):
            spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    except Exception:  # noqa: BLE001
        pass
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        try:
            fn(spark, sf_dir).count()  # per-scenario untimed warmup (Benchee-style)
            # median of 3 timed runs: the box is shared with other workloads
            # (driver-side verification jobs), so a single sample can be 3-4x
            # off; the median is the Benchee-style robust statistic.
            samples = []
            for _ in range(3):
                t0 = time.time()
                fn(spark, sf_dir).count()
                samples.append(time.time() - t0)
            timings[name] = round(sorted(samples)[1], 3)
        except Exception as e:  # noqa: BLE001
            print(f"bench {name} failed: {e}", file=sys.stderr)
            timings[name] = -1.0
    total = round(sum(t for t in timings.values() if t > 0), 3)

    # overlap@k of every approximate/two-stage mode vs the exact flat scan
    # with the same metric — the reference bench's preflight invariant
    # (bench/search_modes_bench.exs:193-238): 1.0 expected when candidates
    # cover the corpus.
    overlap: dict[str, float] = {}
    try:
        exact = {r["vec_id"] for r in qs["flat_topk_l2"](spark, sf_dir).collect()}
        for mode in ("quantized_topk", "funnel_topk", "hybrid_topk", "hnsw_topk",
                     "sq_int8_topk"):
            got = {r["vec_id"] for r in qs[mode](spark, sf_dir).collect()}
            overlap[mode] = round(len(exact & got) / max(len(exact), 1), 3)
        # compressed/partitioned ANN modes answer multiple queries; their
        # query 0 is the same vector as the flat baselines' (embedding of
        # vec 0), so overlap@5 against the matching-metric exact top-5
        ex5_l2 = sorted(
            qs["flat_topk_l2"](spark, sf_dir).collect(), key=lambda r: r["distance"]
        )[:5]
        pq0 = {
            r["vec_id"]
            for r in qs["pq_adc_topk"](spark, sf_dir).collect()
            if r["query_id"] == 0
        }
        # pure compressed-domain ranking (m=4, 10 label-mean codes — no
        # rerank stage): low overlap is the PQ distortion the two-stage
        # pq_search exists to absorb (rerank-recall 0.85+ in tests)
        overlap["pq_adc_topk@5_norerank"] = round(
            len({r["vec_id"] for r in ex5_l2} & pq0) / 5, 3
        )
        ex5_cos = sorted(
            qs["flat_topk_cosine"](spark, sf_dir).collect(),
            key=lambda r: r["distance"],
        )[:5]
        ivf0 = {
            r["vec_id"]
            for r in qs["ann_ivf_topk"](spark, sf_dir).collect()
            if r["query_id"] == 0
        }
        overlap["ann_ivf_topk@5"] = round(
            len({r["vec_id"] for r in ex5_cos} & ivf0) / 5, 3
        )
    except Exception:  # noqa: BLE001
        pass

    # ingest throughput, mirroring the reference's write-boundary bench
    # (bench/ets_owner_bench.exs: batched put_many is the recommended path):
    # validated batch insert of the embeddings table through the Collection
    # pipeline (id/value fallback, finiteness checks, normalize, sign-bit
    # packing, duplicate rejection), rows/sec end-to-end.
    ingest = {}
    try:
        from vettore_spark.collection import Collection

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            F.col("vec_id").cast("string").alias("id"),
            F.col("vec_id").cast("string").alias("value"),
            F.col("embedding").cast("array<double>").alias("vector"),
            F.lit(None).cast("array<array<double>>").alias("vectors"),
            F.lit(None).cast("array<bigint>").alias("binary_vector"),
            F.lit(None).cast("map<string,string>").alias("metadata"),
        )
        n_rows = emb.count()
        t0 = time.time()
        c = Collection.create(spark, "bench_ingest", 64, metric="cosine")
        c.put_many(emb)
        c.count()  # force the unioned table to materialize
        dt = time.time() - t0
        ingest = {
            "put_many_rows": n_rows,
            "put_many_sec": round(dt, 3),
            "put_many_rows_per_sec": round(n_rows / dt, 1),
        }
        # read path (the reference's ETS read-throughput bench family):
        # batched point lookups — one broadcast semi-join job for the whole
        # id set, the Spark shape for bulk gets (a per-id get() loop would
        # measure job-submission overhead, not the store)
        t0 = time.time()
        n_hits = c.get_many([str(i) for i in range(0, n_rows, 2)]).count()
        dt = time.time() - t0
        ingest["point_lookup_rows"] = n_hits
        ingest["point_lookup_rows_per_sec"] = round(n_hits / dt, 1)
    except Exception as e:  # noqa: BLE001
        print(f"bench ingest failed: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "overlap_at_10_vs_exact": overlap,
                "ingest": ingest,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
