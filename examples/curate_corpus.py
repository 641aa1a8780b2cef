"""End-to-end corpus curation example: the full training-data pipeline a
100 TB run would execute, demonstrated on the sf0.001 sample tables.

    normalize -> blocklist filter -> paragraph-level exact dedup ->
    MinHash-LSH near-dup pairs -> connected components -> keep best ->
    leakage-safe split -> deterministic shards

Every stage is a DataFrame transformation; nothing collects to the driver.
Run: cd /root/repo && python examples/curate_corpus.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("curate-corpus-example")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from vettore_spark.operators import dedup as D
    from vettore_spark.operators import pipeline as PL
    from vettore_spark.operators import sampling as SMP
    from vettore_spark.operators import text as TX

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. canonical normalization (map-only) — feed the NORMALIZED text to
    # every hash downstream so byte noise cannot defeat dedup
    norm = TX.normalize_text(docs).select("doc_id", "text")

    # 2. C4-style blocklist gate (map-only); keep the audit columns around
    gate = TX.blocklist_filter(norm, ["slow"], max_fraction=0.05)
    kept = norm.join(
        gate.filter(F.col("passed")).select("doc_id"), "doc_id", "left_semi"
    )
    n_gate = kept.count()

    # 3. paragraph-level exact dedup (Lee et al.): removes repeated
    # passages across documents, not just whole-doc copies
    para = D.paragraph_dedup(kept, window=20).filter(F.col("text") != "")
    n_para = para.count()

    # 4. near-dup families: MinHash-LSH candidates, exact-verified, then
    # connected components + quality-aware keep-best
    pairs = D.minhash_lsh_pairs(para, threshold=0.5)
    clusters = D.connected_components(pairs, id_out="doc_id")
    quality = TX.quality_score(para).select("doc_id", "quality")
    best = PL.keep_best_per_cluster(clusters, quality)
    drop = clusters.join(
        best.withColumnRenamed("keep_doc_id", "doc_id").select("doc_id"),
        "doc_id",
        "left_anti",
    ).select("doc_id")
    survivors = para.join(drop, "doc_id", "left_anti")
    n_surv = survivors.count()

    # 5. leakage-safe split: near-dup families never straddle train/test
    split = SMP.leakage_safe_split(
        survivors.select("doc_id"), pairs, test_fraction=0.1
    )
    # 6. deterministic shards for the training side
    train = survivors.join(
        split.filter(F.col("split") == "train").select("doc_id"),
        "doc_id",
        "left_semi",
    )
    shards = SMP.shard_assign(train, 8, key_col="doc_id")
    dist = shards.groupBy("shard").count().orderBy("shard").collect()

    # 7. INCREMENTAL arrival: a later crawl batch dedupes against the
    # already-curated corpus — exact digests first (anti-join), then
    # near-dup via the corpus's persisted MinHash band table
    batch = docs.filter(F.col("source") == "src1").select("doc_id", "text")
    batch = TX.normalize_text(batch).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )  # shifted ids: simulate a fresh crawl that re-sends src1 content
    n_batch = batch.count()
    fresh = D.dedup_against(batch, survivors)
    near = D.minhash_dedup_against(fresh, survivors, threshold=0.8)
    fresh = fresh.join(
        near.select("doc_id").distinct(), "doc_id", "left_anti"
    )
    n_fresh = fresh.count()

    print(f"input docs:            {n0}")
    print(f"after blocklist gate:  {n_gate}")
    print(f"after paragraph dedup: {n_para}")
    print(f"after near-dup keep:   {n_surv}")
    print("train shard sizes:     " + ", ".join(str(r["count"]) for r in dist))
    print(f"incremental batch:     {n_batch} arrived, {n_fresh} genuinely new")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
