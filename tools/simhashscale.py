"""streaming_simhash_pairs replay scaling (r11 verdict #3).

The r11 bench recorded an 11.2 s one-time availableNow replay for the
simhash gate at sf0.1 — the largest entry in streaming_replay_sec — with
its scaling vs corpus size unmeasured. This harness measures it:

1. SCALING: replay the gate-configured operator (max_hamming=8,
   max_bucket=4096, poly_hash62) over the sf0.1 documents corpus at
   1x/4x/16x. Replication is SALTED — each replica's text is prefixed
   with 24 replica-unique tokens, pushing replicas far apart in Hamming
   space — so duplicate-family SIZES stay fixed while the family COUNT
   grows k-fold (what a k-times-larger crawl looks like). Unsalted
   replication would instead multiply family sizes, growing the TRUE
   pair output quadratically (k^2 per family) — that measures output
   explosion, not replay scaling. Recorded per scale: replay wall
   seconds, emitted pair rows, state rows (buckets, from the engine's
   stateOperators.numRowsTotal), and the largest bucket population
   (batch-side recomputation of the (block, value) keying).
2. KNOB: on the unsalted 1x corpus (the real gate input), sweep
   max_bucket {256, 1024, 4096} and block_bits {16, 32}, recording wall
   seconds, distinct pair count, and pair recall vs the widest-cap run
   — the mitigation cost table for a hot-bucket-bound corpus.

Prints one JSON line; SCALE.md r12 records it.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OFFSET = 10_000_000


def _salted(docs, k: int):
    """k replicas with shifted ids; replicas > 0 get 24 replica-unique
    prefix tokens so they are NOT near-dups of replica 0 (family sizes
    preserved, family count scaled)."""
    parts = []
    for i in range(k):
        p = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * OFFSET))
        if i > 0:
            salt = " ".join(f"salt{i}w{j}" for j in range(24))
            p = p.withColumn("text", F.concat(F.lit(salt + " "), F.col("text")))
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _replay(spark, src_dir: str, *, max_bucket: int, block_bits: int,
            sink: str) -> dict:
    from vettore_spark.operators import text as TX
    from vettore_spark.streaming.stateful import streaming_simhash_candidates

    schema = spark.read.parquet(src_dir).schema
    stream = spark.readStream.schema(schema).parquet(src_dir)
    out = streaming_simhash_candidates(
        stream, max_hamming=8, max_bucket=max_bucket,
        block_bits=block_bits, hash_fn=TX.poly_hash62,
    )
    counts = []
    t0 = time.time()
    if sink == "count":
        q = (
            out.writeStream.outputMode("append")
            .foreachBatch(lambda bdf, _e: counts.append(bdf.count()))
            .trigger(availableNow=True)
            .start()
        )
    else:
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName(sink)
            .trigger(availableNow=True)
            .start()
        )
    if not q.awaitTermination(3600):
        q.stop()
        raise TimeoutError("replay did not finish within 3600s")
    wall = round(time.time() - t0, 1)
    state_rows = 0
    lp = q.lastProgress
    if lp and lp.get("stateOperators"):
        state_rows = sum(s.get("numRowsTotal", 0) for s in lp["stateOperators"])
    emitted = sum(counts) if sink == "count" else spark.table(sink).count()
    return {"wall_sec": wall, "emitted_rows": emitted, "state_buckets": state_rows}


def _bucket_stats(spark, src_dir: str, block_bits: int) -> dict:
    """Batch-side recomputation of the operator's (block, value) keying:
    bucket count + max population."""
    from vettore_spark.operators import text as TX
    from vettore_spark.operators.dedup import simhash64, tokens

    docs = spark.read.parquet(src_dir)
    sig = simhash64(tokens("text"), hash_fn=TX.poly_hash62)
    n_blocks = 64 // block_bits
    mask = (1 << block_bits) - 1
    parts = [
        docs.select(
            F.lit(b).alias("_blk"),
            F.shiftrightunsigned(sig, b * block_bits)
            .bitwiseAND(F.lit(mask))
            .alias("_bval"),
        )
        for b in range(n_blocks)
    ]
    keyed = parts[0]
    for p in parts[1:]:
        keyed = keyed.unionByName(p)
    row = (
        keyed.groupBy("_blk", "_bval")
        .count()
        .agg(F.count("*"), F.max("count"))
        .first()
    )
    return {"n_buckets": row[0], "max_bucket_pop": row[1]}


def main() -> int:
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("vettore-simhash-scale")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    base = tempfile.mkdtemp(prefix="vettore_shscale_")
    rec: dict = {"sf_dir": SF_DIR, "scaling": {}, "knob": {}}
    try:
        for k in (1, 4, 16):
            src = os.path.join(base, f"x{k}")
            _salted(docs0, k).coalesce(max(1, k // 2)).write.mode(
                "overwrite"
            ).parquet(src)
            n = spark.read.parquet(src).count()
            r = _replay(
                spark, src, max_bucket=4096, block_bits=16, sink="count"
            )
            r["docs"] = n
            r.update(_bucket_stats(spark, src, 16))
            rec["scaling"][f"x{k}"] = r
            print(f"# x{k}: {r}", file=sys.stderr)

        # knob sweep on the UNSALTED 1x corpus (the gate's real input)
        src1 = os.path.join(base, "gate1x")
        docs0.coalesce(1).write.mode("overwrite").parquet(src1)
        pair_sets: dict = {}
        for label, mb, bb in (
            ("cap4096_bits16", 4096, 16),
            ("cap1024_bits16", 1024, 16),
            ("cap256_bits16", 256, 16),
            ("cap4096_bits32", 4096, 32),
        ):
            r = _replay(spark, src1, max_bucket=mb, block_bits=bb,
                        sink=f"shknob_{label}")
            pairs = {
                (x["doc_a"], x["doc_b"])
                for x in spark.table(f"shknob_{label}")
                .select("doc_a", "doc_b")
                .distinct()
                .collect()
            }
            pair_sets[label] = pairs
            r["distinct_pairs"] = len(pairs)
            rec["knob"][label] = r
            print(f"# {label}: {r}", file=sys.stderr)
        ref = pair_sets["cap4096_bits16"]
        for label, pairs in pair_sets.items():
            rec["knob"][label]["pair_recall_vs_cap4096"] = round(
                len(pairs & ref) / max(len(ref), 1), 4
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
